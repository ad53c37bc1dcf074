"""Synthetic dataset generation for end-to-end tests (and benchmarks).

Writes .npz files with the same group layout the readers expect
('u' [S, T, N, V], optional 'c', 'x'), shaped like the reference datasets.
"""
import numpy as np


def make_static_fx_dataset(path: str, num_samples=24, num_nodes=128, seed=0):
    """Poisson-Gauss-like: fixed scattered coords, c → u via a smooth map."""
    rng = np.random.default_rng(seed)
    coords = rng.uniform(0, 1, (num_nodes, 2))
    c = rng.normal(size=(num_samples, 1, num_nodes, 1)).astype(np.float32)
    # Smooth local response: u = blur-ish function of c and coords.
    u = (0.5 * c
         + 0.3 * np.sin(2 * np.pi * coords[:, 0])[None, None, :, None]
         + 0.2 * c * np.cos(2 * np.pi * coords[:, 1])[None, None, :, None]
         ).astype(np.float32)
    x = np.broadcast_to(coords[None, None].astype(np.float32),
                        (num_samples, 1, num_nodes, 2))
    np.savez(path, u=u, c=c, x=np.ascontiguousarray(x))
    return path


def make_static_vx_dataset(path: str, num_samples=12, num_nodes=96, seed=0):
    """Airfoil-like: per-sample coordinates, 3 condition channels → 1 output."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 2.5, (num_samples, 1, num_nodes, 2)).astype(np.float32)
    c = rng.normal(size=(num_samples, 1, num_nodes, 3)).astype(np.float32)
    u = (1.0 + 0.1 * c[..., :1]
         + 0.05 * np.sin(x[..., :1]) * c[..., 1:2]).astype(np.float32)
    np.savez(path, u=u, c=c, x=x)
    return path


def make_sequential_fx_dataset(path: str, num_samples=16, num_nodes=100,
                               num_timesteps=15, seed=0):
    """NS-Gauss-like: fixed grid-ish coords, u [S, T, N, 2], no c."""
    rng = np.random.default_rng(seed)
    coords = rng.uniform(0, 1, (num_nodes, 2)).astype(np.float32)
    t = np.linspace(0, 1, num_timesteps)
    amp = rng.normal(size=(num_samples, 1, 1, 2)).astype(np.float32)
    phase = rng.uniform(0, 2 * np.pi, (num_samples, 1, 1, 2)).astype(np.float32)
    spatial = np.stack([np.sin(2 * np.pi * coords[:, 0]),
                        np.cos(2 * np.pi * coords[:, 1])], -1)[None, None]
    u = (amp * np.cos(2 * np.pi * t[None, :, None, None] + phase)
         * (0.5 + spatial)).astype(np.float32)
    x = coords[None, None]
    np.savez(path, u=u, x=np.ascontiguousarray(
        np.broadcast_to(x, (1, 1, num_nodes, 2))))
    return path


def make_sequential_vx_dataset(path: str, num_samples=10, num_nodes=80,
                               num_timesteps=15, seed=0):
    """Variable-coordinate time-dependent data: per-sample mesh fixed over
    time, u [S, T, N, 1], c [S, T, N, 1]."""
    rng = np.random.default_rng(seed)
    coords = rng.uniform(0, 1, (num_samples, num_nodes, 2)).astype(np.float32)
    t = np.linspace(0, 1, num_timesteps)
    amp = rng.normal(size=(num_samples, 1, 1, 1)).astype(np.float32)
    spatial = np.sin(2 * np.pi * coords[..., :1])[:, None]      # [S,1,N,1]
    u = (amp * np.cos(2 * np.pi * t[None, :, None, None]) * (0.5 + spatial)
         ).astype(np.float32)
    c = np.broadcast_to(spatial, u.shape).astype(np.float32)
    x = np.broadcast_to(coords[:, None], (num_samples, num_timesteps,
                                          num_nodes, 2)).astype(np.float32)
    np.savez(path, u=u, c=np.ascontiguousarray(c), x=np.ascontiguousarray(x))
    return path
