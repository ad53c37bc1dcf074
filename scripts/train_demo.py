"""End-to-end training demo on the current accelerator.

Generates a synthetic Poisson-like dataset (smooth map from a source field c
to a solution u on scattered 2D points), then runs the full CLI/trainer
stack — graph build, jitted training with the mix schedule, best-model
tracking, checkpointing, relative-L1 test metric, result plots — exactly as
a user would on a real dataset.

Usage: python scripts/train_demo.py [epochs] [num_nodes] [train_size] [sequential]
Pass "sequential" as any argument to run the time-dependent trainer instead
(NS-Gauss-like synthetic rollout data; autoregressive/direct/star eval), or
"vx" for variable-coordinate (airfoil-like) data with per-sample graphs.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(path, num_samples, num_nodes, seed=0):
    """u = smoothed response to a random source field c (Gaussian kernel mix)."""
    rng = np.random.default_rng(seed)
    coords = rng.uniform(0, 1, (num_nodes, 2)).astype(np.float32)
    # Random sources: mixture of Gaussians per sample
    centers = rng.uniform(0, 1, (num_samples, 4, 2))
    amps = rng.normal(size=(num_samples, 4)) * 0.5
    widths = rng.uniform(0.05, 0.15, (num_samples, 4))
    d2 = ((coords[None, None] - centers[:, :, None]) ** 2).sum(-1)  # [S,4,N]
    c = (amps[..., None] * np.exp(-d2 / (2 * widths[..., None] ** 2))).sum(1)
    # "solution": wider smoothing of the same sources (Poisson-like response)
    u = (amps[..., None] * widths[..., None] ** 2 * 40.0
         * np.exp(-d2 / (2 * (2.5 * widths[..., None]) ** 2))).sum(1)
    x = np.broadcast_to(coords[None, None], (num_samples, 1, num_nodes, 2))
    np.savez(path, u=u[:, None, :, None].astype(np.float32),
             c=c[:, None, :, None].astype(np.float32),
             x=np.ascontiguousarray(x))


def make_sequential_dataset(path, num_samples, num_nodes, num_timesteps=15,
                            seed=0):
    """Heat-equation-like multi-mode decay: u [S, T, N, 2] on fixed scattered
    coords. The state at any time determines the future (distinct spatial
    modes with distinct decay rates → the mode coefficients are recoverable
    from one snapshot), so autoregressive rollout is WELL-POSED — unlike a
    phase-ambiguous standing wave, where the sin component is unobservable
    from a single state and rollout error is irreducible."""
    rng = np.random.default_rng(seed)
    coords = rng.uniform(0, 1, (num_nodes, 2)).astype(np.float32)
    t = np.linspace(0, 1, num_timesteps)
    # per-sample random mode coefficients; fixed modes + decay rates
    modes = np.stack([
        np.sin(2 * np.pi * coords[:, 0]) * np.sin(2 * np.pi * coords[:, 1]),
        np.sin(4 * np.pi * coords[:, 0]) * np.sin(2 * np.pi * coords[:, 1]),
        np.cos(2 * np.pi * coords[:, 0]) * np.sin(4 * np.pi * coords[:, 1]),
    ], -1)                                                   # [N, M]
    lam = np.array([0.8, 2.0, 3.5])                          # decay rates
    a = rng.normal(size=(num_samples, 1, 1, modes.shape[-1], 2)).astype(np.float32)
    decay = np.exp(-lam[None, None, None, :, None] * t[None, :, None, None, None])
    u = np.sum(a * decay * modes[None, None, :, :, None],
               axis=3).astype(np.float32)                    # [S, T, N, 2]
    x = np.broadcast_to(coords[None, None], (1, 1, num_nodes, 2))
    np.savez(path, u=u, x=np.ascontiguousarray(x))


def main():
    args = [a for a in sys.argv[1:] if a not in ("sequential", "vx", "3d")]
    epochs = int(args[0]) if len(args) > 0 else 40
    num_nodes = int(args[1]) if len(args) > 1 else 2048
    train_size = int(args[2]) if len(args) > 2 else 512
    if "sequential" in sys.argv[1:]:
        return run_sequential(epochs, num_nodes, train_size)
    if "vx" in sys.argv[1:]:
        return run_vx(epochs, num_nodes, train_size)
    if "3d" in sys.argv[1:]:
        return run_3d(epochs, num_nodes, train_size)

    out_dir = os.path.abspath(".demo")
    os.makedirs(out_dir, exist_ok=True)
    data_path = os.path.join(out_dir,
                             f"poisson_demo_{num_nodes}_{train_size}.npz")
    if not os.path.exists(data_path):
        make_dataset(data_path, train_size + 128, num_nodes)

    config = {
        "setup": {"seed": 7, "trainer_name": "static", "train": True,
                  "compute_dtype": "bfloat16"},
        "model": {
            "latent_tokens_size": [32, 32],
            "args": {
                "magno": {"coord_dim": 2, "radius": 0.066, "hidden_size": 64,
                          "mlp_layers": 3, "lifting_channels": 32},
                "transformer": {"patch_size": 2, "hidden_size": 128,
                                "num_layers": 3},
            },
        },
        "dataset": {
            "name": f"poisson_demo_{num_nodes}_{train_size}",
            "metaname": "elliptic_pdes/Poisson-Gauss",
            "base_path": out_dir,
            "train_size": train_size, "val_size": 64, "test_size": 64,
            "batch_size": 32, "shuffle": True,
        },
        "optimizer": {
            "name": "adamw",
            "args": {"lr": 8e-4, "weight_decay": 1e-5, "epoch": epochs,
                     "eval_every_eps": max(2, epochs // 10),
                     "scheduler": "mix", "max_lr": 1e-3, "min_lr": 1e-4,
                     "final_lr": 5e-5},
        },
        "path": {
            "ckpt_path": os.path.join(out_dir, "ckpt"),
            "loss_path": os.path.join(out_dir, "loss.png"),
            "result_path": os.path.join(out_dir, "result.png"),
            "database_path": os.path.join(out_dir, "db.csv"),
        },
    }
    cfg_path = os.path.join(out_dir, "demo.json")
    with open(cfg_path, "w") as f:
        json.dump(config, f, indent=2)

    from gaot_tpu.cli import run_config

    t0 = time.perf_counter()
    run_config(cfg_path)
    print(f"demo complete in {time.perf_counter() - t0:.1f}s; "
          f"artifacts in {out_dir}")


def make_3d_dataset(path, num_samples, num_nodes, seed=0):
    """3D scattered points in [0,1]^3; smooth c -> u local map."""
    rng = np.random.default_rng(seed)
    coords = rng.uniform(0, 1, (num_nodes, 3)).astype(np.float32)
    centers = rng.uniform(0, 1, (num_samples, 4, 3))
    amps = rng.normal(size=(num_samples, 4)) * 0.5
    widths = rng.uniform(0.1, 0.25, (num_samples, 4))
    d2 = ((coords[None, None] - centers[:, :, None]) ** 2).sum(-1)
    c = (amps[..., None] * np.exp(-d2 / (2 * widths[..., None] ** 2))).sum(1)
    u = (amps[..., None] * widths[..., None] ** 2 * 20.0
         * np.exp(-d2 / (2 * (2.0 * widths[..., None]) ** 2))).sum(1)
    x = np.broadcast_to(coords[None, None], (num_samples, 1, num_nodes, 3))
    np.savez(path, u=u[:, None, :, None].astype(np.float32),
             c=c[:, None, :, None].astype(np.float32),
             x=np.ascontiguousarray(x))


def run_3d(epochs, num_nodes, train_size, latent=64):
    """GAOT-3D-scale flagship: 64^3 latent grid (262k latent queries), patch
    4 -> 4096 transformer tokens — exercises the 3D patchify path, kNN
    graphs in 3D, and the q-tiled Pallas flash backward at its S=4096 design
    point (ops/pallas/flash_attention.py)."""
    out_dir = os.path.abspath(".demo_3d")
    os.makedirs(out_dir, exist_ok=True)
    data_path = os.path.join(out_dir, f"demo3d_{num_nodes}_{train_size}.npz")
    if not os.path.exists(data_path):
        make_3d_dataset(data_path, train_size + 32, num_nodes)

    from gaot_tpu.core.metadata import DATASET_METADATA, Metadata

    DATASET_METADATA.setdefault("demo/poisson3d", Metadata(
        periodic=False, group_u="u", group_c="c", group_x="x", type="gaot",
        fix_x=True, domain_x=([0, 0, 0], [1, 1, 1]), domain_t=None,
        active_variables=[0], chunked_variables=[0], num_variable_chunks=1,
        signed={"u": [True], "c": None}, names={"u": ["$u$"], "c": ["$c$"]},
        global_mean=[0.0], global_std=[0.05]))

    config = {
        "setup": {"seed": 7, "trainer_name": "static", "train": True,
                  "compute_dtype": "bfloat16"},
        "model": {
            "latent_tokens_size": [latent, latent, latent],
            "args": {
                # kNN graphs: 3D radius graphs at 64^3 resolution are
                # degenerate (empty or huge) for any single radius; the
                # reference exposes the same strategy knob
                # (MAGNOConfig.neighbor_strategy, magno.py:59).
                "magno": {"coord_dim": 3, "radius": 0.05, "hidden_size": 32,
                          "mlp_layers": 2, "lifting_channels": 16,
                          "neighbor_strategy": "knn", "max_neighbors": 8},
                "transformer": {"patch_size": 4, "hidden_size": 192,
                                "num_layers": 3},
            },
        },
        "dataset": {
            "name": f"demo3d_{num_nodes}_{train_size}",
            "metaname": "demo/poisson3d",
            "base_path": out_dir,
            "train_size": train_size, "val_size": 16, "test_size": 16,
            "batch_size": 4, "shuffle": True,
        },
        "optimizer": {
            "name": "adamw",
            "args": {"lr": 8e-4, "weight_decay": 1e-5, "epoch": epochs,
                     "eval_every_eps": max(2, epochs // 10),
                     "scheduler": "mix", "max_lr": 1e-3, "min_lr": 1e-4,
                     "final_lr": 5e-5},
        },
        "path": {
            "ckpt_path": os.path.join(out_dir, "ckpt"),
            "loss_path": os.path.join(out_dir, "loss.png"),
            "result_path": os.path.join(out_dir, "result.png"),
            "database_path": os.path.join(out_dir, "db.csv"),
        },
    }
    cfg_path = os.path.join(out_dir, "demo3d.json")
    with open(cfg_path, "w") as f:
        json.dump(config, f, indent=2)

    from gaot_tpu.cli import run_config

    t0 = time.perf_counter()
    run_config(cfg_path)
    print(f"3d demo complete in {time.perf_counter() - t0:.1f}s; "
          f"artifacts in {out_dir}")


def make_vx_dataset(path, num_samples, num_nodes, seed=0):
    """Airfoil-like: per-sample scattered coords, 3 condition channels -> 1."""
    rng = np.random.default_rng(seed)
    # Sample within the naca0012 metadata domain ([-1,-1.5],[2.5,2]) so every
    # query node is within decode radius of the latent grid.
    lo, hi = np.array([-1.0, -1.5]), np.array([2.5, 2.0])
    x = rng.uniform(lo, hi, (num_samples, 1, num_nodes, 2)).astype(np.float32)
    c = rng.normal(size=(num_samples, 1, num_nodes, 3)).astype(np.float32)
    u = (1.0 + 0.1 * c[..., :1]
         + 0.05 * np.sin(x[..., :1]) * c[..., 1:2]).astype(np.float32)
    np.savez(path, u=u, c=c, x=x)


def run_vx(epochs, num_nodes, train_size):
    out_dir = os.path.abspath(".demo_vx")
    os.makedirs(out_dir, exist_ok=True)
    data_path = os.path.join(out_dir,
                             f"airfoil_demo_{num_nodes}_{train_size}.npz")
    if not os.path.exists(data_path):
        make_vx_dataset(data_path, train_size + 32, num_nodes)

    config = {
        "setup": {"seed": 7, "trainer_name": "static", "train": True,
                  "compute_dtype": "bfloat16"},
        "model": {
            "latent_tokens_size": [64, 64],
            "args": {
                "magno": {"coord_dim": 2, "radius": 0.055, "hidden_size": 64,
                          "mlp_layers": 3, "lifting_channels": 64},
                "transformer": {"patch_size": 2, "hidden_size": 256,
                                "num_layers": 3},
            },
        },
        "dataset": {
            "name": f"airfoil_demo_{num_nodes}_{train_size}",
            "metaname": "compressible_flow/naca0012",
            "base_path": out_dir,
            "train_size": train_size, "val_size": 16, "test_size": 16,
            "batch_size": 16, "shuffle": True,
        },
        "optimizer": {
            "name": "adamw",
            "args": {"lr": 8e-4, "weight_decay": 1e-5, "epoch": epochs,
                     "eval_every_eps": max(2, epochs // 10),
                     "scheduler": "mix", "max_lr": 1e-3, "min_lr": 1e-4,
                     "final_lr": 5e-5},
        },
        "path": {
            "ckpt_path": os.path.join(out_dir, "ckpt"),
            "loss_path": os.path.join(out_dir, "loss.png"),
            "result_path": os.path.join(out_dir, "result.png"),
            "database_path": os.path.join(out_dir, "db.csv"),
        },
    }
    cfg_path = os.path.join(out_dir, "demo.json")
    with open(cfg_path, "w") as f:
        json.dump(config, f, indent=2)

    from gaot_tpu.cli import run_config

    t0 = time.perf_counter()
    run_config(cfg_path)
    print(f"vx demo complete in {time.perf_counter() - t0:.1f}s; "
          f"artifacts in {out_dir}")


def run_sequential(epochs, num_nodes, train_size):
    out_dir = os.path.abspath(".demo_seq")
    os.makedirs(out_dir, exist_ok=True)
    data_path = os.path.join(out_dir,
                             f"ns_demo_{num_nodes}_{train_size}.npz")
    if not os.path.exists(data_path):
        make_sequential_dataset(data_path, train_size + 16, num_nodes)

    config = {
        "setup": {"seed": 7, "trainer_name": "sequential", "train": True,
                  "compute_dtype": "bfloat16"},
        "model": {
            "latent_tokens_size": [32, 32],
            "args": {
                "magno": {"coord_dim": 2, "radius": 0.066, "hidden_size": 64,
                          "mlp_layers": 3, "lifting_channels": 32},
                "transformer": {"patch_size": 2, "hidden_size": 128,
                                "num_layers": 3},
            },
        },
        "dataset": {
            "name": f"ns_demo_{num_nodes}_{train_size}",
            "metaname": "incompressible_fluids/NS-Gauss",
            "base_path": out_dir,
            "train_size": train_size, "val_size": 8, "test_size": 8,
            "batch_size": 32, "shuffle": True,
            "max_time_diff": 14, "time_step": 2,
            "stepper_mode": "time_der", "predict_mode": "all",
            "metric": "final_step",
        },
        "optimizer": {
            "name": "adamw",
            "args": {"lr": 8e-4, "weight_decay": 1e-5, "epoch": epochs,
                     "eval_every_eps": max(2, epochs // 10),
                     "scheduler": "mix", "max_lr": 1e-3, "min_lr": 1e-4,
                     "final_lr": 5e-5},
        },
        "path": {
            "ckpt_path": os.path.join(out_dir, "ckpt"),
            "loss_path": os.path.join(out_dir, "loss.png"),
            "result_path": os.path.join(out_dir, "result.png"),
            "database_path": os.path.join(out_dir, "db.csv"),
        },
    }
    cfg_path = os.path.join(out_dir, "demo.json")
    with open(cfg_path, "w") as f:
        json.dump(config, f, indent=2)

    from gaot_tpu.cli import run_config

    t0 = time.perf_counter()
    run_config(cfg_path)
    print(f"sequential demo complete in {time.perf_counter() - t0:.1f}s; "
          f"artifacts in {out_dir}")


if __name__ == "__main__":
    main()
