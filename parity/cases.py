"""Parity case definitions: shared synthetic datasets + matched recipes.

Each case defines ONE dataset file (.nc, HDF5 layout — readable by both the
reference through the xarray stub and gaot_tpu through
gaot_tpu/data/readers.py) and ONE training recipe expressed in the shared
config vocabulary (both frameworks deliberately use the same schema:
setup/model/dataset/optimizer sections, reference
src/core/default_configs.py:22-97 == gaot_tpu/core/config.py).

The tasks are noiseless smooth operator-learning problems sized for a
single CPU core: both frameworks must drive the final rel-L1 metric
(reference src/utils/metrics.py:60-75) into a flat basin so the
cross-framework gap isolates framework equivalence, not optimization noise.
"""
from __future__ import annotations

import json
import os

import numpy as np


# ----------------------------------------------------------------------
# data generators
# ----------------------------------------------------------------------
def _fourier_field(rng, coords, n_modes=6, decay=1.3):
    """Smooth random field on [0,1]^2 coords [N,2] -> [N]."""
    k = rng.integers(1, 4, size=(n_modes, 2))
    phase = rng.uniform(0, 2 * np.pi, (n_modes, 2))
    amp = rng.normal(size=n_modes) / (k.sum(1) ** decay)
    field = np.zeros(coords.shape[0])
    for m in range(n_modes):
        field += amp[m] * np.sin(
            2 * np.pi * k[m, 0] * coords[:, 0] + phase[m, 0]) * np.sin(
            2 * np.pi * k[m, 1] * coords[:, 1] + phase[m, 1])
    return field


def make_static_fx(path, num_samples=352, num_nodes=1024, seed=0):
    """Poisson-like: fixed scattered coords; smooth c -> u via a LOW-
    complexity local map. Deliberately easy: convergence parity needs both
    frameworks funneled into the same (generalizing) basin, so the target
    must be strongly determined by the data — low-frequency c, mild
    nonlinearity, no fine-structure coupling."""
    rng = np.random.default_rng(seed)
    coords = rng.uniform(0, 1, (num_nodes, 2)).astype(np.float64)
    c = np.stack([_fourier_field(rng, coords, n_modes=4, decay=1.8)
                  for _ in range(num_samples)])
    c = (c / c.std()).astype(np.float64)
    cx = np.sin(np.pi * coords[:, 0]) * np.sin(np.pi * coords[:, 1])
    u = 0.85 * c + 0.1 * np.tanh(c) + 0.25 * cx[None, :]
    u_arr = u[:, None, :, None].astype(np.float32)
    c_arr = c[:, None, :, None].astype(np.float32)
    x_arr = np.broadcast_to(coords[None, None].astype(np.float32),
                            (num_samples, 1, num_nodes, 2))
    _write_nc(path, u=u_arr, c=c_arr, x=np.ascontiguousarray(x_arr))
    return dict(
        periodic=False, group_u="u", group_c="c", group_x="x", type="gaot",
        fix_x=True, domain_x=([0.0, 0.0], [1.0, 1.0]), domain_t=None,
        active_variables=[0], chunked_variables=[0], num_variable_chunks=1,
        signed={"u": [True], "c": None}, names={"u": ["$u$"], "c": ["$c$"]},
        global_mean=[float(u_arr.mean())], global_std=[float(u_arr.std())])


def make_static_vx(path, num_samples=176, num_nodes=768, seed=1):
    """Airfoil-like: per-sample coordinates; u determined by (x, c).

    Coords are generated directly in [-1, 1]^2 so per_dim_scaling is the
    identity: the reference's vx path builds radius graphs from RAW coords
    while its latent queries are scaler-mapped to [-1, 1]
    (src/trainer/static_trainer.py:90-96 vs data_processor.py:313-319) — on
    any raw domain != [-1,1]^2 most latent tokens get zero encoder
    neighbors and reference training plateaus (measured: train loss stuck
    at 0.41 vs 0.028 from identical init on a [0,1]^2 variant). A [-1,1]^2
    domain makes that reference quirk harmless so the study isolates
    framework parity, not the reference's graph-space inconsistency."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (num_samples, num_nodes, 2)).astype(np.float64)
    c = np.stack([np.stack([_fourier_field(rng, x[s], n_modes=4, decay=1.8)
                            for _ in range(2)], -1)
                  for s in range(num_samples)])
    c = (c / c.std()).astype(np.float64)
    geom = np.sin(np.pi * x[..., 0]) * np.sin(np.pi * x[..., 1])
    u = 0.8 * c[..., 0] + 0.15 * np.tanh(c[..., 1]) + 0.25 * geom
    u_arr = u[:, None, :, None].astype(np.float32)
    c_arr = c[:, None].astype(np.float32)
    x_arr = x[:, None].astype(np.float32)
    _write_nc(path, u=u_arr, c=c_arr, x=x_arr)
    return dict(
        periodic=False, group_u="u", group_c="c", group_x="x", type="gaot",
        fix_x=False, domain_x=([-1.0, -1.0], [1.0, 1.0]), domain_t=None,
        active_variables=[0], chunked_variables=[0], num_variable_chunks=1,
        signed={"u": [True], "c": None},
        names={"u": ["$u$"], "c": ["$c_0$", "$c_1$"]},
        global_mean=[float(u_arr.mean())], global_std=[float(u_arr.std())])


def make_sequential_fx(path, num_samples=120, num_nodes=768,
                       num_timesteps=15, seed=2, norm_samples=None):
    """Heat-like decay: u(t+dt) is a LINEAR operator of u(t) (independent of
    t), so every stepper mode (output/residual/time_der) is cleanly
    learnable. u(x,t) = sum_k a_k exp(-nu |k|^2 t) sin/sin modes.

    nu is small so late-time targets keep O(1) norm: rel-L1 divides by the
    target norm, and with nu=0.2 the t=1 field decayed to ~exp(-3.6) in high
    modes — the direct/rollout metrics then amplified ~1e-4-relative weight
    differences into 1e-3..1e-2 metric gaps even though both frameworks'
    loss trajectories matched to 4 digits (measured: identical-init run,
    epoch-5 loss 0.131 ref vs 0.1305 gaot, epoch-100 val 0.0135 both, yet
    direct-metric gap 1.04e-3). Convergence parity needs the metric itself
    to sit in the flat basin, not on a cliff."""
    rng = np.random.default_rng(seed)
    coords = rng.uniform(0, 1, (num_nodes, 2)).astype(np.float64)
    t = np.linspace(0, 1, num_timesteps)
    nu = 0.05
    n_modes = 6
    u = np.zeros((num_samples, num_timesteps, num_nodes))
    for s in range(num_samples):
        k = rng.integers(1, 4, size=(n_modes, 2))
        phase = rng.uniform(0, 2 * np.pi, (n_modes, 2))
        amp = rng.normal(size=n_modes) / (k.sum(1) ** 1.5)
        lam = nu * (k ** 2).sum(1)
        modes = (np.sin(2 * np.pi * k[:, None, 0] * coords[None, :, 0]
                        + phase[:, None, 0])
                 * np.sin(2 * np.pi * k[:, None, 1] * coords[None, :, 1]
                          + phase[:, None, 1]))           # [M, N]
        decay = np.exp(-lam[:, None] * t[None, :])        # [M, T]
        u[s] = np.einsum("m,mt,mn->tn", amp, decay, modes)
    # norm_samples pins the normalization (and the metadata stats) to a
    # prefix of the sample set: appending extra TEST samples (the
    # eval_bigtest tool) then leaves the first `norm_samples` samples — and
    # therefore the training runs — bit-identical to the original dataset.
    ns = norm_samples or num_samples
    u = (u / u[:ns].std()).astype(np.float32)[..., None]  # [S, T, N, 1]
    x_arr = np.broadcast_to(coords[None, None].astype(np.float32),
                            (1, 1, num_nodes, 2))
    _write_nc(path, u=u, x=np.ascontiguousarray(x_arr))
    return dict(
        periodic=False, group_u="u", group_c=None, group_x="x", type="gaot",
        fix_x=True, domain_x=([0.0, 0.0], [1.0, 1.0]), domain_t=(0.0, 1.0),
        active_variables=[0], chunked_variables=[0], num_variable_chunks=1,
        signed={"u": [True], "c": None}, names={"u": ["$u$"], "c": None},
        global_mean=[float(u[:ns].mean())], global_std=[float(u[:ns].std())])


def _write_nc(path, **arrays):
    import h5py

    with h5py.File(path, "w") as f:
        for name, arr in arrays.items():
            f.create_dataset(name, data=arr)


# ----------------------------------------------------------------------
# recipes
# ----------------------------------------------------------------------
# Capacity deliberately modest relative to the training-set size (memorizing
# basins must be unattractive for BOTH frameworks) and the LR gentle —
# convergence-parity runs must land in the same minimum.
_STATIC_MODEL = {
    "latent_tokens_size": [16, 16],
    "args": {
        "magno": {"coord_dim": 2, "radius": 0.18, "hidden_size": 16,
                  "mlp_layers": 2, "lifting_channels": 16,
                  "scales": [1.0], "use_attention": True,
                  "attention_type": "cosine", "use_geoembed": True,
                  "embedding_method": "statistical",
                  "transform_type": "linear"},
        "transformer": {"patch_size": 2, "hidden_size": 64, "num_layers": 3,
                        "positional_embedding": "absolute",
                        "attn_config": {"num_heads": 4, "num_kv_heads": 4}},
    },
}

_STATIC_OPT = {
    "name": "adamw",
    "args": {"lr": 5e-4, "weight_decay": 1e-5, "epoch": 400,
             "eval_every_eps": 10, "scheduler": "mix",
             "max_lr": 5e-4, "min_lr": 1e-5, "final_lr": 1e-5,
             "early_save_metric": "val"},
}

CASES = {
    # shuffle=False everywhere: both frameworks then see IDENTICAL batch
    # sequences (same init via weight transplant, same pair enumeration —
    # verified against reference data_utils.py:121-135,165-170), so the
    # final-metric gap isolates framework numerics, not sampling noise.
    "static_fx": {
        "trainer": "static",
        "make": make_static_fx,
        "dataset": {"train_size": 288, "val_size": 32, "test_size": 32,
                    "batch_size": 32, "coord_scaling": "per_dim_scaling",
                    "shuffle": False, "num_workers": 0},
        "model": _STATIC_MODEL,
        "optimizer": _STATIC_OPT,
    },
    "static_vx": {
        "trainer": "static",
        "make": make_static_vx,
        "dataset": {"train_size": 144, "val_size": 16, "test_size": 16,
                    "batch_size": 16, "coord_scaling": "per_dim_scaling",
                    "shuffle": False, "num_workers": 0},
        "model": _STATIC_MODEL,
        "optimizer": {**_STATIC_OPT,
                      "args": {**_STATIC_OPT["args"], "epoch": 250}},
    },
}

for _mode in ("output", "residual", "time_der"):
    CASES[f"seq_{_mode}"] = {
        "trainer": "sequential",
        "make": make_sequential_fx,
        "dataset": {"train_size": 96, "val_size": 8, "test_size": 16,
                    "batch_size": 64, "coord_scaling": "per_dim_scaling",
                    "shuffle": False, "num_workers": 0,
                    "max_time_diff": 14, "time_step": 2,
                    "use_time_norm": True, "metric": "final_step",
                    "predict_mode": "all", "stepper_mode": _mode},
        "model": _STATIC_MODEL,
        "optimizer": {**_STATIC_OPT,
                      "args": {**_STATIC_OPT["args"], "epoch": 100,
                               "eval_every_eps": 5}},
    }


def metaname(case_name: str) -> str:
    return f"parity/{case_name}"


def ensure_dataset(case_name: str, data_dir: str) -> dict:
    """Generate the case dataset (idempotent); return metadata kwargs."""
    os.makedirs(data_dir, exist_ok=True)
    nc = os.path.join(data_dir, f"{case_name}.nc")
    meta_path = os.path.join(data_dir, f"{case_name}.meta.json")
    if os.path.exists(nc) and os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    meta = CASES[case_name]["make"](nc)
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return meta


def build_config(case_name: str, data_dir: str, workdir: str, side: str) -> dict:
    """Shared-schema config dict for either side ('ref' | 'gaot')."""
    case = CASES[case_name]
    out = os.path.join(workdir, side, case_name)
    cfg = {
        "setup": {"seed": 42, "trainer_name": case["trainer"],
                  "train": True, "test": False, "ckpt": False},
        "model": json.loads(json.dumps(case["model"])),
        "dataset": {"name": case_name, "metaname": metaname(case_name),
                    "base_path": data_dir, **case["dataset"]},
        "optimizer": json.loads(json.dumps(case["optimizer"])),
        "path": {"ckpt_path": f"{out}/ckpt/model.pt",
                 "loss_path": f"{out}/loss/loss.png",
                 "result_path": f"{out}/result/result.png",
                 "database_path": f"{out}/db/db.csv"},
    }
    if side == "ref":
        cfg["setup"]["device"] = "cpu"
        cfg["setup"]["dtype"] = "torch.float32"
        if case_name == "static_vx":
            # The reference model defaults to precompute_edges=False and its
            # trainer never overrides it — in vx mode the model then IGNORES
            # the per-sample graphs its own GraphBuilder precomputed,
            # recomputes neighbors in-forward, and caches them keyed ONLY by
            # tensor shape (src/model/layers/magno.py:177-186, 264-271): every
            # same-shaped batch after the first silently reuses batch 0's
            # graphs. gaot_tpu always uses the true per-sample graphs, so the
            # parity study runs the reference in its intended precomputed-
            # graph mode. Verified: with stale-graph caching the reference
            # plateaus at train loss 0.43 with rising val loss; both models
            # agree to ~1e-6 at init once the reference sees the real graphs.
            cfg["model"]["args"]["magno"]["precompute_edges"] = True
    else:
        cfg["setup"]["device"] = "cpu"
        cfg["setup"]["dtype"] = "float32"
        cfg["setup"]["compute_dtype"] = "float32"
        cfg["setup"]["epoch_scan"] = "auto"
    return cfg
