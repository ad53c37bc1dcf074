"""Multi-host (multi-process) data-parallel smoke test on CPU.

Launches N processes, each with M virtual CPU devices, coordinated via
jax.distributed; every process builds the same global ('data','model') mesh,
loads identical data, and runs jitted data-parallel train steps where each
process feeds only its addressable shard. Validates the multi-host path that
dryrun_multichip (single-process) cannot: cross-process collectives, global
batch placement, and identical loss trajectories on every host.

Usage:
  python scripts/multihost_smoke.py            # parent: spawns 2 procs x 4 dev
  (internal) multihost_smoke.py <pid> <nprocs> # child
"""
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NPROC = 2
DEV_PER_PROC = 4


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def child(process_id: int, num_processes: int, port: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={DEV_PER_PROC}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=num_processes,
                               process_id=process_id)
    import jax.numpy as jnp
    import optax

    from gaot_tpu.core.config import ModelConfig, merge_config
    from gaot_tpu.data.graph_builder import GraphBuilder
    from gaot_tpu.models import GAOT
    from gaot_tpu.ops.padding import PaddedGraph
    from gaot_tpu.parallel.mesh import make_mesh, replicated, shard_batch, shard_params
    from gaot_tpu.train.static_trainer import masked_mse

    assert jax.device_count() == num_processes * DEV_PER_PROC
    mesh = make_mesh(data_parallel=-1, model_parallel=1)
    batch = 2 * jax.device_count()

    rng = np.random.default_rng(0)
    n, latent_hw = 96, 8
    coords = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    lat = np.stack(np.meshgrid(*[np.linspace(-1, 1, latent_hw)] * 2,
                               indexing="ij"), -1).reshape(-1, 2).astype(np.float32)
    cfg = merge_config(ModelConfig, {
        "latent_tokens_size": [latent_hw, latent_hw],
        "args": {"magno": {"coord_dim": 2, "radius": 0.3, "hidden_size": 16,
                           "mlp_layers": 2, "lifting_channels": 8},
                 "transformer": {"patch_size": 2, "hidden_size": 32,
                                 "num_layers": 2,
                                 "attn_config": {"num_heads": 4,
                                                 "num_kv_heads": 4}}},
    })
    enc, dec = GraphBuilder().build_fx_graphs(coords, lat, 0.3, [1.0])
    to_dev = lambda g: jax.device_put(
        PaddedGraph(np.asarray(g.indices), np.asarray(g.mask)), replicated(mesh))
    enc = [to_dev(g) for g in enc]
    dec = [to_dev(g) for g in dec]

    model = GAOT(input_size=3, output_size=2, config=cfg)
    latent_j = jax.device_put(lat, replicated(mesh))
    coords_j = jax.device_put(coords, replicated(mesh))
    # identical data on every process (required for global batch placement)
    pndata = rng.normal(size=(batch, n, 3)).astype(np.float32)
    target = rng.normal(size=(batch, n, 2)).astype(np.float32)

    params = jax.jit(model.init)(jax.random.key(0), latent_j, coords_j,
                                 jax.device_put(pndata, replicated(mesh)), enc, dec)
    params = shard_params(params, mesh)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, pndata, target):
        def loss_fn(p):
            pred = model.apply(p, latent_j, coords_j, pndata, enc, dec)
            return masked_mse(pred, target, jnp.ones((pndata.shape[0],), bool))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for step in range(3):
        placed = shard_batch({"pndata": pndata, "target": target}, mesh, batch)
        params, opt_state, loss = train_step(params, opt_state,
                                             placed["pndata"], placed["target"])
        # loss is fully replicated → readable on every process
        losses.append(float(loss))
    print(f"proc {process_id}: losses {['%.6f' % l for l in losses]}", flush=True)
    assert losses[0] > losses[-1], "loss did not decrease"

    # --- trainer-level multi-host whole-epoch scan -----------------------
    # device_data buffers cannot be committed per-process (loader falls back
    # to host batches), but the trainer re-places them as GLOBAL replicated
    # arrays and runs the epoch as one sharded-index scan
    # (base_trainer._build_epoch_fn multi-host branch).
    import tempfile

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from synthetic import make_static_fx_dataset

    from gaot_tpu.train import StaticTrainer

    tmp = tempfile.mkdtemp(prefix=f"mh_scan_{process_id}_")
    # Seeded generator → byte-identical data on every process.
    make_static_fx_dataset(os.path.join(tmp, "mh_toy.npz"), seed=3)
    config = {
        "setup": {"seed": 0, "trainer_name": "static", "train": True,
                  "data_parallel": -1, "epoch_scan": "always"},
        "model": {
            "latent_tokens_size": [latent_hw, latent_hw],
            "args": {"magno": {"coord_dim": 2, "radius": 0.3,
                               "hidden_size": 16, "mlp_layers": 2,
                               "lifting_channels": 8},
                     "transformer": {"patch_size": 2, "hidden_size": 32,
                                     "num_layers": 2,
                                     "attn_config": {"num_heads": 4,
                                                     "num_kv_heads": 4}}},
        },
        "dataset": {"name": "mh_toy", "metaname": "elliptic_pdes/Poisson-Gauss",
                    "base_path": tmp, "train_size": 16, "val_size": 4,
                    "test_size": 4, "batch_size": 8, "shuffle": True,
                    "device_data": True},
        "optimizer": {"name": "adamw",
                      "args": {"lr": 1e-3, "epoch": 1, "eval_every_eps": 1,
                               "scheduler": "cos"}},
        "path": {k: os.path.join(tmp, v) for k, v in
                 [("ckpt_path", "ckpt/m.ckpt"), ("loss_path", "loss/l.png"),
                  ("result_path", "res/r.png"), ("database_path", "db/d.csv")]},
    }
    trainer = StaticTrainer(config)
    assert trainer._scan_available(), "multi-host scan path must be active"
    scan_losses = np.asarray(trainer.train_epoch_scan())
    assert np.isfinite(scan_losses).all()
    print(f"proc {process_id}: mh-scan losses "
          f"{['%.6f' % l for l in scan_losses]}", flush=True)
    jax.distributed.shutdown()


def parent() -> int:
    port = _free_port()
    procs = []
    for pid in range(NPROC):
        env = dict(os.environ)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(pid), str(NPROC),
             str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    rc = 0
    outs = []
    try:
        for pid, p in enumerate(procs):
            out, _ = p.communicate(timeout=540)
            outs.append(out)
            if p.returncode != 0:
                rc = 1
    finally:
        # A child stuck in jax.distributed.initialize (e.g. its peer died)
        # must not outlive the parent holding the port.
        for p in procs:
            if p.poll() is None:
                p.kill()
    loss_lines = sorted(l for o in outs for l in o.splitlines() if "losses" in l)
    for l in loss_lines:
        print(l)
    if rc:
        print("FAILED; full output:")
        for o in outs:
            print(o[-3000:])
        return 1
    # All processes must see identical replicated losses, for BOTH the raw
    # step loop and the trainer-level multi-host scan: group the lines by
    # content after the "proc N: " prefix — every distinct line must appear
    # once per process.
    from collections import Counter

    groups = Counter(l.split(": ", 1)[1] for l in loss_lines)
    assert len(loss_lines) == 2 * NPROC and all(
        c == NPROC for c in groups.values()), loss_lines
    print("multihost smoke OK")
    return 0


if __name__ == "__main__":
    if len(sys.argv) == 4:
        child(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
    else:
        sys.exit(parent())
