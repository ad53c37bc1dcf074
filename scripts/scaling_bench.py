#!/usr/bin/env python
"""Data-parallel scaling-efficiency harness.

Measures fx train-step throughput (samples/s) across mesh sizes 1, 2, 4, …
up to the available device count and reports parallel efficiency vs linear
scaling from the 1-device rate. Ready for real multi-chip hardware; on the
8-virtual-CPU-device mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu) it validates the plumbing — CPU timings are not
interpretable as chip efficiency.

Usage:
    python scripts/scaling_bench.py [per_device_batch] [num_nodes] [iters]

Prints one JSON line per mesh size:
    {"devices": N, "samples_per_sec": R, "efficiency_vs_1": E}
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(per_device_batch=8, num_nodes=2048, iters=10):
    import jax

    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms and jax.config.jax_platforms != env_platforms:
        try:
            jax.config.update("jax_platforms", env_platforms)
        except Exception:
            pass

    import jax.numpy as jnp
    import numpy as np

    import bench
    from gaot_tpu.parallel.mesh import make_mesh, replicated, shard_batch

    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    base_rate = None
    results = []
    for n in sizes:
        mesh = make_mesh(n, 1, devices=jax.devices()[:n])
        batch_size = per_device_batch * n
        (train_step, _, _, params, opt_state, pndata,
         target) = bench.build_workload(
            batch_size=batch_size, num_nodes=num_nodes, with_scan=False)
        params = jax.device_put(params, replicated(mesh))
        opt_state = jax.device_put(opt_state, replicated(mesh))
        placed = shard_batch({"pndata": np.asarray(pndata),
                              "target": np.asarray(target)}, mesh, batch_size)
        key = jax.random.key(0)
        from gaot_tpu.utils.timing import force_value

        for _ in range(2):  # compile + settle
            params, opt_state, loss = train_step(
                params, opt_state, key, placed["pndata"], placed["target"])
        # Value fetches, not block_until_ready — the tunneled runtime
        # defers compile+execution until a value is fetched
        # (utils/timing.py).
        force_value(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, loss = train_step(
                params, opt_state, key, placed["pndata"], placed["target"])
        force_value(loss)
        dt = time.perf_counter() - t0
        rate = iters * batch_size / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        row = {"devices": n, "samples_per_sec": round(rate, 2),
               "efficiency_vs_1": round(eff, 3),
               "loss": round(float(loss), 4)}
        results.append(row)
        print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    main(*args)
