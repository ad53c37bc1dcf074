"""Component-level timing of the flagship workload on the current device.

Times encoder / processor / decoder forward and the full train step, in
fp32 vs bf16 compute, to direct optimization work.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(batch_size=64, num_nodes=8192, latent=(64, 64)):
    import jax
    import jax.numpy as jnp

    from gaot_tpu.core.config import ModelConfig, merge_config
    from gaot_tpu.data.graph_builder import GraphBuilder
    from gaot_tpu.models import GAOT
    from gaot_tpu.ops.padding import PaddedGraph

    rng = np.random.default_rng(0)
    coords = rng.uniform(-1, 1, (num_nodes, 2)).astype(np.float32)
    axes = [np.linspace(-1, 1, latent[0]), np.linspace(-1, 1, latent[1])]
    lat = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 2).astype(np.float32)
    enc, dec = GraphBuilder().build_fx_graphs(coords, lat, 0.033, [1.0])
    print(f"enc K={enc[0].k} dec K={dec[0].k}", file=sys.stderr)
    to_dev = lambda g: PaddedGraph(jnp.asarray(g.indices), jnp.asarray(g.mask))
    enc = [to_dev(g) for g in enc]
    dec = [to_dev(g) for g in dec]
    latent_j, coords_j = jnp.asarray(lat), jnp.asarray(coords)
    pndata = jnp.asarray(rng.normal(size=(batch_size, num_nodes, 1)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(batch_size, num_nodes, 1)).astype(np.float32))

    for dtype_name, dtype in [("fp32", None), ("bf16", jnp.bfloat16)]:
        cfg = merge_config(ModelConfig, {
            "latent_tokens_size": list(latent),
            "args": {"magno": {"coord_dim": 2, "radius": 0.033, "hidden_size": 64,
                               "mlp_layers": 3, "lifting_channels": 64},
                     "transformer": {"patch_size": 2, "hidden_size": 256,
                                     "num_layers": 3}},
        })
        model = GAOT(input_size=1, output_size=1, config=cfg, dtype=dtype)
        params = jax.jit(model.init)(jax.random.key(0), latent_j, coords_j, pndata, enc, dec)

        bound = model.bind(params)

        @jax.jit
        def enc_fn(pndata):
            return bound.encode(coords_j, pndata, latent_j, enc)

        rnd = enc_fn(pndata)

        @jax.jit
        def proc_fn(rnd):
            return bound.process(rnd)

        prd = proc_fn(rnd)

        @jax.jit
        def dec_fn(prd):
            return bound.decode(latent_j, prd, coords_j, dec)

        @jax.jit
        def fwd(params, pndata):
            return model.apply(params, latent_j, coords_j, pndata, enc, dec)

        @jax.jit
        def step(params, pndata, target):
            def loss_fn(p):
                pred = model.apply(p, latent_j, coords_j, pndata, enc, dec)
                return jnp.mean((pred.astype(jnp.float32) - target) ** 2)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            return loss, grads

        t_enc = timeit(enc_fn, pndata)
        t_proc = timeit(proc_fn, rnd)
        t_dec = timeit(dec_fn, prd)
        t_fwd = timeit(fwd, params, pndata)
        t_step = timeit(lambda p, x, y: step(p, x, y)[0], params, pndata, target)
        print(f"[{dtype_name}] enc {t_enc*1e3:7.2f}ms  proc {t_proc*1e3:7.2f}ms  "
              f"dec {t_dec*1e3:7.2f}ms  fwd {t_fwd*1e3:7.2f}ms  "
              f"train {t_step*1e3:7.2f}ms  → {batch_size/t_step:7.1f} samples/s")


if __name__ == "__main__":
    main()
