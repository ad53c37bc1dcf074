"""Component-level timing of the flagship workload on the current device.

Times encoder / processor / decoder forward and the full train step in
fp32 vs bf16 compute, using the on-device loop timer (tpu_timeit) — host-side
timing is unreliable on tunneled devices.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tpu_timeit import device_timeit, make_variants  # noqa: E402


def main(batch_size=64, num_nodes=8192, latent=(64, 64), dtypes=None):
    import jax
    import jax.numpy as jnp

    from gaot_tpu.core.config import ModelConfig, merge_config
    from gaot_tpu.data.graph_builder import GraphBuilder
    from gaot_tpu.models import GAOT
    from gaot_tpu.ops.padding import PaddedGraph, transpose_graph

    rng = np.random.default_rng(0)
    coords = rng.uniform(-1, 1, (num_nodes, 2)).astype(np.float32)
    axes = [np.linspace(-1, 1, latent[0]), np.linspace(-1, 1, latent[1])]
    lat = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 2).astype(np.float32)
    enc_h, dec_h = GraphBuilder().build_fx_graphs(coords, lat, 0.033, [1.0])
    print(f"enc K={enc_h[0].k} dec K={dec_h[0].k}", file=sys.stderr)
    enc_t = [transpose_graph(g, num_nodes) for g in enc_h]
    dec_t = [transpose_graph(g, lat.shape[0]) for g in dec_h]
    to_dev = lambda g: PaddedGraph(jnp.asarray(g.indices), jnp.asarray(g.mask))
    enc = [to_dev(g) for g in enc_h]
    dec = [to_dev(g) for g in dec_h]
    latent_j, coords_j = jnp.asarray(lat), jnp.asarray(coords)

    variants = make_variants(
        [((batch_size, num_nodes, 1), jnp.float32)] * 2, n=4)
    pndata0 = variants[0][0]

    if dtypes is None:
        # each timed fn costs two tunnel AOT compiles; default to bf16 only
        dtypes = [("bf16", jnp.bfloat16)]
        if "--fp32" in sys.argv:
            dtypes.insert(0, ("fp32", None))
    for dtype_name, dtype in dtypes:
        cfg = merge_config(ModelConfig, {
            "latent_tokens_size": list(latent),
            "args": {"magno": {"coord_dim": 2, "radius": 0.033, "hidden_size": 64,
                               "mlp_layers": 3, "lifting_channels": 64},
                     "transformer": {"patch_size": 2, "hidden_size": 256,
                                     "num_layers": 3}},
        })
        model = GAOT(input_size=1, output_size=1, config=cfg, dtype=dtype)
        params = jax.jit(model.init)(jax.random.key(0), latent_j, coords_j,
                                     pndata0, enc, dec)
        bound = model.bind(params)

        rnd0 = jax.jit(lambda x: bound.encode(coords_j, x, latent_j, enc))(pndata0)
        prd0 = jax.jit(lambda r: bound.process(r))(rnd0)

        # Each fn takes the variant tuple; scalar-reduced by device_timeit.
        enc_fn = lambda x, y: bound.encode(coords_j, x, latent_j, enc)
        # Cast the dependency-forcing zero to the activation dtype: adding a
        # float32 scalar would silently promote the bf16 pipeline to f32.
        dep = lambda ref, x: ref + (0 * jnp.mean(x)).astype(ref.dtype)
        proc_fn = lambda x, y: bound.process(dep(rnd0, x))
        dec_fn = lambda x, y: bound.decode(latent_j, dep(prd0, x),
                                           coords_j, dec)
        fwd_fn = lambda x, y: model.apply(params, latent_j, coords_j, x, enc, dec)

        def step_fn(x, y):
            def loss_fn(p):
                pred = model.apply(p, latent_j, coords_j, x, enc, dec,
                                   training=True,
                                   rngs={"edge_drop": jax.random.key(0)},
                                   encoder_tgraphs=enc_t, decoder_tgraphs=dec_t)
                return jnp.mean((pred.astype(jnp.float32) - y) ** 2)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            return loss, jax.tree.map(jnp.sum, grads)

        times = {}
        for name, fn in [("enc", enc_fn), ("proc", proc_fn), ("dec", dec_fn),
                         ("fwd", fwd_fn), ("fwd+bwd", step_fn)]:
            times[name] = device_timeit(fn, variants, iters=20)
        print(f"[{dtype_name}] " + "  ".join(
            f"{k} {v*1e3:7.2f}ms" for k, v in times.items())
            + f"  → {batch_size / times['fwd+bwd']:7.1f} samples/s (no optimizer)")


if __name__ == "__main__":
    main()
