"""Component-level timing of the vx (variable-coordinate) workload.

Times MAGNO encoder fwd, decoder fwd, full forward, and the full train step
on the current device with the on-device loop timer, for both the dense and
degree-bucketed graph layouts — attribution for the vx throughput gap
(bench.py BENCH_MODE=vx).

Usage: python scripts/profile_vx.py [batch] [nodes] [train_size]
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tpu_timeit import device_timeit  # noqa: E402


def main(batch_size=16, num_nodes=8192, train_size=16, latent=(64, 64)):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/gaot_jax_cache"))

    from gaot_tpu.core.config import ModelConfig, merge_config
    from gaot_tpu.data.graph_builder import (
        GraphBuilder,
        attach_transpose_graphs,
        bucketize_vx_splits,
        vx_batch_graphs,
        vx_graph_buffers,
    )
    from gaot_tpu.models import GAOT
    from gaot_tpu.train.static_trainer import masked_mse

    rng = np.random.default_rng(0)
    coords = rng.uniform(-1, 1, (train_size, num_nodes, 2)).astype(np.float32)
    if os.environ.get("VX_MORTON", "0") == "1":
        from gaot_tpu.ops.padding import morton_order

        coords = np.stack([c[morton_order(c)] for c in coords])
        print("morton: spatially sorted per-sample nodes", file=sys.stderr)
    axes = [np.linspace(-1, 1, latent[0]), np.linspace(-1, 1, latent[1])]
    lat = np.stack(np.meshgrid(*axes, indexing="ij"),
                   -1).reshape(-1, 2).astype(np.float32)
    cfg = merge_config(ModelConfig, {
        "latent_tokens_size": list(latent),
        "args": {
            "magno": {"coord_dim": 2, "radius": 0.033, "hidden_size": 64,
                      "mlp_layers": 3, "lifting_channels": 64},
            "transformer": {"patch_size": 2, "hidden_size": 256,
                            "num_layers": 3},
        },
    })
    builder = GraphBuilder.from_magno_config(cfg.args.magno)
    model = GAOT(input_size=1, output_size=1, config=cfg, dtype=jnp.bfloat16)
    latent_j = jnp.asarray(lat)

    def build(bucketed):
        split = builder.build_vx_split(coords, lat, 0.033, [1.0])
        if bucketed:
            bucketize_vx_splits([split], lat.shape[0], 1, True)
        attach_transpose_graphs([split], lat.shape[0], 1)
        bufs = jax.device_put(vx_graph_buffers(split))
        i = jnp.arange(batch_size, dtype=jnp.int32)
        batch = {k: v[i] for k, v in bufs.items()}
        enc, dec, enc_t, dec_t = vx_batch_graphs(batch, 1)
        return batch, enc, dec, enc_t, dec_t

    import optax

    tx = optax.adamw(8e-4, weight_decay=1e-5)
    pnd = jnp.asarray(rng.normal(
        size=(batch_size, num_nodes + 64, 1)).astype(np.float32))

    layouts = {"dense": False, "bucketed": True}
    sel = os.environ.get("VX_LAYOUTS", "dense,bucketed").split(",")
    for name, bucketed in ((n, layouts[n]) for n in sel):
        batch, enc, dec, enc_t, dec_t = build(bucketed)
        x = batch["x"]
        node_mask = batch["node_mask"]
        pndata = pnd[:, : x.shape[1], :]
        params = jax.jit(model.init)(jax.random.key(0), latent_j, x, pndata,
                                     enc, dec, encoder_tgraphs=enc_t,
                                     decoder_tgraphs=dec_t)
        opt_state = tx.init(params)

        def enc_fwd(p):
            return model.apply(params, x, p, latent_j, enc,
                               tgraphs=enc_t, method="encode")

        rndata0 = jax.jit(enc_fwd)(pndata)

        def dec_fwd(r):
            return model.apply(params, latent_j, r, x, dec, tgraphs=dec_t,
                               method="decode")

        def full_fwd(p):
            return model.apply(params, latent_j, x, p, enc, dec,
                               encoder_tgraphs=enc_t, decoder_tgraphs=dec_t)

        def step(p, o, pd):
            def loss_fn(pp):
                pred = model.apply(pp, latent_j, x, pd, enc, dec,
                                   training=True,
                                   rngs={"edge_drop": jax.random.key(0)},
                                   encoder_tgraphs=enc_t,
                                   decoder_tgraphs=dec_t)
                return masked_mse(pred, pd, jnp.ones((batch_size,), bool),
                                  node_mask)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        n_var = 2
        # Backward ablations: grad of each stage in isolation (w.r.t. params
        # AND the stage input, matching the train step's backward work)
        # attributes the train_step-minus-forward gap — the dominant vx cost —
        # to stages.
        def enc_apply(pp, v):
            return model.apply(pp, x, v, latent_j, enc, tgraphs=enc_t,
                               method="encode")

        def dec_apply(pp, r):
            return model.apply(pp, latent_j, r, x, dec, tgraphs=dec_t,
                               method="decode")

        enc_grad = jax.grad(lambda pp, v: jnp.sum(enc_apply(pp, v)),
                            argnums=(0, 1))
        dec_grad = jax.grad(lambda pp, r: jnp.sum(dec_apply(pp, r)),
                            argnums=(0, 1))
        full_grad = jax.grad(
            lambda pp, v: jnp.sum(model.apply(
                pp, latent_j, x, v, enc, dec, encoder_tgraphs=enc_t,
                decoder_tgraphs=dec_t)), argnums=(0, 1))

        pnds = [pndata * (1.0 + 0.01 * i) for i in range(n_var)]
        rnds = [rndata0 * (1 + 0.01 * i) for i in range(n_var)]
        rows = [
            ("enc_fwd", enc_fwd, [(v,) for v in pnds], 20),
            ("dec_fwd", dec_fwd, [(v,) for v in rnds], 20),
            ("full_fwd", full_fwd, [(v,) for v in pnds], 20),
            ("enc_fwd+bwd", enc_grad, [(params, v) for v in pnds], 10),
            ("dec_fwd+bwd", dec_grad, [(params, v) for v in rnds], 10),
            ("full_fwd+bwd", full_grad, [(params, v) for v in pnds], 10),
            ("train_step", step, [(params, opt_state, v) for v in pnds], 10),
        ]
        # Print each row as it lands: compile time on a contended host can
        # dominate, and partial attributions are still useful.
        for label, fn, argsets, iters in rows:
            secs = device_timeit(fn, argsets, iters=iters)
            print(f"{name:9s} {label:12s} {secs * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    main(*args)
