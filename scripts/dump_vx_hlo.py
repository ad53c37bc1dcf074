"""Dump the optimized HLO of the bucketed vx train step and summarize the
largest fusions (maps profiler op names like `fusion.32` to their HLO
bodies) — attribution tool for vx backward optimization."""
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(batch_size=16, num_nodes=8192, train_size=16, latent=(64, 64)):
    import jax
    import jax.numpy as jnp
    import optax

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

    split = builder.build_vx_split(coords, lat, 0.033, [1.0])
    bucketize_vx_splits([split], lat.shape[0], 1, True)
    attach_transpose_graphs([split], lat.shape[0], 1)
    bufs = jax.device_put(vx_graph_buffers(split))
    i = jnp.arange(batch_size, dtype=jnp.int32)
    batch = {k: v[i] for k, v in bufs.items()}
    enc, dec, enc_t, dec_t = vx_batch_graphs(batch, 1)

    x = batch["x"]
    node_mask = batch["node_mask"]
    pndata = jnp.asarray(rng.normal(
        size=(batch_size, x.shape[1], 1)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.key(0), latent_j, x, pndata,
                                 enc, dec, encoder_tgraphs=enc_t,
                                 decoder_tgraphs=dec_t)
    tx = optax.adamw(8e-4, weight_decay=1e-5)
    opt_state = tx.init(params)

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

    lowered = jax.jit(step).lower(params, opt_state, pndata)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    out_path = "/tmp/vx_step_hlo.txt"
    with open(out_path, "w") as f:
        f.write(hlo)
    print(f"wrote {len(hlo)} bytes to {out_path}")

    # Summarize requested fusions: print the fused computation bodies.
    for name in sys.argv[4:] or ["fusion.32", "fusion.34", "fusion.33"]:
        m = re.search(rf"%?{re.escape(name)} = .*", hlo)
        if not m:
            print(f"-- {name}: not found")
            continue
        line = m.group(0)
        print(f"\n== {name} ==\n{line[:2000]}")
        cm = re.search(r"calls=([%\w.\-]+)", line)
        if cm:
            comp = cm.group(1).lstrip("%")
            cb = re.search(rf"%?{re.escape(comp)} \([^)]*\) -> [^{{]+\{{(.*?)\n\}}",
                           hlo, re.S)
            if cb:
                body = cb.group(1)
                print(f"-- body of {comp} ({len(body.splitlines())} lines):")
                print(body[:4000])


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    main(*args)
