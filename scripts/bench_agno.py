"""Microbenchmark of the AGNO gather-multiply-reduce primitive.

Flagship encoder scale: B=64 batch, N=8192 source nodes, Q=4096 latent
queries, K=24 neighbors, C=64 channels. Compares the plain-XLA path
(backward = scatter-add) against the transpose-graph custom VJP
(backward = gathers), forward and forward+backward, plus the full
encoder/decoder stacks.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

from tpu_timeit import device_timeit  # noqa: E402


def main(b=64, n=8192, q=4096, k=24, c=64, dtype_name="bfloat16"):
    import jax
    import jax.numpy as jnp

    from gaot_tpu.data.graph_builder import GraphBuilder
    from gaot_tpu.ops.gather_apply import apply_graph_transform
    from gaot_tpu.ops.padding import PaddedGraph, transpose_graph

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    itemsize = 2 if dtype_name == "bfloat16" else 4
    rng = np.random.default_rng(0)
    coords = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    axes = [np.linspace(-1, 1, 64)] * 2
    lat = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 2).astype(np.float32)
    enc, _ = GraphBuilder().build_fx_graphs(coords, lat, 0.033, [1.0])
    g = enc[0]
    print(f"graph: Q={g.indices.shape[0]} K={g.k}", file=sys.stderr)
    tg = transpose_graph(g, n)
    graph = PaddedGraph(jnp.asarray(g.indices), jnp.asarray(g.mask))
    tgj = type(tg)(jnp.asarray(tg.edge_pos), jnp.asarray(tg.query),
                   jnp.asarray(tg.mask))

    qq, kk = graph.indices.shape
    mask3 = graph.mask[..., None]

    def make_var(seed):
        r = np.random.default_rng(seed)
        coef = jnp.asarray(r.normal(size=(qq, kk, c)).astype(np.float32),
                           dtype=dtype) * mask3
        f = jnp.asarray(r.normal(size=(b, n, c)).astype(np.float32), dtype=dtype)
        return coef, f

    variants = [make_var(i) for i in range(4)]

    cases = {
        "xla": lambda coef, f: apply_graph_transform(coef, f, graph, None),
        "tgraph": lambda coef, f: apply_graph_transform(coef, f, graph, tgj),
    }
    for name, fn in cases.items():
        def step(coef, f, fn=fn):
            def loss(coef, f):
                return jnp.sum(fn(coef, f).astype(jnp.float32) ** 2)
            return jax.value_and_grad(loss, argnums=(0, 1))(coef, f)

        t_f = device_timeit(fn, variants, iters=20)
        t_s = device_timeit(step, variants, iters=20)
        gb = (b * qq * kk * c * itemsize) / 1e9
        print(f"[{dtype_name}] gmr {name:7s} fwd {t_f*1e3:7.2f}ms "
              f"({gb/t_f:.0f} GB/s eff. gather)   fwd+bwd {t_s*1e3:7.2f}ms",
              flush=True)


if __name__ == "__main__":
    main(dtype_name=sys.argv[1] if len(sys.argv) > 1 else "bfloat16")
