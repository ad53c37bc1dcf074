"""Degree bucketing for vx (per-sample) graphs.

The batched bucketed layout (ops/padding.py::bucketize_graphs_stacked +
models/magno.py::flatten_vx_bucketed) must reproduce the dense vx path
exactly: same per-query math, same per-sample geoembed standardization,
same gradients — only the padding shrinks.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))


def _random_stacked_graph(rng, s, q, n, k_max):
    """Stacked [S, Q, K] graph with heavy-tailed per-row degrees."""
    deg = np.minimum(rng.geometric(0.15, size=(s, q)), k_max)
    deg[:, 0] = k_max                     # ensure max-degree rows exist
    idx = np.zeros((s, q, k_max), dtype=np.int32)
    mask = np.zeros((s, q, k_max), dtype=bool)
    for i in range(s):
        for row in range(q):
            d = deg[i, row]
            idx[i, row, :d] = rng.integers(0, n, d)
            mask[i, row, :d] = True
    from gaot_tpu.ops.padding import PaddedGraph

    return PaddedGraph(idx, mask)


def test_bucketize_graphs_stacked_roundtrip():
    from gaot_tpu.ops.padding import bucketize_graphs_stacked

    rng = np.random.default_rng(0)
    s, q, n, k = 4, 40, 50, 16
    g = _random_stacked_graph(rng, s, q, n, k)
    bb = bucketize_graphs_stacked(g, num_sources=n, tile=4, min_k=8)
    assert bb is not None
    # Every real edge must appear exactly once across buckets, per sample.
    for i in range(s):
        orig = set()
        rr, kk = np.nonzero(g.mask[i])
        for r_, k_ in zip(rr, kk):
            orig.add((r_, k_, g.indices[i, r_, k_]))
        got = set()
        for b, bg in enumerate(bb.buckets):
            rows, cols = np.nonzero(bg.mask[i])
            for r_, c_ in zip(rows, cols):
                orig_row = bb.perm[i, sum(bb.bucket_rows[:b]) + r_]
                got.add((orig_row, c_, bg.indices[i, r_, c_]))
        assert got == orig
    # inv_perm must invert perm on valid rows.
    for i in range(s):
        valid = bb.row_valid[i]
        rows = bb.perm[i][valid]
        pos = np.flatnonzero(valid)
        assert (bb.inv_perm[i][rows] == pos).all()


@pytest.mark.slow
def test_vx_bucketed_encoder_matches_dense():
    import jax
    import jax.numpy as jnp

    from gaot_tpu.core.config import MAGNOConfig
    from gaot_tpu.models.magno import MAGNOEncoder
    from gaot_tpu.ops.padding import (
        bucketize_graphs_stacked,
        transpose_graph,
        stack_tgraphs,
        PaddedGraph,
    )

    rng = np.random.default_rng(1)
    s, n, q_lat, k = 3, 48, 96, 16
    graph = _random_stacked_graph(rng, s, q_lat, n, k)
    tg = stack_tgraphs([
        transpose_graph(PaddedGraph(graph.indices[i], graph.mask[i]), n)
        for i in range(s)])
    bb = bucketize_graphs_stacked(graph, num_sources=n, tile=4, min_k=8,
                                  launch_penalty_rows=8)
    assert bb is not None and len(bb.buckets) > 1

    coords = rng.uniform(-1, 1, (s, n, 2)).astype(np.float32)
    lat = rng.uniform(-1, 1, (q_lat, 2)).astype(np.float32)
    pndata = rng.normal(size=(s, n, 3)).astype(np.float32)

    cfg = MAGNOConfig(coord_dim=2, radius=0.3, hidden_size=8, mlp_layers=2,
                      lifting_channels=8)
    enc = MAGNOEncoder(in_channels=3, out_channels=8, config=cfg,
                       agno_out_channels=8)

    to_j = lambda t: jax.tree.map(jnp.asarray, t)
    dense_args = ([to_j(graph)], [to_j(tg)])
    buck_args = ([to_j(bb)], None)

    params = enc.init(jax.random.key(0), jnp.asarray(coords),
                      jnp.asarray(pndata), jnp.asarray(lat), *[dense_args[0]])

    def run(graphs, tgraphs, x):
        return enc.apply(params, jnp.asarray(coords), x, jnp.asarray(lat),
                         graphs, tgraphs=tgraphs)

    out_dense = run(dense_args[0], dense_args[1], jnp.asarray(pndata))
    out_buck = run(buck_args[0], buck_args[1], jnp.asarray(pndata))
    np.testing.assert_allclose(np.asarray(out_buck), np.asarray(out_dense),
                               rtol=2e-5, atol=2e-5)

    # Gradients w.r.t. the input function must also match (exercises the
    # combined custom VJP on 2-D vx-flattened features).
    def loss(x, graphs, tgraphs):
        return jnp.sum(run(graphs, tgraphs, x) ** 2)

    g_dense = jax.grad(loss)(jnp.asarray(pndata), *dense_args)
    g_buck = jax.grad(loss)(jnp.asarray(pndata), *buck_args)
    np.testing.assert_allclose(np.asarray(g_buck), np.asarray(g_dense),
                               rtol=2e-4, atol=2e-4)
