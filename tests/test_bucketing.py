"""Degree-bucketed graph tests: bucketize_graph invariants, unpermute_rows
VJP, and forward/gradient parity of the GAOT model between dense PaddedGraphs
and BucketedGraphs (the two layouts must compute identical per-query math)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaot_tpu.core.config import ModelConfig, merge_config
from gaot_tpu.data.graph_builder import GraphBuilder, prepare_fx_device_graphs
from gaot_tpu.models import GAOT
from gaot_tpu.ops import PaddedGraph, pad_csr, radius_search
from gaot_tpu.ops.gather_apply import unpermute_rows
from gaot_tpu.ops.padding import BucketedGraph, bucketize_graph, transpose_graph


def _random_graph(rng, q=200, n=150, k=None):
    """Heavy-tailed degree distribution like a radius graph."""
    deg = np.minimum(rng.geometric(0.25, size=q), 20)
    deg[rng.random(q) < 0.05] = 0           # some isolated queries
    kmax = int(np.ceil(deg.max() / 8) * 8)
    indices = np.zeros((q, kmax), dtype=np.int32)
    mask = np.zeros((q, kmax), dtype=bool)
    for i, d in enumerate(deg):
        indices[i, :d] = rng.integers(0, n, size=d)
        mask[i, :d] = True
    return PaddedGraph(indices, mask)


def _edge_set(graph: PaddedGraph, query_of_row=None):
    edges = []
    for r in range(graph.indices.shape[0]):
        q = r if query_of_row is None else query_of_row[r]
        for j in range(graph.k):
            if graph.mask[r, j]:
                edges.append((int(q), int(graph.indices[r, j]), j))
    return edges


def test_bucketize_preserves_edges_and_order():
    rng = np.random.default_rng(0)
    g = _random_graph(rng)
    bg = bucketize_graph(g, num_sources=150, with_transpose=False, tile=16)
    assert bg is not None
    q = g.indices.shape[0]
    # perm/inv_perm roundtrip on valid rows
    assert np.array_equal(bg.perm[bg.inv_perm], np.arange(q))
    assert bg.row_valid[bg.inv_perm].all()
    assert bg.row_valid.sum() == q
    # every real edge survives with its left-packed column order intact
    want = sorted(_edge_set(g))
    got = []
    off = 0
    for bucket in bg.buckets:
        nb = bucket.indices.shape[0]
        got += _edge_set(bucket, query_of_row=bg.perm[off:off + nb])
        off += nb
    assert sorted(got) == want
    # buckets really shrink the padded row count
    rows = sum(b.indices.size for b in bg.buckets)
    assert rows < g.indices.size


def test_bucketize_uniform_degree_returns_none():
    indices = np.arange(64 * 8, dtype=np.int32).reshape(64, 8) % 10
    mask = np.ones((64, 8), dtype=bool)
    assert bucketize_graph(PaddedGraph(indices, mask), 10) is None


def test_unpermute_rows_matches_take_and_gradients():
    rng = np.random.default_rng(1)
    m, r, c = 37, 48, 5
    inv_perm = rng.permutation(r)[:m].astype(np.int32)
    perm = np.zeros(r, dtype=np.int32)
    row_valid = np.zeros(r, dtype=bool)
    perm[inv_perm] = np.arange(m)
    row_valid[inv_perm] = True
    x = jnp.asarray(rng.normal(size=(2, r, c)).astype(np.float32))

    args = (jnp.asarray(inv_perm), jnp.asarray(perm), jnp.asarray(row_valid))
    out = unpermute_rows(x, *args)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.take(x, args[0], axis=-2)))

    def loss_custom(x):
        return jnp.sum(jnp.sin(unpermute_rows(x, *args)))

    def loss_ref(x):
        return jnp.sum(jnp.sin(jnp.take(x, args[0], axis=-2)))

    g_custom = jax.grad(loss_custom)(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


def _fx_workload(rng, num_nodes=180, grid=(8, 8), radius=0.35,
                 use_scale_weights=False, scales=(1.0,)):
    coords = rng.uniform(-1, 1, (num_nodes, 2)).astype(np.float32)
    axes = [np.linspace(-1, 1, grid[0]), np.linspace(-1, 1, grid[1])]
    lat = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 2)
    lat = lat.astype(np.float32)
    cfg = merge_config(ModelConfig, {
        "latent_tokens_size": list(grid),
        "args": {
            "magno": {"coord_dim": 2, "lifting_channels": 8, "hidden_size": 8,
                      "scales": list(scales),
                      "use_scale_weights": use_scale_weights},
            "transformer": {"patch_size": 2, "hidden_size": 16, "num_layers": 2},
        },
    })
    model = GAOT(input_size=3, output_size=2, config=cfg)
    enc, dec = GraphBuilder().build_fx_graphs(coords, lat, radius, list(scales))
    pndata = rng.normal(size=(2, num_nodes, 3)).astype(np.float32)
    return model, cfg, coords, lat, enc, dec, jnp.asarray(pndata)


@pytest.mark.parametrize("use_scale_weights,scales",
                         [(False, (1.0,)), (True, (1.0, 2.0))])
@pytest.mark.slow
def test_model_parity_bucketed_vs_dense(use_scale_weights, scales):
    rng = np.random.default_rng(2)
    model, cfg, coords, lat, enc, dec, pndata = _fx_workload(
        rng, use_scale_weights=use_scale_weights, scales=scales)
    lat_j, coords_j = jnp.asarray(lat), jnp.asarray(coords)

    magno = cfg.args.magno
    magno.use_query_bucketing = False
    enc_d, dec_d, enc_t, dec_t = prepare_fx_device_graphs(
        enc, dec, coords.shape[0], lat.shape[0], magno)
    magno.use_query_bucketing = True
    # tile=128 would put everything in one bucket at test sizes; use the
    # library default path but assert at least one scale actually bucketed
    enc_b = [bucketize_graph(g, coords.shape[0], tile=16) for g in enc]
    dec_b = [bucketize_graph(g, lat.shape[0], tile=16) for g in dec]
    assert any(b is not None for b in enc_b + dec_b)
    to_dev = lambda bg, fallback: (jax.tree.map(jnp.asarray, bg)
                                   if bg is not None else fallback)
    enc_b = [to_dev(b, g) for b, g in zip(enc_b, enc_d)]
    dec_b = [to_dev(b, g) for b, g in zip(dec_b, dec_d)]

    params = model.init(jax.random.key(0), lat_j, coords_j, pndata,
                        enc_d, dec_d, encoder_tgraphs=enc_t,
                        decoder_tgraphs=dec_t)

    out_dense = model.apply(params, lat_j, coords_j, pndata, enc_d, dec_d,
                            encoder_tgraphs=enc_t, decoder_tgraphs=dec_t)
    out_bucket = model.apply(params, lat_j, coords_j, pndata, enc_b, dec_b)
    np.testing.assert_allclose(np.asarray(out_bucket), np.asarray(out_dense),
                               rtol=2e-5, atol=2e-5)

    target = jnp.asarray(np.random.default_rng(3).normal(
        size=out_dense.shape).astype(np.float32))

    def loss(p, e, d, et, dt):
        pred = model.apply(p, lat_j, coords_j, pndata, e, d,
                           encoder_tgraphs=et, decoder_tgraphs=dt)
        return jnp.mean((pred - target) ** 2)

    g_dense = jax.grad(loss)(params, enc_d, dec_d, enc_t, dec_t)
    g_bucket = jax.grad(loss)(params, enc_b, dec_b, None, None)
    flat_d, _ = jax.flatten_util.ravel_pytree(g_dense)
    flat_b, _ = jax.flatten_util.ravel_pytree(g_bucket)
    np.testing.assert_allclose(np.asarray(flat_b), np.asarray(flat_d),
                               rtol=5e-4, atol=5e-5)


@pytest.mark.slow
def test_bucketed_transpose_backward_matches_plain():
    """The combined custom VJP (per-bucket forward/d_coef gathers, one d_f
    pass over the concat-space transpose graph) must match autodiff of the
    dense layout for both out, d_f, and d_coef."""
    rng = np.random.default_rng(4)
    n, q, c, b = 60, 90, 4, 3
    g = _random_graph(rng, q=q, n=n)
    bg = bucketize_graph(g, num_sources=n, with_transpose=True, tile=16)
    assert bg is not None and len(bg.buckets) > 1

    f = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    coef_full = rng.normal(size=(q, g.k, c)).astype(np.float32)
    coef_full = np.where(g.mask[..., None], coef_full, 0.0)

    from gaot_tpu.ops.gather_apply import (apply_bucketed_graph_transform,
                                           apply_graph_transform)

    def coef_buckets(coef_full):
        parts, off = [], 0
        for bucket in bg.buckets:
            nb = bucket.indices.shape[0]
            rows = bg.perm[off:off + nb]
            cb = jnp.where(jnp.asarray(bucket.mask[..., None]),
                           coef_full[rows][:, :bucket.k], 0.0)
            parts.append(cb)
            off += nb
        return parts

    bg_dev = jax.tree.map(jnp.asarray, bg)

    def out_dense(coef_full, f):
        # The mask lives inside the diff path (as in AGNO) so padded-edge
        # coef grads are zero in both layouts.
        cf = jnp.where(jnp.asarray(g.mask[..., None]), coef_full, 0.0)
        gj = PaddedGraph(jnp.asarray(g.indices), jnp.asarray(g.mask))
        return apply_graph_transform(cf, f, gj, None)

    def out_bucketed(coef_full, f):
        cat = apply_bucketed_graph_transform(coef_buckets(coef_full), f,
                                             bg_dev)          # [B, R, C]
        return unpermute_rows(cat, bg_dev.inv_perm, bg_dev.perm,
                              bg_dev.row_valid)               # [B, Q, C]

    coef_j = jnp.asarray(coef_full)
    np.testing.assert_allclose(np.asarray(out_bucketed(coef_j, f)),
                               np.asarray(out_dense(coef_j, f)),
                               rtol=1e-5, atol=1e-5)
    for argnum in (0, 1):
        g_d = jax.grad(lambda cf, f: jnp.sum(jnp.sin(out_dense(cf, f))),
                       argnum)(coef_j, f)
        g_b = jax.grad(lambda cf, f: jnp.sum(jnp.sin(out_bucketed(cf, f))),
                       argnum)(coef_j, f)
        np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_d),
                                   rtol=1e-5, atol=1e-5)




def test_fx_grouped_tgraph_matches_flat():
    """The fx batched bucketed VJP with an in-degree-grouped combined
    tgraph must match the flat combined tgraph in value and grads."""
    from gaot_tpu.ops.gather_apply import (apply_bucketed_graph_transform,
                                           bucketed_gather_multiply_reduce)
    from gaot_tpu.ops.padding import TransposeGraph, degree_group_tgraph

    rng = np.random.default_rng(4)
    n, q, c, b = 60, 90, 4, 3
    g = _random_graph(rng, q=q, n=n)
    bg = bucketize_graph(g, num_sources=n, with_transpose=True, tile=16)
    assert bg is not None
    gt = degree_group_tgraph(TransposeGraph(bg.tgraph.edge_pos[None],
                                            bg.tgraph.query[None],
                                            bg.tgraph.mask[None]))
    assert len(gt.groups) >= 2
    bg_flat = jax.tree.map(jnp.asarray, bg)
    bg_grp = jax.tree.map(jnp.asarray, bg._replace(tgraph=gt))

    f = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    coefs = []
    for bkt in bg.buckets:
        qb, kb = bkt.indices.shape
        cf = rng.normal(size=(qb, kb, c)).astype(np.float32)
        coefs.append(jnp.asarray(cf) * bkt.mask[..., None])

    def loss(which):
        bgx = bg_grp if which == "grouped" else bg_flat
        return lambda cfs, f: jnp.sum(jnp.sin(apply_bucketed_graph_transform(
            tuple(cfs), f, bgx, num_samples=1)))

    np.testing.assert_allclose(
        np.asarray(loss("grouped")(coefs, f)),
        np.asarray(loss("flat")(coefs, f)), rtol=1e-6)
    gq = jax.grad(loss("flat"), argnums=(0, 1))(coefs, f)
    gg = jax.grad(loss("grouped"), argnums=(0, 1))(coefs, f)
    np.testing.assert_allclose(np.asarray(gg[1]), np.asarray(gq[1]),
                               rtol=1e-4, atol=1e-5)
    for cq, cg_ in zip(gq[0], gg[0]):
        np.testing.assert_allclose(np.asarray(cg_), np.asarray(cq),
                                   rtol=1e-4, atol=1e-5)
