"""gather_multiply_reduce custom VJP: forward + gradient parity vs autodiff."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaot_tpu.ops.gather_apply import apply_graph_transform, gather_multiply_reduce
from gaot_tpu.ops.padding import PaddedGraph, pad_csr, transpose_graph
from gaot_tpu.ops.neighbor_search import radius_search


def _setup(seed=0, b=3, n=50, q=20, c=4):
    rng = np.random.default_rng(seed)
    src = rng.uniform(-1, 1, (n, 2))
    dst = rng.uniform(-1, 1, (q, 2))
    g = pad_csr(*radius_search(src, dst, 0.4), pad_multiple=4)
    t = transpose_graph(g, n)
    coef = rng.normal(size=(q, g.k, c)).astype(np.float32) * g.mask[..., None]
    f = rng.normal(size=(b, n, c)).astype(np.float32)
    return g, t, jnp.asarray(coef), jnp.asarray(f)


def _auto_forward(coef, f, indices):
    gathered = f[:, indices, :] if f.ndim == 3 else f[indices]
    cc = coef if coef.ndim == gathered.ndim else coef[None]
    return jnp.sum(cc * gathered, axis=-2)


def test_forward_matches_plain():
    g, t, coef, f = _setup()
    out = apply_graph_transform(coef, f, g, t)
    want = _auto_forward(coef, f, jnp.asarray(g.indices))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-6, atol=1e-6)  # einsum reduce order


@pytest.mark.parametrize("batched_coef", [False, True])
def test_grads_match_autodiff(batched_coef):
    g, t, coef, f = _setup()
    if batched_coef:
        coef = jnp.broadcast_to(coef[None], (f.shape[0],) + coef.shape) * \
            jnp.linspace(0.5, 1.5, f.shape[0])[:, None, None, None]
    idx = jnp.asarray(g.indices)

    def loss_custom(coef, f):
        return jnp.sum(apply_graph_transform(coef, f, g, t) ** 2)

    def loss_auto(coef, f):
        return jnp.sum(_auto_forward(coef, f, idx) ** 2)

    gc, gf = jax.grad(loss_custom, argnums=(0, 1))(coef, f)
    ac, af = jax.grad(loss_auto, argnums=(0, 1))(coef, f)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(af), rtol=1e-4, atol=1e-5)
    # padded-edge coef grads may differ (they're multiplied by 0 downstream);
    # compare only on valid edges
    valid = g.mask[..., None]
    if batched_coef:
        valid = valid[None]
    np.testing.assert_allclose(np.asarray(gc) * valid, np.asarray(ac) * valid,
                               rtol=1e-4, atol=1e-5)


def test_grads_unbatched_f():
    """vx-flattened path: f [N, C], coef [Q, K, C]."""
    g, t, coef, f = _setup()
    f2 = f[0]
    idx = jnp.asarray(g.indices)

    def loss_custom(coef, f2):
        return jnp.sum(apply_graph_transform(coef, f2, g, t) ** 2)

    def loss_auto(coef, f2):
        return jnp.sum(_auto_forward(coef, f2, idx) ** 2)

    gc, gf = jax.grad(loss_custom, argnums=(0, 1))(coef, f2)
    ac, af = jax.grad(loss_auto, argnums=(0, 1))(coef, f2)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(af), rtol=1e-4, atol=1e-5)
    valid = g.mask[..., None]
    np.testing.assert_allclose(np.asarray(gc) * valid, np.asarray(ac) * valid,
                               rtol=1e-4, atol=1e-5)


def test_flat_df_scan_matches_combined():
    """The per-sample-slab backward scan (num_samples > 1) must produce the
    same d_f/d_coef as the combined single-pass backward: vx flat batches are
    per-sample block structured (models/magno.py::flatten_vx_graph), which
    the scan exploits to keep each gather source VMEM-small."""
    from gaot_tpu.models.magno import flatten_vx_graph, flatten_vx_tgraph
    from gaot_tpu.ops.padding import repad, repad_tgraph, stack_graphs

    rng = np.random.default_rng(7)
    b, n, q, c = 4, 40, 16, 8
    srcs = rng.uniform(-1, 1, (b, n, 2))
    dst = rng.uniform(-1, 1, (q, 2))
    gs, ts = [], []
    for i in range(b):
        g = pad_csr(*radius_search(srcs[i], dst, 0.5), pad_multiple=4)
        gs.append(g)
    k = max(g.k for g in gs)
    gs = [repad(g, k) for g in gs]
    ts = [transpose_graph(g, n) for g in gs]
    kt = max(t.edge_pos.shape[-1] for t in ts)
    ts = [repad_tgraph(t, kt) for t in ts]
    stacked = stack_graphs(gs)
    t_st = type(ts[0])(np.stack([t.edge_pos for t in ts]),
                       np.stack([t.query for t in ts]),
                       np.stack([t.mask for t in ts]))
    flat_g = flatten_vx_graph(
        PaddedGraph(jnp.asarray(stacked.indices), jnp.asarray(stacked.mask)), n)
    flat_t = flatten_vx_tgraph(
        type(ts[0])(jnp.asarray(t_st.edge_pos), jnp.asarray(t_st.query),
                    jnp.asarray(t_st.mask)), q, k)
    coef = jnp.asarray(rng.normal(size=(b * q, k, c)).astype(np.float32))
    coef = coef * flat_g.mask[..., None]
    f = jnp.asarray(rng.normal(size=(b * n, c)).astype(np.float32))

    def loss(ns):
        def inner(coef, f):
            return jnp.sum(gather_multiply_reduce(
                coef, f, flat_g.indices, flat_t.edge_pos, flat_t.query,
                flat_t.mask, ns) ** 2)
        return inner

    gc1, gf1 = jax.grad(loss(1), argnums=(0, 1))(coef, f)
    gcb, gfb = jax.grad(loss(b), argnums=(0, 1))(coef, f)
    np.testing.assert_allclose(np.asarray(gfb), np.asarray(gf1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gcb), np.asarray(gc1),
                               rtol=1e-5, atol=1e-6)


def test_jit_and_vmap_compatible():
    g, t, coef, f = _setup()
    out = jax.jit(lambda c, x: apply_graph_transform(c, x, g, t))(coef, f)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_gaot_with_tgraphs_matches_without():
    """Full model forward/grad parity with and without transpose graphs."""
    from gaot_tpu.core.config import ModelConfig, merge_config
    from gaot_tpu.models import GAOT

    rng = np.random.default_rng(5)
    n, b = 60, 2
    coords = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    lat = np.stack(np.meshgrid(np.linspace(-1, 1, 8), np.linspace(-1, 1, 8),
                               indexing="ij"), -1).reshape(-1, 2).astype(np.float32)
    enc = pad_csr(*radius_search(coords, lat, 0.35))
    dec = pad_csr(*radius_search(lat, coords, 0.35))
    enc_t = transpose_graph(enc, n)
    dec_t = transpose_graph(dec, 64)
    to_dev = lambda g: PaddedGraph(jnp.asarray(g.indices), jnp.asarray(g.mask))
    enc_j, dec_j = [to_dev(enc)], [to_dev(dec)]

    cfg = merge_config(ModelConfig, {
        "latent_tokens_size": [8, 8],
        "args": {"magno": {"coord_dim": 2, "radius": 0.35, "hidden_size": 8,
                           "mlp_layers": 1, "lifting_channels": 8},
                 "transformer": {"patch_size": 2, "hidden_size": 16,
                                 "num_layers": 2,
                                 "attn_config": {"num_heads": 2,
                                                 "num_kv_heads": 2}}},
    })
    model = GAOT(input_size=3, output_size=2, config=cfg)
    pndata = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), jnp.asarray(lat), jnp.asarray(coords),
                        pndata, enc_j, dec_j)

    def loss(p, use_t):
        out = model.apply(p, jnp.asarray(lat), jnp.asarray(coords), pndata,
                          enc_j, dec_j,
                          encoder_tgraphs=[enc_t] if use_t else None,
                          decoder_tgraphs=[dec_t] if use_t else None)
        return jnp.sum(out ** 2)

    l0, l1 = float(loss(params, False)), float(loss(params, True))
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    for a, b_ in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_nbc_pallas_consumer_integration_matches_einsum(monkeypatch):
    """The K-major transposes wiring the Pallas consumers into the nbc custom
    VJP (the path that runs on TPU) matches the einsum fallback — exercised
    on CPU via interpret mode by forcing the gate open."""
    from jax.experimental.pallas import tpu as pltpu

    import gaot_tpu.ops.gather_apply as ga

    rng = np.random.default_rng(7)
    b, n, q, k, c = 8, 64, 32, 4, 16       # W = b*c = 128, valid tilings
    src = rng.uniform(-1, 1, (n, 2))
    dst = rng.uniform(-1, 1, (q, 2))
    g = pad_csr(*radius_search(src, dst, 0.9), k=k)
    t = transpose_graph(g, n)
    coef = jnp.asarray(rng.normal(size=(q, k, c)).astype(np.float32) * g.mask[..., None])
    f = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))

    def loss(coef, f):
        return jnp.sum(apply_graph_transform(coef, f, g, t) ** 2)

    # Reference: einsum fallback (gate closed on CPU)
    out_ref = apply_graph_transform(coef, f, g, t)
    gc_ref, gf_ref = jax.grad(loss, argnums=(0, 1))(coef, f)

    monkeypatch.setattr(ga, "_pallas_consumers_ok", lambda *a: True)
    with pltpu.force_tpu_interpret_mode():
        out = apply_graph_transform(coef, f, g, t)
        gc, gf = jax.grad(loss, argnums=(0, 1))(coef, f)

    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_ref),
                               rtol=1e-4, atol=1e-5)
    valid = g.mask[..., None]
    np.testing.assert_allclose(np.asarray(gc) * valid, np.asarray(gc_ref) * valid,
                               rtol=1e-4, atol=1e-5)


def test_grouped_km_matches_flat():
    """gather_multiply_reduce_km with an in-degree-grouped tgraph
    (ops/padding.py::degree_group_tgraph) must match the flat tgraph in
    value and grads — the grouping only drops masked padding rows from the
    backward gathers."""
    from gaot_tpu.models.magno import flatten_vx_graph, flatten_vx_tgraph
    from gaot_tpu.ops.gather_apply import gather_multiply_reduce_km
    from gaot_tpu.ops.padding import (degree_group_tgraph, repad,
                                      repad_tgraph, stack_graphs)

    rng = np.random.default_rng(3)
    b, n, q, c = 4, 40, 16, 8
    srcs = rng.uniform(-1, 1, (b, n, 2))
    dst = rng.uniform(-1, 1, (q, 2))
    gs = [pad_csr(*radius_search(srcs[i], dst, 0.5), pad_multiple=4)
          for i in range(b)]
    k = max(g.k for g in gs)
    gs = [repad(g, k) for g in gs]
    ts = [transpose_graph(g, n) for g in gs]
    kt = max(t.edge_pos.shape[-1] for t in ts)
    ts = [repad_tgraph(t, kt) for t in ts]
    stacked = stack_graphs(gs)
    t_st = type(ts[0])(np.stack([t.edge_pos for t in ts]),
                       np.stack([t.query for t in ts]),
                       np.stack([t.mask for t in ts]))
    grouped = degree_group_tgraph(t_st)
    assert len(grouped.groups) >= 2
    rows_flat = t_st.mask.shape[1] * t_st.mask.shape[2]
    rows_grp = sum(g.mask.shape[1] * g.mask.shape[2] for g in grouped.groups)
    assert rows_grp < rows_flat  # the padding actually shrank

    flat_g = flatten_vx_graph(
        PaddedGraph(jnp.asarray(stacked.indices), jnp.asarray(stacked.mask)), n)
    flat_t = flatten_vx_tgraph(
        type(ts[0])(jnp.asarray(t_st.edge_pos), jnp.asarray(t_st.query),
                    jnp.asarray(t_st.mask)), q, k)
    grouped_j = jax.tree.map(jnp.asarray, grouped)
    idx_t = flat_g.indices.T
    coef_km = jnp.asarray(rng.normal(size=(k, b * q, c)).astype(np.float32))
    coef_km = coef_km * flat_g.mask.T[..., None]
    f = jnp.asarray(rng.normal(size=(b * n, c)).astype(np.float32))

    def loss(tg):
        return lambda cf, f: jnp.sum(gather_multiply_reduce_km(
            cf, f, idx_t, tg, b) ** 2)

    out_f = loss(flat_t)(coef_km, f)
    out_g = loss(grouped_j)(coef_km, f)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_f), rtol=1e-6)
    gc_f, gf_f = jax.grad(loss(flat_t), argnums=(0, 1))(coef_km, f)
    gc_g, gf_g = jax.grad(loss(grouped_j), argnums=(0, 1))(coef_km, f)
    np.testing.assert_allclose(np.asarray(gf_g), np.asarray(gf_f),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gc_g), np.asarray(gc_f),
                               rtol=1e-5, atol=1e-6)


def test_grouped_bucketed_matches_flat():
    """The bucketed VJP with a grouped tgraph (vx-flattened layout) must
    match the flat combined-tgraph path in value and grads."""
    from gaot_tpu.models.magno import flatten_vx_bucketed
    from gaot_tpu.ops.gather_apply import bucketed_gather_multiply_reduce
    from gaot_tpu.ops.padding import (GroupedTransposeGraph,
                                      bucketize_graphs_stacked,
                                      degree_group_tgraph)
    from tests.test_vx_bucketing import _random_stacked_graph

    rng = np.random.default_rng(11)
    s, n, q, k = 3, 40, 32, 16
    graph = _random_stacked_graph(rng, s, q, n, k)
    bb = bucketize_graphs_stacked(graph, num_sources=n, tile=4, min_k=4,
                                  launch_penalty_rows=8)
    assert bb is not None and len(bb.buckets) > 1
    gt = degree_group_tgraph(bb.tgraph)
    to_j = lambda t: jax.tree.map(jnp.asarray, t)
    flat = flatten_vx_bucketed(to_j(bb), n)
    flat_g = flatten_vx_bucketed(to_j(bb._replace(tgraph=gt)), n)
    assert isinstance(flat_g.tgraph, GroupedTransposeGraph)

    coefs = []
    for g in flat.buckets:
        qb, kb = g.indices.shape
        cf = rng.normal(size=(qb, kb, 4)).astype(np.float32)
        coefs.append(jnp.asarray(cf) * g.mask[..., None])
    f = jnp.asarray(rng.normal(size=(s * n, 1, 4)).astype(np.float32))

    def loss(tg):
        return lambda cfs, f: jnp.sum(bucketed_gather_multiply_reduce(
            tuple(cfs), f, tuple(g.indices for g in flat.buckets),
            tg, s) ** 2)

    np.testing.assert_allclose(
        np.asarray(loss(flat_g.tgraph)(coefs, f)),
        np.asarray(loss(flat.tgraph)(coefs, f)), rtol=1e-6)
    gq = jax.grad(loss(flat.tgraph), argnums=(0, 1))(coefs, f)
    gg = jax.grad(loss(flat_g.tgraph), argnums=(0, 1))(coefs, f)
    np.testing.assert_allclose(np.asarray(gg[1]), np.asarray(gq[1]),
                               rtol=1e-4, atol=1e-5)
    for cq, cg_ in zip(gq[0], gg[0]):
        np.testing.assert_allclose(np.asarray(cg_), np.asarray(cq),
                                   rtol=1e-4, atol=1e-5)
