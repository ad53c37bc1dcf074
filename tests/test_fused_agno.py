"""Fused per-edge AGNO kernel (ops/pallas/fused_agno.py) vs the XLA oracle.

Runs the Pallas kernels in interpreter mode on CPU: forward against
reference_fused_agno, backward (dW/db and the edge-major coefficient) against
jax.grad of the oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaot_tpu.ops.pallas.fused_agno import (
    fused_agno_bwd,
    fused_agno_fwd,
    fused_supported,
    reference_fused_agno,
)


def _setup(k=8, q=64, c_f=16, d=2, hidden=16, n_layers=3, seed=0,
           dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    cg = c_f + d
    gath = rng.normal(size=(k, q, cg)).astype(np.float32)
    dst_q = rng.uniform(-1, 1, (q, d)).astype(np.float32)
    mask = rng.uniform(size=(q, k)) < 0.8
    mask[0, :] = False                      # one fully-masked query
    sizes = [2 * d] + [hidden] * (n_layers - 1) + [c_f]
    ws = [rng.normal(size=(sizes[i], sizes[i + 1])).astype(np.float32) * 0.5
          for i in range(n_layers)]
    bs = [rng.normal(size=(sizes[i + 1],)).astype(np.float32) * 0.1
          for i in range(n_layers)]
    cast = lambda a: jnp.asarray(a, dtype)
    return ([cast(w) for w in ws], [cast(b) for b in bs], cast(gath),
            cast(dst_q), jnp.asarray(mask))


@pytest.mark.parametrize("use_attn", [True, False])
@pytest.mark.parametrize("n_layers", [1, 3])
def test_fused_forward_matches_oracle(use_attn, n_layers):
    ws, bs, gath, dst_q, mask = _setup(n_layers=n_layers)
    assert fused_supported(8, 64, 18, 16, 2, n_layers, gath.dtype) > 0
    out = fused_agno_fwd(ws, bs, gath, dst_q, mask, c_f=16, d=2,
                         use_attn=use_attn, interpret=True)
    ref = reference_fused_agno(ws, bs, gath, dst_q, mask, c_f=16, d=2,
                               use_attn=use_attn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("use_attn", [True, False])
def test_fused_backward_matches_oracle(use_attn):
    ws, bs, gath, dst_q, mask = _setup()
    rng = np.random.default_rng(1)
    dout = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))

    coef_e, dws, dbs = fused_agno_bwd(ws, bs, gath, dst_q, mask, dout,
                                      c_f=16, d=2, use_attn=use_attn,
                                      interpret=True)

    def loss(ws, bs):
        out = reference_fused_agno(ws, bs, gath, dst_q, mask, c_f=16, d=2,
                                   use_attn=use_attn)
        return jnp.sum(out * dout)

    gws, gbs = jax.grad(loss, argnums=(0, 1))(ws, bs)
    for got, want in list(zip(dws, gws)) + list(zip(dbs, gbs)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    # coef_e must reproduce the oracle's per-edge coefficient, edge-major:
    # out[q] == sum_k coef_e[q*K + k] * gath[k, q, :c_f]
    k, q, _ = gath.shape
    ce = np.asarray(coef_e).reshape(q, k, 16)
    recon = np.einsum("qkc,kqc->qc", ce,
                      np.asarray(gath[:, :, :16], np.float32))
    ref = np.asarray(reference_fused_agno(ws, bs, gath, dst_q, mask,
                                          c_f=16, d=2, use_attn=use_attn))
    np.testing.assert_allclose(recon, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("use_attn", [True, False])
@pytest.mark.parametrize("c", [1, 8])
def test_fused_flat_agno_matches_xla_path(monkeypatch, use_attn, c):
    """The model-level fused route (AGNO._fused_flat_km, forced via
    GAOT_FUSED_AGNO=1 → interpret mode on CPU) agrees with the XLA flat path
    on outputs AND parameter/feature gradients. f32 tolerances are loose
    only where the fused kernel's tanh GELU differs from the XLA path's
    exact erf GELU. c=1 exercises the lane-padding route (_pad_cf — the
    encoder's raw-input width)."""
    from gaot_tpu.models.agno import AGNO
    from gaot_tpu.ops import PaddedGraph, pad_csr, radius_search
    from gaot_tpu.ops.padding import transpose_graph

    rng = np.random.default_rng(3)
    n, q, d = 96, 64, 2
    y = rng.uniform(-1, 1, (n, d)).astype(np.float32)
    x = rng.uniform(-1, 1, (q, d)).astype(np.float32)
    graph_h = pad_csr(*radius_search(y, x, 0.4), pad_multiple=8)
    tg = transpose_graph(graph_h, n)
    graph = PaddedGraph(jnp.asarray(graph_h.indices), jnp.asarray(graph_h.mask))
    f_y = rng.normal(size=(n, c)).astype(np.float32)

    model = AGNO(channel_mlp_features=(16, 16, c), transform_type="linear",
                 use_attn=use_attn, attention_type="cosine", coord_dim=d)
    params = model.init(jax.random.key(0), jnp.asarray(y), graph,
                        x=jnp.asarray(x), f_y=jnp.asarray(f_y), tgraph=tg)

    def run(p, f):
        return model.apply(p, jnp.asarray(y), graph, x=jnp.asarray(x),
                           f_y=f, tgraph=tg, num_samples=2)

    def loss(p, f):
        return jnp.sum(run(p, f) ** 2)

    monkeypatch.setenv("GAOT_FUSED_AGNO", "0")
    out_xla = run(params, jnp.asarray(f_y))
    g_xla = jax.grad(loss, argnums=(0, 1))(params, jnp.asarray(f_y))

    monkeypatch.setenv("GAOT_FUSED_AGNO", "1")
    out_fused = run(params, jnp.asarray(f_y))
    g_fused = jax.grad(loss, argnums=(0, 1))(params, jnp.asarray(f_y))

    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla),
                               rtol=2e-2, atol=2e-3)
    for got, want in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-2, atol=5e-2)


def test_fused_bf16_close_to_f32():
    ws, bs, gath, dst_q, mask = _setup(dtype=jnp.bfloat16)
    out = fused_agno_fwd(ws, bs, gath, dst_q, mask, c_f=16, d=2,
                         use_attn=True, interpret=True)
    wsf = [w.astype(jnp.float32) for w in ws]
    bsf = [b.astype(jnp.float32) for b in bs]
    ref = reference_fused_agno(wsf, bsf, gath.astype(jnp.float32), dst_q,
                               mask, c_f=16, d=2, use_attn=True)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("use_attn", [True, False])
@pytest.mark.parametrize("c", [1, 8])
def test_fused_bucketed_agno_matches_xla_path(monkeypatch, use_attn, c):
    """The model-level fused bucketed route (AGNO._fused_bucketed, forced via
    GAOT_FUSED_AGNO=1 → interpret mode on CPU) agrees with the XLA bucketed
    path on outputs AND parameter/feature gradients (same GELU-approximation
    tolerances as the flat test). c=1 exercises the lane-padding route."""
    from gaot_tpu.models.agno import AGNO
    from gaot_tpu.ops import pad_csr, radius_search
    from gaot_tpu.ops.padding import bucketize_graph

    rng = np.random.default_rng(5)
    n, q, d = 150, 200, 2
    y = rng.uniform(-1, 1, (n, d)).astype(np.float32)
    x = rng.uniform(-1, 1, (q, d)).astype(np.float32)
    # Heavy-tailed degrees (like a radius graph) so bucketing actually
    # produces several K buckets (same recipe as tests/test_bucketing.py).
    deg = np.minimum(rng.geometric(0.25, size=q), 20)
    deg[rng.random(q) < 0.05] = 0
    kmax = int(np.ceil(deg.max() / 8) * 8)
    idx = np.zeros((q, kmax), dtype=np.int32)
    msk = np.zeros((q, kmax), dtype=bool)
    for i, dg in enumerate(deg):
        idx[i, :dg] = rng.integers(0, n, size=dg)
        msk[i, :dg] = True
    from gaot_tpu.ops.padding import PaddedGraph as PG
    g = PG(idx, msk)
    bg = bucketize_graph(g, num_sources=n, with_transpose=True, tile=16)
    assert bg is not None and len(bg.buckets) > 1
    bg = jax.tree.map(jnp.asarray, bg)
    x_cat = jnp.asarray(x)[bg.perm] * bg.row_valid[:, None]
    f_y = rng.normal(size=(n, c)).astype(np.float32)

    model = AGNO(channel_mlp_features=(16, 16, c), transform_type="linear",
                 use_attn=use_attn, attention_type="cosine", coord_dim=d)
    params = model.init(jax.random.key(0), jnp.asarray(y), bg, x=x_cat,
                        f_y=jnp.asarray(f_y))

    valid = np.asarray(bg.row_valid)[:, None]

    def run(p, f):
        out = model.apply(p, jnp.asarray(y), bg, x=x_cat, f_y=f)
        return out * valid                       # pad rows: don't compare

    def loss(p, f):
        return jnp.sum(run(p, f) ** 2)

    monkeypatch.setenv("GAOT_FUSED_AGNO", "0")
    out_xla = run(params, jnp.asarray(f_y))
    g_xla = jax.grad(loss, argnums=(0, 1))(params, jnp.asarray(f_y))

    monkeypatch.setenv("GAOT_FUSED_AGNO", "1")
    out_fused = run(params, jnp.asarray(f_y))
    g_fused = jax.grad(loss, argnums=(0, 1))(params, jnp.asarray(f_y))

    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla),
                               rtol=2e-2, atol=2e-3)
    for got, want in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-2, atol=5e-2)


def test_fused_bf16_geoembed_keeps_fp32_coords(monkeypatch):
    """Under bf16 compute the fused route must NOT feed geoembed the
    kernel's bf16-quantized coordinate rows (advisor round-3 finding): on a
    fine mesh (spacing ~1e-3 near coordinate 1.0) bf16 coord quantization
    corrupts the diff/variance/covariance statistics. Fused and unfused
    bf16 paths must agree to kernel-approximation tolerance — both gather
    geoembed coords in fp32."""
    import jax
    import jax.numpy as jnp

    from gaot_tpu.core.config import MAGNOConfig
    from gaot_tpu.models.magno import MAGNOEncoder
    from gaot_tpu.ops import pad_csr, radius_search
    from gaot_tpu.ops.padding import PaddedGraph, stack_tgraphs, transpose_graph

    rng = np.random.default_rng(11)
    s, n, q_lat = 2, 96, 32
    # Fine mesh: coords clustered in [0.9, 0.95] where bf16 ulp ~0.002 is
    # comparable to the 0.01 search radius.
    coords = (0.9 + 0.05 * rng.uniform(size=(s, n, 2))).astype(np.float32)
    lat = (0.9 + 0.05 * rng.uniform(size=(q_lat, 2))).astype(np.float32)
    pndata = rng.normal(size=(s, n, 3)).astype(np.float32)

    graphs = [pad_csr(*radius_search(coords[i], lat, 0.015), pad_multiple=8)
              for i in range(s)]
    k = max(g.indices.shape[-1] for g in graphs)
    idx = np.stack([np.pad(g.indices, ((0, 0), (0, k - g.indices.shape[-1])))
                    for g in graphs])
    msk = np.stack([np.pad(g.mask, ((0, 0), (0, k - g.mask.shape[-1])))
                    for g in graphs])
    assert msk.sum() > 50
    stacked = PaddedGraph(jnp.asarray(idx), jnp.asarray(msk))
    tg = stack_tgraphs([
        transpose_graph(PaddedGraph(idx[i], msk[i]), n) for i in range(s)])

    cfg = MAGNOConfig(coord_dim=2, radius=0.015, hidden_size=8, mlp_layers=2,
                      lifting_channels=8, use_geoembed=True)
    enc = MAGNOEncoder(in_channels=3, out_channels=8, config=cfg,
                       agno_out_channels=8, dtype=jnp.bfloat16)
    params = enc.init(jax.random.key(0), jnp.asarray(coords),
                      jnp.asarray(pndata), jnp.asarray(lat), [stacked],
                      tgraphs=[tg])

    def run():
        return np.asarray(enc.apply(
            params, jnp.asarray(coords), jnp.asarray(pndata),
            jnp.asarray(lat), [stacked], tgraphs=[tg]), np.float32)

    monkeypatch.setenv("GAOT_FUSED_AGNO", "0")
    out_xla = run()
    monkeypatch.setenv("GAOT_FUSED_AGNO", "1")
    out_fused = run()
    np.testing.assert_allclose(out_fused, out_xla, rtol=1e-1, atol=5e-2)


@pytest.mark.slow
def test_fused_magno_geoembed_sharing(monkeypatch):
    """MAGNO-level fused routes with use_geoembed=True: geoembed consumes
    the coordinate slice of the fused kernel's gathered rows (return_rep)
    instead of its own [E, d] gather. Forced fused (GAOT_FUSED_AGNO=1 →
    interpret mode, f32 on CPU) must agree with the XLA path on outputs and
    input-function gradients for BOTH the flat (dense vx) and bucketed
    layouts. Tolerances as in the flat/bucketed AGNO tests (tanh vs erf
    GELU)."""
    import jax
    import jax.numpy as jnp

    from gaot_tpu.core.config import MAGNOConfig
    from gaot_tpu.models.magno import MAGNOEncoder
    from gaot_tpu.ops.padding import (
        PaddedGraph,
        bucketize_graphs_stacked,
        stack_tgraphs,
        transpose_graph,
    )
    from gaot_tpu.ops import pad_csr, radius_search

    rng = np.random.default_rng(7)
    # Sizes chosen for interpret-mode cost: the fused kernel runs in Pallas
    # interpret mode on CPU, which is ~1000x slower than compiled — this
    # test's wall time is linear in rows*K.
    s, n, q_lat = 2, 40, 24
    coords = rng.uniform(-1, 1, (s, n, 2)).astype(np.float32)
    lat = rng.uniform(-1, 1, (q_lat, 2)).astype(np.float32)
    pndata = rng.normal(size=(s, n, 3)).astype(np.float32)

    graphs, masks = [], []
    for i in range(s):
        g = pad_csr(*radius_search(coords[i], lat, 0.5), pad_multiple=8)
        graphs.append(g)
    k = max(g.indices.shape[-1] for g in graphs)
    idx = np.stack([np.pad(g.indices, ((0, 0), (0, k - g.indices.shape[-1])))
                    for g in graphs])
    msk = np.stack([np.pad(g.mask, ((0, 0), (0, k - g.mask.shape[-1])))
                    for g in graphs])
    stacked = PaddedGraph(jnp.asarray(idx), jnp.asarray(msk))
    tg = stack_tgraphs([
        transpose_graph(PaddedGraph(idx[i], msk[i]), n) for i in range(s)])
    bb = bucketize_graphs_stacked(stacked, num_sources=n, tile=4, min_k=8,
                                  launch_penalty_rows=8)
    assert bb is not None

    cfg = MAGNOConfig(coord_dim=2, radius=0.5, hidden_size=8, mlp_layers=2,
                      lifting_channels=8, use_geoembed=True)
    enc = MAGNOEncoder(in_channels=3, out_channels=8, config=cfg,
                       agno_out_channels=8)
    params = enc.init(jax.random.key(0), jnp.asarray(coords),
                      jnp.asarray(pndata), jnp.asarray(lat), [stacked],
                      tgraphs=[tg])

    def run(x, graphs_, tgraphs_):
        return enc.apply(params, jnp.asarray(coords), x, jnp.asarray(lat),
                         graphs_, tgraphs=tgraphs_)

    def loss(x, graphs_, tgraphs_):
        return jnp.sum(run(x, graphs_, tgraphs_) ** 2)

    x = jnp.asarray(pndata)
    for graphs_, tgraphs_, label in (([stacked], [tg], "flat"),
                                     ([bb], None, "bucketed")):
        monkeypatch.setenv("GAOT_FUSED_AGNO", "0")
        out_xla = run(x, graphs_, tgraphs_)
        g_xla = jax.grad(loss)(x, graphs_, tgraphs_)
        monkeypatch.setenv("GAOT_FUSED_AGNO", "1")
        out_fused = run(x, graphs_, tgraphs_)
        g_fused = jax.grad(loss)(x, graphs_, tgraphs_)
        np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla),
                                   rtol=2e-2, atol=2e-3, err_msg=label)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_xla),
                                   rtol=5e-2, atol=5e-2, err_msg=label)
