"""AGNO parity tests: padded implementation vs a naive CSR reference that
mirrors the original integral-transform math (reference src/model/layers/agno.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaot_tpu.models.agno import AGNO
from gaot_tpu.ops import PaddedGraph, pad_csr, radius_search, repad


def _mlp_np(x, mlp_params):
    """Apply the extracted LinearChannelMLP params in NumPy (exact gelu)."""
    n = len(mlp_params)
    for i in range(n):
        w = np.asarray(mlp_params[f"dense_{i}"]["kernel"])
        b = np.asarray(mlp_params[f"dense_{i}"]["bias"])
        x = x @ w + b
        if i < n - 1:
            x = np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=False))
    return x


def naive_agno_csr(y, x, f_y, idx, rs, mlp_params, transform_type, use_attn,
                   attn_params=None):
    """Ragged CSR implementation of the reference AGNO forward."""
    batch = f_y.shape[0] if f_y is not None and f_y.ndim == 3 else None
    q = len(rs) - 1
    outs = []
    for qi in range(q):
        nbrs = idx[rs[qi]:rs[qi + 1]]
        rep = y[nbrs]                                  # [k, d]
        self_c = np.tile(x[qi], (len(nbrs), 1))        # [k, d]
        if use_attn and len(nbrs):
            if attn_params is not None:  # dot product
                qv = self_c @ np.asarray(attn_params["query_proj"]["kernel"]) + \
                    np.asarray(attn_params["query_proj"]["bias"])
                kv = rep @ np.asarray(attn_params["key_proj"]["kernel"]) + \
                    np.asarray(attn_params["key_proj"]["bias"])
                scores = (qv * kv).sum(-1) / np.sqrt(qv.shape[-1])
            else:  # cosine
                qn = self_c / np.maximum(np.linalg.norm(self_c, axis=-1, keepdims=True), 1e-12)
                kn = rep / np.maximum(np.linalg.norm(rep, axis=-1, keepdims=True), 1e-12)
                scores = (qn * kn).sum(-1)
            e = np.exp(scores - scores.max())
            attn = e / e.sum()
        else:
            attn = None

        agg = np.concatenate([rep, self_c], axis=-1)
        nonlinear = transform_type in ("nonlinear", "nonlinear_kernelonly")

        def reduce_one(fb):
            a = agg
            if fb is not None and nonlinear:
                a = np.concatenate([agg, fb[nbrs]], axis=-1)
            ker = _mlp_np(a, mlp_params)
            o = ker
            if fb is not None and transform_type != "nonlinear_kernelonly":
                o = o * fb[nbrs]
            if attn is not None:
                o = o * attn[:, None]
                return o.sum(0)
            return o.mean(0) if len(nbrs) else np.zeros(o.shape[-1])

        if len(nbrs) == 0:
            width = mlp_params[f"dense_{len(mlp_params)-1}"]["bias"].shape[0]
            zero = np.zeros(width, dtype=np.float32)
            outs.append(np.stack([zero] * batch) if batch else zero)
        elif batch is not None:
            outs.append(np.stack([reduce_one(f_y[b]) for b in range(batch)]))
        else:
            outs.append(reduce_one(f_y))
    out = np.stack(outs)                                # [Q, ...] or [Q, B, C]
    if batch is not None:
        out = np.moveaxis(out, 0, 1)
    return out


def _setup(seed=0, n=60, q=25, dim=2, radius=0.35):
    rng = np.random.default_rng(seed)
    y = rng.uniform(-1, 1, (n, dim)).astype(np.float32)
    x = rng.uniform(-1, 1, (q, dim)).astype(np.float32)
    idx, rs = radius_search(y, x, radius)
    graph = pad_csr(idx, rs, pad_multiple=4)
    return y, x, idx, rs, graph, rng


@pytest.mark.parametrize("transform_type", ["linear", "nonlinear",
                                            "linear_kernelonly", "nonlinear_kernelonly"])
@pytest.mark.parametrize("use_attn", [False, True])
def test_agno_matches_csr_reference(transform_type, use_attn):
    y, x, idx, rs, graph, rng = _setup()
    c_in = 3
    # The k·f multiply applies to every mode except nonlinear_kernelonly
    # (reference agno.py:245-246), and requires kernel width == function width.
    c_out = 5 if transform_type == "nonlinear_kernelonly" else c_in
    f_y = rng.normal(size=(2, y.shape[0], c_in)).astype(np.float32)

    model = AGNO(channel_mlp_features=(8, c_out), transform_type=transform_type,
                 use_attn=use_attn, attention_type="cosine", coord_dim=2)
    g = PaddedGraph(jnp.asarray(graph.indices), jnp.asarray(graph.mask))
    params = model.init(jax.random.key(0), jnp.asarray(y), g, jnp.asarray(x),
                        jnp.asarray(f_y))
    got = np.asarray(model.apply(params, jnp.asarray(y), g, jnp.asarray(x),
                                 jnp.asarray(f_y)))

    mlp_params = params["params"]["channel_mlp"]
    want = naive_agno_csr(y, x, f_y, idx, rs, mlp_params, transform_type, use_attn)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_agno_dot_product_attention():
    y, x, idx, rs, graph, rng = _setup(seed=1)
    f_y = rng.normal(size=(2, y.shape[0], 3)).astype(np.float32)
    model = AGNO(channel_mlp_features=(8, 3), transform_type="linear",
                 use_attn=True, attention_type="dot_product", coord_dim=2)
    g = PaddedGraph(jnp.asarray(graph.indices), jnp.asarray(graph.mask))
    params = model.init(jax.random.key(0), jnp.asarray(y), g, jnp.asarray(x),
                        jnp.asarray(f_y))
    got = np.asarray(model.apply(params, jnp.asarray(y), g, jnp.asarray(x),
                                 jnp.asarray(f_y)))
    attn_params = {"query_proj": params["params"]["query_proj"],
                   "key_proj": params["params"]["key_proj"]}
    want = naive_agno_csr(y, x, f_y, idx, rs, params["params"]["channel_mlp"],
                          "linear", True, attn_params)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_agno_padding_invariance():
    """Output must not depend on the padded K (masked entries are inert)."""
    y, x, idx, rs, graph, rng = _setup(seed=2)
    f_y = rng.normal(size=(3, y.shape[0], 4)).astype(np.float32)
    model = AGNO(channel_mlp_features=(8, 4), transform_type="nonlinear",
                 use_attn=True, attention_type="cosine", coord_dim=2)
    g1 = PaddedGraph(jnp.asarray(graph.indices), jnp.asarray(graph.mask))
    bigger = repad(graph, graph.k + 16)
    g2 = PaddedGraph(jnp.asarray(bigger.indices), jnp.asarray(bigger.mask))
    params = model.init(jax.random.key(0), jnp.asarray(y), g1, jnp.asarray(x),
                        jnp.asarray(f_y))
    out1 = model.apply(params, jnp.asarray(y), g1, jnp.asarray(x), jnp.asarray(f_y))
    out2 = model.apply(params, jnp.asarray(y), g2, jnp.asarray(x), jnp.asarray(f_y))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6, atol=1e-6)


def test_agno_no_function_transform_a():
    """Transform type (a): no f_y at all."""
    y, x, idx, rs, graph, _ = _setup(seed=3)
    model = AGNO(channel_mlp_features=(8, 4), transform_type="linear",
                 use_attn=False, coord_dim=2)
    g = PaddedGraph(jnp.asarray(graph.indices), jnp.asarray(graph.mask))
    params = model.init(jax.random.key(0), jnp.asarray(y), g, jnp.asarray(x))
    got = np.asarray(model.apply(params, jnp.asarray(y), g, jnp.asarray(x)))
    want = naive_agno_csr(y, x, None, idx, rs, params["params"]["channel_mlp"],
                          "linear", False)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)




def test_aug_gather_route_matches_separate(monkeypatch):
    """The coordinate-augmented gather route (GAOT_AUG_GATHER, flat K-major
    vx path) must match the separate-gather route in outputs and parameter
    gradients: the packed coords are bitcast-exact, and the single-gather
    backward computes the same d_f/d_coef math."""
    import os

    import jax
    import jax.numpy as jnp

    from gaot_tpu.models.agno import AGNO
    from gaot_tpu.models.magno import flatten_vx_graph, flatten_vx_tgraph
    from gaot_tpu.ops.neighbor_search import radius_search
    from gaot_tpu.ops.padding import (PaddedGraph, pad_csr, repad,
                                      repad_tgraph, stack_graphs,
                                      transpose_graph)

    rng = np.random.default_rng(5)
    b, n, q, c = 3, 30, 12, 8
    srcs = rng.uniform(-1, 1, (b, n, 2))
    dst = rng.uniform(-1, 1, (b, q, 2))
    gs = [pad_csr(*radius_search(srcs[i], dst[i], 0.6), pad_multiple=4)
          for i in range(b)]
    k = max(g.k for g in gs)
    gs = [repad(g, k) for g in gs]
    ts = [transpose_graph(g, n) for g in gs]
    kt = max(t.edge_pos.shape[-1] for t in ts)
    ts = [repad_tgraph(t, kt) for t in ts]
    stacked = stack_graphs(gs)
    t_st = type(ts[0])(jnp.asarray(np.stack([t.edge_pos for t in ts])),
                       jnp.asarray(np.stack([t.query for t in ts])),
                       jnp.asarray(np.stack([t.mask for t in ts])))
    flat_g = flatten_vx_graph(
        PaddedGraph(jnp.asarray(stacked.indices), jnp.asarray(stacked.mask)), n)
    flat_t = flatten_vx_tgraph(t_st, q, k)
    y = jnp.asarray(srcs.reshape(b * n, 2).astype(np.float32))
    x = jnp.asarray(dst.reshape(b * q, 2).astype(np.float32))
    f = jnp.asarray(rng.normal(size=(b * n, c)).astype(np.float32))

    model = AGNO(channel_mlp_features=[16, c], transform_type="linear",
                 use_attn=True, attention_type="cosine", coord_dim=2)
    params = model.init(jax.random.key(0), y, flat_g, x=x, f_y=f,
                        tgraph=flat_t, num_samples=b)

    def run(aug):
        monkeypatch.setenv("GAOT_AUG_GATHER", "1" if aug else "0")

        def loss(p, f):
            out = model.apply(p, y, flat_g, x=x, f_y=f, tgraph=flat_t,
                              num_samples=b)
            return jnp.sum(jnp.sin(out)), out

        (l, out), grads = jax.value_and_grad(loss, argnums=(0, 1),
                                             has_aux=True)(params, f)
        return out, grads

    out_off, (gp_off, gf_off) = run(False)
    out_on, (gp_on, gf_on) = run(True)
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf_on), np.asarray(gf_off),
                               rtol=1e-4, atol=1e-6)
    for a, bb_ in zip(jax.tree.leaves(gp_on), jax.tree.leaves(gp_off)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb_),
                                   rtol=1e-4, atol=1e-6)

    # return_rep hands back the exact fp32 coordinate rows
    os.environ["GAOT_AUG_GATHER"] = "1"
    try:
        out, rep = model.apply(params, y, flat_g, x=x, f_y=f, tgraph=flat_t,
                               num_samples=b, return_rep=True)
    finally:
        os.environ.pop("GAOT_AUG_GATHER", None)
    idx_t = np.asarray(flat_g.indices).T
    np.testing.assert_array_equal(np.asarray(rep), np.asarray(y)[idx_t])


def test_aug_gather_bucketed_matches_separate(monkeypatch):
    """The bucketed aug route (per-bucket augmented gathers + combined
    single-gather backward) must match the separate-gather bucketed path in
    outputs and parameter gradients."""
    import jax
    import jax.numpy as jnp

    from gaot_tpu.models.agno import AGNO
    from gaot_tpu.models.magno import flatten_vx_bucketed
    from gaot_tpu.ops.neighbor_search import radius_search
    from gaot_tpu.ops.padding import (bucketize_graphs_stacked, pad_csr,
                                      repad, stack_graphs)

    from tests.test_vx_bucketing import _random_stacked_graph

    rng = np.random.default_rng(9)
    b, n, q, c = 3, 40, 32, 8
    srcs = rng.uniform(-1, 1, (b, n, 2))
    dst = rng.uniform(-1, 1, (b, q, 2))
    stacked = _random_stacked_graph(rng, b, q, n, 16)
    bb = bucketize_graphs_stacked(stacked, num_sources=n, tile=4, min_k=4,
                                  launch_penalty_rows=8, with_transpose=True)
    assert bb is not None and len(bb.buckets) > 1
    flat = flatten_vx_bucketed(jax.tree.map(jnp.asarray, bb), n)
    y = jnp.asarray(srcs.reshape(b * n, 2).astype(np.float32))
    # bucket-concatenated query coords (bucket row order)
    dst_flat = jnp.asarray(dst.reshape(b * q, 2).astype(np.float32))
    x_cat = jnp.take(dst_flat, flat.perm, axis=0)
    f = jnp.asarray(rng.normal(size=(b * n, c)).astype(np.float32))

    model = AGNO(channel_mlp_features=[16, c], transform_type="linear",
                 use_attn=True, attention_type="cosine", coord_dim=2)
    params = model.init(jax.random.key(0), y, flat, x=x_cat, f_y=f,
                        num_samples=b)

    def run(aug):
        monkeypatch.setenv("GAOT_AUG_GATHER", "1" if aug else "0")

        def loss(p, f):
            out = model.apply(p, y, flat, x=x_cat, f_y=f, num_samples=b)
            return jnp.sum(jnp.sin(out)), out

        (l, out), grads = jax.value_and_grad(loss, argnums=(0, 1),
                                             has_aux=True)(params, f)
        return out, grads

    out_off, (gp_off, gf_off) = run(False)
    out_on, (gp_on, gf_on) = run(True)
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf_on), np.asarray(gf_off),
                               rtol=1e-4, atol=1e-6)
    for a, b_ in zip(jax.tree.leaves(gp_on), jax.tree.leaves(gp_off)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)
