"""Geometric embedding tests: closed-form eigensolvers and feature parity
against a naive CSR implementation of the reference statistics
(src/model/layers/gemb.py:83-171)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaot_tpu.models.gemb import (
    GeometricEmbedding,
    eigvalsh_2x2,
    eigvalsh_3x3,
    node_pos_encode,
    statistical_features,
)
from gaot_tpu.ops import PaddedGraph, pad_csr, radius_search


def _random_spd(rng, n, d):
    a = rng.normal(size=(n, d, d))
    return (a @ a.transpose(0, 2, 1)).astype(np.float32)


def test_eigvalsh_2x2_matches_numpy():
    rng = np.random.default_rng(0)
    cov = _random_spd(rng, 50, 2)
    got = np.asarray(eigvalsh_2x2(jnp.asarray(cov)))
    want = np.linalg.eigvalsh(cov)[:, ::-1]  # descending
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_eigvalsh_3x3_matches_numpy():
    rng = np.random.default_rng(1)
    cov = _random_spd(rng, 50, 3)
    got = np.asarray(eigvalsh_3x3(jnp.asarray(cov)))
    want = np.linalg.eigvalsh(cov)[:, ::-1]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    # degenerate: multiple of identity
    eye = np.broadcast_to(2.5 * np.eye(3, dtype=np.float32), (4, 3, 3))
    got = np.asarray(eigvalsh_3x3(jnp.asarray(eye.copy())))
    np.testing.assert_allclose(got, 2.5, rtol=1e-6)


def _naive_statistical(input_geom, latent_queries, idx, rs):
    """Ragged CSR version of the reference statistical features."""
    q, d = latent_queries.shape
    feats = np.zeros((q, 3 + 2 * d))
    for qi in range(q):
        nbrs = idx[rs[qi]:rs[qi + 1]]
        if len(nbrs) == 0:
            continue
        pts = input_geom[nbrs]
        dist = np.linalg.norm(pts - latent_queries[qi], axis=1)
        d_avg = dist.mean()
        d_var = max((dist ** 2).mean() - d_avg ** 2, 0.0)
        centroid = pts.mean(0)
        delta = centroid - latent_queries[qi]
        centered = pts - centroid
        cov = (centered[:, :, None] * centered[:, None, :]).sum(0) / len(nbrs)
        eig = np.linalg.eigvalsh(cov)[::-1]
        feats[qi] = np.concatenate([[len(nbrs), d_avg, d_var], delta, eig])
    mean = feats.mean(0, keepdims=True)
    std = feats.std(0, ddof=1, keepdims=True)
    std[std < 1e-6] = 1.0
    return (feats - mean) / std


def test_statistical_features_match_csr():
    rng = np.random.default_rng(2)
    geom = rng.uniform(-1, 1, (80, 2)).astype(np.float32)
    queries = rng.uniform(-1, 1, (30, 2)).astype(np.float32)
    idx, rs = radius_search(geom, queries, 0.4)
    graph = pad_csr(idx, rs, pad_multiple=4)
    g = PaddedGraph(jnp.asarray(graph.indices), jnp.asarray(graph.mask))
    got = np.asarray(statistical_features(jnp.asarray(geom), jnp.asarray(queries), g))
    want = _naive_statistical(geom, queries, idx, rs)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_geoembed_shapes_and_empty_rows():
    rng = np.random.default_rng(3)
    geom = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
    queries = np.concatenate([
        rng.uniform(-1, 1, (20, 3)),
        np.full((4, 3), 10.0),  # far away: no neighbors
    ]).astype(np.float32)
    idx, rs = radius_search(geom, queries, 0.5)
    graph = pad_csr(idx, rs)
    g = PaddedGraph(jnp.asarray(graph.indices), jnp.asarray(graph.mask))
    for method in ["statistical", "pointnet"]:
        model = GeometricEmbedding(output_dim=8, method=method)
        params = model.init(jax.random.key(0), jnp.asarray(geom), jnp.asarray(queries), g)
        out = np.asarray(model.apply(params, jnp.asarray(geom), jnp.asarray(queries), g))
        assert out.shape == (24, 8)
        assert np.isfinite(out).all()
        if method == "pointnet":
            assert (out[20:] == 0).all()  # empty neighborhoods → zero embedding


def _naive_pointnet(input_geom, queries, idx, rs, params, pooling):
    """Ragged CSR version of the reference pointnet features
    (src/model/layers/gemb.py:173-228): shared MLP (Linear-ReLU-Linear-ReLU)
    on query-centered neighbor coords, scatter max/mean pool, fc + ReLU."""
    p = params["params"]
    w0 = np.asarray(p["pointnet_mlp"]["dense_0"]["kernel"])
    b0 = np.asarray(p["pointnet_mlp"]["dense_0"]["bias"])
    w1 = np.asarray(p["pointnet_mlp"]["dense_1"]["kernel"])
    b1 = np.asarray(p["pointnet_mlp"]["dense_1"]["bias"])
    wf = np.asarray(p["fc"]["kernel"])
    bf = np.asarray(p["fc"]["bias"])
    q = queries.shape[0]
    out = np.zeros((q, wf.shape[1]), np.float32)
    for qi in range(q):
        nbrs = idx[rs[qi]:rs[qi + 1]]
        if len(nbrs) == 0:
            continue
        centered = input_geom[nbrs] - queries[qi]
        h = np.maximum(centered @ w0 + b0, 0.0)
        h = np.maximum(h @ w1 + b1, 0.0)
        pooled = h.max(0) if pooling == "max" else h.mean(0)
        out[qi] = np.maximum(pooled @ wf + bf, 0.0)
    return out


@pytest.mark.parametrize("pooling", ["max", "mean"])
def test_pointnet_features_match_csr(pooling):
    """Padded pointnet embedding vs a ragged CSR re-implementation of the
    reference semantics (src/model/layers/gemb.py:173-228)."""
    rng = np.random.default_rng(6)
    geom = rng.uniform(-1, 1, (80, 2)).astype(np.float32)
    queries = np.concatenate([
        rng.uniform(-1, 1, (28, 2)),
        np.full((2, 2), 10.0),  # no neighbors → zero embedding
    ]).astype(np.float32)
    idx, rs = radius_search(geom, queries, 0.4)
    graph = pad_csr(idx, rs, pad_multiple=4)
    g = PaddedGraph(jnp.asarray(graph.indices), jnp.asarray(graph.mask))
    model = GeometricEmbedding(output_dim=8, method="pointnet", pooling=pooling)
    params = model.init(jax.random.key(1), jnp.asarray(geom),
                        jnp.asarray(queries), g)
    got = np.asarray(model.apply(params, jnp.asarray(geom),
                                 jnp.asarray(queries), g))
    want = _naive_pointnet(geom, queries, idx, rs, params, pooling)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert (got[28:] == 0).all()


def test_statistical_features_fine_mesh_bf16_coords_degrade():
    """Documents why geoembed must keep fp32 coordinates: on a fine mesh
    (spacing ~1e-3 around coordinate ~1.0, bf16 ulp ~2^-8 relative) the
    statistics computed from bf16-quantized coords diverge badly. MAGNO's
    fused route shares the kernel's gathered rows with geoembed ONLY when
    they kept full coordinate precision (models/magno.py::_agno_scale)."""
    rng = np.random.default_rng(7)
    geom = (0.9 + 0.05 * rng.uniform(size=(120, 2))).astype(np.float32)
    queries = (0.9 + 0.05 * rng.uniform(size=(40, 2))).astype(np.float32)
    idx, rs = radius_search(geom, queries, 0.01)
    assert rs[-1] > 50  # the radius actually captures neighbors
    graph = pad_csr(idx, rs, pad_multiple=4)
    g = PaddedGraph(jnp.asarray(graph.indices), jnp.asarray(graph.mask))
    f32 = np.asarray(statistical_features(jnp.asarray(geom),
                                          jnp.asarray(queries), g))
    quant = np.asarray(jnp.asarray(geom).astype(jnp.bfloat16), np.float32)
    bf16 = np.asarray(statistical_features(jnp.asarray(quant),
                                           jnp.asarray(queries), g))
    # The quantized statistics are NOT a small perturbation.
    assert np.max(np.abs(f32 - bf16)) > 0.5


def test_node_pos_encode():
    x = jnp.asarray(np.random.default_rng(4).uniform(-1, 1, (10, 2)).astype(np.float32))
    enc = node_pos_encode(x, freq=4)
    assert enc.shape == (10, 2 * 2 * 4)
    # check one entry: sin(1 * pi * (x+1)) at freq index 0, dim 0
    want = np.sin(np.pi * (np.asarray(x)[:, 0] + 1))
    np.testing.assert_allclose(np.asarray(enc)[:, 0], want, rtol=1e-5, atol=1e-6)
