"""Tests for neighbor search, padding, masked segment ops, and edge drop."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaot_tpu.ops import (
    PaddedGraph,
    apply_edge_drop_mask,
    knn_search,
    masked_max,
    masked_mean,
    masked_softmax,
    masked_sum,
    pad_csr,
    radius_search,
    repad,
    stack_graphs,
)


def _rows(idx, rs):
    return [np.sort(idx[rs[i]:rs[i + 1]]) for i in range(len(rs) - 1)]


@pytest.mark.parametrize("dim", [2, 3])
def test_radius_backends_agree(dim):
    rng = np.random.default_rng(0)
    data = rng.uniform(-1, 1, (2000, dim))
    queries = rng.uniform(-1, 1, (300, dim))
    results = {
        m: _rows(*radius_search(data, queries, 0.15, method=m))
        for m in ["kdtree", "grid", "cpp"]
    }
    for m in ["grid", "cpp"]:
        assert all(np.array_equal(a, b) for a, b in zip(results["kdtree"], results[m])), m


def test_radius_bruteforce():
    rng = np.random.default_rng(1)
    data = rng.uniform(0, 1, (150, 2))
    queries = rng.uniform(0, 1, (40, 2))
    r = 0.2
    idx, rs = radius_search(data, queries, r, method="cpp")
    rows = _rows(idx, rs)
    for qi in range(40):
        d = np.linalg.norm(data - queries[qi], axis=1)
        expected = np.sort(np.where(d <= r)[0])
        assert np.array_equal(rows[qi], expected)


def test_knn_search():
    rng = np.random.default_rng(2)
    data = rng.uniform(0, 1, (100, 2))
    queries = rng.uniform(0, 1, (10, 2))
    idx, rs = knn_search(data, queries, k=5)
    assert rs[-1] == 50
    for qi in range(10):
        d = np.linalg.norm(data - queries[qi], axis=1)
        expected = set(np.argsort(d)[:5])
        assert set(idx[rs[qi]:rs[qi + 1]]) == expected


@pytest.mark.parametrize("dim", [2, 3])
def test_knn_backends_agree(dim):
    """Native gaot_knn (cpp/neighbor_search.cc) vs scipy cKDTree.

    The native path computes fp32 distances while scipy uses f64, so near-tie
    selections at the k boundary may legitimately differ; compare the per-rank
    f64 distances rather than demanding identical index sets.
    """
    rng = np.random.default_rng(3)
    data = rng.uniform(-1, 1, (1500, dim))
    queries = rng.uniform(-1.2, 1.2, (200, dim))
    k = 7
    idx_c, rs_c = knn_search(data, queries, k, method="cpp")
    idx_t, rs_t = knn_search(data, queries, k, method="kdtree")
    assert rs_c[-1] == rs_t[-1] == 200 * k
    idx_c = idx_c.reshape(200, k)
    idx_t = idx_t.reshape(200, k)
    d_c = np.linalg.norm(data[idx_c] - queries[:, None], axis=-1)
    d_t = np.linalg.norm(data[idx_t] - queries[:, None], axis=-1)
    np.testing.assert_allclose(np.sort(d_c, axis=1), np.sort(d_t, axis=1),
                               rtol=1e-5, atol=1e-6)
    # cpp rows come back sorted by distance
    assert (np.diff(d_c, axis=1) >= -1e-6).all()


@pytest.mark.parametrize("dim", [2, 3])
def test_knn_cpp_degenerate_geometry(dim):
    """Anisotropic / near-degenerate point sets (points on a line or plane
    embedded in 2D/3D) must not hit the grid-cell performance cliff: the
    cell size derives from the NON-DEGENERATE extents only (effective
    manifold dimension), so this completes in milliseconds and matches the
    KD-tree. Regression test for the volume^(1/dim) cell collapse."""
    rng = np.random.default_rng(5)
    n, k = 4000, 6
    t = rng.uniform(-1, 1, (n, 1))
    if dim == 2:  # line y = 0.3x + fp-level jitter
        data = np.concatenate([t, 0.3 * t + rng.normal(0, 1e-9, (n, 1))], 1)
    else:  # plane z ~ const
        data = np.concatenate(
            [t, rng.uniform(-1, 1, (n, 1)), rng.normal(0, 1e-9, (n, 1))], 1)
    data = data.astype(np.float64)
    queries = data[::20]
    t0 = time.perf_counter()
    idx_c, rs_c = knn_search(data, queries, k, method="cpp")
    elapsed = time.perf_counter() - t0
    idx_t, _ = knn_search(data, queries, k, method="kdtree")
    q = queries.shape[0]
    d_c = np.linalg.norm(data[idx_c.reshape(q, k)] - queries[:, None],
                         axis=-1)
    d_t = np.linalg.norm(data[idx_t.reshape(q, k)] - queries[:, None],
                         axis=-1)
    np.testing.assert_allclose(np.sort(d_c, 1), np.sort(d_t, 1),
                               rtol=1e-5, atol=1e-6)
    assert elapsed < 5.0, f"degenerate-geometry kNN took {elapsed:.1f}s"


def test_knn_cpp_far_query_and_k_clamp():
    """Queries far outside the data bounding box still find their k nearest;
    k > n clamps to n (wrapper rule)."""
    rng = np.random.default_rng(4)
    data = rng.uniform(0, 1, (50, 2))
    queries = np.array([[25.0, -13.0], [0.5, 0.5]])
    idx, rs = knn_search(data, queries, k=3, method="cpp")
    for qi in range(2):
        d = np.linalg.norm(data - queries[qi], axis=1)
        assert set(idx[rs[qi]:rs[qi + 1]]) == set(np.argsort(d)[:3])
    idx, rs = knn_search(data[:4], queries, k=9, method="cpp")
    assert rs[-1] == 2 * 4  # clamped to n=4


def test_knn_unknown_method_rejected():
    data = np.zeros((5, 2))
    with pytest.raises(ValueError, match="Unknown kNN"):
        knn_search(data, data, k=2, method="grid")


def test_pad_csr_roundtrip():
    idx = np.array([3, 1, 4, 1, 5, 9, 2], dtype=np.int64)
    rs = np.array([0, 2, 2, 5, 7], dtype=np.int64)
    g = pad_csr(idx, rs, pad_multiple=4)
    assert g.indices.shape == (4, 4)
    assert g.mask.sum() == 7
    assert list(g.indices[0][g.mask[0]]) == [3, 1]
    assert g.mask[1].sum() == 0
    assert list(g.indices[2][g.mask[2]]) == [4, 1, 5]


def test_pad_csr_cap_truncates():
    idx = np.arange(10, dtype=np.int64)
    rs = np.array([0, 10], dtype=np.int64)
    g = pad_csr(idx, rs, pad_multiple=1, cap=4)
    assert g.k == 4
    assert g.mask.sum() == 4


def test_repad_and_stack():
    idx = np.array([0, 1, 2], dtype=np.int64)
    rs = np.array([0, 1, 3], dtype=np.int64)
    g = pad_csr(idx, rs, pad_multiple=2)
    g2 = repad(g, 6)
    assert g2.k == 6 and g2.mask.sum() == g.mask.sum()
    batched = stack_graphs([g, g])
    assert batched.indices.shape == (2, 2, 2)


def test_masked_reductions_match_csr():
    rng = np.random.default_rng(3)
    q, k, c = 7, 5, 3
    x = rng.normal(size=(q, k, c)).astype(np.float32)
    mask = rng.uniform(size=(q, k)) < 0.6
    xs, ms = jnp.asarray(x), jnp.asarray(mask)

    want_sum = np.stack([x[i][mask[i]].sum(0) if mask[i].any() else np.zeros(c)
                         for i in range(q)])
    want_mean = np.stack([x[i][mask[i]].mean(0) if mask[i].any() else np.zeros(c)
                          for i in range(q)])
    want_max = np.stack([x[i][mask[i]].max(0) if mask[i].any() else np.zeros(c)
                         for i in range(q)])
    np.testing.assert_allclose(masked_sum(xs, ms), want_sum, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(masked_mean(xs, ms), want_mean, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(masked_max(xs, ms), want_max, rtol=1e-6, atol=1e-6)


def test_masked_softmax_matches_csr_segment_softmax():
    rng = np.random.default_rng(4)
    q, k = 6, 8
    scores = rng.normal(size=(q, k)).astype(np.float32) * 5
    mask = rng.uniform(size=(q, k)) < 0.7
    mask[2] = False  # empty row
    got = np.asarray(masked_softmax(jnp.asarray(scores), jnp.asarray(mask)))
    for i in range(q):
        if mask[i].any():
            s = scores[i][mask[i]]
            e = np.exp(s - s.max())
            np.testing.assert_allclose(got[i][mask[i]], e / e.sum(), rtol=1e-5)
            assert got[i][~mask[i]].sum() == 0
        else:
            assert got[i].sum() == 0


def test_edge_drop_ratio():
    rng = jax.random.key(0)
    mask = jnp.ones((100, 32), dtype=bool)
    out = apply_edge_drop_mask(mask, rng, "ratio", sample_ratio=0.5)
    frac = float(out.mean())
    assert 0.4 < frac < 0.6
    # eval mode: untouched
    assert bool((apply_edge_drop_mask(mask, rng, "ratio", sample_ratio=0.5,
                                      training=False) == mask).all())


def test_edge_drop_max_neighbors():
    rng = jax.random.key(1)
    mask = np.ones((50, 16), dtype=bool)
    mask[0, 4:] = False  # row with fewer than max_neighbors valid
    out = np.asarray(apply_edge_drop_mask(jnp.asarray(mask), rng, "max_neighbors",
                                          max_neighbors=8))
    assert (out.sum(axis=1)[1:] == 8).all()
    assert out[0].sum() == 4
    assert (out <= mask).all()


def test_masked_softmax_all_masked_row_has_finite_grad():
    """Rows with zero valid entries must yield zero weights AND finite
    gradients (exp of unmasked scores used to overflow -> 0*inf = NaN)."""
    from gaot_tpu.ops.segment_ops import masked_softmax

    scores = jnp.asarray([[5.0, -2.0, 100.0], [1.0, 2.0, 3.0]])
    mask = jnp.asarray([[False, False, False], [True, True, False]])

    out = masked_softmax(scores, mask)
    assert np.allclose(np.asarray(out[0]), 0.0)
    np.testing.assert_allclose(float(jnp.sum(out[1])), 1.0, rtol=1e-6)

    g = jax.grad(lambda s: jnp.sum(masked_softmax(s, mask) ** 2))(scores)
    assert np.isfinite(np.asarray(g)).all()
