"""Metric tests: relative-L1-per-chunk semantics and torch.median parity
(reference src/utils/metrics.py:11-75)."""
import numpy as np

from gaot_tpu.core.metadata import DATASET_METADATA
from gaot_tpu.utils.metrics import compute_batch_errors, compute_final_metric


def test_single_chunk_relative_l1():
    meta = DATASET_METADATA["elliptic_pdes/Poisson-Gauss"]
    rng = np.random.default_rng(0)
    gtr = rng.normal(size=(4, 1, 50, 1))
    prd = gtr + 0.1 * rng.normal(size=gtr.shape)
    errs = compute_batch_errors(gtr, prd, meta)
    assert errs.shape == (4, 1)
    mean, std = meta.global_mean[0], meta.global_std[0]
    gn = (gtr - mean) / std
    pn = (prd - mean) / std
    want = np.abs(gn - pn).sum((1, 2, 3)) / (np.abs(gn).sum((1, 2, 3)) + 1e-10)
    np.testing.assert_allclose(errs[:, 0], want, rtol=1e-10)


def test_multi_chunk_grouping():
    """CE datasets: 5 raw vars, 4 active, chunked [0,1,1,2,3] → vx,vy share a chunk."""
    meta = DATASET_METADATA["compressible_flow/CE-Gauss"]
    rng = np.random.default_rng(1)
    gtr = rng.normal(size=(3, 2, 20, 4))
    prd = gtr + 0.05 * rng.normal(size=gtr.shape)
    errs = compute_batch_errors(gtr, prd, meta)
    # active vars [0,1,2,3] of chunked [0,1,1,2,3] → chunks [0,1,1,2] → 3 unique
    assert errs.shape == (3, 3)
    # chunk 1 aggregates vars 1 and 2
    mean = np.asarray(meta.global_mean)[:4]
    std = np.asarray(meta.global_std)[:4]
    gn = (gtr - mean) / std
    pn = (prd - mean) / std
    num = np.abs(gn - pn)[..., 1:3].sum((1, 2, 3))
    den = np.abs(gn)[..., 1:3].sum((1, 2, 3))
    np.testing.assert_allclose(errs[:, 1], num / (den + 1e-10), rtol=1e-10)


def test_chunk_count_ce():
    meta = DATASET_METADATA["compressible_flow/CE-Gauss"]
    gtr = np.zeros((2, 1, 5, 4))
    prd = np.ones((2, 1, 5, 4))
    errs = compute_batch_errors(gtr, prd, meta)
    # active [0,1,2,3] → chunked [0,1,1,2] → 3 unique chunks
    assert errs.shape == (2, 3)


def test_final_metric_torch_median_semantics():
    """torch.median takes the LOWER middle for even counts, numpy averages."""
    errs = np.array([[1.0], [2.0], [3.0], [4.0]])
    assert compute_final_metric(errs) == 2.0  # torch.median([1,2,3,4]) = 2
    errs = np.array([[1.0], [5.0], [3.0]])
    assert compute_final_metric(errs) == 3.0


def test_final_metric_mean_over_chunks():
    errs = np.array([[1.0, 3.0], [1.0, 3.0], [1.0, 3.0]])
    assert compute_final_metric(errs) == 2.0
