"""Real-benchmark file-layout fixtures.

Builds tiny .nc files replicating the group layouts of the three dataset
families the reference trains on (src/datasets/dataset.py:57-461) and runs
the actual readers + processors against them with the REAL metanames, so
first contact with the benchmark files isn't inside a 1000-epoch run:

- poseidon-style (CE-Gauss): u [S, T, N>9216, 5] + x, fix_x, use_sparse
  truncation to the first 9216 nodes (reference
  sequential_data_processor.py:89-93), active variables [0..3] of 5;
- rigno-style static (Poisson-Gauss): u/c [S, 1, N, 1], shared x;
- gaot-style vx (naca0012): per-sample x, c 3 channels, u 1 channel;
- classic NetCDF3 (scipy fallback reader path).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))


def _write_h5(path, **arrays):
    import h5py

    with h5py.File(path, "w") as f:
        for k, v in arrays.items():
            f.create_dataset(k, data=v)


def _dataset_cfg(tmp_path, name, metaname, **kw):
    from gaot_tpu.core.config import DatasetConfig, merge_config

    base = {"name": name, "metaname": metaname, "base_path": str(tmp_path),
            "batch_size": 2, "num_workers": 0, "device_data": False}
    base.update(kw)
    return merge_config(DatasetConfig, base)


def test_poseidon_sparse_sequential_layout(tmp_path):
    from gaot_tpu.core.metadata import DATASET_METADATA
    from gaot_tpu.data.sequential import SequentialDataProcessor

    s, t, n, v = 6, 5, 9600, 5
    rng = np.random.default_rng(0)
    u = rng.normal(size=(s, t, n, v)).astype(np.float32)
    x = rng.uniform(0, 1, (1, 1, n, 2)).astype(np.float32)
    _write_h5(tmp_path / "CE-Gauss.nc", u=u, x=x)

    cfg = _dataset_cfg(tmp_path, "CE-Gauss", "compressible_flow/CE-Gauss",
                       train_size=3, val_size=1, test_size=2,
                       use_sparse=True, max_time_diff=4, time_step=2)
    dp = SequentialDataProcessor(cfg, DATASET_METADATA[cfg.metaname],
                                 dtype=np.float32)
    splits, is_vx = dp.load_and_process_data()
    assert not is_vx
    # Sparse truncation to the first 9216 nodes + active-variable selection.
    assert splits["train"]["u"].shape == (3, 5, 9216, 4)
    assert splits["test"]["u"].shape == (2, 5, 9216, 4)
    assert splits["train"]["x"].shape[-2:] == (9216, 2)
    # Normalized by train stats.
    flat = splits["train"]["u"].reshape(-1, 4)
    np.testing.assert_allclose(flat.mean(0), 0.0, atol=2e-2)
    np.testing.assert_allclose(flat.std(0), 1.0, atol=2e-2)


def test_rigno_static_layout(tmp_path):
    from gaot_tpu.core.metadata import DATASET_METADATA
    from gaot_tpu.data.data_processor import DataProcessor

    s, n = 8, 200
    rng = np.random.default_rng(1)
    u = rng.normal(size=(s, 1, n, 1)).astype(np.float32)
    c = rng.normal(size=(s, 1, n, 1)).astype(np.float32)
    x = np.broadcast_to(
        rng.uniform(0, 1, (1, 1, n, 2)).astype(np.float32), (s, 1, n, 2))
    _write_h5(tmp_path / "Poisson-Gauss.nc", u=u, c=c,
              x=np.ascontiguousarray(x))

    cfg = _dataset_cfg(tmp_path, "Poisson-Gauss",
                       "elliptic_pdes/Poisson-Gauss",
                       train_size=4, val_size=2, test_size=2)
    dp = DataProcessor(cfg, DATASET_METADATA[cfg.metaname], dtype=np.float32)
    splits, is_vx = dp.load_and_process_data()
    assert not is_vx
    assert splits["train"]["u"].shape == (4, n, 1)
    assert splits["train"]["x"].shape == (n, 2)
    # Test split comes from the END of the file (reference
    # data_processor.py:197-216).
    u_mean, u_std = dp.u_mean, dp.u_std
    np.testing.assert_allclose(
        splits["test"]["u"] * u_std + u_mean, u[-2:, 0], atol=1e-5)


def test_gaot_vx_airfoil_layout(tmp_path):
    from gaot_tpu.core.metadata import DATASET_METADATA
    from gaot_tpu.data.data_processor import DataProcessor

    s, n = 8, 160
    rng = np.random.default_rng(2)
    u = rng.normal(size=(s, 1, n, 1)).astype(np.float32)
    c = rng.normal(size=(s, 1, n, 3)).astype(np.float32)
    x = rng.uniform(-1, 2.5, (s, 1, n, 2)).astype(np.float32)
    _write_h5(tmp_path / "naca0012.nc", u=u, c=c, x=x)

    cfg = _dataset_cfg(tmp_path, "naca0012", "compressible_flow/naca0012",
                       train_size=4, val_size=2, test_size=2)
    dp = DataProcessor(cfg, DATASET_METADATA[cfg.metaname], dtype=np.float32)
    splits, is_vx = dp.load_and_process_data()
    assert is_vx
    assert splits["train"]["x"].shape == (4, n, 2)
    assert splits["train"]["c"].shape == (4, n, 3)
    assert splits["train"]["u"].shape == (4, n, 1)


def test_netcdf3_classic_reader(tmp_path):
    """Classic NetCDF3 files go through the scipy fallback reader."""
    from scipy.io import netcdf_file

    from gaot_tpu.data.readers import read_dataset

    s, n = 3, 40
    rng = np.random.default_rng(3)
    u = rng.normal(size=(s, 1, n, 1)).astype(np.float32)
    x = rng.uniform(0, 1, (s, 1, n, 2)).astype(np.float32)
    path = tmp_path / "classic.nc"
    with netcdf_file(str(path), "w") as f:
        f.createDimension("s", s)
        f.createDimension("t", 1)
        f.createDimension("n", n)
        f.createDimension("vu", 1)
        f.createDimension("vx", 2)
        vu = f.createVariable("u", "f4", ("s", "t", "n", "vu"))
        vu[:] = u
        vx = f.createVariable("x", "f4", ("s", "t", "n", "vx"))
        vx[:] = x
    out = read_dataset(str(tmp_path), "classic", ["u", "c", "x"])
    np.testing.assert_allclose(out["u"], u, atol=1e-6)
    np.testing.assert_allclose(out["x"], x, atol=1e-6)
    assert out["c"] is None
