"""Dataset file readers.

The reference loads NetCDF via xarray (src/datasets/data_processor.py:65-90).
xarray/netCDF4 are not available here, so this module reads:
- ``.nc`` NetCDF4 files through h5py (NetCDF4 is HDF5 underneath), with a
  scipy.io fallback for classic NetCDF3,
- ``.npz`` archives with the same group names ('u', 'c', 'x') as a simple
  self-describing interchange format (used by tests and synthetic data).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def _read_h5(path: str, groups) -> Dict[str, Optional[np.ndarray]]:
    import h5py

    out = {}
    with h5py.File(path, "r") as f:
        for g in groups:
            if g is not None and g in f:
                out[g] = np.asarray(f[g])
            else:
                out[g] = None
    return out


def _read_netcdf3(path: str, groups) -> Dict[str, Optional[np.ndarray]]:
    from scipy.io import netcdf_file

    out = {}
    with netcdf_file(path, "r", mmap=False) as f:
        for g in groups:
            if g is not None and g in f.variables:
                out[g] = np.asarray(f.variables[g].data)
            else:
                out[g] = None
    return out


def _read_npz(path: str, groups) -> Dict[str, Optional[np.ndarray]]:
    with np.load(path) as f:
        return {g: (np.asarray(f[g]) if g is not None and g in f else None)
                for g in groups}


def read_dataset(base_path: str, name: str, groups) -> Dict[str, Optional[np.ndarray]]:
    """Load the named dataset's variable groups as NumPy arrays.

    Tries ``<base>/<name>.nc`` then ``<base>/<name>.npz``.
    """
    groups = [g for g in groups]
    nc_path = os.path.join(base_path, f"{name}.nc")
    npz_path = os.path.join(base_path, f"{name}.npz")
    if os.path.exists(nc_path):
        try:
            return _read_h5(nc_path, groups)
        except OSError:
            return _read_netcdf3(nc_path, groups)
    if os.path.exists(npz_path):
        return _read_npz(npz_path, groups)
    raise FileNotFoundError(f"Dataset file not found: {nc_path} (or .npz)")
