"""Host-side fixed-radius / kNN neighbor search.

TPU-native replacement for the reference's GPU neighbor-search backends
(torch_cluster CUDA `radius`, open3d FixedRadiusSearch, and the pure-torch
grid/chunked/native fallbacks; reference
src/model/layers/utils/neighbor_search.py:16-335). On TPU, graph construction
belongs on the host inside the input pipeline: it runs once per dataset (fx
mode) or once per sample at load time (vx mode), emits CSR arrays, and the
padding layer converts those to static-shape `[Q, K]` index/mask arrays for
the device.

Backends:
  - ``cpp``:    native C++ grid-hash search (cpp/neighbor_search.cc via ctypes)
  - ``kdtree``: scipy cKDTree
  - ``grid``:   pure NumPy spatial hash
  - ``auto``:   cpp if the shared library is built, else kdtree
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from .native import get_native_lib

CSR = Tuple[np.ndarray, np.ndarray]  # (neighbors_index [E], row_splits [Q+1]) int64


def _as2d(x) -> np.ndarray:
    x = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
    if x.ndim != 2:
        raise ValueError(f"points must be 2D [n, d], got shape {x.shape}")
    return x


def _csr_from_lists(lists) -> CSR:
    counts = np.fromiter((len(l) for l in lists), dtype=np.int64, count=len(lists))
    row_splits = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum(counts, out=row_splits[1:])
    if row_splits[-1] == 0:
        return np.zeros(0, dtype=np.int64), row_splits
    index = np.concatenate([np.asarray(l, dtype=np.int64) for l in lists if len(l)])
    return index, row_splits


def _radius_kdtree(data: np.ndarray, queries: np.ndarray, radius: float) -> CSR:
    from scipy.spatial import cKDTree

    tree = cKDTree(data)
    lists = tree.query_ball_point(queries, r=radius, workers=-1)
    return _csr_from_lists(lists)


def _radius_grid(data: np.ndarray, queries: np.ndarray, radius: float) -> CSR:
    """Pure-NumPy spatial-hash radius search (any dimension)."""
    d = data.shape[1]
    cell = radius
    lo = data.min(axis=0) - 1e-9
    keys_data = np.floor((data - lo) / cell).astype(np.int64)
    # Bucket data points by cell.
    order = np.lexsort(keys_data.T[::-1])
    sorted_keys = keys_data[order]
    uniq, starts = np.unique(sorted_keys, axis=0, return_index=True)
    bucket = {tuple(k): (s, e) for k, s, e in zip(
        map(tuple, uniq), starts, np.append(starts[1:], len(order)))}

    offsets = np.stack(np.meshgrid(*([np.arange(-1, 2)] * d), indexing="ij"),
                       axis=-1).reshape(-1, d)
    keys_q = np.floor((queries - lo) / cell).astype(np.int64)
    r2 = radius * radius
    lists = []
    for qi in range(queries.shape[0]):
        cands = []
        base = keys_q[qi]
        for off in offsets:
            se = bucket.get(tuple(base + off))
            if se is not None:
                cands.append(order[se[0]:se[1]])
        if not cands:
            lists.append(np.zeros(0, dtype=np.int64))
            continue
        cand = np.concatenate(cands)
        diff = data[cand] - queries[qi]
        keep = (diff * diff).sum(axis=1) <= r2
        lists.append(cand[keep])
    return _csr_from_lists(lists)


def _radius_cpp(data: np.ndarray, queries: np.ndarray, radius: float) -> CSR:
    lib = get_native_lib()
    data32 = np.ascontiguousarray(data, dtype=np.float32)
    queries32 = np.ascontiguousarray(queries, dtype=np.float32)
    return lib.radius_search(data32, queries32, float(radius))


def radius_search(data, queries, radius: float, method: str = "auto") -> CSR:
    """All points of ``data`` within ``radius`` of each query point, as CSR."""
    data = _as2d(data)
    queries = _as2d(queries)
    if data.shape[1] != queries.shape[1]:
        raise ValueError("data and queries must have the same coordinate dimension")
    if method == "auto":
        method = "cpp" if get_native_lib() is not None else "kdtree"
    if method == "cpp":
        lib = get_native_lib()
        if lib is None:
            method = "kdtree"
        else:
            return _radius_cpp(data, queries, radius)
    if method == "kdtree":
        return _radius_kdtree(data, queries, radius)
    if method == "grid":
        return _radius_grid(data, queries, radius)
    raise ValueError(f"Unknown neighbor search method: {method}")


def knn_search(data, queries, k: int, method: str = "auto") -> CSR:
    """k nearest neighbors of each query, as CSR (every row has exactly k).

    Backends: ``cpp`` (native grid ring-expansion search, gaot_knn in
    cpp/neighbor_search.cc, 2D/3D) and ``kdtree`` (scipy cKDTree); ``auto``
    prefers cpp. There is no 'grid' kNN backend — unlike radius search the
    reference has no kNN implementation at all (its MAGNOConfig declares
    neighbor_strategy='knn' as supported, src/model/layers/magno.py:59, but
    _compute_neighbors only ever scales the radius, :186-209), so the method
    set here is ours to define and unknown values are rejected.
    """
    data = _as2d(data)
    queries = _as2d(queries)
    k = min(k, data.shape[0])
    if method not in ("auto", "cpp", "kdtree"):
        raise ValueError(f"Unknown kNN search method: {method}")
    if method in ("auto", "cpp"):
        lib = get_native_lib()
        if lib is not None and data.shape[1] in (2, 3):
            data32 = np.ascontiguousarray(data, dtype=np.float32)
            queries32 = np.ascontiguousarray(queries, dtype=np.float32)
            idx = lib.knn_search(data32, queries32, k)
            row_splits = np.arange(queries.shape[0] + 1, dtype=np.int64) * k
            return idx.reshape(-1), row_splits
        if method == "cpp":
            raise RuntimeError(
                "knn_search(method='cpp'): native library unavailable or "
                f"unsupported dim {data.shape[1]} (2D/3D only)")
    from scipy.spatial import cKDTree

    tree = cKDTree(data)
    _, idx = tree.query(queries, k=k, workers=-1)
    idx = np.atleast_2d(idx)
    if idx.ndim == 1:
        idx = idx[:, None]
    row_splits = np.arange(queries.shape[0] + 1, dtype=np.int64) * k
    return idx.reshape(-1).astype(np.int64), row_splits


class NeighborSearch:
    """Callable wrapper mirroring the reference NeighborSearch API
    (src/model/layers/utils/neighbor_search.py:65-106): returns a dict with
    ``neighbors_index`` and ``neighbors_row_splits``."""

    def __init__(self, method: str = "auto", strategy: str = "radius", k: int = 16):
        self.method = method
        self.strategy = strategy
        self.k = k

    def __call__(self, data, queries, radius: float = None) -> dict:
        if self.strategy == "knn":
            index, splits = knn_search(data, queries, self.k, method=self.method)
        else:
            index, splits = radius_search(data, queries, radius, method=self.method)
        return {"neighbors_index": index, "neighbors_row_splits": splits}
