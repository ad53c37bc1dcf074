"""Data pipeline tests: readers, processors, loaders, graph builder."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from synthetic import make_sequential_fx_dataset, make_static_fx_dataset  # noqa: E402

from gaot_tpu.core.config import DatasetConfig, merge_config  # noqa: E402
from gaot_tpu.core.metadata import DATASET_METADATA  # noqa: E402
from gaot_tpu.data import (  # noqa: E402
    BatchLoader,
    DataProcessor,
    GraphBuilder,
    compute_sequential_stats,
    generate_time_pairs,
    read_dataset,
)


def test_npz_reader(tmp_path):
    make_static_fx_dataset(str(tmp_path / "toy.npz"), num_samples=4, num_nodes=10)
    out = read_dataset(str(tmp_path), "toy", ["u", "c", "x", "missing"])
    assert out["u"].shape == (4, 1, 10, 1)
    assert out["c"].shape == (4, 1, 10, 1)
    assert out["missing"] is None


def test_h5_nc_reader(tmp_path):
    import h5py

    with h5py.File(tmp_path / "toy.nc", "w") as f:
        f["u"] = np.ones((3, 1, 5, 2), np.float32)
        f["x"] = np.zeros((1, 1, 5, 2), np.float32)
    out = read_dataset(str(tmp_path), "toy", ["u", "c", "x"])
    assert out["u"].shape == (3, 1, 5, 2)
    assert out["c"] is None


def _write_reference_shaped_nc4(path, rng):
    """An xarray/netCDF4-written Poseidon-style file, replicated at the HDF5
    level: named dimension scales, u [sample, time, node, var] float32 with a
    _FillValue, x [1, 1, node, 2] (fix_x layout, data_processor.py:95-103 in
    the reference), and an int16 scale_factor/add_offset packed c — the CF
    encodings xr.open_dataset silently undoes (masking → NaN, unpacking)."""
    import h5py

    s, t, n, v = 6, 1, 12, 2
    u = rng.normal(size=(s, t, n, v)).astype(np.float32)
    c_true = rng.uniform(0, 1, size=(s, t, n, 1))
    x = rng.uniform(-1, 1, size=(1, 1, n, 2)).astype(np.float32)
    fill = np.float32(9.96921e36)  # netCDF default float fill
    u_stored = u.copy()
    u_stored[0, 0, 3, 1] = fill
    u_stored[2, 0, 0, 0] = fill
    scale, offset = 2.0 / 65000, 0.5
    c_packed = np.round((c_true - offset) / scale).astype(np.int16)
    with h5py.File(path, "w") as f:
        for dim, size in [("sample", s), ("time", t), ("node", n),
                          ("var", v), ("cvar", 1), ("dim", 2)]:
            d = f.create_dataset(dim, data=np.arange(size, dtype=np.float64))
            d.make_scale(dim)
        du = f.create_dataset("u", data=u_stored)
        du.attrs["_FillValue"] = fill
        for i, dim in enumerate(["sample", "time", "node", "var"]):
            du.dims[i].attach_scale(f[dim])
        dc = f.create_dataset("c", data=c_packed)
        dc.attrs["scale_factor"] = scale
        dc.attrs["add_offset"] = offset
        f.create_dataset("x", data=x)
    mask = np.zeros(u.shape, bool)
    mask[0, 0, 3, 1] = mask[2, 0, 0, 0] = True
    return u, mask, c_packed * scale + offset, x


def test_nc4_reader_reference_layout(tmp_path):
    """h5py .nc path on a faithfully reference-shaped NetCDF4 file: dim
    order preserved, _FillValue masked to NaN, packed ints unpacked — what
    xr.open_dataset(...)[g].values returns (src/datasets/data_processor.py:
    72-90)."""
    rng = np.random.default_rng(0)
    u, fillmask, c_dec, x = _write_reference_shaped_nc4(tmp_path / "toy.nc", rng)
    out = read_dataset(str(tmp_path), "toy", ["u", "c", "x"])
    assert out["u"].shape == u.shape  # [sample, time, node, var] order kept
    assert np.isnan(out["u"][fillmask]).all()
    np.testing.assert_array_equal(out["u"][~fillmask], u[~fillmask])
    assert out["c"].dtype == np.float64  # packed int16 promotes, per xarray
    np.testing.assert_allclose(out["c"], c_dec, rtol=0, atol=1e-12)
    np.testing.assert_array_equal(out["x"], x)


def test_netcdf3_fallback_reference_layout(tmp_path):
    """Classic NetCDF3 files are not HDF5 — h5py raises and read_dataset
    falls back to scipy.io.netcdf_file, with the same CF decoding."""
    from scipy.io import netcdf_file

    s, t, n = 4, 1, 8
    rng = np.random.default_rng(1)
    u = rng.normal(size=(s, t, n, 1)).astype(np.float32)
    fill = np.float32(-999.0)
    u_stored = u.copy()
    u_stored[1, 0, 2, 0] = fill
    x = rng.uniform(-1, 1, size=(1, 1, n, 2)).astype(np.float32)
    with netcdf_file(tmp_path / "toy.nc", "w") as f:
        for dim, size in [("sample", s), ("time", t), ("node", n),
                          ("var", 1), ("dim", 2)]:
            f.createDimension(dim, size)
        vu = f.createVariable("u", np.float32,
                              ("sample", "time", "node", "var"))
        vu[:] = u_stored
        vu._FillValue = fill
        vx = f.createVariable("x", np.float32,
                              ("sample", "time", "node", "dim"))
        vx[:] = np.broadcast_to(x, (s, 1, n, 2))
    out = read_dataset(str(tmp_path), "toy", ["u", "c", "x"])
    assert np.isnan(out["u"][1, 0, 2, 0])
    u_ok = np.ones(u.shape, bool)
    u_ok[1, 0, 2, 0] = False
    np.testing.assert_array_equal(out["u"][u_ok], u[u_ok])
    assert out["c"] is None
    assert out["x"].shape == (s, 1, n, 2)  # vx layout: per-sample coords


def test_data_processor_normalization(tmp_path):
    make_static_fx_dataset(str(tmp_path / "toy.npz"), num_samples=24, num_nodes=32)
    cfg = merge_config(DatasetConfig, {
        "name": "toy", "metaname": "elliptic_pdes/Poisson-Gauss",
        "base_path": str(tmp_path), "train_size": 16, "val_size": 4,
        "test_size": 4})
    proc = DataProcessor(cfg, DATASET_METADATA[cfg.metaname])
    splits, is_vx = proc.load_and_process_data()
    assert not is_vx
    u_tr = splits["train"]["u"]
    np.testing.assert_allclose(u_tr.reshape(-1, 1).mean(), 0, atol=1e-5)
    np.testing.assert_allclose(u_tr.reshape(-1, 1).std(), 1, atol=1e-3)
    # val/test normalized with TRAIN stats (not their own)
    assert abs(splits["val"]["u"].mean()) < 1.0
    # latent queries span [-1, 1]
    lat = proc.generate_latent_queries((8, 8))
    assert lat.shape == (64, 2)
    assert lat.min() == -1.0 and lat.max() == 1.0


def test_rand_dataset_splits_follow_seed(tmp_path):
    """Split permutations derive from the experiment seed (the reference draws
    them from the globally seeded numpy state, src/core/base_trainer.py:60 +
    src/datasets/data_processor.py:206-207): different seeds -> different
    rand_dataset splits; the same seed -> bit-identical splits."""
    make_static_fx_dataset(str(tmp_path / "toy.npz"), num_samples=64, num_nodes=16)
    cfg = merge_config(DatasetConfig, {
        "name": "toy", "metaname": "elliptic_pdes/Poisson-Gauss",
        "base_path": str(tmp_path), "train_size": 32, "val_size": 8,
        "test_size": 8, "rand_dataset": True})
    md = DATASET_METADATA[cfg.metaname]

    def train_u(seed):
        proc = DataProcessor(cfg, md, seed=seed)
        splits, _ = proc.load_and_process_data()
        return splits["train"]["u"]

    a, b, c = train_u(0), train_u(1), train_u(0)
    np.testing.assert_array_equal(a, c)
    assert not np.array_equal(a, b)


def test_batch_loader_padding_and_mask():
    data = np.arange(10, dtype=np.float32)
    loader = BatchLoader(10, 4, lambda idx: {"x": data[idx]})
    batches = list(loader)
    assert len(batches) == 3
    assert all(b["x"].shape == (4,) for b in batches)
    assert batches[-1]["sample_mask"].sum() == 2  # 10 = 4+4+2
    total_valid = sum(b["sample_mask"].sum() for b in batches)
    assert total_valid == 10


def test_batch_loader_shuffle_deterministic():
    loader = BatchLoader(8, 4, lambda idx: {"i": idx.copy()}, shuffle=True, seed=1)
    e1 = [b["i"].tolist() for b in loader]
    e2 = [b["i"].tolist() for b in loader]
    assert e1 != e2  # different epochs reshuffle
    flat = sorted(x for b in e1 for x in b)
    assert flat == list(range(8))


def test_generate_time_pairs_reference_grid():
    """15 timesteps, stride 2 → lags {2,4,...,14}: 7+6+5+4+3+2+1 = 28 pairs."""
    t_in, t_out = generate_time_pairs(14, 2)
    assert len(t_in) == 28
    lags = t_out - t_in
    assert set(lags) == {2, 4, 6, 8, 10, 12, 14}
    assert (t_in % 2 == 0).all()


def test_sequential_stats_shapes():
    rng = np.random.default_rng(0)
    u = rng.normal(size=(6, 15, 20, 2)).astype(np.float32)
    t = np.linspace(0, 1, 15)
    stats = compute_sequential_stats(u, None, t, max_time_diff=14, time_step=2)
    for key in ["u", "start_time", "time_diffs", "res", "der"]:
        assert key in stats
    assert stats["u"]["mean"].shape == (2,)
    # derivative stats scale by 1/dt
    dt = t[1] - t[0]
    np.testing.assert_allclose(stats["der"]["std"], stats["res"]["std"] / dt,
                               rtol=1e-5)


def test_vx_graph_cache_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (4, 1, 40, 2)).astype(np.float32)
    lat = np.stack(np.meshgrid(np.linspace(-1, 1, 4), np.linspace(-1, 1, 4),
                               indexing="ij"), -1).reshape(-1, 2)
    splits = {"train": {"x": x[:2]}, "val": {"x": x[2:3]}, "test": {"x": x[3:]}}
    builder = GraphBuilder()
    g1 = builder.build_all_vx_graphs_cached(
        str(tmp_path), "toy", splits, lat, 0.4, [1.0])
    g2 = builder.build_all_vx_graphs_cached(
        str(tmp_path), "toy", splits, lat, 0.4, [1.0])
    for split in ["train", "val", "test"]:
        np.testing.assert_array_equal(g1[split].coords, g2[split].coords)
        np.testing.assert_array_equal(g1[split].encoder[0].indices,
                                      g2[split].encoder[0].indices)
    # different radius → different cache entry
    g3 = builder.build_all_vx_graphs_cached(
        str(tmp_path), "toy", splits, lat, 0.6, [1.0])
    assert g3["train"].encoder[0].mask.sum() > g1["train"].encoder[0].mask.sum()


def test_knn_strategy_builder():
    """Pins the kNN multi-scale rule: scale s maps k -> round(knn_k * s).

    This is OUR semantics, not the reference's: the reference declares
    neighbor_strategy='knn' as supported (src/model/layers/magno.py:59) but
    never implements it — _compute_neighbors always runs a radius search with
    scaled_radius = radius * scale (:186-209). The kNN analogue of "a larger
    scale sees a larger neighborhood" is a proportionally larger k; in d
    dimensions radius*s covers ~s^d times the points, so k*s is the more
    conservative growth. Pinned here so the rule is a documented contract."""
    rng = np.random.default_rng(1)
    coords = rng.uniform(-1, 1, (100, 2))
    lat = rng.uniform(-1, 1, (30, 2))
    builder = GraphBuilder(strategy="knn", knn_k=5, pad_multiple=1)
    enc, dec = builder.build_fx_graphs(coords, lat, radius=0.0, scales=[1.0, 2.0])
    assert (enc[0].mask.sum(-1) == 5).all()
    assert (enc[1].mask.sum(-1) == 10).all()  # scale multiplies k
    assert (dec[0].mask.sum(-1) == 5).all()
    # fractional scales round to the nearest k and never drop below 1
    assert builder._search(coords, lat, 0.0, scale=0.5)[1][1] == 2  # round(2.5)
    assert builder._search(coords, lat, 0.0, scale=0.01)[1][1] == 1


def test_prefetch_loader_matches_direct_iteration():
    from gaot_tpu.data.loader import BatchLoader, PrefetchLoader

    u = np.arange(7 * 3, dtype=np.float32).reshape(7, 3)
    mk = lambda: BatchLoader(7, 2, lambda idx: {"u": u[idx]},
                             shuffle=True, seed=3)
    direct = list(mk())
    prefetched = list(PrefetchLoader(mk()))
    assert len(direct) == len(prefetched)
    for a, b in zip(direct, prefetched):
        np.testing.assert_array_equal(a["u"], b["u"])
        np.testing.assert_array_equal(a["sample_mask"], b["sample_mask"])


def test_native_take_rows_matches_numpy():
    from gaot_tpu.ops.native import get_native_lib, take_rows

    rng = np.random.default_rng(0)
    src = rng.normal(size=(257, 129)).astype(np.float32)
    idx = rng.integers(0, 257, 64)
    np.testing.assert_array_equal(take_rows(src, idx), src[idx])
    lib = get_native_lib()
    if lib is not None:  # force the native path regardless of size threshold
        big = rng.normal(size=(512, 4096)).astype(np.float32)
        bidx = rng.integers(0, 512, 300)
        np.testing.assert_array_equal(lib.gather_rows(big, bidx), big[bidx])
        # bool and int dtypes too (graph masks/indices)
        m = rng.integers(0, 2, (512, 640)).astype(bool)
        np.testing.assert_array_equal(lib.gather_rows(m, bidx), m[bidx])


def test_morton_vx_build_permutes_consistently():
    """magno.morton_ordering: build_vx_split reorders nodes by Z-order and
    surfaces node_perm; loaders must reorder u/c identically so every
    (coord, value) pair survives. Data-layout change only."""
    from gaot_tpu.data.graph_builder import apply_node_perm

    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (3, 50, 2)).astype(np.float32)
    lat = np.stack(np.meshgrid(np.linspace(-1, 1, 4), np.linspace(-1, 1, 4),
                               indexing="ij"), -1).reshape(-1, 2)
    plain = GraphBuilder(morton=False).build_vx_split(x, lat, 0.4, [1.0])
    sorted_ = GraphBuilder(morton=True).build_vx_split(x, lat, 0.4, [1.0])
    assert plain.node_perm is None
    assert sorted_.node_perm.shape == (3, 50)
    n = 50
    for i in range(3):
        # coords are the original ones, reordered by node_perm
        np.testing.assert_allclose(sorted_.coords[i, :n],
                                   plain.coords[i, :n][sorted_.node_perm[i]],
                                   rtol=1e-6)
        # graphs reference the permuted node ids: encoder neighbor coords
        # drawn via the new indices must be near their latent queries
        m = sorted_.encoder[0].mask[i]
        picked = sorted_.coords[i][sorted_.encoder[0].indices[i]]
        d = np.linalg.norm(picked - lat[:, None, :], axis=-1)
        assert (d[m] <= 0.4 + 1e-6).all()

    # apply_node_perm pairs u rows with the permuted coords, for both
    # static [S, N, C] and sequential [S, T, N, C] layouts (+ padded input)
    u3 = rng.normal(size=(3, 50, 2)).astype(np.float32)
    u4 = rng.normal(size=(3, 4, 50, 2)).astype(np.float32)
    p3 = apply_node_perm(sorted_.node_perm, u3)
    p4 = apply_node_perm(sorted_.node_perm, u4)
    for i in range(3):
        np.testing.assert_array_equal(p3[i], u3[i][sorted_.node_perm[i]])
        np.testing.assert_array_equal(p4[i], u4[i][:, sorted_.node_perm[i]])
    padded = np.pad(u3, ((0, 0), (0, 14), (0, 0)))
    pp = apply_node_perm(sorted_.node_perm, padded)
    np.testing.assert_array_equal(pp[:, :n], p3)
    np.testing.assert_array_equal(pp[:, n:], 0)


def test_morton_static_vx_loader_pairs_values_with_coords():
    """The static vx loader must emit (x, u) batches whose per-node pairing
    matches the unpermuted build exactly (as a set of rows)."""
    from gaot_tpu.data.loader import make_static_vx_loader

    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, (4, 30, 2)).astype(np.float32)
    u = rng.normal(size=(4, 30, 1)).astype(np.float32)
    lat = np.stack(np.meshgrid(np.linspace(-1, 1, 3), np.linspace(-1, 1, 3),
                               indexing="ij"), -1).reshape(-1, 2)

    def rows(builder):
        g = builder.build_all_vx_graphs({"test": {"x": x}}, lat, 0.5, [1.0],
                                        build_train=False)["test"]
        loader = make_static_vx_loader(None, u, g, batch_size=4)
        batch = next(iter(loader))
        mask = batch["node_mask"]
        paired = np.concatenate([batch["x"], batch["u"]], -1)
        return {tuple(np.round(r, 5)) for s in range(4)
                for r in paired[s][mask[s]]}

    assert rows(GraphBuilder(morton=True)) == rows(GraphBuilder(morton=False))
