"""Sequential (time-dependent) data processing.

Host-side NumPy equivalents of the reference's temporal stack:
- sequential statistics incl. time-pair/residual/derivative stats
  (src/core/trainer_utils.py:203-308),
- SequentialDataProcessor (src/datasets/sequential_data_processor.py:14-226),
- DynamicPairDataset time-pair training batches (src/datasets/data_utils.py:73-235),
- TestDataset rollout-evaluation batches (src/datasets/data_utils.py:317-402).

All time pairs share one static shape, so training compiles once; the pair
enumeration and per-pair normalization are vectorized NumPy executed inside
the batch loader (no per-item Python Dataset indexing).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from .data_processor import EPSILON, POSEIDON_DATASETS, DataProcessor
from .loader import BatchLoader
from .readers import read_dataset


def compute_sequential_stats(u_data: np.ndarray, c_data: Optional[np.ndarray],
                             t_values: np.ndarray, metadata=None,
                             max_time_diff: int = 14, time_step: int = 2,
                             sample_rate: float = 1.0,
                             use_metadata_stats: bool = False,
                             use_time_norm: bool = True) -> Dict:
    """Statistics for sequential training (u/c stats, time-pair start/diff
    stats over the lag grid, residual & derivative stats from consecutive
    steps). Mirrors reference trainer_utils.py:203-308."""
    stats: Dict = {}

    if use_metadata_stats and metadata is not None \
            and hasattr(metadata, "u_mean") and hasattr(metadata, "u_std"):
        stats["u"] = {"mean": np.asarray(metadata.u_mean),
                      "std": np.asarray(metadata.u_std)}
    else:
        flat = u_data.reshape(-1, u_data.shape[-1])
        stats["u"] = {"mean": flat.mean(0), "std": flat.std(0) + EPSILON}

    if c_data is not None:
        flat = c_data.reshape(-1, c_data.shape[-1])
        stats["c"] = {"mean": flat.mean(0), "std": flat.std(0) + EPSILON}

    if use_time_norm:
        # Clamp to the timesteps actually present (datasets can be shorter
        # than max_time_diff+1).
        t_lim = min(max_time_diff, len(t_values) - 1)
        t_in, t_out = [], []
        for lag in range(time_step, t_lim + 1, time_step):
            for i in range(0, t_lim - lag + 1, time_step):
                t_in.append(i)
                t_out.append(i + lag)
        t_in = np.asarray(t_in)
        t_out = np.asarray(t_out)
        start_times = t_values[t_in]
        time_diffs = t_values[t_out] - t_values[t_in]
        stats["start_time"] = {"mean": start_times.mean(),
                               "std": start_times.std() + EPSILON}
        stats["time_diffs"] = {"mean": time_diffs.mean(),
                               "std": time_diffs.std() + EPSILON}

    # At least one sample: tiny datasets with the default sample_rate=0.1
    # would otherwise skip the residual/derivative stats the stepper needs.
    n_sub = min(max(1, int(len(u_data) * sample_rate)), len(u_data))
    if n_sub > 0:
        t_lim = min(max_time_diff, u_data.shape[1] - 1)
        u_sub = u_data[:n_sub, :t_lim + 1]                       # [S, T, N, V]
        residuals = u_sub[:, 1:] - u_sub[:, :-1]                 # [S, T-1, N, V]
        dts = (t_values[1:t_lim + 1] - t_values[:t_lim]).reshape(1, -1, 1, 1)
        derivatives = residuals / dts
        res_flat = residuals.reshape(-1, residuals.shape[-1])
        der_flat = derivatives.reshape(-1, derivatives.shape[-1])
        stats["res"] = {"mean": res_flat.mean(0), "std": res_flat.std(0) + EPSILON}
        stats["der"] = {"mean": der_flat.mean(0), "std": der_flat.std(0) + EPSILON}

    return stats


def generate_time_pairs(num_timesteps: int, time_step: int) -> Tuple[np.ndarray, np.ndarray]:
    """All (i, i+lag) pairs with lag ∈ {time_step, 2·time_step, …} on the
    stride grid (reference data_utils.py:121-135)."""
    t_in, t_out = [], []
    for lag in range(time_step, num_timesteps + 1, time_step):
        for i in range(0, num_timesteps - lag + 1, time_step):
            t_in.append(i)
            t_out.append(i + lag)
    return np.asarray(t_in), np.asarray(t_out)


class SequentialDataProcessor(DataProcessor):
    """Loads sequential datasets, keeping the time dimension, and computes
    the sequential statistics used for per-pair normalization."""

    def __init__(self, dataset_config, metadata, dtype=np.float32, seed: int = 0):
        super().__init__(dataset_config, metadata, dtype, seed=seed)
        self.t_values: Optional[np.ndarray] = None
        self.stats: Optional[Dict] = None
        self.max_time_diff = dataset_config.max_time_diff
        self.time_step = dataset_config.time_step
        self.stepper_mode = dataset_config.stepper_mode
        self.use_time_norm = dataset_config.use_time_norm
        self.use_metadata_stats = dataset_config.use_metadata_stats
        self.sample_rate = dataset_config.sample_rate

    def load_and_process_data(self) -> Tuple[Dict, bool]:
        raw = self._load_raw_sequential_data()
        is_vx = self._determine_coordinate_mode()
        splits = self._split_sequential(raw, is_vx)
        return splits, is_vx

    def _load_raw_sequential_data(self) -> Dict:
        md = self.metadata
        raw = read_dataset(self.dataset_config.base_path, self.dataset_config.name,
                           [md.group_u, md.group_c, md.group_x])
        u = raw[md.group_u]
        c = raw[md.group_c] if md.group_c is not None else None
        x = raw[md.group_x] if md.group_x is not None else None
        if x is None:
            x = self._generate_sequential_grid_coords(u)
        if md.domain_t is None:
            raise ValueError("metadata.domain_t is None for a sequential dataset")
        t0, t1 = md.domain_t
        self.t_values = np.linspace(t0, t1, u.shape[1])

        if (self.dataset_config.name in POSEIDON_DATASETS
                and self.dataset_config.use_sparse):
            u = u[:, :, :9216, :]
            c = c[:, :, :9216, :] if c is not None else None
            x = x[:, :, :9216, :]

        u = u[..., list(md.active_variables)]
        return {"u": u, "c": c, "x": x}

    def _generate_sequential_grid_coords(self, u: np.ndarray) -> np.ndarray:
        num_nodes = u.shape[2]
        grid = int(np.sqrt(num_nodes))
        if grid * grid != num_nodes:
            raise ValueError(f"Cannot create square grid from {num_nodes} nodes")
        (x_min, y_min), (x_max, y_max) = self.metadata.domain_x
        xv, yv = np.meshgrid(np.linspace(x_min, x_max, grid),
                             np.linspace(y_min, y_max, grid), indexing="ij")
        return np.stack([xv, yv], -1).reshape(-1, 2)[None, None]

    def _split_sequential(self, raw: Dict, is_vx: bool) -> Dict:
        u, c, x = raw["u"], raw["c"], raw["x"]
        # Truncate T to max_time_diff+1 (reference seq processor lines 156-164).
        if self.max_time_diff is not None:
            t_max = self.max_time_diff + 1
            u = u[:, :t_max]
            c = c[:, :t_max] if c is not None else None
            if is_vx and x.shape[1] > 1:
                x = x[:, :t_max]
            self.t_values = self.t_values[:t_max]

        tr, va, te = self._get_split_indices(u.shape[0])
        out = {}
        for name, idx in (("train", tr), ("val", va), ("test", te)):
            out[name] = {
                "u": np.ascontiguousarray(u[idx], dtype=self.dtype),
                "c": (np.ascontiguousarray(c[idx], dtype=self.dtype)
                      if c is not None else None),
                "x": (np.ascontiguousarray(x[idx], dtype=self.dtype) if is_vx
                      else np.asarray(x[0, 0], dtype=self.dtype)),
                "t": self.t_values.astype(self.dtype),
            }

        self.stats = compute_sequential_stats(
            out["train"]["u"], out["train"]["c"], self.t_values,
            metadata=self.metadata, max_time_diff=self.max_time_diff,
            time_step=self.time_step, sample_rate=self.sample_rate,
            use_metadata_stats=self.use_metadata_stats,
            use_time_norm=self.use_time_norm)
        return out


class DynamicPairBatcher:
    """Vectorized time-pair sample generator (DynamicPairDataset equivalent).

    Enumerates (sample, pair) combinations; get_batch builds normalized
    inputs [u_norm ‖ c_norm ‖ start_time ‖ time_diff] and stepper-mode
    targets on the fly.
    """

    def __init__(self, u_data: np.ndarray, c_data: Optional[np.ndarray],
                 t_values: np.ndarray, max_time_diff: int, time_step: int,
                 stepper_mode: str, stats: Dict, use_time_norm: bool = True,
                 x_data: Optional[np.ndarray] = None, graphs=None):
        """``graphs`` (a VxSplitGraphs) switches on vx mode: per-sample padded
        graphs/coords/node-masks are emitted with each batch, and u/c are
        Morton-reordered to the graphs' node layout and node-padded to the
        graphs' N_pad."""
        if graphs is not None:
            from .graph_builder import apply_node_perm

            u_data = apply_node_perm(graphs.node_perm, u_data)
            c_data = apply_node_perm(graphs.node_perm, c_data)
            n_pad = graphs.coords.shape[1]
            pad = n_pad - u_data.shape[2]
            if pad > 0:
                u_data = np.pad(u_data, ((0, 0), (0, 0), (0, pad), (0, 0)))
                if c_data is not None:
                    c_data = np.pad(c_data, ((0, 0), (0, 0), (0, pad), (0, 0)))
        self.u = u_data
        self.c = c_data
        self.x = x_data
        self.graphs = graphs
        self.stats = stats
        self.stepper_mode = stepper_mode

        num_timesteps = min(u_data.shape[1] - 1, max_time_diff)
        self.t_values = t_values[:num_timesteps + 1]
        self.t_in, self.t_out = generate_time_pairs(num_timesteps, time_step)
        self.time_diffs = self.t_values[self.t_out] - self.t_values[self.t_in]
        if use_time_norm and stats is not None:
            st = stats["start_time"]
            td = stats["time_diffs"]
            self.start_norm = (self.t_values[self.t_in] - st["mean"]) / st["std"]
            self.diff_norm = (self.time_diffs - td["mean"]) / td["std"]
        else:
            self.start_norm = self.t_values[self.t_in]
            self.diff_norm = self.time_diffs

        self.num_samples = u_data.shape[0]
        self.num_pairs = len(self.t_in)

    def __len__(self) -> int:
        return self.num_samples * self.num_pairs

    def get_batch(self, flat_idx: np.ndarray) -> Dict[str, np.ndarray]:
        s_idx = flat_idx // self.num_pairs
        p_idx = flat_idx % self.num_pairs
        t_in = self.t_in[p_idx]
        t_out = self.t_out[p_idx]

        u_in = self.u[s_idx, t_in]                                # [B, N, V]
        u_out = self.u[s_idx, t_out]
        u_stats = self.stats["u"]
        u_in_norm = (u_in - u_stats["mean"]) / u_stats["std"]

        feats = [u_in_norm]
        if self.c is not None:
            c_in = self.c[s_idx, t_in]
            if "c" in self.stats:
                c_in = (c_in - self.stats["c"]["mean"]) / self.stats["c"]["std"]
            feats.append(c_in)
        n = u_in.shape[1]
        ones = np.ones((len(flat_idx), n, 1), dtype=u_in.dtype)
        feats.append(ones * self.start_norm[p_idx][:, None, None])
        feats.append(ones * self.diff_norm[p_idx][:, None, None])
        inputs = np.concatenate(feats, axis=-1)

        if self.stepper_mode == "output":
            target = (u_out - u_stats["mean"]) / u_stats["std"]
        elif self.stepper_mode == "residual":
            r = self.stats["res"]
            target = (u_out - u_in - r["mean"]) / r["std"]
        elif self.stepper_mode == "time_der":
            d = self.stats["der"]
            dt = self.time_diffs[p_idx][:, None, None]
            target = ((u_out - u_in) / dt - d["mean"]) / d["std"]
        else:
            raise ValueError(f"Unsupported stepper_mode: {self.stepper_mode}")

        batch = {"input": inputs.astype(self.u.dtype),
                 "target": target.astype(self.u.dtype)}
        if self.graphs is not None:
            _attach_vx_graphs(batch, self.graphs, s_idx)
        elif self.x is not None:
            batch["x"] = self.x[s_idx, t_in]
        return batch


    def device_parts(self):
        """(dev_pytree, assemble) for device-resident batching: u/c/graph
        arrays live on the accelerator and ``assemble(dev, flat_idx)`` builds
        the time-pair inputs/targets on device (traceable — used both per
        batch and inside the trainers' whole-epoch scan)."""
        import jax
        import jax.numpy as jnp

        bufs = {"u": self.u}
        if self.c is not None:
            bufs["c"] = self.c
        if self.graphs is not None:
            bufs.update(_graph_buffers(self.graphs))
        elif self.x is not None:
            bufs["x_seq"] = self.x
        dev = jax.device_put(bufs)

        t_in = jnp.asarray(self.t_in)
        t_out = jnp.asarray(self.t_out)
        start_norm = jnp.asarray(self.start_norm, dtype=jnp.float32)
        diff_norm = jnp.asarray(self.diff_norm, dtype=jnp.float32)
        time_diffs = jnp.asarray(self.time_diffs, dtype=jnp.float32)
        num_pairs = self.num_pairs
        stepper = self.stepper_mode
        stats = self.stats
        dtype = self.u.dtype

        def assemble(dev, flat_idx):
            s_idx = flat_idx // num_pairs
            p_idx = flat_idx % num_pairs
            ti = t_in[p_idx]
            to = t_out[p_idx]
            u_in = dev["u"][s_idx, ti]
            u_out = dev["u"][s_idx, to]
            us = stats["u"]
            u_in_norm = (u_in - us["mean"]) / us["std"]
            feats = [u_in_norm]
            if "c" in dev:
                c_in = dev["c"][s_idx, ti]
                if "c" in stats:
                    c_in = (c_in - stats["c"]["mean"]) / stats["c"]["std"]
                feats.append(c_in)
            n = u_in.shape[1]
            ones = jnp.ones((flat_idx.shape[0], n, 1), dtype=u_in.dtype)
            feats.append(ones * start_norm[p_idx][:, None, None])
            feats.append(ones * diff_norm[p_idx][:, None, None])
            inputs = jnp.concatenate(feats, axis=-1)

            if stepper == "output":
                target = (u_out - us["mean"]) / us["std"]
            elif stepper == "residual":
                r = stats["res"]
                target = (u_out - u_in - r["mean"]) / r["std"]
            elif stepper == "time_der":
                d = stats["der"]
                dt = time_diffs[p_idx][:, None, None]
                target = ((u_out - u_in) / dt - d["mean"]) / d["std"]
            else:
                raise ValueError(f"Unsupported stepper_mode: {stepper}")

            batch = {"input": inputs.astype(dtype), "target": target.astype(dtype)}
            for k in dev:
                if k in ("u", "c"):
                    continue
                if k == "x_seq":
                    batch["x"] = dev[k][s_idx, ti]
                else:
                    batch[k] = dev[k][s_idx]
            return batch

        return dev, assemble

    def make_device_get_batch(self):
        """Per-batch device batching built on :meth:`device_parts`."""
        import jax
        import jax.numpy as jnp

        dev, assemble = self.device_parts()
        assemble_j = jax.jit(assemble)

        def get_batch(idx):
            return dict(assemble_j(dev, jnp.asarray(idx, dtype=jnp.int32)))

        get_batch.device_epoch_spec = (dev, assemble)
        return get_batch


def make_sequential_loader(batcher: DynamicPairBatcher, batch_size: int,
                           shuffle: bool = False, seed: int = 0,
                           device_data: bool = False) -> BatchLoader:
    get_batch = batcher.get_batch
    if device_data:
        from .loader import DEVICE_DATA_BYTE_LIMIT, _device_data_usable

        device_data = _device_data_usable()
    if device_data:

        total = batcher.u.nbytes + (batcher.c.nbytes if batcher.c is not None else 0)
        if batcher.graphs is not None:
            total += sum(v.nbytes for v in _graph_buffers(batcher.graphs).values())
        if total <= DEVICE_DATA_BYTE_LIMIT:
            try:
                get_batch = batcher.make_device_get_batch()
            except Exception:
                get_batch = batcher.get_batch
    loader = BatchLoader(len(batcher), batch_size, get_batch,
                         shuffle=shuffle, seed=seed)
    loader.device_epoch_spec = getattr(get_batch, "device_epoch_spec", None)
    return loader


class RolloutTestBatcher:
    """TestDataset equivalent: initial state at time_indices[0] with dummy
    time features, plus the ground-truth target sequence."""

    def __init__(self, u_data: np.ndarray, c_data: Optional[np.ndarray],
                 time_indices: np.ndarray, stats: Dict,
                 x_data: Optional[np.ndarray] = None, graphs=None):
        if graphs is not None:
            from .graph_builder import apply_node_perm

            u_data = apply_node_perm(graphs.node_perm, u_data)
            c_data = apply_node_perm(graphs.node_perm, c_data)
            n_pad = graphs.coords.shape[1]
            pad = n_pad - u_data.shape[2]
            if pad > 0:
                u_data = np.pad(u_data, ((0, 0), (0, 0), (0, pad), (0, 0)))
                if c_data is not None:
                    c_data = np.pad(c_data, ((0, 0), (0, 0), (0, pad), (0, 0)))
        self.u = u_data
        self.c = c_data
        self.x = x_data
        self.graphs = graphs
        self.time_indices = np.asarray(time_indices)
        self.stats = stats
        self.num_samples = u_data.shape[0]

    def __len__(self) -> int:
        return self.num_samples

    def get_batch(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        t0 = self.time_indices[0]
        u0 = self.u[idx, t0]                                     # [B, N, V]
        u_stats = self.stats["u"]
        feats = [(u0 - u_stats["mean"]) / u_stats["std"]]
        if self.c is not None:
            c0 = self.c[idx, t0]
            if "c" in self.stats:
                c0 = (c0 - self.stats["c"]["mean"]) / self.stats["c"]["std"]
            feats.append(c0)
        n = u0.shape[1]
        dummy = np.zeros((len(idx), n, 1), dtype=u0.dtype)
        feats.extend([dummy, dummy])
        batch = {
            "input": np.concatenate(feats, -1).astype(self.u.dtype),
            "target": self.u[idx][:, self.time_indices[1:]],    # [B, T-1, N, V]
        }
        if self.graphs is not None:
            _attach_vx_graphs(batch, self.graphs, idx)
        elif self.x is not None:
            batch["x"] = self.x[idx, t0]
        return batch


def _graph_buffers(graphs) -> Dict[str, np.ndarray]:
    """Split-wide per-sample graph arrays keyed like the static vx loader
    (incl. degree-bucketed layouts — data/graph_builder.py)."""
    from .graph_builder import vx_graph_buffers

    return vx_graph_buffers(graphs)


def _attach_vx_graphs(batch: Dict, graphs, sample_idx: np.ndarray) -> None:
    """Attach per-sample padded graph arrays (same keys as the static vx
    loader, data/loader.py). node_perm is a build-time layout record (u/c
    were already reordered in the batcher ctor) — never a batch buffer."""
    for k, v in _graph_buffers(graphs).items():
        if k != "node_perm":
            batch[k] = v[sample_idx]
