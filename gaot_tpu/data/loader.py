"""Host-side batch iterators with static shapes.

Replaces the reference's torch DataLoader + collate stack
(src/datasets/data_processor.py:323-378, src/datasets/data_utils.py:272-314)
with simple NumPy iterators designed for XLA:

- every batch has the same shape: the final partial batch is padded by
  wrapping indices and carries a ``sample_mask`` so losses/metrics ignore
  padding — one compiled program per phase, zero recompiles;
- batches are plain dicts of NumPy arrays; the trainer moves them to device
  (with sharding) via jax.device_put.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterator, Optional

import numpy as np

from ..ops.native import take_rows


class BatchLoader:
    """Iterates a dataset of S samples as fixed-size batches.

    ``get_batch(indices) -> dict`` is supplied by the dataset adapter; this
    class handles shuffling, batch padding, and the sample mask.
    """

    def __init__(self, num_samples: int, batch_size: int,
                 get_batch: Callable[[np.ndarray], Dict[str, np.ndarray]],
                 shuffle: bool = False, seed: int = 0,
                 drop_last: bool = False):
        self.num_samples = num_samples
        self.batch_size = min(batch_size, num_samples) if num_samples else batch_size
        self.get_batch = get_batch
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        self._epoch = 0
        # (dev_pytree, batch_fn) with batch_fn(dev, idx)->dict traceable —
        # set when batches are gathered from device-resident split arrays;
        # enables the trainers' whole-epoch lax.scan path (one dispatch per
        # epoch instead of one per step).
        self.device_epoch_spec = None

    def __len__(self) -> int:
        if self.drop_last:
            return self.num_samples // self.batch_size
        return (self.num_samples + self.batch_size - 1) // self.batch_size

    def _epoch_order(self) -> np.ndarray:
        self._epoch += 1
        return (self._rng.permutation(self.num_samples) if self.shuffle
                else np.arange(self.num_samples))

    def epoch_index_matrix(self):
        """(indices [k, B] int32, mask [k, B] bool) for one epoch — the same
        order/padding __iter__ would produce (advances the shuffle rng)."""
        order = self._epoch_order()
        bs = self.batch_size
        k = len(self)
        idx = np.empty((k, bs), dtype=np.int32)
        mask = np.ones((k, bs), dtype=bool)
        for j, start in enumerate(range(0, k * bs, bs)):
            chunk = order[start:start + bs]
            if len(chunk) < bs:
                pad = np.resize(order, bs - len(chunk))  # wrap-around padding
                mask[j, len(chunk):] = False
                chunk = np.concatenate([chunk, pad])
            idx[j] = chunk
        return idx, mask

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._epoch_order()
        bs = self.batch_size
        for start in range(0, self.num_samples, bs):
            chunk = order[start:start + bs]
            if len(chunk) < bs:
                if self.drop_last:
                    return
                pad = np.resize(order, bs - len(chunk))  # wrap-around padding
                mask = np.concatenate([np.ones(len(chunk), bool),
                                       np.zeros(bs - len(chunk), bool)])
                chunk = np.concatenate([chunk, pad])
            else:
                mask = np.ones(bs, dtype=bool)
            batch = self.get_batch(chunk)
            batch["sample_mask"] = mask
            yield batch


DEVICE_DATA_BYTE_LIMIT = 6 << 30  # fall back to host batches above this


def _device_gather_get_batch(dev: Dict):
    """get_batch that gathers batches ON DEVICE from device-resident arrays.

    On tunneled/remote accelerators, shipping assembled batches costs a
    round trip per step at ~70 MB/s effective (a ~60 MB vx graph batch is
    ~0.9 s — 5x the compute). Instead the split-wide arrays are device_put
    ONCE and each batch is one jitted device gather over sample indices; the
    per-step host→device traffic is just the [B] index vector.
    """
    import jax
    import jax.numpy as jnp

    gather = jax.jit(lambda bufs, idx: jax.tree.map(lambda a: a[idx], bufs))

    def get_batch(idx):
        return dict(gather(dev, jnp.asarray(idx, dtype=jnp.int32)))

    return get_batch


def _device_data_usable() -> bool:
    """Device-resident buffers are placed on local default devices with no
    mesh sharding; that is valid for single-host runs (jit reshards batches
    as needed) but not for multi-host data parallelism, where the jitted step
    cannot consume non-fully-addressable single-process inputs."""
    try:
        import jax

        return jax.process_count() == 1
    except Exception:
        return False


def _buffers_loader(buffers: Dict[str, np.ndarray], num_samples: int,
                    batch_size: int, shuffle: bool, seed: int,
                    device_data: bool) -> BatchLoader:
    loader = None
    if device_data and _device_data_usable():
        total = sum(v.nbytes for v in buffers.values())
        if total <= DEVICE_DATA_BYTE_LIMIT:
            try:
                import jax

                dev = jax.device_put(buffers)  # one transfer for the dict
                loader = BatchLoader(num_samples, batch_size,
                                     _device_gather_get_batch(dev),
                                     shuffle=shuffle, seed=seed)
                loader.device_epoch_spec = (
                    dev, lambda bufs, idx: jax.tree.map(lambda a: a[idx], bufs))
            except Exception:
                loader = None  # no device / OOM → host path

    if loader is None:
        def get_batch(idx):
            return {k: take_rows(v, idx) for k, v in buffers.items()}

        loader = BatchLoader(num_samples, batch_size, get_batch,
                             shuffle=shuffle, seed=seed)
    # Kept for the multi-host whole-epoch scan: the trainer re-places these
    # as global replicated arrays over its mesh (base_trainer._build_epoch_fn)
    # when the loader itself could not commit device buffers.
    loader.host_buffers = buffers
    return loader


def make_static_fx_loader(c: Optional[np.ndarray], u: np.ndarray,
                          batch_size: int, shuffle: bool = False,
                          seed: int = 0, device_data: bool = False) -> BatchLoader:
    """Loader for fixed-coordinate static data: batches of (c, u)."""
    buffers = {"u": u}
    if c is not None:
        buffers["c"] = c
    return _buffers_loader(buffers, len(u), batch_size, shuffle, seed,
                           device_data)


def make_static_vx_loader(c: Optional[np.ndarray], u: np.ndarray,
                          graphs, batch_size: int, shuffle: bool = False,
                          seed: int = 0, device_data: bool = False) -> BatchLoader:
    """Loader for variable-coordinate static data.

    ``graphs`` is a VxSplitGraphs; u/c are per-sample arrays [S, N, ·]
    (unpadded N — they are padded here to the graph's N_pad).
    """
    from .graph_builder import apply_node_perm, vx_graph_buffers

    n_pad = graphs.coords.shape[1]

    def pad_nodes(a):
        # Match the graphs' node layout: Morton permutation first (the
        # coords were reordered at graph build — graph_builder.py), then
        # sentinel-row padding to N_pad.
        a = apply_node_perm(graphs.node_perm, a)
        if a.shape[1] == n_pad:
            return a
        return np.pad(a, ((0, 0), (0, n_pad - a.shape[1]), (0, 0)))

    buffers = {"u": pad_nodes(u), **vx_graph_buffers(graphs)}
    buffers.pop("node_perm", None)  # build-time record, not a batch buffer
    if c is not None:
        buffers["c"] = pad_nodes(c)
    return _buffers_loader(buffers, len(u), batch_size, shuffle, seed,
                           device_data)


class PrefetchLoader:
    """Background-thread batch prefetch (double-buffered).

    TPU-native counterpart of the reference's multi-worker DataLoader
    (src/core/default_configs.py:68 `num_workers`, pin_memory loaders at
    src/datasets/data_processor.py:357,373): batch assembly — which uses the
    multi-threaded native row gather (cpp/batch_gather.cc) for large copies —
    runs on a host thread and overlaps the device step that consumes the
    previous batch. Iteration order and contents are identical to iterating
    the wrapped loader directly.
    """

    _DONE = object()

    def __init__(self, loader, depth: int = 2, place_fn=None):
        self.loader = loader
        self.depth = depth
        self.place_fn = place_fn  # e.g. trainer.place_batch — runs H2D in the
                                  # worker thread, overlapping the device step

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        err = []

        def worker():
            try:
                for batch in self.loader:
                    if self.place_fn is not None:
                        batch = self.place_fn(batch)
                    q.put(batch)
            except BaseException as e:  # surface in the consumer thread
                err.append(e)
            finally:
                q.put(self._DONE)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is self._DONE:
                    break
                yield item
        finally:
            # If the consumer abandons iteration (exception/break), drain the
            # queue so the worker isn't blocked on q.put forever holding
            # device-placed batches.
            while t.is_alive():
                try:
                    q.get_nowait()
                except Exception:
                    import time as _time

                    _time.sleep(0.01)
            t.join()
        if err:
            raise err[0]
