"""Base trainer lifecycle.

Mirrors the reference BaseTrainer (src/core/base_trainer.py:19-280) —
config merge, metadata lookup, seeding, init_dataset/init_model/
init_optimizer, fit/test/checkpoint — with the epoch loop owned by the
trainer (the reference inverts control into the optimizer object,
src/utils/optimizers.py:116-184; here the optimizer is a pure optax chain
and `fit` drives a jitted train step).

Parallelism: one ('data', 'model') mesh; batches sharded on 'data', params
replicated or tensor-sharded. Best-model tracking keeps a reference to the
best params pytree (jax arrays are immutable — no deepcopy needed, unlike
reference optimizers.py:163).
"""
from __future__ import annotations

import os
import time
from abc import ABC, abstractmethod
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import (
    DatasetConfig,
    GAOTConfig,
    ModelConfig,
    OptimizerConfig,
    PathConfig,
    SetUpConfig,
    merge_config,
)
from ..core.metadata import DATASET_METADATA
from ..parallel.mesh import init_distributed, make_mesh, shard_batch, shard_params
from ..parallel.spatial import enable_spatial_sharding, set_ambient_mesh
from ..utils.plotting import plot_losses
from .checkpoint import restore_checkpoint, save_checkpoint
from .schedules import make_optimizer

_DTYPES = {
    "float32": jnp.float32, "torch.float32": jnp.float32, "float": jnp.float32,
    "float64": jnp.float64, "torch.float64": jnp.float64, "double": jnp.float64,
    "bfloat16": jnp.bfloat16,
}


class BaseTrainer(ABC):
    """Common lifecycle: merge configs → data → model → optimizer → fit/test."""

    def __init__(self, config, datarow: Optional[Dict] = None):
        if isinstance(config, GAOTConfig):
            raw = config
            self.setup_config = raw.setup
            self.model_config = raw.model
            self.dataset_config = raw.dataset
            self.optimizer_config = raw.optimizer
            self.path_config = raw.path
        else:
            raw = dict(config)
            self.setup_config = merge_config(SetUpConfig, raw.get("setup", {}))
            self.model_config = merge_config(ModelConfig, raw.get("model", {}))
            self.dataset_config = merge_config(DatasetConfig, raw.get("dataset", {}))
            self.optimizer_config = merge_config(OptimizerConfig, raw.get("optimizer", {}))
            self.path_config = merge_config(PathConfig, raw.get("path", {}))

        self.metadata = DATASET_METADATA[self.dataset_config.metaname]
        self.datarow = datarow if datarow is not None else {}

        init_distributed(self.setup_config)
        # Repo-local persistent XLA compile cache: repeat runs of the same
        # shapes skip the scan-program (~86 s) and per-step (~40 s) compiles.
        from ..utils.compile_cache import setup_persistent_cache
        setup_persistent_cache()
        self.mesh = None  # built after the dataset fixes the batch size

        # One GLOBAL seed for params and the train-step rng: params are
        # placed as replicated global arrays and the step rng is a replicated
        # operand of the SPMD train step, so every process must hold
        # identical values (a per-process offset — the reference's
        # seed + rank, base_trainer.py:60 — would silently give each host a
        # different model replica). Host-local numpy randomness may differ.
        seed = self.setup_config.seed
        np.random.seed(seed + jax.process_index())
        self.rng_key = jax.random.key(seed)

        self.dtype = _DTYPES[self.setup_config.dtype]
        self.compute_dtype = _DTYPES[self.setup_config.compute_dtype]

        # Populated by subclasses.
        self.model = None
        self.params = None
        self.opt_state = None
        self.tx = None
        self.schedule = None
        self.train_loader = None
        self.val_loader = None
        self.test_loader = None

        self.init_dataset(self.dataset_config)
        self._init_mesh()
        self.init_model(self.model_config)
        self.init_optimizer(self.optimizer_config)

        if jax.process_index() == 0:
            self._print_model_stats()

    def _init_mesh(self):
        """Build the device mesh once the loaders fix the batch size: the
        'data' axis must divide the batch, so data_parallel=-1 picks the
        largest divisor supported by the available devices."""
        loader = self.train_loader or self.test_loader
        self.batch_size = loader.batch_size if loader else self.dataset_config.batch_size
        mp = self.setup_config.model_parallel
        dp = self.setup_config.data_parallel
        if dp == -1:
            avail = max(1, len(jax.devices()) // mp)
            dp = max(d for d in range(1, avail + 1) if self.batch_size % d == 0)
        elif self.batch_size % dp:
            raise ValueError(
                f"batch_size {self.batch_size} not divisible by data_parallel {dp}")
        self.mesh = make_mesh(dp, mp)
        # Sequence parallelism over 'model' (parallel/spatial.py): the model's
        # shard_queries hints become active, and jitted steps need the mesh in
        # context to resolve their PartitionSpecs. Explicitly reset (not just
        # left alone) when off, so a later trainer in the same process does
        # not inherit a previous trainer's spatial mode or ambient mesh.
        set_ambient_mesh(self.mesh if self.setup_config.spatial_parallel
                         else None)
        enable_spatial_sharding(self.setup_config.spatial_parallel)

    # ------------------------------------------------------------------
    @abstractmethod
    def init_dataset(self, dataset_config):
        ...

    @abstractmethod
    def init_model(self, model_config):
        ...

    def init_optimizer(self, optimizer_config):
        steps_per_epoch = max(1, len(self.train_loader) if self.train_loader else 1)
        self.tx, self.schedule = make_optimizer(optimizer_config, steps_per_epoch)
        self.opt_state = self.tx.init(self.params)

    @abstractmethod
    def train_step(self, batch) -> jax.Array:
        """One optimization step; returns the (device) loss scalar."""

    @abstractmethod
    def validate(self, loader) -> float:
        ...

    @abstractmethod
    def test(self):
        ...

    # ------------------------------------------------------------------
    def _print_model_stats(self):
        leaves = jax.tree.leaves(self.params)
        nparams = sum(int(p.size) for p in leaves)
        nbytes = sum(int(p.size * p.dtype.itemsize) for p in leaves)
        print(f"Number of parameters: {nparams}")
        self.datarow["nparams"] = nparams
        self.datarow["nbytes"] = nbytes

    def _next_rng(self) -> jax.Array:
        self.rng_key, sub = jax.random.split(self.rng_key)
        return sub

    def place_batch(self, batch: Dict) -> Dict:
        return shard_batch(batch, self.mesh, self.batch_size)

    def place_batch_once(self, batch: Dict) -> Dict:
        """place_batch unless the batch is already device-resident (the
        training prefetch thread places batches ahead of time)."""
        if any(isinstance(v, jax.Array) for v in batch.values()):
            return batch
        return self.place_batch(batch)

    def replicate_params(self):
        self.params = shard_params(self.params, self.mesh)

    # ------------------------------------------------------------------
    # Whole-epoch scan: when the training data is device-resident
    # (dataset.device_data), the entire epoch runs as ONE jitted
    # lax.scan — batch gather, forward, backward, and optimizer update per
    # step — instead of one dispatch per step. Removes per-step host
    # dispatch latency entirely (the dominant cost for small models, and
    # several ms/step on tunneled devices).
    def _mesh_size(self) -> int:
        if self.mesh is None:
            return 1
        return int(np.prod(tuple(self.mesh.shape.values())))

    def _build_epoch_fn(self):
        """Whole-epoch scan program. Works on any mesh size:

        - single device: loader's device-resident buffers as-is;
        - single-process multi-device: buffers re-placed REPLICATED over the
          mesh (one broadcast), per-step batch indices sharded over 'data' —
          each device gathers its own batch shard locally and GSPMD inserts
          the gradient all-reduce, so DP runs keep one dispatch per epoch;
        - multi-host: every process holds the full split (the data pipeline
          loads the whole file per host anyway); buffers become global
          replicated arrays via place_global, same sharded-index scan.
        """
        if getattr(self, "_step_update", None) is None:
            return None
        from ..parallel.mesh import place_global, replicated
        from jax.sharding import PartitionSpec as P

        spec = getattr(self.train_loader, "device_epoch_spec", None)
        multi = self._mesh_size() > 1
        if spec is not None:
            dev, batch_fn = spec
            if multi:
                dev = jax.device_put(dev, replicated(self.mesh))
        else:
            bufs = getattr(self.train_loader, "host_buffers", None)
            if not multi or bufs is None:
                return None
            from ..data.loader import DEVICE_DATA_BYTE_LIMIT

            if sum(v.nbytes for v in bufs.values()) > DEVICE_DATA_BYTE_LIMIT:
                return None
            dev = {k: place_global(v, self.mesh, P())
                   for k, v in bufs.items()}
            batch_fn = lambda bufs, i: jax.tree.map(lambda a: a[i], bufs)
        step_update = self._step_update

        @partial(jax.jit, donate_argnums=(1,), static_argnums=())
        def epoch_fn(params, opt_state, rng, bufs, idx, mask):
            def body(carry, xs):
                params, opt_state = carry
                i, m, step = xs
                batch = dict(batch_fn(bufs, i))
                batch["sample_mask"] = m
                params, opt_state, loss = step_update(
                    params, opt_state, jax.random.fold_in(rng, step), batch)
                return (params, opt_state), loss

            k = idx.shape[0]
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state),
                (idx, mask, jnp.arange(k, dtype=jnp.int32)))
            return params, opt_state, losses

        return lambda params, opt_state, rng, idx, mask: epoch_fn(
            params, opt_state, rng, dev, idx, mask)

    def _scan_program_key(self, num_batches: int) -> str:
        """Stable identity for the epoch-scan XLA program: same key ⇒ same
        traced shapes ⇒ same compile cost. Keys the measured compile-time
        registry behind ``epoch_scan=auto`` (utils/compile_cache)."""
        dev = jax.devices()[0].device_kind.replace(" ", "_")
        n_params = sum(int(x.size) for x in jax.tree.leaves(self.params))
        parts = (type(self).__name__, dev, self._mesh_size(), num_batches,
                 getattr(self.train_loader, "num_samples", 0),
                 getattr(self.train_loader, "batch_size", 0), n_params)
        return "scan:" + ":".join(str(p) for p in parts)

    def _scan_available(self) -> bool:
        if not getattr(self, "_epoch_fn_ready", False):
            if getattr(self, "_step_update", None) is None and hasattr(
                    self, "_build_steps"):
                self._build_steps()
            self._epoch_fn = self._build_epoch_fn()
            self._epoch_fn_ready = True
        return self._epoch_fn is not None

    def train_epoch_scan(self):
        """Run one full epoch as a single scan dispatch; returns the [k]
        per-step loss array, or None when the scan path is unavailable."""
        if not self._scan_available():
            return None
        idx, mask = self.train_loader.epoch_index_matrix()
        if self._mesh_size() > 1:
            # Per-step batch axis sharded over 'data': each device gathers
            # and computes its slice of every scanned step. The epoch index
            # matrix is identical on all hosts (loader rng is seeded from
            # setup.seed, not the per-process numpy seed).
            from jax.sharding import PartitionSpec as P
            from ..parallel.mesh import place_global

            idx = place_global(idx, self.mesh, P(None, "data"))
            mask = place_global(mask, self.mesh, P(None, "data"))
        else:
            idx, mask = jnp.asarray(idx), jnp.asarray(mask)
        self.params, self.opt_state, losses = self._epoch_fn(
            self.params, self.opt_state, self._next_rng(), idx, mask)
        return losses

    # ------------------------------------------------------------------
    def fit(self, verbose: bool = True):
        """Training loop: per-epoch jitted steps, periodic validation,
        best-model tracking, checkpoint, loss plots, final test
        (reference base_trainer.py:196-225 + optimizers.py:236-305)."""
        args = self.optimizer_config.args
        eval_every = args.eval_every_eps
        early_metric = args.early_save_metric.lower()
        best_loss, best_epoch, best_params = np.inf, -1, None
        losses, epochs, val_losses, val_epochs = [], [], [], []

        num_batches = len(self.train_loader)
        # Whole-epoch scan when the data is device-resident (one dispatch per
        # epoch); else overlap host batch assembly (native multi-threaded row
        # gather) with the device step via the prefetch thread. 'auto' takes
        # the scan only when the run is long enough to amortize the scan
        # program's XLA compile: amortization uses the compile time MEASURED
        # on a previous run of this shape when available (utils/compile_cache
        # registry, recorded below from the first-vs-second epoch dispatch
        # gap), falling back to the 10k-step heuristic (~86 s compile /
        # ~9 ms per-step dispatch+compile saving, measured on v5e).
        from ..utils.compile_cache import (lookup_compile_time,
                                           record_compile_time)

        scan_key = self._scan_program_key(num_batches)
        measured = lookup_compile_time(scan_key)
        scan_cfg = str(getattr(self.setup_config, "epoch_scan", "auto")).lower()
        if scan_cfg in ("always", "true"):
            want_scan = True
        elif scan_cfg == "auto" and measured is not None:
            # ~9 ms/step saved (dispatch latency + per-step program compile
            # amortization) vs the measured scan compile cost.
            want_scan = args.epoch * num_batches * 9e-3 >= measured
        else:
            want_scan = scan_cfg == "auto" and args.epoch * num_batches >= 10_000
        use_scan = want_scan and self._scan_available()
        scan_epoch_times = []
        train_iter = None
        if not use_scan:
            from ..data.loader import PrefetchLoader

            train_iter = PrefetchLoader(self.train_loader,
                                        place_fn=self.place_batch_once)
        start = time.perf_counter()
        samples_done = 0
        for epoch in range(args.epoch):
            if use_scan:
                t_ep = time.perf_counter()
                epoch_losses = [self.train_epoch_scan()]  # [k] device array
                if len(scan_epoch_times) < 2:
                    # First FETCH blocks on the scan-program compile;
                    # first-minus-second epoch wall time ≈ compile cost.
                    # (A bare block_until_ready is not a barrier on the
                    # tunneled runtime — utils/timing.py.)
                    from ..utils.timing import force_value
                    force_value(epoch_losses[0])
                    scan_epoch_times.append(time.perf_counter() - t_ep)
                    if len(scan_epoch_times) == 2:
                        record_compile_time(scan_key, max(
                            scan_epoch_times[0] - scan_epoch_times[1], 1.0))
                samples_done += self.train_loader.num_samples
            else:
                epoch_losses = []
                for batch in train_iter:
                    epoch_losses.append(self.train_step(batch))
                    samples_done += int(np.sum(batch["sample_mask"]))
            if epoch == 0 and verbose and jax.process_index() == 0:
                # The dispatch sites record their decisions at trace time
                # (utils/routing.py), so after the first epoch the active
                # route set is known — one line for measurement attribution.
                from ..utils.routing import format_routes
                print(f"[gaot_tpu] kernel routes: {format_routes()}",
                      flush=True)
            if (epoch + 1) % eval_every == 0:
                train_loss = float(jnp.mean(jnp.concatenate(
                    [jnp.atleast_1d(l) for l in epoch_losses])))
                val_loss = self.validate(self.val_loader)
                losses.append(train_loss)
                epochs.append(epoch)
                val_losses.append(val_loss)
                val_epochs.append(epoch)
                current = val_loss if early_metric == "val" else train_loss
                if current < best_loss:
                    best_loss, best_epoch = current, epoch
                    best_params = self.params  # immutable pytree — cheap snapshot
                if verbose:
                    print(f"epoch {epoch + 1}/{args.epoch} "
                          f"loss {train_loss:.3e} val {val_loss:.3e}")
        # Value fetch (not block_until_ready): forces any still-deferred
        # epoch programs to execute before the clock stops — see
        # utils/timing.py for the tunneled-runtime semantics.
        from ..utils.timing import force_value
        force_value(jax.tree.leaves(self.params)[0])
        elapsed = time.perf_counter() - start

        if best_params is not None:
            self.params = best_params
        self.datarow["training time"] = elapsed
        self.datarow["samples_per_sec"] = samples_done / elapsed if elapsed else 0.0
        if verbose:
            print(f"training time {elapsed:.1f}s "
                  f"({self.datarow['samples_per_sec']:.1f} samples/s)")

        self.save_ckpt()
        if losses:
            os.makedirs(os.path.dirname(self.path_config.loss_path) or ".",
                        exist_ok=True)
            plot_losses(self.path_config.loss_path, epochs, losses,
                        val_epochs, val_losses, best_epoch, best_loss)
        self.test()

    # ------------------------------------------------------------------
    def save_ckpt(self):
        save_checkpoint(self.path_config.ckpt_path, self.params,
                        opt_state=self.opt_state)
        return self

    def load_ckpt(self):
        restored = restore_checkpoint(self.path_config.ckpt_path, self.params)
        self.params = jax.tree.map(jnp.asarray, restored["params"])
        if "opt_state" in restored and self.opt_state is not None:
            self.opt_state = jax.tree.unflatten(
                jax.tree.structure(self.opt_state),
                jax.tree.leaves(restored["opt_state"]))
        return self
