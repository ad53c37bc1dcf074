"""Trainer for static (time-independent) problems.

Equivalent of the reference StaticTrainer (src/trainer/static_trainer.py:16-366)
for both coordinate modes:
- fx: one shared graph pair per scale, simple (c, u) batches;
- vx: per-sample padded graphs stacked in the batch, node masks in the loss.

The train/eval steps are jitted once; every batch has identical shapes
(loader pads the final batch and provides a sample mask), so there are no
recompiles across the whole run.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.data_processor import DataProcessor
from ..data.graph_builder import GraphBuilder, prepare_fx_device_graphs
from ..data.loader import make_static_fx_loader, make_static_vx_loader
from ..models import GAOT
from ..ops.padding import PaddedGraph
from ..utils.metrics import compute_batch_errors, compute_final_metric
from ..utils.plotting import plot_estimates
from .base_trainer import BaseTrainer


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray,
               sample_mask: jnp.ndarray,
               node_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """MSE over valid (sample, node) entries; matches nn.MSELoss mean
    semantics on unpadded data."""
    err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    w = sample_mask.astype(jnp.float32)[:, None, None]
    if node_mask is not None:
        w = w * node_mask.astype(jnp.float32)[..., None]
    w = jnp.broadcast_to(w, err.shape)
    return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1.0)


class StaticTrainer(BaseTrainer):
    def __init__(self, config, datarow: Optional[Dict] = None):
        self.data_processor: Optional[DataProcessor] = None
        self.coord_mode: Optional[str] = None
        self.coord_dim: Optional[int] = None
        self.latent_tokens_coord = None
        self.coord = None                 # fx-mode model coordinates
        self.enc_graphs: Optional[List[PaddedGraph]] = None  # fx mode
        self.dec_graphs: Optional[List[PaddedGraph]] = None
        self.enc_tgraphs = None   # transpose graphs (scatter-free backward)
        self.dec_tgraphs = None
        self.vx_graphs = None             # vx mode: dict split -> VxSplitGraphs
        self._train_fn = None
        self._eval_fn = None
        super().__init__(config, datarow)

    # ------------------------------------------------------------------
    def init_dataset(self, dataset_config):
        self.data_processor = DataProcessor(dataset_config, self.metadata,
                                            dtype=np.float32,
                                            seed=self.setup_config.seed)
        splits, is_vx = self.data_processor.load_and_process_data()
        self.coord_mode = "vx" if is_vx else "fx"

        latent = self.data_processor.generate_latent_queries(
            tuple(self.model_config.latent_tokens_size))
        self.latent_tokens_coord = jnp.asarray(latent)

        self.coord_dim = splits["train"]["x"].shape[-1]
        c_sample = splits["train"]["c"]
        if c_sample is None:
            raise ValueError(
                "Static training requires condition features 'c' as model input")
        self.num_input_channels = c_sample.shape[-1]
        self.num_output_channels = splits["train"]["u"].shape[-1]

        magno = self.model_config.args.magno
        builder = GraphBuilder.from_magno_config(magno)
        cfg = dataset_config
        if is_vx:
            # Same economics guard as the fx path
            # (data/graph_builder.py::prepare_fx_device_graphs): nonlinear
            # kernels keep the dense layout.
            bucketing = (magno.use_query_bucketing and magno.transform_type
                         in ("linear", "linear_kernelonly"))
            if cfg.graph_cache_dir:
                self.vx_graphs = builder.build_all_vx_graphs_cached(
                    cfg.graph_cache_dir, f"{cfg.name}-{cfg.coord_scaling}",
                    splits, latent, magno.radius, magno.scales,
                    build_train=self.setup_config.train,
                    model_transform=self.data_processor.coord_scaler,
                    with_transpose=magno.use_transpose_backward,
                    bucketing=bucketing)
            else:
                self.vx_graphs = builder.build_all_vx_graphs(
                    splits, latent, magno.radius, magno.scales,
                    build_train=self.setup_config.train,
                    model_transform=self.data_processor.coord_scaler,
                    with_transpose=magno.use_transpose_backward,
                    bucketing=bucketing)
            loaders = {}
            for name in ["train", "val", "test"]:
                g = self.vx_graphs[name]
                if g is None:
                    loaders[name] = None
                    continue
                loaders[name] = make_static_vx_loader(
                    splits[name]["c"], splits[name]["u"], g, cfg.batch_size,
                    shuffle=(cfg.shuffle and name == "train"),
                    seed=self.setup_config.seed,
                    device_data=cfg.device_data)
        else:
            coord = self.data_processor.coord_scaler(splits["train"]["x"])
            self.coord = jnp.asarray(coord.astype(np.float32))
            enc, dec = builder.build_fx_graphs(coord, latent, magno.radius,
                                               magno.scales)
            (self.enc_graphs, self.dec_graphs, self.enc_tgraphs,
             self.dec_tgraphs) = prepare_fx_device_graphs(
                enc, dec, coord.shape[0], latent.shape[0], magno)
            loaders = {
                name: make_static_fx_loader(
                    splits[name]["c"], splits[name]["u"], cfg.batch_size,
                    shuffle=(cfg.shuffle and name == "train"),
                    seed=self.setup_config.seed,
                    device_data=cfg.device_data)
                for name in ["train", "val", "test"]
            }
        self.train_loader = loaders["train"]
        self.val_loader = loaders["val"]
        self.test_loader = loaders["test"]

    # ------------------------------------------------------------------
    def init_model(self, model_config):
        model_config.args.magno.coord_dim = self.coord_dim
        self.model = GAOT(
            input_size=self.num_input_channels,
            output_size=self.num_output_channels,
            config=model_config,
            dtype=self.compute_dtype,
        )
        # Shape batch for init: any non-empty loader works (test_size may
        # be 0 for training-only configs).
        loader = next(l for l in (self.test_loader, self.val_loader,
                                  self.train_loader)
                      if l is not None and len(l) > 0)
        batch = next(iter(loader))
        coord, pndata, enc, dec, enc_t, dec_t = self._model_args(batch)
        # jit the init: unjitted Flax init runs op-by-op, which is very
        # slow on remote/tunneled devices (one dispatch round-trip per op).
        self.params = jax.jit(self.model.init)(
            self._next_rng(), self.latent_tokens_coord, coord, pndata, enc, dec,
            encoder_tgraphs=enc_t, decoder_tgraphs=dec_t)
        self.replicate_params()

    def _batch_graphs(self, batch: Dict):
        """Reassemble per-scale vx graphs (dense PaddedGraphs + transpose
        graphs, or degree-bucketed layouts) from a batch dict."""
        from ..data.graph_builder import vx_batch_graphs

        return vx_batch_graphs(batch,
                               len(self.model_config.args.magno.scales))

    def _model_args(self, batch: Dict):
        """(xcoord, pndata, enc_graphs, dec_graphs, enc_t, dec_t)."""
        if self.coord_mode == "fx":
            return (self.coord, batch["c"], self.enc_graphs, self.dec_graphs,
                    self.enc_tgraphs, self.dec_tgraphs)
        enc, dec, enc_t, dec_t = self._batch_graphs(batch)
        return (batch["x"], batch["c"], enc, dec, enc_t, dec_t)

    # ------------------------------------------------------------------
    def _build_steps(self):
        model, tx = self.model, self.tx
        latent = self.latent_tokens_coord

        def forward(params, coord, pndata, enc, dec, enc_t, dec_t, rng, training):
            rngs = {"edge_drop": rng, "dropout": rng} if training else None
            return model.apply(params, latent, coord, pndata, enc, dec,
                               training=training, rngs=rngs,
                               encoder_tgraphs=enc_t, decoder_tgraphs=dec_t)

        def step_update(params, opt_state, rng, batch):
            """One optimizer step from a (traced) batch dict — used by the
            per-step jit AND inside the whole-epoch scan (base_trainer)."""
            coord, pndata, target, sm, nm, enc, dec, enc_t, dec_t = \
                self._step_args(batch)

            def loss_fn(p):
                pred = forward(p, coord, pndata, enc, dec, enc_t, dec_t,
                               rng, True)
                return masked_mse(pred, target, sm, nm)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        # Note: params are NOT donated — fit() keeps best-params snapshots by
        # reference, which donation would invalidate.
        @partial(jax.jit, donate_argnums=(1,))
        def train_fn(params, opt_state, rng, coord, pndata, target,
                     sample_mask, node_mask, enc, dec, enc_t, dec_t):
            def loss_fn(p):
                pred = forward(p, coord, pndata, enc, dec, enc_t, dec_t, rng, True)
                return masked_mse(pred, target, sample_mask, node_mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        @jax.jit
        def eval_fn(params, coord, pndata, target, sample_mask, node_mask,
                    enc, dec, enc_t, dec_t):
            pred = forward(params, coord, pndata, enc, dec, enc_t, dec_t,
                           None, False)
            return pred, masked_mse(pred, target, sample_mask, node_mask)

        self._train_fn, self._eval_fn = train_fn, eval_fn
        self._step_update = step_update

    def _step_args(self, batch):
        coord, pndata, enc, dec, enc_t, dec_t = self._model_args(batch)
        node_mask = batch.get("node_mask")
        return (coord, pndata, batch["u"], batch["sample_mask"], node_mask,
                enc, dec, enc_t, dec_t)

    def train_step(self, batch) -> jax.Array:
        if self._train_fn is None:
            self._build_steps()
        batch = self.place_batch_once(batch)
        coord, pndata, target, sm, nm, enc, dec, enc_t, dec_t = self._step_args(batch)
        self.params, self.opt_state, loss = self._train_fn(
            self.params, self.opt_state, self._next_rng(), coord, pndata,
            target, sm, nm, enc, dec, enc_t, dec_t)
        return loss

    def validate(self, loader) -> float:
        if loader is None:
            return 0.0
        if self._eval_fn is None:
            self._build_steps()
        # Accumulate per-batch losses ON DEVICE and sync once at the end:
        # dispatch is async, so a float() per batch would add one host
        # round-trip per batch (several ms each on tunneled devices).
        losses = []
        for batch in loader:
            batch = self.place_batch_once(batch)
            _, loss = self._eval_fn(self.params, *self._step_args(batch))
            losses.append(loss)
        if not losses:
            return 0.0
        return float(jnp.mean(jnp.stack(losses)))

    # ------------------------------------------------------------------
    def test(self):
        """Relative-L1 metric over the test split + result plot
        (reference static_trainer.py:267-320)."""
        if self._eval_fn is None:
            self._build_steps()
        dp = self.data_processor
        u_mean, u_std = dp.u_mean, dp.u_std
        all_errors = []
        last = None
        for batch in self.test_loader:
            placed = self.place_batch_once(batch)
            pred, _ = self._eval_fn(self.params, *self._step_args(placed))
            pred = np.asarray(pred, dtype=np.float64)
            target = np.asarray(batch["u"], dtype=np.float64)
            keep = np.asarray(batch["sample_mask"])
            pred_denorm = pred[keep] * u_std + u_mean
            target_denorm = target[keep] * u_std + u_mean
            node_mask = batch.get("node_mask")
            if node_mask is not None:
                # Padded nodes must contribute 0 to both the error numerator
                # and the |gt| denominator of the relative-L1 metric: fill
                # both tensors with the metric's global mean there.
                active = list(self.metadata.active_variables)
                gmean = np.asarray(self.metadata.global_mean)[active].reshape(1, 1, -1)
                valid = node_mask[keep][..., None]
                pred_denorm = np.where(valid, pred_denorm, gmean)
                target_denorm = np.where(valid, target_denorm, gmean)
            # The reference's static test() hands 3-D [B, N, V] tensors to
            # compute_batch_errors (static_trainer.py:283-292), whose
            # [1,1,1,-1] mean/std reshape broadcasts them to [1, B, N, V] —
            # so its static metric POOLS the whole test batch into one
            # rel-L1 scalar (batch folded into the "time" axis), then takes
            # the median over test BATCHES. Replicate exactly (verified by
            # cross-stack checkpoint evaluation, parity/cross_eval.py).
            errs = compute_batch_errors(target_denorm[None], pred_denorm[None],
                                        self.metadata)
            all_errors.append(errs)
            # For the example plot, coords/c must come from the same KEPT
            # sample as pred/target (the final partial batch is padded with
            # wrap-around samples whose mask is False).
            keep_idx = np.flatnonzero(keep)
            last = (batch, pred_denorm, target_denorm, int(keep_idx[-1]))
        self.last_test_errors = np.concatenate(all_errors, axis=0)
        final_metric = compute_final_metric(self.last_test_errors)
        self.datarow["relative error (direct)"] = final_metric
        print(f"Relative error: {final_metric}")
        self._plot_test_example(last)
        return final_metric

    def _plot_test_example(self, last):
        if last is None:
            return
        batch, pred_denorm, target_denorm, bidx = last
        dp = self.data_processor
        try:
            if self.coord_mode == "fx":
                coords = dp.coord_scaler.inverse_transform(np.asarray(self.coord))
            else:
                coords = dp.coord_scaler.inverse_transform(np.asarray(batch["x"][bidx]))
            c = batch.get("c")
            if c is not None and dp.c_mean is not None:
                c_denorm = np.asarray(c[bidx]) * dp.c_std + dp.c_mean
            else:
                c_denorm = None
            fig = plot_estimates(
                u_inp=c_denorm,
                u_gtr=target_denorm[-1],
                u_prd=pred_denorm[-1],
                x_inp=coords,
                names=self.metadata.names.get("c"),
                symmetric=self.metadata.signed["u"],
                domain=self.metadata.domain_x,
            )
            os.makedirs(os.path.dirname(self.path_config.result_path) or ".",
                        exist_ok=True)
            fig.savefig(self.path_config.result_path, dpi=200,
                        bbox_inches="tight", pad_inches=0.1)
            import matplotlib.pyplot as plt
            plt.close(fig)
            print(f"Plot saved to {self.path_config.result_path}")
        except Exception as e:  # plotting must never fail a run
            print(f"Warning: could not create result plot: {e}")
