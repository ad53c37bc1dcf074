"""Trainer for sequential (time-dependent) problems.

Equivalent of the reference SequentialTrainer
(src/trainer/sequential_trainer.py:20-588): trains on dynamic time pairs and
evaluates by autoregressive rollout in 'autoregressive' / 'direct' / 'star'
modes with 'final_step' or 'all_step' metrics. The rollout is a single
lax.scan (models/rollout.py), jitted once per predict mode.

Supports fx and vx coordinate modes; the reference's vx rollout raises
NotImplementedError (sequential_trainer.py:341-347) — here it works.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.graph_builder import GraphBuilder, prepare_fx_device_graphs
from ..data.loader import BatchLoader
from ..data.sequential import (
    DynamicPairBatcher,
    RolloutTestBatcher,
    SequentialDataProcessor,
    make_sequential_loader,
)
from ..models import GAOT
from ..models.rollout import autoregressive_predict
from ..ops.padding import PaddedGraph
from ..utils.metrics import compute_batch_errors, compute_final_metric
from ..utils.plotting import create_sequential_animation, plot_estimates
from .base_trainer import BaseTrainer
from .static_trainer import masked_mse

def predict_mode_indices(mode: str, max_time_diff: int,
                         time_step: int) -> np.ndarray:
    """Rollout time indices per predict mode (reference
    sequential_trainer.py:380-387, which hard-codes max_time_diff=14,
    time_step=2: autoregressive arange(0,15,2), direct [0,14],
    star [0,4,8,12,14]); generalized so shorter trajectories
    (max_time_diff < 14) evaluate instead of indexing out of bounds."""
    t = max_time_diff
    if mode == "direct":
        return np.array([0, t])
    if mode == "star":
        idx = np.arange(0, t + 1, 2 * time_step)
        return idx if idx[-1] == t else np.append(idx, t)
    return np.arange(0, t + 1, time_step)           # autoregressive


class SequentialTrainer(BaseTrainer):
    def __init__(self, config, datarow: Optional[Dict] = None):
        self.data_processor: Optional[SequentialDataProcessor] = None
        self.coord_mode: Optional[str] = None
        self.coord_dim: Optional[int] = None
        self.latent_tokens_coord = None
        self.coord = None
        self.enc_graphs = None
        self.dec_graphs = None
        self.enc_tgraphs = None
        self.dec_tgraphs = None
        self.vx_graphs = None
        self.stats = None
        self.t_values = None
        self.splits = None
        self._train_fn = None
        self._eval_fn = None
        super().__init__(config, datarow)

    # ------------------------------------------------------------------
    def init_dataset(self, dataset_config):
        self.data_processor = SequentialDataProcessor(dataset_config, self.metadata,
                                                      dtype=np.float32,
                                                      seed=self.setup_config.seed)
        splits, is_vx = self.data_processor.load_and_process_data()
        self.splits = splits
        self.coord_mode = "vx" if is_vx else "fx"
        self.stats = self.data_processor.stats
        self.t_values = self.data_processor.t_values
        self.stepper_mode = self.data_processor.stepper_mode

        latent = self.data_processor.generate_latent_queries(
            tuple(self.model_config.latent_tokens_size))
        self.latent_tokens_coord = jnp.asarray(latent)

        self.coord_dim = splits["train"]["x"].shape[-1]
        u = splits["train"]["u"]
        c = splits["train"]["c"]
        self.num_output_channels = u.shape[-1]
        self.num_input_channels = u.shape[-1] + 2  # + start_time + time_diff
        if c is not None:
            self.num_input_channels += c.shape[-1]
        if self.model_config.use_conditional_norm:
            self.num_input_channels -= 1

        magno = self.model_config.args.magno
        builder = GraphBuilder.from_magno_config(magno)
        if is_vx:
            # Per-sample graphs from each sample's t=0 coordinates (vx
            # sequential datasets keep the mesh fixed over the trajectory;
            # the reference's vx-sequential graph path is unimplemented,
            # src/trainer/sequential_trainer.py:341-347).
            graph_splits = {
                name: {"x": splits[name]["x"][:, 0]
                       if splits[name]["x"].ndim == 4 else splits[name]["x"]}
                for name in ["train", "val", "test"]
            }
            bucketing = (magno.use_query_bucketing and magno.transform_type
                         in ("linear", "linear_kernelonly"))
            if dataset_config.graph_cache_dir:
                self.vx_graphs = builder.build_all_vx_graphs_cached(
                    dataset_config.graph_cache_dir,
                    f"{dataset_config.name}-{dataset_config.coord_scaling}-seq",
                    graph_splits, latent, magno.radius, magno.scales,
                    build_train=self.setup_config.train,
                    model_transform=self.data_processor.coord_scaler,
                    with_transpose=magno.use_transpose_backward,
                    bucketing=bucketing)
            else:
                self.vx_graphs = builder.build_all_vx_graphs(
                    graph_splits, latent, magno.radius, magno.scales,
                    build_train=self.setup_config.train,
                    model_transform=self.data_processor.coord_scaler,
                    with_transpose=magno.use_transpose_backward,
                    bucketing=bucketing)
        else:
            self.vx_graphs = None
            coord = self.data_processor.coord_scaler(splits["train"]["x"])
            self.coord = jnp.asarray(coord.astype(np.float32))
            enc, dec = builder.build_fx_graphs(coord, latent, magno.radius,
                                               magno.scales)
            (self.enc_graphs, self.dec_graphs, self.enc_tgraphs,
             self.dec_tgraphs) = prepare_fx_device_graphs(
                enc, dec, coord.shape[0], latent.shape[0], magno)

        cfg = dataset_config
        loaders = {}
        for name in ["train", "val", "test"]:
            batcher = DynamicPairBatcher(
                u_data=splits[name]["u"], c_data=splits[name]["c"],
                t_values=splits[name]["t"], max_time_diff=cfg.max_time_diff,
                time_step=cfg.time_step, stepper_mode=cfg.stepper_mode,
                stats=self.stats, use_time_norm=cfg.use_time_norm,
                graphs=self.vx_graphs[name] if is_vx else None)
            loaders[name] = make_sequential_loader(
                batcher, cfg.batch_size,
                shuffle=(cfg.shuffle and name == "train"),
                seed=self.setup_config.seed,
                device_data=cfg.device_data)
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
        pndata, cond = self._split_input(jnp.asarray(batch["input"]))
        coord, enc, dec, _, _, _ = self._graph_args(batch)
        self.params = jax.jit(self.model.init)(
            self._next_rng(), self.latent_tokens_coord, coord, pndata,
            enc, dec, condition=cond)
        self.replicate_params()

    def _graph_args(self, batch):
        """(coord, enc, dec, node_mask, enc_t, dec_t) for a batch."""
        if self.coord_mode == "fx":
            return (self.coord, self.enc_graphs, self.dec_graphs, None,
                    self.enc_tgraphs, self.dec_tgraphs)
        from ..data.graph_builder import vx_batch_graphs

        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if not isinstance(v, (int, float, str))}
        enc, dec, enc_t, dec_t = vx_batch_graphs(
            jbatch, len(self.model_config.args.magno.scales))
        return (jbatch["x"], enc, dec, jbatch["node_mask"], enc_t, dec_t)

    def _split_input(self, x):
        """Conditional-norm models consume the last time feature as the
        condition instead of an input channel (reference
        sequential_trainer.py:192-198)."""
        if self.model_config.use_conditional_norm:
            return x[..., :-1], x[:, 0, -2:-1]
        return x, None

    # ------------------------------------------------------------------
    def _build_steps(self):
        model, tx = self.model, self.tx
        latent = self.latent_tokens_coord
        use_cond = self.model_config.use_conditional_norm

        def forward(params, x, coord, enc, dec, enc_t, dec_t, rng, training):
            pndata = x[..., :-1] if use_cond else x
            cond = x[:, 0, -2:-1] if use_cond else None
            rngs = {"edge_drop": rng, "dropout": rng} if training else None
            return model.apply(params, latent, coord, pndata, enc, dec,
                               condition=cond, training=training, rngs=rngs,
                               encoder_tgraphs=enc_t, decoder_tgraphs=dec_t)

        @partial(jax.jit, donate_argnums=(1,))
        def train_fn(params, opt_state, rng, x, target, sample_mask,
                     coord, enc, dec, node_mask, enc_t, dec_t):
            def loss_fn(p):
                pred = forward(p, x, coord, enc, dec, enc_t, dec_t, rng, True)
                return masked_mse(pred, target, sample_mask, node_mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        @jax.jit
        def eval_fn(params, x, target, sample_mask, coord, enc, dec,
                    node_mask, enc_t, dec_t):
            pred = forward(params, x, coord, enc, dec, enc_t, dec_t, None, False)
            return masked_mse(pred, target, sample_mask, node_mask)

        def step_update(params, opt_state, rng, batch):
            """One optimizer step from a (traced) batch dict — used inside
            the whole-epoch scan (base_trainer)."""
            coord, enc, dec, node_mask, enc_t, dec_t = self._graph_args(batch)

            def loss_fn(p):
                pred = forward(p, batch["input"], coord, enc, dec,
                               enc_t, dec_t, rng, True)
                return masked_mse(pred, batch["target"],
                                  batch["sample_mask"], node_mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._train_fn, self._eval_fn = train_fn, eval_fn
        self._step_update = step_update

    def train_step(self, batch) -> jax.Array:
        if self._train_fn is None:
            self._build_steps()
        batch = self.place_batch_once(batch)
        coord, enc, dec, node_mask, enc_t, dec_t = self._graph_args(batch)
        self.params, self.opt_state, loss = self._train_fn(
            self.params, self.opt_state, self._next_rng(),
            batch["input"], batch["target"], batch["sample_mask"],
            coord, enc, dec, node_mask, enc_t, dec_t)
        return loss

    def validate(self, loader) -> float:
        if loader is None:
            return 0.0
        if self._eval_fn is None:
            self._build_steps()
        # Device-side accumulation, ONE host sync after the loop (see
        # static_trainer.validate).
        losses = []
        for batch in loader:
            batch = self.place_batch_once(batch)
            coord, enc, dec, node_mask, enc_t, dec_t = self._graph_args(batch)
            losses.append(self._eval_fn(self.params, batch["input"],
                                        batch["target"], batch["sample_mask"],
                                        coord, enc, dec, node_mask,
                                        enc_t, dec_t))
        if not losses:
            return 0.0
        return float(jnp.mean(jnp.stack(losses)))

    # ------------------------------------------------------------------
    def _rollout_fn(self, time_indices):
        model = self.model
        roll = partial(
            autoregressive_predict, model,
            time_indices=time_indices, t_values=self.t_values,
            stats=self.stats, stepper_mode=self.stepper_mode,
            latent_tokens_coord=self.latent_tokens_coord,
            use_conditional_norm=self.model_config.use_conditional_norm)
        return jax.jit(lambda params, x, coord, enc, dec, enc_t, dec_t: roll(
            params, x_batch=x, coord=coord, encoder_graphs=enc,
            decoder_graphs=dec, encoder_tgraphs=enc_t, decoder_tgraphs=dec_t))

    def test(self):
        """Rollout evaluation over the configured predict modes
        (reference sequential_trainer.py:362-463)."""
        cfg = self.dataset_config
        modes = (["autoregressive", "direct", "star"] if cfg.predict_mode == "all"
                 else [cfg.predict_mode])
        metric_type = cfg.metric
        test = self.splits["test"]
        errors = {}
        example = None

        vx = self.coord_mode == "vx"
        for mode in modes:
            t_lim = min(cfg.max_time_diff, test["u"].shape[1] - 1)
            time_indices = predict_mode_indices(mode, t_lim, cfg.time_step)
            batcher = RolloutTestBatcher(test["u"], test["c"], time_indices,
                                         self.stats,
                                         graphs=self.vx_graphs["test"] if vx else None)
            loader = BatchLoader(len(batcher), cfg.batch_size, batcher.get_batch)
            rollout = self._rollout_fn(time_indices)
            all_errs = []
            for batch in loader:
                coord, enc, dec, node_mask, enc_t, dec_t = self._graph_args(batch)
                pred = np.asarray(rollout(self.params, jnp.asarray(batch["input"]),
                                          coord, enc, dec, enc_t, dec_t))
                target = np.asarray(batch["target"], dtype=np.float64)
                keep = np.asarray(batch["sample_mask"])
                pred, target = pred[keep], target[keep]
                if node_mask is not None:
                    # Neutralize padded nodes in the relative-L1 metric.
                    active = list(self.metadata.active_variables)
                    gmean = np.asarray(self.metadata.global_mean)[active]
                    valid = np.asarray(node_mask)[keep][:, None, :, None]
                    pred = np.where(valid, pred, gmean)
                    target = np.where(valid, target, gmean)
                if metric_type == "final_step":
                    errs = compute_batch_errors(target[:, -1:], pred[:, -1:],
                                                self.metadata)
                elif metric_type == "all_step":
                    errs = compute_batch_errors(target, pred, self.metadata)
                else:
                    raise ValueError(f"Unknown metric: {metric_type}")
                all_errs.append(errs)
                if example is None:
                    if vx:
                        coords_plot = self.data_processor.coord_scaler.inverse_transform(
                            np.asarray(batch["x"])[keep][-1])
                    else:
                        coords_plot = self.data_processor.coord_scaler.inverse_transform(
                            np.asarray(self.coord))
                    example = {
                        "input": np.asarray(batch["input"])[keep][-1],
                        "gt_sequence": target[-1],
                        "pred_sequence": pred[-1],
                        "time_indices": time_indices,
                        "coords": coords_plot,
                    }
            errors[mode] = compute_final_metric(np.concatenate(all_errs, 0))
            print(f"{mode} mode error: {errors[mode]}")

        self._store_results(errors, modes)
        if example is not None:
            self._plot_results(example)
        return errors

    def _store_results(self, errors, modes):
        """CSV datarow keys match the reference (sequential_trainer.py:496-504)."""
        if len(modes) > 1:
            self.datarow["relative error (direct)"] = errors.get("direct", 0.0)
            self.datarow["relative error (auto2)"] = errors.get("autoregressive", 0.0)
            self.datarow["relative error (auto4)"] = errors.get("star", 0.0)
        else:
            self.datarow[f"relative error ({modes[0]})"] = errors[modes[0]]

    def _plot_results(self, example):
        try:
            coords = example["coords"]
            u_dim = len(np.asarray(self.stats["u"]["mean"]))
            u_stats = self.stats["u"]
            inp = example["input"][..., :u_dim] * u_stats["std"] + u_stats["mean"]
            fig = plot_estimates(
                u_inp=inp,
                u_gtr=example["gt_sequence"][-1],
                u_prd=example["pred_sequence"][-1],
                x_inp=coords,
                names=self.metadata.names["u"],
                symmetric=self.metadata.signed["u"],
                domain=self.metadata.domain_x,
            )
            os.makedirs(os.path.dirname(self.path_config.result_path) or ".",
                        exist_ok=True)
            fig.savefig(self.path_config.result_path, dpi=200,
                        bbox_inches="tight", pad_inches=0.1)
            import matplotlib.pyplot as plt
            plt.close(fig)

            if self.coord_dim == 2:
                gif_path = self.path_config.result_path.replace(".png", ".gif")
                create_sequential_animation(
                    gt_sequence=example["gt_sequence"],
                    pred_sequence=example["pred_sequence"],
                    coords=coords, save_path=gif_path,
                    time_values=[self.t_values[i] for i in example["time_indices"][1:]],
                    symmetric=self.metadata.signed.get("u"),
                    names=self.metadata.names.get("u"))
                print(f"Animation saved to {gif_path}")
        except Exception as e:
            print(f"Warning: could not create sequential plots: {e}")
