"""Autoregressive rollout for time-dependent problems.

Functional equivalent of the reference's Python-loop rollout
(src/model/gaot.py:307-477) as a single `jax.lax.scan` over time steps: one
compile covers the whole trajectory, the stepper-mode denormalization math
('output' | 'residual' | 'time_der', reference gaot.py:436-477) is traced
in-graph, and per-step time features are precomputed host-side.

Unlike the reference (which raises NotImplementedError for variable
coordinates, src/trainer/sequential_trainer.py:341-347), this rollout works
for both fx and vx modes — the model handles either coordinate layout.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _stat(stats: Dict, key: str, field: str) -> jnp.ndarray:
    return jnp.asarray(stats[key][field])


def autoregressive_predict(
    model,
    params,
    x_batch: jnp.ndarray,
    time_indices: np.ndarray,
    t_values: np.ndarray,
    stats: Dict,
    stepper_mode: str,
    latent_tokens_coord: jnp.ndarray,
    coord: jnp.ndarray,
    encoder_graphs: Sequence,
    decoder_graphs: Sequence,
    use_conditional_norm: bool = False,
    encoder_tgraphs: Sequence = None,
    decoder_tgraphs: Sequence = None,
) -> jnp.ndarray:
    """Roll the model forward over ``time_indices``.

    Args:
        x_batch: [B, N, in] initial features: [u(t0)_norm ‖ c_norm ‖ 2 dummy
            time features] (matching the reference TestDataset layout,
            src/datasets/data_utils.py:383-392).
        time_indices: [T] evaluation step indices into t_values.
        t_values: [T_total] physical time values.
        stats: normalization statistics ('u', optional 'c', 'start_time',
            'time_diffs', optional 'res'/'der').

    Returns:
        Denormalized predictions [B, T-1, N, u_dim].
    """
    if stepper_mode not in ("output", "residual", "time_der"):
        raise ValueError(f"Unsupported stepper_mode: {stepper_mode}")

    time_indices = np.asarray(time_indices)
    t_values = np.asarray(t_values)

    u_mean = _stat(stats, "u", "mean")
    u_std = _stat(stats, "u", "std")
    u_dim = int(u_mean.shape[0])
    c_dim = int(np.asarray(stats["c"]["mean"]).shape[0]) if "c" in stats else 0

    # Host-side per-step time features (static shapes; reference
    # gaot.py:365-388 recomputes them per Python-loop step).
    t_in = time_indices[:-1]
    t_out = time_indices[1:]
    start_times = t_values[t_in]
    time_diffs = t_values[t_out] - t_values[t_in]
    st_mean = float(np.asarray(stats["start_time"]["mean"]))
    st_std = float(np.asarray(stats["start_time"]["std"]))
    td_mean = float(np.asarray(stats["time_diffs"]["mean"]))
    td_std = float(np.asarray(stats["time_diffs"]["std"]))
    start_norm = jnp.asarray((start_times - st_mean) / st_std, dtype=x_batch.dtype)
    diff_norm = jnp.asarray((time_diffs - td_mean) / td_std, dtype=x_batch.dtype)
    diff_raw = jnp.asarray(time_diffs, dtype=x_batch.dtype)

    c_features = x_batch[..., u_dim:u_dim + c_dim] if c_dim > 0 else None
    current_u = x_batch[..., :u_dim]
    batch, num_nodes = current_u.shape[0], current_u.shape[1]

    if stepper_mode == "residual":
        step_mean, step_std = _stat(stats, "res", "mean"), _stat(stats, "res", "std")
    elif stepper_mode == "time_der":
        step_mean, step_std = _stat(stats, "der", "mean"), _stat(stats, "der", "std")
    else:
        step_mean = step_std = None

    def step(carry, per_step):
        u_norm = carry
        s_norm, d_norm, d_raw = per_step
        ones = jnp.ones((batch, num_nodes, 1), dtype=u_norm.dtype)
        feats = [u_norm]
        if c_features is not None:
            feats.append(c_features)
        feats.extend([ones * s_norm, ones * d_norm])
        x_input = jnp.concatenate(feats, axis=-1)

        if use_conditional_norm:
            pred = model.apply(
                params, latent_tokens_coord, coord, x_input[..., :-1],
                encoder_graphs, decoder_graphs,
                condition=x_input[:, 0, -2:-1], training=False,
                encoder_tgraphs=encoder_tgraphs,
                decoder_tgraphs=decoder_tgraphs)
        else:
            pred = model.apply(
                params, latent_tokens_coord, coord, x_input,
                encoder_graphs, decoder_graphs, training=False,
                encoder_tgraphs=encoder_tgraphs,
                decoder_tgraphs=decoder_tgraphs)

        # Stepper-mode denormalization (reference gaot.py:454-472).
        if stepper_mode == "output":
            pred_denorm = pred * u_std + u_mean
        elif stepper_mode == "residual":
            pred_denorm = (u_norm * u_std + u_mean) + (pred * step_std + step_mean)
        else:  # time_der
            pred_denorm = (u_norm * u_std + u_mean) + d_raw * (pred * step_std + step_mean)

        next_u = (pred_denorm - u_mean) / u_std
        return next_u, pred_denorm

    _, preds = jax.lax.scan(step, current_u, (start_norm, diff_norm, diff_raw))
    return jnp.moveaxis(preds, 0, 1)  # [B, T-1, N, u_dim]
