"""Masked neighborhood reductions over a static K axis (device-side, JAX).

TPU-native replacement for torch_scatter's segment_csr / scatter_{sum,mean,max}
(reference src/model/layers/utils/segment_csr.py:14-98,
src/model/layers/gemb.py:123-219) and the CSR segment-softmax
(src/model/layers/agno.py:112-146). Ragged CSR rows become padded `[Q, K]`
windows, so every reduction is a dense masked reduce the VPU vectorizes and
XLA fuses into neighboring ops — no data-dependent shapes anywhere.
"""
from __future__ import annotations

import jax.numpy as jnp


def gather_neighbors(values: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather per-neighbor rows.

    values: [N, C] or [B, N, C]; indices: [Q, K] →
    returns [Q, K, C] or [B, Q, K, C].
    """
    if values.ndim == 2:
        return values[indices]
    if values.ndim == 3:
        return values[:, indices, :]
    raise ValueError(f"values must be 2D or 3D, got shape {values.shape}")


def masked_sum(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Sum over the K axis with padded entries zeroed. mask broadcasts to x."""
    mask = jnp.expand_dims(mask, -1) if mask.ndim == x.ndim - 1 else mask
    return jnp.sum(jnp.where(mask, x, 0), axis=axis)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Mean over valid entries of the K axis; empty rows yield 0."""
    m = jnp.expand_dims(mask, -1) if mask.ndim == x.ndim - 1 else mask
    total = jnp.sum(jnp.where(m, x, 0), axis=axis)
    count = jnp.sum(m, axis=axis)
    return total / jnp.maximum(count, 1)


def masked_max(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Max over valid entries of the K axis; empty rows yield 0 (matching the
    reference's scatter_max-on-zeros behavior, src/model/layers/gemb.py:204-226)."""
    m = jnp.expand_dims(mask, -1) if mask.ndim == x.ndim - 1 else mask
    neg = jnp.finfo(x.dtype).min
    maxed = jnp.max(jnp.where(m, x, neg), axis=axis)
    any_valid = jnp.any(m, axis=axis)
    return jnp.where(any_valid, maxed, 0)


def masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Numerically-stable softmax over the K axis restricted to valid entries.

    Equivalent to the reference's CSR segment-softmax
    (src/model/layers/agno.py:112-146): max-shift, exp, normalize within each
    neighborhood. Padded entries get weight 0; empty rows return all-zero
    weights.
    """
    neg = jnp.finfo(scores.dtype).min
    shifted = jnp.where(mask, scores, neg)
    maxes = jnp.max(shifted, axis=axis, keepdims=True)
    maxes = jnp.where(jnp.isfinite(maxes), maxes, 0)
    # Exponentiate the masked+shifted scores, NOT the raw ones: for a row
    # with zero valid entries exp(raw - 0) can overflow to inf, and the
    # where-VJP then multiplies the zero cotangent by inf -> NaN gradients.
    exp = jnp.where(mask, jnp.exp(jnp.where(mask, scores, maxes) - maxes), 0)
    denom = jnp.sum(exp, axis=axis, keepdims=True)
    return exp / jnp.maximum(denom, jnp.finfo(scores.dtype).tiny)
