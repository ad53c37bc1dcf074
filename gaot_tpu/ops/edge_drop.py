"""Edge drop (neighbor sampling) as mask dropout on the padded K axis.

Train-only regularization equivalent to the reference's CSR edge drop
(src/model/layers/utils/edge_drop.py:8-106):

- ``ratio``: every edge kept independently with probability ``sample_ratio``
  (reference lines 54-68).
- ``max_neighbors``: per query node keep a uniformly random subset of at most
  ``max_neighbors`` edges (reference lines 70-99, which draws a randperm per
  oversized node in a Python loop — here it's one vectorized top-k over
  random scores).

Operating on masks keeps shapes static, so a single XLA compilation covers
train and eval (eval passes the mask through untouched).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def apply_edge_drop_mask(
    mask: jnp.ndarray,
    rng: Optional[jax.Array],
    sampling_strategy: Optional[str],
    max_neighbors: Optional[int] = None,
    sample_ratio: Optional[float] = None,
    training: bool = True,
) -> jnp.ndarray:
    """Return a (possibly) thinned neighbor mask. mask: bool [..., Q, K]."""
    if not training or sampling_strategy is None or rng is None:
        return mask

    if sampling_strategy == "ratio":
        if sample_ratio is None or sample_ratio >= 1.0:
            return mask
        keep = jax.random.bernoulli(rng, p=sample_ratio, shape=mask.shape)
        return mask & keep

    if sampling_strategy == "max_neighbors":
        if max_neighbors is None or max_neighbors >= mask.shape[-1]:
            return mask
        # Random scores in [0, 1) for valid edges, -1 for padding; keeping the
        # `max_neighbors` highest scores per row is a uniform random subset.
        scores = jax.random.uniform(rng, mask.shape, minval=0.0, maxval=1.0)
        scores = jnp.where(mask, scores, -1.0)
        kth = jax.lax.top_k(scores, max_neighbors)[0][..., -1:]
        return mask & (scores >= kth)

    return mask
