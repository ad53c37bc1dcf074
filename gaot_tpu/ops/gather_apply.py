"""Scatter-free gather-multiply-reduce: the AGNO apply primitive.

Computes  out[b, q, c] = Σ_k coef[(b,) q, k, c] · f[b, idx[q, k], c]
(padded edges must already have coef == 0).

Plain XLA autodiff of this expression produces a scatter-add for d_f —
serialized and slow on TPU. This custom VJP replaces it with gathers over a
host-precomputed transpose graph (ops/padding.py::transpose_graph):

    d_f[b, n, c]  = Σ_j coef_flat[edge_pos[n, j], c] · dout[b, query[n, j], c]

which is two dense gathers + a masked reduce — the same shape of work as the
forward, and fully vectorized. d_coef is a gather as well. Because coef
carries the (possibly edge-dropped) mask, the backward stays exact under
training-time edge sampling.

Shapes: f is [B, N, C] (fx batched) or [N, C] (vx-flattened); coef is
[Q, K, C] (shared across the batch — linear transforms) or [B, Q, K, C].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .padding import TransposeGraph


def _forward(coef, f, indices):
    if f.ndim == 2:                       # unbatched (vx-flattened)
        gathered = f[indices]             # [Q, K, C]
        return jnp.sum(coef * gathered, axis=-2)
    gathered = f[:, indices, :]           # [B, Q, K, C]
    c = coef if coef.ndim == 4 else coef[None]
    return jnp.sum(c * gathered, axis=-2)


@jax.custom_vjp
def gather_multiply_reduce(coef: jnp.ndarray, f: jnp.ndarray,
                           indices: jnp.ndarray, edge_pos: jnp.ndarray,
                           tquery: jnp.ndarray, tmask: jnp.ndarray) -> jnp.ndarray:
    return _forward(coef, f, indices)


def _fwd(coef, f, indices, edge_pos, tquery, tmask):
    return _forward(coef, f, indices), (coef, f, indices, edge_pos, tquery, tmask)


def _bwd(res, dout):
    coef, f, indices, edge_pos, tquery, tmask = res
    k = indices.shape[-1]
    c_dim = coef.shape[-1]

    if f.ndim == 2:
        # d_coef[q,k,c] = dout[q,c] · f[idx[q,k],c]
        d_coef = dout[:, None, :] * f[indices]
        coef_flat = coef.reshape(-1, c_dim)
        cg = coef_flat[edge_pos]                          # [N, Kt, C]
        dg = dout[tquery]                                 # [N, Kt, C]
        d_f = jnp.sum(jnp.where(tmask[..., None], cg * dg, 0), axis=-2)
    else:
        gathered = f[:, indices, :]                       # [B, Q, K, C]
        if coef.ndim == 4:
            d_coef = dout[:, :, None, :] * gathered
            coef_flat = coef.reshape(coef.shape[0], -1, c_dim)
            cg = coef_flat[:, edge_pos, :]                # [B, N, Kt, C]
        else:
            d_coef = jnp.sum(dout[:, :, None, :] * gathered, axis=0)
            coef_flat = coef.reshape(-1, c_dim)
            cg = coef_flat[edge_pos][None]                # [1, N, Kt, C]
        dg = dout[:, tquery, :]                           # [B, N, Kt, C]
        d_f = jnp.sum(jnp.where(tmask[None, :, :, None], cg * dg, 0), axis=-2)

    d_coef = d_coef.astype(coef.dtype)
    d_f = d_f.astype(f.dtype)
    zeros_i = lambda x: jnp.zeros_like(x)  # integer/bool cotangents are inert
    return (d_coef, d_f, zeros_i(indices), zeros_i(edge_pos),
            zeros_i(tquery), zeros_i(tmask))


gather_multiply_reduce.defvjp(_fwd, _bwd)


def apply_graph_transform(coef, f, graph, tgraph: TransposeGraph = None):
    """Dispatch: transpose-graph custom VJP when available, else plain XLA."""
    if tgraph is None:
        return _forward(coef, f, graph.indices)
    return gather_multiply_reduce(coef, f, graph.indices, tgraph.edge_pos,
                                  tgraph.query, tgraph.mask)
