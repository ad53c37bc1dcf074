"""Attentional Graph Neural Operator (AGNO) on padded neighborhoods (Flax).

Re-design of the reference AGNO kernel integral transform
(src/model/layers/agno.py:21-273) for static shapes:

    out(x) = reduce_{y in A(x)} α(x,y) · k(x, y[, f(y)]) [· f(y)]

where A(x) is a padded K-neighborhood. Gathers become dense `[Q, K, ·]`
indexing, the CSR segment-softmax becomes a masked softmax over K, and the
CSR segment sum/mean becomes a masked reduce — everything static-shape,
vmap-able over the batch, and XLA-fusable. The per-edge kernel MLP is the
FLOP hot spot and lowers to `[Q·K, ·]` matmuls on the MXU.

Transform types ('linear', 'nonlinear', '*_kernelonly') and attention types
('cosine', 'dot_product') match the reference exactly. In 'linear' modes the
kernel depends only on coordinates, so kernel values are computed once per
graph and shared across the whole batch (the reference relies on the same
property; agno.py:229-242).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.gather_apply import (
    apply_bucketed_graph_transform,
    apply_graph_transform,
    gather_multiply_reduce_km,
    gather_rows_bucketed_tg,
    gather_rows_tg,
    pack_f32_cols,
    unpack_f32_cols,
)


def aug_gather_on() -> bool:
    """Coordinate-augmented feature gather on the flat K-major route: pack
    the fp32 source coordinates into the f row gather (exact bitcast) so
    the kernel/geoembed coordinate rows come for free, and run the d_f
    backward as gather_rows_tg's single-gather segment sum. Coordinate
    gathers were ~34% of all vx gather descriptors
    (scripts/vx_descriptor_bound.py). Trace-time gate: GAOT_AUG_GATHER=0
    restores the separate-gather route (ablate/diagnostic)."""
    return os.environ.get("GAOT_AUG_GATHER", "1") == "1"

from ..ops.padding import BucketedGraph, PaddedGraph, TransposeGraph
from ..ops.segment_ops import masked_mean, masked_softmax, masked_sum
from .mlp import LinearChannelMLP


class AGNO(nn.Module):
    channel_mlp_features: Sequence[int]
    transform_type: str = "linear"
    use_attn: bool = False
    attention_type: str = "cosine"
    coord_dim: Optional[int] = None
    attention_dim: int = 64
    dtype: Optional[jnp.dtype] = None
    def setup(self):
        if self.transform_type not in (
            "linear", "nonlinear", "linear_kernelonly", "nonlinear_kernelonly"):
            raise ValueError(f"Invalid transform_type: {self.transform_type}")
        if self.use_attn:
            if self.coord_dim is None:
                raise ValueError("coord_dim must be specified when use_attn is True")
            if self.attention_type not in ("cosine", "dot_product"):
                raise ValueError(f"Invalid attention_type: {self.attention_type}")
        self.channel_mlp = LinearChannelMLP(
            features=self.channel_mlp_features, dtype=self.dtype, name="channel_mlp")
        if self.use_attn and self.attention_type == "dot_product":
            self.query_proj = nn.Dense(self.attention_dim, dtype=self.dtype)
            self.key_proj = nn.Dense(self.attention_dim, dtype=self.dtype)

    def _attention_weights(self, query_coords: jnp.ndarray, key_coords: jnp.ndarray,
                           mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
        """α(x,y) over the K axis. query_coords: [Q, 1, d]; key_coords:
        [Q, K, d] (axis=-1) or K-major [1, Q, d] / [K, Q, d] (axis=0)."""
        if self.attention_type == "dot_product":
            q = self.query_proj(query_coords)                   # [Q, 1, a]
            k = self.key_proj(key_coords)                       # [Q, K, a]
            scores = jnp.sum(q * k, axis=-1) / jnp.sqrt(
                jnp.asarray(self.attention_dim, dtype=jnp.float32)).astype(k.dtype)
        else:  # cosine
            qn = query_coords / jnp.maximum(
                jnp.linalg.norm(query_coords, axis=-1, keepdims=True), 1e-12)
            kn = key_coords / jnp.maximum(
                jnp.linalg.norm(key_coords, axis=-1, keepdims=True), 1e-12)
            scores = jnp.sum(qn * kn, axis=-1)                  # [Q, K]
        return masked_softmax(scores.astype(jnp.float32), mask,
                              axis=axis).astype(key_coords.dtype)

    def __call__(self,
                 y: jnp.ndarray,
                 graph: PaddedGraph,
                 x: Optional[jnp.ndarray] = None,
                 f_y: Optional[jnp.ndarray] = None,
                 weights: Optional[jnp.ndarray] = None,
                 tgraph: Optional[TransposeGraph] = None,
                 num_samples: int = 1,
                 rep_coords: Optional[jnp.ndarray] = None,
                 return_rep: bool = False) -> jnp.ndarray:
        """Compute the attentional integral transform.

        Args:
            y: [n, d1] source points (integration domain).
            graph: PaddedGraph with indices/mask [m, K] into y.
            x: [m, d2] query points (defaults to y).
            f_y: [batch, n, c] or [n, c] input function on y, or None.
            weights: [n] quadrature weights, or None.
            tgraph: optional transpose graph — switches the k·f reduction to
                the scatter-free custom-VJP path (ops/gather_apply.py).
            return_rep: flat K-major aug route only — also return the fp32
                [K, Q, d1] coordinate rows recovered from the augmented
                gather, so geoembed reuses them instead of re-gathering.

        Returns:
            [batch, m, c_out] (batched f_y) or [m, c_out];
            (out, rep) when return_rep.
        """
        if x is None:
            x = y
        if isinstance(graph, BucketedGraph):
            return self._call_bucketed(y, graph, x, f_y, weights, num_samples,
                                       return_rep=return_rep)

        # K-major fast path for vx-flattened linear transforms: the coef
        # pipeline (kernel MLP, attention, masks) runs [K, Q, ·] end to end,
        # feeding the Pallas reduce without any swapaxes — the Q-major
        # layout churn cost ~4 ms/step on the airfoil decoder.
        if (tgraph is not None and f_y is not None and f_y.ndim == 2
                and self.transform_type == "linear"):
            return self._call_flat_km(y, graph, x, f_y, weights, tgraph,
                                      num_samples, rep_coords,
                                      return_rep=return_rep)
        if return_rep:
            raise ValueError("return_rep requires the flat K-major route")
        indices, mask = graph.indices, graph.mask

        if rep_coords is None:
            rep_coords = y[indices]                              # [Q, K, d1]
        self_coords = x[:, None, :]                              # [Q, 1, d2]

        batched = f_y is not None and f_y.ndim == 3
        in_features = None
        if f_y is not None:
            in_features = f_y[:, indices, :] if batched else f_y[indices]

        attention = None
        if self.use_attn:
            attention = self._attention_weights(
                self_coords[..., :self.coord_dim],
                rep_coords[..., :self.coord_dim],
                mask)                                            # [Q, K]

        # Kernel MLP input: [y_coord ‖ x_coord (‖ f_y)]
        self_b = jnp.broadcast_to(self_coords, rep_coords.shape[:-1] + (x.shape[-1],))
        agg = jnp.concatenate([rep_coords, self_b], axis=-1)     # [Q, K, d1+d2]
        nonlinear = self.transform_type in ("nonlinear", "nonlinear_kernelonly")
        if f_y is not None and nonlinear:
            if batched:
                agg = jnp.broadcast_to(agg[None], (f_y.shape[0],) + agg.shape)
                agg = jnp.concatenate([agg, in_features], axis=-1)
            else:
                agg = jnp.concatenate([agg, in_features], axis=-1)

        kernel = self.channel_mlp(agg)      # [Q, K, c] or [B, Q, K, c]

        multiply_f = (f_y is not None
                      and self.transform_type != "nonlinear_kernelonly")

        if multiply_f and tgraph is not None:
            # Scatter-free path: fold attention / mean weights / quadrature
            # weights and the padding mask into a per-edge coefficient, then
            # one gather-multiply-reduce with a transpose-graph backward.
            # All folds cast to the kernel dtype: attention/quadrature
            # weights derive from f32 coords and would otherwise promote the
            # whole [·, K, C] coef stream (and every downstream gather,
            # reshape, and Pallas operand) to f32 — measured ~17 ms/step of
            # pure layout copies on the vx flagship.
            coef = kernel
            # One [·, K] scale (attention/quadrature/mean-divisor + mask)
            # applied as a single fusible multiply — a full-width jnp.where
            # materializes between producer and custom-call consumers (see
            # _edge_scale_km).
            if attention is not None:
                scale = attention
                if weights is not None:
                    scale = scale * weights[indices]
            elif weights is not None:
                scale = weights[indices]
            else:                              # mean reduce over real edges
                counts = jnp.maximum(
                    jnp.sum(mask, axis=-1, keepdims=True), 1)
                scale = 1.0 / counts.astype(jnp.float32)
            scale = jnp.where(mask, scale, 0)[..., None]
            coef = coef * (scale if coef.ndim == scale.ndim
                           else scale[None]).astype(coef.dtype)
            from ..utils.routing import record_route
            record_route("agno", "xla-tgraph")
            return apply_graph_transform(coef, f_y, graph, tgraph,
                                         num_samples=num_samples)

        out = kernel
        if multiply_f:
            out = out * in_features if out.ndim == in_features.ndim else \
                out[None] * in_features                          # [B, Q, K, c]

        if attention is not None:
            att = attention[..., None].astype(out.dtype)
            out = out * att if out.ndim == 3 else out * att[None]

        if weights is not None:
            nbr_w = weights[indices][..., None].astype(out.dtype)  # [Q, K, 1]
            out = out * (nbr_w if out.ndim == 3 else nbr_w[None])
            reduction = "sum"
        else:
            reduction = "sum" if self.use_attn else "mean"

        m = mask if out.ndim == 3 else mask[None]
        if reduction == "sum":
            return masked_sum(out, jnp.broadcast_to(m[..., None], out.shape))
        return masked_mean(out, jnp.broadcast_to(m[..., None], out.shape))

    def _call_flat_km(self, y: jnp.ndarray, graph: PaddedGraph,
                      x: jnp.ndarray, f_y: jnp.ndarray,
                      weights: Optional[jnp.ndarray],
                      tgraph: TransposeGraph, num_samples: int,
                      rep_km: Optional[jnp.ndarray] = None,
                      return_rep: bool = False) -> jnp.ndarray:
        """K-major flat transform: every per-edge tensor is [K, Q, ·], the
        softmax/mask reduce over axis 0 with Q in the vector lanes, and the
        coef feeds ops/gather_apply.py::gather_multiply_reduce_km directly."""
        from ..utils.routing import record_route

        idx_t = graph.indices.T                                  # [K, Q]
        mask_t = graph.mask.T
        c_f = f_y.shape[-1]
        d1 = y.shape[-1]
        gath = None
        use_aug = rep_km is None and aug_gather_on()
        if use_aug:
            # ONE augmented row gather [f ‖ packed coords] replaces the
            # separate f and coordinate gathers (aug_gather_on docstring);
            # the backward runs as gather_rows_tg's single-gather segment
            # sum. Coordinates come back bitcast-exact fp32; stop_gradient
            # because coords are data (and bitcast has no VJP).
            record_route("agno", "xla-kmajor-aug")
            f_aug = jnp.concatenate(
                [f_y, pack_f32_cols(y.astype(jnp.float32), f_y.dtype)], -1)
            gath_aug = gather_rows_tg(f_aug, idx_t, tgraph, num_samples)
            gath = gath_aug[..., :c_f]
            rep_km = jax.lax.stop_gradient(
                unpack_f32_cols(gath_aug[..., c_f:], d1))        # [K, Q, d1]
        else:
            record_route("agno", "xla-kmajor")
            if rep_km is None:
                rep_km = y[idx_t]                                # [K, Q, d1]
        self_c = x[None, :, :]                                   # [1, Q, d2]

        attention = None
        if self.use_attn:
            attention = self._attention_weights(
                self_c[..., :self.coord_dim],
                rep_km[..., :self.coord_dim], mask_t, axis=0)    # [K, Q]

        self_b = jnp.broadcast_to(self_c, rep_km.shape[:-1] + (x.shape[-1],))
        agg = jnp.concatenate([rep_km, self_b], axis=-1)         # [K, Q, d1+d2]
        coef = self.channel_mlp(agg)                             # [K, Q, C]
        # Fold attention/quadrature/mean-divisor AND the edge mask into one
        # [K, Q] scale, applied as a single elementwise multiply. A
        # jnp.where on the full [K, Q, C] coef cannot fuse into the Pallas
        # multiply-reduce custom call (custom-call operands materialize),
        # which cost two full HBM round-trips of coef per step (fwd select
        # + bwd select, 134 MB each at the 8k-node decoder) — the multiply
        # fuses into the MLP's output fusion instead.
        scale = self._edge_scale_km(attention, weights, idx_t, mask_t)
        coef = coef * scale[..., None].astype(coef.dtype)
        if use_aug:
            # Multiply-reduce left to XLA: fuses the f-slice of the
            # augmented gather and the coef product into one fusion (a
            # Pallas operand would force the 134 MB slice to materialize),
            # and its autodiff forms d_gath = coef·dout elementwise — no
            # second backward gather.
            out = (coef.astype(jnp.float32)
                   * gath.astype(jnp.float32)).sum(0).astype(f_y.dtype)
            return (out, rep_km) if return_rep else out
        if return_rep:
            raise ValueError("return_rep requires the aug gather route "
                             "(GAOT_AUG_GATHER)")
        return gather_multiply_reduce_km(coef, f_y, idx_t, tgraph,
                                         num_samples)

    @staticmethod
    def _edge_scale_km(attention, weights_g, idx_t, mask_t):
        """[K, Q] per-edge scale: attention and/or quadrature weights (mean
        divisor when neither), zeroed on masked edges."""
        if attention is not None:
            scale = attention
            if weights_g is not None:
                scale = scale * weights_g[idx_t]
        elif weights_g is not None:
            scale = weights_g[idx_t]
        else:                                  # mean reduce over real edges
            counts = jnp.maximum(jnp.sum(mask_t, axis=0, keepdims=True), 1)
            scale = 1.0 / counts.astype(jnp.float32)
        return jnp.where(mask_t, scale, 0)

    def _folded_coef(self, y: jnp.ndarray, graph: PaddedGraph, x: jnp.ndarray,
                     weights: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Per-edge coefficient for the shared (coordinate-only) kernel:
        kernel-MLP output with attention / quadrature / mean weights and the
        padding mask folded in — the same folding as the tgraph branch of
        __call__, for one degree bucket. x: [Qb, d] bucket query coords."""
        indices, mask = graph.indices, graph.mask
        rep_coords = y[indices]                                  # [Qb, Kb, d]
        self_coords = x[:, None, :]
        attention = None
        if self.use_attn:
            attention = self._attention_weights(
                self_coords[..., :self.coord_dim],
                rep_coords[..., :self.coord_dim], mask)
        self_b = jnp.broadcast_to(self_coords,
                                  rep_coords.shape[:-1] + (x.shape[-1],))
        agg = jnp.concatenate([rep_coords, self_b], axis=-1)
        coef = self.channel_mlp(agg)                             # [Qb, Kb, C]
        # Casts keep coef in the kernel dtype — see the tgraph branch of
        # __call__ for the measured cost of letting f32 weights promote it.
        # Mask+attention+mean-divisor fold into one [Qb, Kb] scale so no
        # full-width jnp.where materializes between the MLP and the Pallas
        # consumers (see _edge_scale_km).
        if attention is not None:
            scale = attention
            if weights is not None:
                scale = scale * weights[indices]
        elif weights is not None:
            scale = weights[indices]
        else:                                  # mean reduce over real edges
            counts = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1)
            scale = 1.0 / counts.astype(jnp.float32)
        scale = jnp.where(mask, scale, 0)
        return coef * scale[..., None].astype(coef.dtype)

    def _folded_coef_kmajor(self, rep, x_b, idx_t, mask_t, weights):
        """K-major per-edge coefficient for one bucket: kernel MLP on the
        pre-gathered [Kb, Qb, d] coordinate rows with the attention /
        quadrature / mean / mask fold as one [Kb, Qb] scale."""
        attention = None
        if self.use_attn:
            attention = self._attention_weights(
                x_b[None, :, :self.coord_dim],
                rep[..., :self.coord_dim], mask_t, axis=0)       # [Kb, Qb]
        self_b = jnp.broadcast_to(x_b[None], rep.shape[:-1] + (x_b.shape[-1],))
        agg = jnp.concatenate([rep, self_b], axis=-1)
        coef = self.channel_mlp(agg)                             # [Kb, Qb, C]
        scale = self._edge_scale_km(attention, weights, idx_t, mask_t)
        return coef * scale[..., None].astype(coef.dtype)

    def _call_bucketed_aug(self, y, bg: BucketedGraph, x, f_y, weights,
                           num_samples, return_rep):
        """Coordinate-augmented bucketed transform (vx-flattened f_y): one
        [f ‖ packed coords] row gather per bucket (gather_rows_bucketed_tg,
        single-gather combined backward), coefficients K-major from the
        recovered exact fp32 coordinate rows, multiply-reduce left to XLA.
        Replaces three separate gather families (f, kernel coords, geoembed
        coords) per bucket — see aug_gather_on."""
        c_f = f_y.shape[-1]
        d1 = y.shape[-1]
        f_aug = jnp.concatenate(
            [f_y, pack_f32_cols(y.astype(jnp.float32), f_y.dtype)], -1)
        idxs = tuple(g.indices for g in bg.buckets)
        gaths = gather_rows_bucketed_tg(f_aug, idxs, bg.tgraph, num_samples)
        outs, reps, offset = [], [], 0
        for g, gath_aug in zip(bg.buckets, gaths):
            nb = g.indices.shape[-2]
            x_b = x[offset:offset + nb]
            offset += nb
            rep = jax.lax.stop_gradient(
                unpack_f32_cols(gath_aug[..., c_f:], d1))        # [Kb, Qb, d]
            reps.append(rep)
            coef = self._folded_coef_kmajor(rep, x_b, g.indices.T,
                                            g.mask.T, weights)
            outs.append((coef.astype(jnp.float32)
                         * gath_aug[..., :c_f].astype(jnp.float32))
                        .sum(0).astype(f_y.dtype))
        out = jnp.concatenate(outs, axis=0)
        return (out, tuple(reps)) if return_rep else out

    def _call_bucketed(self, y: jnp.ndarray, bg: BucketedGraph,
                       x: jnp.ndarray, f_y: Optional[jnp.ndarray],
                       weights: Optional[jnp.ndarray],
                       num_samples: int = 1,
                       return_rep: bool = False) -> jnp.ndarray:
        """Integral transform over a degree-bucketed graph (ops/padding.py).

        x must be the bucket-concatenated query coords; the result is in the
        same concatenated row order (the caller unpermutes). The fx path with
        a shared coordinate-only kernel uses the combined custom VJP —
        per-bucket forward/d_coef gathers, one d_f pass. Other configurations
        (kernel-only transforms, nonlinear kernels) run the plain per-bucket
        path and concatenate.
        """
        multiply_f = (f_y is not None
                      and self.transform_type != "nonlinear_kernelonly")
        nonlinear = self.transform_type in ("nonlinear", "nonlinear_kernelonly")
        # f_y [B, N, C] (fx, shared coefs) or [N*, C] (vx-flattened, per-edge
        # coefs) — both take the combined custom-VJP path.
        combined = (multiply_f and not nonlinear and bg.tgraph is not None
                    and f_y.ndim in (2, 3))
        from ..utils.routing import record_route

        if combined and f_y.ndim == 2 and aug_gather_on():
            record_route("agno", "xla-bucketed-aug")
            return self._call_bucketed_aug(y, bg, x, f_y, weights,
                                           num_samples, return_rep)
        if return_rep:
            raise ValueError("return_rep requires the aug gather route "
                             "(GAOT_AUG_GATHER)")
        record_route("agno",
                     "xla-bucketed" if combined else "xla-bucketed-plain")
        parts, offset = [], 0
        for graph in bg.buckets:
            nb = graph.indices.shape[-2]
            xs = x[offset:offset + nb]
            offset += nb
            if combined:
                parts.append(self._folded_coef(y, graph, xs, weights))
            else:
                parts.append(self.__call__(y, graph, x=xs, f_y=f_y,
                                           weights=weights))
        if combined:
            return apply_bucketed_graph_transform(parts, f_y, bg,
                                                  num_samples=num_samples)
        return jnp.concatenate(parts, axis=-2)
