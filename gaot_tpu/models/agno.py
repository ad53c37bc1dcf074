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

import jax.numpy as jnp
from flax import linen as nn

from ..ops.gather_apply import (
    apply_bucketed_graph_transform,
    apply_bucketed_graph_transform_km,
    apply_graph_transform,
    gather_multiply_reduce_km,
    gather_multiply_reduce_km2,
    to_km_edge_ids_flat,
)

from ..ops.padding import BucketedGraph, PaddedGraph, TransposeGraph
from ..ops.segment_ops import masked_mean, masked_softmax, masked_sum
from .mlp import LinearChannelMLP


def _km2_resolved(config_layout: str) -> bool:
    """2D K-major edge-flat coefficient pipeline (ops/gather_apply.py::
    gather_multiply_reduce_km2 / bucketed_gather_multiply_reduce_km) vs the
    3D Q-major paths. Config field magno.coef_layout ('km2' | 'qmajor');
    GAOT_KM2=1/0 is the measurement override, read at trace time so
    BENCH_ABLATE can A/B both layouts in one process."""
    env = os.environ.get("GAOT_KM2")
    if env is not None:
        return env == "1"
    return config_layout == "km2"


def _km2_split_active() -> bool:
    """Split-first-layer variant of the km2 kernel MLP: dense0([rep‖x]) =
    rep@W_a + (x@W_b + b0), with the query projection computed once per
    query and broadcast-added across K — kills the [K·Q, d1+d2] concat
    materialization and halves the (lane-starved, contracting-dim≤8) first
    edge matmul. Same math modulo fp summation order."""
    return os.environ.get("GAOT_KM2_SPLIT", "0") == "1"


class AGNO(nn.Module):
    channel_mlp_features: Sequence[int]
    transform_type: str = "linear"
    use_attn: bool = False
    attention_type: str = "cosine"
    coord_dim: Optional[int] = None
    attention_dim: int = 64
    dtype: Optional[jnp.dtype] = None
    fused: str = "auto"     # fused per-edge Pallas route: 'auto'|'on'|'off'
                            # (config field magno.fused_agno; GAOT_FUSED_AGNO
                            # env var overrides for measurement/tests)
    coef_layout: str = "qmajor"  # per-edge coefficient layout for the
                            # combined custom-VJP paths: 'qmajor' (3D
                            # [Q, K, C] pipeline) | 'km2' (2D K-major
                            # edge-flat; see _km2_resolved). Config field
                            # magno.coef_layout; GAOT_KM2 env overrides.

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
            return_rep: fused routes only (probe with fused_flat_active /
                fused_bucketed_active) — also return the coordinate slice of
                the kernel's gathered rows ([K, Q, d], or a per-bucket tuple
                of [Kb, Qb, d]) so geoembed can reuse it instead of issuing
                its own narrow [E, d] gathers.

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
            raise ValueError("return_rep requires a fused route (probe with "
                             "fused_flat_active / fused_bucketed_active)")
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
        coef feeds ops/gather_apply.py::gather_multiply_reduce_km directly.

        return_rep (fused route only): also return the [K, Q, d] coordinate
        slice of the kernel's gathered rows for geoembed sharing."""
        from ..utils.routing import record_route

        idx_t = graph.indices.T                                  # [K, Q]
        mask_t = graph.mask.T
        if self._use_fused_km(y, x, f_y, weights, idx_t):
            record_route("agno", "pallas-flat")
            out, rep = self._fused_flat_km(y, x, f_y, idx_t, graph.mask,
                                           tgraph, num_samples)
            return (out, rep) if return_rep else out
        if return_rep:
            raise ValueError("return_rep requires the fused flat route "
                             "(probe with fused_flat_active first)")
        if _km2_resolved(self.coef_layout):
            record_route("agno", "xla-kmajor2")
            return self._call_flat_km2(y, idx_t, mask_t, x, f_y, weights,
                                       tgraph, num_samples, rep_km)
        record_route("agno", "xla-kmajor")
        if rep_km is None:
            rep_km = y[idx_t]                                    # [K, Q, d1]
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
        return gather_multiply_reduce_km(coef, f_y, idx_t, tgraph.edge_pos,
                                         tgraph.query, tgraph.mask,
                                         num_samples)

    def _call_flat_km2(self, y, idx_t, mask_t, x, f_y, weights, tgraph,
                       num_samples, rep_km):
        """2D K-major edge-flat variant of the XLA flat path: the kernel MLP
        and the edge scale run on the [K·Q, ·] view, so the coefficient
        stays in the row-major layout every consumer wants. The 3D kernel-
        MLP dot output was laid out [K][C][Q]-physical by XLA, forcing three
        134 MB copies per step around the airfoil decoder's Pallas operands
        (fwd, bwd-MLP, bwd edge-flat view) — see
        ops/gather_apply.py::gather_multiply_reduce_km2."""
        if rep_km is None:
            rep_km = y[idx_t]                                    # [K, Q, d1]
        self_c = x[None, :, :]
        attention = None
        if self.use_attn:
            attention = self._attention_weights(
                self_c[..., :self.coord_dim],
                rep_km[..., :self.coord_dim], mask_t, axis=0)    # [K, Q]
        k, qx = idx_t.shape
        coef2 = self._kernel_coef2(rep_km, x, k, qx)             # [K·Q, C]
        scale = self._edge_scale_km(attention, weights, idx_t, mask_t)
        coef2 = coef2 * scale.reshape(k * qx, 1).astype(coef2.dtype)
        ep_km = to_km_edge_ids_flat(tgraph.edge_pos, num_samples,
                                    qx // num_samples, k)
        return gather_multiply_reduce_km2(coef2, f_y, idx_t, ep_km,
                                          tgraph.query, tgraph.mask,
                                          num_samples)

    def _kernel_coef2(self, rep_km: jnp.ndarray, x: jnp.ndarray,
                      k: int, qx: int) -> jnp.ndarray:
        """Kernel-MLP output on the 2D [K·Q, ·] edge view. Default: concat
        [rep ‖ x-broadcast] then the flax MLP. GAOT_KM2_SPLIT=1 splits the
        first layer instead (see _km2_split_active)."""
        if not _km2_split_active():
            self_b = jnp.broadcast_to(x[None], rep_km.shape[:-1]
                                      + (x.shape[-1],))
            agg = jnp.concatenate([rep_km, self_b], axis=-1)
            return self.channel_mlp(agg.reshape(k * qx, -1))
        from .mlp import _gelu_auto

        d1 = rep_km.shape[-1]
        ws, bs = self._mlp_params(d1 + x.shape[-1], rep_km.dtype)
        cdt = self.dtype or jnp.promote_types(rep_km.dtype, ws[0].dtype)
        w0 = ws[0].astype(cdt)
        h = rep_km.astype(cdt).reshape(k * qx, d1) @ w0[:d1]
        xp = x.astype(cdt) @ w0[d1:] + bs[0].astype(cdt)         # [Q, h]
        h = (h.reshape(k, qx, -1) + xp[None]).reshape(k * qx, -1)
        for i in range(1, len(self.channel_mlp_features)):
            h = _gelu_auto(h) @ ws[i].astype(cdt) + bs[i].astype(cdt)
        return h

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

    def _fused_config_ok(self, y, x, f_y, weights) -> bool:
        """Config-level gate for the fused per-edge Pallas pipeline
        (ops/pallas/fused_agno.py): bf16 compute on TPU, coordinate-only
        (linear) kernel on raw 2D/3D coords, cosine or no attention, no
        quadrature weights. fp32 (the convergence-parity configuration)
        always keeps the XLA path. Mode comes from the `fused` field
        (config magno.fused_agno); GAOT_FUSED_AGNO=0/1 overrides."""
        from ..utils.routing import resolve_mode

        mode = resolve_mode("GAOT_FUSED_AGNO", self.fused)
        if mode != "on":
            # 'auto' resolves to the XLA route: round-4 adjacent A/B medians
            # (BENCH_ABLATE=1, v5e) put the fused kernel at +3.3% end-to-end
            # at 8192 nodes and +0% at its 16,384-node design point, while
            # its Mosaic compiles add 250-1500 s of warmup per process that
            # the persistent compile cache does not cover. Opt in with
            # fused_agno='on' / GAOT_FUSED_AGNO=1 for long runs at ≤8k nodes
            # where +3% outweighs the one-time compile.
            return False
        d = y.shape[-1]
        c_f = f_y.shape[-1]
        if (weights is not None or d not in (2, 3) or x.shape[-1] != d
                or self.channel_mlp_features[-1] != c_f
                or (self.use_attn and self.attention_type != "cosine")):
            return False
        return True

    @staticmethod
    def _cf_padded(c_f: int) -> int:
        """Feature width the fused kernels run at: next multiple of 8 (lane
        alignment). The encoder's c_f=1 raw input pads to 8 — free, because
        every per-edge block is lane-padded to 128 anyway; the zero channels
        stay zero through the elementwise product and reduce and are sliced
        off after the op."""
        return -(-c_f // 8) * 8

    def _use_fused_km(self, y, x, f_y, weights, idx_t) -> bool:
        if not self._fused_config_ok(y, x, f_y, weights):
            return False
        from ..ops.pallas.fused_agno import fused_supported

        d, c_f = y.shape[-1], self._cf_padded(f_y.shape[-1])
        k, q = idx_t.shape
        return fused_supported(k, q, c_f + d, c_f, d,
                               len(self.channel_mlp_features),
                               f_y.dtype) > 0

    def _mlp_params(self, in_dim: int, dtype):
        """Materialize the kernel-MLP params and return them as raw arrays
        (the fused Pallas op consumes them directly; the dummy call only
        creates/looks up the flax variables and is dead code afterwards)."""
        self.channel_mlp(jnp.zeros((1, in_dim), dtype))
        p = self.channel_mlp.variables["params"]
        n = len(self.channel_mlp_features)
        ws = tuple(p[f"dense_{i}"]["kernel"] for i in range(n))
        bs = tuple(p[f"dense_{i}"]["bias"] for i in range(n))
        return ws, bs

    def _pad_cf(self, f_y, ws, bs):
        """Zero-pad the feature channels and the kernel-MLP output layer to
        the fused kernels' lane-aligned width. Differentiable (jnp.pad's VJP
        slices), and the padded lanes carry exact zeros: final-layer weight
        columns are zero → kern lanes zero → product with the zero feature
        lanes is zero → d(anything)/d(pad) is zero."""
        c_f = f_y.shape[-1]
        c_p = self._cf_padded(c_f)
        if c_p == c_f:
            return f_y, ws, bs, c_f
        pad = c_p - c_f
        f_y = jnp.pad(f_y, ((0, 0), (0, pad)))
        ws = ws[:-1] + (jnp.pad(ws[-1], ((0, 0), (0, pad))),)
        bs = bs[:-1] + (jnp.pad(bs[-1], ((0, pad),)),)
        return f_y, ws, bs, c_p

    def _fused_flat_km(self, y, x, f_y, idx_t, mask_q, tgraph, num_samples):
        """Returns (out [Q, c_f], rep [K, Q, d]) — rep is the coordinate
        slice of the kernel's gathered rows, for geoembed sharing."""
        from ..ops.gather_apply import fused_gather_agno_km

        d = y.shape[-1]
        c_f = f_y.shape[-1]
        ws, bs = self._mlp_params(2 * d, f_y.dtype)
        f_p, ws, bs, c_p = self._pad_cf(f_y, ws, bs)
        f_aug = jnp.concatenate([f_p, y.astype(f_y.dtype)], axis=-1)
        out, rep = fused_gather_agno_km(
            c_p, d, self.use_attn, num_samples, ws, bs, f_aug, idx_t,
            x.astype(f_y.dtype), mask_q, tgraph.edge_pos, tgraph.query,
            tgraph.mask)
        return (out[..., :c_f] if c_p != c_f else out), rep

    def _use_fused_bucketed(self, y, x, f_y, weights, bg) -> bool:
        if not self._fused_config_ok(y, x, f_y, weights):
            return False
        from ..ops.pallas.fused_agno import fused_supported

        d, c_f = y.shape[-1], self._cf_padded(f_y.shape[-1])
        n_layers = len(self.channel_mlp_features)
        return all(
            fused_supported(g.indices.shape[-1], g.indices.shape[-2],
                            c_f + d, c_f, d, n_layers, f_y.dtype) > 0
            for g in bg.buckets)

    def _fused_bucketed(self, y, x, f_y, bg: BucketedGraph, num_samples):
        """Per-bucket fused Pallas pipeline over the degree buckets; the
        combined transpose-graph d_f pass is shared with the XLA bucketed
        path (ops/gather_apply.py::fused_bucketed_agno)."""
        from ..ops.gather_apply import fused_bucketed_agno

        d = y.shape[-1]
        c_f = f_y.shape[-1]
        ws, bs = self._mlp_params(2 * d, f_y.dtype)
        f_p, ws, bs, c_p = self._pad_cf(f_y, ws, bs)
        f_aug = jnp.concatenate([f_p, y.astype(f_y.dtype)], axis=-1)
        dst_qs, masks, indices, offset = [], [], [], 0
        x_c = x.astype(f_y.dtype)
        for g in bg.buckets:
            nb = g.indices.shape[-2]
            dst_qs.append(x_c[offset:offset + nb])
            masks.append(g.mask)
            indices.append(g.indices)
            offset += nb
        out, reps = fused_bucketed_agno(
            c_p, d, self.use_attn, num_samples, ws, bs, f_aug,
            tuple(indices), tuple(dst_qs), tuple(masks),
            bg.tgraph.edge_pos, bg.tgraph.query, bg.tgraph.mask)
        return (out[..., :c_f] if c_p != c_f else out), reps

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

    def _folded_coef_km(self, y: jnp.ndarray, graph: PaddedGraph,
                        x: jnp.ndarray,
                        weights: Optional[jnp.ndarray]) -> jnp.ndarray:
        """2D K-major variant of :meth:`_folded_coef`: returns the bucket's
        per-edge coefficient as [K_b·Q_b, C] with row id k·Q_b + q, keeping
        the kernel-MLP dots 2D/row-major (see _call_flat_km2)."""
        idx_t = graph.indices.T                                  # [Kb, Qb]
        mask_t = graph.mask.T
        rep = y[idx_t]                                           # [Kb, Qb, d]
        self_c = x[None, :, :]
        attention = None
        if self.use_attn:
            attention = self._attention_weights(
                self_c[..., :self.coord_dim],
                rep[..., :self.coord_dim], mask_t, axis=0)       # [Kb, Qb]
        kb, qb = idx_t.shape
        coef2 = self._kernel_coef2(rep, x, kb, qb)               # [Kb·Qb, C]
        scale = self._edge_scale_km(attention, weights, idx_t, mask_t)
        return coef2 * scale.reshape(kb * qb, 1).astype(coef2.dtype)

    def fused_flat_active(self, y, x, f_y, weights, graph,
                          tgraph) -> bool:
        """True iff __call__ with these operands takes the fused flat
        K-major route (so return_rep is available and the caller should NOT
        pre-gather rep coords)."""
        if not (tgraph is not None and f_y is not None and f_y.ndim == 2
                and self.transform_type == "linear"):
            return False
        return self._use_fused_km(y, x, f_y, weights, graph.indices.T)

    def fused_bucketed_active(self, y, x, f_y, weights, bg) -> bool:
        """True iff __call__ on this BucketedGraph takes the fused per-edge
        route (mirrors _call_bucketed's dispatch)."""
        nonlinear = self.transform_type in ("nonlinear",
                                            "nonlinear_kernelonly")
        combined = (f_y is not None and not nonlinear
                    and bg.tgraph is not None and f_y.ndim == 2)
        return combined and self._use_fused_bucketed(y, x, f_y, weights, bg)

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

        if (combined and f_y.ndim == 2
                and self._use_fused_bucketed(y, x, f_y, weights, bg)):
            record_route("agno", "pallas-bucketed")
            out, reps = self._fused_bucketed(y, x, f_y, bg, num_samples)
            return (out, reps) if return_rep else out
        km = _km2_resolved(self.coef_layout) and combined
        record_route("agno", ("xla-bucketed-km2" if km else "xla-bucketed")
                     if combined else "xla-bucketed-plain")
        if return_rep:
            raise ValueError("return_rep requires the fused bucketed route "
                             "(probe with fused_bucketed_active first)")
        parts, offset = [], 0
        for graph in bg.buckets:
            nb = graph.indices.shape[-2]
            xs = x[offset:offset + nb]
            offset += nb
            if km:
                parts.append(self._folded_coef_km(y, graph, xs, weights))
            elif combined:
                parts.append(self._folded_coef(y, graph, xs, weights))
            else:
                parts.append(self.__call__(y, graph, x=xs, f_y=f_y,
                                           weights=weights))
        if km:
            return apply_bucketed_graph_transform_km(
                parts, f_y, bg, num_samples=num_samples)
        if combined:
            return apply_bucketed_graph_transform(parts, f_y, bg,
                                                  num_samples=num_samples)
        return jnp.concatenate(parts, axis=-2)
