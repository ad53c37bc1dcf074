"""Fused per-edge AGNO pipeline (Pallas, TPU).

The flat vx AGNO transform (models/agno.py::_call_flat_km, replacing the
reference's per-sample eager chain src/model/layers/agno.py:188-271) used to
run as an XLA op sequence: gather neighbor coords [E, d], kernel-MLP matmuls
with [E, H] activations round-tripping HBM between layers, cosine attention +
masked softmax, three where/mul folding passes, then the Pallas
multiply-reduce. Measured on the 16k-node airfoil workload that chain cost
~35 ms/step, dominated not by FLOPs but by (a) [E, 2]-minor coordinate
gathers running at 1.8-20 GiB/s and (b) per-edge activation/layout traffic.

This module fuses everything after the single bulk-row feature gather into
ONE kernel with the per-edge activations resident in VMEM (SURVEY §7.4):

    gath[k, q, :] = f_aug[idx[k, q], :]        (outside; bulk row gather)
      where f_aug = [ f | src_coords ]          (coords ride free: [·, 64]
                                                 bf16 rows are lane-padded to
                                                 128 anyway)
    rep   = gath[..., c_f:c_f+d]                (lane slice, in VMEM)
    agg   = [rep ‖ dst_coords]                  (kernel-MLP input)
    kern  = MLP(agg)                            (MXU, activations in VMEM)
    scale = masked-softmax_K(cos(dst, rep))     (or 1/count for mean reduce)
    out[q] = Σ_k kern·scale·gath[..., :c_f]     (fp32 accumulator)

Layout discipline (what Mosaic can and cannot lower): every tensor keeps
queries in SUBLANES and channels in LANES throughout — [K, tq, C] blocks,
per-edge scalars as [K, tq, 1] lane-slices, the MLP on [K·tq, H] rows via
leading-dim collapse (the one reshape Mosaic supports natively). There are
NO lane↔sublane transposes in the kernels; the only layout copy in the whole
pipeline is the backward's k-major→edge-major coefficient swap, done by XLA
outside the kernel (the same copy the unfused K-major path pays).

The backward recomputes the activations in VMEM (cheaper to recompute than
to round-trip), accumulates dW/db in fp32 across the sequential grid, and
emits the per-edge coefficient for the transpose-graph d_f pass
(ops/gather_apply.py::_flat_df) — the one tensor that must exist in HBM
because d_f gathers it by edge index.

Scope: linear transform (kernel depends on coordinates only), cosine or no
attention, no quadrature weights — the configuration every GAOT recipe uses
(MAGNO never passes quadrature weights; dot_product attention keeps the XLA
path). Engaged only for bfloat16 compute on TPU; fp32 (the
convergence-parity configuration) keeps the exact XLA path.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)
_GELU_C = 0.044715


def _gelu_tanh(x):
    u = _SQRT_2_OVER_PI * (x + _GELU_C * x * x * x)
    return 0.5 * x * (1.0 + jnp.tanh(u))


def _gelu_tanh_grad(x):
    u = _SQRT_2_OVER_PI * (x + _GELU_C * x * x * x)
    t = jnp.tanh(u)
    du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _GELU_C * x * x)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du


def _layer0(rep3, dst_sub, w0, b0):
    """Kernel-MLP input layer as lane-broadcast outer products (fp32).

    The MLP input has A = 2d tiny channels (neighbor + query coords); a
    [K·tq, A] matrix would put A in the lane dim. Instead each input channel
    stays a [·, tq, 1] lane slice and the layer is an unrolled sum of
    rank-1 broadcasts against the [1, H] weight rows — pure VPU work.

    rep3: [K, tq, d] fp32; dst_sub: [tq, d] fp32; w0 ref [2d, H]; b0 ref
    [1, H]. Returns h3 [K, tq, H] fp32.
    """
    k, tq, d = rep3.shape
    h = jnp.broadcast_to(b0[0:1, :].astype(jnp.float32)[None],
                         (k, tq, w0.shape[1]))
    for a in range(d):
        h = h + rep3[:, :, a:a + 1] * w0[a:a + 1, :].astype(jnp.float32)[None]
        # Slice BEFORE adding the new axis: the combined [None, :, a:a+1]
        # pattern makes jnp emit a gather, which Mosaic cannot lower.
        dcol = dst_sub[:, a:a + 1][None]                     # [1, tq, 1]
        h = h + dcol * w0[d + a:d + a + 1, :].astype(jnp.float32)[None]
    return h


def _mlp_forward(ws, bs, rep3, dst_sub, compute_dtype, save_acts=False):
    """Kernel MLP; layer 0 via _layer0, later layers as [K·tq, H] MXU
    matmuls in the compute dtype with fp32 accumulation. Returns the
    pre-scale kernel output [K·tq, C] (compute dtype) and, if save_acts,
    the per-layer (pre-activation, gelu-output) pairs for the backward."""
    k, tq, _ = rep3.shape
    e = k * tq
    h3 = _layer0(rep3, dst_sub, ws[0], bs[0])
    pre = h3.reshape(e, -1).astype(compute_dtype)
    acts = []
    for li in range(1, len(ws)):
        if save_acts:
            acts.append(pre)
        z = _gelu_tanh(pre.astype(jnp.float32)).astype(compute_dtype)
        if save_acts:
            acts.append(z)
        pre = (jax.lax.dot_general(
            z, ws[li][...].astype(compute_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + bs[li][0:1, :].astype(jnp.float32)).astype(compute_dtype)
    return pre, acts


def _mask3(mask_blk, k):
    """[tq, K] float mask → [K, tq, 1] (leading-dim stack of lane slices)."""
    return jnp.concatenate([mask_blk[:, a:a + 1][None] for a in range(k)],
                           axis=0)


def _edge_scale(rep3, dst_sub, m3, use_attn):
    """Per-edge fold factor [K, tq, 1] (fp32): masked cosine softmax over K,
    or 1/count (mean reduce); zero on padded edges."""
    if use_attn:
        rn = jnp.sqrt(jnp.sum(rep3 * rep3, axis=2, keepdims=True))
        xn = jnp.sqrt(jnp.sum(dst_sub * dst_sub, axis=1, keepdims=True))
        dots = jnp.sum(rep3 * dst_sub[None], axis=2, keepdims=True)
        scores = dots / (jnp.maximum(xn[None], 1e-12)
                         * jnp.maximum(rn, 1e-12))
        scores = jnp.where(m3 > 0, scores, jnp.float32(-1e30))
        ex = jnp.exp(scores - jnp.max(scores, axis=0, keepdims=True)) * m3
        return ex / jnp.maximum(jnp.sum(ex, axis=0, keepdims=True), 1e-30)
    counts = jnp.sum(m3, axis=0, keepdims=True)
    return m3 / jnp.maximum(counts, 1.0)


def _recompute(dst_ref, mask_ref, gath_ref, ws, c_f, d, compute_dtype,
               use_attn, save_acts):
    g = gath_ref[...]
    k = g.shape[0]
    rep3 = g[:, :, c_f:c_f + d].astype(jnp.float32)
    dst_sub = dst_ref[...][:, :d].astype(jnp.float32)
    m3 = _mask3(mask_ref[...].astype(jnp.float32), k)
    scale3 = _edge_scale(rep3, dst_sub, m3, use_attn)
    kern, acts = _mlp_forward(ws[:len(ws) // 2], ws[len(ws) // 2:], rep3,
                              dst_sub, compute_dtype, save_acts=save_acts)
    return g, rep3, dst_sub, scale3, kern, acts


def _fwd_kernel(dst_ref, mask_ref, gath_ref, *rest,
                c_f, d, n_layers, use_attn, compute_dtype):
    wb = rest[:2 * n_layers]
    o_ref = rest[2 * n_layers]
    g, _, _, scale3, kern, _ = _recompute(
        dst_ref, mask_ref, gath_ref, wb, c_f, d, compute_dtype, use_attn,
        save_acts=False)
    k, tq, _ = g.shape
    coef3 = kern.reshape(k, tq, -1).astype(jnp.float32) * scale3
    o_ref[...] = jnp.sum(coef3 * g[:, :, :c_f].astype(jnp.float32),
                         axis=0).astype(o_ref.dtype)


def _bwd_kernel(dst_ref, mask_ref, gath_ref, dout_ref, *rest,
                c_f, d, n_layers, use_attn, compute_dtype):
    wb = rest[:2 * n_layers]
    outs = rest[2 * n_layers:]
    coef_ref = outs[0]
    dw_refs = outs[1:1 + n_layers]
    db_refs = outs[1 + n_layers:1 + 2 * n_layers]
    ws = [wb[i] for i in range(n_layers)]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in list(dw_refs) + list(db_refs):
            r[...] = jnp.zeros_like(r)

    g, rep3, dst_sub, scale3, kern, acts = _recompute(
        dst_ref, mask_ref, gath_ref, wb, c_f, d, compute_dtype, use_attn,
        save_acts=True)
    k, tq, _ = g.shape
    e = k * tq
    coef3 = kern.reshape(k, tq, -1).astype(jnp.float32) * scale3
    # k-major [K, tq, C] block; the wrapper's XLA swapaxes converts to the
    # edge-major (q·K + k) order the transpose-graph d_f gather expects.
    coef_ref[...] = coef3.astype(coef_ref.dtype)

    # d(kern)[k,q,c] = dout[q,c] · f_rows[k,q,c] · scale[k,q]
    grad = (dout_ref[...].astype(jnp.float32)[None]
            * g[:, :, :c_f].astype(jnp.float32) * scale3).reshape(e, -1)
    for li in range(n_layers - 1, 0, -1):
        z = acts[2 * (li - 1) + 1]                          # gelu output
        pre = acts[2 * (li - 1)].astype(jnp.float32)        # pre-activation
        dw_refs[li][...] += jax.lax.dot_general(
            z.astype(jnp.float32), grad, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db_refs[li][...] += jnp.sum(grad, axis=0, keepdims=True)
        dz = jax.lax.dot_general(
            grad.astype(compute_dtype), ws[li][...].astype(compute_dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        grad = dz * _gelu_tanh_grad(pre)
    rep_flat = rep3.reshape(e, d)
    dst_flat = jnp.broadcast_to(dst_sub[None], (k, tq, d)).reshape(e, d)
    rows = [jnp.sum(rep_flat[:, a:a + 1] * grad, axis=0, keepdims=True)
            for a in range(d)]
    rows += [jnp.sum(dst_flat[:, a:a + 1] * grad, axis=0, keepdims=True)
             for a in range(d)]
    dw_refs[0][...] += jnp.concatenate(rows, axis=0)
    db_refs[0][...] += jnp.sum(grad, axis=0, keepdims=True)


def _tile_q(q, per_row_bytes, budget=12 << 20, min_t=16):
    """Pick the Q-tile: whole Q if it fits the VMEM budget, else the largest
    tile under the budget — a 128-multiple when possible, else (deep-K
    buckets where 128 rows blow VMEM) sublane-aligned down to min_t. Q is
    never a LANE dim in any block — dst/out/mask carry it in sublanes and
    gath as the middle dim — so the tile only needs 8/16-row (fp32/bf16
    sublane) alignment; 128 stays preferred because the MXU matmuls run on
    [K·tq, H] rows. The budget is against the compiler's 16M scoped-vmem
    limit with headroom for the weight blocks."""
    if q * per_row_bytes <= budget:
        return q
    t = budget // max(per_row_bytes, 1)
    t = t // 128 * 128 if t >= 128 else t // min_t * min_t
    return t if t >= min_t else 0


def fused_supported(k, q, cg, c_f, d, n_layers, dtype) -> int:
    """Returns the q-tile size (0 = unsupported). Requires a lane-aligned
    feature width and a q-tiling that fits VMEM."""
    # f32 is accepted by the kernels (tests, debugging); the bf16-only POLICY
    # gate lives at the call site (models/agno.py) so the fp32 parity path
    # keeps the exact XLA numerics.
    if dtype not in (jnp.bfloat16, jnp.float32) or c_f % 8 != 0 or cg < c_f + d:
        return 0
    cg_pad = -(-cg // 128) * 128
    # Scoped-VMEM bytes per query row, CALIBRATED against the compiler's
    # stack accounting for the backward kernel (the larger of the two): the
    # analytic gath-block + fp32-activations model under-counted by ~2.4×
    # (measured 18.43M scoped at k=16, tq=128, n_layers=4 vs 7.5M modeled —
    # double-buffered grid blocks plus Mosaic temporaries).
    per_row = int((k * cg_pad * 2 + k * 128 * 4 * (n_layers + 3)) * 2.4)
    return _tile_q(q, per_row)


def _wb_arrays(ws, bs):
    """Weights as given; biases reshaped to (1, H) (2-D for VMEM blocks)."""
    return [jnp.asarray(w) for w in ws], [jnp.asarray(b).reshape(1, -1)
                                          for b in bs]


def _auto_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _pad_q(tq, dst_q, mask_q, gath, dout=None):
    """Pad the Q axis of all operands up to a tile boundary (padded queries
    carry mask 0 → scale 0 → zero output rows, sliced off by the caller)."""
    q = gath.shape[1]
    q_pad = -(-q // tq) * tq
    if q_pad == q:
        return dst_q, mask_q, gath, dout, q_pad
    pq = q_pad - q
    dst_q = jnp.pad(dst_q, ((0, pq), (0, 0)))
    mask_q = jnp.pad(mask_q, ((0, pq), (0, 0)))
    gath = jnp.pad(gath, ((0, 0), (0, pq), (0, 0)))
    if dout is not None:
        dout = jnp.pad(dout, ((0, pq), (0, 0)))
    return dst_q, mask_q, gath, dout, q_pad


def fused_agno_fwd(ws, bs, gath, dst_q, mask_q, *, c_f, d, use_attn,
                   interpret=None):
    """out[q, c] = Σ_k scale(k,q) · MLP(agg)(k,q,c) · gath[k,q,:c_f].

    ws/bs: kernel-MLP weights ([A, H], [H, H]..., [H, C]) and biases;
    gath: [K, Q, CG] gathered f_aug rows (coords at [c_f:c_f+d]);
    dst_q: [Q, d] query coords (q in sublanes — matches the kernels' layout
    discipline); mask_q: [Q, K] int8/bool.
    """
    k, q, cg = gath.shape
    n_layers = len(ws)
    tq = fused_supported(k, q, cg, c_f, d, n_layers, gath.dtype)
    assert tq > 0, (k, q, cg, gath.dtype)
    ws, bs = _wb_arrays(ws, bs)
    c_out = ws[-1].shape[1]
    dst_q, mask_q, gath, _, q_pad = _pad_q(tq, dst_q, mask_q, gath)
    kernel = functools.partial(
        _fwd_kernel, c_f=c_f, d=d, n_layers=n_layers, use_attn=use_attn,
        compute_dtype=gath.dtype)
    wb_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_layers)
    out = pl.pallas_call(
        kernel,
        grid=(q_pad // tq,),
        in_specs=[
            pl.BlockSpec((tq, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tq, cg), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ] + wb_specs,
        out_specs=pl.BlockSpec((tq, c_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q_pad, c_out), gath.dtype),
        interpret=_auto_interpret(interpret),
    )(dst_q, mask_q.astype(jnp.int8), gath, *ws, *bs)
    return out[:q] if q_pad != q else out


def fused_agno_bwd(ws, bs, gath, dst_q, mask_q, dout, *, c_f, d, use_attn,
                   interpret=None):
    """Backward companion. Recomputes the per-edge pipeline in VMEM; returns

      coef_e [Q·K, C]  — per-edge coefficient, edge-major (edge q·K + k):
                          the operand of the transpose-graph d_f gather;
      dws, dbs         — fp32 parameter cotangents (dbs shaped like bs).

    d_gath (the f-rows cotangent) is realized by the caller through the
    transpose graph; d_dst is not needed (coordinates are data).
    """
    k, q, cg = gath.shape
    n_layers = len(ws)
    tq = fused_supported(k, q, cg, c_f, d, n_layers, gath.dtype)
    assert tq > 0
    ws2, bs2 = _wb_arrays(ws, bs)
    c_out = ws2[-1].shape[1]
    dst_q, mask_q, gath, dout, q_pad = _pad_q(tq, dst_q, mask_q, gath, dout)
    kernel = functools.partial(
        _bwd_kernel, c_f=c_f, d=d, n_layers=n_layers, use_attn=use_attn,
        compute_dtype=gath.dtype)
    wb_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_layers)
    out_shapes = ([jax.ShapeDtypeStruct((k, q_pad, c_out), gath.dtype)]
                  + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws2]
                  + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs2])
    out_specs = ([pl.BlockSpec((k, tq, c_out), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(w.shape, lambda i, _s=w.shape: (0, 0),
                                 memory_space=pltpu.VMEM) for w in ws2]
                 + [pl.BlockSpec(b.shape, lambda i, _s=b.shape: (0, 0),
                                 memory_space=pltpu.VMEM) for b in bs2])
    outs = pl.pallas_call(
        kernel,
        grid=(q_pad // tq,),
        in_specs=[
            pl.BlockSpec((tq, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tq, cg), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, c_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + wb_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_auto_interpret(interpret),
    )(dst_q, mask_q.astype(jnp.int8), gath, dout, *ws2, *bs2)
    # k-major [K, Q, C] → edge-major (q·K + k): ONE XLA layout copy — the
    # same copy the unfused K-major path pays (gather_apply._km_bwd).
    coef_e = jnp.swapaxes(outs[0][:, :q], 0, 1).reshape(q * k, c_out)
    dws = tuple(outs[1:1 + n_layers])
    dbs = tuple(o.reshape(-1) for o in outs[1 + n_layers:])
    return coef_e, dws, dbs


def reference_fused_agno(ws, bs, gath, dst_q, mask_q, *, c_f, d, use_attn):
    """Pure-XLA mirror of the fused forward, matching its numerics
    (fp32 layer 0, compute-dtype MXU layers with fp32 accumulation,
    tanh GELU) — the test oracle and CPU fallback."""
    k, q, cg = gath.shape
    dtype = gath.dtype
    rep = gath[:, :, c_f:c_f + d].astype(jnp.float32)       # [K, Q, d]
    x = dst_q.astype(jnp.float32)                           # [Q, d]
    m = mask_q.T.astype(jnp.float32)                        # [K, Q]
    if use_attn:
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                             1e-12)
        rn = rep / jnp.maximum(jnp.linalg.norm(rep, axis=-1, keepdims=True),
                               1e-12)
        scores = jnp.sum(rn * xn[None], axis=-1)
        scores = jnp.where(m > 0, scores, -1e30)
        ex = jnp.exp(scores - jnp.max(scores, axis=0, keepdims=True)) * m
        scale = ex / jnp.maximum(jnp.sum(ex, axis=0, keepdims=True), 1e-30)
    else:
        scale = m / jnp.maximum(jnp.sum(m, axis=0, keepdims=True), 1.0)
    agg = jnp.concatenate(
        [rep, jnp.broadcast_to(x[None], rep.shape[:2] + (d,))],
        axis=-1).reshape(-1, 2 * d)
    pre = (jnp.dot(agg, jnp.asarray(ws[0]).astype(jnp.float32),
                   preferred_element_type=jnp.float32)
           + jnp.asarray(bs[0]).astype(jnp.float32)).astype(dtype)
    for li in range(1, len(ws)):
        z = _gelu_tanh(pre.astype(jnp.float32)).astype(dtype)
        pre = (jnp.dot(z, jnp.asarray(ws[li]).astype(dtype),
                       preferred_element_type=jnp.float32)
               + jnp.asarray(bs[li]).astype(jnp.float32)).astype(dtype)
    kern = pre.reshape(k, q, -1).astype(jnp.float32)
    coef = kern * scale[..., None]
    return jnp.sum(coef * gath[:, :, :c_f].astype(jnp.float32),
                   axis=0).astype(dtype)
