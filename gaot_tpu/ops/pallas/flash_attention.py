"""Pallas TPU attention kernel for the UViT processor.

Replaces torch's fused scaled_dot_product_attention (reference
src/model/layers/attn.py:114) on the latent-grid token sequence. GAOT's
processor sequences are short (a 64x64 grid at patch 2 → 1024 tokens; 3D
grids a few thousand), so K/V for one (batch, kv-head) fit comfortably in
VMEM and the kernel runs a single-pass softmax per query tile — two MXU
matmuls (QK^T and PV) with an fp32 softmax between, no HBM round-trip for
the [S, S] score matrix.

GQA is handled by the BlockSpec index maps: each (batch, q-head) program
reads its kv-head block directly, so grouped K/V are never materialized.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2E = 1.4426950408889634  # softmax via exp2 (cheaper than exp on the VPU)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]                      # [Qt, D]
    k = k_ref[0]                      # [S, D]
    v = v_ref[0]                      # [S, D]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (scale * _LOG2E)  # [Qt, S]
    maxes = jnp.max(logits, axis=-1, keepdims=True)
    probs = jnp.exp2(logits - maxes)
    denom = jnp.sum(probs, axis=-1, keepdims=True)
    probs = (probs * pl.reciprocal(denom, approx=False)).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        probs, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     *, scale: float):
    """Fully VMEM-resident attention backward for one (batch, q-head).

    Recomputes the softmax (standard flash backward), then
        dV = Pᵀ·dO,  dP = dO·Vᵀ,  dS = P∘(dP − rowsum(P∘dP)),
        dQ = scale·dS·K,  dK = scale·dSᵀ·Q.
    """
    q = q_ref[0]                      # [S, D]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (scale * _LOG2E)  # [S, S] fp32
    logits -= jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp2(logits)
    p *= pl.reciprocal(jnp.sum(p, axis=-1, keepdims=True),
                       approx=False)                         # [S, S] fp32
    pb = p.astype(v.dtype)
    # dv[j] = Σ_i P[i,j]·dO[i]
    dv_ref[0] = jax.lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    # dp[i,j] = dO[i]·V[j]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [S, S] fp32
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True)) * scale
    dsb = ds.astype(q.dtype)
    dq_ref[0] = jax.lax.dot_general(
        dsb, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        dsb, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _attn_bwd_tiled_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref,
                           dv_ref, dk_acc, dv_acc, *, scale: float):
    """Q-tiled attention backward for sequences too long for the
    fully-resident kernel (3D latent grids: S up to ~8k).

    Grid (bh, q_tiles): per q-tile recompute that tile's softmax rows
    (row-wise max/denominator are exact — softmax is row-local), emit dQ for
    the tile, and accumulate dK/dV across tiles in VMEM scratch.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]                      # [Qt, D]
    k = k_ref[0]                      # [S, D]
    v = v_ref[0]
    do = do_ref[0]                    # [Qt, D]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (scale * _LOG2E)  # [Qt, S]
    logits -= jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp2(logits)
    p *= pl.reciprocal(jnp.sum(p, axis=-1, keepdims=True), approx=False)
    pb = p.astype(v.dtype)
    dv_acc[:] += jax.lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True)) * scale
    dsb = ds.astype(q.dtype)
    dq_ref[0] = jax.lax.dot_general(
        dsb, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_acc[:] += jax.lax.dot_general(
        dsb, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _fin():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _supported(seq: int, head_dim: int) -> bool:
    # K/V-resident single-pass kernel: keep K,V + scores in VMEM.
    return seq % 128 == 0 and head_dim % 8 == 0 and seq * head_dim <= 1 << 20


_BWD_MONOLITHIC_MAX_S = 1024   # fully-resident backward (fastest, measured)
_BWD_TILED_MAX_S = 4096        # q-tiled backward for 3D grids


def _bwd_supported(seq: int, head_dim: int) -> bool:
    # Monolithic kernel holds two fp32 [S, S] buffers per program in VMEM
    # (~8 MB at S=1024); the tiled kernel covers longer sequences.
    return seq % 128 == 0 and head_dim % 8 == 0 and seq <= _BWD_TILED_MAX_S


def flash_attention_gqa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        q_block: int = 1024) -> jnp.ndarray:
    """Attention with grouped KV heads.

    q: [B, S, H, D]; k, v: [B, S, Hkv, D] with H a multiple of Hkv.
    Returns [B, S, H, D]. Falls back to the XLA einsum path for shapes the
    kernel doesn't cover. Differentiable: forward runs the Pallas flash
    kernel; backward runs the Pallas flash backward when the shape allows
    (S ≤ 1024), else recomputes through the XLA reference.
    """
    if not _supported(q.shape[1], q.shape[3]):
        from ...models.transformer import gqa_attention_xla

        return gqa_attention_xla(q, k, v)
    # The fp32 [Qt, S] logits tile must fit the ~16 MB scoped-VMEM budget.
    # Search downward in 128-row steps: _supported guarantees s % 128 == 0,
    # so this always terminates at a valid tile (halving could degenerate to
    # 1-row tiles for non-power-of-two S).
    s = q.shape[1]
    qb = min(q_block, s, max(128, (1 << 21) // s // 128 * 128))
    while s % qb:
        qb -= 128
    return _flash_diff(q, k, v, qb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_diff(q, k, v, q_block):
    return _flash_forward(q, k, v, q_block)


def _flash_fwd_rule(q, k, v, q_block):
    return _flash_forward(q, k, v, q_block), (q, k, v)


def _flash_bwd_rule(q_block, residuals, g):
    q, k, v = residuals
    if _bwd_supported(q.shape[1], q.shape[3]):
        return _flash_backward(q, k, v, g)
    from ...models.transformer import gqa_attention_xla

    _, vjp = jax.vjp(gqa_attention_xla, q, k, v)
    return vjp(g)


_flash_diff.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def _flash_backward(q, k, v, do):
    b, s, h, d = q.shape
    hkv = k.shape[2]
    group = h // hkv
    scale = 1.0 / (d ** 0.5)

    qh = q.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    kh = k.transpose(0, 2, 1, 3).reshape(b * hkv, s, d)
    vh = v.transpose(0, 2, 1, 3).reshape(b * hkv, s, d)
    doh = do.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    out_sds = jax.ShapeDtypeStruct((b * h, s, d), q.dtype)

    if s <= _BWD_MONOLITHIC_MAX_S:
        def kv_index(bh):
            return ((bh // h) * hkv + (bh % h) // group, 0, 0)

        q_spec = pl.BlockSpec((1, s, d), lambda bh: (bh, 0, 0),
                              memory_space=pltpu.VMEM)
        kv_spec = pl.BlockSpec((1, s, d), kv_index, memory_space=pltpu.VMEM)
        dq, dkp, dvp = pl.pallas_call(
            functools.partial(_attn_bwd_kernel, scale=scale),
            grid=(b * h,),
            in_specs=[q_spec, kv_spec, kv_spec, q_spec],
            out_specs=[q_spec, q_spec, q_spec],
            out_shape=[out_sds, out_sds, out_sds],
        )(qh, kh, vh, doh)
    else:
        # ~5 fp32 [Qt, S] tile buffers live at once (logits/p/dp/ds + casts);
        # keep them within the ~16 MB scoped-VMEM budget. 64-row steps:
        # s % 128 == 0 (checked by _bwd_supported) so qt=64 always divides s.
        qt = min(s, max(64, (1 << 18) // s // 64 * 64))
        while s % qt:
            qt -= 64

        def kv_index2(bh, j):
            return ((bh // h) * hkv + (bh % h) // group, 0, 0)

        qt_spec = pl.BlockSpec((1, qt, d), lambda bh, j: (bh, j, 0),
                               memory_space=pltpu.VMEM)
        kv_spec2 = pl.BlockSpec((1, s, d), kv_index2, memory_space=pltpu.VMEM)
        kvout_spec = pl.BlockSpec((1, s, d), lambda bh, j: (bh, 0, 0),
                                  memory_space=pltpu.VMEM)
        dq, dkp, dvp = pl.pallas_call(
            functools.partial(_attn_bwd_tiled_kernel, scale=scale),
            grid=(b * h, s // qt),
            in_specs=[qt_spec, kv_spec2, kv_spec2, qt_spec],
            out_specs=[qt_spec, kvout_spec, kvout_spec],
            out_shape=[out_sds, out_sds, out_sds],
            scratch_shapes=[pltpu.VMEM((s, d), jnp.float32),
                            pltpu.VMEM((s, d), jnp.float32)],
        )(qh, kh, vh, doh)

    dq = dq.reshape(b, h, s, d).transpose(0, 2, 1, 3)
    # dK/dV are computed per q-head; sum the per-group partials for GQA.
    dk = dkp.reshape(b, hkv, group, s, d).sum(axis=2).transpose(0, 2, 1, 3)
    dv = dvp.reshape(b, hkv, group, s, d).sum(axis=2).transpose(0, 2, 1, 3)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   q_block: int) -> jnp.ndarray:
    b, s, h, d = q.shape
    hkv = k.shape[2]
    assert h % hkv == 0
    group = h // hkv
    scale = 1.0 / (d ** 0.5)

    # Layout: heads-major so one program owns one (batch, head) slice.
    qh = q.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    kh = k.transpose(0, 2, 1, 3).reshape(b * hkv, s, d)
    vh = v.transpose(0, 2, 1, 3).reshape(b * hkv, s, d)

    def kv_index(bh, qs):
        # program bh = batch * h + head → kv row = batch * hkv + head // group
        return ((bh // h) * hkv + (bh % h) // group, 0, 0)

    grid = (b * h, s // q_block)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, d), lambda bh, qs: (bh, qs, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, d), lambda bh, qs: (bh, qs, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
    )(qh, kh, vh)
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)
