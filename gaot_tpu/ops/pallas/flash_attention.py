"""Pallas TPU attention kernel for the UViT processor.

Replaces torch's fused scaled_dot_product_attention (reference
src/model/layers/attn.py:114) on the latent-grid token sequence. GAOT's
processor sequences are short (a 64x64 grid at patch 2 → 1024 tokens; 3D
grids a few thousand), so K/V for one (batch, kv-head) fit comfortably in
VMEM and the kernel runs a single-pass softmax per query tile — two MXU
matmuls (QK^T and PV) with an fp32 softmax between, no HBM round-trip for
the [S, S] score matrix.

At GAOT's head_dim (32) the matmuls are lane-limited on the MXU, so the
kernels are VPU-(softmax-)bound; the design minimizes [S, S]-sized VPU
passes:

- forward: max → exp2, with the normalization deferred to the [Qt, D]
  output (out = (p̂·V)·recip(den)) instead of a [Qt, S] divide;
- backward: every per-row scale (1/den, the softmax-grad correction
  rowsum(P∘dP) = rowsum(dO∘O), and the logit scale) is folded into the
  [S, D]-sized operands dO and delta — the [S, S] domain sees only the
  softmax recompute (max → exp2) and one dS pass around five MXU matmuls.
  (Passing the forward LSE in as a skinny [S, 1] side input was measured
  SLOWER on v5e than recomputing max/den: per-(8,128)-tile DMA padding on
  column vectors outweighs two VPU passes.)

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
    acc = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                     # [Qt, D]
    # Normalization deferred out of the [Qt, S] domain.
    o_ref[0] = (acc * pl.reciprocal(denom, approx=False)).astype(o_ref.dtype)


def _attn_kernel_lse(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float):
    """Forward that also emits the base-2 log-sum-exp per row (for the
    kv-tiled long-sequence backward)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (scale * _LOG2E)
    maxes = jnp.max(logits, axis=-1, keepdims=True)
    probs = jnp.exp2(logits - maxes)
    denom = jnp.sum(probs, axis=-1, keepdims=True)
    acc = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (acc * pl.reciprocal(denom, approx=False)).astype(o_ref.dtype)
    lse_ref[0] = (maxes + jnp.log2(denom))[:, 0]


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   dq_acc, *, scale: float):
    """Long-S backward, dQ pass: grid (bh, i_q, j_kv), kv fastest.

    p is normalized directly from the forward lse (base-2), so no cross-tile
    softmax state is needed; delta = rowsum(dO∘O) is precomputed outside.
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (scale * _LOG2E)
    p = jnp.exp2(logits - lse_ref[0][:, None])              # normalized
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [qt, kt]
    ds = (p * (dp - delta_ref[0][:, None])).astype(k.dtype)
    dq_acc[:] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(2) - 1)
    def _fin():
        dq_ref[0] = (dq_acc[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float):
    """Long-S backward, dK/dV pass: grid (bh, j_kv, i_q), q fastest."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (scale * _LOG2E)
    p = jnp.exp2(logits - lse_ref[0][:, None])              # [qt, kt]
    pb = p.astype(v.dtype)
    dv_acc[:] += jax.lax.dot_general(
        pb, do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do_ref[0], v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = (p * (dp - delta_ref[0][:, None])).astype(q.dtype)
    dk_acc[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(2) - 1)
    def _fin():
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_backward_long(q, k, v, out, do, lse):
    """kv- AND q-tiled flash backward for S > _BWD_TILED_MAX_S.

    Two kernels (dQ with kv-fastest accumulation; dK/dV with q-fastest),
    each normalizing its [qt, kt] tile from the forward LSE. Recomputes the
    QK^T tiles twice — the price of clean single-block accumulation on the
    TPU grid model.
    """
    b, h, s, d = q.shape
    hkv = k.shape[1]
    group = h // hkv
    scale = 1.0 / (d ** 0.5)

    qh = q.reshape(b * h, s, d)
    kh = k.reshape(b * hkv, s, d)
    vh = v.reshape(b * hkv, s, d)
    doh = do.reshape(b * h, s, d)
    oh = out.reshape(b * h, s, d)
    # delta = rowsum(dO ∘ O): skinny [bh, S] precompute outside the kernels.
    delta = jnp.einsum("bsd,bsd->bs", doh.astype(jnp.float32),
                       oh.astype(jnp.float32))

    tile = 512
    while s % tile:
        tile //= 2

    def kv_head(bh):
        return (bh // h) * hkv + (bh % h) // group

    q_spec = pl.BlockSpec((1, tile, d), lambda bh, i, j: (bh, i, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, tile, d), lambda bh, i, j: (kv_head(bh), j, 0),
                          memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, tile), lambda bh, i, j: (bh, i),
                            memory_space=pltpu.VMEM)
    dq_spec = pl.BlockSpec((1, tile, d), lambda bh, i, j: (bh, i, 0),
                           memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale),
        grid=(b * h, s // tile, s // tile),
        in_specs=[q_spec, k_spec, k_spec, q_spec, lse_spec, lse_spec],
        out_specs=dq_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((tile, d), jnp.float32)],
    )(qh, kh, vh, doh, lse, delta)

    # dK/dV pass: one program per (bh, kv-tile), q streamed.
    qs_spec = pl.BlockSpec((1, tile, d), lambda bh, j, i: (bh, i, 0),
                           memory_space=pltpu.VMEM)
    ks_spec = pl.BlockSpec((1, tile, d), lambda bh, j, i: (kv_head(bh), j, 0),
                           memory_space=pltpu.VMEM)
    lse_s = pl.BlockSpec((1, tile), lambda bh, j, i: (bh, i),
                         memory_space=pltpu.VMEM)
    dkv_spec = pl.BlockSpec((1, tile, d), lambda bh, j, i: (bh, j, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((b * h, s, d), q.dtype)
    dkp, dvp = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale),
        grid=(b * h, s // tile, s // tile),
        in_specs=[qs_spec, ks_spec, ks_spec, qs_spec, lse_s, lse_s],
        out_specs=[dkv_spec, dkv_spec],
        out_shape=[out_sds, out_sds],
        scratch_shapes=[pltpu.VMEM((tile, d), jnp.float32),
                        pltpu.VMEM((tile, d), jnp.float32)],
    )(qh, kh, vh, doh, lse, delta)

    dq = dq.reshape(b, h, s, d)
    dk = dkp.reshape(b, hkv, group, s, d).sum(axis=2)
    dv = dvp.reshape(b, hkv, group, s, d).sum(axis=2)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def _bwd_core(q, k, v, do, o, scale):
    """Shared backward math for one q-tile against full K/V.

    Recomputes the row softmax (max → exp2, unnormalized p̂) and folds every
    per-row scale into [*, D]-sized operands:
        dV  = p̂ᵀ·(dO/den),
        dP′ = (scale·dO/den)·Vᵀ,   δ′ = scale·rowsum(dO∘O)/den,
        dS  = p̂∘(dP′ − δ′),        dQ = dS·K,   dK/dV partials for caller.
    rowsum(P∘dP) = rowsum(dO∘O) because O = P·V (standard flash backward),
    so no [S, S]-sized correction pass is needed.
    """
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (scale * _LOG2E)  # [Qt, S] fp32
    logits -= jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp2(logits)                                        # unnormalized
    pb = p.astype(v.dtype)
    inv = pl.reciprocal(jnp.sum(p, axis=-1, keepdims=True),
                        approx=False)                           # [Qt, 1]
    do32 = do.astype(jnp.float32)
    o32 = o.astype(jnp.float32)
    delta = jnp.sum(do32 * o32, axis=-1, keepdims=True) * (inv * scale)
    do_n = (do32 * inv).astype(v.dtype)                         # dO/den
    dv_part = jax.lax.dot_general(
        pb, do_n, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                     # [S, D]
    do_s = (do32 * (inv * scale)).astype(v.dtype)
    dp = jax.lax.dot_general(
        do_s, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                     # [Qt, S] fp32
    dsb = (p * (dp - delta)).astype(q.dtype)
    dq = jax.lax.dot_general(
        dsb, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk_part = jax.lax.dot_general(
        dsb, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return dq, dk_part, dv_part


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, o_ref,
                     dq_ref, dk_ref, dv_ref, *, scale: float):
    """Fully VMEM-resident attention backward for one (batch, q-head)."""
    dq, dk_part, dv_part = _bwd_core(q_ref[0], k_ref[0], v_ref[0],
                                     do_ref[0], o_ref[0], scale)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk_part.astype(dk_ref.dtype)
    dv_ref[0] = dv_part.astype(dv_ref.dtype)


def _attn_bwd_tiled_kernel(q_ref, k_ref, v_ref, do_ref, o_ref,
                           dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                           *, scale: float):
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

    dq, dk_part, dv_part = _bwd_core(q_ref[0], k_ref[0], v_ref[0],
                                     do_ref[0], o_ref[0], scale)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_acc[:] += dk_part
    dv_acc[:] += dv_part

    @pl.when(j == pl.num_programs(1) - 1)
    def _fin():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _supported(seq: int, head_dim: int) -> bool:
    # K/V-resident single-pass kernel: keep K,V + scores in VMEM.
    return seq % 128 == 0 and head_dim % 8 == 0 and seq * head_dim <= 1 << 20


_BWD_MONOLITHIC_MAX_S = 1024   # fully-resident backward (fastest, measured)
_BWD_TILED_MAX_S = 4096        # q-tiled backward (K/V fully resident)
# Beyond that, the two-kernel LSE backward tiles BOTH axes (64^3-grid
# patch-2 regimes: S up to 32k).


def _bwd_supported(seq: int, head_dim: int) -> bool:
    return seq % 128 == 0 and head_dim % 8 == 0 and seq * head_dim <= 1 << 20


def flash_attention_gqa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        q_block: int = 1024) -> jnp.ndarray:
    """Attention with grouped KV heads (sequence-major convenience wrapper).

    q: [B, S, H, D]; k, v: [B, S, Hkv, D] with H a multiple of Hkv.
    Returns [B, S, H, D]. Falls back to the XLA einsum path for shapes the
    kernel doesn't cover. Prefer flash_attention_gqa_hm: this wrapper pays
    explicit head transposes on every operand.
    """
    if not _supported(q.shape[1], q.shape[3]):
        from ...models.transformer import gqa_attention_xla

        return gqa_attention_xla(q, k, v)
    out = flash_attention_gqa_hm(q.transpose(0, 2, 1, 3),
                                 k.transpose(0, 2, 1, 3),
                                 v.transpose(0, 2, 1, 3), q_block)
    return out.transpose(0, 2, 1, 3)


def flash_attention_gqa_hm(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           q_block: int = 1024) -> jnp.ndarray:
    """Heads-major flash attention with grouped KV heads.

    q: [B, H, S, D]; k, v: [B, Hkv, S, D]. Returns [B, H, S, D]. This is
    the kernels' native layout, so callers already holding heads-major
    tensors pay no [B, S, H, D] transposes. (An einsum projection emitting
    this layout directly was measured 4% slower END TO END than Dense +
    XLA's layout copies — backward layout propagation — so the transformer
    keeps the seq-major wrapper below.) Differentiable: the backward runs the Pallas
    flash backward when the shape allows (S ≤ 4096 monolithic/q-tiled,
    longer via the LSE two-kernel path), else recomputes through XLA.
    """
    s = q.shape[2]
    if not _supported(s, q.shape[3]):
        from ...models.transformer import gqa_attention_xla

        out = gqa_attention_xla(q.transpose(0, 2, 1, 3),
                                k.transpose(0, 2, 1, 3),
                                v.transpose(0, 2, 1, 3))
        return out.transpose(0, 2, 1, 3)
    # The fp32 [Qt, S] logits tile must fit the ~16 MB scoped-VMEM budget.
    # Search downward in 128-row steps: _supported guarantees s % 128 == 0,
    # so this always terminates at a valid tile (halving could degenerate to
    # 1-row tiles for non-power-of-two S).
    qb = min(q_block, s, max(128, (1 << 21) // s // 128 * 128))
    while s % qb:
        qb -= 128
    return _flash_diff(q, k, v, qb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_diff(q, k, v, q_block):
    return _flash_forward(q, k, v, q_block)


def _flash_fwd_rule(q, k, v, q_block):
    if q.shape[2] > _BWD_TILED_MAX_S and _bwd_supported(q.shape[2], q.shape[3]):
        # Long sequences: emit the log-sum-exp alongside the output so the
        # kv-tiled backward can normalize each tile locally.
        out, lse = _flash_forward(q, k, v, q_block, with_lse=True)
        return out, (q, k, v, out, lse)
    out = _flash_forward(q, k, v, q_block)
    return out, (q, k, v, out, None)


def _flash_bwd_rule(q_block, residuals, g):
    q, k, v, out, lse = residuals
    s = q.shape[2]
    if lse is not None:
        return _flash_backward_long(q, k, v, out, g, lse)
    if _bwd_supported(s, q.shape[3]) and s <= _BWD_TILED_MAX_S:
        return _flash_backward(q, k, v, out, g)
    from ...models.transformer import gqa_attention_xla

    def _xla_hm(qx, kx, vx):
        o = gqa_attention_xla(qx.transpose(0, 2, 1, 3),
                              kx.transpose(0, 2, 1, 3),
                              vx.transpose(0, 2, 1, 3))
        return o.transpose(0, 2, 1, 3)

    _, vjp = jax.vjp(_xla_hm, q, k, v)
    return vjp(g)


_flash_diff.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def _flash_backward(q, k, v, out, do):
    b, h, s, d = q.shape
    hkv = k.shape[1]
    group = h // hkv
    scale = 1.0 / (d ** 0.5)

    qh = q.reshape(b * h, s, d)
    kh = k.reshape(b * hkv, s, d)
    vh = v.reshape(b * hkv, s, d)
    doh = do.reshape(b * h, s, d)
    oh = out.reshape(b * h, s, d)
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
            in_specs=[q_spec, kv_spec, kv_spec, q_spec, q_spec],
            out_specs=[q_spec, q_spec, q_spec],
            out_shape=[out_sds, out_sds, out_sds],
        )(qh, kh, vh, doh, oh)
    else:
        # ~4 fp32 [Qt, S] tile buffers live at once (logits/p/dp/ds reuse);
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
            in_specs=[qt_spec, kv_spec2, kv_spec2, qt_spec, qt_spec],
            out_specs=[qt_spec, kvout_spec, kvout_spec],
            out_shape=[out_sds, out_sds, out_sds],
            scratch_shapes=[pltpu.VMEM((s, d), jnp.float32),
                            pltpu.VMEM((s, d), jnp.float32)],
        )(qh, kh, vh, doh, oh)

    dq = dq.reshape(b, h, s, d)
    # dK/dV are computed per q-head; sum the per-group partials for GQA.
    dk = dkp.reshape(b, hkv, group, s, d).sum(axis=2)
    dv = dvp.reshape(b, hkv, group, s, d).sum(axis=2)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   q_block: int, with_lse: bool = False):
    b, h, s, d = q.shape
    hkv = k.shape[1]
    assert h % hkv == 0
    group = h // hkv
    scale = 1.0 / (d ** 0.5)

    # Heads-major: one program owns one (batch, head) slice; the reshapes
    # from [B, H, S, D] are free.
    qh = q.reshape(b * h, s, d)
    kh = k.reshape(b * hkv, s, d)
    vh = v.reshape(b * hkv, s, d)

    def kv_index(bh, qs):
        # program bh = batch * h + head → kv row = batch * hkv + head // group
        return ((bh // h) * hkv + (bh % h) // group, 0, 0)

    grid = (b * h, s // q_block)
    in_specs = [
        pl.BlockSpec((1, q_block, d), lambda bh, qs: (bh, qs, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s, d), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s, d), kv_index, memory_space=pltpu.VMEM),
    ]
    o_spec = pl.BlockSpec((1, q_block, d), lambda bh, qs: (bh, qs, 0),
                          memory_space=pltpu.VMEM)
    if with_lse:
        out, lse = pl.pallas_call(
            functools.partial(_attn_kernel_lse, scale=scale),
            grid=grid,
            in_specs=in_specs,
            out_specs=[o_spec,
                       pl.BlockSpec((1, q_block), lambda bh, qs: (bh, qs),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
                       jax.ShapeDtypeStruct((b * h, s), jnp.float32)],
        )(qh, kh, vh)
        return out.reshape(b, h, s, d), lse
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
    )(qh, kh, vh)
    return out.reshape(b, h, s, d)
