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


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]                      # [Qt, D]
    k = k_ref[0]                      # [S, D]
    v = v_ref[0]                      # [S, D]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # [Qt, S]
    maxes = jnp.max(logits, axis=-1, keepdims=True)
    probs = jnp.exp(logits - maxes)
    denom = jnp.sum(probs, axis=-1, keepdims=True)
    probs = (probs / denom).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        probs, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _supported(seq: int, head_dim: int) -> bool:
    # K/V-resident single-pass kernel: keep K,V + scores in VMEM.
    return seq % 128 == 0 and head_dim % 8 == 0 and seq * head_dim <= 1 << 20


def flash_attention_gqa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        q_block: int = 256) -> jnp.ndarray:
    """Attention with grouped KV heads.

    q: [B, S, H, D]; k, v: [B, S, Hkv, D] with H a multiple of Hkv.
    Returns [B, S, H, D]. Falls back to the XLA einsum path for shapes the
    kernel doesn't cover. Differentiable: forward runs the Pallas kernel,
    backward recomputes through the XLA reference (flash backward kernel is
    a follow-up).
    """
    if not _supported(q.shape[1], q.shape[3]):
        from ...models.transformer import gqa_attention_xla

        return gqa_attention_xla(q, k, v)
    return _flash_diff(q, k, v, min(q_block, q.shape[1]))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_diff(q, k, v, q_block):
    return _flash_forward(q, k, v, q_block)


def _flash_fwd_rule(q, k, v, q_block):
    return _flash_forward(q, k, v, q_block), (q, k, v)


def _flash_bwd_rule(q_block, residuals, g):
    from ...models.transformer import gqa_attention_xla

    q, k, v = residuals
    _, vjp = jax.vjp(gqa_attention_xla, q, k, v)
    return vjp(g)


_flash_diff.defvjp(_flash_fwd_rule, _flash_bwd_rule)


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
