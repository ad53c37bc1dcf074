"""UViT transformer processor (Flax).

Re-design of the reference ViT processor (src/model/layers/attn.py:43-317)
for TPU:
- grouped-query attention is computed by *grouping* query heads against their
  KV head via einsum instead of repeat_interleave-ing K/V (reference lines
  102-104) — no materialized copies, MXU-shaped contractions throughout;
- softmax runs in float32 regardless of the compute dtype;
- RoPE is a small closed-form implementation (replacing the external
  rotary-embedding-torch dependency, reference lines 75-76, 106-108);
- the attention backend is pluggable ('xla' einsum or a Pallas flash kernel).

Structure matches the reference: pre-RMSNorm blocks with SwiGLU FFNs and
UViT long-range skip connections (encoder → decoder skip-concat + proj).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..core.config import TransformerConfig
from ..parallel.spatial import shard_queries
from .mlp import ConditionedNorm


_DROPOUT_BYPASS_WARNED = False


def _warn_dropout_bypass_once():
    """One log line when attention dropout forces the XLA path on TPU —
    without it a config that merely enables atten_dropout silently loses
    the ~3x Pallas flash kernel."""
    global _DROPOUT_BYPASS_WARNED
    if not _DROPOUT_BYPASS_WARNED:
        _DROPOUT_BYPASS_WARNED = True
        print("[gaot_tpu] atten_dropout > 0: Pallas flash attention has no "
              "dropout support; using the XLA attention path (slower). Set "
              "transformer.atten_dropout=0 to re-enable the fused kernel.",
              flush=True)


class RMSNorm(nn.Module):
    """Root-mean-square LayerNorm (reference src/model/layers/attn.py:161-172)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        normed = x32 * jnp.reciprocal(
            jnp.sqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + self.eps))
        # Scale in fp32, then return the input dtype: multiplying the bf16
        # normed value by the fp32 weight would upcast the whole residual
        # stream (and everything downstream) to fp32.
        return (normed * weight).astype(x.dtype)


def apply_rope(x: jnp.ndarray, base: float = 10000.0) -> jnp.ndarray:
    """Rotary positional embedding over the sequence axis.

    x: [batch, seq, heads, head_dim]. Standard 1D RoPE with positions
    0..seq-1 (the reference's RotaryEmbedding.rotate_queries_or_keys also uses
    implicit sequence positions; src/model/layers/attn.py:106-108).
    """
    _, seq, _, head_dim = x.shape
    half = head_dim // 2
    freqs = 1.0 / (base ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = jnp.arange(seq, dtype=jnp.float32)[:, None] * freqs[None, :]  # [seq, half]
    cos = jnp.cos(angles)[None, :, None, :]
    sin = jnp.sin(angles)[None, :, None, :]
    x1, x2 = x[..., :half], x[..., half:2 * half]
    rotated = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    if head_dim % 2:
        rotated = jnp.concatenate([rotated, x[..., 2 * half:]], axis=-1)
    return rotated.astype(x.dtype)


def gqa_attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      dropout_rate: float = 0.0,
                      deterministic: bool = True,
                      dropout_rng=None) -> jnp.ndarray:
    """Grouped-query attention via einsum.

    q: [B, S, H, D]; k, v: [B, S, Hkv, D] with H = G * Hkv. Queries are
    reshaped to [B, S, Hkv, G, D] so each KV head serves its G query heads in
    one batched contraction — no K/V duplication in memory.
    """
    b, s, h, d = q.shape
    hkv = k.shape[2]
    g = h // hkv
    q = q.reshape(b, s, hkv, g, d)
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=jnp.float32))
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    weights = nn.softmax(logits.astype(jnp.float32), axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        import jax

        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    weights = weights.astype(v.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", weights, v,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, s, h, d).astype(v.dtype)


class GroupQueryAttention(nn.Module):
    """GQA attention block (reference GroupQueryFlashAttention, attn.py:43-128)."""

    hidden_size: int
    num_heads: int = 8
    num_kv_heads: int = 8
    use_conditional_norm: bool = False
    cond_norm_hidden_size: int = 4
    atten_dropout: float = 0.0
    positional_embedding: str = "absolute"
    backend: str = "auto"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, condition: Optional[jnp.ndarray] = None,
                 use_rope: bool = False, deterministic: bool = True) -> jnp.ndarray:
        assert self.hidden_size % self.num_heads == 0
        assert self.num_heads % self.num_kv_heads == 0
        head_dim = self.hidden_size // self.num_heads
        kv_hidden = head_dim * self.num_kv_heads
        input_size = x.shape[-1]

        if self.use_conditional_norm:
            x = ConditionedNorm(input_size, self.cond_norm_hidden_size,
                                dtype=self.dtype, name="correction")(condition, x)

        b, s, _ = x.shape
        q = nn.Dense(self.hidden_size, use_bias=False, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(kv_hidden, use_bias=False, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(kv_hidden, use_bias=False, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, s, self.num_heads, head_dim)
        k = k.reshape(b, s, self.num_kv_heads, head_dim)
        v = v.reshape(b, s, self.num_kv_heads, head_dim)

        if use_rope:
            q = apply_rope(q)
            k = apply_rope(k)

        dropout_rng = None
        if self.atten_dropout > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")

        # Measurement/test override: GAOT_ATTN_BACKEND forces the backend
        # regardless of config (read at trace time — bench.py re-lowers the
        # step with 'xla' so cost_analysis can count attention FLOPs that
        # are invisible inside the Pallas custom call).
        import os

        backend = os.environ.get("GAOT_ATTN_BACKEND", self.backend)
        if backend == "auto":
            # The Pallas flash kernel (fwd+bwd, no HBM [S,S] round-trip) is
            # ~3x faster than the einsum path on TPU at GAOT's sequence
            # lengths; it has no dropout support, so route through XLA when
            # attention dropout is active.
            import jax

            on_tpu = jax.default_backend() == "tpu"
            backend = "pallas" if on_tpu and dropout_rng is None else "xla"
            if on_tpu and dropout_rng is not None:
                _warn_dropout_bypass_once()
        from ..utils.routing import record_route
        record_route("attn", backend)
        if backend == "pallas":
            from ..ops.pallas.flash_attention import flash_attention_gqa

            out = flash_attention_gqa(q, k, v)
        else:
            out = gqa_attention_xla(q, k, v, self.atten_dropout,
                                    deterministic, dropout_rng)
        out = out.reshape(b, s, self.hidden_size)
        return nn.Dense(input_size, use_bias=False, dtype=self.dtype, name="o_proj")(out)


class FFN(nn.Module):
    """SwiGLU feed-forward (reference attn.py:133-156)."""

    ffn_hidden_size: int
    use_conditional_norm: bool = False
    cond_norm_hidden_size: int = 4
    dtype: Optional[jnp.dtype] = None
    fused: str = "auto"     # config field transformer.fused_ffn;
                            # GAOT_FUSED_FFN env var overrides

    @nn.compact
    def __call__(self, x: jnp.ndarray, condition: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from ..utils.routing import record_route

        input_size = x.shape[-1]
        w1 = nn.Dense(self.ffn_hidden_size, use_bias=False, dtype=self.dtype, name="w1")
        w3 = nn.Dense(self.ffn_hidden_size, use_bias=False, dtype=self.dtype, name="w3")
        w2 = nn.Dense(input_size, use_bias=False, dtype=self.dtype, name="w2")
        if self._use_fused(x):
            record_route("ffn", "pallas")
            out = self._fused(x, w1, w3, w2)
        else:
            record_route("ffn", "xla")
            out = w2(nn.silu(w1(x)) * w3(x))
        if self.use_conditional_norm:
            out = ConditionedNorm(input_size, self.cond_norm_hidden_size,
                                  dtype=self.dtype, name="correction")(condition, out)
        return out

    def _use_fused(self, x) -> bool:
        """Route to the fused SwiGLU kernel (ops/pallas/fused_ffn.py) for
        bf16 compute on TPU — the XLA path materializes the [R, 4·hidden]
        intermediates in HBM (measured HBM-bound on the fx flagship). fp32
        (the convergence-parity configuration) keeps the exact XLA path.
        Mode comes from the `fused` field (config transformer.fused_ffn);
        GAOT_FUSED_FFN=0/1 overrides."""
        import jax

        from ..utils.routing import resolve_mode

        mode = resolve_mode("GAOT_FUSED_FFN", self.fused)
        if mode == "off":
            return False
        if mode != "on" and not (jax.default_backend() == "tpu"
                                 and self.dtype == jnp.bfloat16
                                 and x.dtype == jnp.bfloat16):
            return False
        from ..ops.pallas.fused_ffn import supported

        r = 1
        for s in x.shape[:-1]:
            r *= s
        return supported(r, x.shape[-1], self.ffn_hidden_size, x.dtype) > 0

    def _fused(self, x, w1, w3, w2):
        from ..ops.pallas.fused_ffn import fused_ffn

        # Materialize the Dense params (the dummy 1-row calls only create/
        # look up the flax variables; XLA dead-code-eliminates the compute).
        dummy = x.reshape(-1, x.shape[-1])[:1]
        w2(nn.silu(w1(dummy)) * w3(dummy))
        k1 = w1.variables["params"]["kernel"].astype(x.dtype)
        k3 = w3.variables["params"]["kernel"].astype(x.dtype)
        k2 = w2.variables["params"]["kernel"].astype(x.dtype)
        out = fused_ffn(x.reshape(-1, x.shape[-1]), k1, k3, k2)
        return out.reshape(x.shape)


class TransformerBlock(nn.Module):
    """Pre-norm block with optional UViT skip input (reference attn.py:177-233)."""

    config: TransformerConfig
    skip_connection: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, condition: Optional[jnp.ndarray] = None,
                 use_rope: bool = False, skip: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        if self.skip_connection and skip is not None:
            x = nn.Dense(x.shape[-1], dtype=self.dtype, name="skip_proj")(
                jnp.concatenate([x, skip], axis=-1))

        h = RMSNorm(cfg.norm_eps, name="attn_norm")(x) if cfg.use_attn_norm else x
        h = x + GroupQueryAttention(
            hidden_size=cfg.hidden_size,
            num_heads=cfg.attn_config.num_heads,
            num_kv_heads=cfg.attn_config.num_kv_heads,
            use_conditional_norm=cfg.attn_config.use_conditional_norm,
            cond_norm_hidden_size=cfg.attn_config.cond_norm_hidden_size,
            atten_dropout=cfg.attn_config.atten_dropout,
            positional_embedding=cfg.positional_embedding,
            backend=cfg.attn_backend,
            dtype=self.dtype,
            name="attn",
        )(h, condition=condition, use_rope=use_rope, deterministic=deterministic)
        # NOTE: the reference's FFN residual branches off the NORMED
        # activation — out = norm(h) + ffn(norm(h)) — not the pre-norm h
        # (reference attn.py:231-233). Reproduced exactly for weight-level
        # parity.
        h = RMSNorm(cfg.norm_eps, name="ffn_norm")(h) if cfg.use_ffn_norm else h
        out = h + FFN(
            ffn_hidden_size=cfg.hidden_size * cfg.ffn_multiplier,
            use_conditional_norm=cfg.attn_config.use_conditional_norm,
            cond_norm_hidden_size=cfg.attn_config.cond_norm_hidden_size,
            dtype=self.dtype,
            fused=cfg.fused_ffn,
            name="ffn",
        )(h, condition=condition)
        # Spatial parallelism: keep tokens sharded over 'model' between
        # blocks (attention internally all-gathers K/V); no-op by default.
        return shard_queries(out)


class Transformer(nn.Module):
    """UViT encoder/middle/decoder stack with long-range skips
    (reference attn.py:238-317)."""

    output_size: int
    config: TransformerConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, condition: Optional[jnp.ndarray] = None,
                 use_rope: bool = False, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        input_size = x.shape[-1]
        working = cfg.hidden_size if input_size != cfg.hidden_size else input_size
        if input_size != cfg.hidden_size:
            x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="input_proj")(x)

        num_enc = cfg.num_layers // 2
        num_dec = cfg.num_layers // 2
        has_middle = cfg.num_layers % 2 == 1

        skips = []
        for i in range(num_enc):
            x = TransformerBlock(cfg, dtype=self.dtype, name=f"encoder_{i}")(
                x, condition=condition, use_rope=use_rope, deterministic=deterministic)
            skips.append(x)
        if has_middle:
            x = TransformerBlock(cfg, dtype=self.dtype, name="middle")(
                x, condition=condition, use_rope=use_rope, deterministic=deterministic)
        for i in range(num_dec):
            skip = skips.pop() if cfg.use_long_range_skip else None
            x = TransformerBlock(cfg, skip_connection=True, dtype=self.dtype,
                                 name=f"decoder_{i}")(
                x, condition=condition, use_rope=use_rope, skip=skip,
                deterministic=deterministic)

        if working != self.output_size:
            x = nn.Dense(self.output_size, dtype=self.dtype, name="output_proj")(x)
        return x
