"""Transformer processor tests: GQA grouping correctness, RoPE norm
preservation, UViT structure, conditional norm."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaot_tpu.core.config import AttentionConfig, TransformerConfig
from gaot_tpu.models.transformer import (
    RMSNorm,
    Transformer,
    apply_rope,
    gqa_attention_xla,
)


def _mha_reference(q, k, v):
    """Plain full multi-head attention in NumPy (softmax per head)."""
    b, s, h, d = q.shape
    out = np.zeros_like(q)
    for bi in range(b):
        for hi in range(h):
            logits = q[bi, :, hi] @ k[bi, :, hi].T / np.sqrt(d)
            w = np.exp(logits - logits.max(-1, keepdims=True))
            w = w / w.sum(-1, keepdims=True)
            out[bi, :, hi] = w @ v[bi, :, hi]
    return out


def test_gqa_equals_mha_when_heads_match():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(2, 10, 4, 8)).astype(np.float32)
    k = rng.normal(size=(2, 10, 4, 8)).astype(np.float32)
    v = rng.normal(size=(2, 10, 4, 8)).astype(np.float32)
    got = np.asarray(gqa_attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    want = _mha_reference(q, k, v)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gqa_grouping_equals_repeated_kv():
    """GQA with Hkv < H must equal full MHA with K/V repeated per group
    (the reference's repeat_interleave formulation, attn.py:102-104)."""
    rng = np.random.default_rng(1)
    b, s, h, hkv, d = 2, 6, 8, 2, 4
    q = rng.normal(size=(b, s, h, d)).astype(np.float32)
    k = rng.normal(size=(b, s, hkv, d)).astype(np.float32)
    v = rng.normal(size=(b, s, hkv, d)).astype(np.float32)
    got = np.asarray(gqa_attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    k_rep = np.repeat(k, h // hkv, axis=2)
    v_rep = np.repeat(v, h // hkv, axis=2)
    want = _mha_reference(q, k_rep, v_rep)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rope_preserves_norm_and_relative_phase():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 16, 2, 8)).astype(np.float32))
    r = apply_rope(x)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(r), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5)
    # position 0 is unrotated
    np.testing.assert_allclose(np.asarray(r)[:, 0], np.asarray(x)[:, 0], rtol=1e-6)


def test_rmsnorm():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32) * 3)
    model = RMSNorm()
    params = model.init(jax.random.key(0), x)
    out = np.asarray(model.apply(params, x))
    xn = np.asarray(x)
    want = xn / np.sqrt((xn ** 2).mean(-1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


def _run_transformer(num_layers, seq=8, width=32, **kw):
    cfg = TransformerConfig(hidden_size=width, num_layers=num_layers,
                            patch_size=2, attn_config=AttentionConfig(
                                num_heads=4, num_kv_heads=2, **kw))
    model = Transformer(output_size=width, config=cfg)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, seq, width)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    return model, params, x


@pytest.mark.slow
def test_transformer_shapes_odd_and_even_layers():
    for n in [1, 2, 3, 4, 5]:
        model, params, x = _run_transformer(n)
        out = model.apply(params, x)
        assert out.shape == x.shape
        # encoder/middle/decoder structure
        names = set(params["params"].keys())
        assert ("middle" in names) == (n % 2 == 1)
        assert sum(k.startswith("encoder_") for k in names) == n // 2
        assert sum(k.startswith("decoder_") for k in names) == n // 2


def test_transformer_conditional_norm():
    cfg = TransformerConfig(hidden_size=32, num_layers=2, attn_config=AttentionConfig(
        num_heads=4, num_kv_heads=4, use_conditional_norm=True))
    model = Transformer(output_size=32, config=cfg)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 8, 32)).astype(np.float32))
    c = jnp.ones((2, 1), dtype=jnp.float32)
    params = model.init(jax.random.key(0), x, condition=c)
    out1 = model.apply(params, x, condition=c)
    out2 = model.apply(params, x, condition=2.0 * c)
    assert out1.shape == x.shape
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_transformer_input_output_projection():
    cfg = TransformerConfig(hidden_size=32, num_layers=2)
    model = Transformer(output_size=48, config=cfg)
    x = jnp.asarray(np.random.default_rng(6).normal(size=(2, 8, 24)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 8, 48)
