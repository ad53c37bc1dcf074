"""Fused SwiGLU FFN kernel (ops/pallas/fused_ffn.py) vs the XLA oracle.

Runs the Pallas kernels in interpreter mode on CPU: forward against
reference_fused_ffn, backward (dx, dW1/dW3/dW2) against jax.grad of the
oracle, plus the FFN-module routing (GAOT_FUSED_FFN=1 forces the kernel;
results must match the module's plain XLA path).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaot_tpu.ops.pallas.fused_ffn import (
    _ffn_bwd_call,
    _ffn_call,
    reference_fused_ffn,
    supported,
)


def _setup(r=200, m=128, f=256, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    cast = lambda a: jnp.asarray(a, dtype)
    x = cast(rng.normal(size=(r, m)) * 0.5)
    w1 = cast(rng.normal(size=(m, f)) * (1.0 / np.sqrt(m)))
    w3 = cast(rng.normal(size=(m, f)) * (1.0 / np.sqrt(m)))
    w2 = cast(rng.normal(size=(f, m)) * (1.0 / np.sqrt(f)))
    return x, w1, w3, w2


def test_supported_gate():
    assert supported(65536, 256, 1024, jnp.bfloat16) > 0
    assert supported(100, 256, 1024, jnp.float32) > 0
    assert supported(100, 200, 1024, jnp.float32) == 0    # lanes
    assert supported(100, 256, 1000, jnp.float32) == 0
    assert supported(100, 256, 1024, jnp.int32) == 0


def test_forward_matches_oracle():
    x, w1, w3, w2 = _setup()
    out = _ffn_call(x, w1, w3, w2, interpret=True)
    ref = reference_fused_ffn(x, w1, w3, w2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_forward_row_padding():
    # r=200 is not a multiple of the 128-row tile: exercises the pad path.
    x, w1, w3, w2 = _setup(r=200)
    out = _ffn_call(x, w1, w3, w2, interpret=True)
    assert out.shape == (200, 128)
    ref = reference_fused_ffn(x, w1, w3, w2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_backward_matches_oracle():
    x, w1, w3, w2 = _setup()
    rng = np.random.default_rng(1)
    dout = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    dx, dw1, dw3, dw2 = _ffn_bwd_call(x, w1, w3, w2, dout, interpret=True)

    def loss(x, w1, w3, w2):
        return jnp.sum(reference_fused_ffn(x, w1, w3, w2) * dout)

    gx, g1, g3, g2 = jax.grad(loss, argnums=(0, 1, 2, 3))(x, w1, w3, w2)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(gx),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw1), np.asarray(g1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw3), np.asarray(g3),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw2), np.asarray(g2),
                               rtol=2e-4, atol=2e-4)


def test_multi_tile_weight_accumulation():
    # Rows spanning several grid steps: dW must accumulate across the grid.
    t = supported(3000, 128, 256, jnp.float32)
    assert 0 < t < 3000, t  # the point of the test: several grid steps
    x, w1, w3, w2 = _setup(r=3000)
    rng = np.random.default_rng(2)
    dout = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    dx, dw1, dw3, dw2 = _ffn_bwd_call(x, w1, w3, w2, dout, interpret=True)

    def loss(x, w1, w3, w2):
        return jnp.sum(reference_fused_ffn(x, w1, w3, w2) * dout)

    gx, g1, g3, g2 = jax.grad(loss, argnums=(0, 1, 2, 3))(x, w1, w3, w2)
    np.testing.assert_allclose(np.asarray(dw1), np.asarray(g1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(gx),
                               rtol=2e-4, atol=2e-4)


def test_ffn_module_routes_to_fused(monkeypatch):
    """FFN with GAOT_FUSED_FFN=1 (forced, interpret on CPU) must match the
    module's plain XLA path on the same params."""
    from gaot_tpu.models.transformer import FFN

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 64, 128)).astype(np.float32))
    mod = FFN(ffn_hidden_size=256)
    params = mod.init(jax.random.key(0), x)

    monkeypatch.setenv("GAOT_FUSED_FFN", "0")
    ref = mod.apply(params, x)
    monkeypatch.setenv("GAOT_FUSED_FFN", "1")
    out = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ffn_module_grads_match(monkeypatch):
    from gaot_tpu.models.transformer import FFN

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 32, 128)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(2, 32, 128)).astype(np.float32))
    mod = FFN(ffn_hidden_size=256)
    params = mod.init(jax.random.key(0), x)

    def loss(p, x):
        return jnp.mean((mod.apply(p, x) - tgt) ** 2)

    monkeypatch.setenv("GAOT_FUSED_FFN", "0")
    g_ref, gx_ref = jax.grad(loss, argnums=(0, 1))(params, x)
    monkeypatch.setenv("GAOT_FUSED_FFN", "1")
    g, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                                rtol=2e-4, atol=2e-4),
        g_ref, g)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=2e-4, atol=2e-4)
