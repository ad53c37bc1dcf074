"""Pallas kernel parity tests (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from gaot_tpu.models.transformer import gqa_attention_xla
from gaot_tpu.ops.pallas.flash_attention import flash_attention_gqa


@pytest.mark.parametrize("h,hkv", [(4, 4), (8, 2)])
def test_flash_attention_matches_xla(h, hkv):
    rng = np.random.default_rng(0)
    b, s, d = 2, 256, 32
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32))
    want = gqa_attention_xla(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_gqa(q, k, v, q_block=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_flash_attention_fallback_for_odd_shapes():
    """Unsupported seq lengths route to the XLA path (no kernel error)."""
    rng = np.random.default_rng(1)
    b, s, h, d = 1, 100, 2, 16  # s % 128 != 0 → fallback
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    got = flash_attention_gqa(q, k, v)
    want = gqa_attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("h,hkv", [(2, 2), (4, 2)])
def test_flash_attention_grad_matches_xla(h, hkv):
    """The Pallas flash backward kernel matches XLA autodiff (incl. GQA)."""
    rng = np.random.default_rng(2)
    b, s, d = 1, 128, 16
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention_gqa(q, k, v, q_block=128) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(gqa_attention_xla(q, k, v) ** 2)

    # The whole grad computation (forward + backward pallas_call) must run
    # under interpret mode on CPU.
    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4)


def test_multiply_reduce_k_matches_einsum():
    from gaot_tpu.ops.pallas.multiply_reduce import multiply_reduce_k, supported

    rng = np.random.default_rng(3)
    k, q, b, c = 4, 16, 8, 16
    assert supported(q, b, c, 4)
    coef_km = jnp.asarray(rng.normal(size=(k, q, c)).astype(np.float32))
    gath_km = jnp.asarray(rng.normal(size=(k, q, b * c)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = multiply_reduce_k(coef_km, gath_km, b)
    want = jnp.einsum("kqc,kqbc->qbc", coef_km,
                      gath_km.reshape(k, q, b, c)).reshape(q, b * c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_multiply_reduce_k_query_folding():
    """Narrow-W (vx: b=1, C=64) shapes fold r=128//W adjacent queries into
    one 128-lane row — must be exact vs the einsum reference."""
    from gaot_tpu.ops.pallas.multiply_reduce import multiply_reduce_k, supported

    rng = np.random.default_rng(5)
    k, q, b, c = 5, 32, 1, 64
    assert supported(q, b, c, 4)
    coef_km = jnp.asarray(rng.normal(size=(k, q, c)).astype(np.float32))
    gath_km = jnp.asarray(rng.normal(size=(k, q, c)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = multiply_reduce_k(coef_km, gath_km, b)
    want = jnp.einsum("kqc,kqc->qc", coef_km, gath_km)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_multiply_reduce_b_query_folding():
    from gaot_tpu.ops.pallas.multiply_reduce import multiply_reduce_b

    rng = np.random.default_rng(6)
    k, q, b, c = 3, 32, 1, 64
    gath_km = jnp.asarray(rng.normal(size=(k, q, c)).astype(np.float32))
    dout = jnp.asarray(rng.normal(size=(q, c)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = multiply_reduce_b(gath_km, dout, b, c)
    want = gath_km * dout[None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_multiply_reduce_b_matches_einsum():
    from gaot_tpu.ops.pallas.multiply_reduce import multiply_reduce_b

    rng = np.random.default_rng(4)
    k, q, b, c = 3, 16, 8, 16
    gath_km = jnp.asarray(rng.normal(size=(k, q, b * c)).astype(np.float32))
    dout = jnp.asarray(rng.normal(size=(q, b * c)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = multiply_reduce_b(gath_km, dout, b, c)
    want = jnp.einsum("kqbc,qbc->kqc", gath_km.reshape(k, q, b, c),
                      dout.reshape(q, b, c))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flash_attention_tiled_backward_matches_xla():
    """S > 1024 routes to the q-tiled backward kernel; grads match XLA."""
    from gaot_tpu.ops.pallas import flash_attention as fa

    rng = np.random.default_rng(5)
    b, s, h, d = 1, 256, 2, 16
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention_gqa(q, k, v) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(gqa_attention_xla(q, k, v) ** 2)

    # Force the tiled path by lowering the monolithic cutoff below S.
    orig = fa._BWD_MONOLITHIC_MAX_S
    fa._BWD_MONOLITHIC_MAX_S = 128
    try:
        with pltpu.force_tpu_interpret_mode():
            g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa._BWD_MONOLITHIC_MAX_S = orig
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_flash_backward_long_matches_xla():
    """LSE-based two-kernel backward for S > 4096 (interpret mode, small S
    with the thresholds monkey-patched down)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from gaot_tpu.models.transformer import gqa_attention_xla
    from gaot_tpu.ops.pallas import flash_attention as fa

    rng = np.random.default_rng(5)
    b, s, h, hkv, d = 1, 256, 2, 1, 16
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32))
    do = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))

    hm = lambda x: x.transpose(0, 2, 1, 3)  # internals are heads-major
    with pltpu.force_tpu_interpret_mode():
        out, lse = fa._flash_forward(hm(q), hm(k), hm(v), q_block=128,
                                     with_lse=True)
        dq, dk, dv = fa._flash_backward_long(hm(q), hm(k), hm(v), out,
                                             hm(do), lse)
    out, dq, dk, dv = hm(out), hm(dq), hm(dk), hm(dv)

    out_ref, vjp = jax.vjp(gqa_attention_xla, q, k, v)
    dq_r, dk_r, dv_r = vjp(do)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_r),
                               rtol=5e-4, atol=5e-4)
