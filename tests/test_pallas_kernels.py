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
