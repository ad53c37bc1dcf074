"""gather_multiply_reduce custom VJP: forward + gradient parity vs autodiff."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaot_tpu.ops.gather_apply import apply_graph_transform, gather_multiply_reduce
from gaot_tpu.ops.padding import PaddedGraph, pad_csr, transpose_graph
from gaot_tpu.ops.neighbor_search import radius_search


def _setup(seed=0, b=3, n=50, q=20, c=4):
    rng = np.random.default_rng(seed)
    src = rng.uniform(-1, 1, (n, 2))
    dst = rng.uniform(-1, 1, (q, 2))
    g = pad_csr(*radius_search(src, dst, 0.4), pad_multiple=4)
    t = transpose_graph(g, n)
    coef = rng.normal(size=(q, g.k, c)).astype(np.float32) * g.mask[..., None]
    f = rng.normal(size=(b, n, c)).astype(np.float32)
    return g, t, jnp.asarray(coef), jnp.asarray(f)


def _auto_forward(coef, f, indices):
    gathered = f[:, indices, :] if f.ndim == 3 else f[indices]
    cc = coef if coef.ndim == gathered.ndim else coef[None]
    return jnp.sum(cc * gathered, axis=-2)


def test_forward_matches_plain():
    g, t, coef, f = _setup()
    out = apply_graph_transform(coef, f, g, t)
    want = _auto_forward(coef, f, jnp.asarray(g.indices))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)


@pytest.mark.parametrize("batched_coef", [False, True])
def test_grads_match_autodiff(batched_coef):
    g, t, coef, f = _setup()
    if batched_coef:
        coef = jnp.broadcast_to(coef[None], (f.shape[0],) + coef.shape) * \
            jnp.linspace(0.5, 1.5, f.shape[0])[:, None, None, None]
    idx = jnp.asarray(g.indices)

    def loss_custom(coef, f):
        return jnp.sum(apply_graph_transform(coef, f, g, t) ** 2)

    def loss_auto(coef, f):
        return jnp.sum(_auto_forward(coef, f, idx) ** 2)

    gc, gf = jax.grad(loss_custom, argnums=(0, 1))(coef, f)
    ac, af = jax.grad(loss_auto, argnums=(0, 1))(coef, f)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(af), rtol=1e-4, atol=1e-5)
    # padded-edge coef grads may differ (they're multiplied by 0 downstream);
    # compare only on valid edges
    valid = g.mask[..., None]
    if batched_coef:
        valid = valid[None]
    np.testing.assert_allclose(np.asarray(gc) * valid, np.asarray(ac) * valid,
                               rtol=1e-4, atol=1e-5)


def test_grads_unbatched_f():
    """vx-flattened path: f [N, C], coef [Q, K, C]."""
    g, t, coef, f = _setup()
    f2 = f[0]
    idx = jnp.asarray(g.indices)

    def loss_custom(coef, f2):
        return jnp.sum(apply_graph_transform(coef, f2, g, t) ** 2)

    def loss_auto(coef, f2):
        return jnp.sum(_auto_forward(coef, f2, idx) ** 2)

    gc, gf = jax.grad(loss_custom, argnums=(0, 1))(coef, f2)
    ac, af = jax.grad(loss_auto, argnums=(0, 1))(coef, f2)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(af), rtol=1e-4, atol=1e-5)
    valid = g.mask[..., None]
    np.testing.assert_allclose(np.asarray(gc) * valid, np.asarray(ac) * valid,
                               rtol=1e-4, atol=1e-5)


def test_jit_and_vmap_compatible():
    g, t, coef, f = _setup()
    out = jax.jit(lambda c, x: apply_graph_transform(c, x, g, t))(coef, f)
    assert np.isfinite(np.asarray(out)).all()
