"""GAOT model tests: patchify ordering, forward shapes in fx/vx modes,
2D/3D grids, positional embeddings."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaot_tpu.core.config import ModelConfig, merge_config
from gaot_tpu.models import GAOT, absolute_embeddings, patch_positions, patchify, unpatchify
from gaot_tpu.ops import PaddedGraph, pad_csr, radius_search, stack_graphs


def test_patchify_roundtrip_2d():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8 * 6, 5)).astype(np.float32))
    p = patchify(x, (8, 6), 2)
    assert p.shape == (2, 4 * 3, 2 * 2 * 5)
    back = unpatchify(p, (8, 6), 2, 5)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_patchify_roundtrip_3d():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4 * 4 * 4, 3)).astype(np.float32))
    p = patchify(x, (4, 4, 4), 2)
    assert p.shape == (2, 8, 8 * 3)
    back = unpatchify(p, (4, 4, 4), 2, 3)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_patchify_reference_ordering():
    """Element ordering must match the reference's view/permute chain
    (src/model/gaot.py:177-205): patch tokens scan rows within a patch."""
    h, w, p, c = 4, 4, 2, 1
    x = jnp.arange(h * w, dtype=jnp.float32).reshape(1, h * w, c)
    tokens = np.asarray(patchify(x, (h, w), p))[0, :, :]
    # grid (row-major 4x4): patch (0,0) holds grid elements (0,0),(0,1),(1,0),(1,1)
    np.testing.assert_array_equal(tokens[0], [0, 1, 4, 5])
    np.testing.assert_array_equal(tokens[1], [2, 3, 6, 7])
    np.testing.assert_array_equal(tokens[2], [8, 9, 12, 13])


def test_absolute_embeddings_formula():
    pos = patch_positions((4, 4), 2)
    emb = absolute_embeddings(pos, 16)
    assert emb.shape == (4, 16)
    # first component: sin(pos_0 * inv_freq_0) with inv_freq_0 = 1
    np.testing.assert_allclose(emb[:, 0], np.sin(pos[:, 0]), rtol=1e-6)


def _build_model(coord_dim=2, grid=(8, 8), scales=(1.0,), vx=False,
                 use_scale_weights=False, positional_embedding="absolute"):
    cfg = merge_config(ModelConfig, {
        "latent_tokens_size": list(grid),
        "args": {
            "magno": {
                "coord_dim": coord_dim,
                "lifting_channels": 8,
                "hidden_size": 8,
                "scales": list(scales),
                "use_scale_weights": use_scale_weights,
            },
            "transformer": {"patch_size": 2, "hidden_size": 16, "num_layers": 2},
        },
    })
    return GAOT(input_size=3, output_size=2, config=cfg)


def _graphs(coords, lat, radius, scales):
    enc, dec = [], []
    for s in scales:
        enc.append(pad_csr(*radius_search(coords, lat, radius * s)))
        dec.append(pad_csr(*radius_search(lat, coords, radius * s)))
    to_j = lambda g: PaddedGraph(jnp.asarray(g.indices), jnp.asarray(g.mask))
    return [to_j(g) for g in enc], [to_j(g) for g in dec]


@pytest.mark.parametrize("scales,use_scale_weights", [((1.0,), False),
                                                      ((1.0, 2.0), False),
                                                      ((1.0, 2.0), True)])
def test_gaot_forward_fx(scales, use_scale_weights):
    rng = np.random.default_rng(2)
    n, b = 120, 3
    coords = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    lat = np.stack(np.meshgrid(np.linspace(-1, 1, 8), np.linspace(-1, 1, 8),
                               indexing="ij"), -1).reshape(-1, 2).astype(np.float32)
    enc, dec = _graphs(coords, lat, 0.35, scales)
    model = _build_model(scales=scales, use_scale_weights=use_scale_weights)
    pndata = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), jnp.asarray(lat), jnp.asarray(coords),
                        pndata, enc, dec)
    out = model.apply(params, jnp.asarray(lat), jnp.asarray(coords), pndata, enc, dec)
    assert out.shape == (b, n, 2)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_gaot_forward_vx():
    """Variable coordinates: per-sample graphs batched [B, Q, K]."""
    rng = np.random.default_rng(3)
    n, b = 100, 2
    lat = np.stack(np.meshgrid(np.linspace(-1, 1, 8), np.linspace(-1, 1, 8),
                               indexing="ij"), -1).reshape(-1, 2).astype(np.float32)
    coords = rng.uniform(-1, 1, (b, n, 2)).astype(np.float32)
    enc_list, dec_list = [], []
    for i in range(b):
        enc_list.append(pad_csr(*radius_search(coords[i], lat, 0.35)))
        dec_list.append(pad_csr(*radius_search(lat, coords[i], 0.35)))
    enc = stack_graphs(enc_list)
    dec = stack_graphs(dec_list)
    enc = [PaddedGraph(jnp.asarray(enc.indices), jnp.asarray(enc.mask))]
    dec = [PaddedGraph(jnp.asarray(dec.indices), jnp.asarray(dec.mask))]
    model = _build_model()
    pndata = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), jnp.asarray(lat), jnp.asarray(coords),
                        pndata, enc, dec)
    out = model.apply(params, jnp.asarray(lat), jnp.asarray(coords), pndata, enc, dec)
    assert out.shape == (b, n, 2)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_gaot_vx_equals_fx_when_coords_identical():
    """With identical coords replicated across the batch, vx must reproduce
    the fx result (same math, different layout)."""
    rng = np.random.default_rng(4)
    n, b = 80, 2
    coords = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    lat = np.stack(np.meshgrid(np.linspace(-1, 1, 8), np.linspace(-1, 1, 8),
                               indexing="ij"), -1).reshape(-1, 2).astype(np.float32)
    enc_fx, dec_fx = _graphs(coords, lat, 0.35, (1.0,))
    model = _build_model()
    pndata = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), jnp.asarray(lat), jnp.asarray(coords),
                        pndata, enc_fx, dec_fx)
    out_fx = model.apply(params, jnp.asarray(lat), jnp.asarray(coords), pndata,
                         enc_fx, dec_fx)

    coords_vx = jnp.asarray(np.broadcast_to(coords, (b, n, 2)).copy())
    enc_vx = [PaddedGraph(jnp.broadcast_to(g.indices, (b,) + g.indices.shape),
                          jnp.broadcast_to(g.mask, (b,) + g.mask.shape))
              for g in enc_fx]
    dec_vx = [PaddedGraph(jnp.broadcast_to(g.indices, (b,) + g.indices.shape),
                          jnp.broadcast_to(g.mask, (b,) + g.mask.shape))
              for g in dec_fx]
    out_vx = model.apply(params, jnp.asarray(lat), coords_vx, pndata, enc_vx, dec_vx)
    np.testing.assert_allclose(np.asarray(out_fx), np.asarray(out_vx),
                               rtol=1e-4, atol=1e-5)


def test_gaot_3d():
    rng = np.random.default_rng(5)
    n, b = 60, 2
    coords = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    axes = [np.linspace(-1, 1, 4)] * 3
    lat = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3).astype(np.float32)
    enc, dec = _graphs(coords, lat, 0.8, (1.0,))
    model = _build_model(coord_dim=3, grid=(4, 4, 4))
    pndata = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), jnp.asarray(lat), jnp.asarray(coords),
                        pndata, enc, dec)
    out = model.apply(params, jnp.asarray(lat), jnp.asarray(coords), pndata, enc, dec)
    assert out.shape == (b, n, 2)
