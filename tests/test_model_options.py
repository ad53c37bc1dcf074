"""Feature-knob coverage: node positional embedding, pointnet geoembed,
conditional normalization, nonlinear transform, edge-drop training path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaot_tpu.core.config import ModelConfig, merge_config
from gaot_tpu.models import GAOT
from gaot_tpu.ops import PaddedGraph, pad_csr, radius_search


def _setup_inputs(seed=0, n=80, grid=8, b=2, cin=3):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    lat = np.stack(np.meshgrid(np.linspace(-1, 1, grid), np.linspace(-1, 1, grid),
                               indexing="ij"), -1).reshape(-1, 2).astype(np.float32)
    enc = pad_csr(*radius_search(coords, lat, 0.35))
    dec = pad_csr(*radius_search(lat, coords, 0.35))
    to_dev = lambda g: PaddedGraph(jnp.asarray(g.indices), jnp.asarray(g.mask))
    pndata = jnp.asarray(rng.normal(size=(b, n, cin)).astype(np.float32))
    return (jnp.asarray(lat), jnp.asarray(coords), pndata,
            [to_dev(enc)], [to_dev(dec)])


def _model(magno_overrides=None, model_overrides=None):
    cfg = {
        "latent_tokens_size": [8, 8],
        "args": {
            "magno": {"coord_dim": 2, "radius": 0.35, "hidden_size": 8,
                      "mlp_layers": 1, "lifting_channels": 8,
                      **(magno_overrides or {})},
            "transformer": {"patch_size": 2, "hidden_size": 16, "num_layers": 2,
                            "attn_config": {"num_heads": 2, "num_kv_heads": 2}},
        },
        **(model_overrides or {}),
    }
    return GAOT(input_size=3, output_size=2,
                config=merge_config(ModelConfig, cfg))


@pytest.mark.parametrize("magno_kw", [
    {"node_embedding": True},
    {"embedding_method": "pointnet", "pooling": "mean"},
    {"embedding_method": "pointnet", "pooling": "sum"},
    {"transform_type": "nonlinear"},
    {"use_geoembed": False},
    {"attention_type": "dot_product"},
    {"use_attention": False},
])
def test_model_options_forward(magno_kw):
    lat, coords, pndata, enc, dec = _setup_inputs()
    model = _model(magno_kw)
    params = model.init(jax.random.key(0), lat, coords, pndata, enc, dec)
    out = model.apply(params, lat, coords, pndata, enc, dec)
    assert out.shape == (2, 80, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_edge_drop_training_stochastic_eval_deterministic():
    lat, coords, pndata, enc, dec = _setup_inputs()
    model = _model({"sampling_strategy": "max_neighbors", "max_neighbors": 4})
    params = model.init(jax.random.key(0), lat, coords, pndata, enc, dec)
    out_train1 = model.apply(params, lat, coords, pndata, enc, dec,
                             training=True, rngs={"edge_drop": jax.random.key(1)})
    out_train2 = model.apply(params, lat, coords, pndata, enc, dec,
                             training=True, rngs={"edge_drop": jax.random.key(2)})
    assert not np.allclose(np.asarray(out_train1), np.asarray(out_train2))
    out_eval1 = model.apply(params, lat, coords, pndata, enc, dec, training=False)
    out_eval2 = model.apply(params, lat, coords, pndata, enc, dec, training=False)
    np.testing.assert_array_equal(np.asarray(out_eval1), np.asarray(out_eval2))


def test_conditional_norm_model():
    lat, coords, pndata, enc, dec = _setup_inputs()
    model = _model(model_overrides={"use_conditional_norm": True})
    # conditional norm wired through the transformer blocks
    object.__setattr__(model.config.args.transformer.attn_config,
                       "use_conditional_norm", True)
    cond = jnp.ones((2, 1), dtype=jnp.float32)
    params = model.init(jax.random.key(0), lat, coords, pndata, enc, dec,
                        condition=cond)
    out1 = model.apply(params, lat, coords, pndata, enc, dec, condition=cond)
    out2 = model.apply(params, lat, coords, pndata, enc, dec, condition=3.0 * cond)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


@pytest.mark.slow
def test_bfloat16_compute_dtype():
    lat, coords, pndata, enc, dec = _setup_inputs()
    cfg = merge_config(ModelConfig, {
        "latent_tokens_size": [8, 8],
        "args": {"magno": {"coord_dim": 2, "radius": 0.35, "hidden_size": 8,
                           "mlp_layers": 1, "lifting_channels": 8},
                 "transformer": {"patch_size": 2, "hidden_size": 16,
                                 "num_layers": 2,
                                 "attn_config": {"num_heads": 2, "num_kv_heads": 2}}},
    })
    model = GAOT(input_size=3, output_size=2, config=cfg, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), lat, coords, pndata, enc, dec)
    # params stay fp32; activations run bf16
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(params))
    out = model.apply(params, lat, coords, pndata, enc, dec)
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()
