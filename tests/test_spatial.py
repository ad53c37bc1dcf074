"""Spatial (sequence) parallelism: correctness on a virtual 8-device mesh.

The shard_queries hints (parallel/spatial.py) shard the latent-token /
query axis over the mesh's 'model' axis. These tests check that

- the hint actually produces a 'model'-sharded array inside jit,
- a full fx forward and a train-step gradient are numerically identical
  with spatial sharding on vs off (XLA inserts collectives, not math).
"""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mesh():
    import jax

    from gaot_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(2, 4)


def _build_model(grid=8, n=96, b=4):
    import jax
    import jax.numpy as jnp

    from gaot_tpu.core.config import ModelConfig, merge_config
    from gaot_tpu.models import GAOT
    from gaot_tpu.ops import PaddedGraph, pad_csr, radius_search

    rng = np.random.default_rng(3)
    coords = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    lat = np.stack(np.meshgrid(np.linspace(-1, 1, grid), np.linspace(-1, 1, grid),
                               indexing="ij"), -1).reshape(-1, 2).astype(np.float32)
    enc = pad_csr(*radius_search(coords, lat, 0.4))
    dec = pad_csr(*radius_search(lat, coords, 0.4))
    to_dev = lambda g: PaddedGraph(jnp.asarray(g.indices), jnp.asarray(g.mask))
    cfg = merge_config(ModelConfig, {
        "latent_tokens_size": [grid, grid],
        "args": {
            "magno": {"coord_dim": 2, "radius": 0.4, "hidden_size": 8,
                      "mlp_layers": 1, "lifting_channels": 8},
            "transformer": {"patch_size": 2, "hidden_size": 16, "num_layers": 3,
                            "attn_config": {"num_heads": 4, "num_kv_heads": 4}},
        },
    })
    model = GAOT(input_size=2, output_size=1, config=cfg)
    pndata = jnp.asarray(rng.normal(size=(b, n, 2)).astype(np.float32))
    args = (jnp.asarray(lat), jnp.asarray(coords), pndata,
            [to_dev(enc)], [to_dev(dec)])
    params = model.init(jax.random.key(0), *args)
    return model, params, args


def test_shard_queries_applies_model_sharding(mesh):
    import jax
    import jax.numpy as jnp

    from gaot_tpu.parallel import shard_queries, spatial_sharding

    @jax.jit
    def f(x):
        return shard_queries(x * 2)

    x = jnp.ones((4, 16, 8))
    with jax.set_mesh(mesh), spatial_sharding():
        out = f(x)
    spec = out.sharding.spec
    assert tuple(spec)[:2] == ("data", "model")

    # no-op outside the context
    out2 = f(x)
    assert "model" not in str(out2.sharding)


def test_forward_matches_unsharded(mesh):
    import jax

    from gaot_tpu.parallel import spatial_sharding

    model, params, args = _build_model()
    fwd = jax.jit(lambda p: model.apply(p, *args))
    ref = np.asarray(fwd(params))
    with jax.set_mesh(mesh), spatial_sharding():
        out = np.asarray(jax.jit(lambda p: model.apply(p, *args))(params))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-6)


@pytest.mark.slow
def test_trainer_spatial_parallel_end_to_end(tmp_path):
    """StaticTrainer with setup.spatial_parallel trains and evaluates; the
    global spatial mode is reset by a later non-spatial trainer."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_train_e2e import static_toy_config

    from gaot_tpu.parallel import spatial_enabled
    from gaot_tpu.train import StaticTrainer

    def cfg(name, spatial):
        return static_toy_config(
            tmp_path, name,
            setup={"data_parallel": 2, "model_parallel": 2,
                   "spatial_parallel": spatial},
            dataset={"shuffle": False, "device_data": False})

    from gaot_tpu.parallel.spatial import enable_spatial_sharding, set_ambient_mesh

    try:
        trainer = StaticTrainer(cfg("sp_e2e", True))
        assert spatial_enabled()
        trainer.fit(verbose=False)
        metric = trainer.datarow["relative error (direct)"]
        assert np.isfinite(metric) and metric > 0

        StaticTrainer(cfg("sp_off", False))
        assert not spatial_enabled()
    finally:
        # never leak the ambient mesh / global flag into other tests
        set_ambient_mesh(None)
        enable_spatial_sharding(False)


def test_train_step_gradients_match_unsharded(mesh):
    import jax
    import jax.numpy as jnp

    from gaot_tpu.parallel import spatial_sharding

    model, params, args = _build_model()
    y = jnp.asarray(np.random.default_rng(5).normal(
        size=(4, args[2].shape[1], 1)).astype(np.float32))

    def loss_fn(p):
        pred = model.apply(p, *args)
        return jnp.mean((pred - y) ** 2)

    g_ref = jax.jit(jax.grad(loss_fn))(params)
    with jax.set_mesh(mesh), spatial_sharding():
        g_sp = jax.jit(jax.grad(loss_fn))(params)
    flat_ref = jax.tree.leaves(g_ref)
    flat_sp = jax.tree.leaves(g_sp)
    for a, b in zip(flat_ref, flat_sp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=1e-6)
