"""Roundtrip + strictness tests for the torch checkpoint interop
(gaot_tpu/utils/torch_interop.py). Forward correctness against the actual
reference model is covered by test_reference_parity.py, which routes its
weight transplant through the same mapping.
"""
import numpy as np
import pytest


pytestmark = pytest.mark.slow  # heavy e2e tier (--runslow)


def _make_params(use_scale_weights=False, attention_type="cosine",
                 embedding_method="statistical", use_conditional_norm=False):
    import jax
    import jax.numpy as jnp

    from gaot_tpu.core.config import ModelConfig, merge_config
    from gaot_tpu.models import GAOT
    from gaot_tpu.ops import PaddedGraph, pad_csr, radius_search

    rng = np.random.default_rng(0)
    n, grid = 60, 8
    coords = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    lat = np.stack(np.meshgrid(np.linspace(-1, 1, grid), np.linspace(-1, 1, grid),
                               indexing="ij"), -1).reshape(-1, 2).astype(np.float32)
    enc = pad_csr(*radius_search(coords, lat, 0.5))
    dec = pad_csr(*radius_search(lat, coords, 0.5))
    to_dev = lambda g: PaddedGraph(jnp.asarray(g.indices), jnp.asarray(g.mask))
    cfg = merge_config(ModelConfig, {
        "latent_tokens_size": [grid, grid],
        "args": {
            "magno": {"coord_dim": 2, "radius": 0.5, "hidden_size": 8,
                      "mlp_layers": 1, "lifting_channels": 8,
                      "scales": [1.0, 0.5] if use_scale_weights else [1.0],
                      "use_scale_weights": use_scale_weights,
                      "attention_type": attention_type,
                      "embedding_method": embedding_method},
            "transformer": {"patch_size": 2, "hidden_size": 16, "num_layers": 3,
                            "attn_config": {
                                "num_heads": 2, "num_kv_heads": 2,
                                "use_conditional_norm": use_conditional_norm}},
        },
    })
    model = GAOT(input_size=2, output_size=1, config=cfg)
    pndata = jnp.asarray(rng.normal(size=(2, n, 2)).astype(np.float32))
    graphs = [to_dev(enc)] * len(cfg.args.magno.scales)
    dgraphs = [to_dev(dec)] * len(cfg.args.magno.scales)
    cond = jnp.ones((2, 1), np.float32) if use_conditional_norm else None
    return model.init(jax.random.key(0), jnp.asarray(lat), jnp.asarray(coords),
                      pndata, graphs, dgraphs, condition=cond)


@pytest.mark.parametrize("kwargs", [
    dict(),
    dict(use_scale_weights=True),
    dict(attention_type="dot_product"),
    dict(embedding_method="pointnet"),
    dict(use_conditional_norm=True),
])
def test_roundtrip(kwargs):
    import jax

    from gaot_tpu.utils.torch_interop import (
        flax_to_torch_state_dict,
        torch_to_flax_params,
    )

    params = _make_params(**kwargs)
    sd = flax_to_torch_state_dict(params)
    back = torch_to_flax_params(sd, params)
    leaves_a, tree_a = jax.tree.flatten(params)
    leaves_b, tree_b = jax.tree.flatten(back)
    assert tree_a == tree_b
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_missing_checkpoint_key_raises_descriptively():
    from gaot_tpu.utils.torch_interop import (
        flax_to_torch_state_dict,
        torch_to_flax_params,
    )

    params = _make_params()
    sd = flax_to_torch_state_dict(params)
    del sd["patch_linear.weight"]
    with pytest.raises(ValueError, match="missing keys"):
        torch_to_flax_params(sd, params)


def test_rope_frequency_keys_are_ignored():
    import jax

    from gaot_tpu.utils.torch_interop import (
        flax_to_torch_state_dict,
        torch_to_flax_params,
    )

    params = _make_params()
    sd = flax_to_torch_state_dict(params)
    # rotary-embedding-torch registers deterministic freqs as parameters;
    # they carry no trained state and must not break the strict import.
    sd["processor.encoder_layers.0.attn.rotary_emb.freqs"] = \
        np.ones((8,), np.float32)
    back = torch_to_flax_params(sd, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unconsumed_checkpoint_key_raises():
    from gaot_tpu.utils.torch_interop import (
        flax_to_torch_state_dict,
        torch_to_flax_params,
    )

    params = _make_params()
    sd = flax_to_torch_state_dict(params)
    sd["processor.bogus_layer.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="not consumed"):
        torch_to_flax_params(sd, params)


def test_import_script_end_to_end(tmp_path):
    """scripts/import_torch_ckpt.py: reference-style .pt → Orbax ckpt."""
    import os
    import sys

    import jax
    import torch

    sys.path.insert(0, os.path.dirname(__file__))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import json

    import import_torch_ckpt
    from test_train_e2e import static_toy_config

    from gaot_tpu.train import StaticTrainer
    from gaot_tpu.train.checkpoint import restore_checkpoint
    from gaot_tpu.utils.torch_interop import flax_to_torch_state_dict

    config = static_toy_config(tmp_path, "imp_toy",
                               setup={"train": False, "test": False})
    cfg_path = str(tmp_path / "imp.json")
    with open(cfg_path, "w") as f:
        json.dump(config, f)

    # a "reference-trained" checkpoint: same architecture, different seed
    donor = StaticTrainer(config)
    sd = {k: torch.tensor(v)
          for k, v in flax_to_torch_state_dict(donor.params).items()}
    pt_path = str(tmp_path / "ref.pt")
    torch.save({"model": sd}, pt_path)

    out_path = str(tmp_path / "imported_ckpt")
    import_torch_ckpt.main(cfg_path, pt_path, out_path)

    target = StaticTrainer(config)
    restored = restore_checkpoint(out_path, target.params)["params"]
    for a, b in zip(jax.tree.leaves(donor.params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and back out: export the Orbax ckpt as a reference .pt
    import export_torch_ckpt

    back_pt = str(tmp_path / "back.pt")
    export_torch_ckpt.main(cfg_path, out_path, back_pt)
    sd_back = torch.load(back_pt, weights_only=True)["model"]
    assert set(sd_back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(sd_back[k].numpy(), sd[k].numpy())


def test_module_prefix_stripped():
    import jax

    from gaot_tpu.utils.torch_interop import (
        flax_to_torch_state_dict,
        torch_to_flax_params,
    )

    params = _make_params()
    sd = {f"module.{k}": v for k, v in flax_to_torch_state_dict(params).items()}
    back = torch_to_flax_params(sd, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
