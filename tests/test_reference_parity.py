"""Numerical parity against the actual PyTorch reference implementation.

The strongest correctness evidence available without the real datasets:
transplant one set of weights into both implementations (flax → torch state
dict), run both forwards on identical inputs and graphs, and require the
outputs to agree to float32 tolerance. Covers the full
encode → patchify → UViT → decode pipeline including cosine attention,
segment softmax, statistical geometric embedding, and the positional
embedding formula.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import reference_stub  # noqa: E402

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not reference_stub.reference_available(),
    reason="reference snapshot not mounted at /root/reference")]


def flax_to_reference_state_dict(params):
    """Convert a gaot_tpu GAOT param tree to the reference torch state dict
    (package mapping, gaot_tpu/utils/torch_interop.py — exercised against
    the real reference model by these tests)."""
    import torch

    from gaot_tpu.utils.torch_interop import flax_to_torch_state_dict

    return {k: torch.tensor(v)
            for k, v in flax_to_torch_state_dict(params).items()}


@pytest.mark.parametrize("num_layers,use_cond", [(2, False), (3, False),
                                                 (3, True)])
def test_forward_matches_pytorch_reference(num_layers, use_cond):
    import jax
    import jax.numpy as jnp
    import torch

    from gaot_tpu.core.config import ModelConfig, merge_config
    from gaot_tpu.models import GAOT
    from gaot_tpu.ops import PaddedGraph, pad_csr, radius_search

    rng = np.random.default_rng(0)
    n, b, grid, lifting, hidden = 90, 2, 8, 8, 16
    coords = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    lat = np.stack(np.meshgrid(np.linspace(-1, 1, grid), np.linspace(-1, 1, grid),
                               indexing="ij"), -1).reshape(-1, 2).astype(np.float32)
    enc_csr = radius_search(coords, lat, 0.4)
    dec_csr = radius_search(lat, coords, 0.4)
    enc_g = pad_csr(*enc_csr)
    dec_g = pad_csr(*dec_csr)
    pndata = rng.normal(size=(b, n, 3)).astype(np.float32)

    # --- gaot_tpu model ---
    cfg = merge_config(ModelConfig, {
        "latent_tokens_size": [grid, grid],
        "args": {
            "magno": {"coord_dim": 2, "radius": 0.4, "hidden_size": 8,
                      "mlp_layers": 1, "lifting_channels": lifting},
            "transformer": {"patch_size": 2, "hidden_size": hidden,
                            "num_layers": num_layers,
                            "attn_config": {"num_heads": 2, "num_kv_heads": 2,
                                            "use_conditional_norm": use_cond}},
        },
    })
    model = GAOT(input_size=3, output_size=2, config=cfg)
    to_dev = lambda g: PaddedGraph(jnp.asarray(g.indices), jnp.asarray(g.mask))
    cond = (jnp.asarray(rng.uniform(0.1, 1.0, (b, 1)).astype(np.float32))
            if use_cond else None)
    params = model.init(jax.random.key(0), jnp.asarray(lat), jnp.asarray(coords),
                        jnp.asarray(pndata), [to_dev(enc_g)], [to_dev(dec_g)],
                        condition=cond)
    out_jax = np.asarray(model.apply(params, jnp.asarray(lat), jnp.asarray(coords),
                                     jnp.asarray(pndata), [to_dev(enc_g)],
                                     [to_dev(dec_g)], condition=cond))

    # --- reference model with transplanted weights ---
    ref = reference_stub.build_reference_model(
        input_size=3, output_size=2, latent_tokens_size=(grid, grid),
        magno_kwargs=dict(coord_dim=2, radius=0.4, hidden_size=8, mlp_layers=1,
                          lifting_channels=lifting, use_attention=True,
                          attention_type="cosine", use_geoembed=True,
                          embedding_method="statistical",
                          transform_type="linear", precompute_edges=True,
                          use_torch_scatter=True),
        transformer_kwargs=dict(patch_size=2, hidden_size=hidden,
                                num_layers=num_layers,
                                positional_embedding="absolute"),
        attn_kwargs=dict(num_heads=2, num_kv_heads=2,
                         use_conditional_norm=use_cond),
    )
    sd = flax_to_reference_state_dict(params)
    ref.load_state_dict(sd, strict=True)
    ref.eval()

    def csr_dict(csr):
        idx, splits = csr
        return {"neighbors_index": torch.tensor(idx),
                "neighbors_row_splits": torch.tensor(splits)}

    with torch.no_grad():
        out_ref = ref(
            latent_tokens_coord=torch.tensor(lat),
            xcoord=torch.tensor(coords),
            pndata=torch.tensor(pndata),
            encoder_nbrs=[csr_dict(enc_csr)],
            decoder_nbrs=[csr_dict(dec_csr)],
            condition=torch.tensor(np.asarray(cond)) if use_cond else None,
        ).numpy()

    np.testing.assert_allclose(out_jax, out_ref, rtol=1e-3, atol=1e-4)
    # tight agreement on the bulk of outputs
    assert np.abs(out_jax - out_ref).mean() < 1e-5
