"""vx-mode forward parity against the PyTorch reference.

The round-1 parity tests covered fx (shared-graph) mode only; the vx
(per-sample coordinates) path exercises different code in BOTH frameworks —
the reference's serial per-sample loop (src/model/layers/magno.py:356-413,
694-751) vs gaot_tpu's flattened batch (models/magno.py). Same transplanted
weights + same graphs must give the same outputs.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import reference_stub  # noqa: E402
from test_reference_parity import flax_to_reference_state_dict  # noqa: E402

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not reference_stub.reference_available(),
    reason="reference snapshot not mounted at /root/reference")]


def test_vx_forward_matches_pytorch_reference():
    import jax
    import jax.numpy as jnp
    import torch

    from gaot_tpu.core.config import ModelConfig, merge_config
    from gaot_tpu.models import GAOT
    from gaot_tpu.ops import pad_csr, radius_search
    from gaot_tpu.ops.padding import PaddedGraph, repad, stack_graphs

    rng = np.random.default_rng(3)
    b, n, grid, lifting, hidden = 2, 90, 8, 8, 16
    coords = rng.uniform(-1, 1, (b, n, 2)).astype(np.float32)
    lat = np.stack(np.meshgrid(np.linspace(-1, 1, grid),
                               np.linspace(-1, 1, grid),
                               indexing="ij"), -1).reshape(-1, 2).astype(np.float32)
    pndata = rng.normal(size=(b, n, 3)).astype(np.float32)

    enc_csr = [radius_search(coords[i], lat, 0.4) for i in range(b)]
    dec_csr = [radius_search(lat, coords[i], 0.4) for i in range(b)]

    def stack_padded(csrs):
        gs = [pad_csr(*c) for c in csrs]
        k = max(g.k for g in gs)
        return stack_graphs([repad(g, k) for g in gs])

    enc_g, dec_g = stack_padded(enc_csr), stack_padded(dec_csr)

    cfg = merge_config(ModelConfig, {
        "latent_tokens_size": [grid, grid],
        "args": {
            "magno": {"coord_dim": 2, "radius": 0.4, "hidden_size": 8,
                      "mlp_layers": 1, "lifting_channels": lifting,
                      "use_query_bucketing": False,
                      "use_transpose_backward": False},
            "transformer": {"patch_size": 2, "hidden_size": hidden,
                            "num_layers": 2,
                            "attn_config": {"num_heads": 2, "num_kv_heads": 2}},
        },
    })
    model = GAOT(input_size=3, output_size=2, config=cfg)
    to_dev = lambda g: PaddedGraph(jnp.asarray(g.indices), jnp.asarray(g.mask))
    lat_j = jnp.asarray(lat)
    coords_j = jnp.asarray(coords)
    params = model.init(jax.random.key(0), lat_j, coords_j,
                        jnp.asarray(pndata), [to_dev(enc_g)], [to_dev(dec_g)])
    out_jax = np.asarray(model.apply(params, lat_j, coords_j,
                                     jnp.asarray(pndata), [to_dev(enc_g)],
                                     [to_dev(dec_g)]))

    ref = reference_stub.build_reference_model(
        input_size=3, output_size=2, latent_tokens_size=(grid, grid),
        magno_kwargs=dict(coord_dim=2, radius=0.4, hidden_size=8, mlp_layers=1,
                          lifting_channels=lifting, use_attention=True,
                          attention_type="cosine", use_geoembed=True,
                          embedding_method="statistical",
                          transform_type="linear", precompute_edges=True,
                          use_torch_scatter=True),
        transformer_kwargs=dict(patch_size=2, hidden_size=hidden, num_layers=2,
                                positional_embedding="absolute"),
        attn_kwargs=dict(num_heads=2, num_kv_heads=2),
    )
    ref.load_state_dict(flax_to_reference_state_dict(params), strict=True)
    ref.eval()

    def csr_dict(csr):
        idx, splits = csr
        return {"neighbors_index": torch.tensor(idx),
                "neighbors_row_splits": torch.tensor(splits)}

    enc_nbrs = [[csr_dict(enc_csr[i])] for i in range(b)]
    dec_nbrs = [[csr_dict(dec_csr[i])] for i in range(b)]
    with torch.no_grad():
        out_ref = ref(latent_tokens_coord=torch.tensor(lat),
                      xcoord=torch.tensor(coords),
                      pndata=torch.tensor(pndata),
                      encoder_nbrs=enc_nbrs,
                      decoder_nbrs=dec_nbrs).numpy()

    np.testing.assert_allclose(out_jax, out_ref, rtol=2e-4, atol=2e-4)

    # Gradient parity on the SAME vx batch: per-layer grads must match after
    # the same name mapping used for the weight transplant. This pins that
    # the convergence-parity drift on vx (parity/) is floating-point chaos
    # plus per-side graph-boundary differences, not a backward-pass bug.
    import jax as _jax
    import jax.numpy as _jnp

    target = rng.normal(size=(b, n, 2)).astype(np.float32)

    def loss_fn(p):
        pred = model.apply(p, lat_j, coords_j, _jnp.asarray(pndata),
                           [to_dev(enc_g)], [to_dev(dec_g)])
        return _jnp.mean((pred - _jnp.asarray(target)) ** 2)

    grads = _jax.grad(loss_fn)(params)
    from gaot_tpu.utils.torch_interop import flax_to_torch_state_dict

    my_g = flax_to_torch_state_dict(grads)

    ref.train()
    ref.zero_grad()
    pred = ref(latent_tokens_coord=torch.tensor(lat),
               xcoord=torch.tensor(coords),
               pndata=torch.tensor(pndata),
               encoder_nbrs=enc_nbrs, decoder_nbrs=dec_nbrs)
    torch.nn.functional.mse_loss(pred, torch.tensor(target)).backward()
    worst = []
    for name, p in ref.named_parameters():
        if p.grad is None:
            continue
        g_ref = p.grad.detach().numpy()
        g_my = np.asarray(my_g[name])
        scale = np.abs(g_ref).max() + 1e-10
        worst.append((float(np.abs(g_my - g_ref).max() / scale), name))
    worst.sort(reverse=True)
    assert worst[0][0] < 5e-3, f"worst grad mismatch: {worst[:5]}"
