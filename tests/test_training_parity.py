"""Training-dynamics parity against the PyTorch reference.

Extends the forward weight-transplant parity (test_reference_parity.py) to
the full training loop: both implementations start from the SAME weights,
see the SAME batches, and take AdamW steps with the SAME hyperparameters
(torch.optim.AdamW vs optax.adamw — both decoupled weight decay, betas
(0.9, 0.999), eps 1e-8, matching the reference AdamWOptimizer,
src/utils/optimizers.py:236-305, and its nn.MSELoss train objective,
src/core/base_trainer.py:71). The per-step loss trajectories must agree to
float32 tolerance — evidence that gradients, not just forwards, match.
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


def test_adamw_loss_trajectory_matches_reference():
    import jax
    import jax.numpy as jnp
    import optax
    import torch

    from gaot_tpu.core.config import ModelConfig, merge_config
    from gaot_tpu.models import GAOT
    from gaot_tpu.ops import PaddedGraph, pad_csr, radius_search

    rng = np.random.default_rng(7)
    n, b, grid, lifting, hidden = 90, 2, 8, 8, 16
    lr, wd, steps = 1e-3, 1e-4, 6
    coords = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    lat = np.stack(np.meshgrid(np.linspace(-1, 1, grid),
                               np.linspace(-1, 1, grid),
                               indexing="ij"), -1).reshape(-1, 2).astype(np.float32)
    enc_csr = radius_search(coords, lat, 0.4)
    dec_csr = radius_search(lat, coords, 0.4)
    enc_g, dec_g = pad_csr(*enc_csr), pad_csr(*dec_csr)
    batches = [(rng.normal(size=(b, n, 3)).astype(np.float32),
                rng.normal(size=(b, n, 2)).astype(np.float32))
               for _ in range(steps)]

    cfg = merge_config(ModelConfig, {
        "latent_tokens_size": [grid, grid],
        "args": {
            "magno": {"coord_dim": 2, "radius": 0.4, "hidden_size": 8,
                      "mlp_layers": 1, "lifting_channels": lifting},
            "transformer": {"patch_size": 2, "hidden_size": hidden,
                            "num_layers": 2,
                            "attn_config": {"num_heads": 2, "num_kv_heads": 2}},
        },
    })
    model = GAOT(input_size=3, output_size=2, config=cfg)
    to_dev = lambda g: PaddedGraph(jnp.asarray(g.indices), jnp.asarray(g.mask))
    enc_j, dec_j = [to_dev(enc_g)], [to_dev(dec_g)]
    lat_j, coords_j = jnp.asarray(lat), jnp.asarray(coords)
    params = model.init(jax.random.key(0), lat_j, coords_j,
                        jnp.asarray(batches[0][0]), enc_j, dec_j)

    tx = optax.adamw(lr, weight_decay=wd)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            pred = model.apply(p, lat_j, coords_j, x, enc_j, dec_j)
            return jnp.mean((pred - y) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses_jax = []
    for x, y in batches:
        params, opt_state, loss = train_step(params, opt_state,
                                             jnp.asarray(x), jnp.asarray(y))
        losses_jax.append(float(loss))

    # --- reference: same initial weights, batches, optimizer ---
    model0 = GAOT(input_size=3, output_size=2, config=cfg)
    params0 = model0.init(jax.random.key(0), lat_j, coords_j,
                          jnp.asarray(batches[0][0]), enc_j, dec_j)
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
    ref.load_state_dict(flax_to_reference_state_dict(params0), strict=True)
    ref.train()
    opt = torch.optim.AdamW(ref.parameters(), lr=lr, weight_decay=wd)
    mse = torch.nn.MSELoss()

    def csr_dict(csr):
        idx, splits = csr
        return {"neighbors_index": torch.tensor(idx),
                "neighbors_row_splits": torch.tensor(splits)}

    losses_ref = []
    for x, y in batches:
        opt.zero_grad()
        pred = ref(latent_tokens_coord=torch.tensor(lat),
                   xcoord=torch.tensor(coords),
                   pndata=torch.tensor(x),
                   encoder_nbrs=[csr_dict(enc_csr)],
                   decoder_nbrs=[csr_dict(dec_csr)])
        loss = mse(pred, torch.tensor(y))
        loss.backward()
        opt.step()
        losses_ref.append(float(loss))

    np.testing.assert_allclose(losses_jax, losses_ref, rtol=2e-4)
    # the optimizer must actually move the params for the match to be
    # meaningful (each loss is computed on a different random batch, so
    # monotonic decrease is not expected at this scale)
    assert abs(losses_jax[-1] - losses_jax[0]) > 1e-4
