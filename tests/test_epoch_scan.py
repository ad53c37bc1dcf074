"""Whole-epoch lax.scan training path vs the per-step path.

With device-resident data (dataset.device_data) the trainers run each epoch
as ONE jitted scan — batch gather, forward/backward, and optimizer update per
step — instead of one dispatch per step (base_trainer._build_epoch_fn).
These tests pin that the scan path (a) is taken, and (b) produces the same
training trajectory as per-step execution: identical batch order (shared
epoch_index_matrix rng), identical math (shared _step_update). The scan
path folds a per-step rng; with no edge drop / dropout configured the rng is
unused, so losses must match exactly.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from synthetic import make_sequential_fx_dataset  # noqa: E402
from test_train_e2e import TINY_MODEL, TINY_OPT, _paths  # noqa: E402
from test_train_e2e import static_toy_config  # noqa: E402


pytestmark = pytest.mark.slow  # heavy e2e tier (--runslow)


def _static_config(tmp_path, name, device_data):
    return static_toy_config(
        tmp_path, name,
        setup={"data_parallel": 1, "epoch_scan": "always"},
        dataset={"train_size": 16, "val_size": 4, "test_size": 4,
                 "batch_size": 6, "shuffle": True,
                 "device_data": device_data})


def _epoch_losses(trainer, n_epochs=2):
    """Losses from n epochs via whichever path the trainer takes."""
    out = []
    if trainer._scan_available():
        for _ in range(n_epochs):
            out.append(np.asarray(trainer.train_epoch_scan()))
        return np.concatenate(out), True
    for _ in range(n_epochs):
        for batch in trainer.train_loader:
            out.append(float(trainer.train_step(batch)))
    return np.asarray(out), False


def test_static_fx_scan_matches_per_step(tmp_path):
    from gaot_tpu.train import StaticTrainer

    t_scan = StaticTrainer(_static_config(tmp_path, "scan_toy", True))
    losses_scan, used_scan = _epoch_losses(t_scan)
    assert used_scan, "device_data loader should enable the scan path"

    t_step = StaticTrainer(_static_config(tmp_path, "step_toy", False))
    losses_step, used_scan2 = _epoch_losses(t_step)
    assert not used_scan2

    np.testing.assert_allclose(losses_scan, losses_step, rtol=1e-5, atol=1e-7)


def test_static_fx_fit_uses_scan(tmp_path):
    from gaot_tpu.train import StaticTrainer

    trainer = StaticTrainer(_static_config(tmp_path, "scan_fit", True))
    trainer.fit(verbose=False)
    assert trainer._epoch_fn is not None  # scan path was built and used
    metric = trainer.datarow["relative error (direct)"]
    assert np.isfinite(metric) and metric > 0


def test_sequential_scan_matches_per_step(tmp_path):
    from gaot_tpu.train import SequentialTrainer

    def cfg(name, device_data):
        make_sequential_fx_dataset(str(tmp_path / f"{name}.npz"))
        return {
            "setup": {"seed": 0, "trainer_name": "sequential", "train": True,
                      "data_parallel": 1, "epoch_scan": "always"},
            "model": TINY_MODEL,
            "dataset": {
                "name": name,
                "metaname": "incompressible_fluids/NS-Gauss",
                "base_path": str(tmp_path),
                "train_size": 4, "val_size": 2, "test_size": 2,
                "batch_size": 6, "shuffle": True, "device_data": device_data,
                "max_time_diff": 6, "time_step": 2,
                "stepper_mode": "time_der", "predict_mode": "autoregressive",
            },
            "optimizer": TINY_OPT,
            "path": _paths(tmp_path, name),
        }

    t_scan = SequentialTrainer(cfg("seq_scan", True))
    losses_scan, used_scan = _epoch_losses(t_scan)
    assert used_scan

    t_step = SequentialTrainer(cfg("seq_step", False))
    losses_step, _ = _epoch_losses(t_step)
    np.testing.assert_allclose(losses_scan, losses_step, rtol=1e-5, atol=1e-7)


def test_static_fx_scan_multidevice(tmp_path):
    """The whole-epoch scan must stay active on a multi-device mesh
    (data-parallel runs keep one-dispatch-per-epoch): replicated device
    buffers, per-step batch indices sharded over 'data', and the same
    training trajectory as the single-device scan (identical batch order via
    the shared loader rng; global loss reduction under GSPMD)."""
    import jax

    from gaot_tpu.train import StaticTrainer

    def cfg(name, dp):
        return static_toy_config(
            tmp_path, name,
            setup={"data_parallel": dp, "epoch_scan": "always"},
            dataset={"train_size": 16, "val_size": 4, "test_size": 4,
                     "batch_size": 8, "shuffle": True, "device_data": True})

    t_multi = StaticTrainer(cfg("scan_dp", -1))
    assert np.prod(tuple(t_multi.mesh.shape.values())) == len(jax.devices())
    losses_multi, used_scan = _epoch_losses(t_multi)
    assert used_scan, "scan path must be active on the multi-device mesh"

    t_single = StaticTrainer(cfg("scan_dp1", 1))
    losses_single, used_scan1 = _epoch_losses(t_single)
    assert used_scan1
    np.testing.assert_allclose(losses_multi, losses_single,
                               rtol=2e-5, atol=1e-6)


def test_sequential_scan_multidevice(tmp_path):
    """Sequential trainer's scan path on an 8-device mesh: the loader's
    device-resident time-pair buffers are re-placed replicated and the
    per-step pair indices are sharded over 'data'."""
    from gaot_tpu.train import SequentialTrainer

    make_sequential_fx_dataset(str(tmp_path / "seq_dp.npz"))
    config = {
        "setup": {"seed": 0, "trainer_name": "sequential", "train": True,
                  "data_parallel": -1, "epoch_scan": "always"},
        "model": TINY_MODEL,
        "dataset": {
            "name": "seq_dp",
            "metaname": "incompressible_fluids/NS-Gauss",
            "base_path": str(tmp_path),
            "train_size": 4, "val_size": 2, "test_size": 2,
            "batch_size": 8, "shuffle": True, "device_data": True,
            "max_time_diff": 6, "time_step": 2,
            "stepper_mode": "time_der", "predict_mode": "autoregressive",
        },
        "optimizer": TINY_OPT,
        "path": _paths(tmp_path, "seq_dp"),
    }
    trainer = SequentialTrainer(config)
    losses, used_scan = _epoch_losses(trainer, n_epochs=1)
    assert used_scan
    assert np.isfinite(losses).all()
