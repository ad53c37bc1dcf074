"""End-to-end trainer tests on synthetic data (CPU, tiny models)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from synthetic import (  # noqa: E402
    make_sequential_fx_dataset,
    make_static_fx_dataset,
    make_static_vx_dataset,
)

pytestmark = pytest.mark.slow  # heavy e2e tier (--runslow)


TINY_MODEL = {
    "latent_tokens_size": [8, 8],
    "args": {
        "magno": {
            "coord_dim": 2,
            "radius": 0.25,
            "hidden_size": 8,
            "mlp_layers": 1,
            "lifting_channels": 8,
        },
        "transformer": {"patch_size": 2, "hidden_size": 16, "num_layers": 2,
                        "attn_config": {"num_heads": 2, "num_kv_heads": 2}},
    },
}

TINY_OPT = {
    "name": "adamw",
    "args": {"lr": 1e-3, "weight_decay": 1e-5, "epoch": 4, "eval_every_eps": 2,
             "scheduler": "mix", "max_lr": 2e-3, "min_lr": 1e-4, "final_lr": 1e-4},
}


def _paths(tmp_path, name):
    return {
        "ckpt_path": str(tmp_path / f"{name}_ckpt"),
        "loss_path": str(tmp_path / f"{name}_loss.png"),
        "result_path": str(tmp_path / f"{name}_result.png"),
        "database_path": str(tmp_path / f"{name}_db.csv"),
    }


def static_toy_config(tmp_path, name, setup=None, dataset=None):
    """Shared static-fx toy experiment config (writes the dataset too)."""
    make_static_fx_dataset(str(tmp_path / f"{name}.npz"))
    s = {"seed": 0, "trainer_name": "static", "train": True}
    s.update(setup or {})
    d = {"name": name, "metaname": "elliptic_pdes/Poisson-Gauss",
         "base_path": str(tmp_path), "train_size": 8, "val_size": 2,
         "test_size": 2, "batch_size": 4}
    d.update(dataset or {})
    return {"setup": s, "model": TINY_MODEL, "dataset": d,
            "optimizer": TINY_OPT, "path": _paths(tmp_path, name)}


def test_static_trainer_fx_end_to_end(tmp_path):
    from gaot_tpu.train import StaticTrainer

    make_static_fx_dataset(str(tmp_path / "poisson_toy.npz"))
    config = {
        "setup": {"seed": 0, "trainer_name": "static", "train": True},
        "model": TINY_MODEL,
        "dataset": {
            "name": "poisson_toy",
            "metaname": "elliptic_pdes/Poisson-Gauss",
            "base_path": str(tmp_path),
            "train_size": 16, "val_size": 4, "test_size": 4,
            "batch_size": 6, "shuffle": True,
        },
        "optimizer": TINY_OPT,
        "path": _paths(tmp_path, "fx"),
    }
    trainer = StaticTrainer(config)
    assert trainer.coord_mode == "fx"

    first_batch = next(iter(trainer.train_loader))
    loss0 = float(trainer.train_step(first_batch))
    trainer.fit(verbose=False)
    lossN = trainer.validate(trainer.val_loader)
    assert np.isfinite(loss0) and np.isfinite(lossN)
    assert lossN < loss0  # learned *something*

    metric = trainer.datarow["relative error (direct)"]
    assert np.isfinite(metric) and metric > 0
    assert os.path.exists(config["path"]["loss_path"])
    assert os.path.exists(config["path"]["result_path"])

    # checkpoint roundtrip
    params_before = trainer.params
    trainer.load_ckpt()
    import jax

    for a, b in zip(jax.tree.leaves(params_before), jax.tree.leaves(trainer.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_static_trainer_vx_end_to_end(tmp_path):
    from gaot_tpu.train import StaticTrainer

    make_static_vx_dataset(str(tmp_path / "airfoil_toy.npz"))
    config = {
        "setup": {"seed": 0, "trainer_name": "static", "train": True},
        "model": {**TINY_MODEL},
        "dataset": {
            "name": "airfoil_toy",
            "metaname": "compressible_flow/naca0012",
            "base_path": str(tmp_path),
            "train_size": 8, "val_size": 2, "test_size": 2,
            "batch_size": 4, "shuffle": True,
        },
        "optimizer": {**TINY_OPT, "args": {**TINY_OPT["args"], "epoch": 2}},
        "path": _paths(tmp_path, "vx"),
    }
    trainer = StaticTrainer(config)
    assert trainer.coord_mode == "vx"
    trainer.fit(verbose=False)
    metric = trainer.datarow["relative error (direct)"]
    assert np.isfinite(metric) and metric > 0


def test_sequential_trainer_end_to_end(tmp_path):
    from gaot_tpu.train import SequentialTrainer

    make_sequential_fx_dataset(str(tmp_path / "ns_toy.npz"))
    config = {
        "setup": {"seed": 0, "trainer_name": "sequential", "train": True},
        "model": TINY_MODEL,
        "dataset": {
            "name": "ns_toy",
            "metaname": "incompressible_fluids/NS-Gauss",
            "base_path": str(tmp_path),
            "train_size": 10, "val_size": 3, "test_size": 3,
            "batch_size": 8, "shuffle": True,
            "max_time_diff": 14, "time_step": 2,
            "stepper_mode": "time_der", "predict_mode": "all",
            "metric": "final_step",
        },
        "optimizer": {**TINY_OPT, "args": {**TINY_OPT["args"], "epoch": 2}},
        "path": _paths(tmp_path, "seq"),
    }
    trainer = SequentialTrainer(config)
    assert trainer.coord_mode == "fx"
    # time-pair enumeration: lags {2,...,14}, stride 2 over 15 steps → 28 pairs
    assert trainer.train_loader.num_samples == 10 * 28
    trainer.fit(verbose=False)
    for key in ["relative error (direct)", "relative error (auto2)",
                "relative error (auto4)"]:
        assert np.isfinite(trainer.datarow[key])
        assert trainer.datarow[key] > 0


@pytest.mark.parametrize("stepper_mode", ["output", "residual"])
def test_sequential_stepper_modes(tmp_path, stepper_mode):
    from gaot_tpu.data.sequential import DynamicPairBatcher, SequentialDataProcessor
    from gaot_tpu.core.config import DatasetConfig, merge_config
    from gaot_tpu.core.metadata import DATASET_METADATA

    make_sequential_fx_dataset(str(tmp_path / "ns_toy.npz"))
    cfg = merge_config(DatasetConfig, {
        "name": "ns_toy", "metaname": "incompressible_fluids/NS-Gauss",
        "base_path": str(tmp_path), "train_size": 10, "val_size": 3,
        "test_size": 3, "stepper_mode": stepper_mode,
    })
    proc = SequentialDataProcessor(cfg, DATASET_METADATA[cfg.metaname])
    splits, is_vx = proc.load_and_process_data()
    assert not is_vx
    batcher = DynamicPairBatcher(
        splits["train"]["u"], splits["train"]["c"], splits["train"]["t"],
        cfg.max_time_diff, cfg.time_step, stepper_mode, proc.stats)
    batch = batcher.get_batch(np.arange(4))
    u_dim = splits["train"]["u"].shape[-1]
    assert batch["input"].shape[-1] == u_dim + 2
    assert batch["target"].shape[-1] == u_dim
    # targets are normalized: roughly zero-mean unit-ish scale
    full = batcher.get_batch(np.arange(len(batcher)))
    assert abs(full["target"].mean()) < 1.0
    assert 0.1 < full["target"].std() < 10.0


def test_sequential_trainer_vx_end_to_end(tmp_path):
    """vx-mode sequential training + rollout (beyond the reference, whose vx
    rollout raises NotImplementedError)."""
    from gaot_tpu.core.metadata import DATASET_METADATA, Metadata
    from gaot_tpu.train import SequentialTrainer
    from synthetic import make_sequential_vx_dataset

    metaname = "_test/seq_vx_toy"
    DATASET_METADATA[metaname] = Metadata(
        periodic=False, group_u="u", group_c="c", group_x="x", type="gaot",
        domain_x=([0, 0], [1, 1]), domain_t=(0, 1), fix_x=False,
        active_variables=[0], chunked_variables=[0], num_variable_chunks=1,
        signed={"u": [True], "c": [True]},
        names={"u": ["$u$"], "c": ["$c$"]},
        global_mean=[0.0], global_std=[1.0],
    )
    try:
        make_sequential_vx_dataset(str(tmp_path / "seq_vx_toy.npz"))
        config = {
            "setup": {"seed": 0, "trainer_name": "sequential", "train": True},
            "model": TINY_MODEL,
            "dataset": {
                "name": "seq_vx_toy", "metaname": metaname,
                "base_path": str(tmp_path),
                "train_size": 6, "val_size": 2, "test_size": 2,
                "batch_size": 4, "max_time_diff": 14, "time_step": 2,
                "stepper_mode": "output", "predict_mode": "autoregressive",
                "metric": "final_step",
            },
            "optimizer": {**TINY_OPT, "args": {**TINY_OPT["args"], "epoch": 2}},
            "path": _paths(tmp_path, "seq_vx"),
        }
        trainer = SequentialTrainer(config)
        assert trainer.coord_mode == "vx"
        trainer.fit(verbose=False)
        assert np.isfinite(trainer.datarow["relative error (autoregressive)"])
    finally:
        del DATASET_METADATA[metaname]


def test_sequential_short_trajectory_and_no_test_split(tmp_path):
    """max_time_diff < 14 must evaluate (predict-mode indices adapt) and
    test_size=0 must not break model init (shape batch falls back)."""
    from gaot_tpu.train import SequentialTrainer, StaticTrainer

    make_sequential_fx_dataset(str(tmp_path / "ns_short.npz"), num_timesteps=11)
    config = {
        "setup": {"seed": 0, "trainer_name": "sequential", "train": True},
        "model": TINY_MODEL,
        "dataset": {
            "name": "ns_short",
            "metaname": "incompressible_fluids/NS-Gauss",
            "base_path": str(tmp_path),
            "train_size": 8, "val_size": 2, "test_size": 3,
            "batch_size": 4, "shuffle": True,
            "max_time_diff": 10, "time_step": 2,
            "stepper_mode": "time_der", "predict_mode": "all",
            "metric": "final_step",
        },
        "optimizer": {**TINY_OPT, "args": {**TINY_OPT["args"], "epoch": 1}},
        "path": _paths(tmp_path, "seq_short"),
    }
    trainer = SequentialTrainer(config)
    trainer.fit(verbose=False)
    for key in ["relative error (direct)", "relative error (auto2)"]:
        assert np.isfinite(trainer.datarow[key])

    make_static_fx_dataset(str(tmp_path / "poisson_notest.npz"))
    config2 = {
        "setup": {"seed": 0, "trainer_name": "static", "train": True},
        "model": TINY_MODEL,
        "dataset": {
            "name": "poisson_notest",
            "metaname": "elliptic_pdes/Poisson-Gauss",
            "base_path": str(tmp_path),
            "train_size": 16, "val_size": 4, "test_size": 0,
            "batch_size": 8,
        },
        "optimizer": {**TINY_OPT, "args": {**TINY_OPT["args"], "epoch": 1}},
        "path": _paths(tmp_path, "notest"),
    }
    t2 = StaticTrainer(config2)          # init_model must not crash
    loss = float(t2.train_step(next(iter(t2.train_loader))))
    assert np.isfinite(loss)


@pytest.mark.parametrize("mode", ["fx", "vx"])
def test_multiscale_trainer_with_transpose_backward(tmp_path, mode):
    """scales > 1 (+ learned scale weights) through the full trainer with the
    default transpose-graph backward — per-scale graphs AND per-scale
    transpose graphs must line up."""
    from gaot_tpu.train import StaticTrainer

    if mode == "fx":
        make_static_fx_dataset(str(tmp_path / "ms.npz"))
        metaname = "elliptic_pdes/Poisson-Gauss"
    else:
        make_static_vx_dataset(str(tmp_path / "ms.npz"))
        metaname = "compressible_flow/naca0012"
    model = {
        **TINY_MODEL,
        "args": {
            **TINY_MODEL["args"],
            "magno": {**TINY_MODEL["args"]["magno"],
                      "scales": [1.0, 2.0], "use_scale_weights": True},
        },
    }
    config = {
        "setup": {"seed": 0, "trainer_name": "static", "train": True},
        "model": model,
        "dataset": {
            "name": "ms", "metaname": metaname, "base_path": str(tmp_path),
            "train_size": 8, "val_size": 2, "test_size": 2, "batch_size": 4,
        },
        "optimizer": {**TINY_OPT, "args": {**TINY_OPT["args"], "epoch": 1}},
        "path": _paths(tmp_path, f"ms_{mode}"),
    }
    trainer = StaticTrainer(config)
    assert trainer.coord_mode == mode
    trainer.fit(verbose=False)
    assert np.isfinite(trainer.datarow["relative error (direct)"])
