"""CLI + config system tests."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from synthetic import make_static_fx_dataset  # noqa: E402

from gaot_tpu.core.config import (  # noqa: E402
    ConfigError,
    GAOTConfig,
    load_config_file,
    merge_config,
)


def test_merge_config_defaults_and_overrides():
    cfg = merge_config(GAOTConfig, {
        "model": {"latent_tokens_size": [32, 32],
                  "args": {"magno": {"radius": 0.05}}},
        "optimizer": {"args": {"lr": 1e-4}},
    })
    assert cfg.model.latent_tokens_size == (32, 32)
    assert cfg.model.args.magno.radius == 0.05
    assert cfg.model.args.magno.hidden_size == 64  # default preserved
    assert cfg.optimizer.args.lr == 1e-4
    assert cfg.optimizer.args.weight_decay == 1e-3  # default


def test_merge_config_rejects_unknown_keys():
    with pytest.raises(ConfigError, match="Unknown config key"):
        merge_config(GAOTConfig, {"model": {"nonexistent_field": 1}})


def test_merge_config_validates_magno():
    with pytest.raises(ConfigError, match="sample_ratio"):
        merge_config(GAOTConfig, {"model": {"args": {"magno": {
            "sampling_strategy": "ratio"}}}})


def test_example_configs_parse():
    root = os.path.join(os.path.dirname(__file__), "..", "config", "examples")
    found = 0
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".json"):
                cfg = merge_config(GAOTConfig, load_config_file(os.path.join(dirpath, f)))
                assert cfg.setup.trainer_name in ("static", "sequential")
                found += 1
    assert found >= 5


@pytest.mark.slow
def test_cli_run_config_end_to_end(tmp_path):
    """Full CLI path: config file → trainer → CSV database row."""
    from gaot_tpu.cli import run_config

    make_static_fx_dataset(str(tmp_path / "poisson_toy.npz"), num_samples=16,
                           num_nodes=64)
    config = {
        "setup": {"seed": 0, "trainer_name": "static", "train": True},
        "model": {
            "latent_tokens_size": [8, 8],
            "args": {"magno": {"coord_dim": 2, "radius": 0.3, "hidden_size": 8,
                               "mlp_layers": 1, "lifting_channels": 8},
                     "transformer": {"patch_size": 2, "hidden_size": 16,
                                     "num_layers": 2,
                                     "attn_config": {"num_heads": 2,
                                                     "num_kv_heads": 2}}},
        },
        "dataset": {"name": "poisson_toy",
                    "metaname": "elliptic_pdes/Poisson-Gauss",
                    "base_path": str(tmp_path),
                    "train_size": 8, "val_size": 4, "test_size": 4,
                    "batch_size": 4},
        "optimizer": {"name": "adamw",
                      "args": {"lr": 1e-3, "epoch": 2, "eval_every_eps": 1,
                               "scheduler": "none"}},
        "path": {"ckpt_path": str(tmp_path / "ckpt"),
                 "loss_path": str(tmp_path / "loss.png"),
                 "result_path": str(tmp_path / "result.png"),
                 "database_path": str(tmp_path / "db.csv")},
    }
    cfg_path = tmp_path / "toy.json"
    cfg_path.write_text(json.dumps(config))
    run_config(str(cfg_path))

    import pandas as pd

    db = pd.read_csv(tmp_path / "db.csv")
    assert len(db) == 1
    assert np.isfinite(db["relative error (direct)"].iloc[0])
    assert db["nparams"].iloc[0] > 0
    # second run appends
    run_config(str(cfg_path))
    db = pd.read_csv(tmp_path / "db.csv")
    assert len(db) == 2
