"""Resume semantics and the profiler hook.

- Resume restores the FULL train state: params AND optimizer state (incl.
  the adamw step count that drives the LR schedule) — the reference saved
  model weights only, so its resume silently restarted the schedule
  (SURVEY.md §5).
- setup.profile_dir captures a jax.profiler trace around fit (cli.py).
"""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_train_e2e import static_toy_config  # noqa: E402


def _config(tmp_path, name, extra_setup=None):
    return static_toy_config(tmp_path, name, setup=extra_setup)


def test_resume_restores_optimizer_state(tmp_path):
    import jax
    import optax

    from gaot_tpu.train import StaticTrainer

    def counts(opt_state):
        return [int(v) for _, v in
                optax.tree_utils.tree_get_all_with_path(opt_state, "count")]

    trainer = StaticTrainer(_config(tmp_path, "resume_toy"))
    trainer.fit(verbose=False)   # saves params + opt_state

    fresh = StaticTrainer(_config(tmp_path, "resume_toy"))
    assert all(c == 0 for c in counts(fresh.opt_state))
    fresh.load_ckpt()

    # optimizer state (incl. step count → LR schedule position) round-trips
    for a, b in zip(jax.tree.leaves(trainer.opt_state),
                    jax.tree.leaves(fresh.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert all(c > 0 for c in counts(fresh.opt_state))  # schedule continues

    # and training continues from the restored state without error
    batch = next(iter(fresh.train_loader))
    loss = float(fresh.train_step(batch))
    assert np.isfinite(loss)


@pytest.mark.slow
def test_profile_dir_captures_trace(tmp_path):
    from gaot_tpu.cli import run_config

    profile_dir = str(tmp_path / "trace")
    config = _config(tmp_path, "prof_toy",
                     extra_setup={"profile_dir": profile_dir})
    cfg_path = tmp_path / "prof.json"
    cfg_path.write_text(json.dumps(config))
    run_config(str(cfg_path))

    assert os.path.isdir(profile_dir)
    found = [f for _, _, files in os.walk(profile_dir) for f in files]
    assert found, "profiler trace directory is empty"
