"""Checkpointing via Orbax.

Upgrades the reference's model-only torch state_dict files
(src/core/trainer_utils.py:23-92) to full training-state checkpoints:
params, optimizer state, step, and best-validation tracking — so resume
continues the LR schedule and best-model selection instead of restarting
them (the reference loses both; SURVEY.md §5).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    step: int = 0, extra: Optional[Dict] = None) -> None:
    """Save a training checkpoint to ``path`` (a directory)."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"params": _to_host(params), "step": step}
    if opt_state is not None:
        payload["opt_state"] = _to_host(opt_state)
    if extra:
        payload["extra"] = _to_host(extra)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)


def restore_checkpoint(path: str, params_template: Any = None) -> Dict:
    """Restore a checkpoint saved by :func:`save_checkpoint`.

    If ``params_template`` is given, the restored params are validated to
    have the same tree structure.
    """
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path)
    if params_template is not None:
        want = jax.tree.structure(params_template)
        got = jax.tree.structure(restored["params"])
        if want != got:
            raise ValueError(
                f"Checkpoint param structure mismatch:\n  want {want}\n  got {got}")
    return restored
