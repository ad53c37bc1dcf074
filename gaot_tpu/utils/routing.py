"""Kernel-route registry: which compute paths a run actually took.

The fused/flash kernels are dispatched at trace time from runtime predicates
(backend, dtype, shape support — models/agno.py, models/transformer.py).
Measurement attribution needs the decisions on record, so every dispatch
site calls record_route() as it traces and the trainer prints one line after
the first compiled step (train/base_trainer.py). The reference has no
equivalent (its kernels are fixed CUDA library calls).

Config fields (model.args.transformer.fused_ffn,
model.args.transformer.attn_backend) choose the route; the GAOT_FUSED_FFN / GAOT_ATTN_BACKEND env vars remain measurement overrides.
"""
from __future__ import annotations

from typing import Dict

_ROUTES: Dict[str, str] = {}


def record_route(name: str, value: str) -> None:
    """Record the route a dispatch site took (trace-time Python)."""
    prev = _ROUTES.get(name)
    if prev is not None and prev != value:
        # Mixed routes within one run (e.g. fused AGNO on the decoder but
        # not the encoder's shapes) — keep both, they matter for attribution.
        value = prev if value in prev.split("+") else f"{prev}+{value}"
    _ROUTES[name] = value


def reset_routes() -> None:
    _ROUTES.clear()


def active_routes() -> Dict[str, str]:
    return dict(_ROUTES)


def format_routes() -> str:
    if not _ROUTES:
        return "(none recorded)"
    return " ".join(f"{k}={v}" for k, v in sorted(_ROUTES.items()))


def resolve_mode(env_var: str, config_mode: str) -> str:
    """'on' | 'off' | 'auto' — env override ('1'/'0') wins over config."""
    import os

    env = os.environ.get(env_var)
    if env == "1":
        return "on"
    if env == "0":
        return "off"
    return config_mode
