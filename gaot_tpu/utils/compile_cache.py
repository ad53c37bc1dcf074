"""Persistent XLA compile cache + measured compile-time registry.

Two warmup costs dominate short runs on TPU:
- the whole-epoch-scan program compile (~86 s measured on v5e at the fx
  flagship scale, BENCH_r02), and
- the per-step program compile (~40 s).

Both are pure recomputation when the same shapes recompile across runs, so
(1) `setup_persistent_cache` points JAX's compilation cache at a
REPO-LOCAL directory (``.cache/jax`` next to the package) instead of /tmp —
surviving tmp wipes between sessions — and (2) the compile-time registry
records how long each scan program actually took to build, so the
``epoch_scan=auto`` decision (train/base_trainer.py::fit) can amortize the
MEASURED cost instead of a hard-coded step-count constant.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_CACHE_DIR = os.environ.get("GAOT_CACHE_DIR", os.path.join(_REPO, ".cache"))
_STATS_PATH = os.path.join(_CACHE_DIR, "compile_stats.json")
_SETUP_DONE = False


def setup_persistent_cache() -> str:
    """Point jax's compilation cache at the repo-local persistent dir.
    Respects an explicit JAX_COMPILATION_CACHE_DIR. Idempotent."""
    global _SETUP_DONE
    import jax

    path = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(_CACHE_DIR, "jax"))
    if _SETUP_DONE:
        return path
    _SETUP_DONE = True
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return path


def _load_stats() -> dict:
    try:
        with open(_STATS_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def record_compile_time(key: str, seconds: float) -> None:
    """Record a measured program-build time (best effort).

    The measurement is first-minus-second epoch wall time, so a run that hit
    a warm persistent cache measures ~the 1 s floor — it must not overwrite
    the true cold-compile cost (epoch_scan=auto would then choose the scan on
    short runs and eat the full compile after any cache invalidation). Only
    values that look like a real compile (>5 s) replace an existing entry;
    warm-run floors are recorded only when nothing is known yet."""
    stats = _load_stats()
    prev = stats.get(key)
    if prev is not None and seconds <= 5.0:
        return
    stats[key] = round(float(seconds), 2)
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        tmp = _STATS_PATH + f".{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(stats, f, indent=1)
        os.replace(tmp, _STATS_PATH)
    except OSError:
        pass


def lookup_compile_time(key: str) -> Optional[float]:
    v = _load_stats().get(key)
    return float(v) if v is not None else None


class CompileTimer:
    """Times the span between construction and .done(); used to bracket a
    first (compiling) dispatch and subtract a steady-state dispatch."""

    def __init__(self):
        self.t0 = time.perf_counter()

    def done(self) -> float:
        return time.perf_counter() - self.t0
