#!/usr/bin/env python
"""Warmup-time attribution probe: where does a warm-persistent-cache run
spend its first-dispatch seconds?

Splits the vx train-step warmup into trace/lower, compile (persistent-cache
lookup included), and first-execute phases, with jax's cache-miss
explanations enabled. Round-3 verdict: second cold-process runs still paid
90-812 s on the TPU backend; this probe is how we find out which phase.

Usage: python scripts/compile_probe.py [num_nodes] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t_import0 = time.perf_counter()
import jax  # noqa: E402

from gaot_tpu.utils.compile_cache import setup_persistent_cache  # noqa: E402

setup_persistent_cache()
jax.config.update("jax_explain_cache_misses", True)

num_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 512
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2

import bench  # noqa: E402

print(f"[probe] import+setup: {time.perf_counter() - t_import0:.2f}s",
      file=sys.stderr)

t0 = time.perf_counter()
train_step, make_indices, params, opt_state = bench.build_vx_workload(
    batch_size=batch, num_nodes=num_nodes, train_size=8)
print(f"[probe] workload build (incl. model.init jit): "
      f"{time.perf_counter() - t0:.2f}s", file=sys.stderr)

import functools  # noqa: E402

import numpy as np  # noqa: E402

rng = np.random.default_rng(1)
key = jax.random.key(1)
idx = make_indices(rng)

args = (params, opt_state, key, idx)
if isinstance(train_step, functools.partial):  # device data bound as jit arg
    args = (*train_step.args, *args)
    train_step = train_step.func

t0 = time.perf_counter()
lowered = train_step.lower(*args)
t_lower = time.perf_counter() - t0
print(f"[probe] trace+lower: {t_lower:.2f}s", file=sys.stderr)

t0 = time.perf_counter()
compiled = lowered.compile()
t_compile = time.perf_counter() - t0
print(f"[probe] compile (cache lookup incl.): {t_compile:.2f}s",
      file=sys.stderr)

t0 = time.perf_counter()
out = compiled(*args)
jax.block_until_ready(out[2])
print(f"[probe] first execute: {time.perf_counter() - t0:.2f}s",
      file=sys.stderr)
