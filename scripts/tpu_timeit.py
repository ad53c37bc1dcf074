"""Reliable kernel timing on remote (tunneled) TPU devices.

Host-side loops are useless through the tunnel: each dispatch costs ~5-10 ms
of round-trip overhead, identical (executable, args) calls may be memoized,
and execution of large-output computations can defer until a value is
actually fetched. So: run the iteration loop ON DEVICE inside one jit
(lax.fori_loop over a stacked batch of distinct inputs, accumulating a
scalar), dispatch once, fetch one float.

    t = device_timeit(fn, variants, iters=50)   # seconds per call of fn

fn maps *one* input tuple to anything; its outputs are scalar-reduced and
accumulated so nothing can be dead-code-eliminated.
"""
import time

import numpy as np


def _scalar_reduce(out):
    import jax
    import jax.numpy as jnp

    leaves = jax.tree.leaves(out)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves
               if hasattr(l, "astype"))


def device_timeit(fn, variants, iters=50, warmup=True):
    """Average seconds per fn(*variant) call, measured on device.

    variants: list of input tuples (pytrees of arrays) with identical
    structure; the loop cycles through them so the runtime can't memoize.
    """
    import jax
    import jax.numpy as jnp

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *variants)
    n = len(variants)

    @jax.jit
    def run(stacked, iters_arr):
        def body(i, acc):
            inp = jax.tree.map(lambda x: x[i % n], stacked)
            return acc + _scalar_reduce(fn(*inp)) * 1e-30
        return jax.lax.fori_loop(0, iters_arr.shape[0], body,
                                 jnp.float32(0.0))

    if warmup:
        float(run(stacked, jnp.zeros(2)))
        float(run(stacked, jnp.zeros(2 + iters)))
    # Two runs with different iteration counts cancel the fixed
    # dispatch + fetch overhead.
    t0 = time.perf_counter()
    float(run(stacked, jnp.zeros(2)))
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(stacked, jnp.zeros(2 + iters)))
    t_long = time.perf_counter() - t0
    return max(t_long - t_short, 1e-9) / iters


def make_variants(shapes_dtypes, n=4, seed=0):
    """n input tuples of random arrays: [(shape, dtype), ...] per tuple."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        out.append(tuple(
            jnp.asarray(rng.normal(size=shape).astype(np.float32), dtype=dtype)
            for shape, dtype in shapes_dtypes))
    return out
