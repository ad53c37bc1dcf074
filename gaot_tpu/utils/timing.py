"""Execution barriers that actually work on tunneled (remote) TPU runtimes.

Measured on the axon-tunneled v5e this project benches on:
``jax.block_until_ready`` returned in 4 ms on a freshly dispatched 32-step
epoch-scan program whose COMPILE had not even started — the runtime defers
compilation and first execution of large-output computations until a
concrete value is fetched (the first fetch then took 330 s). After that
first forced execution, dispatch + block behaves normally for the same
executable.

Consequences for any timing/warmup code in this repo:
- end every warmup and every timed region with a VALUE FETCH
  (``force_value``), never a bare ``block_until_ready``;
- host-side per-call loops additionally suffer ~5-10 ms dispatch round
  trips and runtime memoization of identical calls — for microbenchmarks
  use scripts/tpu_timeit.py (on-device fori_loop, one fetch).
"""
from __future__ import annotations

import numpy as np


def force_value(x) -> float:
    """Fetch a scalar value from (the last element of) ``x``.

    Forces compilation + execution of everything ``x`` depends on, and
    returns the fetched float — the only reliable execution barrier on the
    tunneled TPU runtime (see module docstring).
    """
    import jax

    arr = np.asarray(jax.device_get(x))
    return float(arr.reshape(-1)[-1])
