"""Minimal real-TPU repro for the fused AGNO kernel (fwd + bwd)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from gaot_tpu.ops.pallas.fused_agno import (fused_agno_bwd, fused_agno_fwd,
                                            reference_fused_agno)

K, Q, C, D, H = 16, 512, 64, 2, 64
rng = np.random.default_rng(0)
dt = jnp.bfloat16
gath = jnp.asarray(rng.normal(size=(K, Q, C + D)), dt)
dst = jnp.asarray(rng.normal(size=(Q, D)), dt)
mask = jnp.asarray(rng.random((Q, K)) > 0.2)
ws = [jnp.asarray(rng.normal(size=s), dt) * 0.3
      for s in [(2 * D, H), (H, H), (H, C)]]
bs = [jnp.asarray(rng.normal(size=(s,)), dt) * 0.1 for s in [H, H, C]]

print("backend:", jax.default_backend())
out = jax.jit(lambda *a: fused_agno_fwd(*a, c_f=C, d=D, use_attn=True,
                                        interpret=False))(ws, bs, gath, dst,
                                                          mask)
ref = reference_fused_agno(ws, bs, gath, dst, mask, c_f=C, d=D, use_attn=True)
print("fwd ok, max err:",
      float(jnp.max(jnp.abs(out.astype(jnp.float32) -
                            ref.astype(jnp.float32)))))
dout = jnp.asarray(rng.normal(size=(Q, C)), dt)
coef_e, dws, dbs = jax.jit(
    lambda *a: fused_agno_bwd(*a, c_f=C, d=D, use_attn=True,
                              interpret=False))(ws, bs, gath, dst, mask, dout)
print("bwd ok:", coef_e.shape, [w.shape for w in dws])
