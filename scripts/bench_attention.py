"""Microbenchmark of attention backends on the current device.

Compares, at the flagship processor shape (B=64, S=1024, H=8, D=32):
- xla: the einsum GQA path (materializes fp32 [S, S] logits)
- pallas: the in-repo flash forward kernel (XLA backward)
- jax_flash: jax.experimental.pallas.ops.tpu.flash_attention (fwd+bwd kernels)

for forward-only and forward+backward, using the on-device loop timer
(tpu_timeit.device_timeit) that survives the remote-device tunnel.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tpu_timeit import device_timeit, make_variants  # noqa: E402


def main(b=64, s=1024, h=8, d=32, dtype_name="bfloat16"):
    import jax
    import jax.numpy as jnp

    from gaot_tpu.models.transformer import gqa_attention_xla
    from gaot_tpu.ops.pallas.flash_attention import flash_attention_gqa

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    variants = make_variants([((b, s, h, d), dtype)] * 3, n=4)

    backends = {"xla": gqa_attention_xla, "pallas": flash_attention_gqa}
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as jax_flash)

        def jax_flash_bshd(q, k, v):
            out = jax_flash(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                            v.transpose(0, 2, 1, 3), causal=False,
                            sm_scale=1.0 / (q.shape[-1] ** 0.5))
            return out.transpose(0, 2, 1, 3)

        backends["jax_flash"] = jax_flash_bshd
    except Exception as e:
        print(f"jax_flash unavailable: {e}", file=sys.stderr)

    for name, fn in backends.items():
        def step(q, k, v, fn=fn):
            def loss(q, k, v):
                return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)
            return jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)

        try:
            t_f = device_timeit(fn, variants, iters=30)
            t_s = device_timeit(step, variants, iters=30)
            print(f"[{dtype_name}] {name:10s} fwd {t_f*1e3:7.2f}ms   "
                  f"fwd+bwd {t_s*1e3:7.2f}ms", flush=True)
        except Exception as e:
            print(f"[{dtype_name}] {name:10s} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main(dtype_name=sys.argv[1] if len(sys.argv) > 1 else "bfloat16")
