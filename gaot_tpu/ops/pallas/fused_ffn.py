"""Fused SwiGLU FFN (Pallas, TPU).

The transformer FFN (models/transformer.py::FFN, mirroring the reference
src/model/layers/attn.py:133-156) is three XLA matmuls

    out = W2 · (silu(W1·x) ⊙ W3·x)

whose [R, F] intermediates (R = B·S rows, F = 4·hidden) round-trip HBM
between ops. Profiled on the fx flagship (B=64, S=1024, hidden 256,
F=1024) each dot_general runs at 640-870 GiB/s — pinned at the HBM
roofline, not the MXU: the matmuls themselves report 50-110 TFLOP/s model
rate but are classified HBM-bound, because every [65536, 1024] bf16
intermediate is a 134 MB HBM round-trip.

This kernel keeps h1/h3/z in VMEM: the grid walks row tiles, each step
loads an [T, M] x-tile, runs the three matmuls back to back on the MXU
(bf16 operands, fp32 accumulation), and writes only the [T, M] output.
HBM traffic per tile drops from ~5 tensors to x + out.

Backward recomputes h1/h3 in VMEM (two extra [T,M]@[M,F] matmuls — ~0.35 ms
of MXU work on the flagship, cheaper than 4×134 MB of save/restore traffic),
accumulates dW1/dW3/dW2 in fp32 VMEM across the sequential grid, and emits
dx:

    dz  = dout · W2ᵀ
    dh1 = dz ⊙ h3 ⊙ silu'(h1),  dh3 = dz ⊙ silu(h1)
    dx  = dh1 · W1ᵀ + dh3 · W3ᵀ
    dW1 += xᵀ·dh1,  dW3 += xᵀ·dh3,  dW2 += zᵀ·dout

Engaged for bfloat16 compute on TPU (models/transformer.py routes); the
fp32 parity configuration keeps the exact XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _silu_grad(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _matmul(a, b, dims=(((1,), (0,)), ((), ()))):
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


def _fwd_kernel(x_ref, w1_ref, w3_ref, w2_ref, o_ref, *, compute_dtype):
    x = x_ref[...]
    h1 = _matmul(x, w1_ref[...])                       # [T, F] fp32
    h3 = _matmul(x, w3_ref[...])
    z = (_silu(h1) * h3).astype(compute_dtype)
    o_ref[...] = _matmul(z, w2_ref[...]).astype(o_ref.dtype)


def _bwd_kernel(x_ref, dout_ref, w1_ref, w3_ref, w2_ref,
                dx_ref, dw1_ref, dw3_ref, dw2_ref, *, compute_dtype):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw3_ref[...] = jnp.zeros_like(dw3_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    x = x_ref[...]
    dout = dout_ref[...]
    h1 = _matmul(x, w1_ref[...])                       # recompute, fp32
    h3 = _matmul(x, w3_ref[...])
    z = (_silu(h1) * h3).astype(compute_dtype)
    # dz = dout @ W2ᵀ  (contract output dim)
    dz = _matmul(dout, w2_ref[...], (((1,), (1,)), ((), ())))
    dh1 = (dz * h3 * _silu_grad(h1)).astype(compute_dtype)
    dh3 = (dz * _silu(h1)).astype(compute_dtype)
    dw1_ref[...] += _matmul(x, dh1, (((0,), (0,)), ((), ())))
    dw3_ref[...] += _matmul(x, dh3, (((0,), (0,)), ((), ())))
    dw2_ref[...] += _matmul(z, dout, (((0,), (0,)), ((), ())))
    dx = (_matmul(dh1, w1_ref[...], (((1,), (1,)), ((), ())))
          + _matmul(dh3, w3_ref[...], (((1,), (1,)), ((), ()))))
    dx_ref[...] = dx.astype(dx_ref.dtype)


def supported(r, m, f, dtype) -> int:
    """Returns the row-tile size (0 = unsupported): lane-aligned widths and
    a tile that keeps the fp32 intermediates within a VMEM budget."""
    if dtype not in (jnp.bfloat16, jnp.float32) or m % 128 or f % 128:
        return 0
    # fp32 working set per row: h1, h3, dz (+ slack); weights are resident.
    per_row = f * 4 * 4 + m * 8
    budget = 6 << 20
    if (m * f * 3) * (2 + 4) > 64 << 20:      # weights + fp32 dW accumulators
        return 0
    t = max(budget // per_row, 128) // 128 * 128
    return min(t, 2048)


def _auto_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _pad_rows(t, x, dout=None):
    r = x.shape[0]
    r_pad = -(-r // t) * t
    if r_pad != r:
        x = jnp.pad(x, ((0, r_pad - r), (0, 0)))
        if dout is not None:
            dout = jnp.pad(dout, ((0, r_pad - r), (0, 0)))
    return x, dout, r_pad


@jax.custom_vjp
def fused_ffn(x, w1, w3, w2):
    """out = silu(x·w1) ⊙ (x·w3) · w2 with VMEM-resident intermediates.

    x: [R, M]; w1, w3: [M, F]; w2: [F, M]. Returns [R, M] in x.dtype.
    """
    return _ffn_fwd(x, w1, w3, w2)[0]


def _ffn_call(x, w1, w3, w2, interpret=None):
    r, m = x.shape
    f = w1.shape[1]
    t = supported(r, m, f, x.dtype)
    assert t > 0, (r, m, f, x.dtype)
    xp, _, r_pad = _pad_rows(t, x)
    kernel = functools.partial(_fwd_kernel, compute_dtype=x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(r_pad // t,),
        in_specs=[
            pl.BlockSpec((t, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, m), x.dtype),
        interpret=_auto_interpret(interpret),
    )(xp, w1, w3, w2)
    return out[:r] if r_pad != r else out


def _ffn_fwd(x, w1, w3, w2):
    return _ffn_call(x, w1, w3, w2), (x, w1, w3, w2)


def _ffn_bwd(res, dout):
    x, w1, w3, w2 = res
    dx, dw1, dw3, dw2 = _ffn_bwd_call(x, w1, w3, w2, dout)
    return (dx, dw1.astype(w1.dtype), dw3.astype(w3.dtype),
            dw2.astype(w2.dtype))


def _ffn_bwd_call(x, w1, w3, w2, dout, interpret=None):
    r, m = x.shape
    f = w1.shape[1]
    t = supported(r, m, f, x.dtype)
    assert t > 0
    dout = dout.astype(x.dtype)
    xp, doutp, r_pad = _pad_rows(t, x, dout)
    kernel = functools.partial(_bwd_kernel, compute_dtype=x.dtype)
    row_spec = pl.BlockSpec((t, m), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(r_pad // t,),
        in_specs=[row_spec, row_spec, full, full, full],
        out_specs=[
            row_spec,
            pl.BlockSpec(w1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w3.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, m), x.dtype),
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct(w3.shape, jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
        ],
        interpret=_auto_interpret(interpret),
    )(xp, doutp, w1, w3, w2)
    dx = outs[0][:r] if r_pad != r else outs[0]
    return dx, outs[1], outs[2], outs[3]


fused_ffn.defvjp(_ffn_fwd, _ffn_bwd)


def reference_fused_ffn(x, w1, w3, w2):
    """Pure-XLA mirror matching the kernel's numerics (bf16 MXU operands,
    fp32 accumulation, fp32 silu·mul) — test oracle and CPU fallback."""
    h1 = jnp.dot(x, w1, preferred_element_type=jnp.float32)
    h3 = jnp.dot(x, w3, preferred_element_type=jnp.float32)
    z = (_silu(h1) * h3).astype(x.dtype)
    return jnp.dot(z, w2, preferred_element_type=jnp.float32).astype(x.dtype)
