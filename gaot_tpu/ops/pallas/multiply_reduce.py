"""Pallas consumers for the AGNO gather-multiply-reduce (node-leading layout).

The nbc gather path (ops/gather_apply.py) materializes bulk-row gathers
`gath[k, q, b*c] = f[idx[k, q], b*c]` and then reduces them against per-edge
coefficients. Left to XLA, that reduce picks a `{0,2,1}` layout and an fp32
accumulator buffer, inserting ~800 MB-scale physical copies/converts around
the gathered tensor (measured ~9 ms per AGNO call on v5e). These kernels pin
the natural row-major layout and stream once:

- :func:`multiply_reduce_k` — out[q, b, c] = Σ_k coef[k, q, c]·gath[k, q, b, c]
  (the forward reduce, and the d_f reduce over the transpose graph);
- :func:`multiply_reduce_b` — d_coef[k, q, c] = Σ_b dout[q, b, c]·gath[k, q, b, c].

Everything is K-major so blocks are [1, tile_q, W]; the batch·channel axis W
stays flattened in the lane dimension (coef is tiled across it with
pltpu.repeat; the b-reduction uses static lane slices).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Target per-input block size. Live scoped-VMEM is ~8x this (double-buffered
# gath/coef/out blocks + the fp32 accumulator scratch), against the ~16 MB
# scoped budget — 2 MB blocks OOM'd at 3D shapes with fp32 coef.
_VMEM_BLOCK_BYTES = 1 << 20


def _fold_r(q: int, b: int, w: int) -> int:
    """Query-folding factor for narrow (lane-starved) shapes.

    The kernels want the lane dim W = b*c to be a multiple of 128. The
    b == 1 case (vx-flattened batches: W = C = 64) is elementwise in (q, w)
    for multiply_reduce_k and, with b == 1, for multiply_reduce_b too — so r
    adjacent queries can be viewed as ONE row of r*W lanes with identical
    semantics. Returns the fold factor (1 = no fold)."""
    if b != 1 or w >= 128 or w < 1 or 128 % w != 0:
        return 1
    r = 128 // w
    return r if q % r == 0 else 1


def _tile_q(q: int, w: int, itemsize: int) -> int:
    """Largest q-tile that divides q, is a multiple of 8, and fits the block
    budget. Returns 0 if no valid tile exists (caller falls back to XLA)."""
    budget = max(_VMEM_BLOCK_BYTES // max(w * itemsize, 1), 1)
    t = min(q, budget)
    t -= t % 8
    while t >= 8:
        if q % t == 0:
            return t
        t -= 8
    # No tile of >= 8 rows fits the budget (or divides q): only a q that is
    # itself a single small block is acceptable — never return a tile larger
    # than the budget.
    return q if q <= min(budget, 8) else 0


def supported(q: int, b: int, c: int, itemsize: int = 2) -> bool:
    """Shapes the kernels handle: lane dim W=b*c a multiple of 128 — either
    directly or after query-folding (b == 1, _fold_r) — and a valid
    q-tiling. (Small CPU-test shapes fall back to the einsum path.)"""
    w = b * c
    r = _fold_r(q, b, w)
    return ((r * w) % 128 == 0 and c % 8 == 0
            and _tile_q(q // r, r * w, itemsize) > 0)


def _mulred_k_kernel(gath_ref, coef_ref, o_ref, acc_ref, *, b):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gk = gath_ref[0].astype(jnp.float32)                 # [tq, w]
    cf = coef_ref[0].astype(jnp.float32)                 # [tq, c]
    acc_ref[:] += gk * pltpu.repeat(cf, b, 1)            # tile coef over b

    @pl.when(j == pl.num_programs(1) - 1)
    def _fin():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def multiply_reduce_k(coef_km: jnp.ndarray, gath_km: jnp.ndarray,
                      b: int) -> jnp.ndarray:
    """out[q, w] = Σ_k coef_km[k, q, :]·(tiled over b) * gath_km[k, q, w].

    coef_km: [K, Q, C]; gath_km: [K, Q, W] with W = b*C. Returns [Q, W].
    """
    kx, qx, cx = coef_km.shape
    w = gath_km.shape[-1]
    r = _fold_r(qx, b, w)
    if r > 1:
        # Narrow-W (vx) shapes: fold r adjacent queries into one 128-lane
        # row — exact, since the reduce is over k and elementwise in (q, w).
        out = multiply_reduce_k(coef_km.reshape(kx, qx // r, r * cx),
                                gath_km.reshape(kx, qx // r, r * w), b)
        return out.reshape(qx, w)
    tq = _tile_q(qx, w, gath_km.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_mulred_k_kernel, b=b),
        grid=(qx // tq, kx),
        in_specs=[
            pl.BlockSpec((1, tq, w), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, cx), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, w), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qx, w), gath_km.dtype),
        scratch_shapes=[pltpu.VMEM((tq, w), jnp.float32)],
    )(gath_km, coef_km)


def _mulred_b_kernel(gath_ref, dout_ref, o_ref, *, b, c):
    gk = gath_ref[0].astype(jnp.float32)                 # [tq, w]
    do = dout_ref[:].astype(jnp.float32)                 # [tq, w]
    prod = gk * do
    acc = prod[:, :c]
    for m in range(1, b):                                # static lane slices
        acc = acc + prod[:, m * c:(m + 1) * c]
    o_ref[0] = acc.astype(o_ref.dtype)


def multiply_reduce_b(gath_km: jnp.ndarray, dout: jnp.ndarray,
                      b: int, c: int) -> jnp.ndarray:
    """d_coef[k, q, c] = Σ_b gath_km[k, q, (b,c)]·dout[q, (b,c)].

    gath_km: [K, Q, W]; dout: [Q, W] with W = b*c. Returns [K, Q, C].
    """
    kx, qx, w = gath_km.shape
    r = _fold_r(qx, b, w)
    if r > 1:
        # b == 1 makes the b-sum a no-op, so this too is elementwise in
        # (q, w) and query-folding is exact (see multiply_reduce_k).
        out = multiply_reduce_b(gath_km.reshape(kx, qx // r, r * w),
                                dout.reshape(qx // r, r * w), b, r * c)
        return out.reshape(kx, qx, c)
    tq = _tile_q(qx, w, gath_km.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_mulred_b_kernel, b=b, c=c),
        grid=(kx, qx // tq),
        in_specs=[
            pl.BlockSpec((1, tq, w), lambda j, i: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, w), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, c), lambda j, i: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kx, qx, c), dout.dtype),
    )(gath_km, dout)
