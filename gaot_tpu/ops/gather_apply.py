"""Scatter-free gather-multiply-reduce: the AGNO apply primitive.

Computes  out[b, q, c] = Σ_k coef[(b,) q, k, c] · f[b, idx[q, k], c]
(padded edges must already have coef == 0).

Plain XLA autodiff of this expression produces a scatter-add for d_f —
serialized and slow on TPU. This custom VJP replaces it with gathers over a
host-precomputed transpose graph (ops/padding.py::transpose_graph):

    d_f[b, n, c]  = Σ_j coef_flat[edge_pos[n, j], c] · dout[b, query[n, j], c]

which is two dense gathers + a masked reduce — the same shape of work as the
forward, and fully vectorized. d_coef is a gather as well. Because coef
carries the (possibly edge-dropped) mask, the backward stays exact under
training-time edge sampling.

Shapes: f is [B, N, C] (fx batched) or [N, C] (vx-flattened); coef is
[Q, K, C] (shared across the batch — linear transforms) or [B, Q, K, C].
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .padding import GroupedTransposeGraph, TransposeGraph


def _scan_unroll():
    """FLOP-accounting hook (read at trace time): XLA's cost analysis counts
    a while-loop body ONCE regardless of trip count, so bench.py's
    compiled_flops sets GAOT_FLOPS_UNROLL=1 while re-lowering the step — the
    per-sample d_f scans below then fully unroll and every iteration's FLOPs
    are visible to the cost model. Never set during timed runs."""
    return os.environ.get("GAOT_FLOPS_UNROLL") == "1"


def _forward(coef, f, indices):
    if f.ndim == 2:                       # unbatched (vx-flattened)
        gathered = f[indices]             # [Q, K, C]
        return jnp.sum(coef * gathered, axis=-2)
    gathered = f[:, indices, :]           # [B, Q, K, C]
    c = coef if coef.ndim == 4 else coef[None]
    return jnp.sum(c * gathered, axis=-2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def gather_multiply_reduce(coef: jnp.ndarray, f: jnp.ndarray,
                           indices: jnp.ndarray, edge_pos: jnp.ndarray,
                           tquery: jnp.ndarray, tmask: jnp.ndarray,
                           num_samples: int = 1) -> jnp.ndarray:
    return _fwd(coef, f, indices, edge_pos, tquery, tmask, num_samples)[0]


def _fwd(coef, f, indices, edge_pos, tquery, tmask, num_samples=1):
    if f.ndim == 2:
        # Leading-axis bulk-row gather with a materialization boundary (the
        # nbc path's discipline): XLA otherwise fuses the gather into its
        # consumer and serializes it (~33 GiB/s measured on the vx decoder
        # backward vs ~300 GiB/s as a row gather). K-major so the Pallas
        # reduce consumer streams the rows in natural layout (with query-
        # folding for the narrow W = C lane dim). The gathered rows are
        # SAVED for the backward — d_coef re-reads them sequentially instead
        # of re-gathering at random-row bandwidth.
        gath_km = _bulk_gather(f, indices.T)          # [K, Q, C]
        out = _mulred_k_dispatch(jnp.swapaxes(coef, 0, 1), gath_km, 1)
        return out, (coef, gath_km, edge_pos, tquery, tmask)
    out = _forward(coef, f, indices)
    return out, (coef, f, indices, edge_pos, tquery, tmask)


def _bwd(num_samples, res, dout):
    zeros_i = lambda x: jnp.zeros_like(x)  # integer/bool cotangents are inert
    if len(res) == 5:                      # flat (vx-flattened) layout
        coef, gath_km, edge_pos, tquery, tmask = res     # gath_km: [K, Q, C]
        f_dtype = gath_km.dtype
        c_dim = coef.shape[-1]
        # Both grads are cast back to the bf16 feature/param dtypes anyway,
        # so run the backward gathers/products in the feature dtype — halves
        # the dominant gather traffic when the loss upcasts dout to fp32.
        dout = dout.astype(f_dtype)
        d_coef = jnp.swapaxes(
            _mulred_b_dispatch(gath_km, dout, 1, c_dim), 0, 1).astype(coef.dtype)
        coef_flat = coef.astype(f_dtype).reshape(-1, c_dim)
        d_f = _flat_df(coef_flat, dout, edge_pos, tquery, tmask, num_samples)
        return (d_coef, d_f, jnp.zeros(coef.shape[:2], jnp.int32),
                zeros_i(edge_pos), zeros_i(tquery), zeros_i(tmask))

    coef, f, indices, edge_pos, tquery, tmask = res
    c_dim = coef.shape[-1]
    gathered = f[:, indices, :]                       # [B, Q, K, C]
    if coef.ndim == 4:
        d_coef = dout[:, :, None, :] * gathered
        coef_flat = coef.reshape(coef.shape[0], -1, c_dim)
        cg = coef_flat[:, edge_pos, :]                # [B, N, Kt, C]
    else:
        d_coef = jnp.sum(dout[:, :, None, :] * gathered, axis=0)
        coef_flat = coef.reshape(-1, c_dim)
        cg = coef_flat[edge_pos][None]                # [1, N, Kt, C]
    dg = dout[:, tquery, :]                           # [B, N, Kt, C]
    d_f = jnp.sum(jnp.where(tmask[None, :, :, None], cg * dg, 0), axis=-2)

    d_coef = d_coef.astype(coef.dtype)
    d_f = d_f.astype(f.dtype)
    return (d_coef, d_f, zeros_i(indices), zeros_i(edge_pos),
            zeros_i(tquery), zeros_i(tmask))


gather_multiply_reduce.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gather_multiply_reduce_km(coef_km: jnp.ndarray, f: jnp.ndarray,
                              idx_t: jnp.ndarray, tgraph,
                              num_samples: int = 1) -> jnp.ndarray:
    """K-major flat gather-multiply-reduce: coef_km [K, Q, C], f [N, C],
    idx_t [K, Q]. Returns [Q, C].

    The K-major variant of the flat custom VJP: the vx coef pipeline
    (kernel MLP, attention, masks) runs K-major end to end, so the forward
    needs NO swapaxes into the Pallas reduce and d_coef comes back in the
    producer's layout — the Q-major flat path paid ~4 ms/step of [·, K, C]
    layout copies on the airfoil decoder.

    tgraph: TransposeGraph (flat, per-sample-offset ids as produced by
    models/magno.py::flatten_vx_tgraph) or GroupedTransposeGraph (stacked
    per-sample in-degree groups, ops/padding.py::degree_group_tgraph) —
    the grouped form drops the masked padding rows from the d_f backward
    gathers (device-measured 8.26 → 3.89 ms on the airfoil decoder)."""
    return _km_fwd(coef_km, f, idx_t, tgraph, num_samples)[0]


def _km_fwd(coef_km, f, idx_t, tgraph, num_samples=1):
    gath_km = _bulk_gather(f, idx_t)                  # [K, Q, C]
    out = _mulred_k_dispatch(coef_km, gath_km, 1)
    return out, (coef_km, gath_km, tgraph)


def _km_bwd(num_samples, res, dout):
    coef_km, gath_km, tgraph = res
    f_dtype = gath_km.dtype
    k, q, c = coef_km.shape
    dout = dout.astype(f_dtype)
    d_coef = _mulred_b_dispatch(gath_km, dout, 1, c).astype(coef_km.dtype)
    # The transpose-graph d_f path numbers edges q·K+k, so one swap copy
    # re-materializes coef edge-flat for the gathers (the Q-major path pays
    # this same copy in the forward instead).
    coef_flat = jnp.swapaxes(coef_km.astype(f_dtype), 0, 1).reshape(-1, c)
    if isinstance(tgraph, GroupedTransposeGraph):
        qs = q // num_samples
        d_f = _grouped_df_scan(
            (coef_flat.reshape(num_samples, qs * k, c),),
            (dout.reshape(num_samples, qs, c),), tgraph)
    else:
        d_f = _flat_df(coef_flat, dout, tgraph.edge_pos, tgraph.query,
                       tgraph.mask, num_samples)
    zeros_i = lambda x: jnp.zeros_like(x)
    return (d_coef, d_f, zeros_i(coef_km[..., 0]).astype(jnp.int32),
            jax.tree.map(zeros_i, tgraph))


gather_multiply_reduce_km.defvjp(_km_fwd, _km_bwd)


def pack_f32_cols(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """Bitcast-pack fp32 columns into a dtype-compatible 2D payload.

    f32 [N, d] → bf16 [N, 2d] (exact: bitcast roundtrip is lossless), or a
    no-op for f32 compute. Lets full-precision coordinates ride inside a
    bf16 feature gather — the vx coordinate gathers are ~34% of all gather
    descriptors (scripts/vx_descriptor_bound.py) and rows are lane-padded
    to 128 anyway, so the extra packed columns are free."""
    if x.dtype == dtype:
        return x
    assert x.dtype == jnp.float32 and dtype == jnp.bfloat16
    return jax.lax.bitcast_convert_type(x, jnp.bfloat16).reshape(
        *x.shape[:-1], 2 * x.shape[-1])


def unpack_f32_cols(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Inverse of :func:`pack_f32_cols`: [..., 2d] bf16 → [..., d] f32
    (or slice-through for f32). Wrapped in stop_gradient by callers —
    coordinates are data, and bitcast_convert_type has no VJP."""
    if x.shape[-1] == d:
        return x
    return jax.lax.bitcast_convert_type(
        x.reshape(*x.shape[:-1], d, 2), jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gather_rows_tg(f2d: jnp.ndarray, idx_t: jnp.ndarray, tgraph,
                   num_samples: int = 1) -> jnp.ndarray:
    """Row gather whose backward is a transpose-graph segment sum.

    f2d: [N, W]; idx_t: [K, Q]. Returns [K, Q, W]. Plain autodiff of a
    gather emits a scatter-add for d_f; here d_f[n] = Σ_{(k,q): idx[k,q]=n}
    d_gath[k,q] runs as ONE masked row-gather pass over the (grouped)
    transpose graph — half the backward gather descriptors of the
    gather-multiply-reduce VJPs, because the cotangent d_gath arrives
    already edge-indexed (coef·dout is formed by XLA outside, fused), so
    no second dout gather is needed."""
    return _bulk_gather(f2d, idx_t)


def _gather_rows_fwd(f2d, idx_t, tgraph, num_samples=1):
    # dtype token rides as a 0-size array (residual leaves must be arrays)
    return _bulk_gather(f2d, idx_t), (tgraph, jnp.zeros((0,), f2d.dtype))


def _gather_rows_bwd(num_samples, res, d_gath):
    tgraph, dtype_token = res
    f_dtype = dtype_token.dtype
    k, q, w = d_gath.shape
    d_gath = d_gath.astype(f_dtype)
    # Edge-flat q-major view (edge id q·K + k per sample) — same swap the
    # gather-multiply-reduce VJPs pay.
    d_flat = jnp.swapaxes(d_gath, 0, 1).reshape(-1, w)
    if isinstance(tgraph, GroupedTransposeGraph):
        qs = q // num_samples
        d_f = _grouped_sum_scan(
            (d_flat.reshape(num_samples, qs * k, w),), tgraph)
    else:
        cg = jnp.where(tgraph.mask.T[..., None],
                       _bulk_gather(d_flat, tgraph.edge_pos.T), 0)
        d_f = cg.astype(jnp.float32).sum(0).astype(f_dtype)
    zeros_i = lambda x: jnp.zeros_like(x)
    return (d_f, jnp.zeros((k, q), jnp.int32), jax.tree.map(zeros_i, tgraph))


gather_rows_tg.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gather_rows_bucketed_tg(f2d: jnp.ndarray, idxs, tgraph,
                            num_samples: int = 1):
    """Per-bucket row gathers with one combined segment-sum backward.

    f2d: [N, W]; idxs: per-bucket [Qb, Kb] indices (vx-flattened bucketed
    layout). Returns a tuple of [Kb, Qb, W] gathers. Backward: the
    per-bucket cotangents concat into each sample's bucket-major edge slab
    and one grouped transpose segment-sum produces d_f — the bucketed
    analogue of :func:`gather_rows_tg`."""
    return tuple(_bulk_gather(f2d, idx.T) for idx in idxs)


def _gather_rows_b_fwd(f2d, idxs, tgraph, num_samples=1):
    return (tuple(_bulk_gather(f2d, idx.T) for idx in idxs),
            (idxs, tgraph, jnp.zeros((0,), f2d.dtype)))


def _gather_rows_b_bwd(num_samples, res, d_gaths):
    idxs, tgraph, dtype_token = res
    f_dtype = dtype_token.dtype
    s_n = num_samples
    d_xs = []
    for dg in d_gaths:
        kb, qb, w = dg.shape
        rs = qb // s_n
        # [Kb, Qb, W] → sample-major per-sample edge slab [S, rs·Kb, W]
        # (edge id r·Kb + k within the sample, matching the bucket-concat
        # numbering of the combined transpose graph).
        d_xs.append(jnp.swapaxes(dg.astype(f_dtype), 0, 1)
                    .reshape(s_n, rs * kb, w))
    if isinstance(tgraph, GroupedTransposeGraph):
        d_f = _grouped_sum_scan(tuple(d_xs), tgraph)
    else:
        d_flat = jnp.concatenate(
            [d.reshape(-1, d.shape[-1]) for d in d_xs], axis=0)
        cg = jnp.where(tgraph.mask.T[..., None],
                       _bulk_gather(d_flat, tgraph.edge_pos.T), 0)
        d_f = cg.astype(jnp.float32).sum(0).astype(f_dtype)
    zeros_i = lambda x: jnp.zeros_like(x)
    return (d_f, tuple(jnp.zeros(i.shape, jnp.int32) for i in idxs),
            jax.tree.map(zeros_i, tgraph))


gather_rows_bucketed_tg.defvjp(_gather_rows_b_fwd, _gather_rows_b_bwd)


def _grouped_sum_scan(d_xs, grouped: GroupedTransposeGraph):
    """Per-sample grouped transpose segment-sum: d_xs is a tuple of
    [S, ·, W] per-sample edge-flat cotangent slab parts (one part for the
    flat layout, one per bucket for the bucketed layout) whose concat is
    each sample's edge slab. Returns [S·N, W] source-row sums in original
    row order. The single-gather backward of :func:`gather_rows_tg` /
    :func:`gather_rows_bucketed_tg`."""
    s = d_xs[0].shape[0]
    w = d_xs[0].shape[-1]
    es = sum(x.shape[1] for x in d_xs)
    n = grouped.inv_perm.shape[1]
    f_dtype = d_xs[0].dtype
    gs = tuple((g.edge_pos, g.mask) for g in grouped.groups)
    # Concat the per-bucket slab parts ONCE along the per-sample edge axis,
    # outside the scan — per-iteration concats lowered as pad/maximum loop
    # fusions costing ~2.4 ms/step on the 8k flagship (profiler,
    # pad_maximum_fusion.55/56); one contiguous [S, Es, W] write is cheap
    # and the scan then slices it as xs.
    d_cat = d_xs[0] if len(d_xs) == 1 else jnp.concatenate(list(d_xs), 1)

    def body(_, args):
        slab, gsi = args
        parts = []
        for ep_g, tm_g in gsi:
            cg = jnp.where(tm_g.T[..., None],
                           _bulk_gather(slab, jnp.clip(ep_g, 0, es - 1).T), 0)
            parts.append(cg.astype(jnp.float32).sum(0).astype(f_dtype))
        return None, jnp.concatenate(parts, axis=0)

    _, df = jax.lax.scan(body, None, (d_cat, gs), unroll=_scan_unroll())
    inv = grouped.inv_perm + (jnp.arange(s, dtype=grouped.inv_perm.dtype)
                              * n)[:, None]
    return jnp.take(df.reshape(s * n, w), inv.reshape(-1), axis=0)


def _grouped_df_scan(coef_xs, dout_xs, grouped: GroupedTransposeGraph):
    """d_f over an in-degree-grouped per-sample transpose graph.

    coef_xs / dout_xs: tuples of [S, ·, C] per-sample slab parts (one part
    for the flat layout; one per bucket for the bucketed layout, whose
    concat is the per-sample coef/row slab). grouped: stacked per-sample
    groups with LOCAL ids into those slabs. Per sample: per-group row
    gathers (only ~the real in-degree rows, not the padded Kt — the win)
    with the multiply-reduce left to XLA, which fuses it into the gather
    consumers; device-measured faster than per-group Pallas reduce calls
    (3.89 vs 4.27 ms on the decoder flagship). Returns [S·N, C] in
    original row order (inv_perm gather, itself a row gather)."""
    c = coef_xs[0].shape[-1]
    b = grouped.inv_perm.shape[0]
    n = grouped.inv_perm.shape[1]
    es = sum(x.shape[1] for x in coef_xs)
    qs = sum(x.shape[1] for x in dout_xs)
    f_dtype = dout_xs[0].dtype

    gs = tuple((g.edge_pos, g.query, g.mask) for g in grouped.groups)
    # One concat outside the scan (see _grouped_sum_scan).
    c_cat = coef_xs[0] if len(coef_xs) == 1 else jnp.concatenate(
        list(coef_xs), 1)
    d_cat = dout_xs[0] if len(dout_xs) == 1 else jnp.concatenate(
        list(dout_xs), 1)

    def body(_, args):
        slab, drows, gsi = args
        parts = []
        for ep_g, tq_g, tm_g in gsi:
            cg = jnp.where(tm_g.T[..., None],
                           _bulk_gather(slab, jnp.clip(ep_g, 0, es - 1).T), 0)
            dg = _bulk_gather(drows, jnp.clip(tq_g, 0, qs - 1).T)
            parts.append((cg.astype(jnp.float32) * dg.astype(jnp.float32))
                         .sum(0).astype(f_dtype))
        return None, jnp.concatenate(parts, axis=0)

    _, df = jax.lax.scan(body, None, (c_cat, d_cat, gs),
                         unroll=_scan_unroll())
    inv = grouped.inv_perm + (jnp.arange(b, dtype=grouped.inv_perm.dtype)
                              * n)[:, None]
    return jnp.take(df.reshape(b * n, c), inv.reshape(-1), axis=0)


def _bulk_gather(f2d, indices):
    """Leading-axis row gather with a forced materialization boundary.

    XLA's gather over the *leading* axis of a [N, W] array moves whole
    contiguous W-sized rows and runs ~3.5x faster on TPU than the same
    gather buried in the middle of a [B, N, C] array (measured ~340 GB/s
    vs ~95 GB/s on v5e). The optimization barrier stops XLA from fusing
    the gather into its consumer, which would re-serialize it into the
    slow element-wise form.
    """
    return jax.lax.optimization_barrier(f2d[indices])


def _flat_df(coef_flat, dout, edge_pos, tquery, tmask, num_samples):
    """d_f for the flat layouts: the per-sample-slab scan when the batch is
    per-sample block structured, else the combined barriered-gather pass.
    Shared by the Q-major and K-major flat VJPs."""
    f_dtype = dout.dtype
    if (num_samples > 1
            and coef_flat.shape[0] % num_samples == 0
            and dout.shape[0] % num_samples == 0
            and tmask.shape[0] % num_samples == 0):
        return _flat_df_scan(coef_flat, dout, edge_pos, tquery, tmask,
                             num_samples).astype(f_dtype)
    cg = jnp.where(tmask.T[..., None],
                   _bulk_gather(coef_flat, edge_pos.T), 0)      # [Kt, N, C]
    dg_km = _bulk_gather(dout, tquery.T)                        # [Kt, N, C]
    return _mulred_k_dispatch(cg, dg_km, 1).astype(f_dtype)


def _flat_df_scan(coef_flat, dout, edge_pos, tquery, tmask, b):
    """d_f for the vx-flattened layout as a lax.scan over samples.

    Narrow rows (C ~ 64 → 128 B) make transpose gathers source-footprint
    bound: XLA VMEM-pins gather sources only up to ~17 MB, and a flat
    [B·Q·K, C] coef (134 MB on the airfoil decoder) gathers from HBM at
    ~8.5 GB/s (measured 24 ms/step). vx graphs are per-sample block
    structured by construction (models/magno.py::flatten_vx_graph offsets),
    so scanning over samples turns the source into an ~8 MB slab per step
    that XLA keeps on-chip — measured 18.5 → 5.3 ms on the isolated gather.
    """
    e, c = coef_flat.shape
    q = dout.shape[0]
    n, kt = tmask.shape
    es, qs, ns = e // b, q // b, n // b
    # Localize the per-sample-offset transpose indices (flatten_vx_tgraph);
    # transpose-padded slots may hold 0 globally → clamp after subtracting.
    off_e = (jnp.arange(b, dtype=edge_pos.dtype) * es)[:, None, None]
    off_q = (jnp.arange(b, dtype=tquery.dtype) * qs)[:, None, None]
    ep = jnp.clip(edge_pos.reshape(b, ns, kt) - off_e, 0, es - 1)
    tq = jnp.clip(tquery.reshape(b, ns, kt) - off_q, 0, qs - 1)
    tm = tmask.reshape(b, ns, kt)

    def body(_, args):
        cs, ds, epi, tqi, tmi = args
        cg = jnp.where(tmi.T[..., None], _bulk_gather(cs, epi.T), 0)
        dg = _bulk_gather(ds, tqi.T)                      # [Kt, Ns, C]
        return None, _mulred_k_dispatch(cg, dg, 1)

    _, df = jax.lax.scan(
        body, None,
        (coef_flat.reshape(b, es, c), dout.reshape(b, qs, c), ep, tq, tm),
        unroll=_scan_unroll())
    return df.reshape(n, c)


def _pallas_consumers_ok(coef, f, tquery):
    """Use the Pallas multiply-reduce consumers on TPU when shapes allow.

    Left to XLA, the reduce over the gathered [K, Q, B*C] tensor picks a
    transposed fp32 layout and materializes ~GB-scale copies; the Pallas
    kernels (ops/pallas/multiply_reduce.py) pin the row-major layout.
    """
    from .pallas.multiply_reduce import supported

    q, _, c = coef.shape
    n, b, _ = f.shape
    itemsize = f.dtype.itemsize
    return (jax.default_backend() == "tpu"
            and supported(q, b, c, itemsize) and supported(n, b, c, itemsize))


@jax.custom_vjp
def gather_multiply_reduce_nbc(coef: jnp.ndarray, f: jnp.ndarray,
                               indices: jnp.ndarray, edge_pos: jnp.ndarray,
                               tquery: jnp.ndarray, tmask: jnp.ndarray) -> jnp.ndarray:
    """Batched gather-multiply-reduce in node-leading layout.

    coef: [Q, K, C] (shared across batch — linear transforms);
    f: [N, B, C] node-leading features. Returns [Q, B, C].
    Both the forward gather and the transpose-graph backward gathers move
    contiguous [B*C] rows (see _bulk_gather); all gathers are issued K-major
    so the Pallas reduce consumers stream the rows in natural layout.
    """
    return _nbc_fwd(coef, f, indices, edge_pos, tquery, tmask)[0]


def _nbc_fwd(coef, f, indices, edge_pos, tquery, tmask):
    """Forward that saves the gathered rows for the backward.

    The forward already materializes the bulk-row gather in HBM
    (optimization_barrier); keeping it as a residual lets d_coef re-read it
    sequentially (~free, overlapped) instead of re-gathering the same rows
    at random-row bandwidth — the dominant backward cost.
    """
    q, k, c = coef.shape
    n, b, _ = f.shape
    if _pallas_consumers_ok(coef, f, tquery):
        from .pallas.multiply_reduce import multiply_reduce_k

        gath = _bulk_gather(f.reshape(n, b * c), indices.T)       # [K, Q, W]
        out = multiply_reduce_k(jnp.swapaxes(coef, 0, 1), gath,
                                b).reshape(q, b, c)
    else:
        gath = _bulk_gather(f.reshape(n, b * c),
                            indices).reshape(q, k, b, c)          # [Q,K,B,C]
        out = jnp.einsum("qkc,qkbc->qbc", coef, gath)
    return out, (coef, gath, edge_pos, tquery, tmask)


def _nbc_bwd(res, dout):
    # Static layout metadata is derived from shapes (residual leaves must be
    # arrays): gath.ndim == 3 → pallas [K, Q, W] layout, 4 → einsum [Q,K,B,C].
    coef, gath, edge_pos, tquery, tmask = res
    q, k, c = coef.shape
    b = dout.shape[1]
    n = tmask.shape[0]
    f_dtype = gath.dtype
    # The incoming cotangent is often fp32 (upcast by the loss); both grads
    # are cast back to the bf16 param/feature dtypes anyway, so gather it in
    # the feature dtype — halves the dominant backward gather traffic.
    dout = dout.astype(f_dtype)
    if gath.ndim == 3:
        from .pallas.multiply_reduce import multiply_reduce_b, multiply_reduce_k

        w = b * c
        dout2 = dout.reshape(q, w)
        # d_coef[q,k,c] = Σ_b dout[q,b,c] · f[idx[q,k],b,c] — gath saved by fwd
        d_coef = jnp.swapaxes(
            multiply_reduce_b(gath, dout2, b, c), 0, 1).astype(coef.dtype)
        # d_f[n,b,c] = Σ_j coef_flat[edge_pos[n,j],c] · dout[query[n,j],b,c]
        # (coef gather barriered — see _bwd — else XLA serializes it)
        cg = jnp.where(tmask.T[..., None],
                       _bulk_gather(coef.reshape(-1, c), edge_pos.T),
                       0)                                         # [Kt, N, C]
        dg_km = _bulk_gather(dout2, tquery.T)                     # [Kt, N, W]
        d_f = multiply_reduce_k(cg, dg_km, b).reshape(n, b, c).astype(f_dtype)
    else:
        d_coef = jnp.einsum("qbc,qkbc->qkc", dout, gath).astype(coef.dtype)
        cg = jnp.where(tmask[..., None],
                       _bulk_gather(coef.reshape(-1, c), edge_pos),
                       0)                                         # [N,Kt,C]
        dg = _bulk_gather(dout.reshape(q, b * c), tquery)         # [N,Kt,B*C]
        d_f = jnp.einsum("nkc,nkbc->nbc", cg,
                         dg.reshape(n, -1, b, c)).astype(f_dtype)
    zeros_i = lambda x: jnp.zeros_like(x)
    return (d_coef, d_f, jnp.zeros((q, k), jnp.int32), zeros_i(edge_pos),
            zeros_i(tquery), zeros_i(tmask))


gather_multiply_reduce_nbc.defvjp(_nbc_fwd, _nbc_bwd)


def _mulred_k_dispatch(coef_km: jnp.ndarray, gath_km: jnp.ndarray,
                       b: int) -> jnp.ndarray:
    """out[q, w] = Σ_k coef_km[k, q, :]·(tiled over b)·gath_km[k, q, w];
    Pallas streaming kernel on TPU when the shape allows, einsum otherwise."""
    k, qx, c = coef_km.shape
    w = gath_km.shape[-1]
    from .pallas.multiply_reduce import multiply_reduce_k, supported

    if (jax.default_backend() == "tpu"
            and supported(qx, b, c, gath_km.dtype.itemsize)):
        return multiply_reduce_k(coef_km, gath_km, b)
    gath = gath_km.reshape(k, qx, b, c)
    return jnp.einsum("kqc,kqbc->qbc", coef_km,
                      gath).reshape(qx, w).astype(gath_km.dtype)


def _mulred_b_dispatch(gath_km: jnp.ndarray, dout2: jnp.ndarray,
                       b: int, c: int) -> jnp.ndarray:
    """d_coef[k, q, c] = Σ_b gath_km[k, q, (b,c)]·dout2[q, (b,c)]."""
    k, qx, w = gath_km.shape
    from .pallas.multiply_reduce import multiply_reduce_b, supported

    if (jax.default_backend() == "tpu"
            and supported(qx, b, c, gath_km.dtype.itemsize)):
        return multiply_reduce_b(gath_km, dout2, b, c)
    gath = gath_km.reshape(k, qx, b, c)
    return jnp.einsum("kqbc,qbc->kqc", gath, dout2.reshape(qx, b, c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def bucketed_gather_multiply_reduce(coefs, f, indices, tgraph,
                                    num_samples: int = 1):
    """Gather-multiply-reduce over a degree-bucketed graph, node-leading.

    coefs: per-bucket [Qb, Kb, C] shared coefficients (padded edges zeroed);
    f: [N, B, C]; indices: per-bucket [Qb, Kb]; tgraph: the combined
    transpose graph in bucket-concatenated edge/row space — a flat
    TransposeGraph (ops/padding.py::transpose_bucket_edges) or, for the
    vx layout, a GroupedTransposeGraph of stacked per-sample in-degree
    groups with per-sample-local concat ids (degree_group_tgraph).
    Returns [R, B, C] with R = Σ Qb.

    The forward and d_coef gathers run per bucket — each moves only that
    bucket's K columns, which is where the degree-bucketing win lives. d_f
    runs as ONE combined pass over the transpose graph, costing the same as
    the dense layout's (per-bucket transposes would instead accumulate a
    full [N, B·C] d_f per bucket, which erases the win — measured on v5e).
    """
    return _bucketed_fwd(coefs, f, indices, tgraph, num_samples)[0]


def _bucketed_fwd(coefs, f, indices, tgraph, num_samples=1):
    """Forward saving the per-bucket gathered rows for d_coef (see _nbc_fwd)."""
    n, b, c = f.shape
    f2d = f.reshape(n, b * c)
    outs, gaths = [], []
    for coef, idx in zip(coefs, indices):
        gath_km = _bulk_gather(f2d, idx.T)                       # [Kb, Qb, W]
        gaths.append(gath_km)
        outs.append(_mulred_k_dispatch(jnp.swapaxes(coef, 0, 1), gath_km, b))
    out = jnp.concatenate(outs, axis=0).reshape(-1, b, c)
    return out, (coefs, tuple(gaths), tgraph)


def _bucketed_bwd(num_samples, res, dout):
    coefs, gaths, tgraph = res
    if isinstance(tgraph, GroupedTransposeGraph):
        n = tgraph.inv_perm.shape[0] * tgraph.inv_perm.shape[1]
    else:
        n = tgraph.mask.shape[0]
    c = coefs[0].shape[-1]
    b = gaths[0].shape[-1] // c
    w = b * c
    f_dtype = gaths[0].dtype
    dout = dout.astype(f_dtype)
    dout2 = dout.reshape(-1, w)

    d_coefs, off = [], 0
    for coef, gath_km in zip(coefs, gaths):
        qb = coef.shape[0]
        d_coefs.append(jnp.swapaxes(
            _mulred_b_dispatch(gath_km, dout2[off:off + qb], b, c),
            0, 1).astype(coef.dtype))
        off += qb

    d_f = _bucketed_df(coefs, dout2, tgraph, num_samples,
                       b, c).reshape(n, b, c)
    zeros_i = lambda x: jnp.zeros_like(x)
    return (tuple(d_coefs), d_f,
            tuple(jnp.zeros(cf.shape[:2], jnp.int32) for cf in coefs),
            jax.tree.map(zeros_i, tgraph))


def _bucketed_df(coefs, dout2, tgraph, num_samples, b, c):
    """Combined d_f over the bucket-concatenated transpose graph.
    coefs: per-bucket [Qb, Kb, C]; dout2: [R, b·C]. Returns [N, b·C] rows."""
    f_dtype = dout2.dtype
    if isinstance(tgraph, GroupedTransposeGraph) and b > 1:
        # fx batched layout (one "sample", f [N, B, C]): per-group gathers
        # over the degree-grouped combined tgraph — same math as the flat
        # combined pass below, minus the ~3× masked-padding rows (each row
        # is a [B·C] 8 KB payload here, so the cut is bandwidth, not just
        # descriptors). Pallas multiply-reduce per group (wide W keeps the
        # fp32-accumulator kernels profitable at fx widths).
        coef_flat = jnp.concatenate([cf.reshape(-1, c) for cf in coefs],
                                    axis=0).astype(f_dtype)
        es = coef_flat.shape[0]
        parts = []
        for g in tgraph.groups:
            ep_g, tq_g, tm_g = g.edge_pos[0], g.query[0], g.mask[0]
            cg = jnp.where(tm_g.T[..., None],
                           _bulk_gather(coef_flat,
                                        jnp.clip(ep_g, 0, es - 1).T), 0)
            dg = _bulk_gather(dout2, jnp.clip(tq_g, 0,
                                              dout2.shape[0] - 1).T)
            parts.append(_mulred_k_dispatch(cg, dg, b))
        df = jnp.concatenate(parts, axis=0)         # degree-sorted rows
        return jnp.take(df, tgraph.inv_perm[0], axis=0).astype(f_dtype)
    if isinstance(tgraph, GroupedTransposeGraph):
        # vx grouped layout: per-sample per-bucket slabs feed the grouped
        # scan directly (local concat ids — no global un-remap needed).
        s_n = num_samples
        rs = [cf.shape[0] // s_n for cf in coefs]
        coef_xs = tuple(cf.astype(f_dtype).reshape(
            s_n, rs[j] * cf.shape[1], c) for j, cf in enumerate(coefs))
        r_base = np.concatenate([[0], np.cumsum(rs)]).astype(np.int64)
        dout_xs = tuple(
            dout2[s_n * int(r_base[j]):s_n * int(r_base[j + 1])]
            .reshape(s_n, rs[j], c) for j in range(len(rs)))
        return _grouped_df_scan(coef_xs, dout_xs, tgraph).astype(f_dtype)
    edge_pos, tquery, tmask = tgraph.edge_pos, tgraph.query, tgraph.mask
    n = tmask.shape[0]
    scannable = (num_samples > 1 and b == 1
                 and n % num_samples == 0
                 and all(cf.shape[0] % num_samples == 0 for cf in coefs))
    if scannable:
        return _bucketed_df_scan(
            [cf.astype(f_dtype) for cf in coefs], dout2, edge_pos, tquery,
            tmask, num_samples).astype(f_dtype)
    # Gather the per-edge coefficients in the feature dtype: attention
    # weights computed from f32 coords promote coef to f32, which
    # doubles this latency-bound row gather's traffic.
    coef_flat = jnp.concatenate([cf.reshape(-1, c) for cf in coefs],
                                axis=0).astype(f_dtype)
    cg = jnp.where(tmask.T[..., None],
                   _bulk_gather(coef_flat, edge_pos.T), 0)    # [Kt, N, C]
    dg_km = _bulk_gather(dout2, tquery.T)                     # [Kt, N, W]
    return _mulred_k_dispatch(cg, dg_km, b).astype(f_dtype)


def _bucketed_df_scan(coefs, dout2, edge_pos, tquery, tmask, s):
    """d_f for the vx-flattened bucketed layout as a lax.scan over samples.

    Same source-footprint argument as _flat_df_scan. The flat bucketed
    layout is bucket-major, sample-minor (models/magno.py::
    flatten_vx_bucketed), so each sample's edges/rows are nb contiguous
    blocks — static per-bucket reshapes expose them as scan xs, and the
    global transpose indices un-remap to the per-sample concat space with
    nb cheap range selects.
    """
    c = coefs[0].shape[-1]
    w = dout2.shape[-1]
    n, kt = tmask.shape
    ns = n // s
    rs = [cf.shape[0] // s for cf in coefs]       # per-sample rows / bucket
    sz = [r * cf.shape[1] for r, cf in zip(rs, coefs)]  # per-sample edges
    e_base = np.concatenate([[0], np.cumsum(sz)]).astype(np.int64)
    r_base = np.concatenate([[0], np.cumsum(rs)]).astype(np.int64)

    # Per-bucket slabs with leading sample dim (static slice + reshape).
    coef_xs = tuple(cf.reshape(s, sz_j, c) for cf, sz_j in zip(coefs, sz))
    dout_xs = tuple(
        dout2[s * int(r_base[j]):s * int(r_base[j + 1])].reshape(s, rs[j], w)
        for j in range(len(rs)))

    def unmap(pos, base, sizes):
        """Global bucket-major position → per-sample concat position."""
        out = jnp.zeros_like(pos)
        samp = jnp.arange(s, dtype=pos.dtype).reshape(s, 1, 1)
        for j in range(len(sizes)):
            lo = s * int(base[j])
            sel = (pos >= lo) & (pos < lo + s * int(sizes[j]))
            out = jnp.where(sel, pos - lo - samp * int(sizes[j])
                            + int(base[j]), out)
        return jnp.clip(out, 0, int(base[-1]) - 1)

    ep = unmap(edge_pos.reshape(s, ns, kt), e_base, sz)
    tq = unmap(tquery.reshape(s, ns, kt), r_base, rs)
    tm = tmask.reshape(s, ns, kt)

    def body(_, args):
        cxs, dxs, epi, tqi, tmi = args
        slab = jnp.concatenate(list(cxs), axis=0)                # [Es, C]
        drows = jnp.concatenate(list(dxs), axis=0)               # [Rt, W]
        cg = jnp.where(tmi.T[..., None], _bulk_gather(slab, epi.T), 0)
        dg = _bulk_gather(drows, tqi.T)                          # [Kt, Ns, W]
        return None, _mulred_k_dispatch(cg, dg, 1)

    _, df = jax.lax.scan(body, None, (coef_xs, dout_xs, ep, tq, tm),
                         unroll=_scan_unroll())
    return df.reshape(n, c)


bucketed_gather_multiply_reduce.defvjp(_bucketed_fwd, _bucketed_bwd)


def apply_bucketed_graph_transform(coefs, f, bg,
                                   num_samples: int = 1) -> jnp.ndarray:
    """coefs: per-bucket [Qb, Kb, C]; f: [B, N, C] (fx batched, shared
    coefficients) or [N, C] (vx-flattened, per-edge coefficients); bg:
    BucketedGraph with a combined tgraph. Returns [B, R, C] (or [R, C]) in
    bucket-concatenated row order. num_samples > 1 (vx) enables the
    per-sample-slab backward scan."""
    if f.ndim == 2:
        out = bucketed_gather_multiply_reduce(
            tuple(coefs), f[:, None, :],
            tuple(g.indices for g in bg.buckets), bg.tgraph, num_samples)
        return out[:, 0, :]
    out = bucketed_gather_multiply_reduce(
        tuple(coefs), jnp.swapaxes(f, 0, 1),
        tuple(g.indices for g in bg.buckets), bg.tgraph, num_samples)
    return jnp.swapaxes(out, 0, 1)


@jax.custom_vjp
def unpermute_rows(x_cat: jnp.ndarray, inv_perm: jnp.ndarray,
                   perm: jnp.ndarray, row_valid: jnp.ndarray) -> jnp.ndarray:
    """Gather rows back to original query order with a gather-only backward.

    x_cat: [..., R, C] bucket-concatenated rows; inv_perm: [Q] original→concat
    position; perm: [R] concat→original (0 on pad rows); row_valid: [R].
    Returns [..., Q, C]. Plain autodiff of the forward gather would emit a
    scatter for d_x; since inv_perm is injective the backward is itself a
    masked gather by `perm`.
    """
    return jnp.take(x_cat, inv_perm, axis=-2)


def _unpermute_fwd(x_cat, inv_perm, perm, row_valid):
    return jnp.take(x_cat, inv_perm, axis=-2), (inv_perm, perm, row_valid)


def _unpermute_bwd(res, g):
    inv_perm, perm, row_valid = res
    d_x = jnp.where(row_valid[:, None], jnp.take(g, perm, axis=-2), 0)
    zeros_i = lambda x: jnp.zeros_like(x)
    return d_x, zeros_i(inv_perm), zeros_i(perm), zeros_i(row_valid)


unpermute_rows.defvjp(_unpermute_fwd, _unpermute_bwd)


def apply_graph_transform(coef, f, graph, tgraph: TransposeGraph = None,
                          num_samples: int = 1):
    """Dispatch the gather-multiply-reduce to the fastest available path.

    - no transpose graph → plain XLA (autodiff backward = scatter-add);
    - f [N, C] (vx-flattened) or batched coef → flat custom VJP
      (num_samples > 1 enables the per-sample-slab backward scan);
    - f [B, N, C] with shared coef [Q, K, C] → node-leading-layout custom
      VJP (fastest: bulk-row gathers forward and backward).
    """
    if tgraph is None:
        return _forward(coef, f, graph.indices)
    if f.ndim == 3 and coef.ndim == 3:
        out = gather_multiply_reduce_nbc(
            coef, jnp.swapaxes(f, 0, 1), graph.indices, tgraph.edge_pos,
            tgraph.query, tgraph.mask)                    # [Q, B, C]
        return jnp.swapaxes(out, 0, 1)                    # [B, Q, C]
    return gather_multiply_reduce(coef, f, graph.indices, tgraph.edge_pos,
                                  tgraph.query, tgraph.mask, num_samples)
