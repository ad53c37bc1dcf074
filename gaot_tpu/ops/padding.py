"""CSR → padded static-shape graph conversion.

The reference keeps ragged CSR neighbor lists and reduces them with
torch_scatter's segment_csr (src/model/layers/utils/segment_csr.py:14-98).
XLA wants static shapes, so gaot_tpu converts CSR graphs once, on the host,
into dense `[num_queries, K]` index arrays plus boolean masks. K is the max
row length rounded up to ``pad_multiple`` (lane-friendly), optionally capped
— the cap doubles as the reference's `max_neighbors` truncation
(src/model/layers/utils/edge_drop.py:70-99) for deterministic eval graphs.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np


class PaddedGraph(NamedTuple):
    """Static-shape neighborhood graph.

    indices: int32 [*, Q, K] — neighbor indices into the source point set;
        padded entries are 0 (a valid index, masked out by `mask`).
    mask: bool [*, Q, K] — True for real neighbors.
    """

    indices: np.ndarray
    mask: np.ndarray

    @property
    def num_queries(self) -> int:
        return self.indices.shape[-2]

    @property
    def k(self) -> int:
        return self.indices.shape[-1]


def _round_up(x: int, m: int) -> int:
    return ((max(x, 1) + m - 1) // m) * m


def morton_order(coords: np.ndarray, bits: int = 16) -> np.ndarray:
    """Z-order (Morton) permutation of a point set [N, d] (d ∈ {2, 3}).

    Spatially sorted nodes make radius-graph neighbor indices of nearby
    queries cluster, which turns the model's per-edge row gathers from
    random-row DMA (latency-bound, ~33 GiB/s measured on v5e for 128-byte
    rows) into locally-dense access. Applied per sample at vx graph build.
    """
    coords = np.asarray(coords, dtype=np.float64)
    n, d = coords.shape
    lo = coords.min(axis=0)
    rng = np.maximum(coords.max(axis=0) - lo, 1e-12)
    q = ((coords - lo) / rng * ((1 << bits) - 1)).astype(np.uint64)
    key = np.zeros(n, dtype=np.uint64)
    for b in range(bits):
        for dim in range(d):
            key |= ((q[:, dim] >> np.uint64(b)) & np.uint64(1)) << np.uint64(
                b * d + dim)
    return np.argsort(key, kind="stable")


def pad_csr(
    neighbors_index: np.ndarray,
    row_splits: np.ndarray,
    pad_multiple: int = 8,
    cap: Optional[int] = None,
    k: Optional[int] = None,
) -> PaddedGraph:
    """Convert a CSR neighbor list to a PaddedGraph.

    Args:
        neighbors_index: int [E] flat neighbor indices.
        row_splits: int [Q+1] CSR row splits.
        pad_multiple: round K up to a multiple of this (VPU-lane friendly).
        cap: optional hard cap on K; longer rows are truncated (keeping the
            first `cap` entries, which for radius search is an arbitrary
            subset — matching the reference's neighbor-order-agnostic
            semantics).
        k: force an exact K (overrides pad_multiple/cap); rows longer than k
            are truncated.
    """
    row_splits = np.asarray(row_splits, dtype=np.int64)
    neighbors_index = np.asarray(neighbors_index, dtype=np.int64)
    counts = row_splits[1:] - row_splits[:-1]
    q = counts.shape[0]
    max_count = int(counts.max()) if q else 0
    if k is None:
        k = _round_up(max_count, pad_multiple)
        if cap is not None:
            k = min(k, _round_up(cap, 1))
    indices = np.zeros((q, k), dtype=np.int32)
    mask = np.zeros((q, k), dtype=bool)
    kept = np.minimum(counts, k)
    # Vectorized scatter of ragged rows into the padded matrix.
    col = np.arange(k)[None, :]
    mask = col < kept[:, None]
    flat_pos = (row_splits[:-1][:, None] + col)[mask]
    indices[mask] = neighbors_index[flat_pos].astype(np.int32)
    return PaddedGraph(indices=indices, mask=mask)


def repad(graph: PaddedGraph, k: int) -> PaddedGraph:
    """Re-pad (or truncate) a graph to an exact K."""
    q, old_k = graph.indices.shape[-2:]
    if old_k == k:
        return graph
    if old_k > k:
        return PaddedGraph(graph.indices[..., :k], graph.mask[..., :k])
    pad = [(0, 0)] * (graph.indices.ndim - 1) + [(0, k - old_k)]
    return PaddedGraph(
        np.pad(graph.indices, pad), np.pad(graph.mask, pad, constant_values=False)
    )


def stack_graphs(graphs: Sequence[PaddedGraph]) -> PaddedGraph:
    """Stack per-sample graphs to a batched PaddedGraph [B, Q, K].

    Graphs are re-padded to the largest K in the batch; query counts must
    already match (vx-mode node-count bucketing handles that upstream).
    """
    k = max(g.k for g in graphs)
    graphs = [repad(g, k) for g in graphs]
    return PaddedGraph(
        indices=np.stack([g.indices for g in graphs]),
        mask=np.stack([g.mask for g in graphs]),
    )


def padded_from_search(search_result: dict, pad_multiple: int = 8,
                       cap: Optional[int] = None, k: Optional[int] = None) -> PaddedGraph:
    """Convenience: pad the dict returned by ops.NeighborSearch."""
    return pad_csr(
        search_result["neighbors_index"],
        search_result["neighbors_row_splits"],
        pad_multiple=pad_multiple,
        cap=cap,
        k=k,
    )


class TransposeGraph(NamedTuple):
    """Reverse adjacency of a PaddedGraph, for scatter-free backward passes.

    For forward edges (q, k) → n = indices[q, k], stores for every source
    node n its incoming edges:
      edge_pos: int32 [N, Kt] — flat forward edge position q * K + k
      query:    int32 [N, Kt] — the query q of that edge
      mask:     bool  [N, Kt]
    """

    edge_pos: np.ndarray
    query: np.ndarray
    mask: np.ndarray

    @property
    def kt(self) -> int:
        return self.edge_pos.shape[-1]


def transpose_graph(graph: PaddedGraph, num_sources: int,
                    pad_multiple: int = 8) -> TransposeGraph:
    """Build the reverse adjacency of a padded graph on the host.

    The forward graph's VJP w.r.t. gathered source features is a scatter-add;
    with the transpose graph it becomes two gathers + a masked reduce —
    XLA/TPU-friendly (no serialized scatter)."""
    q, k = graph.indices.shape
    flat_src = graph.indices.reshape(-1).astype(np.int64)
    flat_mask = graph.mask.reshape(-1)
    edge_ids = np.nonzero(flat_mask)[0]
    srcs = flat_src[edge_ids]
    order = np.argsort(srcs, kind="stable")
    srcs_sorted = srcs[order]
    edges_sorted = edge_ids[order]
    counts = np.bincount(srcs_sorted, minlength=num_sources)
    row_splits = np.zeros(num_sources + 1, dtype=np.int64)
    np.cumsum(counts, out=row_splits[1:])
    padded = pad_csr(edges_sorted, row_splits, pad_multiple=pad_multiple)
    queries = (padded.indices // k).astype(np.int32)
    return TransposeGraph(edge_pos=padded.indices, query=queries,
                          mask=padded.mask)


class GroupedTransposeGraph(NamedTuple):
    """A stacked per-sample TransposeGraph re-packed into in-degree groups.

    The d_f backward gathers one row per transpose slot and is descriptor-
    rate bound (~1 row/cycle on v5e), but in-degree is heavy-tailed: the
    airfoil-flagship decoder transpose graph fills only 28% of its
    [4096, 24] padding (mean in-degree 6.8), so ~3.5× of the backward
    gather rows were masked padding. Rows (source nodes) are sorted by
    in-degree per sample, the rank space is cut at shared static
    boundaries, and each group is padded only to its own max degree —
    device-measured on the decoder d_f: 8.26 → 3.89 ms/step (2.1×).

    groups:   per-group stacked TransposeGraphs [B, R_j, Ktj] in ascending
              degree order, rows degree-sorted PER SAMPLE, indices kept
              per-sample LOCAL (edge_pos = q·K + k within the sample,
              query = per-sample query id);
    inv_perm: int32 [B, S] — original row r of sample b sits at grouped
              (concatenated) position inv_perm[b, r].
    """

    groups: Tuple[TransposeGraph, ...]
    inv_perm: np.ndarray


def _group_boundaries(deg_sorted_max: np.ndarray, max_groups: int = 4,
                      grid: int = 64, pad: int = 8):
    """Rank-space boundaries minimizing total padded rows gathered.

    deg_sorted_max: [S] — max over samples of the per-rank degree after the
    per-sample ascending sort (monotone). DP over a coarse grid: cost of
    group [lo, hi) = (hi − lo) · deg_sorted_max[hi − 1]."""
    s = deg_sorted_max.shape[0]
    grid = max(pad, min(grid, -(-s // 16) // pad * pad or pad))
    pts = sorted({0, s, *(min(s, g * grid) for g in range(1, s // grid + 2))})
    pts = [p for p in pts if p == 0 or p == s or p % pad == 0]
    best = {0: (0.0, [0])}
    for _ in range(max_groups):
        nxt = {}
        for lo, (cost, path) in best.items():
            for hi in pts:
                if hi <= lo:
                    continue
                c = cost + (hi - lo) * int(deg_sorted_max[hi - 1])
                if hi not in nxt or c < nxt[hi][0]:
                    nxt[hi] = (c, path + [hi])
        for k, v in nxt.items():
            if k not in best or v[0] < best[k][0]:
                best[k] = v
    return best[s][1]


def degree_group_tgraph(tgraph: TransposeGraph,
                        max_groups: int = 4) -> GroupedTransposeGraph:
    """Degree-group a STACKED per-sample transpose graph [B, S, Kt].

    Shapes are shared across samples (one program for every batch), so the
    boundaries come from the rank-space degree envelope over all samples
    and each group's Ktj is the max degree any sample reaches inside it."""
    ep, tq, tm = (np.asarray(tgraph.edge_pos), np.asarray(tgraph.query),
                  np.asarray(tgraph.mask))
    b, s, kt = tm.shape
    deg = tm.sum(-1)
    perm = np.argsort(deg, axis=1, kind="stable")
    inv_perm = np.argsort(perm, axis=1).astype(np.int32)
    deg_sorted = np.take_along_axis(deg, perm, axis=1)
    bounds = _group_boundaries(deg_sorted.max(0), max_groups=max_groups)
    ep_p = np.take_along_axis(ep, perm[:, :, None], axis=1)
    tq_p = np.take_along_axis(tq, perm[:, :, None], axis=1)
    tm_p = np.take_along_axis(tm, perm[:, :, None], axis=1)
    groups = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        kg = max(1, int(deg_sorted[:, lo:hi].max()))
        groups.append(TransposeGraph(
            np.ascontiguousarray(ep_p[:, lo:hi, :kg]),
            np.ascontiguousarray(tq_p[:, lo:hi, :kg]),
            np.ascontiguousarray(tm_p[:, lo:hi, :kg])))
    return GroupedTransposeGraph(tuple(groups), inv_perm)


def repad_tgraph(tgraph: TransposeGraph, kt: int) -> TransposeGraph:
    """Re-pad (or truncate) a transpose graph to an exact Kt."""
    old = tgraph.edge_pos.shape[-1]
    if old == kt:
        return tgraph
    if old > kt:
        return TransposeGraph(tgraph.edge_pos[..., :kt], tgraph.query[..., :kt],
                              tgraph.mask[..., :kt])
    pad = [(0, 0)] * (tgraph.edge_pos.ndim - 1) + [(0, kt - old)]
    return TransposeGraph(
        np.pad(tgraph.edge_pos, pad), np.pad(tgraph.query, pad),
        np.pad(tgraph.mask, pad, constant_values=False))


class BucketedGraph(NamedTuple):
    """A PaddedGraph re-packed into degree buckets.

    Radius-graph neighbor counts are heavy-tailed (the flagship Poisson-Gauss
    encoder graph has mean degree ~7 against K=24), so a single dense [Q, K]
    layout wastes ~70% of the gather traffic and per-edge kernel-MLP FLOPs on
    padding. Queries are sorted by degree and partitioned into a few buckets,
    each padded only to its own K — the per-query math is unchanged (same
    real edges, same left-packed order), only the padding shrinks.

    buckets: per-bucket subgraphs in ascending-K order; query rows of bucket
        i occupy concat positions [Σ_{j<i} rows_j, …) (each bucket's row
        count is tile-padded).
    tgraph: ONE transpose graph for the scatter-free backward, indexing the
        bucket-CONCATENATED spaces: edge_pos into the concatenated flat edge
        array (bucket i's edges at offset Σ_{j<i} rows_j·K_j, position
        row·K_i + col within), query into concat row positions. A single
        combined d_f pass costs the same as the dense layout's (its K_t is
        the real-edge max in-degree either way) — per-bucket transposes
        would instead accumulate one full [N, …] d_f per bucket.
    perm: int32 [R] — concat position → original query index (0 on pad rows).
    inv_perm: int32 [Q] — original query index → concat position.
    row_valid: bool [R] — False on per-bucket tile-padding rows.
    """

    buckets: Tuple[PaddedGraph, ...]
    tgraph: Optional[TransposeGraph]
    perm: np.ndarray
    inv_perm: np.ndarray
    row_valid: np.ndarray

    @property
    def num_queries(self) -> int:
        return self.inv_perm.shape[-1]


def transpose_bucket_edges(buckets: Sequence[PaddedGraph], num_sources: int,
                           pad_multiple: int = 8) -> TransposeGraph:
    """Combined reverse adjacency of a bucket list, in concat edge/row space."""
    srcs_l, qrows_l, eids_l = [], [], []
    row_off, edge_off = 0, 0
    for g in buckets:
        rr, kk = np.nonzero(g.mask)
        srcs_l.append(g.indices[rr, kk].astype(np.int64))
        qrows_l.append(rr.astype(np.int64) + row_off)
        eids_l.append(edge_off + rr.astype(np.int64) * g.k + kk)
        row_off += g.num_queries
        edge_off += g.indices.size
    srcs = np.concatenate(srcs_l)
    qrows = np.concatenate(qrows_l)
    eids = np.concatenate(eids_l)
    order = np.argsort(srcs, kind="stable")
    counts = np.bincount(srcs[order], minlength=num_sources)
    row_splits = np.zeros(num_sources + 1, dtype=np.int64)
    np.cumsum(counts, out=row_splits[1:])
    padded_e = pad_csr(eids[order], row_splits, pad_multiple=pad_multiple)
    padded_q = pad_csr(qrows[order], row_splits, pad_multiple=pad_multiple)
    return TransposeGraph(edge_pos=padded_e.indices, query=padded_q.indices,
                          mask=padded_e.mask)


def _choose_bucket_ks(deg: np.ndarray, k_max: int, max_buckets: int,
                      tile: int, launch_penalty_rows: int) -> list:
    """Pick bucket K values minimizing total gathered rows.

    Exact interval DP over the unique degree values: a bucket covering
    degrees (prev, k] costs ceil(count/tile)·tile·k rows plus a fixed
    per-bucket penalty (kernel-launch / extra-compile cost expressed in
    gathered rows)."""
    deg = np.maximum(deg, 1)
    cand = np.unique(deg).astype(np.int64).tolist()
    if cand[-1] != k_max:
        cand.append(k_max)
    r = len(cand)
    counts = np.array([(deg <= c).sum() for c in cand], dtype=np.int64)

    def bucket_cost(i: int, j: int) -> int:
        n = counts[j] - (counts[i] if i >= 0 else 0)
        if n == 0:
            return 0
        return int(-(-n // tile) * tile * cand[j] + launch_penalty_rows)

    INF = float("inf")
    # best[j][b] = min rows covering degrees <= cand[j] with <= b buckets
    best = [[INF] * (max_buckets + 1) for _ in range(r)]
    choice = [[-2] * (max_buckets + 1) for _ in range(r)]
    for j in range(r):
        for b in range(1, max_buckets + 1):
            c = bucket_cost(-1, j)
            if c < best[j][b]:
                best[j][b] = c
                choice[j][b] = -1
            for i in range(j):
                if best[i][b - 1] + bucket_cost(i, j) < best[j][b]:
                    best[j][b] = best[i][b - 1] + bucket_cost(i, j)
                    choice[j][b] = i
    ks = []
    j, b = r - 1, max_buckets
    while j >= 0:
        ks.append(int(cand[j]))
        j = choice[j][b]
        b -= 1
    return sorted(ks)


def bucketize_graph(graph: PaddedGraph, num_sources: int,
                    with_transpose: bool = True, tile: int = 128,
                    max_buckets: int = 4, launch_penalty_rows: int = 1024,
                    min_gain: float = 1.15,
                    min_k: int = 12) -> Optional[BucketedGraph]:
    """Re-pack a [Q, K] PaddedGraph into degree buckets.

    Returns None when the dense layout is already within ``min_gain`` of the
    bucketed row count (uniform-degree graphs) — callers keep the plain
    path — or when K < ``min_k``: small-K graphs split into tiny-K buckets
    whose per-op gather/reduce efficiency on TPU is poor enough to erase the
    traffic win (measured on v5e: a K=8 graph split into K∈{3,4,5} buckets
    ran slower than dense despite 2.2× fewer rows). Only 2-D (fx/shared)
    graphs are supported; batched vx graphs keep the dense layout.
    """
    if graph.indices.ndim != 2 or graph.indices.shape[-1] < min_k:
        return None
    q, k = graph.indices.shape
    deg = graph.mask.sum(-1).astype(np.int64)
    ks = _choose_bucket_ks(deg, k, max_buckets, tile, launch_penalty_rows)
    bucketed_rows = 0
    bid = np.searchsorted(np.asarray(ks), np.maximum(deg, 1))
    for b, kb in enumerate(ks):
        n = int((bid == b).sum())
        bucketed_rows += -(-max(n, 0) // tile) * tile * kb if n else 0
    if bucketed_rows == 0 or q * k < min_gain * bucketed_rows:
        return None

    order = np.argsort(bid, kind="stable")
    buckets = []
    perm_parts, valid_parts = [], []
    inv_perm = np.zeros(q, dtype=np.int32)
    offset = 0
    for b, kb in enumerate(ks):
        rows = order[bid[order] == b]
        n = rows.shape[0]
        if n == 0:
            continue
        npad = -(-n // tile) * tile
        idx = np.zeros((npad, kb), dtype=np.int32)
        msk = np.zeros((npad, kb), dtype=bool)
        idx[:n] = graph.indices[rows, :kb]
        msk[:n] = graph.mask[rows, :kb]
        buckets.append(PaddedGraph(idx, msk))
        inv_perm[rows] = offset + np.arange(n, dtype=np.int32)
        perm_parts.append(np.pad(rows.astype(np.int32), (0, npad - n)))
        valid_parts.append(np.arange(npad) < n)
        offset += npad
    tg = (transpose_bucket_edges(buckets, num_sources)
          if with_transpose else None)
    return BucketedGraph(
        buckets=tuple(buckets),
        tgraph=tg,
        perm=np.concatenate(perm_parts),
        inv_perm=inv_perm,
        row_valid=np.concatenate(valid_parts),
    )


class BatchedBucketedGraph(NamedTuple):
    """Per-sample degree-bucketed graphs with a SHARED bucket layout.

    The vx analogue of BucketedGraph: every sample's [Q, K] graph is
    re-packed into the same bucket K values (chosen from the split-wide
    degree distribution) with per-bucket row counts padded to the split-wide
    maximum, so the whole split shares one static shape per bucket and a
    batch is a plain row gather. The model flattens a batch of these into a
    single flat BucketedGraph (models/magno.py::flatten_vx_bucketed).

    buckets: per-bucket subgraphs, indices/mask [S, R_b, K_b] (ascending K).
    tgraph: per-sample combined transpose graphs [S, N_src, Kt]; edge_pos /
        query address each sample's OWN bucket-concatenated edge/row spaces
        (edge base Σ_{j<b} R_j·K_j, row base Σ_{j<b} R_j).
    perm: int32 [S, R] per-sample concat row → original query (0 on pad rows).
    inv_perm: int32 [S, Q] original query → per-sample concat row.
    row_valid: bool [S, R].
    """

    buckets: Tuple[PaddedGraph, ...]
    tgraph: Optional[TransposeGraph]
    perm: np.ndarray
    inv_perm: np.ndarray
    row_valid: np.ndarray

    @property
    def num_queries(self) -> int:
        return self.inv_perm.shape[-1]

    @property
    def bucket_rows(self) -> Tuple[int, ...]:
        return tuple(g.indices.shape[-2] for g in self.buckets)

    @property
    def bucket_ks(self) -> Tuple[int, ...]:
        return tuple(g.indices.shape[-1] for g in self.buckets)


def bucketize_graphs_stacked(graph: PaddedGraph, num_sources: int,
                             with_transpose: bool = True, tile: int = 8,
                             max_buckets: int = 4,
                             launch_penalty_rows: int = 256,
                             min_gain: float = 1.15,
                             min_k: int = 12) -> Optional[BatchedBucketedGraph]:
    """Degree-bucket a stacked per-sample graph [S, Q, K].

    Bucket K values are chosen once from the pooled degree distribution of
    all samples; per-sample bucket row counts are padded to the max over
    samples (rounded to ``tile``), so every sample shares the layout.
    Returns None when the padded-row win doesn't clear ``min_gain`` or
    K < ``min_k`` (same economics as the fx bucketizer).

    ``num_sources`` is the per-sample source-set size (N_pad for encoder
    graphs, Q_latent for decoder graphs).
    """
    if graph.indices.ndim != 3 or graph.indices.shape[-1] < min_k:
        return None
    s, q, k = graph.indices.shape
    deg = graph.mask.sum(-1).astype(np.int64)                     # [S, Q]
    ks = _choose_bucket_ks(deg.reshape(-1), k, max_buckets, tile,
                           launch_penalty_rows)
    bid = np.searchsorted(np.asarray(ks), np.maximum(deg, 1))     # [S, Q]
    counts = np.stack([(bid == b).sum(axis=1) for b in range(len(ks))],
                      axis=0)                                     # [nb, S]
    rs = [int(-(-max(int(c.max()), 0) // tile) * tile) if c.max() else 0
          for c in counts]
    keep = [b for b in range(len(ks)) if rs[b] > 0]
    ks = [ks[b] for b in keep]
    rs = [rs[b] for b in keep]
    bucketed_rows = sum(r * kk for r, kk in zip(rs, ks))
    if bucketed_rows == 0 or q * k < min_gain * bucketed_rows:
        return None
    # searchsorted against the kept K set (dropped empty buckets)
    bid = np.searchsorted(np.asarray(ks), np.maximum(deg, 1))

    r_total = sum(rs)
    buckets = [(np.zeros((s, r, kk), dtype=np.int32),
                np.zeros((s, r, kk), dtype=bool)) for r, kk in zip(rs, ks)]
    perm = np.zeros((s, r_total), dtype=np.int32)
    inv_perm = np.zeros((s, q), dtype=np.int32)
    row_valid = np.zeros((s, r_total), dtype=bool)
    r_base = np.concatenate([[0], np.cumsum(rs)]).astype(np.int64)

    for i in range(s):
        order = np.argsort(bid[i], kind="stable")
        for b in range(len(ks)):
            rows = order[bid[i][order] == b]
            n = rows.shape[0]
            if n == 0:
                continue
            idx_b, msk_b = buckets[b]
            kb = ks[b]
            idx_b[i, :n] = graph.indices[i][rows, :kb]
            msk_b[i, :n] = graph.mask[i][rows, :kb]
            base = int(r_base[b])
            inv_perm[i, rows] = base + np.arange(n, dtype=np.int32)
            perm[i, base:base + n] = rows
            row_valid[i, base:base + n] = True

    bucket_graphs = tuple(PaddedGraph(idx, msk) for idx, msk in buckets)
    tg = None
    if with_transpose:
        per_sample = [
            transpose_bucket_edges(
                [PaddedGraph(g.indices[i], g.mask[i]) for g in bucket_graphs],
                num_sources)
            for i in range(s)
        ]
        tg = stack_tgraphs(per_sample)
    return BatchedBucketedGraph(buckets=bucket_graphs, tgraph=tg, perm=perm,
                                inv_perm=inv_perm, row_valid=row_valid)


def stack_tgraphs(tgraphs: Sequence[TransposeGraph]) -> TransposeGraph:
    """Stack per-sample transpose graphs to [B, S, Kt] (re-padded to max Kt)."""
    kt = max(t.kt for t in tgraphs)
    tgraphs = [repad_tgraph(t, kt) for t in tgraphs]
    return TransposeGraph(
        edge_pos=np.stack([t.edge_pos for t in tgraphs]),
        query=np.stack([t.query for t in tgraphs]),
        mask=np.stack([t.mask for t in tgraphs]),
    )
