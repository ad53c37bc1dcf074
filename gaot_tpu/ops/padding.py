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

from typing import NamedTuple, Optional, Sequence

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


def stack_tgraphs(tgraphs: Sequence[TransposeGraph]) -> TransposeGraph:
    """Stack per-sample transpose graphs to [B, S, Kt] (re-padded to max Kt)."""
    kt = max(t.kt for t in tgraphs)
    tgraphs = [repad_tgraph(t, kt) for t in tgraphs]
    return TransposeGraph(
        edge_pos=np.stack([t.edge_pos for t in tgraphs]),
        query=np.stack([t.query for t in tgraphs]),
        mask=np.stack([t.mask for t in tgraphs]),
    )
