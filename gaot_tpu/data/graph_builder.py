"""Graph construction for the data pipeline.

Equivalent of the reference GraphBuilder (src/datasets/graph_builder.py:13-174)
with TPU-static output: instead of per-sample ragged CSR lists, it emits
split-wide padded index/mask arrays with a single (N, K_enc, K_dec) shape per
dataset so XLA compiles the model exactly once.

- fx mode: one encoder graph (physical→latent) and one decoder graph
  (latent→physical) per scale, shared by every batch.
- vx mode: per-sample graphs stacked to [S, Q, K]; per-sample node counts are
  padded to a common N with far-away sentinel coordinates (no neighbors
  within any radius) plus a node mask for the loss.
"""
from __future__ import annotations

import concurrent.futures
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..ops.neighbor_search import knn_search, radius_search
from ..ops.padding import (
    BatchedBucketedGraph,
    GroupedTransposeGraph,
    PaddedGraph,
    TransposeGraph,
    degree_group_tgraph,
    _round_up,
    morton_order,
    pad_csr,
    repad,
    stack_graphs,
    stack_tgraphs,
    transpose_graph,
)
from ..utils.scaling import rescale

SENTINEL = 10.0  # padded-node coordinate: farther than any radius in [-1,1] space


@dataclass
class VxSplitGraphs:
    """Per-split padded graphs + padded coordinates for vx mode."""

    coords: np.ndarray          # [S, N_pad, d] model-space coords (coord_scaler)
    node_mask: np.ndarray       # [S, N_pad] True for real nodes
    encoder: List[PaddedGraph]  # per scale, stacked [S, Q, K_enc]
    decoder: List[PaddedGraph]  # per scale, stacked [S, N_pad, K_dec]
    encoder_t: Optional[List[TransposeGraph]] = None  # per scale [S, N_pad, Kt]
    decoder_t: Optional[List[TransposeGraph]] = None  # per scale [S, Q, Kt]
    # Morton (Z-order) node permutation applied at build time: coords[i, j]
    # is the original node node_perm[i, j]. Per-node data (u/c) entering a
    # loader/batcher alongside these graphs MUST be permuted identically —
    # apply_node_perm does that. None = build order preserved.
    node_perm: Optional[np.ndarray] = None            # int32 [S, N]


def apply_node_perm(perm: Optional[np.ndarray], a: Optional[np.ndarray]):
    """Reorder a per-sample node-axis array to match Morton-ordered graphs.

    perm: int [S, N] (VxSplitGraphs.node_perm); a: [S, N, C] or [S, T, N, C]
    with the node axis at -2. No-op when either side is None."""
    if perm is None or a is None:
        return a
    s, n = perm.shape
    if a.shape[-2] < n:
        raise ValueError(f"node axis {a.shape[-2]} < perm width {n}")
    if a.shape[-2] > n:  # already padded: permute the real rows, keep tail
        head = apply_node_perm(perm, a[..., :n, :])
        return np.concatenate([head, a[..., n:, :]], axis=-2)
    if a.ndim == 3:
        return a[np.arange(s)[:, None], perm]
    if a.ndim == 4:
        return a[np.arange(s)[:, None, None],
                 np.arange(a.shape[1])[None, :, None],
                 perm[:, None, :]]
    raise ValueError(f"unsupported ndim {a.ndim} for node permutation")


class GraphBuilder:
    """Builds padded radius/kNN graphs on the host (optionally multi-threaded —
    the native C++ search releases the GIL inside its worker threads)."""

    def __init__(self, method: str = "auto", pad_multiple: int = 8,
                 neighbor_cap: Optional[int] = None, node_pad_multiple: int = 64,
                 workers: Optional[int] = None, strategy: str = "radius",
                 knn_k: int = 16, morton: bool = False):
        if strategy not in ("radius", "knn"):
            raise ValueError(f"Unknown neighbor strategy: {strategy}")
        self.method = method
        self.pad_multiple = pad_multiple
        self.neighbor_cap = neighbor_cap
        self.node_pad_multiple = node_pad_multiple
        self.workers = workers if workers is not None else min(8, os.cpu_count() or 1)
        self.strategy = strategy
        self.knn_k = knn_k
        # Morton-order vx nodes at build time: spatially sorted nodes make
        # the model's per-edge row gathers locally dense instead of
        # random-row DMA (ops/padding.py::morton_order). The permutation is
        # surfaced as VxSplitGraphs.node_perm so loaders reorder u/c to
        # match (data-layout change only; masked losses/metrics are
        # permutation-invariant).
        self.morton = morton

    def _search(self, data: np.ndarray, queries: np.ndarray, radius: float,
                scale: float = 1.0):
        """Radius or kNN search per the configured strategy (the reference's
        MAGNOConfig.neighbor_strategy, src/model/layers/magno.py:59). For
        'knn' the multi-scale factor multiplies k instead of the radius."""
        if self.strategy == "knn":
            k = max(1, int(round(self.knn_k * scale)))
            return knn_search(data, queries, k, method=self.method)
        return radius_search(data, queries, radius * scale, method=self.method)

    def _pad(self, csr):
        return pad_csr(*csr, pad_multiple=self.pad_multiple, cap=self.neighbor_cap)

    # -- fx ------------------------------------------------------------
    def build_fx_graphs(self, x_coord: np.ndarray, latent_queries: np.ndarray,
                        radius: float, scales: Sequence[float]):
        """One (encoder, decoder) padded graph pair per scale."""
        encoder, decoder = [], []
        for s in scales:
            encoder.append(self._pad(self._search(x_coord, latent_queries, radius, s)))
            decoder.append(self._pad(self._search(latent_queries, x_coord, radius, s)))
        return encoder, decoder

    # -- vx ------------------------------------------------------------
    def build_vx_split(self, x_data: np.ndarray, latent_queries: np.ndarray,
                       radius: float, scales: Sequence[float],
                       n_pad: Optional[int] = None,
                       model_transform=None) -> VxSplitGraphs:
        """Build per-sample graphs for a whole split and stack them.

        x_data: [S, N, d] (or [S, 1, N, d]); per-sample coordinates are
        rescaled to [-1, 1] for the neighbor search (reference
        graph_builder.py:59-60), while the coords handed to the model use
        ``model_transform`` (the dataset CoordinateScaler, reference
        data_utils.py:63-65) — defaulting to the same rescale.
        """
        if x_data.ndim == 4:
            x_data = x_data[:, 0]
        num_samples, n, d = x_data.shape
        n_pad = n_pad or _round_up(n, self.node_pad_multiple)

        coords = np.full((num_samples, n_pad, d), SENTINEL, dtype=np.float32)
        node_mask = np.zeros((num_samples, n_pad), dtype=bool)
        node_perm = (np.zeros((num_samples, n), dtype=np.int32)
                     if self.morton else None)

        def build_one(i):
            x_raw = np.asarray(x_data[i], dtype=np.float64)
            if self.morton:
                perm = morton_order(x_raw)
                x_raw = x_raw[perm]
            else:
                perm = None
            x = rescale(x_raw, (-1, 1))
            x_model = (model_transform(x_raw) if model_transform is not None
                       else x).astype(np.float32)
            enc, dec = [], []
            for s in scales:
                enc.append(self._pad(self._search(x, latent_queries, radius, s)))
                dg = self._pad(self._search(latent_queries, x, radius, s))
                # Pad decoder query rows (one per physical node) to n_pad.
                pad_rows = n_pad - dg.indices.shape[0]
                dec.append(PaddedGraph(
                    np.pad(dg.indices, ((0, pad_rows), (0, 0))),
                    np.pad(dg.mask, ((0, pad_rows), (0, 0)))))
            return i, x_model, enc, dec, perm

        enc_per_sample = [None] * num_samples
        dec_per_sample = [None] * num_samples
        if self.workers > 1 and num_samples > 1:
            with concurrent.futures.ThreadPoolExecutor(self.workers) as pool:
                results = list(pool.map(build_one, range(num_samples)))
        else:
            results = [build_one(i) for i in range(num_samples)]
        for i, x_scaled, enc, dec, perm in results:
            coords[i, :n] = x_scaled
            node_mask[i, :n] = True
            enc_per_sample[i] = enc
            dec_per_sample[i] = dec
            if perm is not None:
                node_perm[i] = perm

        num_scales = len(scales)
        encoder = [stack_graphs([enc_per_sample[i][s] for i in range(num_samples)])
                   for s in range(num_scales)]
        decoder = [stack_graphs([dec_per_sample[i][s] for i in range(num_samples)])
                   for s in range(num_scales)]
        return VxSplitGraphs(coords=coords, node_mask=node_mask,
                             encoder=encoder, decoder=decoder,
                             node_perm=node_perm)

    # -- disk cache (CachedGraphBuilder equivalent, reference
    # graph_builder.py:177-285) --------------------------------------------
    def _cache_path(self, cache_dir: str, dataset: str, radius: float,
                    scales: Sequence[float], num_samples: Dict[str, int],
                    with_transpose: bool = False,
                    bucketing: bool = False) -> str:
        import hashlib
        import json

        key = json.dumps({
            "dataset": dataset, "radius": radius, "scales": list(scales),
            "strategy": self.strategy, "knn_k": self.knn_k,
            "pad": self.pad_multiple, "cap": self.neighbor_cap,
            "node_pad": self.node_pad_multiple, "samples": num_samples,
            "tgraphs": with_transpose, "bucketing": bucketing,
            "morton": self.morton, "grouped_df": grouped_df_enabled(),
            "vx_min_bucket_k": vx_min_bucket_k(),
        }, sort_keys=True)
        digest = hashlib.sha1(key.encode()).hexdigest()[:16]
        return os.path.join(cache_dir, f"graphs_{dataset}_{digest}.npz")

    def build_all_vx_graphs_cached(self, cache_dir: str, dataset: str,
                                   data_splits: Dict, latent_queries: np.ndarray,
                                   radius: float, scales: Sequence[float],
                                   build_train: bool = True,
                                   model_transform=None,
                                   with_transpose: bool = False,
                                   bucketing: bool = False):
        """build_all_vx_graphs with an on-disk npz cache. with_transpose and
        bucketing are part of the cache key; the stored format is the flat
        key vocabulary of vx_graph_buffers, split-prefixed."""
        counts = {s: int(len(data_splits[s]["x"])) for s in data_splits
                  if data_splits[s].get("x") is not None}
        path = self._cache_path(cache_dir, dataset, radius, scales, counts,
                                with_transpose=with_transpose,
                                bucketing=bucketing)
        num_scales = len(scales)
        if os.path.exists(path):
            print(f"Graph cache hit: {path}")
            with np.load(path, allow_pickle=False) as z:
                out = {}
                for split in ["train", "val", "test"]:
                    keys = [k for k in z.files if k.startswith(f"{split}::")]
                    if not keys:
                        out[split] = None
                        continue
                    bufs = {k.split("::", 1)[1]: z[k] for k in keys}
                    out[split] = vx_split_from_buffers(bufs, num_scales)
                return out
        out = self.build_all_vx_graphs(data_splits, latent_queries, radius,
                                       scales, build_train=build_train,
                                       model_transform=model_transform,
                                       with_transpose=with_transpose,
                                       bucketing=bucketing)
        os.makedirs(cache_dir, exist_ok=True)
        payload = {}
        for split, g in out.items():
            if g is None:
                continue
            for k, v in vx_graph_buffers(g).items():
                payload[f"{split}::{k}"] = v
        np.savez(path, **payload)
        return out

    @classmethod
    def from_magno_config(cls, magno) -> "GraphBuilder":
        """Builder configured from a MAGNOConfig (search method, padding,
        neighbor strategy; kNN k falls back to max_neighbors or 16)."""
        return cls(
            method=magno.neighbor_search_method,
            pad_multiple=magno.neighbor_pad_multiple,
            neighbor_cap=magno.neighbor_cap,
            strategy=magno.neighbor_strategy,
            knn_k=magno.max_neighbors or 16,
            morton=magno.morton_ordering,
        )

    def build_all_vx_graphs(self, data_splits: Dict, latent_queries: np.ndarray,
                            radius: float, scales: Sequence[float],
                            build_train: bool = True,
                            model_transform=None,
                            with_transpose: bool = False,
                            bucketing: bool = False) -> Dict[str, Optional[VxSplitGraphs]]:
        """Build vx graphs for every split with unified shapes across splits
        (single XLA compilation for train/val/test).

        ``bucketing``: re-pack each scale's stacked graphs into shared-layout
        degree buckets (ops/padding.py::bucketize_graphs_stacked) — the
        bucket K values and per-bucket row counts are chosen over ALL splits
        jointly so train/val/test share one compiled program. Scales whose
        padding win doesn't clear the economics threshold keep the dense
        layout (per-scale decision, mirrored in the loaders)."""
        split_names = ["test"] + (["train", "val"] if build_train else [])
        max_n = max(
            (data_splits[s]["x"].shape[-2] for s in split_names if s in data_splits),
            default=0)
        n_pad = _round_up(max_n, self.node_pad_multiple)

        out: Dict[str, Optional[VxSplitGraphs]] = {"train": None, "val": None, "test": None}
        for s in split_names:
            if s in data_splits and data_splits[s]["x"] is not None \
                    and len(data_splits[s]["x"]):
                out[s] = self.build_vx_split(
                    data_splits[s]["x"], latent_queries, radius, scales,
                    n_pad=n_pad, model_transform=model_transform)

        # Unify K across splits per scale so one compiled program serves all.
        built = [g for g in out.values() if g is not None]
        if built:
            for si in range(len(scales)):
                k_enc = max(g.encoder[si].k for g in built)
                k_dec = max(g.decoder[si].k for g in built)
                for g in built:
                    g.encoder[si] = repad(g.encoder[si], k_enc)
                    g.decoder[si] = repad(g.decoder[si], k_dec)
            if bucketing:
                bucketize_vx_splits(built, latent_queries.shape[0],
                                    len(scales), with_transpose)
            if with_transpose:
                # Per-sample transpose graphs (scatter-free backward), built
                # from the K-unified stacks so flat edge positions are final.
                # Bucketed scales already embed their transpose graphs.
                attach_transpose_graphs(built, latent_queries.shape[0], len(scales))
        return out


def prepare_fx_device_graphs(enc: List[PaddedGraph], dec: List[PaddedGraph],
                             num_nodes: int, num_latent: int, magno) -> tuple:
    """Turn host fx graphs into device-ready model args.

    Shared by the static and sequential trainers (and bench.py). Per scale:

    - ``magno.use_query_bucketing``: re-pack into degree buckets
      (ops/padding.py::bucketize_graph, transpose graphs embedded per
      bucket) when the padding win clears the threshold;
    - otherwise keep the dense PaddedGraph, with a separate transpose graph
      when ``magno.use_transpose_backward``.

    Returns (enc_graphs, dec_graphs, enc_tgraphs, dec_tgraphs); the tgraph
    lists are None when every scale carries its transpose inside a
    BucketedGraph (or transpose backward is off).
    """
    import jax
    import jax.numpy as jnp

    from ..ops.padding import bucketize_graph

    use_t = magno.use_transpose_backward
    # Nonlinear kernels gather per-edge features into the kernel-MLP input;
    # the bucketed path would fall back to autodiff's scatter-add for d_f
    # there, so those configs keep the dense layout + transpose graphs.
    bucketing = (magno.use_query_bucketing
                 and magno.transform_type in ("linear", "linear_kernelonly"))

    def prep(graphs, num_sources):
        out_g, out_t = [], []
        for g in graphs:
            bg = (bucketize_graph(g, num_sources, with_transpose=use_t)
                  if bucketing else None)
            if bg is not None:
                if bg.tgraph is not None and grouped_df_enabled():
                    # In-degree-group the combined transpose graph (fx:
                    # one "sample", [1, N, Kt] view) — the fx d_f gathers
                    # move [B·C] 8 KB rows, so the ~3× masked padding is
                    # wasted BYTES here, not just descriptors.
                    gt = degree_group_tgraph(
                        TransposeGraph(bg.tgraph.edge_pos[None],
                                       bg.tgraph.query[None],
                                       bg.tgraph.mask[None]))
                    bg = bg._replace(tgraph=gt)
                out_g.append(jax.tree.map(jnp.asarray, bg))
                out_t.append(None)
            else:
                out_g.append(PaddedGraph(jnp.asarray(g.indices),
                                         jnp.asarray(g.mask)))
                out_t.append(jax.tree.map(jnp.asarray,
                                          transpose_graph(g, num_sources))
                             if use_t else None)
        if all(t is None for t in out_t):
            out_t = None
        return out_g, out_t

    enc_g, enc_t = prep(enc, num_nodes)
    dec_g, dec_t = prep(dec, num_latent)
    return enc_g, dec_g, enc_t, dec_t


def vx_min_bucket_k() -> int:
    """Minimum dense K at which the vx stacked bucketizer engages.

    The fx-era default (12) predates the round-5 gather economics: with
    coordinate-augmented gathers the decoder's dense [Q, 8] layout (42%
    fill, mean degree 3.4) wastes ~2.4× of the largest remaining gather
    family AND of the per-edge kernel-MLP work, so K=8 graphs now bucket
    profitably. GAOT_VX_MIN_BUCKET_K overrides (build-time; part of the
    graph cache key)."""
    return int(os.environ.get("GAOT_VX_MIN_BUCKET_K", "6"))


def grouped_df_enabled() -> bool:
    """In-degree-grouped transpose graphs for the vx d_f backward scans
    (ops/padding.py::degree_group_tgraph). Read at graph-BUILD time — the
    grouping changes the stored buffer layout, so it is part of the graph
    cache key. GAOT_GROUPED_DF=0 restores the flat [N, Kt] layout (ablate/
    diagnostic)."""
    return os.environ.get("GAOT_GROUPED_DF", "1") == "1"


def vx_graph_buffers(graphs: VxSplitGraphs) -> Dict[str, np.ndarray]:
    """Serialize a VxSplitGraphs into a flat dict of per-sample arrays —
    the single key vocabulary shared by the static vx loader, the sequential
    batchers, the graph disk cache, and the trainers' batch reassembly
    (vx_batch_graphs). Per scale s and side p ∈ {enc, dec}:

    - dense:    {p}_idx_{s}, {p}_mask_{s}  (+ optional transpose
                {p}_tpos_{s}/{p}_tq_{s}/{p}_tmask_{s})
    - bucketed: {p}_b{j}_idx_{s}, {p}_b{j}_mask_{s} per bucket j,
                {p}_perm_{s}, {p}_inv_{s}, {p}_rv_{s}, and the embedded
                transpose under the same t-keys.
    """
    bufs = {"x": graphs.coords, "node_mask": graphs.node_mask}
    if graphs.node_perm is not None:
        bufs["node_perm"] = graphs.node_perm

    def put(p, s, g, tg):
        if isinstance(g, BatchedBucketedGraph):
            for j, b in enumerate(g.buckets):
                bufs[f"{p}_b{j}_idx_{s}"] = b.indices
                bufs[f"{p}_b{j}_mask_{s}"] = b.mask
            bufs[f"{p}_perm_{s}"] = g.perm
            bufs[f"{p}_inv_{s}"] = g.inv_perm
            bufs[f"{p}_rv_{s}"] = g.row_valid
            tg = g.tgraph
        else:
            bufs[f"{p}_idx_{s}"] = g.indices
            bufs[f"{p}_mask_{s}"] = g.mask
        if isinstance(tg, GroupedTransposeGraph):
            bufs[f"{p}_tinv_{s}"] = tg.inv_perm
            for j, gg in enumerate(tg.groups):
                bufs[f"{p}_tg{j}_pos_{s}"] = gg.edge_pos
                bufs[f"{p}_tg{j}_q_{s}"] = gg.query
                bufs[f"{p}_tg{j}_mask_{s}"] = gg.mask
        elif tg is not None:
            bufs[f"{p}_tpos_{s}"] = tg.edge_pos
            bufs[f"{p}_tq_{s}"] = tg.query
            bufs[f"{p}_tmask_{s}"] = tg.mask

    for s, g in enumerate(graphs.encoder):
        put("enc", s, g, graphs.encoder_t[s] if graphs.encoder_t else None)
    for s, g in enumerate(graphs.decoder):
        put("dec", s, g, graphs.decoder_t[s] if graphs.decoder_t else None)
    return bufs


def _graphs_from_keys(src: Dict, p: str, s: int):
    """(graph, separate_tgraph) for side p, scale s from a key dict — arrays
    may be NumPy (host) or traced jax values (inside the epoch scan)."""
    def tg():
        if f"{p}_tinv_{s}" in src:
            groups, j = [], 0
            while f"{p}_tg{j}_pos_{s}" in src:
                groups.append(TransposeGraph(src[f"{p}_tg{j}_pos_{s}"],
                                             src[f"{p}_tg{j}_q_{s}"],
                                             src[f"{p}_tg{j}_mask_{s}"]))
                j += 1
            return GroupedTransposeGraph(tuple(groups), src[f"{p}_tinv_{s}"])
        key = f"{p}_tpos_{s}"
        if key not in src:
            return None
        return TransposeGraph(src[key], src[f"{p}_tq_{s}"],
                              src[f"{p}_tmask_{s}"])

    if f"{p}_b0_idx_{s}" in src:
        buckets = []
        j = 0
        while f"{p}_b{j}_idx_{s}" in src:
            buckets.append(PaddedGraph(src[f"{p}_b{j}_idx_{s}"],
                                       src[f"{p}_b{j}_mask_{s}"]))
            j += 1
        return BatchedBucketedGraph(
            buckets=tuple(buckets), tgraph=tg(), perm=src[f"{p}_perm_{s}"],
            inv_perm=src[f"{p}_inv_{s}"], row_valid=src[f"{p}_rv_{s}"]), None
    return PaddedGraph(src[f"{p}_idx_{s}"], src[f"{p}_mask_{s}"]), tg()


def vx_batch_graphs(batch: Dict, num_scales: int):
    """Reassemble per-scale vx graphs from a batch dict.

    Returns (enc, dec, enc_t, dec_t); the t-lists collapse to None when no
    scale carries a separate transpose graph (bucketed scales embed theirs)."""
    enc, enc_t, dec, dec_t = [], [], [], []
    for s in range(num_scales):
        g, t = _graphs_from_keys(batch, "enc", s)
        enc.append(g)
        enc_t.append(t)
        g, t = _graphs_from_keys(batch, "dec", s)
        dec.append(g)
        dec_t.append(t)
    if any(t is None for t in enc_t):
        enc_t = None
    if any(t is None for t in dec_t):
        dec_t = None
    return enc, dec, enc_t, dec_t


def vx_split_from_buffers(bufs: Dict[str, np.ndarray],
                          num_scales: int) -> VxSplitGraphs:
    """Inverse of vx_graph_buffers (used by the graph disk cache)."""
    enc, dec, enc_t, dec_t = vx_batch_graphs(bufs, num_scales)
    return VxSplitGraphs(coords=bufs["x"], node_mask=bufs["node_mask"],
                         encoder=enc, decoder=dec,
                         encoder_t=enc_t, decoder_t=dec_t,
                         node_perm=bufs.get("node_perm"))


def bucketize_vx_splits(built: List[VxSplitGraphs], q_lat: int,
                        num_scales: int, with_transpose: bool) -> None:
    """Degree-bucket the stacked vx graphs of every split with ONE shared
    layout: the splits' sample stacks are concatenated, bucketized jointly
    (shared bucket Ks and per-bucket row counts), and sliced back, so
    train/val/test batches compile to the same program. Scales where
    bucketing doesn't pay keep their dense PaddedGraph (the loaders and
    trainers dispatch per scale on the stored type)."""
    from ..ops.padding import bucketize_graphs_stacked

    n_pad = built[0].coords.shape[1]

    def run(stacks: List[PaddedGraph], num_sources: int):
        cat = PaddedGraph(
            np.concatenate([g.indices for g in stacks], axis=0),
            np.concatenate([g.mask for g in stacks], axis=0))
        bb = bucketize_graphs_stacked(cat, num_sources,
                                      with_transpose=with_transpose,
                                      min_k=vx_min_bucket_k())
        if bb is None:
            return None
        gt = None
        if bb.tgraph is not None and grouped_df_enabled():
            # Group jointly over all splits (shared static group shapes →
            # train/val/test batches compile to the same programs).
            gt = degree_group_tgraph(bb.tgraph)
        outs, off = [], 0
        for g in stacks:
            s = g.indices.shape[0]
            sl = slice(off, off + s)
            if gt is not None:
                tg_s = GroupedTransposeGraph(
                    tuple(gg._replace(edge_pos=gg.edge_pos[sl],
                                      query=gg.query[sl], mask=gg.mask[sl])
                          for gg in gt.groups), gt.inv_perm[sl])
            elif bb.tgraph is not None:
                tg_s = bb.tgraph._replace(
                    edge_pos=bb.tgraph.edge_pos[sl],
                    query=bb.tgraph.query[sl],
                    mask=bb.tgraph.mask[sl])
            else:
                tg_s = None
            outs.append(bb._replace(
                buckets=tuple(PaddedGraph(b.indices[sl], b.mask[sl])
                              for b in bb.buckets),
                tgraph=tg_s,
                perm=bb.perm[sl], inv_perm=bb.inv_perm[sl],
                row_valid=bb.row_valid[sl]))
            off += s
        return outs

    for si in range(num_scales):
        enc_b = run([g.encoder[si] for g in built], n_pad)
        if enc_b is not None:
            for g, bb in zip(built, enc_b):
                g.encoder[si] = bb
        dec_b = run([g.decoder[si] for g in built], q_lat)
        if dec_b is not None:
            for g, bb in zip(built, dec_b):
                g.decoder[si] = bb


def attach_transpose_graphs(built: List[VxSplitGraphs], q_lat: int,
                            num_scales: int) -> None:
    """Attach per-sample transpose graphs (Kt unified across splits)."""
    from ..ops.padding import repad_tgraph

    def tg_or_none(g, num_sources):
        """Bucketed scales embed their transpose graph — skip them here."""
        if not isinstance(g, PaddedGraph):
            return None
        return stack_tgraphs([
            transpose_graph(PaddedGraph(g.indices[i], g.mask[i]), num_sources)
            for i in range(g.indices.shape[0])])

    for g in built:
        n_pad_g = g.coords.shape[1]
        g.encoder_t = [tg_or_none(e, n_pad_g) for e in g.encoder]
        g.decoder_t = [tg_or_none(d, q_lat) for d in g.decoder]
    def unify_and_group(side):
        stacks = [getattr(g, side)[si] for g in built]
        if stacks[0] is None:
            return
        kt = max(t.kt for t in stacks)
        stacks = [repad_tgraph(t, kt) for t in stacks]
        if grouped_df_enabled():
            cat = TransposeGraph(
                np.concatenate([t.edge_pos for t in stacks], axis=0),
                np.concatenate([t.query for t in stacks], axis=0),
                np.concatenate([t.mask for t in stacks], axis=0))
            gt = degree_group_tgraph(cat)
            off = 0
            for g, t in zip(built, stacks):
                n = t.edge_pos.shape[0]
                sl = slice(off, off + n)
                getattr(g, side)[si] = GroupedTransposeGraph(
                    tuple(gg._replace(edge_pos=gg.edge_pos[sl],
                                      query=gg.query[sl], mask=gg.mask[sl])
                          for gg in gt.groups), gt.inv_perm[sl])
                off += n
        else:
            for g, t in zip(built, stacks):
                getattr(g, side)[si] = t

    for si in range(num_scales):
        unify_and_group("encoder_t")
        unify_and_group("decoder_t")
    for g in built:
        if all(t is None for t in g.encoder_t):
            g.encoder_t = None
        if all(t is None for t in g.decoder_t):
            g.decoder_t = None
