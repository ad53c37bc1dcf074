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
    PaddedGraph,
    TransposeGraph,
    _round_up,
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


class GraphBuilder:
    """Builds padded radius/kNN graphs on the host (optionally multi-threaded —
    the native C++ search releases the GIL inside its worker threads)."""

    def __init__(self, method: str = "auto", pad_multiple: int = 8,
                 neighbor_cap: Optional[int] = None, node_pad_multiple: int = 64,
                 workers: Optional[int] = None, strategy: str = "radius",
                 knn_k: int = 16):
        if strategy not in ("radius", "knn"):
            raise ValueError(f"Unknown neighbor strategy: {strategy}")
        self.method = method
        self.pad_multiple = pad_multiple
        self.neighbor_cap = neighbor_cap
        self.node_pad_multiple = node_pad_multiple
        self.workers = workers if workers is not None else min(8, os.cpu_count() or 1)
        self.strategy = strategy
        self.knn_k = knn_k

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

        def build_one(i):
            x_raw = np.asarray(x_data[i], dtype=np.float64)
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
            return i, x_model, enc, dec

        enc_per_sample = [None] * num_samples
        dec_per_sample = [None] * num_samples
        if self.workers > 1 and num_samples > 1:
            with concurrent.futures.ThreadPoolExecutor(self.workers) as pool:
                results = list(pool.map(build_one, range(num_samples)))
        else:
            results = [build_one(i) for i in range(num_samples)]
        for i, x_scaled, enc, dec in results:
            coords[i, :n] = x_scaled
            node_mask[i, :n] = True
            enc_per_sample[i] = enc
            dec_per_sample[i] = dec

        num_scales = len(scales)
        encoder = [stack_graphs([enc_per_sample[i][s] for i in range(num_samples)])
                   for s in range(num_scales)]
        decoder = [stack_graphs([dec_per_sample[i][s] for i in range(num_samples)])
                   for s in range(num_scales)]
        return VxSplitGraphs(coords=coords, node_mask=node_mask,
                             encoder=encoder, decoder=decoder)

    # -- disk cache (CachedGraphBuilder equivalent, reference
    # graph_builder.py:177-285) --------------------------------------------
    def _cache_path(self, cache_dir: str, dataset: str, radius: float,
                    scales: Sequence[float], num_samples: Dict[str, int],
                    with_transpose: bool = False) -> str:
        import hashlib
        import json

        key = json.dumps({
            "dataset": dataset, "radius": radius, "scales": list(scales),
            "strategy": self.strategy, "knn_k": self.knn_k,
            "pad": self.pad_multiple, "cap": self.neighbor_cap,
            "node_pad": self.node_pad_multiple, "samples": num_samples,
            "tgraphs": with_transpose,
        }, sort_keys=True)
        digest = hashlib.sha1(key.encode()).hexdigest()[:16]
        return os.path.join(cache_dir, f"graphs_{dataset}_{digest}.npz")

    def build_all_vx_graphs_cached(self, cache_dir: str, dataset: str,
                                   data_splits: Dict, latent_queries: np.ndarray,
                                   radius: float, scales: Sequence[float],
                                   build_train: bool = True,
                                   model_transform=None,
                                   with_transpose: bool = False):
        """build_all_vx_graphs with an on-disk npz cache (incl. transpose
        graphs when requested; with_transpose is part of the cache key)."""
        counts = {s: int(len(data_splits[s]["x"])) for s in data_splits
                  if data_splits[s].get("x") is not None}
        path = self._cache_path(cache_dir, dataset, radius, scales, counts,
                                with_transpose=with_transpose)
        num_scales = len(scales)
        if os.path.exists(path):
            print(f"Graph cache hit: {path}")
            with np.load(path, allow_pickle=False) as z:
                out = {}
                for split in ["train", "val", "test"]:
                    if f"{split}_coords" not in z:
                        out[split] = None
                        continue

                    def tgs(prefix):
                        if f"{split}_{prefix}_tpos_0" not in z:
                            return None
                        return [TransposeGraph(z[f"{split}_{prefix}_tpos_{i}"],
                                               z[f"{split}_{prefix}_tq_{i}"],
                                               z[f"{split}_{prefix}_tmask_{i}"])
                                for i in range(num_scales)]

                    out[split] = VxSplitGraphs(
                        coords=z[f"{split}_coords"],
                        node_mask=z[f"{split}_node_mask"],
                        encoder=[PaddedGraph(z[f"{split}_enc_idx_{i}"],
                                             z[f"{split}_enc_mask_{i}"])
                                 for i in range(num_scales)],
                        decoder=[PaddedGraph(z[f"{split}_dec_idx_{i}"],
                                             z[f"{split}_dec_mask_{i}"])
                                 for i in range(num_scales)],
                        encoder_t=tgs("enc"),
                        decoder_t=tgs("dec"),
                    )
                return out
        out = self.build_all_vx_graphs(data_splits, latent_queries, radius,
                                       scales, build_train=build_train,
                                       model_transform=model_transform,
                                       with_transpose=with_transpose)
        os.makedirs(cache_dir, exist_ok=True)
        payload = {}
        for split, g in out.items():
            if g is None:
                continue
            payload[f"{split}_coords"] = g.coords
            payload[f"{split}_node_mask"] = g.node_mask
            for i, (e, d) in enumerate(zip(g.encoder, g.decoder)):
                payload[f"{split}_enc_idx_{i}"] = e.indices
                payload[f"{split}_enc_mask_{i}"] = e.mask
                payload[f"{split}_dec_idx_{i}"] = d.indices
                payload[f"{split}_dec_mask_{i}"] = d.mask
            for prefix, tgs in (("enc", g.encoder_t), ("dec", g.decoder_t)):
                for i, t in enumerate(tgs or []):
                    payload[f"{split}_{prefix}_tpos_{i}"] = t.edge_pos
                    payload[f"{split}_{prefix}_tq_{i}"] = t.query
                    payload[f"{split}_{prefix}_tmask_{i}"] = t.mask
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
        )

    def build_all_vx_graphs(self, data_splits: Dict, latent_queries: np.ndarray,
                            radius: float, scales: Sequence[float],
                            build_train: bool = True,
                            model_transform=None,
                            with_transpose: bool = False) -> Dict[str, Optional[VxSplitGraphs]]:
        """Build vx graphs for every split with unified shapes across splits
        (single XLA compilation for train/val/test)."""
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
            if with_transpose:
                # Per-sample transpose graphs (scatter-free backward), built
                # from the K-unified stacks so flat edge positions are final.
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


def attach_transpose_graphs(built: List[VxSplitGraphs], q_lat: int,
                            num_scales: int) -> None:
    """Attach per-sample transpose graphs (Kt unified across splits)."""
    from ..ops.padding import repad_tgraph

    for g in built:
        n_pad_g = g.coords.shape[1]
        g.encoder_t = [
            stack_tgraphs([
                transpose_graph(PaddedGraph(e.indices[i], e.mask[i]), n_pad_g)
                for i in range(e.indices.shape[0])])
            for e in g.encoder
        ]
        g.decoder_t = [
            stack_tgraphs([
                transpose_graph(PaddedGraph(d.indices[i], d.mask[i]), q_lat)
                for i in range(d.indices.shape[0])])
            for d in g.decoder
        ]
    for si in range(num_scales):
        kt_enc = max(g.encoder_t[si].kt for g in built)
        kt_dec = max(g.decoder_t[si].kt for g in built)
        for g in built:
            g.encoder_t[si] = repad_tgraph(g.encoder_t[si], kt_enc)
            g.decoder_t[si] = repad_tgraph(g.decoder_t[si], kt_dec)
