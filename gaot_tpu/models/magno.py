"""MAGNO — Multiscale Attentional Graph Neural Operator encoder/decoder (Flax).

Re-design of the reference MAGNO (src/model/layers/magno.py:74-751) with two
TPU-first changes:

1. Graphs are always precomputed on the host as padded `[Q, K]` arrays; there
   is no on-device neighbor search (the reference computes/caches CSR graphs
   inside forward, magno.py:174-215).
2. Variable-coordinate (vx) batches — which the reference processes in a
   serial per-sample Python loop (magno.py:356-413, 694-751) — are folded
   into the query axis: per-sample node sets are flattened to one big point
   set, graph indices are offset per sample, and a single static-shape AGNO
   call covers the whole batch. One compile, full MXU utilization, no loop.

Fixed-coordinate (fx) batches share one graph, so kernel values are computed
once per graph and broadcast over the batch (B× fewer kernel-MLP FLOPs).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

import numpy as np

from ..core.config import MAGNOConfig
from ..ops.edge_drop import apply_edge_drop_mask
from ..ops.gather_apply import unpermute_rows
from ..ops.padding import (
    BatchedBucketedGraph,
    BucketedGraph,
    GroupedTransposeGraph,
    PaddedGraph,
    TransposeGraph,
)
from .agno import AGNO, aug_gather_on
from .gemb import GeometricEmbedding, node_pos_encode
from .mlp import ChannelMLP, ScaleWeightMLP


def _kernel_coord_dim(config: MAGNOConfig) -> int:
    return config.coord_dim * 4 * 2 if config.node_embedding else config.coord_dim


def flatten_vx_graph(graph: PaddedGraph, num_sources: int) -> PaddedGraph:
    """Offset per-sample neighbor indices into a flattened source point set.

    graph: indices/mask [B, Q, K] indexing per-sample sources [0, num_sources)
    → indices/mask [B*Q, K] indexing the concatenated sources [0, B*num_sources).
    """
    b, q, k = graph.indices.shape
    offsets = (jnp.arange(b, dtype=graph.indices.dtype) * num_sources)[:, None, None]
    indices = (graph.indices + offsets).reshape(b * q, k)
    mask = graph.mask.reshape(b * q, k)
    return PaddedGraph(indices=indices, mask=mask)


def flatten_vx_tgraph(tgraph: TransposeGraph, num_queries: int,
                      k: int) -> TransposeGraph:
    """Offset per-sample transpose graphs into the flattened edge space.

    tgraph: [B, S, Kt] built per sample against per-sample forward graphs
    [num_queries, k]. In the flattened graph sample b's edges occupy flat
    positions b·num_queries·k + (q·k + j) and queries b·num_queries + q.
    """
    b, s, kt = tgraph.edge_pos.shape
    e_off = (jnp.arange(b, dtype=tgraph.edge_pos.dtype) * (num_queries * k))[:, None, None]
    q_off = (jnp.arange(b, dtype=tgraph.query.dtype) * num_queries)[:, None, None]
    return TransposeGraph(
        edge_pos=(tgraph.edge_pos + e_off).reshape(b * s, kt),
        query=(tgraph.query + q_off).reshape(b * s, kt),
        mask=tgraph.mask.reshape(b * s, kt),
    )


def flatten_vx_bucketed(bb: BatchedBucketedGraph,
                        num_sources: int) -> BucketedGraph:
    """Flatten a batch of shared-layout per-sample bucketed graphs
    (ops/padding.py::bucketize_graphs_stacked, batch-sliced to leading B)
    into ONE flat BucketedGraph over the concatenated source set — the
    bucketed analogue of flatten_vx_graph/flatten_vx_tgraph.

    Flat layouts (bucket-major, sample-minor):
      rows of bucket j: position B·ΣR_{<j} + s·R_j + r;
      edges of bucket j: position B·Σ(R·K)_{<j} + s·R_j·K_j + e  with
        e = r·K_j + k (matching the coef concat in
        ops/gather_apply.py::_bucketed_bwd);
      original query space: sample-major flat [B·Q].
    """
    b, q = bb.inv_perm.shape
    rs = list(bb.bucket_rows)
    ks = list(bb.bucket_ks)
    nb = len(rs)
    sizes_e = [r * k for r, k in zip(rs, ks)]
    e_base = np.concatenate([[0], np.cumsum(sizes_e)]).astype(np.int64)
    r_base = np.concatenate([[0], np.cumsum(rs)]).astype(np.int64)

    def remap(pos, old_base, sizes, stride):
        """Per-sample concat position → flat bucket-major position."""
        out = jnp.zeros_like(pos)
        s = jnp.arange(b, dtype=pos.dtype).reshape((b,) + (1,) * (pos.ndim - 1))
        for j in range(nb):
            lo = int(old_base[j])
            sel = (pos >= lo) & (pos < lo + int(sizes[j]))
            out = jnp.where(sel,
                            b * lo + s * int(stride[j]) + (pos - lo), out)
        return out

    buckets = []
    for g, k in zip(bb.buckets, ks):
        off = (jnp.arange(b, dtype=g.indices.dtype) * num_sources)[:, None, None]
        buckets.append(PaddedGraph((g.indices + off).reshape(-1, k),
                                   g.mask.reshape(-1, k)))

    tg = None
    if isinstance(bb.tgraph, GroupedTransposeGraph):
        # Degree-grouped per-sample tgraph (ops/padding.py): already stores
        # per-sample-LOCAL concat ids — the grouped d_f scan consumes it
        # stacked, so no flattening/remap at all.
        tg = bb.tgraph
    elif bb.tgraph is not None:
        kt = bb.tgraph.edge_pos.shape[-1]
        ep = remap(bb.tgraph.edge_pos, e_base, sizes_e, sizes_e)
        tg = TransposeGraph(
            edge_pos=ep.reshape(-1, kt),
            query=remap(bb.tgraph.query, r_base, rs, rs).reshape(-1, kt),
            mask=bb.tgraph.mask.reshape(-1, kt))

    perm_parts, rv_parts = [], []
    q_off = (jnp.arange(b, dtype=bb.perm.dtype) * q)[:, None]
    for j in range(nb):
        sl = slice(int(r_base[j]), int(r_base[j]) + rs[j])
        rv = bb.row_valid[:, sl]
        perm_parts.append(jnp.where(rv, bb.perm[:, sl] + q_off, 0).reshape(-1))
        rv_parts.append(rv.reshape(-1))

    return BucketedGraph(
        buckets=tuple(buckets), tgraph=tg,
        perm=jnp.concatenate(perm_parts),
        inv_perm=remap(bb.inv_perm, r_base, rs, rs).reshape(-1),
        row_valid=jnp.concatenate(rv_parts))


class _MAGNOBase(nn.Module):
    """Shared multiscale AGNO + geometric-embedding machinery."""

    in_channels: int
    out_channels: int
    config: MAGNOConfig
    agno_out_channels: int          # width of the AGNO/geoembed path
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        cfg = self.config
        kdim = _kernel_coord_dim(cfg)
        kernel_in = kdim * 2
        if cfg.transform_type in ("nonlinear", "nonlinear_kernelonly"):
            kernel_in += self.in_channels
        mlp_sizes = [cfg.hidden_size] * cfg.mlp_layers + [self.agno_out_channels]
        self.agno = AGNO(
            channel_mlp_features=tuple(mlp_sizes),
            transform_type=cfg.transform_type,
            use_attn=cfg.use_attention,
            attention_type=cfg.attention_type,
            coord_dim=kdim,
            dtype=self.dtype,
        )
        if cfg.use_geoembed:
            self.geoembed = GeometricEmbedding(
                output_dim=self.agno_out_channels,
                method=cfg.embedding_method,
                pooling=cfg.pooling,
                dtype=self.dtype,
            )
            self.recovery = ChannelMLP(
                out_channels=self.agno_out_channels, n_layers=1, dtype=self.dtype)
        if cfg.use_scale_weights:
            # Exactly Linear -> ReLU -> Linear, matching the reference's raw
            # nn.Sequential (magno.py:150-156) — NOT its 3-layer MLP class.
            self.scale_weighting = ScaleWeightMLP(
                num_scales=len(cfg.scales),
                hidden_size=cfg.hidden_size // 4,
                dtype=self.dtype,
            )

    def _drop_edges(self, graph: PaddedGraph, training: bool) -> PaddedGraph:
        cfg = self.config
        if not training or cfg.sampling_strategy is None:
            return graph
        rng = self.make_rng("edge_drop")
        mask = apply_edge_drop_mask(
            graph.mask, rng, cfg.sampling_strategy,
            cfg.max_neighbors, cfg.sample_ratio, training=True)
        return PaddedGraph(graph.indices, mask)

    def _agno_scale(self,
                    src_coords: jnp.ndarray,
                    dst_coords: jnp.ndarray,
                    f_src: jnp.ndarray,
                    graph: PaddedGraph,
                    training: bool,
                    num_samples: int,
                    tgraph: Optional[TransposeGraph] = None) -> jnp.ndarray:
        """One scale: AGNO transform + optional geometric embedding + recovery.

        src_coords [n, d], dst_coords [m, d], f_src [batch, n, c] (fx) or
        [n, c] (vx-flattened), graph [m, K].
        """
        cfg = self.config
        if isinstance(graph, BucketedGraph):
            return self._agno_scale_bucketed(src_coords, dst_coords, f_src,
                                             graph, training, num_samples)
        graph = self._drop_edges(graph, training)

        if cfg.node_embedding:
            src_proc = node_pos_encode(src_coords)
            dst_proc = node_pos_encode(dst_coords)
        else:
            src_proc, dst_proc = src_coords, dst_coords

        # Gather the neighbor coords ONCE and share them between the AGNO
        # kernel input and the geometric embedding — [E, d] coord tensors
        # materialize lane-padded on TPU, so the duplicate gather is ~ms.
        # The vx-flat linear path runs K-major (AGNO._call_flat_km), so the
        # shared gather is issued in that orientation too.
        kmajor = (f_src is not None and f_src.ndim == 2 and tgraph is not None
                  and cfg.transform_type == "linear"
                  and not cfg.node_embedding)
        # The flat K-major aug route recovers the fp32 coordinate rows from
        # its own augmented gather — ask for them (return_rep) instead of
        # issuing the separate [E, d] gather here.
        aug = kmajor and aug_gather_on()
        rep = None
        if aug and cfg.use_geoembed:
            out, rep = self.agno(y=src_proc, graph=graph, x=dst_proc,
                                 f_y=f_src, tgraph=tgraph,
                                 num_samples=num_samples, return_rep=True)
        else:
            if cfg.use_geoembed and not cfg.node_embedding and not aug:
                rep = (src_coords[graph.indices.T] if kmajor
                       else src_coords[graph.indices])
            out = self.agno(y=src_proc, graph=graph, x=dst_proc, f_y=f_src,
                            tgraph=tgraph, num_samples=num_samples,
                            rep_coords=rep)

        if cfg.use_geoembed:
            gemb = self.geoembed(src_coords, dst_coords, graph, num_samples,
                                 nbr=rep, kmajor=kmajor)
            if out.ndim == 3:    # fx: [B, m, c] — broadcast the shared embedding
                gemb = jnp.broadcast_to(gemb[None], out.shape[:1] + gemb.shape)
            out = jnp.concatenate([out, gemb], axis=-1)
            out = self.recovery(out)
        return out

    def _agno_scale_bucketed(self,
                             src_coords: jnp.ndarray,
                             dst_coords: jnp.ndarray,
                             f_src: jnp.ndarray,
                             bg: BucketedGraph,
                             training: bool,
                             num_samples: int) -> jnp.ndarray:
        """One scale over a degree-bucketed graph (ops/padding.py).

        Queries are processed per bucket in degree-sorted order — each bucket
        gathers only its own K columns, cutting the dominant gather traffic
        and per-edge kernel-MLP FLOPs by the graph's padding ratio — then
        restored to original query order with a gather-only-backward
        unpermute. Per-query math is identical to the dense layout.
        """
        cfg = self.config
        dst_cat = jnp.take(dst_coords, bg.perm, axis=0)
        src_proc = node_pos_encode(src_coords) if cfg.node_embedding else src_coords
        dst_proc = node_pos_encode(dst_cat) if cfg.node_embedding else dst_cat

        # Edge drop up front so the AGNO transform and the geometric
        # embedding see the same (possibly thinned) neighborhoods, as in the
        # dense layout.
        dropped = bg._replace(buckets=tuple(
            self._drop_edges(g, training) for g in bg.buckets))

        # The bucketed aug route recovers per-bucket fp32 coordinate rows
        # from its own augmented gathers — share them with geoembed instead
        # of re-gathering (see _agno_scale).
        aug = (f_src is not None and f_src.ndim == 2
               and cfg.transform_type == "linear"
               and not cfg.node_embedding
               and dropped.tgraph is not None and aug_gather_on())
        reps = None
        if aug and cfg.use_geoembed:
            cat, reps = self.agno(y=src_proc, graph=dropped, x=dst_proc,
                                  f_y=f_src, num_samples=num_samples,
                                  return_rep=True)
        else:
            cat = self.agno(y=src_proc, graph=dropped, x=dst_proc, f_y=f_src,
                            num_samples=num_samples)

        if cfg.use_geoembed:
            # One geoembed call over all buckets: the statistical features
            # standardize over the full (valid) query set, exactly like the
            # dense layout.
            gemb = self.geoembed(src_coords, dst_cat, dropped, num_samples,
                                 nbr=reps, kmajor=reps is not None)
            if cat.ndim == 3:
                gemb = jnp.broadcast_to(gemb[None], cat.shape[:1] + gemb.shape)
            cat = jnp.concatenate([cat, gemb], axis=-1)
            cat = self.recovery(cat)
        return unpermute_rows(cat, bg.inv_perm, bg.perm, bg.row_valid)

    def _combine_scales(self, per_scale: Sequence[jnp.ndarray],
                        weight_coords: jnp.ndarray) -> jnp.ndarray:
        """Mean or learned softmax-weighted combination over scales
        (reference magno.py:291-304)."""
        if len(per_scale) == 1:
            return per_scale[0]
        stacked = jnp.stack(per_scale, axis=0)      # [S, ..., m, c]
        if self.config.use_scale_weights:
            w = nn.softmax(self.scale_weighting(weight_coords), axis=-1)  # [m, S]
            w = jnp.moveaxis(w, -1, 0)[..., None]   # [S, m, 1]
            while w.ndim < stacked.ndim:
                w = jnp.expand_dims(w, 1)
            return jnp.sum(stacked * w, axis=0)
        return jnp.mean(stacked, axis=0)


class MAGNOEncoder(_MAGNOBase):
    """Physical nodes → latent grid (reference MAGNOEncoder, magno.py:74-413)."""

    lifting_layers: int = 1

    def setup(self):
        super().setup()
        self.lifting = ChannelMLP(
            out_channels=self.out_channels,
            hidden_channels=self.config.hidden_size,
            n_layers=self.lifting_layers,
            dtype=self.dtype,
        )

    def __call__(self,
                 x_coord: jnp.ndarray,
                 pndata: jnp.ndarray,
                 latent_tokens_coord: jnp.ndarray,
                 graphs: Sequence[PaddedGraph],
                 training: bool = False,
                 tgraphs: Optional[Sequence[TransposeGraph]] = None) -> jnp.ndarray:
        """x_coord: [N, d] (fx) or [B, N, d] (vx); pndata: [B, N, Cin];
        latent_tokens_coord: [Q, d]; graphs: per-scale PaddedGraphs —
        [Q, K] (fx) or [B, Q, K] (vx); tgraphs: optional per-scale transpose
        graphs for the scatter-free backward. Returns [B, Q, Cout]."""
        cfg = self.config
        vx = x_coord.ndim == 3
        batch = pndata.shape[0]
        q = latent_tokens_coord.shape[0]
        tgraphs = tgraphs or [None] * len(graphs)

        lifted = self.lifting(pndata)                    # [B, N, C]

        if vx:
            n = x_coord.shape[1]
            src_coords = x_coord.reshape(batch * n, -1)
            dst_coords = jnp.tile(latent_tokens_coord, (batch, 1))
            f_src = lifted.reshape(batch * n, -1)        # 2D f_y → shared path
            per_scale = []
            for graph, tg in zip(graphs, tgraphs):
                if isinstance(graph, BatchedBucketedGraph):
                    flat = flatten_vx_bucketed(graph, n)
                    flat_t = None
                else:
                    flat = flatten_vx_graph(graph, n)
                    if isinstance(tg, GroupedTransposeGraph):
                        # Grouped tgraphs serve the linear K-major custom-VJP
                        # path only (the generic Q-major path needs the flat
                        # layout; nonlinear configs fall back to autodiff).
                        flat_t = tg if cfg.transform_type == "linear" else None
                    else:
                        flat_t = (flatten_vx_tgraph(tg, q, graph.k)
                                  if tg is not None else None)
                enc = self._agno_scale(src_coords, dst_coords, f_src, flat,
                                       training, num_samples=batch,
                                       tgraph=flat_t)
                per_scale.append(enc.reshape(batch, q, -1))
            return self._combine_scales(per_scale, latent_tokens_coord)

        per_scale = [
            self._agno_scale(x_coord, latent_tokens_coord, lifted, graph,
                             training, num_samples=1, tgraph=tg)
            for graph, tg in zip(graphs, tgraphs)
        ]
        return self._combine_scales(per_scale, latent_tokens_coord)


class MAGNODecoder(_MAGNOBase):
    """Latent grid → query nodes (reference MAGNODecoder, magno.py:418-751)."""

    projection_layers: int = 1

    def setup(self):
        super().setup()
        self.projection = ChannelMLP(
            out_channels=self.out_channels,
            hidden_channels=self.config.hidden_size,
            n_layers=self.projection_layers,
            dtype=self.dtype,
        )

    def __call__(self,
                 latent_tokens_coord: jnp.ndarray,
                 rndata: jnp.ndarray,
                 query_coord: jnp.ndarray,
                 graphs: Sequence[PaddedGraph],
                 training: bool = False,
                 tgraphs: Optional[Sequence[TransposeGraph]] = None) -> jnp.ndarray:
        """latent_tokens_coord: [Q, d]; rndata: [B, Q, C]; query_coord:
        [M, d] (fx) or [B, M, d] (vx); graphs: [M, K] (fx) or [B, M, K] (vx).
        Returns [B, M, Cout]."""
        vx = query_coord.ndim == 3
        batch = rndata.shape[0]
        q = latent_tokens_coord.shape[0]
        tgraphs = tgraphs or [None] * len(graphs)

        if vx:
            m = query_coord.shape[1]
            src_coords = jnp.tile(latent_tokens_coord, (batch, 1))
            dst_coords = query_coord.reshape(batch * m, -1)
            f_src = rndata.reshape(batch * q, -1)
            per_scale = []
            for graph, tg in zip(graphs, tgraphs):
                if isinstance(graph, BatchedBucketedGraph):
                    flat = flatten_vx_bucketed(graph, q)
                    flat_t = None
                else:
                    flat = flatten_vx_graph(graph, q)
                    if isinstance(tg, GroupedTransposeGraph):
                        flat_t = (tg if self.config.transform_type == "linear"
                                  else None)
                    else:
                        flat_t = (flatten_vx_tgraph(tg, m, graph.k)
                                  if tg is not None else None)
                dec = self._agno_scale(src_coords, dst_coords, f_src, flat,
                                       training, num_samples=batch,
                                       tgraph=flat_t)
                per_scale.append(dec.reshape(batch, m, -1))
            # Scale weights from each sample's own query coords (the reference
            # reuses the first sample's coords for the whole batch,
            # magno.py:607-613; per-sample weights are strictly more faithful
            # to the learned weighting).
            combined = self._combine_scales_vx(per_scale, query_coord)
        else:
            per_scale = [
                self._agno_scale(latent_tokens_coord, query_coord, rndata, graph,
                                 training, num_samples=1, tgraph=tg)
                for graph, tg in zip(graphs, tgraphs)
            ]
            combined = self._combine_scales(per_scale, query_coord)

        return self.projection(combined)

    def _combine_scales_vx(self, per_scale, query_coord):
        if len(per_scale) == 1:
            return per_scale[0]
        stacked = jnp.stack(per_scale, axis=0)           # [S, B, M, c]
        if self.config.use_scale_weights:
            w = nn.softmax(self.scale_weighting(query_coord), axis=-1)  # [B, M, S]
            w = jnp.moveaxis(w, -1, 0)[..., None]        # [S, B, M, 1]
            return jnp.sum(stacked * w, axis=0)
        return jnp.mean(stacked, axis=0)
