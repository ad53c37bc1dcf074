"""Descriptor-rate roofline for the vx train step.

The vx workload is not FLOP-bound (compute floor ~2 ms against an ~86 ms
measured step at 16k) and not bytes-bound (the big tensors are narrow
C=64 rows); its binding resource is GATHER DESCRIPTOR RATE: every AGNO
forward/backward and every geoembed coordinate lookup is a row gather,
and TPU row gathers issue ~1 row per cycle regardless of row width
(measured on v5e: a [K=8, 131072] gather of 128 B rows runs ~1.9 ms
≈ 1.8 ns/row — scripts/bench_agno.py class of microbenches).

This script tallies the gather rows one train step issues (fwd + bwd,
encoder + decoder + geoembed + unpermutes) from the actual built graph
structures, and prints the implied step-time bound at the measured
per-row rate next to the measured step time — the honest "roofline" for
a graph workload whose cost is descriptors, not FLOPs or bytes.

Usage: python scripts/vx_descriptor_bound.py [batch] [nodes]
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MEASURED_NS_PER_ROW = 1.8        # v5e, 128 B bf16 rows, measured round 5
PEAK_ROWS_PER_SEC = 0.94e9       # 1 row/cycle at the v5e core clock


def main(batch_size=16, num_nodes=16384, latent=(64, 64)):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gaot_tpu.core.config import ModelConfig, merge_config
    from gaot_tpu.data.graph_builder import (GraphBuilder,
                                             attach_transpose_graphs,
                                             bucketize_vx_splits)
    from gaot_tpu.ops.padding import BatchedBucketedGraph, GroupedTransposeGraph

    rng = np.random.default_rng(0)
    coords = rng.uniform(-1, 1, (batch_size, num_nodes, 2)).astype(np.float32)
    axes = [np.linspace(-1, 1, latent[0]), np.linspace(-1, 1, latent[1])]
    lat = np.stack(np.meshgrid(*axes, indexing="ij"),
                   -1).reshape(-1, 2).astype(np.float32)
    cfg = merge_config(ModelConfig, {
        "latent_tokens_size": list(latent),
        "args": {"magno": {"coord_dim": 2, "radius": 0.033, "hidden_size": 64,
                           "mlp_layers": 3, "lifting_channels": 64},
                 "transformer": {"patch_size": 2, "hidden_size": 256,
                                 "num_layers": 3}},
    })
    builder = GraphBuilder.from_magno_config(cfg.args.magno)
    split = builder.build_vx_split(coords, lat, 0.033, [1.0])
    bucketize_vx_splits([split], lat.shape[0], 1, True)
    attach_transpose_graphs([split], lat.shape[0], 1)

    b = batch_size
    rows = {}

    def tg_rows(tg):
        if isinstance(tg, GroupedTransposeGraph):
            return sum(g.mask.shape[1] * g.mask.shape[2] for g in tg.groups)
        return tg.mask.shape[-2] * tg.mask.shape[-1]

    # Encoder (bucketed): fwd f gather + kernel coords gather + geoembed
    # re-gather (bucketed path shares no rows), per bucket.
    enc = split.encoder[0]
    if isinstance(enc, BatchedBucketedGraph):
        e_rows = sum(g.indices.shape[1] * g.indices.shape[2]
                     for g in enc.buckets)
        rows["enc fwd f gather (aug: coords ride along)"] = b * e_rows
        # bwd: single cotangent gather over the (grouped) tgraph (aug
        # route); + unpermute rows
        t_rows = tg_rows(enc.tgraph)
        rows["enc bwd d_f gather (single, aug route)"] = b * t_rows
        rows["enc bwd unpermute"] = b * enc.tgraph.inv_perm.shape[-1] \
            if isinstance(enc.tgraph, GroupedTransposeGraph) else 0
        rows["enc unpermute (fwd out)"] = b * enc.inv_perm.shape[-1]
    dec = split.decoder[0]
    if isinstance(dec, BatchedBucketedGraph):
        d_rows = sum(g.indices.shape[1] * g.indices.shape[2]
                     for g in dec.buckets)
        t = dec.tgraph
    else:
        d_rows = dec.indices.shape[1] * dec.indices.shape[2]
        t = split.decoder_t[0]
    rows["dec fwd f gather (aug: coords ride along)"] = b * d_rows
    rows["dec bwd d_f gather (single, aug route)"] = b * tg_rows(t)
    rows["dec bwd unpermute"] = b * t.inv_perm.shape[-1] \
        if isinstance(t, GroupedTransposeGraph) else 0
    # batch assembly: one row gather of every per-sample buffer (~the f/x
    # node rows dominate)
    rows["batch assembly (x, u, node buffers)"] = 3 * b * num_nodes

    total = sum(rows.values())
    print(f"# vx descriptor tally — batch {b} × {num_nodes} nodes")
    for k, v in sorted(rows.items(), key=lambda kv: -kv[1]):
        print(f"  {v / 1e6:8.2f} M rows  {k}")
    print(f"  {total / 1e6:8.2f} M rows  TOTAL per step")
    print(f"bound at measured {MEASURED_NS_PER_ROW} ns/row: "
          f"{total * MEASURED_NS_PER_ROW / 1e6:.1f} ms/step "
          f"→ ≤ {1e3 * b / (total * MEASURED_NS_PER_ROW / 1e6):.0f} samples/s")
    print(f"bound at 1 row/cycle ({PEAK_ROWS_PER_SEC / 1e9:.2f} GHz): "
          f"{total / PEAK_ROWS_PER_SEC * 1e3:.1f} ms/step "
          f"→ ≤ {1e3 * b / (total / PEAK_ROWS_PER_SEC * 1e3):.0f} samples/s")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
