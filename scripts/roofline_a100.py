#!/usr/bin/env python
"""Roofline lower bound for the PyTorch reference's fx training step on A100.

Replaces BASELINE.md's assumed-utilization tiers with a first-principles
byte-count model: enumerate every tensor the reference's EAGER op sequence
materializes in HBM per training step at the flagship scale (Poisson-Gauss:
8192 nodes, 64x64 latent, batch 64, fp32 — config/examples/time_indep/
poisson_gauss.json), charge each op max(bytes / 2.0 TB/s, flops / 312 TF/s)
(A100-80GB published specs: 2.0 TB/s HBM2e, 312 TF/s dense bf16 — the
reference runs fp32, for which tensor-core peak is 19.5 TF/s TF32 off /
156 TF/s TF32 on; we charge the FAVORABLE 312 to keep this a hard bound),
and sum. Eager PyTorch executes ops serially, reads every input from HBM and
writes every output back, so the sum of per-op roofline times is a LOWER
bound on the reference's step time — i.e. an UPPER bound on its throughput.

Every op group cites the reference source lines it models. Deliberately
conservative (favoring the reference):
  - ops that would be pruned by autograd (cosine-attention branch: coords
    are leaves without requires_grad, src/model/layers/agno.py:211-224) are
    charged ZERO backward cost;
  - small per-edge scalar chains (segment softmax, edge drop) are charged
    only their unavoidable E-sized passes;
  - no kernel-launch overhead is charged (a real eager step at this scale
    issues ~300 kernels; 3-10 us each would add 1-3 ms);
  - fused-by-cuDNN possibilities (bias+GELU) are assumed fused.

Usage: python scripts/roofline_a100.py [--json]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BW = 2.0e12         # A100-80GB HBM2e bytes/s (published spec)
PEAK = 312e12       # A100 dense bf16 FLOP/s (favorable; fp32 peak is lower)
F4 = 4              # fp32 bytes (reference trains fp32, setup.dtype)

# Flagship shapes (bench.py:build_workload == reference poisson_gauss.json).
B, N, C, D = 64, 8192, 64, 2
LAT = (64, 64)
Q = LAT[0] * LAT[1]
PATCH = 2
S = (LAT[0] // PATCH) * (LAT[1] // PATCH)        # 1024 tokens
H, HEADS, FFN = 256, 8, 1024                     # attn.py:21-37
PC = PATCH * PATCH * C                            # patch channels = 256
LAYERS = 3                                        # 1 enc + 1 mid + 1 dec (UViT)
RADIUS = 0.033


def edge_counts():
    """Exact edge counts of the flagship radius graphs (bench.py seed 0)."""
    from gaot_tpu.data.graph_builder import GraphBuilder

    rng = np.random.default_rng(0)
    coords = rng.uniform(-1, 1, (N, 2)).astype(np.float32)
    axes = [np.linspace(-1, 1, LAT[0]), np.linspace(-1, 1, LAT[1])]
    lat = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 2)
    enc, dec = GraphBuilder().build_fx_graphs(coords, lat, RADIUS, [1.0])
    return int(enc[0].mask.sum()), int(dec[0].mask.sum())


class Model:
    def __init__(self):
        self.rows = []

    def op(self, group, name, reads, writes, flops=0.0):
        """One eager kernel: charge max(bytes/BW, flops/PEAK)."""
        by = (reads + writes) * F4
        self.rows.append({"group": group, "name": name, "bytes": by,
                          "flops": flops,
                          "time_s": max(by / BW, flops / PEAK)})

    def agno(self, tag, E, nq, nsrc, fy_ch, grad_fy):
        """One batched fx AGNO call (linear transform, cosine attention,
        kernel MLP [2D, 64, 64, C]): src/model/layers/agno.py:148-273.
        grad_fy: whether f_y requires grad (encoder: lifted features — yes)."""
        g = f"agno/{tag}"
        # forward
        self.op(g, "gather rep_coords y[idx] (:188)", nsrc * D + 2 * E, E * D)
        self.op(g, "gather in_features f_y[:,idx,:] (:198)",
                B * nsrc * fy_ch + 2 * E, B * E * fy_ch)
        self.op(g, "repeat_interleave self coords (:207)", nq * D, E * D)
        self.op(g, "cosine scores: 2 normalize + mul-sum (:218-222)",
                4 * E * D, 2 * E * D + E)
        self.op(g, "segment_softmax: max/sub/exp/sum/div (:112-146)",
                5 * E, 3 * E)
        self.op(g, "concat [rep, self] (:229)", 2 * E * D, E * 2 * D)
        self.op(g, "kernel MLP L1 4->64 + GELU (:242; mlp.py:330-336)",
                E * 2 * D, E * C, 2 * E * 2 * D * C)
        self.op(g, "kernel MLP L2 64->64 + GELU", E * C, E * C, 2 * E * C * C)
        self.op(g, "kernel MLP L3 64->64", E * C, E * C, 2 * E * C * C)
        self.op(g, "k * in_features (:250)", E * C + B * E * fy_ch,
                B * E * fy_ch, B * E * fy_ch)
        self.op(g, "* attention_weights (:255)", B * E * fy_ch + E,
                B * E * fy_ch, B * E * fy_ch)
        self.op(g, "segment_csr sum (:271; segment_csr.py:48-55)",
                B * E * fy_ch + nq, B * nq * fy_ch, B * E * fy_ch)
        # backward (reverse order; cosine-attention branch pruned: coords are
        # leaves, so scores receive no grad — charged zero, favoring the ref)
        self.op(g, "bwd segment_csr: gather-expand grad", B * nq * fy_ch,
                B * E * fy_ch)
        self.op(g, "bwd attn mul: grad_in = g*w", B * E * fy_ch + E,
                B * E * fy_ch, B * E * fy_ch)
        self.op(g, "bwd k*f mul: grad_in = g*k", B * E * fy_ch + E * C,
                B * E * fy_ch, B * E * fy_ch)
        self.op(g, "bwd k*f mul: grad_k = sum_B g*f (batch-reduce)",
                2 * B * E * fy_ch, E * C, B * E * fy_ch)
        self.op(g, "bwd kernel MLP (dgrad+wgrad, 3 layers, GELU bwd)",
                6 * E * C, 4 * E * C,
                2 * (2 * E * 2 * D * C + 4 * E * C * C))
        if grad_fy:
            self.op(g, "bwd gather f_y: zeros + index_add (:198)",
                    B * E * fy_ch, B * nsrc * fy_ch + B * E * fy_ch)

    def geoembed(self, tag, E, nq):
        """GeometricEmbedding 'statistical' (src/model/layers/gemb.py:83-171):
        per-edge coord diffs + 5 scatter stats + covariance eigvals + MLP.
        Coords-only (no grad flows back through the stats)."""
        g = f"geoembed/{tag}"
        self.op(g, "gather + diffs + norms (~3 E-passes)",
                3 * E * D, 2 * E * D + E)
        self.op(g, "scatter mean/var/centroid/cov (~5 passes)",
                5 * E * D, 5 * nq * D)
        self.op(g, "eigvals + feature assembly + MLP [nq,7]->[nq,C]",
                nq * 8, nq * C, 2 * nq * 8 * C)

    def channel_mlp(self, tag, rows, cin, cout, hidden=None, grad_in=True):
        """ChannelMLP (Conv1d 1x1) fwd+bwd over [B, rows, cin]->[.., cout]
        (mlp.py:227-305). hidden=None -> single layer."""
        g = f"mlp/{tag}"
        dims = [cin, cout] if hidden is None else [cin, hidden, cout]
        for i in range(len(dims) - 1):
            a, b = dims[i], dims[i + 1]
            self.op(g, f"fwd L{i} {a}->{b}", B * rows * a, B * rows * b,
                    2 * B * rows * a * b)
            flops = 2 * 2 * B * rows * a * b if grad_in else 2 * B * rows * a * b
            self.op(g, f"bwd L{i} (dgrad+wgrad)", 2 * B * rows * b + B * rows * a,
                    B * rows * a, flops)

    def transformer_layer(self, skip):
        """One TransformerBlock fwd+bwd (attn.py:177-233): RMSNorm x2, QKV,
        RoPE, SDPA (flash: no S^2 HBM), O, SwiGLU FFN, residuals."""
        g = "transformer/layer"
        t = B * S * H
        f = B * S * FFN
        if skip:  # UViT decoder skip: concat + proj 2H->H (attn.py:225-227)
            self.op(g, "skip concat+proj", 2 * 2 * t, 2 * t + t,
                    2 * B * S * 2 * H * H)
        for name, reads, writes, flops in [
            ("rmsnorm x2", 2 * t, 2 * t, 0),
            ("qkv proj", 3 * t, 3 * t, 3 * 2 * B * S * H * H),
            ("rope q,k", 2 * t, 2 * t, 0),
            ("sdpa flash", 3 * t, t, 4 * B * S * S * H),
            ("o proj", t, t, 2 * B * S * H * H),
            ("residual x2", 4 * t, 2 * t, 0),
            ("ffn w1,w3", 2 * t, 2 * f, 2 * 2 * B * S * H * FFN),
            ("ffn silu*mul", 2 * f, f, 0),
            ("ffn w2", f, t, 2 * B * S * FFN * H),
        ]:
            self.op(g, f"fwd {name}", reads, writes, flops)
            # bwd: ~2x activation traffic and 2x matmul flops (dgrad+wgrad);
            # flash SDPA bwd recomputes (~2.5x fwd flops, no S^2 HBM).
            self.op(g, f"bwd {name}", 2 * reads, 2 * writes,
                    2.5 * flops if name == "sdpa flash" else 2 * flops)

    def total(self):
        return (sum(r["bytes"] for r in self.rows),
                sum(r["flops"] for r in self.rows),
                sum(r["time_s"] for r in self.rows))


def build(E1, E2):
    m = Model()
    # Lifting ChannelMLP 1->64 (magno.py:272-274) + permutes (eager copies)
    m.op("lifting", "permute copies x2", 2 * B * N * 1, 2 * B * N * 1)
    m.channel_mlp("lifting 1->64", N, 1, C, hidden=C, grad_in=False)
    # Encoder AGNO + geoembed + recovery (magno.py:307-355)
    m.agno("encoder", E1, Q, N, C, grad_fy=True)
    m.geoembed("encoder", E1, Q)
    m.op("encoder", "geoembed expand+concat (magno.py:344-347)",
         B * Q * C + Q * C, B * Q * 2 * C)
    m.channel_mlp("encoder recovery 128->64", Q, 2 * C, C, hidden=C)
    # Patchify: permute+reshape+linear+posemb (gaot.py:177-216)
    m.op("patchify", "reshape/permute copies x2", 2 * B * Q * C, 2 * B * Q * C)
    m.op("patchify", "patch linear 256->256", B * S * PC, B * S * H,
         2 * B * S * PC * H)
    m.op("patchify", "bwd patch linear", 2 * B * S * H + B * S * PC,
         B * S * PC, 4 * B * S * PC * H)
    m.op("patchify", "abs pos-emb add (+bwd)", 2 * B * S * H + S * H,
         2 * B * S * H)
    for i in range(LAYERS):
        m.transformer_layer(skip=(i == LAYERS - 1))
    m.op("unpatchify", "reshape/permute copies x2 (+bwd)",
         4 * B * Q * C, 4 * B * Q * C)
    # Decoder AGNO: latent (Q) -> physical nodes (N) (magno.py:552-643);
    # f_y = latent features (requires grad), geoembed on query graph
    m.agno("decoder", E2, N, Q, C, grad_fy=True)
    m.geoembed("decoder", E2, N)
    m.op("decoder", "geoembed expand+concat", B * N * C + N * C, B * N * 2 * C)
    m.channel_mlp("decoder recovery 128->64", N, 2 * C, C, hidden=C)
    m.channel_mlp("projection 64->1", N, C, 1, hidden=C)
    # Loss MSE + AdamW update (~3.6M params x (read p,g,m,v; write p,m,v))
    P = 3.6e6
    m.op("optimizer", "mse + adamw", 4 * P + 2 * B * N, 3 * P + B * N)
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    E1, E2 = edge_counts()
    m = build(E1, E2)
    by, fl, t = m.total()
    groups = {}
    for r in m.rows:
        g = r["group"].split("/")[0]
        acc = groups.setdefault(g, [0.0, 0.0])
        acc[0] += r["bytes"]
        acc[1] += r["time_s"]
    max_throughput = B / t
    out = {
        "E_encoder": E1, "E_decoder": E2,
        "bytes_per_step_GB": by / 1e9,
        "flops_per_step_GF": fl / 1e9,
        "min_step_time_ms": t * 1e3,
        "max_samples_per_sec_A100": max_throughput,
        "groups": {g: {"GB": v[0] / 1e9, "ms": v[1] * 1e3}
                   for g, v in sorted(groups.items())},
    }
    if args.json:
        print(json.dumps(out, indent=1))
        return
    print(f"flagship radius graphs: E_enc={E1} E_dec={E2}")
    print(f"HBM bytes/step (fp32, eager): {by / 1e9:.2f} GB")
    print(f"FLOPs/step:                   {fl / 1e9:.1f} GF")
    print(f"min step time @2TB/s,312TF/s: {t * 1e3:.2f} ms")
    print(f"max A100 throughput:          {max_throughput:.0f} samples/s")
    print("\nper-group (GB / ms):")
    for gname, v in sorted(groups.items(), key=lambda kv: -kv[1][1]):
        print(f"  {gname:14s} {v[0] / 1e9:7.2f} GB  {v[1] * 1e3:6.2f} ms")


if __name__ == "__main__":
    main()
