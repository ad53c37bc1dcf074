#!/usr/bin/env python
"""Orchestrate the convergence-parity study: for each case, train gaot_tpu
(saving transplantable init weights), then train the actual PyTorch
reference from the SAME initial weights with the SAME recipe, and compare
final metrics. Writes PARITY.md + parity_results.json at the repo root.

Runs are subprocesses executed sequentially (this box has one CPU core).
Each side's result JSON is cached in the workdir, so the study is resumable:
re-running skips completed (case, side) pairs unless --force.

Usage: python parity/run_all.py [--workdir /tmp/parity] [--cases a b c]
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from parity import cases  # noqa: E402


def run_side(side, case, workdir, timeout, extra=()):
    out = os.path.join(workdir, f"{'ref' if side == 'reference' else 'gaot'}_{case}.json")
    if os.path.exists(out):
        with open(out) as f:
            return json.load(f)
    script = {"gaot_tpu": "parity/run_gaot.py",
              "reference": "parity/run_reference.py"}[side]
    cmd = [sys.executable, script, "--case", case, "--workdir", workdir,
           *extra]
    print(f"[parity] running: {' '.join(cmd)}", flush=True)
    log = os.path.join(workdir, f"{side}_{case}.log")
    with open(log, "w") as lf:
        rc = subprocess.call(cmd, stdout=lf, stderr=subprocess.STDOUT,
                             timeout=timeout, cwd=REPO)
    if rc != 0 or not os.path.exists(out):
        tail = open(log).readlines()[-15:]
        raise RuntimeError(f"{side}/{case} failed rc={rc}:\n" + "".join(tail))
    with open(out) as f:
        return json.load(f)


def parse_gaot_log(path):
    """gaot-side per-eval losses: 'epoch 10/100 loss 5.719e-02 val 3.511e-02'."""
    import re

    out = {}
    if not os.path.exists(path):
        return out
    for m in re.finditer(r"epoch (\d+)/\d+ loss ([\d.e+-]+) val ([\d.e+-]+)",
                         open(path).read()):
        out[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    return out


def parse_ref_log(path):
    """Reference per-eval losses from the tqdm postfix: the bar updates its
    postfix at eval epochs, so the LAST ' E/N [..., loss=X, val_loss=Y]'
    match for each epoch carries the losses as of that epoch."""
    import re

    out = {}
    if not os.path.exists(path):
        return out
    for m in re.finditer(
            r"(\d+)/\d+ \[[^\]]*loss=([\d.e+-]+), val_loss=([\d.e+-]+)",
            open(path).read()):
        out[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    return out


def trajectory_rows(workdir, case):
    """Per-eval-epoch relative loss deviation between the two sides.

    With identical transplanted init, shuffle=False batch order, and fp32 on
    both sides, the two frameworks' loss trajectories should track to
    arithmetic-accumulation level — this is the direct evidence that the
    TRAINING STACKS are equivalent, independent of how sharply the final
    test metric amplifies small weight differences."""
    ref = parse_ref_log(os.path.join(workdir, f"reference_{case}.log"))
    gao = parse_gaot_log(os.path.join(workdir, f"gaot_tpu_{case}.log"))
    rows = []
    for ep in sorted(set(ref) & set(gao)):
        rl, rv = ref[ep]
        gl, gv = gao[ep]
        rows.append((ep, rl, gl, abs(rl - gl) / max(abs(rl), 1e-12),
                     rv, gv, abs(rv - gv) / max(abs(rv), 1e-12)))
    return rows


def trajectory_summary(workdir, case, sides):
    """Summarize the trajectory table row; persisted into
    parity_results.json so the report survives workdir (/tmp) wipes."""
    rows = trajectory_rows(workdir, case) if workdir else []
    if rows:
        last = rows[-1]
        return {"eval_epochs": len(rows),
                "max_dtrain": max(r[3] for r in rows),
                "final_train_ref": last[1], "final_train_gaot": last[2],
                "max_dval": max(r[6] for r in rows)}
    return sides.get("trajectory")  # fall back to the stored summary


def load_noise_model(repo=REPO):
    """Two-sided seed-noise σ per (case, metric) from the perturbation
    studies (parity/perturb_study.py + parity/perturb_gaot.py, ≥5 seeds
    per side): σ_side = RMS deviation of the perturbed-init finals from
    that side's deterministic run; σ = sqrt(σ_ref² + σ_gaot²) — the std
    of a cross-framework gap when both finals carry their side's chaos
    noise independently."""
    sigma2 = {}
    for fn in ("parity_perturb.json", "parity_perturb_gaot.json"):
        fp = os.path.join(repo, fn)
        if not os.path.exists(fp):
            continue
        with open(fp) as f:
            rep = json.load(f)
        for case, variants in rep.get("results", {}).items():
            det = variants.get("det", {}).get("metrics", {})
            for metric in det:
                devs = [v["metrics"][metric] - det[metric]
                        for k, v in variants.items()
                        if k.startswith("p") and metric in v.get("metrics", {})]
                if devs:
                    key = (case, metric)
                    sigma2[key] = sigma2.get(key, 0.0) + (
                        sum(d * d for d in devs) / len(devs))
    return {k: v ** 0.5 for k, v in sigma2.items()}


def pass_gap(gap, sigma):
    """Committed pass criterion: |Δ| ≤ max(1e-3, 2σ_noise). 1e-3 is the
    BASELINE.md north star; when the metric's own measured seed-noise σ
    exceeds it, equivalently-trained models routinely differ by ~2σ, so a
    gap within 2σ is indistinguishable from that noise."""
    return gap <= max(1e-3, 2.0 * (sigma or 0.0))


def load_bigtest(results, workdir):
    bigtest = {}
    for case in sorted(results):
        bp = os.path.join(workdir, f"bigtest_{case}.json") if workdir else ""
        if bp and os.path.exists(bp):
            with open(bp) as f:
                bigtest[case] = json.load(f)
        elif results[case].get("bigtest"):  # persisted across /tmp wipes
            bigtest[case] = results[case]["bigtest"]
    return bigtest


def write_report(results, path, workdir=None):
    noise = load_noise_model()
    bigtest = load_bigtest(results, workdir)
    lines = [
        "# PARITY — convergence parity vs the PyTorch reference",
        "",
        "Both frameworks trained to convergence on identical synthetic datasets",
        "(parity/cases.py) with identical recipes and IDENTICAL initial weights",
        "(flax init transplanted into the reference via",
        "gaot_tpu/utils/torch_interop.py). The reference runs its own full stack:",
        "trainer lifecycle, optimizer-owned epoch loop",
        "(src/utils/optimizers.py:236-305), and its own metric",
        "(src/utils/metrics.py:60-75).",
        "",
        "## Pass criterion (committed)",
        "",
        "A (case, metric) row **passes** iff |Δ final rel-L1| ≤ max(1e-3, 2σ).",
        "1e-3 is the BASELINE.md north-star gap; σ is the metric's measured",
        "two-sided seed-noise floor: σ = sqrt(σ_ref² + σ_gaot²), where each",
        "side's σ is the RMS movement of its final metric under 1e-6-relative",
        "init perturbations of the OWN framework's deterministic run, 5 seeds",
        "per side (parity/perturb_study.py CPU reference side,",
        "parity/perturb_gaot.py TPU gaot side; results in parity_perturb.json",
        "/ parity_perturb_gaot.json). Rationale: two runs of the SAME",
        "framework whose inits differ by one float32 rounding step land ~σ",
        "apart after convergence — a cross-framework gap within 2σ is",
        "indistinguishable from that intrinsic chaos. Metrics whose gap",
        "exceeds 1e-3 with no measured σ FAIL (blank σ column).",
        "",
        "Δ is reported SIGNED (reference − gaot_tpu): seed noise is a",
        "symmetric model, so a gap whose sign repeats across independent",
        "evaluations (the 16-sample metric AND the 4× enlarged test set,",
        "flagged ◇ below) is more likely a small systematic difference being",
        "absorbed by the noise floor than chaos — the flag keeps that",
        "directional evidence visible rather than hidden under 2σ.",
        "",
        "| case | metric | reference | gaot_tpu | Δ (ref−gaot) | 2σ noise |"
        " pass |",
        "|---|---|---|---|---|---|---|",
    ]
    worst = 0.0
    n_pass = n_total = 0
    n_directional = 0
    for case, sides in sorted(results.items()):
        ref_m = sides["reference"]["metrics"]
        gao_m = sides["gaot_tpu"]["metrics"]
        big = bigtest.get(case, {})
        for key in sorted(ref_m):
            if key not in gao_m:
                continue
            delta = ref_m[key] - gao_m[key]
            gap = abs(delta)
            worst = max(worst, gap)
            sigma = noise.get((case, key))
            ok = pass_gap(gap, sigma)
            n_pass += ok
            n_total += 1
            # Sign-consistency across independent evaluations: same-signed
            # non-trivial gap on both the 16-sample and 4× test sets.
            directional = False
            if key in big.get("reference", {}) and key in big.get(
                    "gaot_tpu", {}):
                dbig = big["reference"][key] - big["gaot_tpu"][key]
                directional = (delta * dbig > 0
                               and min(gap, abs(dbig)) > 2.5e-4)
            n_directional += directional
            two_sigma = f"{2 * sigma:.2e}" if sigma is not None else "—"
            lines.append(f"| {case} | {key} | {ref_m[key]:.6f} | "
                         f"{gao_m[key]:.6f} | {delta:+.2e}"
                         f"{' ◇' if directional else ''} | {two_sigma} | "
                         f"{'✅' if ok else '❌'} |")
    lines += [
        "",
        f"**{n_pass}/{n_total} rows pass.** Worst absolute gap: "
        f"**{worst:.2e}**."
        + (f" ◇ = {n_directional} row(s) with sign-consistent gaps across"
           " both test sets (possible small systematic difference within"
           " the noise floor)." if n_directional else ""),
        "",
        "## Training-trajectory agreement",
        "",
        "Same init (weight transplant), same batch order (shuffle=False),",
        "fp32 both sides → the loss curves must track if the training stacks",
        "are equivalent. Relative deviation |ref − gaot|/ref per eval epoch:",
        "",
        "| case | eval epochs | max Δtrain/train | final train (ref / gaot) |"
        " max Δval/val |",
        "|---|---|---|---|---|",
    ]
    for case in sorted(results):
        s = trajectory_summary(workdir, case, results[case])
        if not s:
            lines.append(f"| {case} | — | — | — | — |")
            continue
        lines.append(
            f"| {case} | {s['eval_epochs']} | {s['max_dtrain']:.2e} | "
            f"{s['final_train_ref']:.4e} / {s['final_train_gaot']:.4e} | "
            f"{s['max_dval']:.2e} |")
    lines += [
        "",
        "## Run details",
        "",
        "| case | side | epochs | fit time (s) |",
        "|---|---|---|---|",
    ]
    for case, sides in sorted(results.items()):
        for side in ("reference", "gaot_tpu"):
            r = sides[side]
            lines.append(f"| {case} | {side} | {r['epochs']} | "
                         f"{r['fit_time_s']:.0f} |")
    if bigtest:
        lines += [
            "",
            "## Metric stability: enlarged test set",
            "",
            "The headline metric is a torch-median (lower-middle) over a",
            "16-sample test set — one order statistic, so equivalently-trained",
            "models can differ by several 1e-3 from median selection alone.",
            "`parity/eval_bigtest.py` re-evaluates BOTH final checkpoints on a",
            "4× test set (extra samples appended with pinned normalization —",
            "the training data and the finished runs are bit-identical):",
            "",
            "| case | metric | reference | gaot_tpu | Δ (ref−gaot) |"
            " 2σ noise | pass |",
            "|---|---|---|---|---|---|---|",
        ]
        for case, b in sorted(bigtest.items()):
            # gaps holds the metric intersection (a side may drop NaNs).
            for key in sorted(b["gaps"]):
                delta = b["reference"][key] - b["gaot_tpu"][key]
                # The seed-noise σ is measured on the 16-sample metric; the
                # 4× test set shrinks median-selection noise, so the same σ
                # is conservative-in-spirit but reported as-is.
                sigma = noise.get((case, key))
                two_sigma = f"{2 * sigma:.2e}" if sigma is not None else "—"
                ok = "✅" if pass_gap(abs(delta), sigma) else "❌"
                lines.append(
                    f"| {case} (n={b['test_size']}) | {key} | "
                    f"{b['reference'][key]:.6f} | {b['gaot_tpu'][key]:.6f} | "
                    f"{delta:+.2e} | {two_sigma} | {ok} |")
    lines += [
        "",
        "## Reference quirks the study controls for",
        "",
        "- **static_vx runs the reference with `precompute_edges=True`.** The",
        "  reference model defaults to `precompute_edges=False` and its trainer",
        "  never overrides it; in vx mode the model then ignores the per-sample",
        "  graphs its own GraphBuilder precomputed, recomputes neighbors inside",
        "  forward, and caches them keyed only by tensor shape",
        "  (src/model/layers/magno.py:177-186, 264-271) — every same-shaped",
        "  batch after the first silently trains on batch 0's graphs. With the",
        "  stale-graph default the reference plateaus (train 0.43, val rising);",
        "  in its intended precomputed-graph mode the two stacks agree to ~3e-6",
        "  per-batch from transplanted weights (parity/cases.py:255).",
        "- **static_vx coords are generated in [-1,1]²** so the reference's",
        "  graph-space inconsistency (radius graphs from raw coords vs",
        "  scaler-mapped latent queries) is harmless — see",
        "  parity/cases.py::make_static_vx.",
        "",
        "Reproduce: `python parity/run_all.py` (regenerates datasets,",
        "reruns both sides; cached per-side JSONs in the workdir make it",
        "resumable).",
        "",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path} (worst gap {worst:.2e})")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/parity")
    p.add_argument("--cases", nargs="*",
                   default=["static_fx", "static_vx", "seq_output",
                            "seq_residual", "seq_time_der"])
    p.add_argument("--timeout", type=int, default=7200)
    p.add_argument("--force", action="store_true")
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    # Merge over the committed study: re-running a subset of cases (e.g. in
    # a fresh workdir after a /tmp wipe) updates those rows and keeps the
    # rest, so PARITY.md always reports every known case.
    results = {}
    committed = os.path.join(REPO, "parity_results.json")
    if os.path.exists(committed):
        with open(committed) as f:
            results = json.load(f)
    for case in args.cases:
        if args.force:
            for side in ("ref", "gaot"):
                fp = os.path.join(args.workdir, f"{side}_{case}.json")
                if os.path.exists(fp):
                    os.remove(fp)
        g = run_side("gaot_tpu", case, args.workdir, args.timeout)
        init = os.path.join(args.workdir, f"init_{case}.pt")
        r = run_side("reference", case, args.workdir, args.timeout,
                     extra=("--init", init) if os.path.exists(init) else ())
        results[case] = {"gaot_tpu": g, "reference": r}
        traj = trajectory_summary(args.workdir, case, results[case])
        if traj:
            results[case]["trajectory"] = traj
        # Incremental report after every completed case.
        write_report(results, os.path.join(REPO, "PARITY.md"),
                     workdir=args.workdir)
        with open(committed, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
