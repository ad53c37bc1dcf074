#!/usr/bin/env python
"""gaot_tpu-side noise-floor (chaos) study — the TPU counterpart of
parity/perturb_study.py.

Same question, measured on this framework's own stack: perturb the seeded
flax init by eps ~ the measured cross-framework forward difference
(w += scale*std(w)*N(0,1) per tensor), rerun the UNMODIFIED gaot_tpu
trainer, and record how far the final metrics move. If the movement is
comparable to the committed reference-vs-gaot gaps (parity_results.json),
those gaps are within the study's intrinsic chaos noise, not evidence of a
framework difference.

Runs variants SEQUENTIALLY (the real TPU chip is single-tenant); a 'det'
variant (scale=0) establishes the same-platform baseline the perturbed
runs are compared against — final metrics differ slightly between the
committed CPU study and TPU execution (op-ordering), which is itself the
phenomenon under study, so the comparison is strictly within-platform.

Usage:
    python parity/perturb_gaot.py --workdir /tmp/parity_perturb_gaot \
        --cases seq_time_der seq_output --scale 1e-6 --nseeds 2
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from parity import cases  # noqa: E402


def run_variant(case, vdir, scale, seed, platform, log):
    cmd = [sys.executable, "parity/run_gaot.py", "--case", case,
           "--workdir", vdir, "--platform", platform]
    if scale:
        cmd += ["--perturb-scale", str(scale), "--perturb-seed", str(seed)]
    print(f"[perturb-gaot] {' '.join(cmd)}", flush=True)
    t0 = time.perf_counter()
    with open(log, "w") as lf:
        rc = subprocess.call(cmd, stdout=lf, stderr=subprocess.STDOUT,
                             cwd=REPO)
    print(f"[perturb-gaot] rc={rc} in {time.perf_counter() - t0:.0f}s",
          flush=True)
    return rc


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/parity_perturb_gaot")
    p.add_argument("--cases", nargs="*",
                   default=["seq_time_der", "seq_output"])
    p.add_argument("--scale", type=float, default=1e-6)
    p.add_argument("--nseeds", type=int, default=5)
    p.add_argument("--platform", default="auto",
                   help="'auto' lets the container's sitecustomize pick the "
                        "tunneled axon TPU; 'tpu' only matches local chips")
    p.add_argument("--out", default=os.path.join(REPO,
                                                 "parity_perturb_gaot.json"))
    args = p.parse_args()

    results = {}
    for case in args.cases:
        cdir = os.path.join(args.workdir, case)
        variants = [("det", 0.0, 0)]
        # Scale-suffixed variant names: a rerun with a different --scale gets
        # fresh dirs instead of silently reusing stale cached results.
        variants += [(f"p{s}_{args.scale:g}", args.scale, s)
                     for s in range(1, args.nseeds + 1)]
        for name, scale, seed in variants:
            vdir = os.path.join(cdir, name)
            out = os.path.join(vdir, f"gaot_{case}.json")
            if not os.path.exists(out):
                os.makedirs(vdir, exist_ok=True)
                rc = run_variant(case, vdir, scale, seed, args.platform,
                                 os.path.join(cdir, f"log_{name}.log"))
                if rc != 0 or not os.path.exists(out):
                    print(f"[perturb-gaot] {case}/{name} FAILED rc={rc}")
                    continue
            with open(out) as f:
                r = json.load(f)
            if r.get("perturb_scale", 0.0) != scale:
                print(f"[perturb-gaot] {case}/{name}: cached perturb_scale "
                      f"{r.get('perturb_scale')} != requested {scale}; "
                      f"delete {out} and re-run")
                continue
            results.setdefault(case, {})[name] = r
            # Incremental report: each finished variant lands in the output
            # JSON immediately, so a wall-clock kill loses at most the
            # in-flight run.
            write_report(dict(results), args)

    write_report(results, args)


def write_report(results, args):
    committed_path = os.path.join(REPO, "parity_results.json")
    committed = {}
    if os.path.exists(committed_path):
        with open(committed_path) as f:
            committed = json.load(f)

    # Merge over the committed report: running a subset of cases must not
    # clobber previously measured noise floors for the other cases.
    if os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f)
        if prior.get("scale") == args.scale:
            # Merge per VARIANT, not per case (see perturb_study.write_report).
            merged = dict(prior.get("results", {}))
            for case, variants in results.items():
                merged[case] = {**merged.get(case, {}), **variants}
            results = merged

    report = {"side": "gaot_tpu", "platform": args.platform,
              "scale": args.scale, "results": results, "table": []}
    for case, variants in results.items():
        base = variants.get("det", {}).get("metrics", {})
        ref0 = committed.get(case, {}).get("reference", {}).get("metrics", {})
        gaot = committed.get(case, {}).get("gaot_tpu", {}).get("metrics", {})
        for metric in sorted(base):
            row = {"case": case, "metric": metric, "gaot_det": base[metric],
                   "ref_committed": ref0.get(metric),
                   "gaot_committed": gaot.get(metric)}
            perts = [v["metrics"][metric] for k, v in variants.items()
                     if k.startswith("p") and metric in v.get("metrics", {})]
            if perts:
                row["noise_floor"] = max(abs(pv - base[metric])
                                         for pv in perts)
                devs = [pv - base[metric] for pv in perts]
                # RMS deviation from det — the σ_gaot of the PARITY criterion.
                row["noise_rms"] = (sum(d * d for d in devs)
                                    / len(devs)) ** 0.5
                row["pert_values"] = perts
            if ref0.get(metric) is not None and gaot.get(metric) is not None:
                row["ref_vs_gaot_gap"] = abs(ref0[metric] - gaot[metric])
            report["table"].append(row)
            print(json.dumps(row))

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
