#!/usr/bin/env python
"""Noise-floor (chaos) study for the convergence-parity gaps.

The parity study (PARITY.md) trains both frameworks from IDENTICAL
transplanted init weights; the residual final-metric gaps on the
rollout-amplified cases are a few 1e-3. Two hypotheses: (a) a real
framework discrepancy, or (b) chaotic trajectory divergence — fp32
op-ordering differences (~1e-6 relative per step, the measured
forward-transplant agreement) amplified over thousands of optimizer
steps, i.e. the gap is below the study's noise floor.

This script measures that noise floor DIRECTLY on the reference's own
stack: perturb the transplanted init by eps ~ the framework numerical
difference (w += scale * std(w) * N(0,1) per tensor), rerun the
UNMODIFIED reference trainer (parity/run_reference.py), and record how
far the final metrics move. If |metric(ref, init) − metric(ref,
init+eps)| is comparable to |metric(ref) − metric(gaot)|, the remaining
parity gaps are within the study's intrinsic noise, not evidence of a
framework difference.

A `det` variant reruns the reference with the UNPERTURBED init as a
determinism check: it must reproduce the committed parity_results.json
numbers exactly (datasets and flax init are seeded, so regeneration is
bit-identical).

Usage:
    python parity/perturb_study.py --workdir /tmp/parity_perturb \
        --cases seq_time_der seq_output --scale 1e-6 --nseeds 2

Runs all reference trainings concurrently (each pins itself to one
torch thread); writes parity_perturb.json next to PARITY.md and prints
the comparison table.
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


def save_init(case: str, workdir: str) -> str:
    """Build the gaot_tpu trainer (seeded flax init, seed 42 via the shared
    config schema) and save the transplanted torch init — identical to what
    parity/run_gaot.py saved for the committed study."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gaot_jax_cache")

    data_dir = os.path.join(workdir, "data")
    meta_kwargs = cases.ensure_dataset(case, data_dir)

    from gaot_tpu.core.metadata import DATASET_METADATA, Metadata

    mk = dict(meta_kwargs)
    mk["domain_x"] = tuple(map(tuple, mk["domain_x"]))
    if mk.get("domain_t") is not None:
        mk["domain_t"] = tuple(mk["domain_t"])
    DATASET_METADATA[cases.metaname(case)] = Metadata(**mk)

    cfg = cases.build_config(case, data_dir, workdir, "gaot")
    for sub in cfg["path"].values():
        os.makedirs(os.path.dirname(sub), exist_ok=True)

    from gaot_tpu.train import SequentialTrainer, StaticTrainer

    trainer_cls = {"static": StaticTrainer,
                   "sequential": SequentialTrainer}[cfg["setup"]["trainer_name"]]
    trainer = trainer_cls(cfg)

    import torch

    from gaot_tpu.utils.torch_interop import flax_to_torch_state_dict

    init_path = os.path.join(workdir, f"init_{case}.pt")
    torch.save({k: torch.tensor(v) for k, v in
                flax_to_torch_state_dict(trainer.params).items()}, init_path)
    return init_path


def perturb_init(init_path: str, out_path: str, scale: float, seed: int):
    import torch

    sd = torch.load(init_path, weights_only=True)
    g = torch.Generator().manual_seed(seed)
    out = {}
    for k, w in sd.items():
        w = w.clone()
        if w.is_floating_point():
            # std==0 (incl. size-1 leaves) falls back to abs-max then 1.0 so
            # every float tensor is perturbed — same rule as run_gaot._nudge.
            std = float(w.std()) if w.numel() > 1 else 0.0
            if std == 0.0:
                std = float(w.abs().max()) or 1.0
            w = w + scale * std * torch.randn(w.shape, generator=g,
                                              dtype=w.dtype)
        out[k] = w
    torch.save(out, out_path)


def run_reference(case: str, variant_dir: str, init: str, log: str) -> int:
    cmd = [sys.executable, "parity/run_reference.py", "--case", case,
           "--workdir", variant_dir, "--init", init]
    print(f"[perturb] running: {' '.join(cmd)}", flush=True)
    t0 = time.perf_counter()
    with open(log, "w") as lf:
        rc = subprocess.call(cmd, stdout=lf, stderr=subprocess.STDOUT,
                             cwd=REPO)
    print(f"[perturb] rc={rc} in {time.perf_counter() - t0:.0f}s", flush=True)
    return rc


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/parity_perturb")
    p.add_argument("--cases", nargs="*",
                   default=["seq_time_der", "seq_output"])
    p.add_argument("--scale", type=float, default=1e-6)
    p.add_argument("--nseeds", type=int, default=5)
    p.add_argument("--timeout", type=int, default=86400)
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    # Sequential execution (this box has one CPU core): cases in the order
    # given — put the metrics that most need a noise floor first so partial
    # results are usable if the wall clock runs out. Variant dirs encode the
    # perturbation scale so a rerun with a different --scale cannot silently
    # reuse stale cached results.
    deadline = time.time() + args.timeout
    results = {}
    for case in args.cases:
        cdir = os.path.join(args.workdir, case)
        os.makedirs(cdir, exist_ok=True)
        init = save_init(case, cdir)
        variants = [("det", init)]
        for s in range(1, args.nseeds + 1):
            pert = os.path.join(cdir, f"init_{case}_p{s}_{args.scale:g}.pt")
            perturb_init(init, pert, args.scale, seed=s)
            variants.append((f"p{s}_{args.scale:g}", pert))
        for variant, vinit in variants:
            vdir = os.path.join(cdir, variant)
            out = os.path.join(vdir, f"ref_{case}.json")
            if not os.path.exists(out):
                if time.time() > deadline:
                    print(f"[perturb] deadline hit; skipping {case}/{variant}")
                    continue
                os.makedirs(vdir, exist_ok=True)
                # Share the generated dataset: run_reference regenerates it
                # per workdir deterministically; a symlink skips the work.
                data_link = os.path.join(vdir, "data")
                if not os.path.exists(data_link):
                    os.symlink(os.path.join(cdir, "data"), data_link)
                rc = run_reference(case, vdir, vinit,
                                   os.path.join(cdir, f"ref_{variant}.log"))
                if rc != 0 or not os.path.exists(out):
                    print(f"[perturb] {case}/{variant} FAILED rc={rc}")
                    continue
            with open(out) as f:
                results.setdefault(case, {})[variant] = json.load(f)
            # Incremental report: each finished variant lands in
            # parity_perturb.json immediately, so a wall-clock kill loses at
            # most the in-flight run (σ from a partial seed set is still a
            # valid RMS, just wider).
            write_report(dict(results), args)

    write_report(results, args)


def write_report(results, args):
    # Comparison vs the committed study.
    committed_path = os.path.join(REPO, "parity_results.json")
    committed = {}
    if os.path.exists(committed_path):
        with open(committed_path) as f:
            committed = json.load(f)

    # Merge over the committed report: running a subset of cases must not
    # clobber previously measured noise floors for the other cases.
    out_path = os.path.join(REPO, "parity_perturb.json")
    if os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
        if prior.get("scale") == args.scale:
            # Merge per VARIANT, not per case: re-running a subset of a
            # case's variants after a workdir wipe must not drop that case's
            # previously reported variants (det baseline / seed-sigma rows).
            merged = dict(prior.get("results", {}))
            for case, variants in results.items():
                merged[case] = {**merged.get(case, {}), **variants}
            results = merged

    report = {"scale": args.scale, "results": results, "table": []}
    for case, variants in results.items():
        base = variants.get("det", {}).get("metrics", {})
        ref0 = committed.get(case, {}).get("reference", {}).get("metrics", {})
        gaot = committed.get(case, {}).get("gaot_tpu", {}).get("metrics", {})
        for metric in sorted(base):
            row = {"case": case, "metric": metric,
                   "ref_det": base[metric],
                   "ref_committed": ref0.get(metric),
                   "gaot_committed": gaot.get(metric)}
            perts = [v["metrics"][metric] for k, v in variants.items()
                     if k.startswith("p") and metric in v.get("metrics", {})]
            if perts:
                row["noise_floor"] = max(abs(pv - base[metric])
                                         for pv in perts)
                devs = [pv - base[metric] for pv in perts]
                # RMS deviation from det — the σ_ref that enters the PARITY
                # pass criterion (gap ≤ max(1e-3, 2·sqrt(σ_ref²+σ_gaot²))).
                row["noise_rms"] = (sum(d * d for d in devs)
                                    / len(devs)) ** 0.5
                row["pert_values"] = perts
            if ref0.get(metric) is not None and gaot.get(metric) is not None:
                row["ref_vs_gaot_gap"] = abs(ref0[metric] - gaot[metric])
            report["table"].append(row)
            print(json.dumps(row))

    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
