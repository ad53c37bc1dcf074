"""Systematic-vs-noise classification for the sign-consistent parity rows.

PARITY.md flags 3 seq_time_der rows (direct/auto2/auto4) where the
reference-vs-gaot gap has the same sign on both test sets (gaot lower).
The committed perturbation studies (parity_perturb{,_gaot}.json) hold 6
quasi-independent runs per side per case — the det run plus 5 runs whose
initial parameters were perturbed by 1e-6, i.e. independent draws from
each side's seed-noise distribution around its own training dynamics.

For every (case, metric) this script computes the two-sample mean gap
ref − gaot with a Welch t-test across those 6-vs-6 samples and classifies:

  |t| >= 2   → "systematic" (the mean gap excludes 0 at ~2σ)
  |t| <  2   → "consistent with noise at n=6"

Prints a markdown table (pasted into PARITY.md) and the JSON rows.
"""
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def side_samples(path, case):
    with open(os.path.join(REPO, path)) as f:
        d = json.load(f)
    out = {}
    for variant, vv in d["results"].get(case, {}).items():
        for metric, val in vv.get("metrics", {}).items():
            out.setdefault(metric, []).append(float(val))
    return out


def welch(a, b):
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    se = math.sqrt(va / na + vb / nb)
    t = (ma - mb) / se if se else float("inf")
    return ma - mb, se, t


def main(cases=("seq_time_der", "seq_output", "seq_residual")):
    rows = []
    print("| case | metric | mean gap (ref − gaot) | SE | Welch t | verdict |")
    print("|---|---|---|---|---|---|")
    for case in cases:
        ref = side_samples("parity_perturb.json", case)
        gaot = side_samples("parity_perturb_gaot.json", case)
        for metric in sorted(set(ref) & set(gaot)):
            gap, se, t = welch(ref[metric], gaot[metric])
            verdict = ("systematic" if abs(t) >= 2
                       else "consistent with noise at n=6")
            rows.append({"case": case, "metric": metric, "gap": gap,
                         "se": se, "t": t, "n": len(ref[metric]),
                         "verdict": verdict})
            print(f"| {case} | {metric} | {gap:+.3e} | {se:.2e} "
                  f"| {t:+.2f} | {verdict} |")
    out = os.path.join(REPO, "artifacts", "parity_sign_test.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"\nwrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
