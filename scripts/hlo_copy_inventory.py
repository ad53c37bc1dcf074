"""Rank the physical data-movement ops (copy / transpose / convert /
bitcast-convert) in an optimized HLO dump by bytes moved.

The vx profile attributes ~24% of the step to "data formatting" — layout
conversions XLA inserts around custom calls and dots. This tool turns an
HLO text dump (e.g. scripts/dump_vx_hlo.py → /tmp/vx_step_hlo.txt) into a
ranked inventory of those copies so the top sources can be attacked (and
re-checked after each change) instead of guessed at.

Counts, per instruction whose ROOT op is a copy/transpose/convert (or a
fusion whose body is dominated by them): output bytes + input bytes (a
physical copy reads and writes every element). Groups by the producing
computation and prints a ranked table + JSON.

Usage: python scripts/hlo_copy_inventory.py [/tmp/vx_step_hlo.txt] [--json OUT]
"""
import json
import re
import sys
from collections import defaultdict

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

SHAPE_RE = re.compile(r"\b([a-z]+\d*)\[([\d,]*)\]((?:\{[\d,]*(?::[^}]*)?\})?)")
# one HLO instruction line: "  %name = <shape-or-tuple> opcode(...)"
INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*?)\s+"
                      r"([a-z][\w\-]*)\((.*)$")


def shape_bytes(text):
    """Total bytes of every array shape mentioned in `text` (first shape
    only — pass just the output-shape slice of an instruction line)."""
    total = 0
    for m in SHAPE_RE.finditer(text):
        dt, dims, _ = m.groups()
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def first_shape_bytes(text):
    m = SHAPE_RE.search(text)
    if not m:
        return 0
    dt, dims, _ = m.groups()
    if dt not in DTYPE_BYTES:
        return 0
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES[dt]


MOVE_OPS = {"copy", "transpose", "convert", "bitcast-convert"}


def parse(path):
    """Parse instructions grouped into computations."""
    comps = {}  # name -> list of (name, outshape_text, opcode, operands_text)
    cur = None
    with open(path) as f:
        for line in f:
            if line.startswith(("ENTRY ", "%")) and "{" in line and " = " not in line.split("{")[0]:
                # computation header: "%fused_computation.1 (param...) -> shape {"
                hdr = line.split("(")[0].strip().lstrip("%")
                cur = hdr
                comps[cur] = []
                continue
            if line.startswith("ENTRY"):
                cur = "ENTRY"
                comps[cur] = []
                continue
            m = INSTR_RE.match(line)
            if m and cur is not None:
                comps[cur].append(m.groups())
            if line.rstrip() == "}":
                cur = None
    return comps


def analyze(path, top=30):
    comps = parse(path)
    rows = []
    fusion_defs = {}  # computation name -> instrs
    for cname, instrs in comps.items():
        fusion_defs[cname] = instrs

    # Pass 1: standalone move ops in every computation (incl. inside fusions:
    # a copy inside a fusion body is usually free IF fused with real work,
    # so only count fusion bodies whose move-bytes dominate — see pass 2).
    # Standalone (entry/while-body-level) copies always cost full bandwidth.
    entry_like = [c for c in comps
                  if not c.startswith("fused_") and "fused" not in c]
    for cname in entry_like:
        for name, outshape, opcode, operands in comps[cname]:
            if opcode in MOVE_OPS:
                b_out = first_shape_bytes(outshape)
                b_in = shape_bytes(operands)
                rows.append({"comp": cname, "instr": name, "op": opcode,
                             "bytes": b_out + b_in, "out_shape": outshape.strip(),
                             "where": "standalone"})
            elif opcode == "fusion":
                cm = re.search(r"calls=%?([\w.\-]+)", operands)
                body = fusion_defs.get(cm.group(1), []) if cm else []
                if not body:
                    continue
                n_move = sum(1 for _, _, oc, _ in body if oc in MOVE_OPS)
                n_real = sum(1 for _, _, oc, _ in body
                             if oc not in MOVE_OPS | {"parameter", "tuple",
                                                      "get-tuple-element",
                                                      "constant", "bitcast"})
                if n_move and n_real <= 1:
                    # copy-only (kCopy/kTranspose) fusion: pure data movement
                    b_out = first_shape_bytes(outshape)
                    b_in = shape_bytes(operands)
                    rows.append({"comp": cname, "instr": name, "op": "fusion:" + ",".join(
                        sorted({oc for _, _, oc, _ in body if oc in MOVE_OPS})),
                        "bytes": b_out + b_in, "out_shape": outshape.strip(),
                        "where": f"copy-fusion({cm.group(1) if cm else '?'})"})
    rows.sort(key=lambda r: -r["bytes"])
    total = sum(r["bytes"] for r in rows)
    return rows[:top], total, len(rows)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vx_step_hlo.txt"
    rows, total, n = analyze(path)
    print(f"# move-op inventory for {path}")
    print(f"# {n} standalone/copy-only move ops, {total / 1e9:.2f} GB total traffic (read+write)")
    for r in rows:
        print(f"{r['bytes'] / 1e6:10.1f} MB  {r['op']:<28} {r['instr']:<24} "
              f"{r['out_shape'][:80]}  [{r['where']}]")
    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
        with open(out, "w") as f:
            json.dump({"path": path, "total_bytes": total, "count": n,
                       "top": rows}, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
