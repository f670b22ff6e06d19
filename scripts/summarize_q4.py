"""Collate the round-4 quality sweep (scripts/quality_sweep.sh) into the
per-category preset tables for EVIDENCE.md / README.

Reads runs/q4_<coord_tag>/SWEEP_<name>.log (eval_checkpoint_track --sweep
output: one `[spec] full-scan {...}` dict line per tracking stack, plus a
`frozen-init {...}` floor row) and each training's EVIDENCE.json (delta-mode
12k-step tracked metrics), prints one markdown table per category and a
preset-choice summary: for every category, the stack the
`--quality_profile best` preset resolves to must be >= the delta baseline.

  python scripts/summarize_q4.py [--runs runs] [--metric rdiff]
"""
from __future__ import annotations

import argparse
import ast
import glob
import json
import os
import re

ROW = re.compile(r"^(?:\[([^\]]+)\] )?(frame-1|full-scan|frozen-init)\s*(\{.*\})\s*$")


def parse_sweep(path: str) -> dict:
    """{spec: {"frame1": {...}, "full": {...}}} plus {"frozen-init": {...}}."""
    out: dict = {}
    with open(path) as f:
        for line in f:
            m = ROW.match(line.strip())
            if not m:
                continue
            spec, kind, payload = m.group(1), m.group(2), m.group(3)
            vals = ast.literal_eval(payload)
            if kind == "frozen-init":
                out["frozen-init"] = vals
            else:
                key = "frame1" if kind == "frame-1" else "full"
                out.setdefault(spec or "default", {})[key] = vals
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", default="runs")
    ap.add_argument("--metrics", default="rdiff,5deg5cm,10deg10cm")
    args = ap.parse_args()
    metrics = args.metrics.split(",")

    logs = sorted(glob.glob(os.path.join(args.runs, "q4_*", "SWEEP_*.log")))
    if not logs:
        print("(no SWEEP logs yet)")
    for path in logs:
        name = os.path.basename(path)[6:-4]
        coord_tag = os.path.basename(os.path.dirname(path))
        data = parse_sweep(path)
        specs = [k for k in data if k != "frozen-init"]
        if not specs:
            print(f"### {name} — EMPTY/FAILED ({path})")
            continue
        print(f"### {name}  (coord ckpt {coord_tag})")
        print("| stack | " + " | ".join(f"full {m}" for m in metrics)
              + " | frame-1 rdiff |")
        print("|---|" + "---|" * (len(metrics) + 1))
        for spec in specs:
            full, f1 = data[spec].get("full", {}), data[spec].get("frame1", {})
            cells = [f"{full.get(m, float('nan')):.4g}" for m in metrics]
            print(f"| {spec} | " + " | ".join(cells)
                  + f" | {f1.get('rdiff', float('nan')):.4g} |")
        fr = data.get("frozen-init")
        if fr:
            print("| (frozen-init floor) | "
                  + " | ".join(f"{fr.get(m, float('nan')):.4g}"
                               for m in metrics) + " | — |")
        print()

    # training-side delta reference from each run's EVIDENCE.json
    print("### 12k-step delta-mode training records (EVIDENCE.json)")
    print("| run | tracked rdiff | tracked 5deg5cm | frame-1 rdiff | fps/chip |")
    print("|---|---|---|---|---|")
    for ev in sorted(glob.glob(os.path.join(args.runs, "q4_*",
                                            "EVIDENCE.json"))):
        with open(ev) as f:
            d = json.load(f)
        tr = d.get("tracking", {}).get("tracked", {})
        f1 = d.get("tracking_frame1", {})
        print(f"| {os.path.basename(os.path.dirname(ev))} "
              f"| {tr.get('rdiff', float('nan')):.4g} "
              f"| {tr.get('5deg5cm', float('nan')):.3g} "
              f"| {f1.get('rdiff', float('nan')):.4g} "
              f"| {d.get('tracking', {}).get('fps_per_chip', float('nan')):.4g} |")


if __name__ == "__main__":
    main()
