"""Merge the round-5 decision-wave cells with the round-4 ablation and
apply the pre-registered shipping rule (BENCHMARKS.md round-4 section).

Inputs (all produced by scripts/exp_bg_boundary_ablation_r4.py):
  docs/bg_boundary_ablation_r4.json        — round-4 wave: 5 cells x 3
                                             scenes x seeds 0-2
  <wave_dir>/wave_bg4bd6_s34.json          — bg4bd6 clean seeds 3,4
  <wave_dir>/wave_bg8_refbg.json           — bg8bd6 + refbg_bd6 clean 0-2

Pre-registered rule (clean scene is the gate scene): ship the fastest
cell whose clean draws are ALL >= 0.95 F@0.1, preferring
bg4bd6 (n=5) > bg8bd6 (n=3, + bg4bd6 draws as BD6 support)
> refbg_bd6 (n=3) > reference budget.

Writes docs/bg_boundary_ablation_r5.json with the merged runs, the
per-cell clean-gate table, and the verdict.

    python scripts/exp_r5_decision_merge.py --wave_dir /root/ablation_r4b
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE_F10 = 0.95
# pre-registered preference order (fastest first, by the round-3
# step-time decomposition estimates)
PREFERENCE = ["bg4bd6", "bg8bd6", "refbg_bd6"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wave_dir", default="/root/ablation_r4b")
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "bg_boundary_ablation_r5.json"))
    args = ap.parse_args()

    r4 = json.load(open(os.path.join(REPO, "docs",
                                     "bg_boundary_ablation_r4.json")))
    runs = list(r4["runs"])
    for name in ("wave_bg4bd6_s34.json", "wave_bg8_refbg.json"):
        path = os.path.join(args.wave_dir, name)
        wave = json.load(open(path))
        runs.extend(wave["runs"])

    # clean-scene gate per cell, all seeds pooled across waves
    cells = sorted({r["cell"] for r in runs})
    gate = {}
    for cell in cells:
        draws = sorted(
            (r["seed"], r["f10"]) for r in runs
            if r["cell"] == cell and r["scene"] == "clean")
        if not draws:
            continue
        gate[cell] = {
            "n": len(draws),
            "f10_by_seed": {str(s): f for s, f in draws},
            "min_f10": min(f for _, f in draws),
            "passes": all(f >= GATE_F10 for _, f in draws),
        }

    verdict = None
    for cell in PREFERENCE:
        if gate.get(cell, {}).get("passes"):
            verdict = cell
            break
    if verdict is None:
        verdict = "reference_budget"

    out = {
        "protocol": dict(
            r4["protocol"],
            note_r5=("round-5 decision wave merged: bg4bd6 clean seeds "
                     "3,4 (n=5), bg8bd6 + refbg_bd6 clean seeds 0-2; "
                     f"rule = ship fastest cell with ALL clean draws "
                     f">= {GATE_F10} F@0.1, preference "
                     + " > ".join(PREFERENCE) + " > reference budget"),
        ),
        "runs": runs,
        "clean_gate": gate,
        "gate_f10": GATE_F10,
        "verdict": verdict,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    json.dump(out, open(args.out, "w"), indent=1)
    print(json.dumps({"clean_gate": gate, "verdict": verdict}, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
