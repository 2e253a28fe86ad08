"""March/sample-budget autotune sweep (PERF.md lever: march-budget autotuning).

Sweeps the proposal/budget knobs of the flagship bench model on the real
TPU — march_steps x num_coarse x num_fine — measuring full-pipeline train
rays/s (bench methodology) AND a short-train PSNR guardrail for the top
throughput candidates. Writes one JSON line per cell and a summary to
results/autotune_march.json.

Usage: python scripts/autotune_march.py [--iters 400] [--cells spec,...]
  cell spec: "march:coarse:fine" e.g. "48:16:8,8" (fine comma-joined with +)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

DEFAULT_CELLS = [
    # march : coarse : fine  — current flagship is 48:16:8+8
    "48:16:8+8",
    "32:16:8+8",
    "64:16:8+8",
    "48:12:8+8",
    "48:16:8",
    "48:24:8+8",
    "32:12:6+6",
]


def run_cell(cell: str, iters: int):
    march, coarse, fine = cell.split(":")
    env = dict(os.environ,
               BENCH_MARCH=march, BENCH_COARSE=coarse,
               BENCH_FINE=fine.replace("+", ","),
               AB_ITERS=str(iters))
    out = subprocess.run(
        [sys.executable, "scripts/quality_ab_r2.py"],
        env=env, capture_output=True, text=True, timeout=3600)
    rows = [l for l in out.stdout.splitlines() if l.startswith("{")]
    rec = json.loads(rows[-1]) if rows else {"error": out.stderr[-500:]}
    rec["cell"] = cell
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--cells", default=",".join(DEFAULT_CELLS))
    args = ap.parse_args()
    results = [run_cell(c, args.iters) for c in args.cells.split(",")]
    os.makedirs("results", exist_ok=True)
    with open("results/autotune_march.json", "w") as f:
        json.dump({"iters": args.iters, "cells": results}, f, indent=1)
    good = [r for r in results if "psnr" in r]
    if good:
        best = max(good, key=lambda r: r.get("rays_per_s", 0))
        print(json.dumps({"best_cell": best["cell"],
                          "rays_per_s": best.get("rays_per_s"),
                          "psnr": best.get("psnr")}), flush=True)


if __name__ == "__main__":
    from neuralsim_tpu.utils.tpu_lock import tpu_chip_lock
    with tpu_chip_lock("scripts/autotune_march.py"):
        main()
