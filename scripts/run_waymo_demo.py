"""Train/eval/render the Waymo-format multi-object demo sequence on the TPU
(BASELINE target #5): the full code_multi toolchain at real scale —
WaymoDataset reader -> train_multi (pixel + lidar) -> eval_multi (full/fg/bg
+ per-object/per-class decomposition) -> eval_lidar (chamfer + depth RMSE
against the analytic beams, the geometry guardrail) -> render replay +
orthographic top-down map.

Evidence protocol (VERDICT r4 items 2 & 8):
  * every run writes to a FRESH timestamped exp dir — nothing can clobber a
    previous run's artifacts (the reference snapshots config per run,
    code_single/tools/train.py:1228-1237; round 4 lost its flagship evidence
    to a hardcoded exp_dir);
  * headline metrics are copied into the committed ``results/`` directory;
  * ``--deadline-min M`` refuses to LAUNCH when the expected runtime does
    not fit before the deadline (round 4's artifacts were overwritten by a
    job launched 32 minutes before the snapshot).

Usage: python scripts/run_waymo_demo.py [iters] [--seed N] [--deadline-min M]
       [--nan-debug]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import yaml

sys.path.insert(0, "/root/repo")

ROOT = "/root/repo/logs/waymo_demo_r3_data"
RESULTS = "/root/repo/results/waymo_demo"


def expected_runtime_min(iters: int) -> float:
    # measured round 4/5: ~8 it/s training + ~15 min eval/render tail
    return iters / (8 * 60) + 15.0


def main(args):
    from neuralsim_tpu.dataio.waymo_demo import build_demo_sequence
    from neuralsim_tpu.tools.eval_lidar import main_function as eval_lidar_main
    from neuralsim_tpu.tools.eval_multi import main_function as eval_main
    from neuralsim_tpu.tools.render import main_function as render_main
    from neuralsim_tpu.tools.train_multi import main_function as train_main

    run_name = time.strftime(f"r5_s{args.seed}_%Y%m%d_%H%M%S")
    exp = os.path.join("/root/repo/logs/waymo_demo", run_name)
    os.makedirs(exp, exist_ok=False)
    os.makedirs(RESULTS, exist_ok=True)

    if not os.path.isdir(os.path.join(ROOT, "demo_drive")):
        build_demo_sequence(ROOT, n_frames=8, H=80, W=120, n_vehicles=3)

    with open("/root/repo/configs/waymo_demo_multi.yaml") as f:
        cfg = yaml.safe_load(f)
    cfg.update(exp_dir=exp, seed=args.seed)
    cfg["dataset_cfg"]["params"]["root"] = ROOT
    cfg["training"].update({"num_iters": args.iters,
                            "i_log": max(args.iters // 20, 1),
                            "i_val": max(args.iters // 4, 1),
                            "nan_debug": bool(args.nan_debug)})

    summary = {"run": run_name, "exp_dir": exp, "iters": args.iters,
               "seed": args.seed}
    t0 = time.time()
    out_train = train_main(cfg)
    summary["train_s"] = round(time.time() - t0, 1)
    summary["skips_total"] = int(out_train.get("skips_total", 0)) \
        if isinstance(out_train, dict) else 0

    ecfg = dict(cfg, resume_dir=exp,
                eval={"frames": [0, 3, 6], "rayschunk": 8192})
    out = eval_main(ecfg)
    summary["eval_multi"] = {
        "mean": {k: round(v, 4) for k, v in out["mean"].items()
                 if isinstance(v, (int, float)) and v == v},
        "per_class": {c: {k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in d.items()}
                      for c, d in out.get("per_class", {}).items()},
    }
    print(json.dumps({"eval_multi": summary["eval_multi"]}), flush=True)

    # LiDAR geometry guardrail (VERDICT r4: this would have caught the r3
    # street collapse immediately — road depth along the analytic GT beams)
    lcfg = dict(cfg, resume_dir=exp,
                renderer={**cfg["renderer"], "type": "multi"},
                eval={"frames": [0, 3, 6]})
    lout = eval_lidar_main(lcfg)
    summary["eval_lidar"] = {k: (round(v, 4) if isinstance(v, float) else v)
                             for k, v in lout["mean"].items()}
    print(json.dumps({"eval_lidar_mean": summary["eval_lidar"]}), flush=True)

    if not args.skip_render:
        rcfg = dict(cfg, resume_dir=exp,
                    renderer={**cfg["renderer"], "type": "multi"},
                    render={"mode": "replay", "frames": [0, 4],
                            "video": False, "per_obj": True})
        render_main(rcfg)
        tcfg = dict(cfg, resume_dir=exp,
                    renderer={**cfg["renderer"], "type": "multi"},
                    render={"mode": "topdown", "topdown_w": 256,
                            "video": True, "fps": 6})
        render_main(tcfg)

    # acceptance gates (VERDICT r4/r5): the evidence is self-checking.
    pc = summary["eval_multi"].get("per_class", {})
    street_road = pc.get("street", {}).get("road_vis_mass")
    distant_road = pc.get("distant", {}).get("road_vis_mass")
    gates = {
        # training must not be NaN-crippled: <1% of steps skipped
        "skips_ok": summary["skips_total"] < args.iters * 0.01,
        # the street model must own the road pixels (item 4): its
        # visibility mass on ground pixels dominates the distant model's
        "road_ownership_ok": (street_road is not None
                              and distant_road is not None
                              and street_road > 2 * distant_road
                              and street_road > 0.5),
        # geometry guardrail (item 3): hit_recall + miss_in_cuboid +
        # miss_out_cuboid = 1 over valid beams; beams whose GT return lies
        # INSIDE the close-range cuboid are the street's to own, so few of
        # them may miss
        "lidar_recall_ok": summary["eval_lidar"].get(
            "miss_in_cuboid_frac", 1.0) < 0.25,
    }
    summary["gates"] = gates
    summary["gates_all_ok"] = all(gates.values())

    # durable evidence: summary + raw metrics JSONs into committed results/
    with open(os.path.join(RESULTS, f"{run_name}.json"), "w") as f:
        json.dump(summary, f, indent=1)
    for rel in ("eval_multi/metrics.json", "eval/lidar_metrics.json"):
        src = os.path.join(exp, rel)
        if os.path.isfile(src):
            shutil.copy(src, os.path.join(
                RESULTS, f"{run_name}_{os.path.basename(rel)}"))
    print("WAYMO DEMO RUN DONE ->", exp, flush=True)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("iters", nargs="?", type=int, default=6000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--deadline-min", type=float, default=None,
                    help="refuse to launch unless the expected runtime fits "
                         "within this many minutes from now")
    ap.add_argument("--skip-render", action="store_true",
                    help="metrics-only replicate: skip the replay/topdown "
                         "renders (the gates need only eval_multi + "
                         "eval_lidar) so a second seed fits a tight "
                         "chip window")
    ap.add_argument("--nan-debug", action="store_true",
                    help="sync on the per-step finite-guard flag and capture "
                         "the first poisoned batch + state to disk")
    args = ap.parse_args()
    need = expected_runtime_min(args.iters)
    if args.deadline_min is not None and need > args.deadline_min:
        print(f"REFUSING LAUNCH: expected ~{need:.0f} min > deadline "
              f"{args.deadline_min:.0f} min (VERDICT r4 item 8)", flush=True)
        sys.exit(3)
    from neuralsim_tpu.utils.tpu_lock import tpu_chip_lock
    with tpu_chip_lock("scripts/run_waymo_demo.py"):
        main(args)
