"""Finish a flagship demo run whose training completed but whose eval tail
was cut (e.g. by a conservative ``timeout``): resume the exp dir's final
checkpoint and run eval_multi + eval_lidar (+ optional renders), compute
the acceptance gates, and write the durable ``results/`` evidence exactly
as scripts/run_waymo_demo.py would have.

Usage: python scripts/finish_waymo_demo.py <exp_dir> [--skip-render]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import yaml

sys.path.insert(0, "/root/repo")

RESULTS = "/root/repo/results/waymo_demo"


def main(args):
    from neuralsim_tpu.tools.eval_lidar import main_function as eval_lidar_main
    from neuralsim_tpu.tools.eval_multi import main_function as eval_main
    from neuralsim_tpu.tools.render import main_function as render_main

    exp = os.path.abspath(args.exp_dir)
    run_name = os.path.basename(exp.rstrip("/"))
    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(exp, "config.yaml")) as f:
        cfg = yaml.safe_load(f)
    iters = int(cfg["training"]["num_iters"])
    summary = {"run": run_name, "exp_dir": exp, "iters": iters,
               "seed": cfg.get("seed"), "finished_by": "finish_waymo_demo"}
    # training completed (tools/train_multi printed "skips_total=N" before
    # the eval tail was cut) — the caller passes that count through
    summary["skips_total"] = int(args.skips_total or 0)

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

    pc = summary["eval_multi"].get("per_class", {})
    street_road = pc.get("street", {}).get("road_vis_mass")
    distant_road = pc.get("distant", {}).get("road_vis_mass")
    gates = {
        "skips_ok": summary["skips_total"] < iters * 0.01,
        "road_ownership_ok": (street_road is not None
                              and distant_road is not None
                              and street_road > 2 * distant_road
                              and street_road > 0.5),
        "lidar_recall_ok": summary["eval_lidar"].get(
            "miss_in_cuboid_frac", 1.0) < 0.25,
    }
    summary["gates"] = gates
    summary["gates_all_ok"] = all(gates.values())

    with open(os.path.join(RESULTS, f"{run_name}.json"), "w") as f:
        json.dump(summary, f, indent=1)
    for rel in ("eval_multi/metrics.json", "eval/lidar_metrics.json"):
        src = os.path.join(exp, rel)
        if os.path.isfile(src):
            shutil.copy(src, os.path.join(
                RESULTS, f"{run_name}_{os.path.basename(rel)}"))
    print("WAYMO DEMO FINISH DONE ->", exp, flush=True)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_dir")
    ap.add_argument("--skip-render", action="store_true")
    ap.add_argument("--skips-total", type=int, default=None,
                    help="skips_total printed by the cut run's training log")
    args = ap.parse_args()
    from neuralsim_tpu.utils.tpu_lock import tpu_chip_lock
    with tpu_chip_lock("scripts/finish_waymo_demo.py"):
        main(args)
