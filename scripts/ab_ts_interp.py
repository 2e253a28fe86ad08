"""A/B: timestamp-interpolation mode vs frame-index mode on the demo scene
(VERDICT r4 item 9 — exercise Scene.interp_at + per-sensor ts deltas on the
flagship demo, reference scenes.py:53-83 use_ts_interp).

Trains the multi demo twice at reduced iters and reports eval PSNR for
both modes. Run on the TPU: python scripts/ab_ts_interp.py [iters]

``--assert-parity`` turns the A/B into a regression check (VERDICT r4 item
10): the demo scenario's timestamps ARE the frame grid, so interp_at at the
keyframe timestamps must match slice_at — the run fails if the two modes'
eval PSNR differ by more than 0.15 dB (scene-clock fallback regression,
scene/scene.py interp_at; the r4 bug this guards was a 10 dB gap).
"""
from __future__ import annotations

import json
import sys
import time

import yaml

sys.path.insert(0, "/root/repo")

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
ROOT = "/root/repo/logs/waymo_demo_r3_data"


def run(use_ts: bool) -> float:
    from neuralsim_tpu.tools.eval_multi import main_function as eval_main
    from neuralsim_tpu.tools.train_multi import main_function as train_main
    with open("/root/repo/configs/waymo_demo_multi.yaml") as f:
        cfg = yaml.safe_load(f)
    exp = f"/root/repo/logs/ab_tsinterp_{'ts' if use_ts else 'fidx'}"
    cfg.update(exp_dir=exp)
    cfg["dataset_cfg"]["params"]["root"] = ROOT
    cfg["training"].update({"num_iters": ITERS, "i_log": max(ITERS // 10, 1),
                            "i_val": 0, "use_ts_interp": use_ts})
    t0 = time.time()
    train_main(cfg)
    dt = time.time() - t0
    ecfg = dict(cfg, resume_dir=exp, eval={"frames": [0, 3, 6],
                                           "rayschunk": 8192})
    out = eval_main(ecfg)
    print(json.dumps({"mode": "ts_interp" if use_ts else "frame_index",
                      "iters": ITERS, "train_s": round(dt, 1),
                      "psnr": round(out["mean"]["psnr"], 3),
                      "psnr_fg": round(out["mean"].get("psnr_fg", 0), 3),
                      "street_vis": round(next(
                          (d["vis_mass"] for c, d in
                           out.get("per_class", {}).items()
                           if c == "street"), -1.0), 4)}), flush=True)
    return float(out["mean"]["psnr"])


def main():
    p_fidx = run(False)
    p_ts = run(True)
    gap = abs(p_ts - p_fidx)
    print(json.dumps({"psnr_fidx": round(p_fidx, 3), "psnr_ts": round(p_ts, 3),
                      "gap_db": round(gap, 3)}), flush=True)
    if "--assert-parity" in sys.argv:
        assert gap <= 0.15, \
            f"ts-interp parity broken: {p_ts:.3f} vs {p_fidx:.3f} dB"
        print("PARITY OK", flush=True)


if __name__ == "__main__":
    from neuralsim_tpu.utils.tpu_lock import tpu_chip_lock
    with tpu_chip_lock("scripts/ab_ts_interp.py"):
        main()
