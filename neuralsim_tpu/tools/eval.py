"""Appearance evaluation: PSNR / SSIM (/ LPIPS) over validation frames.

TPU-native re-design of ``code_single/tools/eval.py`` (reference, 637 LoC:
full + foreground + background metrics :265-316, json/csv output —
SURVEY.md §2.6, §3.5). Usage::

    python -m neuralsim_tpu.tools.eval --config <exp>/config.yaml \
        --resume_dir <exp> [--eval.frames=0,4,8] [--platform=cpu]
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List

import numpy as np


def evaluate(scene, renderer, params, loader, *, cam_id: str,
             frames: List[int], downscale: int = 1, rayschunk: int = 4096,
             lpips_weights: str = None, occ=None) -> Dict[str, Any]:
    import jax.numpy as jnp
    from ..dataio.dataloader import ImageSampler
    from ..maths.metrics import lpips_np, psnr_np, ssim_np
    from ..scene.observers import camera_get_selected_rays

    sampler = ImageSampler(loader, downscale)
    rows = []
    for fi in frames:
        frame = sampler.get(cam_id, fi)
        fr = scene.slice_at(fi)
        ro, rd = camera_get_selected_rays(fr, cam_id, jnp.asarray(frame["rays_xy"]))
        rendered = renderer.render_chunked(params, ro, rd, rayschunk=rayschunk,
                                           occ_states=occ,
                                           query_overrides={"perturb": False})
        H, W = frame["hw"]
        pred = np.asarray(rendered["rgb_volume"]).reshape(H, W, 3)
        gt = np.asarray(frame["image_rgb"]).reshape(H, W, 3)
        row = {"frame": fi,
               "psnr": psnr_np(pred, gt),
               "ssim": ssim_np(pred, gt),
               "lpips": lpips_np(pred, gt, lpips_weights)}
        # fg/bg split via GT occupancy mask (reference eval.py:265-316)
        if "image_occupancy_mask" in frame:
            m = np.asarray(frame["image_occupancy_mask"]).reshape(H, W) > 0.5
            if m.any():
                row["psnr_fg"] = psnr_np(pred[m], gt[m])
            if (~m).any():
                row["psnr_bg"] = psnr_np(pred[~m], gt[~m])
            pred_mask = np.asarray(rendered["mask_volume"]).reshape(H, W)
            row["mask_acc"] = float(((pred_mask > 0.5) == m).mean())
        rows.append(row)

    agg = {}
    for k in rows[0]:
        if k == "frame":
            continue
        vals = [r[k] for r in rows if r.get(k) is not None]
        agg[k] = float(np.mean(vals)) if vals else None
    return {"per_frame": rows, "mean": agg}


def main_function(cfg) -> Dict[str, Any]:
    import jax
    if cfg.get("platform"):
        jax.config.update("jax_platforms", cfg["platform"])
    from .train import build_everything
    from ..utils.checkpoint import CheckpointIO

    _, scene, bank, renderer, trainer, loader = build_everything(cfg)
    key = jax.random.PRNGKey(cfg.get("seed", 42))
    params = bank.init_params(key)
    exp_dir = cfg.get("resume_dir") or cfg.get("exp_dir", ".")
    ckpt = CheckpointIO(os.path.join(exp_dir, "ckpts"))
    state = trainer.init_state(key, params=params)
    restored = ckpt.load(state, cfg.get("ckpt"))
    occ = None
    if restored is not None:
        params = restored[0] if isinstance(restored, (tuple, list)) else restored.params
        occ = getattr(restored, "occ", None)
        from ..utils.misc import set_eval_iteration
        it_ck = getattr(restored, "it", None)
        if it_ck is not None:
            if hasattr(trainer, "_fields_by_model"):
                flds = list(trainer._fields_by_model().values())
            else:
                flds = list(getattr(renderer, "models", {}).values())
            set_eval_iteration(flds, np.asarray(it_ck))

    ecfg = cfg.get("eval", {})
    frames = ecfg.get("frames")
    if isinstance(frames, str):
        frames = [int(x) for x in frames.split(",")]
    elif isinstance(frames, int):
        frames = [frames]   # "--eval.frames=0" parses as a bare int
    if frames is None:
        frames = list(range(0, scene.n_frames, max(scene.n_frames // 8, 1)))
    out = evaluate(scene, renderer, params, loader,
                   cam_id=loader.cam_ids[0], frames=frames,
                   downscale=int(ecfg.get("downscale", 1)),
                   lpips_weights=ecfg.get("lpips_weights"), occ=occ)
    os.makedirs(os.path.join(exp_dir, "eval"), exist_ok=True)
    with open(os.path.join(exp_dir, "eval", "metrics.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["mean"]))
    return out


def main(argv=None):
    from ..config import BaseConfig
    cfg = BaseConfig("neuralsim_tpu eval").parse(argv)
    return main_function(cfg)


if __name__ == "__main__":
    main()
