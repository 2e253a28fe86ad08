"""Multi-object scene evaluation: full/fg/bg metrics + per-object and
per-class in-scene decomposition metrics.

TPU-native re-design of ``code_multi/tools/eval.py`` (reference, 598 LoC:
full + foreground + background PSNR/SSIM/LPIPS + mask BCE :255-304, per-cam
aggregation :331-340, per-object decomposition renders) over the compose
renderer's ``rendered_per_obj_in_scene`` outputs (the ``vw_in_total``
analog). Usage::

    python -m neuralsim_tpu.tools.eval_multi --config <exp>/config.yaml \
        --resume_dir <exp> [--eval.frames=0,4] [--platform=cpu]

Outputs ``<exp>/eval_multi/metrics.json`` (per-frame + aggregate),
``per_object.csv``, and decomposition images for the first frame.
"""
from __future__ import annotations

import csv
import json
import os
from typing import Any, Dict, List, Optional

import numpy as np


def _bce(pred: np.ndarray, gt: np.ndarray, eps: float = 1e-6) -> float:
    p = np.clip(pred, eps, 1.0 - eps)
    return float(-(gt * np.log(p) + (1.0 - gt) * np.log(1.0 - p)).mean())


def evaluate_multi(scene, renderer, params, loader, *, cam_id: str,
                   frames: List[int], downscale: int = 1,
                   rayschunk: int = 4096, lpips_weights: Optional[str] = None,
                   out_dir: Optional[str] = None, occ=None) -> Dict[str, Any]:
    """Render each frame with the compose renderer (per-object decomposition
    on), score full/fg/bg appearance + per-object/per-class contributions."""
    import jax.numpy as jnp
    from ..dataio.dataloader import ImageSampler
    from ..maths.metrics import lpips_np, psnr_np, ssim_np
    from ..scene.observers import camera_get_selected_rays
    from ..utils.logger import _write_png, color_depth

    sampler = ImageSampler(loader, downscale)
    rows: List[Dict[str, Any]] = []
    obj_rows: List[Dict[str, Any]] = []
    class_of = {oid: scene.drawables[oid].class_name
                for oid in scene.drawable_ids()}

    for fi in frames:
        frame = sampler.get(cam_id, fi)
        frozen = scene.slice_at(fi)
        ro, rd = camera_get_selected_rays(frozen, cam_id,
                                          jnp.asarray(frame["rays_xy"]))
        cond = None
        if scene.n_frames > 1:
            cond = jnp.full((1, 1), fi / (scene.n_frames - 1), jnp.float32)
        r = renderer.render_chunked(params, frozen, ro, rd,
                                    rayschunk=rayschunk, cond=cond,
                                    occ_states=occ,
                                    query_overrides={"perturb": False})
        H, W = frame["hw"]
        pred = np.asarray(r["rgb_volume"]).reshape(H, W, 3)
        gt = np.asarray(frame["image_rgb"]).reshape(H, W, 3)
        row: Dict[str, Any] = {"frame": fi, "cam": cam_id,
                               "psnr": psnr_np(pred, gt),
                               "ssim": ssim_np(pred, gt),
                               "lpips": lpips_np(pred, gt, lpips_weights)}
        pred_mask = np.asarray(r["mask_volume"]).reshape(H, W)
        if "image_occupancy_mask" in frame:
            m = np.asarray(frame["image_occupancy_mask"]).reshape(H, W) > 0.5
            # fg/bg split on the GT mask (reference eval.py:262-304)
            if m.any():
                row["psnr_fg"] = psnr_np(pred[m], gt[m])
            if (~m).any():
                row["psnr_bg"] = psnr_np(pred[~m], gt[~m])
            row["mask_bce"] = _bce(pred_mask, m.astype(np.float32))
            row["mask_acc"] = float(((pred_mask > 0.5) == m).mean())
        rows.append(row)

        # ground/road pixel mask from the dataset's semantic taxonomy
        # (road-pixel OWNERSHIP, VERDICT r4 item 4: whole-image vis_mass
        # cannot distinguish "the street model owns the road" from "the
        # distant model paints road texture on its nearest shell" — the
        # metric that settles it is per-source visibility restricted to
        # ground pixels). Ground = not sky / vehicle / human.
        ground = None
        ds = getattr(loader, "dataset", None)
        if ds is not None and hasattr(ds, "get_semantic_mask"):
            sem = ds.get_semantic_mask(scene.id, cam_id, fi)
            if sem is not None:
                from ..dataio.waymo import (DYNAMIC_IDS, HUMAN_IDS, SKY_ID,
                                            VEHICLE_IDS)
                non_ground = np.isin(
                    sem, (SKY_ID,) + tuple(HUMAN_IDS) + tuple(VEHICLE_IDS)
                    + tuple(DYNAMIC_IDS))
                s = max(sem.shape[0] // H, 1)
                ground = ~non_ground[::s, ::s][:H, :W]
                if not ground.any():
                    ground = None

        # per-object in-scene decomposition (vw_in_total analog): each
        # source's own visibility mass + appearance accuracy where it
        # dominates the composited image
        for name, sub in r.get("per_obj", {}).items():
            om = np.asarray(sub["mask_volume"]).reshape(H, W)
            dominant = om > 0.5
            orow: Dict[str, Any] = {
                "frame": fi, "object": name,
                "class": class_of.get(name, name),
                "vis_mass": float(om.mean()),
                "pixels_dominant": int(dominant.sum()),
            }
            if dominant.any():
                orow["psnr_in_scene"] = psnr_np(pred[dominant], gt[dominant])
                od = np.asarray(sub["depth_volume"]).reshape(H, W)
                orow["mean_depth"] = float(od[dominant].mean())
            if ground is not None:
                # this source's visibility mass on GROUND pixels only
                orow["road_vis_mass"] = float(om[ground].mean())
                orow["road_dominant_frac"] = \
                    float((om[ground] > 0.5).mean())
            obj_rows.append(orow)

        if out_dir and fi == frames[0]:
            _write_png(os.path.join(out_dir, f"rgb_{fi:04d}.png"),
                       (np.clip(pred, 0, 1) * 255).astype(np.uint8))
            _write_png(os.path.join(out_dir, f"gt_{fi:04d}.png"),
                       (np.clip(gt, 0, 1) * 255).astype(np.uint8))
            depth = np.asarray(r["depth_volume"]).reshape(H, W)
            _write_png(os.path.join(out_dir, f"depth_{fi:04d}.png"),
                       color_depth(depth))
            for name, sub in r.get("per_obj", {}).items():
                im = np.asarray(sub["rgb_volume"]).reshape(H, W, 3)
                _write_png(
                    os.path.join(out_dir, f"obj_{name}_{fi:04d}.png"),
                    (np.clip(im, 0, 1) * 255).astype(np.uint8))

    # aggregates: frame-mean, per-object mean, per-CLASS mean (reference
    # per-cam/total aggregation :331-340 + per-class decomposition)
    agg: Dict[str, Any] = {}
    for k in rows[0]:
        if k in ("frame", "cam"):
            continue
        vals = [x[k] for x in rows if x.get(k) is not None]
        agg[k] = float(np.mean(vals)) if vals else None
    per_class: Dict[str, Dict[str, float]] = {}
    for cls in sorted({o["class"] for o in obj_rows}):
        sel = [o for o in obj_rows if o["class"] == cls]
        psnrs = [o["psnr_in_scene"] for o in sel if "psnr_in_scene" in o]
        per_class[cls] = {
            "vis_mass": float(np.mean([o["vis_mass"] for o in sel])),
            "psnr_in_scene": float(np.mean(psnrs)) if psnrs else None,
            "n_objects": len({o["object"] for o in sel}),
        }
        road = [o["road_vis_mass"] for o in sel if "road_vis_mass" in o]
        if road:
            per_class[cls]["road_vis_mass"] = float(np.mean(road))
            per_class[cls]["road_dominant_frac"] = float(np.mean(
                [o["road_dominant_frac"] for o in sel]))
    return {"per_frame": rows, "per_object": obj_rows,
            "per_class": per_class, "mean": agg}


def main_function(cfg) -> Dict[str, Any]:
    import jax
    if cfg.get("platform"):
        jax.config.update("jax_platforms", cfg["platform"])
    from ..utils.checkpoint import CheckpointIO
    from .train_multi import build_everything_multi

    scene, bank, renderer, trainer, loader, dataset = \
        build_everything_multi(cfg)
    if loader is None:
        raise ValueError("eval_multi needs an image-backed dataset "
                         "(get_image); procedural ray-only datasets cannot "
                         "be frame-evaluated")
    key = jax.random.PRNGKey(cfg.get("seed", 42))
    params = bank.init_params(key)
    exp_dir = cfg.get("resume_dir") or cfg.get("exp_dir", ".")
    ckpt = CheckpointIO(os.path.join(exp_dir, "ckpts"))
    state = trainer.init_state(key, params=params)
    restored = ckpt.load(state, cfg.get("ckpt"))
    occ = None
    if restored is not None:
        params = restored[0] if isinstance(restored, (tuple, list)) \
            else restored.params
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
        frames = [frames]
    if frames is None:
        frames = list(range(0, scene.n_frames, max(scene.n_frames // 8, 1)))
    out_dir = os.path.join(exp_dir, "eval_multi")
    os.makedirs(out_dir, exist_ok=True)
    out = evaluate_multi(scene, renderer, params, loader, occ=occ,
                         cam_id=ecfg.get("cam_id", loader.cam_ids[0]),
                         frames=frames,
                         downscale=int(ecfg.get("downscale", 1)),
                         rayschunk=int(ecfg.get("rayschunk", 4096)),
                         lpips_weights=ecfg.get("lpips_weights"),
                         out_dir=out_dir)
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(out, f, indent=2)
    if out["per_object"]:
        with open(os.path.join(out_dir, "per_object.csv"), "w",
                  newline="") as f:
            keys = sorted({k for o in out["per_object"] for k in o})
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(out["per_object"])
    print(json.dumps({"mean": out["mean"], "per_class": out["per_class"]}))
    return out


def main(argv=None):
    from ..config import BaseConfig
    return main_function(BaseConfig("neuralsim_tpu multi eval").parse(argv))


if __name__ == "__main__":
    main()
