"""LiDAR evaluation: render depth along GT beams, chamfer + RMSE metrics.

TPU-native re-design of ``code_single/tools/eval_lidar.py`` (reference, 698
LoC: chamfer distance full/99/97/95% trims + depth RMSE with outlier trims
:186-199,417-459 — SURVEY.md §2.6, §3.5).
"""
from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np


def eval_lidar_frames(scene, renderer, params, loader, *, frames,
                      forward_inv_s=None, occ=None, pred_mask: float = 0.5,
                      cr_aabb=None) -> Dict:
    # forward_inv_s (WORLD meter units; reference lidar_forward_inv_s=6400
    # rides sdf_scale=25 = 256 m^-1) optionally sharpens alpha beyond the
    # model's final annealed inv_s. Default None: evaluate at the model's
    # native post-anneal sharpness — overriding far beyond what the
    # geometry supports makes every beam transparent (hit_frac ~0.04).
    #
    # Reference completeness semantics (code_single/tools/eval_lidar.py):
    #   * pred cloud = beams whose rendered mask clears ``pred_mask``
    #     (reference default 0.5, get_lidar_pcl :231,253);
    #   * GT cloud = ALL beams with a valid return — so the gt→pred chamfer
    #     (``chamfer_gt``) penalizes geometry the model failed to
    #     reconstruct (:417-421: chamfer vs the FULL gt.pcl_world unless
    #     --cd_filter_by_pred_mask);
    #   * depth MAE/RMSE are necessarily hit-only (:429-436), so
    #     ``hit_recall`` is reported first-class and the non-hit beams are
    #     decomposed into in-cuboid misses vs beams whose GT return lies
    #     outside the close-range cuboid (VERDICT r4 item 3).
    import jax.numpy as jnp
    from ..maths.common import chamfer_distance
    from ..scene.observers import lidar_rays_to_world

    rows = []
    for fi in frames:
        fr = scene.slice_at(fi)
        if hasattr(renderer, "set_frame"):   # multi-object compose adapter
            renderer.set_frame(fi)
        for lid in loader.lidar_ids:
            ld = loader.lidars.get((lid, fi))
            if ld is None:
                continue
            valid_gt = ld["ranges"] > 0
            ro, rd = lidar_rays_to_world(fr, lid, jnp.asarray(ld["rays_o"]),
                                         jnp.asarray(ld["rays_d"]))
            qo = {"perturb": False}
            if forward_inv_s:
                qo["forward_inv_s"] = forward_inv_s
            r = renderer.ray_query(params, ro, rd, key=None, with_rgb=False,
                                   only_cr=True, occ_states=occ,
                                   query_overrides=qo)
            depth = np.asarray(r["depth_volume"])
            hit = (np.asarray(r["mask_volume"]) > pred_mask) & valid_gt
            if hit.sum() < 10:
                continue
            ro_np, rd_np = np.asarray(ro), np.asarray(rd)
            gt_r = ld["ranges"][hit]
            pd_r = depth[hit]
            err = pd_r - gt_r
            n_valid = int(valid_gt.sum())
            row = {"frame": fi, "lidar": lid,
                   "rmse": float(np.sqrt(np.mean(err ** 2))),
                   "mae": float(np.mean(np.abs(err))),
                   "hit_recall": float(hit.sum() / max(n_valid, 1)),
                   "hit_frac": float(hit.mean()),
                   "no_return_frac": float(1.0 - valid_gt.mean())}
            # decompose the non-hit valid beams: does the GT return lie
            # inside the close-range cuboid (a true miss the street model
            # should own) or outside it (distant/sky territory)?
            miss = valid_gt & ~hit
            if cr_aabb is not None and miss.any():
                pts_miss = ro_np[miss] + \
                    ld["ranges"][miss][:, None] * rd_np[miss]
                lo, hi = np.asarray(cr_aabb[0]), np.asarray(cr_aabb[1])
                in_box = np.all((pts_miss >= lo) & (pts_miss <= hi), axis=-1)
                row["miss_in_cuboid_frac"] = \
                    float(in_box.sum() / max(n_valid, 1))
                row["miss_out_cuboid_frac"] = \
                    float((~in_box).sum() / max(n_valid, 1))
            # chamfer: pred cloud (hit beams) vs the FULL valid GT cloud
            pts_gt_full = ro_np[valid_gt] + \
                ld["ranges"][valid_gt][:, None] * rd_np[valid_gt]
            pts_pd = ro_np[hit] + pd_r[:, None] * rd_np[hit]
            for trim, suffix in [(None, ""), (0.99, "_99"), (0.97, "_97"),
                                 (0.95, "_95")]:
                a2b, b2a = chamfer_distance(jnp.asarray(pts_pd),
                                            jnp.asarray(pts_gt_full),
                                            trim_quantile=trim)
                # pred→gt: accuracy of reconstructed points; gt→pred:
                # completeness — misses count (reference :417-427)
                row[f"chamfer_pred{suffix}"] = float(a2b)
                row[f"chamfer_gt{suffix}"] = float(b2a)
                row[f"chamfer{suffix}"] = float(a2b + b2a) / 2
            rows.append(row)

    agg = {}
    if rows:
        keys = set()
        for r in rows:
            keys.update(r.keys())
        for k in sorted(keys - {"frame", "lidar"}):
            vals = [r[k] for r in rows if k in r]
            agg[k] = float(np.mean(vals))
    return {"per_frame": rows, "mean": agg}


def main_function(cfg):
    import jax
    if cfg.get("platform"):
        jax.config.update("jax_platforms", cfg["platform"])
    from .train import build_everything
    from ..utils.checkpoint import CheckpointIO

    cfg.setdefault("training", {})["with_lidar"] = True
    if cfg.get("renderer", {}).get("type") == "multi":
        # multi-object scene: LiDAR depth along GT beams through the compose
        # renderer frozen at each frame (reference code_multi eval_lidar use)
        from .train_multi import build_everything_multi
        scene, bank, mrenderer, trainer, loader, _ = \
            build_everything_multi(cfg)

        class _Adapter:
            def __init__(self):
                self._fi = 0

            def set_frame(self, fi):
                self._fi = fi

            def ray_query(self, params, ro, rd, **kw):
                frozen = scene.slice_at(self._fi)
                kw2 = {k: v for k, v in kw.items()
                       if k in ("with_rgb", "only_cr", "query_overrides",
                                "key", "occ_states")}
                return mrenderer.ray_query(params, frozen, ro, rd, **kw2)

        renderer = _Adapter()
        cr_field = mrenderer.scene_models["cr"][0] \
            if mrenderer.scene_models.get("cr") else None
    else:
        _, scene, bank, renderer, trainer, loader = build_everything(cfg)
        cr_field = renderer.models.get("cr")
    cr_aabb = None
    if cr_field is not None and hasattr(cr_field, "space") \
            and hasattr(cr_field.space, "aabb_min"):
        cr_aabb = (np.asarray(cr_field.space.aabb_min),
                   np.asarray(cr_field.space.aabb_max))
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
    frames = frames or list(range(0, scene.n_frames, max(scene.n_frames // 8, 1)))
    fis = ecfg.get("forward_inv_s")
    out = eval_lidar_frames(scene, renderer, params, loader, frames=frames, occ=occ,
                            forward_inv_s=float(fis) if fis else None,
                            pred_mask=float(ecfg.get("pred_mask", 0.5)),
                            cr_aabb=cr_aabb)
    os.makedirs(os.path.join(exp_dir, "eval"), exist_ok=True)
    with open(os.path.join(exp_dir, "eval", "lidar_metrics.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["mean"]))
    return out


def main(argv=None):
    from ..config import BaseConfig
    cfg = BaseConfig("neuralsim_tpu eval_lidar").parse(argv)
    return main_function(cfg)


if __name__ == "__main__":
    main()
