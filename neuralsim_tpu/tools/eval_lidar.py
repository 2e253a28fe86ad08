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
                      forward_inv_s=None, occ=None) -> Dict:
    # forward_inv_s (WORLD meter units; reference lidar_forward_inv_s=6400
    # rides sdf_scale=25 = 256 m^-1) optionally sharpens alpha beyond the
    # model's final annealed inv_s. Default None: evaluate at the model's
    # native post-anneal sharpness — overriding far beyond what the
    # geometry supports makes every beam transparent (hit_frac ~0.04).
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
            hit = (np.asarray(r["mask_volume"]) > 0.5) & valid_gt
            if hit.sum() < 10:
                continue
            gt_r = ld["ranges"][hit]
            pd_r = depth[hit]
            err = pd_r - gt_r
            row = {"frame": fi, "lidar": lid,
                   "rmse": float(np.sqrt(np.mean(err ** 2))),
                   "mae": float(np.mean(np.abs(err))),
                   "hit_frac": float(hit.mean())}
            # chamfer between predicted and GT point clouds (+trims)
            pts_gt = np.asarray(ro)[hit] + gt_r[:, None] * np.asarray(rd)[hit]
            pts_pd = np.asarray(ro)[hit] + pd_r[:, None] * np.asarray(rd)[hit]
            for trim, name in [(None, "chamfer"), (0.99, "chamfer_99"),
                               (0.97, "chamfer_97"), (0.95, "chamfer_95")]:
                a2b, b2a = chamfer_distance(jnp.asarray(pts_pd),
                                            jnp.asarray(pts_gt),
                                            trim_quantile=trim)
                row[name] = float(a2b + b2a) / 2
            rows.append(row)

    agg = {}
    if rows:
        for k in rows[0]:
            if k in ("frame", "lidar"):
                continue
            agg[k] = float(np.mean([r[k] for r in rows]))
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
        _build = "multi"
    else:
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

    ecfg = cfg.get("eval", {})
    frames = ecfg.get("frames")
    if isinstance(frames, str):
        frames = [int(x) for x in frames.split(",")]
    frames = frames or list(range(0, scene.n_frames, max(scene.n_frames // 8, 1)))
    fis = ecfg.get("forward_inv_s")
    out = eval_lidar_frames(scene, renderer, params, loader, frames=frames, occ=occ,
                            forward_inv_s=float(fis) if fis else None)
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
