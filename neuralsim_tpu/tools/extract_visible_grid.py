"""Extract a visible grid for the background from the scene's observers.

TPU-native re-design of ``code_multi/tools/extract_visible_grid.py``: render
per-frame depth (or take ground-truth LiDAR returns), voxelize the visible
points into a :class:`VisibleGrid` with hit counts, apply the reference's
morphology postprocess (dilation/close/close2, ``app/visible_grid.py:217``),
and save. The saved grid is consumed by ``extract_mesh --visible_grid`` to
constrain the level-set extraction and can be exported as an occupancy accel
(reference consumption: ``code_multi/tools/extract_mesh.py:55-59``).

CLI:
  python -m neuralsim_tpu.tools.extract_visible_grid --config c.yaml \
      --resume_dir exp/ --grid.source camera --grid.res 128 \
      --grid.morphology close2
"""
from __future__ import annotations

import os

import numpy as np


def main_function(cfg):
    import jax
    if cfg.get("platform"):
        jax.config.update("jax_platforms", cfg["platform"])
    import jax.numpy as jnp
    from .train import build_everything
    from ..models.misc_assets import VisibleGrid
    from ..scene.observers import camera_get_selected_rays
    from ..utils.checkpoint import CheckpointIO

    _, scene, bank, renderer, trainer, loader = build_everything(cfg)
    gcfg = cfg.get("grid", {})
    source = gcfg.get("source", "camera")          # camera | lidar_gt
    res = int(gcfg.get("res", 128))
    downscale = int(gcfg.get("downscale", 4))
    depth_max = float(gcfg.get("depth_max", 0.0))
    morphology = gcfg.get("morphology", "close")

    exp_dir = cfg.get("resume_dir") or cfg.get("exp_dir", ".")

    space = renderer.models["cr"].space
    vg = VisibleGrid(np.asarray(space.aabb_min), np.asarray(space.aabb_max),
                     resolution=res)

    frames = gcfg.get("frames")
    if isinstance(frames, str):
        frames = [int(x) for x in frames.split(",")]
    fis = frames if frames is not None else list(range(scene.n_frames))

    if source == "lidar_gt":
        # ground-truth LiDAR returns, lifted to world per frame
        for fi in fis:
            fr = scene.slice_at(fi)
            for lid in loader.lidar_ids:
                ld = loader.lidar(lid, fi)
                if ld is None:
                    continue
                keep = ld["ranges"] > 0
                l2w = np.asarray(fr.world_transform(lid))
                pts_l = (ld["rays_o"][keep]
                         + ld["ranges"][keep][:, None] * ld["rays_d"][keep])
                vg.add_points(pts_l @ l2w[:3, :3].T + l2w[:3, 3])
    else:
        # rendered camera depth, back-projected (requires a checkpoint)
        key = jax.random.PRNGKey(cfg.get("seed", 42))
        params = bank.init_params(key)
        ckpt = CheckpointIO(os.path.join(exp_dir, "ckpts"))
        state = trainer.init_state(key, params=params)
        restored = ckpt.load(state, cfg.get("ckpt"))
        if restored is not None:
            params = (restored[0] if isinstance(restored, (tuple, list))
                      else restored.params)
        occ_states = getattr(state, "occ", None)
        cam_ids = gcfg.get("cam_ids") or loader.cam_ids
        if isinstance(cam_ids, str):
            cam_ids = cam_ids.split(",")
        for fi in fis:
            fr = scene.slice_at(fi)
            for cid in cam_ids:
                W, H = loader.image_wh(cid)
                Hs, Ws = H // downscale, W // downscale
                ys, xs = np.meshgrid(np.arange(Hs), np.arange(Ws),
                                     indexing="ij")
                xy = np.stack([xs * downscale + 0.5 * downscale,
                               ys * downscale + 0.5 * downscale],
                              -1).reshape(-1, 2).astype(np.float32)
                ro, rd = camera_get_selected_rays(fr, cid, jnp.asarray(xy))
                r = renderer.render_chunked(
                    params, ro, rd,
                    rayschunk=int(gcfg.get("rayschunk", 8192)),
                    occ_states=occ_states,
                    query_overrides={"perturb": False})
                depth = np.asarray(r["depth_volume"]).reshape(-1)
                mask = np.asarray(r["mask_volume"]).reshape(-1) > 0.5
                if depth_max > 0:
                    mask &= depth < depth_max
                vg.add_depth_points(np.asarray(ro), np.asarray(rd), depth,
                                    mask)

    n_before = int(vg.grid.sum())
    vg.postprocess(morphology)
    out = gcfg.get("out", os.path.join(
        exp_dir, f"visible_grid_res{res}.npz"))
    vg.save(out)
    print(f"visible grid: {n_before} voxels -> {int(vg.grid.sum())} after "
          f"{morphology} ({len(fis)} frames, source={source}) -> {out}")
    return out


def main(argv=None):
    from ..config import BaseConfig
    cfg = BaseConfig("neuralsim_tpu extract_visible_grid").parse(argv)
    return main_function(cfg)


if __name__ == "__main__":
    main()
