"""Render CLI: replay / novel-view-synthesis / LiDAR simulation.

TPU-native re-design of ``code_single/tools/render.py`` (reference, 860 LoC:
replay + NVS camera paths spherical_spiral/small_circle/interpolation
:485-521, LiDAR simulation original/replay + synthetic models :246-330 —
SURVEY.md §2.6, §3.3).
"""
from __future__ import annotations

import os
from typing import Dict, List

import numpy as np


# ---------------------------------------------------------------------------
# NVS camera paths (reference get_path_* family)
# ---------------------------------------------------------------------------

def get_path_spherical_spiral(center, radius: float, n_frames: int, *,
                              up=(0, 0, 1), n_rounds: float = 2.0,
                              elev_range=(0.1, 0.7)):
    """c2w poses on a spiral over the view sphere (OpenCV convention)."""
    from ..dataio.synthetic import look_at
    center = np.asarray(center, np.float64)
    out = []
    for i in range(n_frames):
        t = i / max(n_frames - 1, 1)
        az = 2 * np.pi * n_rounds * t
        el = elev_range[0] + (elev_range[1] - elev_range[0]) * t
        eye = center + radius * np.array([np.cos(az) * np.cos(el),
                                          np.sin(az) * np.cos(el),
                                          np.sin(el)])
        out.append(look_at(eye, center, up=(0.0, 0.0, -1.0)))
    return np.stack(out)


def get_path_small_circle(c2w0: np.ndarray, n_frames: int, radius: float = 0.2):
    """Small circular perturbation around one camera pose."""
    out = []
    for i in range(n_frames):
        a = 2 * np.pi * i / n_frames
        d = c2w0[:3, 0] * np.cos(a) * radius + c2w0[:3, 1] * np.sin(a) * radius
        T = c2w0.copy()
        T[:3, 3] = c2w0[:3, 3] + d
        out.append(T)
    return np.stack(out)


def get_path_interpolation(c2ws: np.ndarray, n_frames: int):
    """Smooth interpolation through the original camera track."""
    import jax.numpy as jnp
    from ..maths.transforms import (make_transform, quat_slerp, quat_to_rot,
                                    rot_to_quat)
    T = c2ws.shape[0]
    ts = np.linspace(0, T - 1 - 1e-4, n_frames)
    lo = np.floor(ts).astype(int)
    w = ts - lo
    q = rot_to_quat(jnp.asarray(c2ws[:, :3, :3]))
    qi = quat_slerp(q[lo], q[np.minimum(lo + 1, T - 1)], jnp.asarray(w))
    tr = c2ws[lo, :3, 3] * (1 - w[:, None]) + c2ws[np.minimum(lo + 1, T - 1), :3, 3] * w[:, None]
    return np.asarray(make_transform(quat_to_rot(qi), jnp.asarray(tr)))


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------

def main_function(cfg) -> Dict:
    import jax
    if cfg.get("platform"):
        jax.config.update("jax_platforms", cfg["platform"])
    import jax.numpy as jnp
    from .train import build_everything
    from ..scene.observers import (camera_get_selected_rays, lidar_rays_to_world,
                                   make_lidar_generator)
    from ..graphics import export_pcl_ply
    from ..utils.checkpoint import CheckpointIO
    from ..utils.logger import color_depth, _write_png

    if cfg.get("renderer", {}).get("type") == "multi":
        # multi-object replay: compose renderer over the frozen scene graph
        from .train_multi import build_everything_multi
        scene, bank, mrenderer, trainer, loader, dataset =             build_everything_multi(cfg)

        class _MultiAdapter:
            """Adapts BufferComposeRenderer to the single-renderer surface
            used below (freezes the scene at each requested frame)."""

            def __init__(self, r):
                self.r = r
                self._fi = 0
                self.models = {}

            def set_frame(self, fi):
                self._fi = fi

            def render_chunked(self, params, ro, rd, rayschunk=4096, **kw):
                frozen = scene.slice_at(self._fi)
                kw.pop("occ_states", None)
                return self.r.ray_query(params, frozen, ro, rd, key=None)

            def ray_query(self, params, ro, rd, **kw):
                frozen = scene.slice_at(self._fi)
                kw2 = {k: v for k, v in kw.items()
                       if k in ("with_rgb", "only_cr", "return_buffer")}
                return self.r.ray_query(params, frozen, ro, rd, key=None, **kw2)

        renderer = _MultiAdapter(mrenderer)
    else:
        _, scene, bank, renderer, trainer, loader = build_everything(cfg)
    key = jax.random.PRNGKey(cfg.get("seed", 42))
    params = bank.init_params(key)
    exp_dir = cfg.get("resume_dir") or cfg.get("exp_dir", ".")
    ckpt = CheckpointIO(os.path.join(exp_dir, "ckpts"))
    state = trainer.init_state(key, params=params)
    restored = ckpt.load(state, cfg.get("ckpt"))
    if restored is not None:
        params = restored[0] if isinstance(restored, (tuple, list)) else restored.params

    rcfg = cfg.get("render", {})
    mode = rcfg.get("mode", "replay")          # replay | nvs | lidar
    downscale = int(rcfg.get("downscale", 2))
    out_dir = os.path.join(exp_dir, f"render_{mode}")
    os.makedirs(out_dir, exist_ok=True)
    cam_id = rcfg.get("cam_id", loader.cam_ids[0])
    W, H = loader.image_wh(cam_id)
    Hs, Ws = H // downscale, W // downscale

    def render_frame_rays(ro, rd):
        r = renderer.render_chunked(params, ro, rd,
                                    rayschunk=int(rcfg.get("rayschunk", 4096)),
                                    query_overrides={"perturb": False})
        return r

    def pixel_grid():
        ys, xs = np.meshgrid(np.arange(Hs), np.arange(Ws), indexing="ij")
        return jnp.asarray(np.stack([xs * downscale + 0.5 * downscale,
                                     ys * downscale + 0.5 * downscale],
                                    -1).reshape(-1, 2).astype(np.float32))

    frames = rcfg.get("frames")
    if isinstance(frames, str):
        frames = [int(x) for x in frames.split(",")]

    if mode == "replay":
        fis = frames or list(range(scene.n_frames))
        for fi in fis:
            fr = scene.slice_at(fi)
            if hasattr(renderer, "set_frame"):
                renderer.set_frame(fi)
            ro, rd = camera_get_selected_rays(fr, cam_id, pixel_grid())
            r = render_frame_rays(ro, rd)
            rgb = np.asarray(r["rgb_volume"]).reshape(Hs, Ws, 3)
            _write_png(os.path.join(out_dir, f"rgb_{fi:04d}.png"),
                       (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
            depth = color_depth(np.asarray(r["depth_volume"]).reshape(Hs, Ws))
            _write_png(os.path.join(out_dir, f"depth_{fi:04d}.png"),
                       (depth * 255).astype(np.uint8))
        print(f"replay: {len(fis)} frames -> {out_dir}")

    elif mode == "nvs":
        n = int(rcfg.get("n_frames", 24))
        path_type = rcfg.get("path", "spherical_spiral")
        node = scene.observers[cam_id]
        c2ws = np.asarray(node.frame_data["transform"])
        if path_type == "spherical_spiral":
            center = c2ws[:, :3, 3].mean(0) * 0 + np.asarray(
                rcfg.get("center", [0.0, 0.0, 0.0]))
            poses = get_path_spherical_spiral(center, float(rcfg.get("radius", 2.0)), n)
        elif path_type == "small_circle":
            poses = get_path_small_circle(c2ws[0], n,
                                          float(rcfg.get("radius", 0.2)))
        else:
            poses = get_path_interpolation(c2ws, n)
        intr = jnp.asarray(np.asarray(node.frame_data["intr"])[0])
        from ..scene.observers.cameras_math import get_rays
        for i, c2w in enumerate(poses):
            ro, rd = get_rays(pixel_grid(), intr, jnp.asarray(c2w))
            r = render_frame_rays(ro, rd)
            rgb = np.asarray(r["rgb_volume"]).reshape(Hs, Ws, 3)
            _write_png(os.path.join(out_dir, f"rgb_{i:04d}.png"),
                       (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
        print(f"nvs[{path_type}]: {n} frames -> {out_dir}")

    elif mode == "lidar":
        # LiDAR simulation (reference render.py:246-330): either replay the
        # dataset beams re-rendered, or a synthetic model mounted on a node.
        lidar_model = rcfg.get("lidar_model", "original")
        fis = frames or list(range(scene.n_frames))
        inv_s = rcfg.get("lidar_forward_inv_s", 6400.0)
        all_pts = []
        for fi in fis:
            fr = scene.slice_at(fi)
            if lidar_model == "original" and loader.lidar_ids:
                lid = loader.lidar_ids[0]
                ld = loader.lidars.get((lid, fi))
                if ld is None:
                    continue
                ro, rd = lidar_rays_to_world(fr, lid,
                                             jnp.asarray(ld["rays_o"]),
                                             jnp.asarray(ld["rays_d"]))
            else:
                gen = make_lidar_generator(lidar_model,
                                           **rcfg.get("lidar_params", {}))
                o, d = gen.get_all_rays()
                mount = rcfg.get("mount_node", cam_id)
                ro, rd = lidar_rays_to_world(fr, mount, o, d)
            r = renderer.ray_query(params, ro, rd, key=None, with_rgb=False,
                                   only_cr=True,
                                   query_overrides={"perturb": False,
                                                    "forward_inv_s": inv_s})
            depth = np.asarray(r["depth_volume"])
            mask = np.asarray(r["mask_volume"]) > 0.95
            pts = np.asarray(ro)[mask] + depth[mask, None] * np.asarray(rd)[mask]
            all_pts.append(pts)
            np.savez(os.path.join(out_dir, f"lidar_{fi:04d}.npz"),
                     depth=depth, mask=mask,
                     rays_o=np.asarray(ro), rays_d=np.asarray(rd))
        if all_pts:
            export_pcl_ply(os.path.join(out_dir, "points.ply"),
                           np.concatenate(all_pts, 0))
        print(f"lidar[{lidar_model}]: {len(fis)} frames -> {out_dir}")
    else:
        raise ValueError(mode)
    return {"out_dir": out_dir}


def main(argv=None):
    from ..config import BaseConfig
    cfg = BaseConfig("neuralsim_tpu render").parse(argv)
    return main_function(cfg)


if __name__ == "__main__":
    main()
