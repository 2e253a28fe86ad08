"""Render CLI: replay / novel-view-synthesis / LiDAR simulation.

TPU-native re-design of ``code_single/tools/render.py`` (reference, 860 LoC:
replay + NVS camera paths spherical_spiral/small_circle/interpolation
:485-521, LiDAR simulation original/replay + synthetic models :246-330 —
SURVEY.md §2.6, §3.3).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

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


def get_path_street_view(c2ws: np.ndarray, n_frames: int, *,
                         shift_l: float = 2.0, shift_v: float = 1.0,
                         pitch_deg: float = 10.0):
    """Street-view NVS path (reference render.py:485-521): follow the
    recorded trajectory, offset laterally (camera-right) and vertically
    (camera-up), pitch the view down toward the road."""
    base = get_path_interpolation(c2ws, n_frames)
    out = []
    s, c = np.sin(np.radians(pitch_deg)), np.cos(np.radians(pitch_deg))
    # OpenCV cam: +x right, +y down, +z forward; pitching DOWN tilts the
    # forward axis toward +y (the down direction)
    Rp = np.array([[1, 0, 0], [0, c, s], [0, -s, c]])
    for T in base:
        T = T.copy()
        T[:3, 3] = T[:3, 3] + T[:3, 0] * shift_l - T[:3, 1] * shift_v
        T[:3, :3] = T[:3, :3] @ Rp
        out.append(T)
    return np.asarray(out)


def assemble_video(out_dir: str, pattern: str = "rgb_", fps: int = 12,
                   name: str = "video") -> Optional[str]:
    """Stitch rendered frames into a video (reference post-render ffmpeg
    assembly). Uses mp4 when an ffmpeg backend exists, else animated GIF."""
    from PIL import Image
    frames = sorted(p for p in os.listdir(out_dir)
                    if p.startswith(pattern) and p.endswith(".png"))
    if not frames:
        return None
    imgs = [Image.open(os.path.join(out_dir, p)) for p in frames]
    try:
        import imageio
        path = os.path.join(out_dir, f"{name}.mp4")
        w = imageio.get_writer(path, fps=fps)
        for im in imgs:
            w.append_data(np.asarray(im))
        w.close()
        return path
    except Exception:
        path = os.path.join(out_dir, f"{name}.gif")
        imgs[0].save(path, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / fps), loop=0)
        return path


def overlay_mesh(rgb: np.ndarray, depth: np.ndarray, verts: np.ndarray,
                 faces: np.ndarray, intr: np.ndarray, c2w: np.ndarray, *,
                 alpha: float = 0.5, splat: int = 1) -> np.ndarray:
    """Blend a shaded mesh visualization over a rendered frame (reference
    mesh-overlay replay). Vertex splatting with z-test against the rendered
    depth — the lightweight stand-in for the reference's offscreen
    rasterizer; faces provide the shading normals."""
    H, W = rgb.shape[:2]
    w2c = np.linalg.inv(c2w)
    vc = verts @ w2c[:3, :3].T + w2c[:3, 3]
    z = vc[:, 2]
    front = z > 1e-4
    uv = (vc[:, :2] / np.clip(z[:, None], 1e-6, None)) @ \
        np.asarray(intr)[:2, :2].T + np.asarray(intr)[:2, 2]
    xs = np.round(uv[:, 0]).astype(int)
    ys = np.round(uv[:, 1]).astype(int)
    ok = front & (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    # per-vertex normals from face normals
    fn = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                  verts[faces[:, 2]] - verts[faces[:, 0]])
    vn = np.zeros_like(verts)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    vn /= np.clip(np.linalg.norm(vn, axis=-1, keepdims=True), 1e-9, None)
    shade = 0.3 + 0.7 * np.clip(vn[:, 2] * -0.5 + vn[:, 1] * -0.5 + 0.5, 0, 1)
    color = np.stack([0.2 * shade, 0.9 * shade, 0.4 * shade], -1)

    out = rgb.copy()
    zbuf = depth.copy() if depth is not None else np.full((H, W), np.inf)
    order = np.argsort(-z[ok])      # far-to-near painter within the splat
    xs, ys, zs = xs[ok][order], ys[ok][order], z[ok][order]
    cs = color[ok][order]
    vis = zs <= zbuf[ys, xs] * 1.02 + 0.05
    for dy in range(-splat, splat + 1):
        for dx in range(-splat, splat + 1):
            yy = np.clip(ys[vis] + dy, 0, H - 1)
            xx = np.clip(xs[vis] + dx, 0, W - 1)
            out[yy, xx] = (1 - alpha) * out[yy, xx] + alpha * cs[vis]
    return out


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
                kw2 = {k: v for k, v in kw.items()
                       if k in ("occ_states", "query_overrides", "cond")}
                if kw2.get("cond") is None:
                    kw2.pop("cond", None)
                return self.r.render_chunked(params, frozen, ro, rd,
                                             rayschunk=rayschunk, key=None,
                                             **kw2)

            def ray_query(self, params, ro, rd, **kw):
                frozen = scene.slice_at(self._fi)
                kw2 = {k: v for k, v in kw.items()
                       if k in ("with_rgb", "only_cr", "return_buffer",
                                "occ_states", "query_overrides")}
                return self.r.ray_query(params, frozen, ro, rd, key=None, **kw2)

        renderer = _MultiAdapter(mrenderer)
    else:
        _, scene, bank, renderer, trainer, loader = build_everything(cfg)
        if cfg.get("render", {}).get("data_parallel"):
            # render_parallel analog (reference render_parallel.py:28-320):
            # rays shard over all devices inside one pjit'd ray_query
            from ..parallel.mesh import ShardedRenderer, make_mesh
            nd = cfg["render"]["data_parallel"]
            renderer = ShardedRenderer(
                renderer, make_mesh(None if nd is True else int(nd)))
            print(f"data-parallel rendering over {renderer.n_devices} devices",
                  flush=True)
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

    rcfg = cfg.get("render", {})
    mode = rcfg.get("mode", "replay")          # replay | nvs | lidar
    downscale = int(rcfg.get("downscale", 2))
    # re-simulation: override node trajectories BEFORE rendering (reference
    # code_multi/tools/render_anim.py:80 — FileAnim/ReverseEgoAnim drive the
    # scene graph, then replay/lidar modes render the edited world)
    anim_cfg = rcfg.get("anim")
    if anim_cfg:
        from ..anim import create_anim
        create_anim(anim_cfg, scene).apply(scene)
    out_dir = os.path.join(exp_dir,
                           f"render_{mode}{'_anim' if anim_cfg else ''}")
    os.makedirs(out_dir, exist_ok=True)
    cam_id = rcfg.get("cam_id", loader.cam_ids[0])
    W, H = loader.image_wh(cam_id)
    Hs, Ws = H // downscale, W // downscale

    time_conditioned = getattr(
        getattr(renderer, "models", {}).get("cr"), "use_time", False)

    def render_frame_rays(ro, rd, fi=None):
        cond = None
        if time_conditioned and fi is not None and scene.n_frames > 1:
            # frozen frame's normalized time, broadcast over the chunk
            cond = jnp.full((1, 1), fi / (scene.n_frames - 1), jnp.float32)
        r = renderer.render_chunked(params, ro, rd,
                                    rayschunk=int(rcfg.get("rayschunk", 4096)),
                                    cond=cond, occ_states=occ,
                                    query_overrides={"perturb": False})
        return r

    def write_extra_channels(r, fi):
        """EmerNeRF decomposition + flow channels (reference render.py
        with_static_dynamic/with_flow, code_single/tools/render.py:536-546,
        674-680)."""
        from ..utils.logger import scene_flow_to_rgb
        for fk in ("flow_fwd", "flow_bwd"):
            if fk in r:
                fl = np.asarray(r[fk]).reshape(Hs, Ws, 3)
                im = scene_flow_to_rgb(
                    fl, flow_max_radius=float(rcfg.get("flow_max_radius", 0.5)))
                _write_png(os.path.join(out_dir, f"{fk}_{fi:04d}.png"),
                           (im * 255).astype(np.uint8))
        for ck in ("rgb_static", "rgb_dynamic"):
            if ck in r:
                im = np.asarray(r[ck]).reshape(Hs, Ws, 3)
                _write_png(os.path.join(out_dir, f"{ck}_{fi:04d}.png"),
                           (np.clip(im, 0, 1) * 255).astype(np.uint8))
        for mk in ("mask_static", "mask_dynamic"):
            if mk in r:
                im = np.asarray(r[mk]).reshape(Hs, Ws)
                _write_png(os.path.join(out_dir, f"{mk}_{fi:04d}.png"),
                           (np.clip(im, 0, 1) * 255).astype(np.uint8))

    def pixel_grid():
        ys, xs = np.meshgrid(np.arange(Hs), np.arange(Ws), indexing="ij")
        return jnp.asarray(np.stack([xs * downscale + 0.5 * downscale,
                                     ys * downscale + 0.5 * downscale],
                                    -1).reshape(-1, 2).astype(np.float32))

    frames = rcfg.get("frames")
    if isinstance(frames, str):
        frames = [int(x) for x in frames.split(",")]
    elif isinstance(frames, int):
        frames = [frames]   # "--render.frames=0" parses as a bare int

    if mode == "replay":
        fis = frames or list(range(scene.n_frames))
        mesh = None
        if rcfg.get("mesh_overlay"):
            from ..graphics.marching import load_mesh_ply
            mesh = load_mesh_ply(rcfg["mesh_overlay"])
        intr_s = None
        for fi in fis:
            fr = scene.slice_at(fi)
            if hasattr(renderer, "set_frame"):
                renderer.set_frame(fi)
            ro, rd = camera_get_selected_rays(fr, cam_id, pixel_grid())
            r = render_frame_rays(ro, rd, fi=fi)
            write_extra_channels(r, fi)
            rgb = np.asarray(r["rgb_volume"]).reshape(Hs, Ws, 3)
            depth_raw = np.asarray(r["depth_volume"]).reshape(Hs, Ws)
            if mesh is not None:
                if intr_s is None:
                    intr_s = np.asarray(
                        fr.data(cam_id)["intr"], np.float64).copy()
                    intr_s[:2] /= downscale
                c2w = np.asarray(fr.world_transform(cam_id))
                rgb = overlay_mesh(rgb, depth_raw, mesh[0], mesh[1],
                                   intr_s, c2w,
                                   alpha=float(rcfg.get("mesh_alpha", 0.5)))
            _write_png(os.path.join(out_dir, f"rgb_{fi:04d}.png"),
                       (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
            depth = color_depth(depth_raw)
            _write_png(os.path.join(out_dir, f"depth_{fi:04d}.png"),
                       (depth * 255).astype(np.uint8))
        if rcfg.get("video", True):
            v = assemble_video(out_dir, "rgb_", int(rcfg.get("fps", 12)))
            if v:
                print(f"video -> {v}")
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
        elif path_type == "street_view":
            # world camera poses along the whole trajectory (children ride
            # their parent ego node), offset + pitched toward the road
            # (reference render.py:485-521)
            world_c2ws = np.stack(
                [np.asarray(scene.slice_at(fi).world_transform(cam_id))
                 for fi in range(scene.n_frames)])
            poses = get_path_street_view(
                world_c2ws, n, shift_l=float(rcfg.get("shift_l", 2.0)),
                shift_v=float(rcfg.get("shift_v", 1.0)),
                pitch_deg=float(rcfg.get("pitch_deg", 10.0)))
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
        if rcfg.get("video", True):
            v = assemble_video(out_dir, "rgb_", int(rcfg.get("fps", 12)))
            if v:
                print(f"video -> {v}")
        print(f"nvs[{path_type}]: {n} frames -> {out_dir}")

    elif mode == "topdown":
        # Orthographic top-down scene map, one image per frame (reference
        # code_multi/tools/render_topdown.py:1-101): parallel rays straight
        # down over the close-range cuboid's xy footprint.
        from ..scene.observers.extra_cameras import ortho_get_rays
        cr_field = (getattr(renderer, "models", {}) or {}).get("cr")
        if cr_field is None and hasattr(renderer, "r"):   # multi adapter
            sm = renderer.r.scene_models.get("cr")
            cr_field = sm[0] if sm else None
        space = getattr(cr_field, "space", None)
        if rcfg.get("extent"):
            (x0, y0), (x1, y1) = rcfg["extent"]
            z_top = float(rcfg.get("altitude", 50.0))
        elif space is not None:
            mn = np.asarray(space.aabb_min)
            mx = np.asarray(space.aabb_max)
            x0, y0, x1, y1 = float(mn[0]), float(mn[1]), float(mx[0]), float(mx[1])
            z_top = float(mx[2]) + 0.25 * float(mx[2] - mn[2]) + 1.0
        else:
            raise ValueError("topdown needs a cr model with a space, or "
                             "render.extent=[[x0,y0],[x1,y1]]")
        Wt = int(rcfg.get("topdown_w", 320))
        Ht = max(int(round(Wt * (y1 - y0) / max(x1 - x0, 1e-6))), 8)
        # camera basis in world (columns): x=+x, y=-y, z=-z (looking down)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
        c2w[:3, 3] = [0.5 * (x0 + x1), 0.5 * (y0 + y1), z_top]
        ys, xs = np.meshgrid(np.arange(Ht) + 0.5, np.arange(Wt) + 0.5,
                             indexing="ij")
        xy = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2)
                         .astype(np.float32))
        ro, rd = ortho_get_rays(xy, jnp.asarray(c2w),
                                width=x1 - x0, height=y1 - y0, W=Wt, H=Ht)
        fis = frames or list(range(scene.n_frames))
        for fi in fis:
            if hasattr(renderer, "set_frame"):
                renderer.set_frame(fi)
            r = render_frame_rays(ro, rd, fi=fi)
            rgb = np.asarray(r["rgb_volume"]).reshape(Ht, Wt, 3)
            _write_png(os.path.join(out_dir, f"rgb_{fi:04d}.png"),
                       (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
            # height map: z = z_top - depth (ortho rays are unit -z)
            height = z_top - np.asarray(r["depth_volume"]).reshape(Ht, Wt)
            _write_png(os.path.join(out_dir, f"height_{fi:04d}.png"),
                       (color_depth(height) * 255).astype(np.uint8))
        if rcfg.get("video", True):
            v = assemble_video(out_dir, "rgb_", int(rcfg.get("fps", 12)))
            if v:
                print(f"video -> {v}")
        print(f"topdown: {len(fis)} frames ({Wt}x{Ht}) -> {out_dir}")

    elif mode == "lidar":
        # LiDAR simulation (reference render.py:246-330): either replay the
        # dataset beams re-rendered, or a synthetic model mounted on a node.
        lidar_model = rcfg.get("lidar_model", "original")
        fis = frames or list(range(scene.n_frames))
        # world-unit default (reference 6400 per 25 m = 256 m^-1)
        inv_s = rcfg.get("lidar_forward_inv_s", 256.0)
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
                                   only_cr=True, occ_states=occ,
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
