"""Procedural synthetic object dataset — analytic GT for tests & benchmarks.

The reference tests everything against real datasets (SURVEY.md §4); we
instead fabricate an object-centric scene with an *analytic* SDF (spheres +
torus union), Lambertian shading and known camera poses, so golden tests and
CI runs need no data. The produced dict mirrors the universal scenario
contract (SURVEY.md App. A.4) closely enough to drive the same dataloaders.
"""
from __future__ import annotations

import math
from typing import Dict, Tuple

import numpy as np


def _sdf_scene(p: np.ndarray) -> np.ndarray:
    """Analytic SDF: union(sphere(r=.45, c=0), sphere(r=.25, c=(.4,.3,0)),
    torus in the xz plane). p: [..., 3]."""
    d1 = np.linalg.norm(p, axis=-1) - 0.45
    d2 = np.linalg.norm(p - np.array([0.42, 0.3, 0.0]), axis=-1) - 0.22
    q = np.stack([np.linalg.norm(p[..., [0, 2]], axis=-1) - 0.55, p[..., 1] + 0.35], -1)
    d3 = np.linalg.norm(q, axis=-1) - 0.08
    return np.minimum(np.minimum(d1, d2), d3)


def _sdf_grad(p: np.ndarray, eps: float = 1e-4) -> np.ndarray:
    g = np.stack([
        _sdf_scene(p + np.array([eps, 0, 0])) - _sdf_scene(p - np.array([eps, 0, 0])),
        _sdf_scene(p + np.array([0, eps, 0])) - _sdf_scene(p - np.array([0, eps, 0])),
        _sdf_scene(p + np.array([0, 0, eps])) - _sdf_scene(p - np.array([0, 0, eps])),
    ], axis=-1) / (2 * eps)
    return g / np.clip(np.linalg.norm(g, axis=-1, keepdims=True), 1e-9, None)


def _albedo(p: np.ndarray) -> np.ndarray:
    """Smooth position-dependent albedo (no texture files needed)."""
    return 0.5 + 0.45 * np.stack([np.sin(4.0 * p[..., 0]),
                                  np.sin(4.0 * p[..., 1] + 2.0),
                                  np.sin(4.0 * p[..., 2] + 4.0)], axis=-1)


def _sphere_trace(rays_o: np.ndarray, rays_d: np.ndarray, n_steps: int = 96
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (t_hit, hit_mask) by sphere tracing the analytic SDF."""
    t = np.full(rays_o.shape[:-1], 0.05, np.float64)
    for _ in range(n_steps):
        p = rays_o + t[..., None] * rays_d
        d = _sdf_scene(p)
        t = t + np.clip(d, -0.05, 0.25)
    p = rays_o + t[..., None] * rays_d
    hit = (np.abs(_sdf_scene(p)) < 2e-3) & (t < 6.0)
    return t.astype(np.float32), hit


def look_at(eye: np.ndarray, target: np.ndarray, up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """OpenCV-convention c2w (x right, y down, z forward)."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, eye
    return c2w.astype(np.float32)


class SyntheticObjectDataset:
    """Object-centric multi-view dataset with analytic GT.

    Cameras on a spiral around the object, pinhole intrinsics; per-frame
    arrays mirror the scenario observer contract: transform [T,4,4],
    intr [3,3], hw. GT images: Lambertian-shaded analytic SDF render with a
    sky-gradient background + occupancy masks + depth.
    """

    def __init__(self, n_frames: int = 24, H: int = 64, W: int = 64,
                 radius: float = 2.0, fov_deg: float = 45.0, seed: int = 0):
        self.n_frames, self.H, self.W = n_frames, H, W
        f = 0.5 * W / math.tan(math.radians(fov_deg) / 2)
        self.intr = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
        self.c2ws = np.stack([
            look_at(np.array([radius * math.cos(2 * math.pi * i / n_frames),
                              -0.6 + 0.4 * math.sin(4 * math.pi * i / n_frames),
                              radius * math.sin(2 * math.pi * i / n_frames)]),
                    np.zeros(3))
            for i in range(n_frames)], axis=0)
        self._cache: Dict[int, Dict[str, np.ndarray]] = {}

    # -- ray generation (numpy mirror of cameras_math.get_rays) --------------
    def frame_rays(self, fi: int) -> Tuple[np.ndarray, np.ndarray]:
        H, W = self.H, self.W
        u, v = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
        x = (u - self.intr[0, 2]) / self.intr[0, 0]
        y = (v - self.intr[1, 2]) / self.intr[1, 1]
        dirs = np.stack([x, y, np.ones_like(x)], axis=-1)
        c2w = self.c2ws[fi]
        d = dirs @ c2w[:3, :3].T
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.broadcast_to(c2w[:3, 3], d.shape)
        return o.astype(np.float32), d.astype(np.float32)

    def sky_color(self, dirs: np.ndarray) -> np.ndarray:
        t = 0.5 * (dirs[..., 1] + 1.0)
        return ((1.0 - t[..., None]) * np.array([0.9, 0.95, 1.0])
                + t[..., None] * np.array([0.2, 0.35, 0.7])).astype(np.float32)

    def render_frame(self, fi: int) -> Dict[str, np.ndarray]:
        if fi in self._cache:
            return self._cache[fi]
        o, d = self.frame_rays(fi)
        t, hit = _sphere_trace(o.astype(np.float64), d.astype(np.float64))
        p = o + t[..., None] * d
        n = _sdf_grad(p)
        light = np.array([0.5, -0.8, 0.3])
        light = light / np.linalg.norm(light)
        lambert = np.clip(-(n * light).sum(-1), 0.0, 1.0) * 0.8 + 0.2
        rgb_fg = _albedo(p) * lambert[..., None]
        rgb = np.where(hit[..., None], rgb_fg, self.sky_color(d)).astype(np.float32)
        out = {"image_rgb": np.clip(rgb, 0, 1),
               "image_occupancy_mask": hit.astype(np.float32),
               "image_depth": np.where(hit, t, 0.0).astype(np.float32),
               "rays_o": o, "rays_d": d}
        self._cache[fi] = out
        return out

    # -- scenario-format view (SURVEY.md App. A.4) ----------------------------
    def get_scenario(self) -> Dict:
        return {
            "scene_id": "synthetic_object",
            "metas": {"num_frames": self.n_frames, "up_vec": "-y",
                      "world_offset": np.zeros(3, np.float32)},
            "observers": {
                "camera_0": {
                    "class_name": "Camera", "n_frames": self.n_frames,
                    "data": {"transform": self.c2ws,
                             "intr": np.tile(self.intr, (self.n_frames, 1, 1)),
                             "hw": np.tile(np.array([self.H, self.W]), (self.n_frames, 1)),
                             "global_ts": np.arange(self.n_frames, dtype=np.float32)},
                }
            },
            "objects": {
                "obj_0": {"class_name": "Main", "segments": [{
                    "start_frame": 0, "n_frames": self.n_frames,
                    "data": {"transform": np.tile(np.eye(4, dtype=np.float32),
                                                  (self.n_frames, 1, 1)),
                             "scale": np.ones((self.n_frames, 3), np.float32)},
                }]}
            },
        }

    def sample_pixels(self, rng: np.random.Generator, n: int,
                      frames: np.ndarray = None) -> Dict[str, np.ndarray]:
        """Random (frame, pixel) ray batch with GT — the minimal PixelDataset
        analog (joint frame-pixel sampling, reference pixel_loader.py:234+)."""
        fidx = (rng.integers(0, self.n_frames, n) if frames is None
                else rng.choice(frames, n))
        ys = rng.integers(0, self.H, n)
        xs = rng.integers(0, self.W, n)
        outs = {"rays_o": [], "rays_d": [], "image_rgb": [],
                "image_occupancy_mask": [], "image_depth": []}
        for fi in np.unique(fidx):
            fr = self.render_frame(int(fi))
            sel = fidx == fi
            outs["rays_o"].append(fr["rays_o"][ys[sel], xs[sel]])
            outs["rays_d"].append(fr["rays_d"][ys[sel], xs[sel]])
            outs["image_rgb"].append(fr["image_rgb"][ys[sel], xs[sel]])
            outs["image_occupancy_mask"].append(fr["image_occupancy_mask"][ys[sel], xs[sel]])
            outs["image_depth"].append(fr["image_depth"][ys[sel], xs[sel]])
        return {k: np.concatenate(v, 0) for k, v in outs.items()}
