"""Scene data loading: image/mask caches + pixel / lidar / image samplers.

TPU-native re-design of ``dataio/data_loader/`` (reference SURVEY.md §2.5):
``SceneDataLoader`` (base_loader.py, caching layer), ``PixelDataset`` /
``JointFramePixelDataset`` (pixel_loader.py — joint frame+pixel importance
sampling), ``LidarDataset`` (lidar_loader.py — merged multi-LiDAR sampling),
``ImageDataset`` (image_loader.py — whole frames for validation).

Host-side numpy; emits ray batches as device arrays. Ray lifting happens
via the frozen scene graph so the pixel sampler only emits (cam, frame,
pixel) tuples — matching the reference's deliberate split
(data_loader/__init__.py:22-30) that keeps pose gradients possible.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .scene_dataset import SceneDataset
from ..scene import Scene


class SceneDataLoader:
    """Preloads images/masks/lidar for one scene into host RAM
    (reference base_loader.py preload path :137-145)."""

    def __init__(self, scene: Scene, dataset: SceneDataset, *,
                 preload: bool = True, with_mask: bool = True,
                 with_lidar: bool = False, downscale: float = 1.0,
                 filter_lidar_in_cams: bool = False,
                 filter_lidar_max_range: float = 0.0):
        self.scene = scene
        self.dataset = dataset
        self.cam_ids = [oid for oid in scene.observer_ids()
                        if scene.observers[oid].class_name == "Camera"]
        self.lidar_ids = [oid for oid in scene.observer_ids()
                          if scene.observers[oid].class_name == "RaysLidar"]
        self.n_frames = scene.n_frames
        self.with_mask = with_mask
        self.with_lidar = with_lidar
        self.filter_lidar_in_cams = filter_lidar_in_cams
        self.filter_lidar_max_range = filter_lidar_max_range
        self.images: Dict[Tuple[str, int], np.ndarray] = {}
        self.masks: Dict[Tuple[str, int], np.ndarray] = {}
        self.lidars: Dict[Tuple[str, int], Dict[str, np.ndarray]] = {}
        if preload:
            self._preload()

    def _preload(self):
        for cid in self.cam_ids:
            for fi in range(self.n_frames):
                self.images[(cid, fi)] = self.dataset.get_image(self.scene.id, cid, fi)
                if self.with_mask:
                    m = self.dataset.get_occupancy_mask(self.scene.id, cid, fi)
                    if m is not None:
                        self.masks[(cid, fi)] = m
        if self.with_lidar:
            for lid in self.lidar_ids:
                for fi in range(self.n_frames):
                    ld = self.dataset.get_lidar(self.scene.id, lid, fi)
                    if ld is not None:
                        ld = self._filter_lidar(lid, fi, ld)
                        self.lidars[(lid, fi)] = ld

    def _filter_lidar(self, lid: str, fi: int,
                      ld: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Beam filters (reference base_loader.py:654-753): optional max
        range + keep only beams whose hit points project into at least one
        camera viewport (``filter_in_cams``)."""
        keep = ld["ranges"] > 0
        if self.filter_lidar_max_range > 0:
            keep &= ld["ranges"] <= self.filter_lidar_max_range
        if self.filter_lidar_in_cams and self.cam_ids:
            fr = self.scene.slice_at(fi)
            l2w = np.asarray(fr.world_transform(lid))
            pts_l = ld["rays_o"] + ld["ranges"][:, None] * ld["rays_d"]
            pts_w = pts_l @ l2w[:3, :3].T + l2w[:3, 3]
            in_any = np.zeros(len(pts_w), bool)
            for cid in self.cam_ids:
                c2w = np.asarray(fr.world_transform(cid))
                intr = np.asarray(fr.data(cid)["intr"])
                H, W = [int(v) for v in np.asarray(fr.data(cid)["hw"])]
                w2c = np.linalg.inv(c2w)
                pc = pts_w @ w2c[:3, :3].T + w2c[:3, 3]
                z = pc[:, 2]
                uv = (pc[:, :2] / np.clip(z[:, None], 1e-9, None)) \
                    @ intr[:2, :2].T + intr[:2, 2]
                in_any |= ((z > 1e-3) & (uv[:, 0] >= 0) & (uv[:, 0] < W)
                           & (uv[:, 1] >= 0) & (uv[:, 1] < H))
            keep &= in_any
        if keep.all():
            return ld
        return {k: v[keep] for k, v in ld.items()}

    def image(self, cam_id: str, fi: int) -> np.ndarray:
        key = (cam_id, fi)
        if key not in self.images:
            self.images[key] = self.dataset.get_image(self.scene.id, cam_id, fi)
        return self.images[key]

    def image_wh(self, cam_id: str) -> Tuple[int, int]:
        img = self.image(cam_id, 0)
        return img.shape[1], img.shape[0]

    def lidar(self, lidar_id: str, fi: int) -> Optional[Dict[str, np.ndarray]]:
        """Filtered LiDAR frame dict (rays_o/rays_d/ranges), lazy-loaded."""
        key = (lidar_id, fi)
        if key not in self.lidars:
            ld = self.dataset.get_lidar(self.scene.id, lidar_id, fi)
            if ld is None:
                return None
            self.lidars[key] = self._filter_lidar(lidar_id, fi, ld)
        return self.lidars[key]


class PixelSampler:
    """Random (cam, frame, pixel) ray batches with GT (reference
    PixelDataset/JointFramePixelDataset, pixel_loader.py). Uniform by
    default; plug an ErrorMapSampler for importance sampling."""

    def __init__(self, loader: SceneDataLoader, *, n_rays: int = 4096,
                 equal_mode: str = "ray_batch", seed: int = 0,
                 imp_sampler=None, frame_sampler=None, use_native: bool = True):
        self.loader = loader
        self.n_rays = n_rays
        self.rng = np.random.default_rng(seed)
        self.imp_sampler = imp_sampler
        # weighted frame drawing (frame_sampler.WeightedFrameSampler — the
        # reference's by-speed / fixed-weight frame samplers, sampler.py:25-215)
        self.frame_sampler = frame_sampler
        # native C++/OpenMP batch assembly over a stacked per-camera cache
        # (native/libnsbatch.so; falls back silently when unavailable)
        self._native: Dict[str, Any] = {}
        if use_native and loader.images:
            from .native_sampler import NativePixelSampler, load_native
            if load_native() is not None:
                for cid in loader.cam_ids:
                    try:
                        imgs = np.stack([loader.image(cid, fi)
                                         for fi in range(loader.n_frames)])
                        msks = None
                        if loader.masks:
                            msks = np.stack([loader.masks[(cid, fi)]
                                             for fi in range(loader.n_frames)])
                        self._native[cid] = NativePixelSampler(
                            imgs, msks, seed=seed + hash(cid) % 1000)
                    except Exception:
                        pass

    def sample(self, n_rays: Optional[int] = None) -> Dict[str, Any]:
        n = n_rays or self.n_rays
        L = self.loader
        cam_idx = self.rng.integers(0, len(L.cam_ids))
        cam_id = L.cam_ids[cam_idx]
        W, H = L.image_wh(cam_id)
        if cam_id in self._native and self.imp_sampler is None \
                and self.frame_sampler is None:
            out = self._native[cam_id].sample(n)
            out["cam_id"] = cam_id
            return out
        if self.imp_sampler is not None:
            fidx, xs, ys = self.imp_sampler.sample(self.rng, cam_id, n, H, W)
        else:
            if self.frame_sampler is not None:
                fidx = self.frame_sampler.sample(n)
            else:
                fidx = self.rng.integers(0, L.n_frames, n)
            xs = self.rng.integers(0, W, n)
            ys = self.rng.integers(0, H, n)
        rgb = np.empty((n, 3), np.float32)
        mask = np.empty((n,), np.float32)
        has_mask = bool(L.masks)
        for fi in np.unique(fidx):
            sel = fidx == fi
            img = L.image(cam_id, int(fi))
            rgb[sel] = img[ys[sel], xs[sel]]
            if has_mask:
                mask[sel] = L.masks[(cam_id, int(fi))][ys[sel], xs[sel]]
        out = {"cam_id": cam_id, "rays_fidx": fidx.astype(np.int32),
               "rays_xy": np.stack([xs + 0.5, ys + 0.5], -1).astype(np.float32),
               "rays_sel": np.stack([ys, xs], -1),
               "image_rgb": rgb}
        if has_mask:
            out["image_occupancy_mask"] = mask
        return out


class LidarSampler:
    """LiDAR beam batches, merged across sensors with per-sensor weights
    (reference LidarDataset sample_merged, lidar_loader.py:119)."""

    def __init__(self, loader: SceneDataLoader, *, n_rays: int = 4096,
                 seed: int = 0, weights: Optional[Sequence[float]] = None):
        self.loader = loader
        self.n_rays = n_rays
        self.rng = np.random.default_rng(seed + 1)
        ids = loader.lidar_ids
        self.weights = np.asarray(weights if weights is not None
                                  else [1.0] * len(ids), np.float64)
        if self.weights.sum() > 0:
            self.weights = self.weights / self.weights.sum()

    def sample(self, n_rays: Optional[int] = None) -> Optional[Dict[str, Any]]:
        n = n_rays or self.n_rays
        L = self.loader
        if not L.lidars:
            return None
        fi = int(self.rng.integers(0, L.n_frames))
        lid = L.lidar_ids[int(self.rng.choice(len(L.lidar_ids), p=self.weights))]
        ld = L.lidars.get((lid, fi))
        if ld is None:
            return None
        m = ld["rays_d"].shape[0]
        sel = self.rng.integers(0, m, n)
        return {"lidar_id": lid, "rays_fidx": np.full(n, fi, np.int32),
                "rays_o_local": ld["rays_o"][sel], "rays_d_local": ld["rays_d"][sel],
                "ranges": ld["ranges"][sel]}


class ImageSampler:
    """Whole-frame iteration for validation (reference ImageDataset)."""

    def __init__(self, loader: SceneDataLoader, downscale: int = 1):
        self.loader = loader
        self.downscale = downscale

    def get(self, cam_id: str, fi: int) -> Dict[str, Any]:
        img = self.loader.image(cam_id, fi)
        if self.downscale > 1:
            img = img[::self.downscale, ::self.downscale]
        H, W = img.shape[:2]
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        s = self.downscale
        out = {"cam_id": cam_id, "fi": fi, "hw": (H, W),
               "rays_xy": np.stack([(xs * s + 0.5 * s), (ys * s + 0.5 * s)],
                                   -1).reshape(-1, 2).astype(np.float32),
               "image_rgb": img.reshape(-1, 3)}
        m = self.loader.masks.get((cam_id, fi))
        if m is not None:
            out["image_occupancy_mask"] = m[::s, ::s].reshape(-1)
        return out


class ViewSampler:
    """Whole-downscaled-frame TRAIN batches, organized [H', W'] — the 'view'
    step type (reference ImageDataset + train_step_view,
    code_single/tools/train.py:443): image-level losses (rgb / mask /
    entropy / mono cues) over one full low-res view per draw."""

    def __init__(self, loader: SceneDataLoader, *, downscale: int = 8,
                 seed: int = 0, dataset=None):
        self.loader = loader
        self.downscale = max(int(downscale), 1)
        self.dataset = dataset
        self.rng = np.random.default_rng(seed)

    def sample(self, it: int = 0) -> Dict[str, Any]:
        L = self.loader
        cam_id = L.cam_ids[int(self.rng.integers(0, len(L.cam_ids)))]
        fi = int(self.rng.integers(0, L.n_frames))
        img = L.image(cam_id, fi)
        s = self.downscale
        img = img[::s, ::s]
        H, W = img.shape[:2]
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        out = {"cam_id": cam_id, "fi": fi,
               "rays_xy": np.stack([xs * s + 0.5 * s, ys * s + 0.5 * s],
                                   -1).astype(np.float32),
               "rays_fidx": np.full((H, W), fi, np.int32),
               "image_rgb": img}
        m = L.masks.get((cam_id, fi))
        if m is not None:
            out["image_occupancy_mask"] = m[::s, ::s]
        if self.dataset is not None:
            md = self.dataset.get_mono_depth(L.scene.id, cam_id, fi)
            if md is not None:
                out["image_mono_depth"] = md[::s, ::s]
            mn = self.dataset.get_mono_normals(L.scene.id, cam_id, fi)
            if mn is not None:
                out["image_mono_normals"] = mn[::s, ::s]
        return out
