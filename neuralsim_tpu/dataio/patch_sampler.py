"""Image-patch pixel samplers for patch-based losses (mono depth, perceptual).

TPU-native re-design of ``dataio/data_loader/patch_sampler.py`` (reference,
337 LoC — SURVEY.md §2.5 + App. C): ``flex_grid`` draws a regular pixel grid
at a per-iteration random scale (annealed range) and random shift
(:94-209); ``slide_window`` scans fixed windows (:233).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ..training.annealers import get_anneal_val


class FlexGridPatchSampler:
    def __init__(self, *, num_pixels: Tuple[int, int] = (32, 32),
                 scale_range=(0.25, 1.0), scale_anneal: Optional[Dict] = None,
                 seed: int = 0):
        self.ph, self.pw = num_pixels
        self.scale_range = scale_range
        self.scale_anneal = scale_anneal
        self.rng = np.random.default_rng(seed)

    def sample(self, H: int, W: int, it: int = 0) -> np.ndarray:
        """-> [ph, pw, 2] continuous pixel coords of one random patch."""
        lo, hi = self.scale_range
        if self.scale_anneal:
            hi = float(get_anneal_val(it, **self.scale_anneal))
            hi = min(max(hi, lo), self.scale_range[1])
        scale = self.rng.uniform(lo, hi)
        # patch spans scale * min(H, W); regular ph x pw grid inside it
        span_h = scale * H
        span_w = scale * W
        y0 = self.rng.uniform(0, H - span_h)
        x0 = self.rng.uniform(0, W - span_w)
        ys = y0 + (np.arange(self.ph) + 0.5) * span_h / self.ph
        xs = x0 + (np.arange(self.pw) + 0.5) * span_w / self.pw
        gx, gy = np.meshgrid(xs, ys)
        return np.stack([gx, gy], -1).astype(np.float32)


class SlideWindowPatchSampler:
    def __init__(self, *, num_pixels: Tuple[int, int] = (64, 64),
                 stride: Optional[Tuple[int, int]] = None):
        self.ph, self.pw = num_pixels
        self.stride = stride or num_pixels
        self._pos = 0

    def sample(self, H: int, W: int, it: int = 0) -> np.ndarray:
        sh, sw = self.stride
        ny = max((H - self.ph) // sh + 1, 1)
        nx = max((W - self.pw) // sw + 1, 1)
        i = self._pos % (ny * nx)
        self._pos += 1
        y0, x0 = (i // nx) * sh, (i % nx) * sw
        ys = y0 + np.arange(self.ph) + 0.5
        xs = x0 + np.arange(self.pw) + 0.5
        gx, gy = np.meshgrid(xs, ys)
        return np.stack([gx, gy], -1).astype(np.float32)


class ImagePatchSampler:
    """Draws (cam, frame, patch grid) batches with GT rgb/mask/mono cues —
    the ImagePatchDataset analog (reference image_loader.py patch path)."""

    def __init__(self, loader, *, mode: str = "flex_grid", seed: int = 0,
                 dataset=None, **patch_kw):
        self.loader = loader
        self.dataset = dataset
        self.rng = np.random.default_rng(seed)
        self.patch = (FlexGridPatchSampler(seed=seed, **patch_kw)
                      if mode == "flex_grid"
                      else SlideWindowPatchSampler(**patch_kw))

    def sample(self, it: int = 0) -> Dict:
        L = self.loader
        cam_id = L.cam_ids[int(self.rng.integers(0, len(L.cam_ids)))]
        fi = int(self.rng.integers(0, L.n_frames))
        W, H = L.image_wh(cam_id)
        grid = self.patch.sample(H, W, it)  # [ph, pw, 2]
        xs = np.clip(grid[..., 0].astype(int), 0, W - 1)
        ys = np.clip(grid[..., 1].astype(int), 0, H - 1)
        img = L.image(cam_id, fi)
        out = {"cam_id": cam_id, "fi": fi, "rays_xy": grid,
               "rays_fidx": np.full(grid.shape[:2], fi, np.int32),
               "image_rgb": img[ys, xs]}
        m = L.masks.get((cam_id, fi))
        if m is not None:
            out["image_occupancy_mask"] = m[ys, xs]
        if self.dataset is not None:
            md = self.dataset.get_mono_depth(L.scene.id, cam_id, fi)
            if md is not None:
                out["image_mono_depth"] = md[ys, xs]
            mn = self.dataset.get_mono_normals(L.scene.id, cam_id, fi)
            if mn is not None:
                out["image_mono_normals"] = mn[ys, xs]
        return out
