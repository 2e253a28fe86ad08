"""SceneDataset implementation backed by the procedural synthetic renderer.

Gives the full framework stack (scene bank -> asset bank -> trainer CLI) a
dataset with analytic ground truth and zero files on disk — the CPU-runnable
stand-in for BMVS/DTU object scenes (BASELINE.md target config #1) and the
model for how real dataset impls plug in (SURVEY.md §2.5).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from .scene_dataset import SceneDataset
from .synthetic import SyntheticObjectDataset


class SyntheticSceneDataset(SceneDataset):
    def __init__(self, n_frames: int = 24, H: int = 96, W: int = 96,
                 radius: float = 2.0, fov_deg: float = 45.0, with_lidar: bool = False,
                 **_):
        self.ds = SyntheticObjectDataset(n_frames=n_frames, H=H, W=W,
                                         radius=radius, fov_deg=fov_deg)
        self.with_lidar = with_lidar

    def scene_ids(self) -> List[str]:
        return ["synthetic_object"]

    def get_scenario(self, scene_id: str, **kw) -> Dict[str, Any]:
        sc = self.ds.get_scenario()
        if self.with_lidar:
            T = self.ds.n_frames
            sc["observers"]["lidar_0"] = {
                "class_name": "RaysLidar", "n_frames": T,
                "data": {"transform": self.ds.c2ws.copy()},
            }
        return sc

    def get_image(self, scene_id: str, cam_id: str, frame_index: int) -> np.ndarray:
        return self.ds.render_frame(frame_index)["image_rgb"]

    def get_occupancy_mask(self, scene_id: str, cam_id: str, frame_index: int):
        return self.ds.render_frame(frame_index)["image_occupancy_mask"]

    def get_mono_depth(self, scene_id: str, cam_id: str, frame_index: int):
        """Analytic depth as the mono-depth cue (mono losses are scale/shift
        invariant, so GT depth is a valid stand-in for network-inferred cues
        — exercises the full image_patch/mono chain without pretrained nets)."""
        return self.ds.render_frame(frame_index)["image_depth"]

    def get_lidar(self, scene_id: str, lidar_id: str, frame_index: int):
        """Synthetic LiDAR: reuse camera rays (sensor frame = camera frame)
        with analytic ranges; rays where the tracer misses get range 0."""
        fr = self.ds.render_frame(frame_index)
        H, W = self.ds.H, self.ds.W
        c2w = self.ds.c2ws[frame_index]
        # world rays -> sensor-local (inverse rigid transform)
        R = c2w[:3, :3]
        d_local = fr["rays_d"].reshape(-1, 3) @ R  # R^T d
        ranges = np.where(fr["image_occupancy_mask"].reshape(-1) > 0,
                          fr["image_depth"].reshape(-1), 0.0)
        sel = np.arange(0, H * W, 7)  # sparse beams
        return {"rays_o": np.zeros((sel.size, 3), np.float32),
                "rays_d": d_local[sel].astype(np.float32),
                "ranges": ranges[sel].astype(np.float32)}
