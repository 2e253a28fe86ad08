"""LiDAR observers: dataset-beam replay + synthetic LiDAR generators.

TPU-native re-design of ``app/resources/observers/lidars.py`` (reference:
``RaysLidar`` :33 — dataset beams transformed to world :55-100;
``Lidar`` :177 — synthetic beam models ``get_all_rays`` :208-250; generator
zoo ``SurroundLidarGenerator`` pandar64/etc :305, ``SolidStateLidarGenerator``
:435, ``RisleyPrismLidarGenerator`` :507 — SURVEY.md §2.1).
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ...maths.transforms import apply_rotation, apply_transform
from ..scene import FrozenScene


# ---------------------------------------------------------------------------
# Dataset-beam replay (RaysLidar)
# ---------------------------------------------------------------------------

def lidar_rays_to_world(frozen: FrozenScene, lidar_id: str,
                        rays_o_local: jnp.ndarray, rays_d_local: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sensor-frame beams -> world (reference RaysLidar.get_selected_rays,
    lidars.py:55-100). Beams come from the dataset (ego-motion compensated
    per return during preprocessing)."""
    l2w = frozen.world_transform(lidar_id)
    o = apply_transform(l2w, rays_o_local)
    d = apply_rotation(l2w, rays_d_local)
    return o, d / jnp.clip(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)


# ---------------------------------------------------------------------------
# Synthetic LiDAR beam generators (Lidar)
# ---------------------------------------------------------------------------

class SurroundLidarGenerator:
    """Mechanical surround LiDAR: fixed elevation table x uniform azimuth ring
    (reference SurroundLidarGenerator, lidars.py:305 — pandar64-class models).

    Published vertical-angle layouts; horizontal_res azimuth steps/rev.
    """

    PRESETS: Dict[str, Dict] = {
        # elevation ranges (deg); real devices use non-uniform tables — we use
        # the documented FOV bounds with the documented channel counts.
        "pandar64": {"n_channels": 64, "elev_min": -25.0, "elev_max": 15.0,
                     "horizontal_res": 1800, "max_range": 200.0},
        "pandar_qt": {"n_channels": 64, "elev_min": -52.1, "elev_max": 52.1,
                      "horizontal_res": 600, "max_range": 20.0},
        "pandar_xt": {"n_channels": 32, "elev_min": -16.0, "elev_max": 15.0,
                      "horizontal_res": 1800, "max_range": 120.0},
        "hdl64": {"n_channels": 64, "elev_min": -24.8, "elev_max": 2.0,
                  "horizontal_res": 1800, "max_range": 120.0},
        "vlp16": {"n_channels": 16, "elev_min": -15.0, "elev_max": 15.0,
                  "horizontal_res": 900, "max_range": 100.0},
    }

    def __init__(self, lidar_model: str = "pandar64", **overrides):
        cfg = dict(self.PRESETS.get(lidar_model, self.PRESETS["pandar64"]))
        cfg.update(overrides)
        self.cfg = cfg
        n, h = cfg["n_channels"], cfg["horizontal_res"]
        elev = np.deg2rad(np.linspace(cfg["elev_min"], cfg["elev_max"], n))
        azim = np.linspace(-math.pi, math.pi, h, endpoint=False)
        E, A = np.meshgrid(elev, azim, indexing="ij")  # [n, h]
        # sensor frame: x fwd, y left, z up
        d = np.stack([np.cos(E) * np.cos(A), np.cos(E) * np.sin(A), np.sin(E)], -1)
        self.dirs = jnp.asarray(d.reshape(-1, 3), jnp.float32)
        self.max_range = cfg["max_range"]

    def get_all_rays(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return jnp.zeros_like(self.dirs), self.dirs


class SolidStateLidarGenerator:
    """Solid-state LiDAR: rectangular FOV raster (reference
    SolidStateLidarGenerator, lidars.py:435)."""

    def __init__(self, fov_h_deg: float = 120.0, fov_v_deg: float = 25.0,
                 res_h: int = 640, res_v: int = 128, max_range: float = 150.0):
        ah = np.deg2rad(np.linspace(-fov_h_deg / 2, fov_h_deg / 2, res_h))
        av = np.deg2rad(np.linspace(-fov_v_deg / 2, fov_v_deg / 2, res_v))
        V, H = np.meshgrid(av, ah, indexing="ij")
        d = np.stack([np.cos(V) * np.cos(H), np.cos(V) * np.sin(H), np.sin(V)], -1)
        self.dirs = jnp.asarray(d.reshape(-1, 3), jnp.float32)
        self.max_range = max_range

    def get_all_rays(self):
        return jnp.zeros_like(self.dirs), self.dirs


class RisleyPrismLidarGenerator:
    """Risley-prism scanning LiDAR (Livox-style rosette pattern) —
    reference RisleyPrismLidarGenerator (lidars.py:507, csv-driven). We
    synthesize the rosette from two counter-rotating prism phases."""

    def __init__(self, n_points: int = 24000, fov_deg: float = 70.0,
                 f1: float = 7294.0, f2: float = -4664.0, max_range: float = 260.0):
        t = np.arange(n_points) / n_points
        r = np.deg2rad(fov_deg / 2) * 0.5 * np.abs(
            np.exp(1j * 2 * np.pi * f1 * t) + np.exp(1j * 2 * np.pi * f2 * t))
        phi = np.angle(np.exp(1j * 2 * np.pi * f1 * t) + np.exp(1j * 2 * np.pi * f2 * t))
        theta = np.abs(r)
        d = np.stack([np.cos(theta) * np.ones_like(phi),
                      np.sin(theta) * np.cos(phi),
                      np.sin(theta) * np.sin(phi)], -1)
        self.dirs = jnp.asarray(d.reshape(-1, 3), jnp.float32)
        self.max_range = max_range

    def get_all_rays(self):
        return jnp.zeros_like(self.dirs), self.dirs


def make_lidar_generator(lidar_model: str, **kw):
    """Factory mirroring the reference's Lidar(lidar_model=...) selection."""
    if lidar_model in SurroundLidarGenerator.PRESETS:
        return SurroundLidarGenerator(lidar_model, **kw)
    if lidar_model in ("solid_state", "rs_m1"):
        return SolidStateLidarGenerator(**kw)
    if lidar_model in ("risley_prism", "livox", "horizon"):
        return RisleyPrismLidarGenerator(**kw)
    raise ValueError(f"unknown lidar_model {lidar_model}")
