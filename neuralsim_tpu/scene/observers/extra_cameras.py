"""Extra camera models: orthographic + panorama (equirectangular).

TPU-native re-design of ``app/resources/observers/orth_camera.py`` (93 LoC)
and ``panaroma.py`` (175 LoC) — SURVEY.md §2.1 "other observers" row.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ...maths.transforms import apply_rotation, apply_transform


def ortho_get_rays(xy: jnp.ndarray, c2w: jnp.ndarray, *, width: float,
                   height: float, W: int, H: int
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Orthographic camera: parallel rays along +z, origins on the sensor
    plane (reference OrthoCamera). xy: [..., 2] pixel coords."""
    sx = (xy[..., 0] / W - 0.5) * width
    sy = (xy[..., 1] / H - 0.5) * height
    o_cam = jnp.stack([sx, sy, jnp.zeros_like(sx)], -1)
    d_cam = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), o_cam.shape)
    rays_o = apply_transform(c2w, o_cam)
    rays_d = apply_rotation(c2w, d_cam)
    return rays_o, rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)


def panorama_get_rays(xy: jnp.ndarray, c2w: jnp.ndarray, *, W: int, H: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Equirectangular panorama: pixel -> (azimuth, elevation) -> ray
    (reference PanoramaCamera). Azimuth in [-pi, pi), elevation in
    [-pi/2, pi/2]; camera frame x right, y down, z forward."""
    az = (xy[..., 0] / W - 0.5) * 2.0 * jnp.pi
    el = -(xy[..., 1] / H - 0.5) * jnp.pi
    d_cam = jnp.stack([jnp.cos(el) * jnp.sin(az),
                       -jnp.sin(el),
                       jnp.cos(el) * jnp.cos(az)], -1)
    rays_d = apply_rotation(c2w, d_cam)
    rays_o = jnp.broadcast_to(c2w[..., :3, 3], rays_d.shape)
    return rays_o, rays_d


def panorama_project(pts_cam: jnp.ndarray, *, W: int, H: int
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-space points -> panorama pixels + range."""
    r = jnp.linalg.norm(pts_cam, axis=-1)
    az = jnp.arctan2(pts_cam[..., 0], pts_cam[..., 2])
    el = jnp.arcsin(jnp.clip(-pts_cam[..., 1] / jnp.clip(r, 1e-9), -1, 1))
    u = (az / (2 * jnp.pi) + 0.5) * W
    v = (0.5 - el / jnp.pi) * H
    return jnp.stack([u, v], -1), r
