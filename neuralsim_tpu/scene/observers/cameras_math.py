"""Camera projection math: pinhole / OpenCV-distorted / fisheye.

TPU-native equivalent of ``nr3d_lib.graphics.cameras`` (pinhole_get_rays,
pinhole_lift, sphere_inside_frustum, pinhole_view_frustum — SURVEY.md §2.9)
and the intrinsics attributes used by app/resources/observers/cameras.py.
Everything is batched jnp, differentiable w.r.t. intrinsics and poses (needed
for self-calibration, reference LearnableParams).

Pixel convention: pixel centers at integer+0.5; ``xy`` below are *continuous*
pixel coordinates (u, v) in [0, W) x [0, H).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ...maths.transforms import apply_rotation, apply_transform


def pinhole_lift(xy: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """Lift pixels to unit-depth camera-space points.

    xy: [..., 2] pixel coords; intr: [..., 3, 3] (fx, fy, cx, cy layout).
    Returns [..., 3] with z=1 (OpenCV camera frame: x right, y down, z fwd).
    """
    fx = intr[..., 0, 0]
    fy = intr[..., 1, 1]
    cx = intr[..., 0, 2]
    cy = intr[..., 1, 2]
    sk = intr[..., 0, 1]
    y = (xy[..., 1] - cy) / fy
    x = (xy[..., 0] - cx - y * sk) / fx
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def opencv_distort(xn: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Apply OpenCV radial-tangential distortion to normalized coords [..., 2].

    dist: [..., D] with (k1, k2, p1, p2, k3[, k4, k5, k6]) — zero-padded OK.
    """
    D = dist.shape[-1]

    def get(i):
        return dist[..., i] if i < D else jnp.zeros_like(dist[..., 0])

    k1, k2, p1, p2, k3 = get(0), get(1), get(2), get(3), get(4)
    k4, k5, k6 = get(5), get(6), get(7)
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = (1 + r2 * (k1 + r2 * (k2 + r2 * k3))) / (1 + r2 * (k4 + r2 * (k5 + r2 * k6)))
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def opencv_undistort(xd: jnp.ndarray, dist: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Invert OpenCV distortion by fixed-point iteration (jit-safe, fixed
    iteration count — the reference's iterative undistort, SURVEY.md App. D.7)."""
    xn = xd
    for _ in range(iters):
        delta = opencv_distort(xn, dist) - xn
        xn = xd - delta
    return xn


def fisheye_distort(xn: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """OpenCV fisheye (equidistant) model: theta-polynomial distortion."""
    x, y = xn[..., 0], xn[..., 1]
    r = jnp.sqrt(x * x + y * y) + 1e-12
    theta = jnp.arctan(r)
    t2 = theta * theta
    k1, k2, k3, k4 = dist[..., 0], dist[..., 1], dist[..., 2], dist[..., 3]
    theta_d = theta * (1 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
    scale = theta_d / r
    return jnp.stack([x * scale, y * scale], axis=-1)


def fisheye_undistort(xd: jnp.ndarray, dist: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    x, y = xd[..., 0], xd[..., 1]
    theta_d = jnp.sqrt(x * x + y * y) + 1e-12
    theta = theta_d
    for _ in range(iters):
        t2 = theta * theta
        k1, k2, k3, k4 = dist[..., 0], dist[..., 1], dist[..., 2], dist[..., 3]
        f = theta * (1 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))) - theta_d
        df = 1 + t2 * (3 * k1 + t2 * (5 * k2 + t2 * (7 * k3 + t2 * 9 * k4)))
        theta = theta - f / df
    scale = jnp.tan(theta) / theta_d
    return jnp.stack([x * scale, y * scale], axis=-1)


def get_rays(
    xy: jnp.ndarray,
    intr: jnp.ndarray,
    c2w: jnp.ndarray,
    distortion: Optional[jnp.ndarray] = None,
    camera_model: str = "pinhole",
    normalize: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pixels -> world-space rays (origins, directions).

    The TPU analog of the reference's ``Camera.get_selected_rays`` /
    ``pinhole_get_rays`` (app/resources/observers/cameras.py:249+). Kept as a
    pure function so it can live *inside* the jitted train step — pose /
    intrinsics gradients flow (reference defers ray lifting to the trainer for
    exactly this reason, dataio/data_loader/__init__.py:22-30).

    xy [..., 2], intr [..., 3, 3] or [3,3], c2w [..., 4, 4] or [4,4].
    """
    xn = pinhole_lift(xy, jnp.asarray(intr))[..., :2]
    if camera_model == "opencv" and distortion is not None:
        xn = opencv_undistort(xn, distortion)
    elif camera_model == "fisheye" and distortion is not None:
        xn = fisheye_undistort(xn, distortion)
    dirs_cam = jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], axis=-1)
    c2w = jnp.asarray(c2w)
    rays_d = apply_rotation(c2w, dirs_cam)
    if normalize:
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(c2w[..., :3, 3], rays_d.shape)
    return rays_o, rays_d


def project(
    pts_world: jnp.ndarray,
    intr: jnp.ndarray,
    w2c: jnp.ndarray,
    distortion: Optional[jnp.ndarray] = None,
    camera_model: str = "pinhole",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World points -> (pixel xy, camera-space depth)."""
    p_cam = apply_transform(w2c, pts_world)
    z = p_cam[..., 2]
    xn = p_cam[..., :2] / jnp.clip(z[..., None], 1e-8)
    if camera_model == "opencv" and distortion is not None:
        xn = opencv_distort(xn, distortion)
    elif camera_model == "fisheye" and distortion is not None:
        xn = fisheye_distort(xn, distortion)
    fx = intr[..., 0, 0]
    fy = intr[..., 1, 1]
    cx = intr[..., 0, 2]
    cy = intr[..., 1, 2]
    u = xn[..., 0] * fx + cx
    v = xn[..., 1] * fy + cy
    return jnp.stack([u, v], axis=-1), z


def view_frustum_planes(intr: jnp.ndarray, c2w: jnp.ndarray, W: int, H: int,
                        near: float = 0.0) -> jnp.ndarray:
    """Return the 4 side planes + near plane of a pinhole frustum in world
    space as [5, 4] (normal, offset) with inward-pointing normals.

    Reference analog: ``pinhole_view_frustum`` used for frustum culling
    (cameras.py:106-233).
    """
    corners = jnp.array([[0.0, 0.0], [W, 0.0], [W, H], [0.0, H]])
    dirs_cam = pinhole_lift(corners, intr)  # [4, 3]
    o = c2w[:3, 3]
    d = apply_rotation(c2w, dirs_cam)  # [4, 3] world
    # side planes from consecutive corner ray pairs (normals point inward)
    normals = []
    for i in range(4):
        n = jnp.cross(d[(i + 1) % 4], d[i])
        normals.append(n / jnp.linalg.norm(n))
    fwd = apply_rotation(c2w, jnp.array([0.0, 0.0, 1.0]))
    planes_n = jnp.stack(normals + [fwd], axis=0)  # [5, 3]
    offsets = -jnp.einsum("pi,i->p", planes_n, o) - jnp.array([0.0, 0, 0, 0, near])
    return jnp.concatenate([planes_n, offsets[:, None]], axis=-1)


def sphere_inside_frustum(centers: jnp.ndarray, radii: jnp.ndarray,
                          planes: jnp.ndarray) -> jnp.ndarray:
    """Conservative sphere-vs-frustum test: inside/intersecting if the signed
    distance to every inward plane exceeds -radius.

    centers [..., 3], radii [...], planes [P, 4] -> bool [...].
    Reference analog: ``sphere_inside_frustum`` (cameras.py:193-233).
    """
    sd = jnp.einsum("...i,pi->...p", centers, planes[:, :3]) + planes[:, 3]
    return jnp.all(sd > -radii[..., None], axis=-1)
