"""Ray / primitive intersection tests (batched, jit-friendly).

TPU-native equivalent of the reference's CUDA ``ray_test`` path
(``nr3d_lib.models.spatial.AABBSpace.ray_test`` — SURVEY.md §2.9 spatial row;
consumed at single_volume_renderer.py:238). Instead of returning a compacted
list of hit rays (dynamic shape), we return per-ray (near, far, hit-mask) with
static shapes; downstream sampling simply masks missed rays.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def ray_aabb_intersect(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    aabb_min,
    aabb_max,
    t_min: float = 0.0,
    t_max: float = 1e10,
    eps: float = 1e-10,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Slab-method ray/AABB intersection.

    rays_o, rays_d: [..., 3]; aabb_{min,max}: broadcastable [..., 3] or [3].
    Returns (near [...,], far [...,], hit [...,] bool). For missed rays
    near/far are clamped to (t_min, t_min) so downstream masked sampling stays
    NaN-free.
    """
    aabb_min = jnp.asarray(aabb_min)
    aabb_max = jnp.asarray(aabb_max)
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < eps, jnp.where(rays_d >= 0, eps, -eps), rays_d)
    t0 = (aabb_min - rays_o) * inv_d
    t1 = (aabb_max - rays_o) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_near = jnp.maximum(t_near, t_min)
    t_far = jnp.minimum(t_far, t_max)
    hit = t_far > t_near
    near = jnp.where(hit, t_near, t_min)
    far = jnp.where(hit, t_far, t_min)
    return near, far, hit


def ray_sphere_intersect(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    center=0.0,
    radius: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Ray/sphere intersection; same (near, far, hit) contract as AABB.

    Needed by the inverted-sphere background ("Distant" NeRF++ models,
    reference nr3d_lib.models.fields_distant — SURVEY.md §2.9) and bounding-
    sphere frustum culling.
    """
    oc = rays_o - jnp.asarray(center)
    b = jnp.sum(oc * rays_d, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius**2
    disc = b * b - c
    hit = disc > 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    near = jnp.where(hit, -b - sq, 0.0)
    far = jnp.where(hit, -b + sq, 0.0)
    hit = hit & (far > 0)
    near = jnp.maximum(near, 0.0)
    return jnp.where(hit, near, 0.0), jnp.where(hit, far, 0.0), hit
