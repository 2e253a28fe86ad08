"""Space abstractions: AABB space (+ batched), inverted-sphere background space.

TPU-native equivalent of ``nr3d_lib.models.spatial`` (``AABBSpace``,
``BatchedBlockSpace``, ``ForestBlockSpace`` — SURVEY.md §2.9). A "space"
owns the model's bounding volume: coordinate normalization into the
encoding's [0,1]^d domain, and the ``ray_test`` (ray/volume intersection)
that seeds sampling. All static-shape: misses are masked, never compacted.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..ops.ray import ray_aabb_intersect


class AABBSpace:
    """Axis-aligned box space. ``aabb`` = (min [3], max [3])."""

    def __init__(self, aabb_min=(-1.0, -1.0, -1.0), aabb_max=(1.0, 1.0, 1.0)):
        self.aabb_min = jnp.asarray(aabb_min, jnp.float32)
        self.aabb_max = jnp.asarray(aabb_max, jnp.float32)

    @property
    def center(self):
        return 0.5 * (self.aabb_min + self.aabb_max)

    @property
    def half_extent(self):
        return 0.5 * (self.aabb_max - self.aabb_min)

    @property
    def radius3d(self):
        return jnp.linalg.norm(self.half_extent)

    def normalize_coords(self, x: jnp.ndarray) -> jnp.ndarray:
        """World/object coords -> [0,1]^3 for grid encodings."""
        return (x - self.aabb_min) / (self.aabb_max - self.aabb_min)

    def unnormalize_coords(self, u: jnp.ndarray) -> jnp.ndarray:
        return u * (self.aabb_max - self.aabb_min) + self.aabb_min

    def contains(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.all((x >= self.aabb_min) & (x <= self.aabb_max), axis=-1)

    def ray_test(self, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                 near: Optional[jnp.ndarray] = None, far: Optional[jnp.ndarray] = None,
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Per-ray (near, far, hit) against the box (reference
        ``AABBSpace.ray_test`` consumed at single_volume_renderer.py:238)."""
        t_min = 0.0
        t_max = 1e10
        n, f, hit = ray_aabb_intersect(rays_o, rays_d, self.aabb_min, self.aabb_max,
                                       t_min=t_min, t_max=t_max)
        if near is not None:
            n = jnp.maximum(n, near)
        if far is not None:
            f = jnp.minimum(f, far)
        hit = hit & (f > n)
        return n, f, hit

    def uniform_points(self, key, n: int) -> jnp.ndarray:
        """Uniform samples inside the box (for eikonal / sparsity losses)."""
        import jax
        u = jax.random.uniform(key, (n, 3))
        return self.unnormalize_coords(u)

    def scaled(self, factor: float) -> "AABBSpace":
        c, h = self.center, self.half_extent
        return AABBSpace(c - h * factor, c + h * factor)


class BatchedAABBSpace:
    """Per-instance AABB spaces sharing one normalized domain.

    The analog of ``BatchedBlockSpace`` used by categorical shared models
    (reference batched_neus.py:321-365 builds a shared box with average
    aspect ratio). aabb_min/max: [B, 3].
    """

    def __init__(self, aabb_min: jnp.ndarray, aabb_max: jnp.ndarray):
        self.aabb_min = jnp.asarray(aabb_min, jnp.float32)
        self.aabb_max = jnp.asarray(aabb_max, jnp.float32)

    def normalize_coords(self, x: jnp.ndarray, bidx: jnp.ndarray) -> jnp.ndarray:
        mn = self.aabb_min[bidx]
        mx = self.aabb_max[bidx]
        return (x - mn) / (mx - mn)

    def ray_test(self, rays_o: jnp.ndarray, rays_d: jnp.ndarray, bidx: jnp.ndarray):
        mn = self.aabb_min[bidx]
        mx = self.aabb_max[bidx]
        return ray_aabb_intersect(rays_o, rays_d, mn, mx)


def contract_inverted_cuboid(x: jnp.ndarray, center: jnp.ndarray,
                             half: jnp.ndarray) -> jnp.ndarray:
    """NeRF++ ``fixed_cuboid_shells`` parameterization (reference distant
    config: distant_mode fixed_cuboid_shells, radius_scale_min 1 —
    withmask_withlidar_joint.240219.yaml:19-23): shells are SCALED COPIES OF
    THE CLOSE-RANGE CUBOID, so every point with cuboid-radius ρ < 1 (i.e.
    inside the cr AABB) aliases to the ρ=1 shell — the distant field CANNOT
    represent content inside the close-range volume. This is the constraint
    that keeps the background model from stealing the road (r3
    street-collapse bisect). Returns [..., 4] = (unit-shell coords, 1/ρ).
    """
    xc = (x - center) / half
    rho = jnp.max(jnp.abs(xc), axis=-1, keepdims=True)
    # Project with the UNCLIPPED radius so interior points (rho < 1) land on
    # the rho=1 shell; only the inverse-depth channel is clipped to the shell.
    shell = xc / jnp.maximum(rho, 1e-9)
    inv = 1.0 / jnp.maximum(rho, 1.0)
    return jnp.concatenate([shell, inv], axis=-1)


def contract_inverted_sphere(x: jnp.ndarray, inner_radius: float = 1.0) -> jnp.ndarray:
    """NeRF++ inverted-sphere parameterization for background ("Distant")
    models: points with r > R map to (x/r * (2 - R/r) style contraction).

    We use the 4D (x', y', z', R/r) representation the reference's
    ``fields_distant`` models consume (SURVEY.md §2.9 fields_distant row):
    unit direction * 1 plus inverse radius channel, all bounded in [-1,1]x[0,1].
    Returns [..., 4].
    """
    r = jnp.linalg.norm(x, axis=-1, keepdims=True)
    r = jnp.clip(r, inner_radius)
    unit = x / r
    inv_r = inner_radius / r
    return jnp.concatenate([unit, inv_r], axis=-1)
