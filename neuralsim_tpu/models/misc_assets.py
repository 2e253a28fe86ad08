"""Misc assets: color transform postprocessor, forest street, visible grid.

TPU-native equivalents of ``app/models/misc/color_transform.py:20``
(per-ray appearance/exposure postprocess — consumed at
single_volume_renderer.py:462-465), ``app/models/large/neus.py`` forest
assets, and ``app/visible_grid.py`` (SURVEY.md §2.2/§2.6).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .asset_base import AssetAssignment, AssetModel
from ..fields.blocks import MLP


class ColorTransform(AssetModel):
    """Per-frame learned affine color transform: rgb' = M(fi) @ rgb + b(fi)
    (self-calibrating exposure/white balance; reference ColorTransform)."""

    assignment = AssetAssignment.SCENE

    def populate(self, scene=None, obj_ids=None) -> None:
        self.n_frames = scene.n_frames if scene else self.model_params.get("n_frames", 1)
        self.field = self  # self-owned params

    def init(self, key) -> Dict:
        eye = jnp.tile(jnp.eye(3)[None], (self.n_frames, 1, 1))
        return {"M": eye, "b": jnp.zeros((self.n_frames, 3))}

    def apply(self, params: Dict, rgb: jnp.ndarray, fi: jnp.ndarray) -> jnp.ndarray:
        """rgb [N, 3], fi [N] -> transformed rgb (clipped to [0,1])."""
        M = jnp.take(params["M"], fi, axis=0, mode="clip")
        b = jnp.take(params["b"], fi, axis=0, mode="clip")
        return jnp.clip(jnp.einsum("nij,nj->ni", M, rgb) + b, 0.0, 1.0)


class LoTDForestNeuSStreet(AssetModel):
    """Large-scale street via forest-of-blocks (reference large/neus.py:31)."""

    assignment = AssetAssignment.SCENE

    def populate(self, scene=None, obj_ids=None) -> None:
        from ..fields.forest import ForestBlockSpace, ForestNeuSField
        mp = self.model_params
        if "block_coords" in mp:
            forest = ForestBlockSpace(np.asarray(mp["block_coords"]),
                                      mp.get("block_size", 25.0))
        elif scene is not None:
            pts = []
            for oid in scene.observer_ids():
                node = scene.observers[oid]
                T = np.asarray(node.frame_data["transform"])
                valid = np.asarray(node.frame_data["valid"])
                if valid.any():
                    pts.append(T[valid, :3, 3])
            pts = np.concatenate(pts, 0) if pts else np.zeros((1, 3))
            forest = ForestBlockSpace.from_points(pts, mp.get("block_size", 25.0))
        else:
            forest = ForestBlockSpace(np.zeros((1, 3), np.int32))
        self.field = ForestNeuSField(
            forest,
            encoding_cfg=mp.get("encoding_cfg", {"n_levels": 8, "base_res": 8,
                                                 "max_res": 256,
                                                 "log2_hashmap_size": 15}),
            geo_feat_dim=mp.get("geo_feat_dim", 15),
            radiance_hidden=mp.get("radiance_hidden", 64))
        self.query_cfg = dict(mp.get("query_cfg", {}))


class VisibleGrid:
    """Accumulates visible voxels from rendered depth maps (reference
    app/visible_grid.py:299): voxelize the back-projected depth points,
    morphological-dilate, export."""

    def __init__(self, aabb_min, aabb_max, resolution: int = 128):
        self.aabb_min = np.asarray(aabb_min, np.float32)
        self.aabb_max = np.asarray(aabb_max, np.float32)
        self.res = resolution
        self.grid = np.zeros((resolution,) * 3, bool)

    def add_depth_points(self, rays_o: np.ndarray, rays_d: np.ndarray,
                         depth: np.ndarray, mask: Optional[np.ndarray] = None):
        pts = rays_o + depth[..., None] * rays_d
        if mask is not None:
            pts = pts[mask]
        u = (pts - self.aabb_min) / (self.aabb_max - self.aabb_min)
        inside = np.all((u >= 0) & (u < 1), -1)
        c = np.clip((u[inside] * self.res).astype(int), 0, self.res - 1)
        self.grid[c[:, 0], c[:, 1], c[:, 2]] = True

    def dilate(self, iterations: int = 1):
        from scipy.ndimage import binary_dilation
        self.grid = binary_dilation(self.grid, iterations=iterations)

    def save(self, path: str):
        coords = np.stack(np.nonzero(self.grid), -1).astype(np.int32)
        np.savez_compressed(path, occ_corners=coords,
                            sidelength=np.array([self.res] * 3, np.int32),
                            aabb_min=self.aabb_min, aabb_max=self.aabb_max)

    def erode(self, iterations: int = 1):
        from scipy.ndimage import binary_erosion
        self.grid = binary_erosion(self.grid, iterations=iterations)

    def pyramid(self) -> list:
        """Occupancy mip pyramid (coarse->fine): the dense analog of the
        reference's octree accel over the visible grid
        (app/visible_grid.py:299) — level l voxel is occupied iff any child
        is. Level 0 is 1^3; the last level is the full grid."""
        levels = [self.grid]
        g = self.grid
        while g.shape[0] > 1:
            r = g.shape[0] // 2
            g = g.reshape(r, 2, r, 2, r, 2).any((1, 3, 5))
            levels.append(g)
        return levels[::-1]

    def carve_frustum(self, intr: np.ndarray, c2w: np.ndarray,
                      hw, near: float = 0.0, far: float = np.inf):
        """Keep only voxels inside one camera frustum (logical AND over calls
        carves to the multi-view visible hull — the reference's
        frustum-culling pass)."""
        H, W = hw
        idx = np.stack(np.meshgrid(*([np.arange(self.res)] * 3),
                                   indexing="ij"), -1) + 0.5
        x = self.aabb_min + idx / self.res * (self.aabb_max - self.aabb_min)
        w2c = np.linalg.inv(c2w)
        xc = x.reshape(-1, 3) @ w2c[:3, :3].T + w2c[:3, 3]
        z = xc[:, 2]
        uv = (xc[:, :2] / np.clip(z[:, None], 1e-9, None)) @ \
            np.asarray(intr)[:2, :2].T + np.asarray(intr)[:2, 2]
        ok = ((z > near) & (z < far) & (uv[:, 0] >= 0) & (uv[:, 0] < W)
              & (uv[:, 1] >= 0) & (uv[:, 1] < H))
        self.grid &= ok.reshape(self.grid.shape)
