"""Forest-of-blocks space + NeuS for large-scale scenes.

TPU-native re-design of ``nr3d_lib.models.spatial.ForestBlockSpace`` and
``fields_forest.LoTDForestNeuSModel`` (reference — SURVEY.md §2.9
fields_forest row; assets app/models/large/neus.py:27,31): the scene is a
sparse set of unit blocks on a coarse lattice, each with its own encoding
table slice (shared hash table + block index in the hash key here — the
batched-table trick reused), letting one model scale to kilometer scenes.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .neus import NeuSField
from .spatial import AABBSpace
from ..ops.ray import ray_aabb_intersect

Params = Dict[str, Any]


class ForestBlockSpace:
    """Sparse lattice of occupied unit blocks.

    block_coords: [B, 3] integer lattice coords of occupied blocks;
    block_size: world edge length of one block.
    """

    def __init__(self, block_coords: np.ndarray, block_size: float = 25.0,
                 origin=(0.0, 0.0, 0.0)):
        self.block_coords = np.asarray(block_coords, np.int32).reshape(-1, 3)
        self.block_size = float(block_size)
        self.origin = np.asarray(origin, np.float32)
        self.n_blocks = len(self.block_coords)
        # dense lookup over the bounding lattice for O(1) point->block
        lo = self.block_coords.min(0)
        hi = self.block_coords.max(0)
        self._lat_lo = lo
        dims = hi - lo + 1
        lut = -np.ones(dims, np.int32)
        for i, c in enumerate(self.block_coords - lo):
            lut[tuple(c)] = i
        self._lut = jnp.asarray(lut)
        self._lat_dims = dims
        mn = self.origin + lo * self.block_size
        mx = self.origin + (hi + 1) * self.block_size
        self.aabb = AABBSpace(mn, mx)

    @classmethod
    def from_points(cls, pts: np.ndarray, block_size: float = 25.0,
                    origin=(0.0, 0.0, 0.0)) -> "ForestBlockSpace":
        """Build occupied blocks from a point cloud / camera track (the
        reference's prepare_dense_grids analog)."""
        c = np.unique(np.floor((pts - np.asarray(origin)) / block_size
                               ).astype(np.int32), axis=0)
        return cls(c, block_size, origin)

    # -- queries ---------------------------------------------------------------
    def block_of(self, x: jnp.ndarray) -> jnp.ndarray:
        """World points [..., 3] -> block index [-1 if outside]."""
        c = jnp.floor((x - self.origin) / self.block_size).astype(jnp.int32)
        rel = c - jnp.asarray(self._lat_lo)
        inside = jnp.all((rel >= 0) & (rel < jnp.asarray(self._lat_dims)), -1)
        rel = jnp.clip(rel, 0, jnp.asarray(self._lat_dims) - 1)
        idx = self._lut[rel[..., 0], rel[..., 1], rel[..., 2]]
        return jnp.where(inside, idx, -1)

    def normalize_coords(self, x: jnp.ndarray, bidx: jnp.ndarray) -> jnp.ndarray:
        """Per-block [0,1]^3 local coords."""
        corner = self.origin + jnp.take(
            jnp.asarray(self.block_coords, jnp.float32), jnp.maximum(bidx, 0),
            axis=0) * self.block_size
        return (x - corner) / self.block_size

    def ray_test(self, rays_o, rays_d, near=None, far=None):
        n, f, hit = self.aabb.ray_test(rays_o, rays_d, near=near, far=far)
        return n, f, hit

    def uniform_points(self, key, n: int) -> jnp.ndarray:
        kb, kx = jax.random.split(key)
        bi = jax.random.randint(kb, (n,), 0, self.n_blocks)
        u = jax.random.uniform(kx, (n, 3))
        corner = self.origin + jnp.take(
            jnp.asarray(self.block_coords, jnp.float32), bi, axis=0) * self.block_size
        return corner + u * self.block_size

    @property
    def center(self):
        return self.aabb.center

    @property
    def half_extent(self):
        return self.aabb.half_extent

    @property
    def aabb_min(self):
        return self.aabb.aabb_min

    @property
    def aabb_max(self):
        return self.aabb.aabb_max


class ForestNeuSField(NeuSField):
    """NeuS over a ForestBlockSpace: the encoding is batched per block
    (shared hash budget, block index folded into the table row) — reference
    ``LoTDForestNeuSModel``."""

    def __init__(self, forest: ForestBlockSpace, **neus_kw):
        neus_kw.setdefault("encoding_cfg", {"n_levels": 8, "base_res": 8,
                                            "max_res": 256,
                                            "log2_hashmap_size": 15})
        super().__init__(forest.aabb, geometry="lotd", **neus_kw)
        self.forest = forest

    def init(self, key) -> Params:
        p = super().init(key)
        # batched tables: one per block
        p["encoding"] = self.encoding.init_batched(
            jax.random.fold_in(key, 99), self.forest.n_blocks)
        return p

    def _sdf_feat_impl(self, params, x, max_level, bidx=None, cond=None):
        blk = self.forest.block_of(x)
        u = self.forest.normalize_coords(x, blk)
        h = self.encoding(params["encoding"], u, bidx=jnp.maximum(blk, 0),
                          max_level=max_level)
        out = self.decoder(params["decoder"], h)
        sdf = out[..., 0] * self.sdf_scale
        # outside any block: large positive SDF (empty space)
        sdf = jnp.where(blk >= 0, sdf, self.forest.block_size)
        return sdf, out[..., 1:]
