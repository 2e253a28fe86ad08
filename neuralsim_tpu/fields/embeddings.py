"""Learnable embeddings: plain tables + per-sequence timestamp-interpolated.

TPU-native equivalent of ``nr3d_lib.models.embeddings`` (``Embedding``,
``SeqEmbedding``, ``MultiSeqEmbedding*`` — SURVEY.md §2.9; consumer:
ImageEmbeddings per camera interpolated by timestamp,
app/models/scene/image_embeddings.py:64-76).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


class Embedding:
    """Plain [n, dim] embedding table (auto-decoder latents etc.)."""

    def __init__(self, n: int, dim: int, init_scale: float = 1e-2):
        self.n, self.dim, self.init_scale = n, dim, init_scale

    def init(self, key) -> Params:
        return {"weight": jax.random.normal(key, (self.n, self.dim)) * self.init_scale}

    def __call__(self, params: Params, idx: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(params["weight"], idx, axis=0, mode="clip")


class SeqEmbedding(Embedding):
    """Per-frame embedding with continuous-timestamp linear interpolation
    (reference SeqEmbedding — SURVEY.md App. D.6)."""

    def __init__(self, n_frames: int, dim: int, init_scale: float = 1e-2):
        super().__init__(n_frames, dim, init_scale)

    def at_time(self, params: Params, ts: jnp.ndarray,
                ts_table: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """ts: [...] continuous timestamps; ts_table: [n] keyframe stamps
        (defaults to 0..n-1). Linear interp between bracketing frames."""
        W = params["weight"]
        if ts_table is None:
            ts_table = jnp.arange(self.n, dtype=jnp.float32)
        hi = jnp.clip(jnp.searchsorted(ts_table, ts, side="right"), 1, self.n - 1)
        lo = hi - 1
        w = jnp.clip((ts - ts_table[lo]) / jnp.clip(ts_table[hi] - ts_table[lo], 1e-9),
                     0.0, 1.0)
        return W[lo] * (1.0 - w[..., None]) + W[hi] * w[..., None]
