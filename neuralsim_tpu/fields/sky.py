"""Sky radiance models, queried once per ray and blended by (1 - mask_volume).

TPU-native equivalent of ``app/models/env/sky.py`` (``SimpleSky`` — a
direction-conditioned MLP, ``PureColorSky``; reference sky.py:17,57; blend
contract at single_volume_renderer.py:447-457).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .blocks import MLP
from .embedders import get_embedder

Params = Dict[str, Any]


class SimpleSky:
    """Directional MLP sky: rgb = MLP(SH(dir) [, h_appear])."""

    def __init__(self, *, hidden: int = 64, depth: int = 2, sh_degree: int = 4,
                 appear_embed_dim: int = 0):
        self.dir_embed, dir_dim = get_embedder({"type": "sh", "degree": sh_degree})
        self.appear_embed_dim = appear_embed_dim
        self.net = MLP(dir_dim + appear_embed_dim, 3, hidden=hidden, depth=depth,
                       output_activation="sigmoid")

    def init(self, key) -> Params:
        return {"net": self.net.init(key)}

    def __call__(self, params: Params, dirs: jnp.ndarray,
                 h_appear: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = self.dir_embed(dirs)
        if self.appear_embed_dim:
            if h_appear is None:
                h_appear = jnp.zeros(dirs.shape[:-1] + (self.appear_embed_dim,), dirs.dtype)
            h = jnp.concatenate([h, h_appear], axis=-1)
        return self.net(params["net"], h)


class PureColorSky:
    """Constant (optionally learnable) sky color."""

    def __init__(self, color=(1.0, 1.0, 1.0), learnable: bool = False):
        self.color = jnp.asarray(color, jnp.float32)
        self.learnable = learnable

    def init(self, key) -> Params:
        return {"color": self.color} if self.learnable else {}

    def __call__(self, params: Params, dirs: jnp.ndarray,
                 h_appear: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = params.get("color", self.color) if self.learnable else self.color
        return jnp.broadcast_to(jnp.clip(c, 0.0, 1.0), dirs.shape[:-1] + (3,))
