"""Road-normal / Manhattan-assumption regularizers.

TPU-native re-design of ``app/loss/mahattan.py`` (reference
``RoadNormalLoss``/``MahattanLoss`` :20,94 — SURVEY.md §2.4): on road/ground
pixels (from semantic masks) the rendered normal should match the scene up
vector; Manhattan mode also snaps wall normals to the dominant horizontal
axes.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .core import _w
from ..maths.common import safe_normalize
from .recon import reduce


def road_normal_loss(normals: jnp.ndarray, road_mask: jnp.ndarray, it,
                     cfg: Dict, up_vec=(0.0, 0.0, 1.0)) -> jnp.ndarray:
    """1 - <n, up> on road pixels. normals [N,3] (world), road_mask [N]."""
    up = jnp.asarray(up_vec, normals.dtype)
    n = safe_normalize(normals)
    err = 1.0 - jnp.einsum("...i,i->...", n, up)
    return reduce(err, road_mask.astype(jnp.float32), "mean") * _w(cfg, it)


def manhattan_loss(normals: jnp.ndarray, wall_mask: jnp.ndarray, it,
                   cfg: Dict, up_vec=(0.0, 0.0, 1.0)) -> jnp.ndarray:
    """Wall normals should be horizontal and axis-aligned: penalize the up
    component and the deviation from the nearest horizontal axis."""
    up = jnp.asarray(up_vec, normals.dtype)
    n = normals / jnp.clip(jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-8)
    vert = jnp.einsum("...i,i->...", n, up) ** 2
    # horizontal component snapped to nearest of 4 axis directions
    h = n - jnp.einsum("...i,i->...", n, up)[..., None] * up
    hn = safe_normalize(h)
    # |cos| to the closest horizontal axis should be ~1: use max |component|
    ax = jnp.max(jnp.abs(hn), axis=-1)
    err = vert + (1.0 - ax)
    return reduce(err, wall_mask.astype(jnp.float32), "mean") * _w(cfg, it)


def cross_cr_dv_entropy_loss(rendered: Dict, it, cfg: Dict) -> jnp.ndarray:
    """``cross_cr_on_dv`` mask-entropy family (reference mask_entropy.py:80-110):
    ASYMMETRIC cross terms between the close-range and distant per-ray
    visibility masses. ``cross_cr_on_dv`` = mean(m_cr * log(m_dv)) — a
    NEGATIVE quantity whose minimization pushes the distant mass DOWN (and
    the cr mass up) on rays where close-range content fires; this is the
    disentangler that stops the background from stealing close-range
    geometry. The symmetric split entropy (mode ``split``) pushes each ray
    to commit to EITHER side — it can lock in a distant-dominant split, so
    it is not the default."""
    eps = cfg.get("eps", 1e-5)
    mcr = jnp.clip(rendered["rendered_cr"]["mask_volume"], 0.0, 1.0)
    mdv = jnp.clip(rendered["rendered_dv"]["mask_volume"], 0.0, 1.0)
    mode = cfg.get("mode", "cross_cr_on_dv")
    sg = jax.lax.stop_gradient
    if mode in ("cross_cr_on_dv", "cross_cr_detached_on_dv"):
        cr = sg(mcr) if "detached" in mode else mcr
        loss = jnp.mean(cr * jnp.log(jnp.maximum(mdv, eps)))
    elif mode in ("cross_dv_on_cr", "cross_dv_detached_on_cr"):
        dv = sg(mdv) if "detached" in mode else mdv
        loss = jnp.mean(dv * jnp.log(jnp.maximum(mcr, eps)))
    elif mode == "cross_crdv":
        loss = jnp.mean(mcr * jnp.log(jnp.maximum(mdv, eps))) \
            + jnp.mean(mdv * jnp.log(jnp.maximum(mcr, eps)))
    elif mode == "split":            # legacy symmetric split entropy
        p = mcr / jnp.clip(mcr + mdv, 1e-6)
        p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
        loss = jnp.mean(-(p * jnp.log(p) + (1.0 - p) * jnp.log(1.0 - p)))
    else:
        raise ValueError(mode)
    return loss * _w(cfg, it)
