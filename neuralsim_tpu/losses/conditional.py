"""Regularizers for conditional (latent- / time-conditioned) fields.

Reference ``app/loss/conditional.py``: ``LatentLoss`` (:17, realized here as
``field.latent_norm`` consumed by the trainers) and ``DeformationLoss``
(:20) — which in the reference is a *declared but empty* stub (`pass`); this
module implements its declared intent: keep the geometry of a dynamic
(time-conditioned) categorical model temporally coherent by penalizing the
rate of SDF change over time.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from .core import _w


def deformation_loss(field, params, x: jnp.ndarray, t01: jnp.ndarray, it,
                     cfg: Dict, bidx: Optional[jnp.ndarray] = None
                     ) -> jnp.ndarray:
    """Temporal-deformation regularizer for ``use_time`` fields.

    Penalizes ``E_x,t [ (d sdf / dt)^2 ]`` via a symmetric finite difference
    on the normalized time axis — large values mean the instance's geometry
    "morphs" instead of moving rigidly through the scene graph.

    x: [N, 3] canonical-space sample points; t01: [N, 1] normalized times.
    """
    dt = cfg.get("dt", 0.05)
    t_lo = jnp.clip(t01 - 0.5 * dt, 0.0, 1.0)
    t_hi = jnp.clip(t01 + 0.5 * dt, 0.0, 1.0)
    s0 = field.query_sdf(params, x, bidx=bidx, cond=t_lo)
    s1 = field.query_sdf(params, x, bidx=bidx, cond=t_hi)
    rate = (s1 - s0) / jnp.clip(t_hi - t_lo, 1e-6)[..., 0]
    return jnp.mean(rate * rate) * _w(cfg, it)
