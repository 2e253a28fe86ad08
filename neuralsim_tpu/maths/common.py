"""Small math helpers shared across fields and losses.

Reference analogs live in ``nr3d_lib.maths`` (SURVEY.md §2.9:
normalized_logistic_density, geometric_mean, chamfer_distance).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalized_logistic_density(x: jnp.ndarray, inv_s: float = 16.0) -> jnp.ndarray:
    """Logistic density normalized to peak 1 at x=0.

    Used by the sparsity loss on uniform SDF samples (reference
    app/loss/sparsity.py:20). ``4*sigmoid(s x)*sigmoid(-s x)`` peaks at 1.
    """
    sx = jax.nn.sigmoid(x * inv_s)
    return 4.0 * sx * (1.0 - sx)


def geometric_mean(x: jnp.ndarray, axis=None, eps: float = 1e-12) -> jnp.ndarray:
    return jnp.exp(jnp.mean(jnp.log(jnp.clip(x, eps)), axis=axis))


def safe_normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    return v / jnp.clip(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


def chamfer_distance(a: jnp.ndarray, b: jnp.ndarray, trim_quantile: float = None):
    """Symmetric chamfer distance between point sets a [N,3], b [M,3].

    Reference analog: ``nr3d_lib.maths.chamfer_distance`` consumed by
    eval_lidar.py (SURVEY.md §3.5; trims full/99/97/95%). Computed in chunks
    to bound memory; returns (mean_a2b, mean_b2a).
    """
    def nn_dist(x, y, chunk=4096):
        def one(xc):
            d = jnp.sum((xc[:, None, :] - y[None, :, :]) ** 2, axis=-1)
            return jnp.sqrt(jnp.min(d, axis=-1))
        n = x.shape[0]
        pad = (-n) % chunk
        xp = jnp.concatenate([x, jnp.zeros((pad, x.shape[-1]), x.dtype)], 0)
        d = jax.lax.map(one, xp.reshape(-1, chunk, x.shape[-1])).reshape(-1)[:n]
        return d

    d_ab = nn_dist(a, b)
    d_ba = nn_dist(b, a)
    if trim_quantile is not None:
        ka = jnp.quantile(d_ab, trim_quantile)
        kb = jnp.quantile(d_ba, trim_quantile)
        d_ab = jnp.where(d_ab <= ka, d_ab, 0.0)
        d_ba = jnp.where(d_ba <= kb, d_ba, 0.0)
        na = jnp.sum(d_ab > 0) + 1e-9
        nb = jnp.sum(d_ba > 0) + 1e-9
        return jnp.sum(d_ab) / na, jnp.sum(d_ba) / nb
    return jnp.mean(d_ab), jnp.mean(d_ba)
