"""Reconstruction error primitives + safe variants.

TPU-native equivalent of ``nr3d_lib.models.loss.recon`` and
``nr3d_lib.models.loss.safe`` (SURVEY.md §2.9 loss row): the error-function
zoo the PhotometricLoss / DepthLoss select from by config, plus numerically
clipped "safe" losses used where the reference guards against fp16 blowups
(we run bf16/fp32 but keep the clipping semantics).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def mse(pred, gt):
    return (pred - gt) ** 2


def l1(pred, gt):
    return jnp.abs(pred - gt)


def smooth_l1(pred, gt, beta: float = 1.0):
    d = jnp.abs(pred - gt)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def huber(pred, gt, delta: float = 0.1):
    d = jnp.abs(pred - gt)
    return jnp.where(d < delta, 0.5 * d * d, delta * (d - 0.5 * delta))


def relative_l1(pred, gt, eps: float = 1e-2):
    return jnp.abs(pred - gt) / (jnp.abs(jax.lax.stop_gradient(pred)) + eps)


def relative_l2(pred, gt, eps: float = 1e-2):
    return (pred - gt) ** 2 / (jax.lax.stop_gradient(pred) ** 2 + eps)


def relative_l2_luminance(pred, gt, eps: float = 1e-2):
    # luminance-normalized relative L2 (NGP-style): normalize by per-pixel
    # luminance of the prediction.
    lum = jnp.sum(jax.lax.stop_gradient(pred) * jnp.asarray([0.299, 0.587, 0.114]),
                  axis=-1, keepdims=True)
    return (pred - gt) ** 2 / (lum ** 2 + eps)


def mape(pred, gt, eps: float = 1e-2):
    return jnp.abs(pred - gt) / (jnp.abs(gt) + eps)


def smape(pred, gt, eps: float = 1e-2):
    return jnp.abs(pred - gt) / (0.5 * (jnp.abs(pred) + jnp.abs(gt)) + eps)


def l1_log(pred, gt, eps: float = 1e-8):
    return jnp.abs(jnp.log(jnp.clip(pred, eps)) - jnp.log(jnp.clip(gt, eps)))


_FNS = {"mse": mse, "l2": mse, "l1": l1, "smooth_l1": smooth_l1, "huber": huber,
        "relative_l1": relative_l1, "relative_l2": relative_l2,
        "relative_l2_luminance": relative_l2_luminance, "mape": mape,
        "smape": smape, "l1_log": l1_log}


def get_recon_fn(name: str, **kw):
    fn = _FNS[name]
    if kw:
        return lambda p, g: fn(p, g, **kw)
    return fn


def safe_mse_loss(pred, gt, limit: float = 1.0):
    """Clipped MSE: squared error computed on the error clamped to
    [-limit, limit], so outlier samples contribute bounded value and zero
    gradient beyond the clip (reference safe_mse_loss semantics, used by
    EikonalLoss — eikonal.py:98-107)."""
    err = jnp.clip(pred - gt, -limit, limit)
    return err ** 2


def safe_binary_cross_entropy(pred, gt, eps: float = 1e-3,
                              reduction: Optional[str] = None):
    """BCE with prediction clipping (reference safe_binary_cross_entropy used
    by MaskOccupancyLoss, mask.py:19)."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    out = -(gt * jnp.log(p) + (1.0 - gt) * jnp.log(1.0 - p))
    if reduction == "mean":
        return jnp.mean(out)
    return out


def reduce(x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
           reduction: str = "mean") -> jnp.ndarray:
    """Masked reduction helper (reference nr3d_lib.models.loss.utils.reduce)."""
    if mask is not None:
        if reduction == "mean":
            return jnp.sum(x * mask) / jnp.clip(jnp.sum(mask), 1e-8)
        x = x * mask
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    return x
