"""Monocular-cue losses: scale/shift-invariant depth (patch-based) + normals.

TPU-native re-design of ``app/loss/mono.py`` (reference — SURVEY.md §2.4 +
App. B mono rows): ``MonoDepthLoss`` (:248) solves per-patch scale/shift
against the monocular depth prior (MonoSDF-style least squares) or uses
Pearson correlation (:160); gradient (smoothness) regularizer included;
``MonoNormalLoss`` (:425) is L1 + cosine on view-space normals. Mask
erosion is a separable min-filter (kornia-free).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .recon import reduce
from ..maths.common import safe_normalize
from .core import _w


def erode_mask(mask: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """Binary erosion with a 3x3 structuring element (separable min filter).
    mask: [..., H, W] float/bool."""
    m = mask.astype(jnp.float32)
    for _ in range(iterations):
        m_pad = jnp.pad(m, [(0, 0)] * (m.ndim - 2) + [(1, 1), (1, 1)],
                        constant_values=0.0)
        # min over the 3x3 neighborhood via stacked shifts
        shifts = [m_pad[..., i:i + m.shape[-2], j:j + m.shape[-1]]
                  for i in range(3) for j in range(3)]
        m = jnp.min(jnp.stack(shifts, 0), 0)
    return m


def solve_scale_shift(pred: jnp.ndarray, target: jnp.ndarray,
                      mask: jnp.ndarray, eps: float = 1e-6
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form least-squares (s, b) minimizing ||s*pred + b - target||²
    over masked pixels, per leading batch element (the MonoSDF alignment)."""
    m = mask.astype(jnp.float32)
    n = jnp.sum(m, axis=(-2, -1), keepdims=True)
    sp = jnp.sum(m * pred, axis=(-2, -1), keepdims=True)
    st = jnp.sum(m * target, axis=(-2, -1), keepdims=True)
    spp = jnp.sum(m * pred * pred, axis=(-2, -1), keepdims=True)
    spt = jnp.sum(m * pred * target, axis=(-2, -1), keepdims=True)
    det = n * spp - sp * sp
    s = jnp.where(jnp.abs(det) > eps, (n * spt - sp * st) / (det + eps), 1.0)
    b = jnp.where(n > 0, (st - s * sp) / jnp.clip(n, 1.0), 0.0)
    return s, b


def grad_regularizer(pred: jnp.ndarray, target: jnp.ndarray,
                     mask: jnp.ndarray, scales: int = 4) -> jnp.ndarray:
    """Multi-scale gradient-matching term (MiDaS-style; the reference calls
    this the more important term, docs/methods/streetsurf.md:498-505)."""
    total = jnp.asarray(0.0)
    p, t, m = pred, target, mask.astype(jnp.float32)
    for s in range(scales):
        diff = (p - t) * m
        gx = jnp.abs(diff[..., :, 1:] - diff[..., :, :-1]) \
            * m[..., :, 1:] * m[..., :, :-1]
        gy = jnp.abs(diff[..., 1:, :] - diff[..., :-1, :]) \
            * m[..., 1:, :] * m[..., :-1, :]
        total = total + (jnp.sum(gx) + jnp.sum(gy)) / jnp.clip(jnp.sum(m), 1.0)
        if s + 1 < scales:
            p = p[..., ::2, ::2]
            t = t[..., ::2, ::2]
            m = m[..., ::2, ::2]
    return total


def mono_depth_loss(pred_depth: jnp.ndarray, mono_depth: jnp.ndarray,
                    mask: jnp.ndarray, it, cfg: Dict) -> jnp.ndarray:
    """Patch-wise scale/shift-invariant monocular depth supervision.

    pred_depth/mono_depth/mask: [B, H, W] patches (the image_patch step).
    cfg: {w, fn_type: monosdf|pearson, erode: int, alpha_grad_reg, ...}.
    """
    if cfg.get("erode", 0):
        mask = erode_mask(mask, cfg["erode"]) > 0.5
    m = mask.astype(jnp.float32)
    fn_type = cfg.get("fn_type", "monosdf")
    if fn_type == "pearson":
        # reference PearsonCorrDepthLoss (mono.py:160)
        def masked_mean(x):
            return jnp.sum(x * m, axis=(-2, -1)) / jnp.clip(
                jnp.sum(m, axis=(-2, -1)), 1.0)
        mp = masked_mean(pred_depth)[..., None, None]
        mt = masked_mean(mono_depth)[..., None, None]
        cov = masked_mean((pred_depth - mp) * (mono_depth - mt))
        vp = masked_mean((pred_depth - mp) ** 2)
        vt = masked_mean((mono_depth - mt) ** 2)
        corr = cov / jnp.sqrt(jnp.clip(vp * vt, 1e-8))
        data = jnp.mean(1.0 - corr)
    else:
        s, b = solve_scale_shift(mono_depth, pred_depth, mask)
        aligned = s * mono_depth + b
        data = jnp.sum(((pred_depth - aligned) ** 2) * m) / jnp.clip(jnp.sum(m), 1.0)
    loss = data
    a_grad = cfg.get("alpha_grad_reg", 0.0)
    if a_grad:
        s2, b2 = solve_scale_shift(mono_depth, jax.lax.stop_gradient(pred_depth), mask)
        loss = loss + a_grad * grad_regularizer(pred_depth,
                                                s2 * mono_depth + b2, mask)
    return loss * _w(cfg, it)


def mono_normals_loss(pred_normals: jnp.ndarray, mono_normals: jnp.ndarray,
                      mask: jnp.ndarray, it, cfg: Dict,
                      w2c_rot: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """L1 + cosine on view-space normals (reference MonoNormalLoss,
    mono.py:425-500). pred_normals: [N, 3] world-space rendered normals;
    mono_normals: [N, 3] camera-space monocular prior; w2c_rot rotates
    predictions into the camera frame."""
    if cfg.get("erode", 0) and mask.ndim >= 2:
        mask = erode_mask(mask, cfg["erode"]) > 0.5
    n_pred = pred_normals
    if w2c_rot is not None:
        n_pred = jnp.einsum("...ij,...j->...i", w2c_rot, n_pred)
    n_pred = safe_normalize(n_pred)
    n_gt = mono_normals / jnp.clip(
        jnp.linalg.norm(mono_normals, axis=-1, keepdims=True), 1e-8)
    l1 = jnp.sum(jnp.abs(n_pred - n_gt), axis=-1)
    cos = 1.0 - jnp.sum(n_pred * n_gt, axis=-1)
    m = mask.astype(jnp.float32).reshape(l1.shape)
    loss = reduce(l1 + cos, m, "mean")
    return loss * _w(cfg, it)
