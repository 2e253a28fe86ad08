"""Core training losses operating on the ``rendered`` dict.

TPU-native re-implementations of the reference's ``app/loss/`` modules
(SURVEY.md §2.4 + Appendix B — the loss math is documented there with
file:line citations into /root/reference). Every loss is a pure function
``(rendered/ground_truth/... , it) -> (scalar, aux)`` so the entire loss
assembly jits into the train step; per-loss annealed weights use
``training.annealers.get_anneal_val``.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .recon import get_recon_fn, reduce, safe_binary_cross_entropy, safe_mse_loss
from ..maths.common import (normalized_logistic_density, safe_norm,
                            safe_normalize)
from ..training.annealers import get_anneal_val


def _w(cfg: Dict, it, default: float = 1.0) -> jnp.ndarray:
    """Resolve a loss weight, honoring {w, anneal} config (reference
    per-loss ``w`` + annealer pattern, SURVEY.md App. B)."""
    w = cfg.get("w", default)
    if isinstance(w, dict):
        return get_anneal_val(it, **w)
    w = jnp.asarray(w, jnp.float32)
    anneal = cfg.get("anneal")
    if anneal:
        w = w * get_anneal_val(it, **anneal)
    # enable_after gates regardless of anneal (a config may combine a
    # nonzero-start anneal with a later enable_after; ADVICE r3 low)
    enable_after = cfg.get("enable_after", 0)
    if enable_after:
        w = w * (jnp.asarray(it) >= enable_after)
    return w


# ---------------------------------------------------------------------------
# Photometric
# ---------------------------------------------------------------------------

def photometric_loss(rendered: Dict, gt: Dict, it, cfg: Dict
                     ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """RGB reconstruction loss (reference photometric.py:19-145). Returns the
    scalar plus the detached per-ray error map feeding importance sampling
    (reference train.py:619-624)."""
    fn = get_recon_fn(cfg.get("fn_type", "mse"), **cfg.get("fn_param", {}))
    pred = rendered["rgb_volume"]
    target = gt["image_rgb"]
    err = fn(pred, target)  # [N, 3]
    mask = None
    if cfg.get("respect_ignore_mask", False) and "image_ignore_mask" in gt:
        mask = 1.0 - gt["image_ignore_mask"].astype(jnp.float32)
        err_mask = mask[..., None]
    else:
        err_mask = None
    loss = reduce(err, err_mask, "mean") * _w(cfg, it)
    per_ray_err = jax.lax.stop_gradient(jnp.mean(jnp.abs(pred - target), axis=-1))
    if mask is not None:
        per_ray_err = per_ray_err * mask
    return loss, {"err_map": per_ray_err}


# ---------------------------------------------------------------------------
# Mask occupancy / entropy
# ---------------------------------------------------------------------------

def mask_occupancy_loss(rendered: Dict, gt: Dict, it, cfg: Dict) -> jnp.ndarray:
    """BCE of accumulated opacity vs the GT occupancy (non-sky) mask
    (reference mask.py:18-95, modes per SURVEY.md App. B)."""
    pred = jnp.clip(rendered["mask_volume"], 0.0, 1.0)
    target = gt["image_occupancy_mask"].astype(jnp.float32)
    mode = cfg.get("mode", "bce")
    bce = safe_binary_cross_entropy(pred, target, eps=cfg.get("pred_clip", 1e-3))
    if mode == "only_cull_non_occupied":
        bce = bce * (1.0 - target)
        return jnp.sum(bce) / pred.shape[0] * _w(cfg, it)
    if mode == "only_preserve_occupied":
        bce = bce * target
        return jnp.sum(bce) / pred.shape[0] * _w(cfg, it)
    return jnp.mean(bce) * _w(cfg, it)


def mask_entropy_loss(rendered: Dict, it, cfg: Dict) -> jnp.ndarray:
    """Entropy regularizer pushing mask_volume toward 0/1 (reference
    mask_entropy.py:18, mode 'crisp*')."""
    m = jnp.clip(rendered["mask_volume"], 1e-6, 1.0 - 1e-6)
    ent = -(m * jnp.log(m) + (1.0 - m) * jnp.log(1.0 - m))
    mode = cfg.get("mode", "crisp")
    if mode == "crisp_cr" and "rendered_cr" in rendered:
        mcr = jnp.clip(rendered["rendered_cr"]["mask_volume"], 1e-6, 1.0 - 1e-6)
        ent = -(mcr * jnp.log(mcr) + (1.0 - mcr) * jnp.log(1.0 - mcr))
    return jnp.mean(ent) * _w(cfg, it)


# ---------------------------------------------------------------------------
# Geometry regularizers
# ---------------------------------------------------------------------------

def eikonal_loss(nablas: jnp.ndarray, it, cfg: Dict,
                 mask: Optional[jnp.ndarray] = None,
                 key: Optional[jax.Array] = None) -> jnp.ndarray:
    """||∇SDF|| = 1 penalty with noise perturbation + clipped safe-MSE
    (reference eikonal.py:24-107; point sources assembled by the trainer)."""
    # safe_norm, not jnp.linalg.norm: subnormal nablas NaN the backward
    # on denormal-flushing TPUs (see maths.common.safe_norm)
    norms = safe_norm(nablas, axis=-1)
    if key is not None and cfg.get("noise_std", 0.0) > 0:
        norms = norms + jax.random.normal(key, norms.shape) * cfg["noise_std"]
    err = safe_mse_loss(norms, jnp.ones_like(norms),
                        limit=cfg.get("safe_mse_limit", 5.0))
    loss = reduce(err, mask, "mean")
    if cfg.get("alpha_reg_zero", 0.0) > 0:
        loss = loss + cfg["alpha_reg_zero"] * reduce(1.0 / (0.01 + norms), mask, "mean")
    return loss * _w(cfg, it)


def sparsity_loss(sdf: jnp.ndarray, it, cfg: Dict) -> jnp.ndarray:
    """Push uniform-space SDF samples away from the zero level set (reference
    sparsity.py:20-88: normalized-logistic-density mean, annealed)."""
    typ = cfg.get("type", "normalized_logistic_density")
    if typ == "normalized_logistic_density":
        val = jnp.mean(normalized_logistic_density(sdf, cfg.get("inv_scale", 16.0)))
    elif typ == "exp_normal":
        val = jnp.mean(jnp.exp(-(sdf ** 2) / (2 * cfg.get("sigma", 0.1) ** 2)))
    else:
        raise ValueError(typ)
    return val * _w(cfg, it)


def clearance_loss(near_sdf: jnp.ndarray, it, cfg: Dict) -> jnp.ndarray:
    """Penalize near-camera SDF below a threshold — keeps free space free
    (reference clearance.py:19-95: mean(exp(-beta*(sdf-thresh))) on
    near_sdf < thresh)."""
    thresh = cfg.get("thresh", 0.001)
    beta = cfg.get("beta", 10.0)
    viol = near_sdf < thresh
    # clamp the exponent: a deeply-negative near_sdf (untrained SDF, wide
    # street AABBs) must yield a huge-but-FINITE penalty — exp overflow here
    # poisons loss_total for the whole batch before the mask applies
    pen = jnp.exp(jnp.minimum(-beta * (near_sdf - thresh), 30.0)) - 1.0
    return reduce(pen, viol.astype(jnp.float32), "mean") * _w(cfg, it)


def sdf_curvature_loss(field, params, x: jnp.ndarray, it, cfg: Dict,
                       eps: float = 1e-3, key=None) -> jnp.ndarray:
    """Second-order curvature regularizer via finite-difference of nablas in a
    random tangent direction (reference sdf_curvature.py:24; PermutoSDF-style
    curvature = angle between normals at x and x+eps*tangent)."""
    _, n0, _ = field.sdf_nablas_feat(params, x)
    if key is None:
        key = jax.random.PRNGKey(0)
    rnd = jax.random.normal(key, x.shape)
    n0u = safe_normalize(n0)
    tang = jnp.cross(n0u, rnd)
    tang = safe_normalize(tang)
    _, n1, _ = field.sdf_nablas_feat(params, x + tang * eps)
    n1u = safe_normalize(n1)
    dot = jnp.sum(n0u * n1u, axis=-1)
    return jnp.mean((dot - 1.0) ** 2) * _w(cfg, it)


def color_lipschitz_loss(lipschitz_bound: jnp.ndarray, it, cfg: Dict) -> jnp.ndarray:
    """Penalize the color net's learned Lipschitz product (reference
    color_lipshitz.py:23)."""
    return lipschitz_bound * _w(cfg, it)


def weight_reg_loss(params, it, cfg: Dict) -> jnp.ndarray:
    """Parameter p-norm decay (reference weight_reg.py:20)."""
    norm_type = cfg.get("norm_type", 2)
    leaves = jax.tree.leaves(params)
    total = sum(jnp.sum(jnp.abs(l) ** norm_type) for l in leaves if l.ndim >= 2)
    return total * _w(cfg, it)


def ray_vw_entropy_loss(vw: jnp.ndarray, mask: jnp.ndarray, it, cfg: Dict) -> jnp.ndarray:
    """Entropy on per-ray visibility weights (reference ray_vw_entropy.py:18)."""
    p = vw / jnp.clip(jnp.sum(jnp.where(mask, vw, 0.0), axis=-1, keepdims=True), 1e-8)
    ent = -jnp.sum(jnp.where(mask, p * jnp.log(jnp.clip(p, 1e-9)), 0.0), axis=-1)
    return jnp.mean(ent) * _w(cfg, it)


# ---------------------------------------------------------------------------
# LiDAR losses
# ---------------------------------------------------------------------------

def lidar_loss(rendered: Dict, gt_ranges: jnp.ndarray, it, cfg: Dict,
               buf: Optional[Dict] = None) -> Tuple[jnp.ndarray, Dict]:
    """Depth + line-of-sight LiDAR supervision (reference lidar.py:22-293;
    math per SURVEY.md App. B LiDAR row).

    Validity: mask_pred > eps AND 0 < range <= discard_toofar; outliers
    discarded above err > median * discard_outliers_median.
    """
    depth_pred = rendered["depth_volume"]
    mask_pred = rendered["mask_volume"]
    valid = (mask_pred > 1e-7) & (gt_ranges > 0.0)
    toofar = cfg.get("discard_toofar", 80.0)
    valid &= gt_ranges <= toofar
    err = jnp.abs(depth_pred - gt_ranges)
    dom = cfg.get("discard_outliers_median", 0.0)
    if dom:
        med = jnp.median(jnp.where(valid, err, 0.0))
        valid &= err <= jnp.maximum(med * dom, 1e-3)
    validf = valid.astype(jnp.float32)

    dcfg = cfg.get("depth", {})
    fn = get_recon_fn(dcfg.get("fn_type", "l1"), **dcfg.get("fn_param", {}))
    loss_depth = reduce(fn(depth_pred, gt_ranges), validf, "mean") * _w(dcfg, it)

    loss_los = jnp.asarray(0.0)
    lcfg = cfg.get("line_of_sight", {})
    if lcfg and buf is not None:
        loss_los = line_of_sight_loss(buf, gt_ranges, validf, it, lcfg)
    total = (loss_depth + loss_los) * _w(cfg, it)
    return total, {"loss_depth": loss_depth, "loss_los": loss_los,
                   "valid_frac": jnp.mean(validf)}


def line_of_sight_loss(buf: Dict, gt_ranges: jnp.ndarray, valid: jnp.ndarray,
                       it, cfg: Dict) -> jnp.ndarray:
    """Line-of-sight weight shaping along LiDAR beams.

    ``neus_unisim`` variant (reference lidar.py:175-211): penalize vw² outside
    the ±eps band around the GT depth, with eps annealed by milestones.
    ``neus_urban`` variant (lidar.py:82-126): gaussian target on vw inside the
    band + vw² empty-space penalty before GT-sigma.
    """
    from ..ops.segment import alpha_to_vw
    vw = alpha_to_vw(buf["alpha"], buf["mask"])
    t = buf["t"]
    fn_type = cfg.get("fn_type", "neus_unisim")
    eps_cfg = cfg.get("epsilon", 0.5)
    eps = get_anneal_val(it, **eps_cfg) if isinstance(eps_cfg, dict) else jnp.asarray(eps_cfg)
    g = gt_ranges[:, None]
    if fn_type == "neus_unisim":
        outside = (jnp.abs(t - g) > eps) & buf["mask"]
        pen = jnp.sum(jnp.where(outside, vw ** 2, 0.0), axis=-1)
        return reduce(pen, valid, "mean") * _w(cfg, it)
    if fn_type in ("nerf", "neus_urban"):
        sigma = eps / 3.0
        target = jnp.exp(-0.5 * ((t - g) / sigma) ** 2)
        near_band = (jnp.abs(t - g) <= eps) & buf["mask"]
        band = jnp.sum(jnp.where(near_band, (vw - target * jnp.max(
            jnp.where(near_band, vw, 0.0), axis=-1, keepdims=True)) ** 2, 0.0), axis=-1)
        before = (t < g - eps) & buf["mask"]
        empty = jnp.sum(jnp.where(before, vw ** 2, 0.0), axis=-1)
        return reduce(band + empty, valid, "mean") * _w(cfg, it)
    raise ValueError(fn_type)
