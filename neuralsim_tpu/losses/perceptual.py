"""Patch-level structural losses: S3IM and (weights-gated) perceptual loss.

TPU-native equivalent of ``app/loss/perceptual.py`` (reference :24,101 —
SURVEY.md §2.4). S3IM (stochastic structural similarity, Xie et al. 2023) is
fully self-contained: SSIM over M random pixel shufflings arranged as
pseudo-patches. The VGG perceptual loss requires pretrained weights which
this zero-egress image does not ship; it activates only when a weights file
is configured.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .core import _w


def _ssim_1d(p: jnp.ndarray, g: jnp.ndarray, win: int = 4) -> jnp.ndarray:
    """SSIM over [B, H, W, C] with a uniform win x win window (stride=win)."""
    def pool(x):
        B, H, W, C = x.shape
        x = x[:, : H // win * win, : W // win * win]
        x = x.reshape(B, H // win, win, W // win, win, C)
        return jnp.mean(x, axis=(2, 4))
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    mu_p, mu_g = pool(p), pool(g)
    var_p = pool(p * p) - mu_p ** 2
    var_g = pool(g * g) - mu_g ** 2
    cov = pool(p * g) - mu_p * mu_g
    s = ((2 * mu_p * mu_g + C1) * (2 * cov + C2)) / \
        ((mu_p ** 2 + mu_g ** 2 + C1) * (var_p + var_g + C2))
    return jnp.mean(s)


def s3im_loss(pred: jnp.ndarray, gt: jnp.ndarray, it, cfg: Dict,
              key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Stochastic SSIM on shuffled ray batches (reference S3IMLoss).

    pred/gt: [N, 3] ray colors. M random permutations are tiled into
    [1, patch_h, N/patch_h * M, 3] pseudo-images and SSIM-compared.
    """
    M = cfg.get("repeats", 10)
    ph = cfg.get("patch_height", 64)
    N = pred.shape[0]
    n_keep = (N // ph) * ph
    if key is None:
        key = jax.random.PRNGKey(0)
    cols = []
    colsg = []
    for m in range(M):
        perm = jax.random.permutation(jax.random.fold_in(key, m), N)[:n_keep]
        cols.append(pred[perm].reshape(ph, -1, 3))
        colsg.append(gt[perm].reshape(ph, -1, 3))
    P = jnp.concatenate(cols, axis=1)[None]
    G = jnp.concatenate(colsg, axis=1)[None]
    return (1.0 - _ssim_1d(P, G)) * _w(cfg, it)


def perceptual_loss(pred_patch: jnp.ndarray, gt_patch: jnp.ndarray, it,
                    cfg: Dict) -> jnp.ndarray:
    """VGG16-feature perceptual loss (reference PerceptualLoss,
    app/loss/perceptual.py:24-101). Inactive (0) without pretrained weights
    (``cfg.weights_path`` — torchvision/LPIPS state dict or npz; see
    losses/vgg.py). Patches: [B, H, W, 3] (or [H, W, 3]) in [0, 1]."""
    if not cfg.get("weights_path"):
        return jnp.asarray(0.0)
    from .vgg import load_vgg16, vgg_perceptual
    convs, _ = load_vgg16(cfg["weights_path"])
    if pred_patch.ndim == 3:
        pred_patch, gt_patch = pred_patch[None], gt_patch[None]
    taps = tuple(cfg.get("taps", ("relu1_2", "relu2_2", "relu3_3")))
    return vgg_perceptual(convs, pred_patch, gt_patch, taps,
                          fn=cfg.get("fn_type", "l1")) * _w(cfg, it)
