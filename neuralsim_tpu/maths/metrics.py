"""Image metrics: PSNR, SSIM (and LPIPS when weights are available).

TPU-native equivalent of ``nr3d_lib.models.loss.ssim`` / ``lpipsPyTorch`` /
``PSNR`` consumed by the eval tools (reference eval.py:265-316 — SURVEY.md
§2.6). SSIM follows Wang et al. 2004 with the standard 11x11 gaussian
window. LPIPS requires pretrained VGG weights; in this zero-egress image it
is reported as None unless a weights file is supplied.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def psnr_np(pred: np.ndarray, gt: np.ndarray, max_val: float = 1.0) -> float:
    mse = float(np.mean((np.asarray(pred, np.float64) - np.asarray(gt, np.float64)) ** 2))
    if mse <= 1e-12:
        return 99.0
    return 10.0 * np.log10(max_val ** 2 / mse)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def _filter2d_sep(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable 'valid' convolution over the leading two axes."""
    from scipy.ndimage import convolve1d
    out = convolve1d(img, k, axis=0, mode="reflect")
    out = convolve1d(out, k, axis=1, mode="reflect")
    return out


def ssim_np(pred: np.ndarray, gt: np.ndarray, max_val: float = 1.0,
            window_size: int = 11, sigma: float = 1.5) -> float:
    """Mean SSIM over channels. pred/gt: [H, W, C] (or [H, W]) in [0, max]."""
    p = np.asarray(pred, np.float64)
    g = np.asarray(gt, np.float64)
    if p.ndim == 2:
        p, g = p[..., None], g[..., None]
    k = _gaussian_window(window_size, sigma)
    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2
    mu_p = _filter2d_sep(p, k)
    mu_g = _filter2d_sep(g, k)
    mu_pp = mu_p * mu_p
    mu_gg = mu_g * mu_g
    mu_pg = mu_p * mu_g
    sig_p = _filter2d_sep(p * p, k) - mu_pp
    sig_g = _filter2d_sep(g * g, k) - mu_gg
    sig_pg = _filter2d_sep(p * g, k) - mu_pg
    ssim_map = ((2 * mu_pg + C1) * (2 * sig_pg + C2)) / \
        ((mu_pp + mu_gg + C1) * (sig_p + sig_g + C2))
    return float(ssim_map.mean())


def lpips_np(pred: np.ndarray, gt: np.ndarray,
             weights_path: Optional[str] = None) -> Optional[float]:
    """LPIPS perceptual distance. Needs pretrained backbone weights — not
    shipped in this image; returns None unless ``weights_path`` points to a
    torch state dict for torchvision-style VGG16 features."""
    if weights_path is None:
        return None
    import jax.numpy as jnp
    from ..losses.vgg import load_vgg16, lpips_pair
    convs, lins = load_vgg16(weights_path)
    p = jnp.asarray(pred, jnp.float32)
    g = jnp.asarray(gt, jnp.float32)
    if p.ndim == 3:
        p, g = p[None], g[None]
    return float(lpips_pair(convs, lins, p, g))
