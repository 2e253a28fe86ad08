"""VGG16 feature extractor (JAX) + LPIPS, with an external weights loader.

TPU-native equivalent of the reference's VGG-backed ``PerceptualLoss``
(app/loss/perceptual.py:24-101) and ``lpipsPyTorch`` (nr3d_lib surface,
SURVEY.md §2.9 models.loss). Pretrained weights are NOT shipped in this
zero-egress image; any of these layouts can be supplied:

  * torchvision VGG16 state dict (``features.{N}.weight/bias``), ``.pth``
  * the same arrays exported to ``.npz``
  * an LPIPS checkpoint adds ``lin{k}.model.1.weight`` 1x1 conv rows

Weights load once per path (module-level cache) and convert to HWIO for
``lax.conv_general_dilated`` on the NHWC activations TPUs prefer.
"""
from __future__ import annotations

import os
from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# torchvision VGG16 `features` indices of the 13 convolutions, and after
# which conv a 2x2 maxpool follows (ends of the 5 stages)
_VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_POOL_AFTER = {1, 3, 6, 9, 12}           # conv ordinal (0-based) -> pool next
# canonical tap names (after the ReLU of that conv ordinal)
_TAPS = {"relu1_2": 1, "relu2_2": 3, "relu3_3": 6, "relu4_3": 9,
         "relu5_3": 12}
_VGG16_CHANNELS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512,
                   512, 512, 512]

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
# LPIPS 'scaling layer' (input in [-1, 1])
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _find(state: Dict, *names) -> Optional[np.ndarray]:
    for n in names:
        if n in state:
            return _to_np(state[n])
    return None


@lru_cache(maxsize=4)
def load_vgg16(weights_path: str) -> Tuple[Tuple[Tuple, ...], Tuple]:
    """Load VGG16 conv weights (+ optional LPIPS lin heads) from a file.

    Returns ``(convs, lins)``: convs is a tuple of 13 ``(W_hwio, b)`` pairs;
    lins is a tuple of 5 per-tap 1x1 weights ``[C]`` or () when absent.
    Raises with a clear message if the file doesn't contain a VGG16 layout.
    """
    if not os.path.isfile(weights_path):
        raise FileNotFoundError(f"VGG weights not found: {weights_path}")
    if weights_path.endswith(".npz"):
        with np.load(weights_path) as z:
            state = {k: z[k] for k in z.files}
    else:
        import torch
        state = torch.load(weights_path, map_location="cpu",
                           weights_only=False)
        if hasattr(state, "state_dict"):
            state = state.state_dict()
        # unwrap common nestings ({'state_dict': ...}, lpips 'net.' prefixes)
        if "state_dict" in state and isinstance(state["state_dict"], dict):
            state = state["state_dict"]
    state = {str(k): v for k, v in state.items()}

    convs: List[Tuple[np.ndarray, np.ndarray]] = []
    for ci, fi in enumerate(_VGG16_CONV_IDX):
        w = _find(state,
                  f"features.{fi}.weight",              # torchvision
                  f"net.slice{_slice_of(ci)}.{fi}.weight",   # lpips wrapper
                  f"conv{ci}.weight")
        b = _find(state, f"features.{fi}.bias",
                  f"net.slice{_slice_of(ci)}.{fi}.bias", f"conv{ci}.bias")
        if w is None or b is None:
            raise ValueError(
                f"{weights_path}: missing VGG16 conv {ci} "
                f"(features.{fi}.weight) — supply a torchvision-layout "
                f"VGG16 or LPIPS(vgg) state dict")
        if w.shape[0] != _VGG16_CHANNELS[ci]:
            raise ValueError(f"conv {ci}: expected {_VGG16_CHANNELS[ci]} out "
                             f"channels, got {w.shape}")
        # OIHW -> HWIO
        convs.append((np.transpose(w, (2, 3, 1, 0)).astype(np.float32),
                      b.astype(np.float32)))

    lins: List[np.ndarray] = []
    for k in range(5):
        lw = _find(state, f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight",
                   f"lin{k}.weight")
        if lw is None:
            lins = []
            break
        lins.append(np.maximum(_to_np(lw).reshape(-1), 0.0).astype(np.float32))
    return tuple(convs), tuple(lins)


def _slice_of(conv_ordinal: int) -> int:
    """LPIPS wraps convs into slice1..slice5 by stage."""
    for s, last in enumerate((1, 3, 6, 9, 12)):
        if conv_ordinal <= last:
            return s + 1
    return 5


def vgg16_features(convs: Sequence[Tuple], x: jnp.ndarray,
                   taps: Sequence[str] = ("relu1_2", "relu2_2", "relu3_3"),
                   *, input_range: str = "01") -> List[jnp.ndarray]:
    """Run the VGG16 conv stack on NHWC images, returning the tapped
    activations. ``input_range``: '01' (ImageNet-normalize) or 'lpips'
    ([0,1] -> [-1,1] -> LPIPS scaling layer)."""
    if input_range == "01":
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    elif input_range == "lpips":
        x = ((2.0 * x - 1.0) - _LPIPS_SHIFT) / _LPIPS_SCALE
    else:
        raise ValueError(input_range)
    want = {_TAPS[t] for t in taps}
    last = max(want)
    feats: Dict[int, jnp.ndarray] = {}
    for ci, (w, b) in enumerate(convs):
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(w), window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x + jnp.asarray(b))
        if ci in want:
            feats[ci] = x
        if ci == last:
            break
        if ci in _POOL_AFTER:
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return [feats[_TAPS[t]] for t in taps]


def vgg_perceptual(convs: Sequence[Tuple], pred: jnp.ndarray,
                   gt: jnp.ndarray,
                   taps: Sequence[str] = ("relu1_2", "relu2_2", "relu3_3"),
                   fn: str = "l1") -> jnp.ndarray:
    """Mean feature distance between pred and gt patches [B, H, W, 3]."""
    fp = vgg16_features(convs, pred, taps)
    fg = vgg16_features(convs, jax.lax.stop_gradient(gt), taps)
    tot = jnp.asarray(0.0)
    for a, b in zip(fp, fg):
        d = a - b
        tot = tot + (jnp.mean(jnp.abs(d)) if fn == "l1"
                     else jnp.mean(d * d))
    return tot / len(fp)


def lpips_pair(convs: Sequence[Tuple], lins: Sequence[np.ndarray],
               pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance for [B, H, W, 3] images in [0, 1].

    Per tap: unit-normalize channels, squared difference, weight by the
    lin head (or channel-mean when no lin weights are present), average
    spatially, sum over taps (Zhang et al. 2018)."""
    taps = tuple(_TAPS.keys())
    fp = vgg16_features(convs, pred, taps, input_range="lpips")
    fg = vgg16_features(convs, gt, taps, input_range="lpips")
    total = jnp.asarray(0.0)
    for k, (a, b) in enumerate(zip(fp, fg)):
        na = a / jnp.sqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
        nb = b / jnp.sqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
        d2 = (na - nb) ** 2                              # [B, H, W, C]
        if lins:
            d = jnp.sum(d2 * jnp.asarray(lins[k]), -1)
        else:
            d = jnp.mean(d2, -1)
        total = total + jnp.mean(d, axis=(-2, -1))
    return jnp.mean(total)
