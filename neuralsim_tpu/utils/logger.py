"""Logger: scalars + images + stats pickling, tensorboard-optional.

TPU-native equivalent of ``nr3d_lib.logger.Logger`` (SURVEY.md §5 metrics
row: per-loss scalars, lr, grad norms, validation image galleries,
``save_stats('stats.p')``; reference usage train.py:1509-1528). Tensorboard
is used when available (torch's SummaryWriter is in this image); otherwise
falls back to JSONL + PNG dirs so the logger never blocks training.
"""
from __future__ import annotations

import json
import os
import pickle
import time
from typing import Any, Dict, Optional

import numpy as np


class Logger:
    def __init__(self, root: str, *, img_root: Optional[str] = None,
                 is_master: bool = True, monitoring: str = "auto"):
        self.root = os.path.abspath(root)
        self.img_root = img_root or os.path.join(self.root, "imgs")
        self.is_master = is_master
        self.stats: Dict[str, list] = {}
        self._tb = None
        if is_master:
            os.makedirs(self.root, exist_ok=True)
            os.makedirs(self.img_root, exist_ok=True)
            self._jsonl = open(os.path.join(self.root, "metrics.jsonl"), "a")
            if monitoring in ("auto", "tensorboard"):
                try:
                    from torch.utils.tensorboard import SummaryWriter
                    self._tb = SummaryWriter(os.path.join(self.root, "events"))
                except Exception:
                    self._tb = None
        else:
            self._jsonl = None

    # -- scalars ---------------------------------------------------------------
    def add_scalar(self, tag: str, value, step: int):
        if not self.is_master:
            return
        v = float(np.asarray(value))
        self.stats.setdefault(tag, []).append((step, v))
        if self._tb is not None:
            self._tb.add_scalar(tag, v, step)
        self._jsonl.write(json.dumps({"t": time.time(), "step": step,
                                      tag: v}) + "\n")

    def add_scalars(self, metrics: Dict[str, Any], step: int, prefix: str = ""):
        for k, v in metrics.items():
            arr = np.asarray(v)
            if arr.ndim == 0:
                self.add_scalar(prefix + k, arr, step)
        if self._jsonl:
            self._jsonl.flush()

    # -- images ----------------------------------------------------------------
    def add_image(self, tag: str, img: np.ndarray, step: int):
        """img: [H, W, 3] float in [0,1] or uint8. Written as PNG."""
        if not self.is_master:
            return
        img = np.asarray(img)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        d = os.path.join(self.img_root, tag)
        os.makedirs(d, exist_ok=True)
        _write_png(os.path.join(d, f"{step:08d}.png"), img)
        if self._tb is not None:
            self._tb.add_image(tag, img, step, dataformats="HWC")

    # -- persistence -----------------------------------------------------------
    def save_stats(self, name: str = "stats.p"):
        if self.is_master:
            with open(os.path.join(self.root, name), "wb") as f:
                pickle.dump(self.stats, f)

    def close(self):
        if self._jsonl:
            self._jsonl.flush()
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def _write_png(path: str, img: np.ndarray):
    """Minimal dependency-free PNG writer (torch/PIL may be absent on
    worker hosts); falls back to torchvision-free pure zlib encoding."""
    import struct
    import zlib

    h, w = img.shape[:2]
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    raw = b"".join(b"\x00" + img[i].tobytes() for i in range(h))

    def chunk(typ, data):
        c = struct.pack(">I", len(data)) + typ + data
        return c + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    hdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", hdr)
           + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def color_depth(depth: np.ndarray, near=None, far=None) -> np.ndarray:
    """Depth -> turbo-ish colormap RGB (reference plot.color_depth)."""
    d = np.asarray(depth, np.float32)
    near = np.nanmin(d) if near is None else near
    far = np.nanpercentile(d, 99) if far is None else far
    t = np.clip((d - near) / max(far - near, 1e-9), 0, 1)
    r = np.clip(1.5 - np.abs(2.0 * t - 1.0) * 2.0, 0, 1)
    g = np.clip(1.5 - np.abs(2.0 * t - 0.5) * 2.0, 0, 1)
    b = np.clip(1.5 - np.abs(2.0 * t) * 2.0, 0, 1)
    return np.stack([r, g, b], -1)


def scene_flow_to_rgb(flow: np.ndarray, flow_max_radius: float = 0.5,
                      plane: tuple = (0, 1)) -> np.ndarray:
    """3D scene flow -> RGB via the optical-flow color wheel on two chosen
    components (reference ``nr3d_lib.plot.scene_flow_to_rgb``, consumed at
    code_single/tools/render.py:678 for the EmerNeRF flow channels).

    Direction in the ``plane`` components -> hue; magnitude (clipped at
    ``flow_max_radius``) -> saturation; value fixed at 1 (bright background
    for zero flow).
    """
    f = np.asarray(flow, np.float32)
    fx, fy = f[..., plane[0]], f[..., plane[1]]
    mag = np.sqrt(fx * fx + fy * fy)
    ang = np.arctan2(fy, fx)                     # [-pi, pi]
    hue = (ang / (2.0 * np.pi)) % 1.0
    sat = np.clip(mag / max(flow_max_radius, 1e-9), 0.0, 1.0)
    # HSV -> RGB with V=1
    h6 = hue * 6.0
    i = np.floor(h6).astype(np.int32) % 6
    frac = h6 - np.floor(h6)
    p = 1.0 - sat
    q = 1.0 - sat * frac
    t = 1.0 - sat * (1.0 - frac)
    one = np.ones_like(sat)
    lut = np.stack([
        np.stack([one, t, p], -1), np.stack([q, one, p], -1),
        np.stack([p, one, t], -1), np.stack([p, q, one], -1),
        np.stack([t, p, one], -1), np.stack([one, p, q], -1)], 0)
    return np.take_along_axis(lut, i[None, ..., None], axis=0)[0]


def gallery(images, cols: int = 4) -> np.ndarray:
    """Tile [N, H, W, 3] images into one grid image (reference plot.gallery)."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    rows = (n + cols - 1) // cols
    out = np.zeros((rows * h, cols * w, c), images.dtype)
    for i in range(n):
        r, cc = divmod(i, cols)
        out[r * h:(r + 1) * h, cc * w:(cc + 1) * w] = images[i]
    return out
