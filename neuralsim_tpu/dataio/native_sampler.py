"""ctypes bindings for the native (C++/OpenMP) host batch sampler.

The TPU-native analog of the reference's native data plumbing: the host
image cache is assembled into ray batches by ``native/libnsbatch.so``
(multithreaded gather + CDF importance sampling + error-map splat) instead
of single-threaded numpy fancy indexing. Falls back to the pure-numpy
samplers automatically when the library isn't built (``native/build.sh``).
"""
from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def load_native():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    native_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
    path = os.path.join(native_dir, "libnsbatch.so")
    if not os.path.isfile(path):
        # build on demand: the .so is NOT committed (a prebuilt -march=native
        # binary can SIGILL on a different machine); numpy fallback if the
        # toolchain is absent
        import subprocess
        try:
            subprocess.run(["sh", os.path.join(native_dir, "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.isfile(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.ns_version.restype = ctypes.c_int
        assert lib.ns_version() == 1
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def _ptr(a: np.ndarray, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


class NativePixelSampler:
    """Drop-in accelerated PixelSampler over a stacked image cache.

    images: [n_frames, H, W, 3] float32 (one camera); masks optional
    [n_frames, H, W] float32. Optionally importance-samples from an
    ErrorMap-compatible [n_frames, mh, mw] float64 grid.
    """

    def __init__(self, images: np.ndarray, masks: Optional[np.ndarray] = None,
                 *, seed: int = 0):
        self.lib = load_native()
        self.images = np.ascontiguousarray(images, np.float32)
        self.masks = None if masks is None else \
            np.ascontiguousarray(masks, np.float32)
        self.n_frames, self.H, self.W = images.shape[:3]
        self._seed = np.uint64(seed * 2654435761 + 12345)
        self._rng = np.random.default_rng(seed)

    def _next_seed(self) -> int:
        self._seed = np.uint64((int(self._seed) * 6364136223846793005 + 1442695040888963407) % (1 << 64))
        return int(self._seed)

    def sample(self, n_rays: int, error_map: Optional[np.ndarray] = None
               ) -> Dict[str, np.ndarray]:
        fidx = np.empty(n_rays, np.int32)
        xy = np.empty((n_rays, 2), np.int32)
        rgb = np.empty((n_rays, 3), np.float32)
        mask = np.empty(n_rays, np.float32) if self.masks is not None else None

        if self.lib is None:
            return self._numpy_fallback(n_rays, error_map)

        c = ctypes
        if error_map is not None:
            cdf = np.cumsum(np.ascontiguousarray(error_map, np.float64).ravel())
            mh, mw = error_map.shape[-2:]
            self.lib.ns_sample_pixels_weighted(
                _ptr(self.images, c.c_float),
                _ptr(self.masks, c.c_float) if self.masks is not None else None,
                _ptr(cdf, c.c_double),
                c.c_int64(self.n_frames), c.c_int64(self.H), c.c_int64(self.W),
                c.c_int64(mh), c.c_int64(mw),
                c.c_int64(n_rays), c.c_uint64(self._next_seed()),
                _ptr(fidx, c.c_int32), _ptr(xy, c.c_int32),
                _ptr(rgb, c.c_float),
                _ptr(mask, c.c_float) if mask is not None else None)
        else:
            self.lib.ns_sample_pixels(
                _ptr(self.images, c.c_float),
                _ptr(self.masks, c.c_float) if self.masks is not None else None,
                c.c_int64(self.n_frames), c.c_int64(self.H), c.c_int64(self.W),
                c.c_int64(n_rays), c.c_uint64(self._next_seed()),
                _ptr(fidx, c.c_int32), _ptr(xy, c.c_int32),
                _ptr(rgb, c.c_float),
                _ptr(mask, c.c_float) if mask is not None else None)
        out = {"rays_fidx": fidx,
               "rays_xy": xy.astype(np.float32) + 0.5,
               "rays_sel": xy[:, ::-1].copy(), "image_rgb": rgb}
        if mask is not None:
            out["image_occupancy_mask"] = mask
        return out

    def splat_error(self, error_map: np.ndarray, fidx: np.ndarray,
                    xy: np.ndarray, err: np.ndarray, ema: float = 0.9):
        if self.lib is None:
            return  # caller falls back to ErrorMap.step_error_map
        c = ctypes
        mh, mw = error_map.shape[-2:]
        self.lib.ns_splat_error_map(
            _ptr(error_map, c.c_double), c.c_int64(self.n_frames),
            c.c_int64(mh), c.c_int64(mw),
            _ptr(np.ascontiguousarray(fidx, np.int32), c.c_int32),
            _ptr(np.ascontiguousarray(xy, np.int32), c.c_int32),
            _ptr(np.ascontiguousarray(err, np.float32), c.c_float),
            c.c_int64(len(err)), c.c_int64(self.H), c.c_int64(self.W),
            c.c_double(ema))

    # -- fallback --------------------------------------------------------------
    def _numpy_fallback(self, n_rays, error_map=None):
        rng = self._rng
        if error_map is not None:
            p = np.asarray(error_map, np.float64).ravel()
            p = p / p.sum()
            cells = rng.choice(p.size, n_rays, p=p)
            mh, mw = error_map.shape[-2:]
            fidx = (cells // (mh * mw)).astype(np.int32)
            cy = (cells // mw) % mh
            cx = cells % mw
            ys = (cy * self.H // mh + rng.integers(0, max(self.H // mh, 1),
                                                   n_rays)).clip(0, self.H - 1)
            xs = (cx * self.W // mw + rng.integers(0, max(self.W // mw, 1),
                                                   n_rays)).clip(0, self.W - 1)
        else:
            fidx = rng.integers(0, self.n_frames, n_rays).astype(np.int32)
            ys = rng.integers(0, self.H, n_rays)
            xs = rng.integers(0, self.W, n_rays)
        rgb = self.images[fidx, ys, xs]
        out = {"rays_fidx": fidx,
               "rays_xy": np.stack([xs + 0.5, ys + 0.5], -1).astype(np.float32),
               "rays_sel": np.stack([ys, xs], -1), "image_rgb": rgb}
        if self.masks is not None:
            out["image_occupancy_mask"] = self.masks[fidx, ys, xs]
        return out
