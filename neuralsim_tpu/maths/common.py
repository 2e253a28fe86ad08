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


def depth_fill_in_fast(depth, max_depth: float = 100.0,
                       extrapolate: bool = False, blur_ksize: int = 5):
    """Classical fast depth completion (Ku et al. 2018): densify a sparse
    depth image (0 = missing) by inverted-depth morphology. Reference analog:
    ``nr3d_lib.maths.depth_fill_in_fast`` (SURVEY.md §2.9 maths row; used to
    densify projected LiDAR depth for visualization). Pure numpy (host-side
    preprocessing/vis only — never inside jit).

    Steps: invert valid depths -> dilate (5x5 diamond) -> close (5x5 full)
    -> fill small holes (7x7 dilation) -> optional full-image fill -> median
    blur-ish smoothing -> invert back.
    """
    import numpy as np

    d = np.asarray(depth, np.float32).copy()
    valid = d > 0.1
    d[valid] = max_depth - d[valid]            # invert: near = large

    def dilate(img, kernel):
        kh, kw = kernel.shape
        ph, pw = kh // 2, kw // 2
        pad = np.pad(img, ((ph, ph), (pw, pw)), mode="constant")
        win = np.lib.stride_tricks.sliding_window_view(pad, (kh, kw))
        masked = np.where(kernel[None, None].astype(bool), win, -np.inf)
        return masked.max(axis=(-2, -1))

    diamond = np.array([[0, 0, 1, 0, 0], [0, 1, 1, 1, 0], [1, 1, 1, 1, 1],
                        [0, 1, 1, 1, 0], [0, 0, 1, 0, 0]], np.uint8)
    full5 = np.ones((5, 5), np.uint8)
    full7 = np.ones((7, 7), np.uint8)

    d = np.where(d > 0.1, dilate(d, diamond), 0.0)
    # morphological close: dilate then erode (erode = -dilate(-x) on valid)
    dc = dilate(d, full5)
    er = -dilate(np.where(dc > 0.1, -dc, -np.inf), full5)
    d = np.where(np.isfinite(er), er, 0.0)
    # fill empty pixels from a wider dilation
    filled = dilate(d, full7)
    d = np.where(d < 0.1, np.where(filled > 0.1, filled, d), d)
    if extrapolate:
        # column-wise: extend the topmost valid value upward
        for c in range(d.shape[1]):
            rows = np.flatnonzero(d[:, c] > 0.1)
            if rows.size:
                d[:rows[0], c] = d[rows[0], c]
        big = dilate(d, np.ones((31, 31), np.uint8))
        d = np.where(d < 0.1, np.where(big > 0.1, big, d), d)
    # light smoothing on valid pixels (box blur)
    if blur_ksize > 1:
        k = np.ones((blur_ksize, blur_ksize), np.float32)
        ph = blur_ksize // 2
        padv = np.pad(np.where(d > 0.1, d, 0.0), ph, mode="constant")
        padm = np.pad((d > 0.1).astype(np.float32), ph, mode="constant")
        wv = np.lib.stride_tricks.sliding_window_view(padv, k.shape)
        wm = np.lib.stride_tricks.sliding_window_view(padm, k.shape)
        s = (wv * k).sum((-2, -1))
        c = (wm * k).sum((-2, -1))
        sm = np.where(c > 0, s / np.maximum(c, 1.0), 0.0)
        d = np.where(d > 0.1, sm, d)
    out = np.where(d > 0.1, max_depth - d, 0.0)  # invert back
    return out


def safe_norm(x, axis=-1, keepdims=False, eps: float = 1e-12):
    """Denormal-safe L2 norm (round-5 NaN root cause, VERDICT r5 item 1a).

    TPU hardware flushes subnormal fp32 to zero: for a tiny-but-nonzero
    vector (e.g. analytic CP-jacobian nablas in feature-flat regions —
    products of three small slopes land below ~1e-38), ``jnp.linalg.norm``
    computes ``sqrt(sum_sq)`` with ``sum_sq`` flushed to 0, and its backward
    ``x / norm`` becomes 0/0 = NaN — multiplied by a zero cotangent it still
    poisons the whole gradient (NaN * 0 = NaN). The same replay is clean on
    CPU, where denormals survive: this was the round-4 flagship's
    "transient NaN" divergence. ``eps**2`` inside the sqrt keeps both
    passes finite (gradient -> x/eps -> ~0 for tiny x).
    """
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps * eps)


def safe_normalize(x, axis=-1, eps: float = 1e-12):
    """x / safe_norm(x): unit vectors with finite forward AND backward for
    zero/subnormal inputs on denormal-flushing hardware."""
    return x / safe_norm(x, axis=axis, keepdims=True, eps=eps)
