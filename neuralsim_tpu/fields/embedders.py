"""Coordinate embedders: sinusoidal positional encoding + spherical harmonics.

Reference analog: ``nr3d_lib.models.embedders.get_embedder`` (sinusoidal /
spherical-harmonics bases — SURVEY.md §2.9 blocks/embedders row). Pure jnp,
static shapes; SH up to degree 4 with hand-expanded polynomials so XLA fuses
it into the adjacent matmul.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp


def sinusoidal_embedder(n_freqs: int, input_dim: int = 3, include_input: bool = True,
                        max_freq_log2: float = None) -> Tuple[Callable, int]:
    """NeRF positional encoding: [x, sin(2^k x), cos(2^k x) ...].

    Returns (embed_fn, out_dim). ``embed_fn`` also accepts an optional
    ``alpha`` argument in [0, n_freqs] implementing coarse-to-fine frequency
    annealing (BARF-style window), used by LoTD-level-anneal analogs.
    """
    if n_freqs == 0:
        return (lambda x, alpha=None: x), input_dim
    max_f = (n_freqs - 1) if max_freq_log2 is None else max_freq_log2
    freqs = 2.0 ** jnp.linspace(0.0, max_f, n_freqs)
    out_dim = (2 * n_freqs) * input_dim + (input_dim if include_input else 0)

    def embed(x: jnp.ndarray, alpha=None) -> jnp.ndarray:
        xb = x[..., None, :] * freqs[:, None]  # [..., F, D]
        s, c = jnp.sin(xb), jnp.cos(xb)
        enc = jnp.stack([s, c], axis=-2)  # [..., F, 2, D]
        if alpha is not None:
            k = jnp.arange(n_freqs, dtype=jnp.float32)
            w = jnp.clip(alpha - k, 0.0, 1.0)
            w = 0.5 * (1.0 - jnp.cos(jnp.pi * w))
            enc = enc * w[:, None, None]
        enc = enc.reshape(x.shape[:-1] + (2 * n_freqs * x.shape[-1],))
        if include_input:
            enc = jnp.concatenate([x, enc], axis=-1)
        return enc

    return embed, out_dim


# Real spherical harmonics constants (same basis as Instant-NGP / tcnn).
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)


def spherical_harmonics(dirs: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Evaluate real SH basis at unit directions [..., 3] -> [..., degree**2]."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full(x.shape, _C0)]
    if degree > 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if degree > 3:
        out += [
            _C3[0] * y * (3 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4 * zz - xx - yy),
            _C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            _C3[4] * x * (4 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3 * yy),
        ]
    if degree > 4:
        raise NotImplementedError("SH degree > 4")
    return jnp.stack(out, axis=-1)


def sh_embedder(degree: int = 4) -> Tuple[Callable, int]:
    return (lambda d, alpha=None: spherical_harmonics(d, degree)), degree * degree


def get_embedder(embed_cfg: dict, input_dim: int = 3) -> Tuple[Callable, int]:
    """Config-driven embedder factory matching the reference's surface
    (``get_embedder`` — SURVEY.md §2.9)."""
    typ = embed_cfg.get("type", "none")
    if typ in ("none", "identity"):
        return (lambda x, alpha=None: x), input_dim
    if typ in ("sinusoidal", "fourier", "pe"):
        return sinusoidal_embedder(embed_cfg.get("n_frequencies", 6), input_dim,
                                   embed_cfg.get("include_input", True))
    if typ in ("spherical", "sh", "spherical_harmonics"):
        return sh_embedder(embed_cfg.get("degree", 4))
    raise ValueError(f"Unknown embedder type {typ}")
