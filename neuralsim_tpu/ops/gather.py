"""Table gather with a TPU-efficient custom backward (sorted segment-sum).

The hash-grid encodings gather feature rows from parameter tables; autodiff
turns that into a scatter-add with massively duplicated indices, which XLA
lowers poorly on TPU (serialized updates — observed as the training-step
bottleneck). This module provides ``gather_cols`` whose backward is the
classic TPU-native segment-sum recipe instead:

    sort updates by row id  ->  prefix-sum  ->  per-segment difference
    written with UNIQUE-index scatters (parallel stores).

All shapes keep the point axis last ([F, N]) per the repo's tiling rule.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# escape hatch for A/B benchmarking: NEURALSIM_PLAIN_GATHER=1 uses XLA's
# native scatter-add backward instead of the sorted segment-sum custom VJP
_PLAIN = os.environ.get("NEURALSIM_PLAIN_GATHER", "0") == "1"


def _plain_gather(tbl: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(tbl, rows, axis=1, mode="clip")


@jax.custom_vjp
def _gather_cols_segment(tbl: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    """tbl: [F, T]; rows: [N] int32 in [0, T) -> [F, N]."""
    return jnp.take(tbl, rows, axis=1, mode="clip")


def gather_cols(tbl: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    if _PLAIN:
        return _plain_gather(tbl, rows)
    return _gather_cols_segment(tbl, rows)


def _fwd(tbl, rows):
    return _gather_cols_segment(tbl, rows), (rows, tbl.shape)


def _bwd(res, g):
    rows, shape = res
    F, T = shape
    N = rows.shape[0]
    order = jnp.argsort(rows)
    r_s = rows[order]                          # [N] sorted row ids
    u_s = jnp.take(g, order, axis=1)           # [F, N] permuted updates
    csum = jnp.cumsum(u_s, axis=1)             # inclusive prefix sums

    # segment boundaries in the sorted id stream
    nxt = jnp.concatenate([r_s[1:], jnp.full((1,), -1, r_s.dtype)])
    prv = jnp.concatenate([jnp.full((1,), -1, r_s.dtype), r_s[:-1]])
    is_end = r_s != nxt                        # last entry of each segment
    is_start = r_s != prv                      # first entry of each segment

    # A[r] = csum at segment end; B[r] = csum just before segment start.
    # Each present row has exactly one end and one start -> unique scatters.
    csum_excl = jnp.concatenate([jnp.zeros((F, 1), g.dtype), csum[:, :-1]], 1)
    idx_end = jnp.where(is_end, r_s, T)        # park non-ends at a dump col
    idx_start = jnp.where(is_start, r_s, T)
    A = jnp.zeros((F, T + 1), g.dtype).at[:, idx_end].set(
        jnp.where(is_end[None, :], csum, 0.0), unique_indices=False,
        mode="drop")
    B = jnp.zeros((F, T + 1), g.dtype).at[:, idx_start].set(
        jnp.where(is_start[None, :], csum_excl, 0.0), unique_indices=False,
        mode="drop")
    dtbl = (A - B)[:, :T]
    return dtbl, None


_gather_cols_segment.defvjp(_fwd, _bwd)
