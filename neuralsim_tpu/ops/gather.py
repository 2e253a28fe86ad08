"""Table gather for the grid encodings.

Default backward: XLA's native scatter-add. Measured on the v5e (r2,
PERF.md): with the fused-reduction consumers of the encoding, XLA keeps the
level tables on-chip and the duplicated-index scatter-add backward costs
~80 ms for the full field fwd+bwd at 262k points — vs ~196 ms for the
sorted-segment-sum custom VJP below (its 16 argsorts of ~1.3M rows dominate;
sorting is pathological on TPU). The r1 assumption that scatter-add
serializes was wrong at these table sizes.

The segment-sum VJP (sort by row id -> prefix-sum -> per-segment difference
with unique-index scatters) is kept as an A/B oracle behind
``NEURALSIM_SEGSUM_GATHER=1``; all shapes keep the point axis last ([F, N])
per the repo's tiling rule.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# A/B escape hatch: NEURALSIM_SEGSUM_GATHER=1 re-enables the sorted
# segment-sum custom VJP (2.4x slower on v5e, kept for parity testing)
_PLAIN = os.environ.get("NEURALSIM_SEGSUM_GATHER", "0") != "1"


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
