"""Permutohedral-lattice hash encoding (multi-level, arbitrary input dim).

TPU-native re-design of the reference's CUDA permutohedral encoding
(``nr3d_lib.models.grid_encodings.permuto`` — ``PermutoEncoding``,
``GenerativePermutoConcat``; SURVEY.md §2.9: used by batched/dynamic
categorical models, README.md:55,113). The d-dimensional permutohedral
lattice touches only d+1 simplex vertices per point (vs 2^d cube corners),
which is why the reference uses it for high-dimensional inputs
(xyz + latent / xyz + time).

Algorithm: the classic lattice embedding (Adams et al. 2010 "Fast
High-Dimensional Filtering Using the Permutohedral Lattice"): elevate to the
sum-zero hyperplane, greedy-round to the nearest remainder-0 lattice point,
rank-sort the differential to identify the enclosing simplex, barycentric
weights from the sorted differential, spatial-hash each vertex key.

Layout: all big intermediates keep the point axis LAST ([d+1, N]) — same
TPU tiling rule as the LoTD encoding.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...ops.gather import gather_cols

_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437,
           2165219737, 2654435741)


def _hash_keys(keys: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """keys: [d, N] int32 lattice coords -> [N] rows."""
    h = keys[0].astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
    for i in range(1, keys.shape[0]):
        h = h ^ (keys[i].astype(jnp.uint32) * jnp.uint32(_PRIMES[i % len(_PRIMES)]))
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


class PermutoEncoding:
    """Multi-level permutohedral hash encoding over [0,1]^d inputs.

    levels: sequence of (resolution, n_feats) — resolution is the lattice
    scale per level (geometric ladder like NGP).
    """

    def __init__(self, input_dim: int, levels: Sequence[Tuple[int, int]] = None, *,
                 n_levels: int = 16, n_feats: int = 2,
                 base_res: float = 4.0, max_res: float = 512.0,
                 log2_hashmap_size: int = 18, param_init_scale: float = 1e-4,
                 anneal_cfg: Optional[Dict] = None):
        self.input_dim = input_dim
        self.param_init_scale = param_init_scale
        self.anneal_cfg = anneal_cfg
        self.table_size = 2 ** log2_hashmap_size
        if levels is None:
            if n_levels > 1:
                b = math.exp((math.log(max_res) - math.log(base_res)) / (n_levels - 1))
            else:
                b = 1.0
            levels = [(base_res * (b ** l), n_feats) for l in range(n_levels)]
        self.levels = [(float(r), int(f)) for r, f in levels]
        self.n_levels = len(self.levels)
        self.out_dim = sum(f for _, f in self.levels)
        # per-level offsets into one flat table
        self.offsets = []
        off = 0
        for _, f in self.levels:
            self.offsets.append(off)
            off += self.table_size * f
        self.total_params = off

        d = input_dim
        # elevation scale factors (Adams et al.)
        inv_std = math.sqrt(2.0 / 3.0) * (d + 1)
        self._sf = [1.0 / math.sqrt((i + 1) * (i + 2)) * inv_std for i in range(d)]
        # constant d(elevated)/d(pos) matrix E [d+1, d] (see _simplex):
        #   elevated[0]   = sum_c sf[c]*pos[c]
        #   elevated[i>0] = sum_{c>=i} sf[c]*pos[c] - i*sf[i-1]*pos[i-1]
        E = [[self._sf[c] for c in range(d)]]
        for i in range(1, d + 1):
            row = [self._sf[c] if c >= i else 0.0 for c in range(d)]
            row[i - 1] -= i * self._sf[i - 1]
            E.append(row)
        self._E = E  # python floats; sliced to the needed columns at trace time

    # -- params -------------------------------------------------------------
    def init(self, key) -> Dict[str, jnp.ndarray]:
        t = jax.random.uniform(key, (self.total_params,), minval=-1.0, maxval=1.0)
        return {"table": (t * self.param_init_scale).astype(jnp.float32)}

    def init_batched(self, key, n_instances: int) -> Dict[str, jnp.ndarray]:
        t = jax.random.uniform(key, (n_instances, self.total_params),
                               minval=-1.0, maxval=1.0)
        return {"table": (t * self.param_init_scale).astype(jnp.float32)}

    # -- lattice embedding ----------------------------------------------------
    def _simplex(self, pos: jnp.ndarray, jac_dims: int = 0):
        """pos: [d, N] scaled coords -> (keys [d+1][d, N], bary [d+1, N]
        [, dbary [d+1, jac_dims, N]]).

        With ``jac_dims`` > 0 also returns the analytic d(bary)/d(pos[:jd])
        — bary is linear in the elevation inside a simplex (rank/rem0 are
        locally constant), so dbary = down * oh^T E restricted to the first
        ``jac_dims`` position columns."""
        d = self.input_dim
        N = pos.shape[1]

        # elevate to sum-zero hyperplane: [d+1, N]
        elevated = [None] * (d + 1)
        sm = jnp.zeros((N,), pos.dtype)
        for i in range(d, 0, -1):
            cf = pos[i - 1] * self._sf[i - 1]
            elevated[i] = sm - i * cf
            sm = sm + cf
        elevated[0] = sm
        elevated = jnp.stack(elevated, 0)                   # [d+1, N]

        # greedy rounding to nearest remainder-0 point
        down = 1.0 / (d + 1)
        up = float(d + 1)
        v = elevated * down
        fl = jnp.floor(v) * up
        ce = jnp.ceil(v) * up
        rem0 = jnp.where(ce - elevated < elevated - fl, ce, fl)  # [d+1, N]
        sum_val = (jnp.sum(rem0, 0) * down).astype(jnp.int32)    # [N]

        # rank of each coordinate's differential. Vectorized pairwise
        # compare with index tie-break — NOT a chain of .at[i].add updates:
        # at d=11 (xyz+latent) that chain is 66 dynamic-update-slices per
        # level and sends XLA's algebraic simplifier into its circular-
        # rewrite loop (50-run cap; 41 s CPU compile for the encoding alone,
        # remote TPU compile >40 min). The [d+1, d+1, N] compare fuses to
        # one reduce. rank[i] = #{j>i: diff_i < diff_j} + #{j<i: diff_i <= diff_j}.
        diff = elevated - rem0                                    # [d+1, N]
        lt = diff[:, None, :] < diff[None, :, :]                  # [i, j, N]
        le = diff[:, None, :] <= diff[None, :, :]
        iu = jnp.arange(d + 1)
        upper = (iu[:, None] < iu[None, :])[..., None]            # j > i
        lower = (iu[:, None] > iu[None, :])[..., None]            # j < i
        rank = (jnp.sum(lt & upper, axis=1).astype(jnp.int32)
                + jnp.sum(le & lower, axis=1).astype(jnp.int32))  # [d+1, N]
        # fix for non-zero sum
        rank = rank + sum_val[None, :]
        low = rank < 0
        high = rank > d
        rank = jnp.where(low, rank + d + 1, jnp.where(high, rank - d - 1, rank))
        rem0 = jnp.where(low, rem0 + d + 1, jnp.where(high, rem0 - (d + 1), rem0))

        # barycentric coordinates from the sorted differential. NOTE: the
        # destination row differs PER POINT, so the scatter must pair
        # (row_idx[n], n) — a bare bary.at[row_idx] would be row-selection
        # with an O(N^2) broadcast (observed as a many-GiB backward alloc).
        # One-hot reduce over vertices (vectorized; the (d+2)x(d+1) where-add
        # chain costs ~300 HLO ops at d=11 and real compile time):
        # bary[r] = sum_i diff[i] * ([d - rank_i == r] - [d+1 - rank_i == r])
        diff = (elevated - rem0) * down                            # refreshed
        rr = jnp.arange(d + 2)[None, :, None]                      # [1, d+2, 1]
        oh = ((d - rank)[:, None, :] == rr).astype(pos.dtype) \
            - ((d + 1 - rank)[:, None, :] == rr).astype(pos.dtype)
        bary = jnp.sum(diff[:, None, :] * oh, axis=0)              # [d+2, N]
        bary = bary.at[0].add(1.0 + bary[d + 1])

        # simplex vertex keys: y_k = rem0 + canonical_k(rank)
        keys = []
        for k in range(d + 1):
            off = jnp.where(rank >= (d + 1 - k), k - (d + 1), k)
            keys.append((rem0 + off).astype(jnp.int32)[: d])       # drop last coord
        if not jac_dims:
            return keys, bary[: d + 1]

        # dbary_r/dpos_c = down * sum_i oh[i, r] * E[i, c]; the bary[0]
        # correction adds bary[d+1]'s row. oh is piecewise-constant (per
        # simplex), so this is exact away from simplex faces — the same
        # regime where the FD taps are valid.
        E = jnp.asarray([row[:jac_dims] for row in self._E], pos.dtype)
        dbary = down * jnp.einsum("irN,ic->rcN", oh, E)            # [d+2, jd, N]
        dbary = dbary.at[0].add(dbary[d + 1])
        return keys, bary[: d + 1], dbary[: d + 1]

    def _level_features(self, table: jnp.ndarray, x01: jnp.ndarray, li: int,
                        bidx: Optional[jnp.ndarray],
                        jac_dims: int = 0):
        res, nf = self.levels[li]
        off = self.offsets[li]
        pos = x01 * res                                            # [d, N]
        simplex = self._simplex(pos, jac_dims=jac_dims)
        keys, bary = simplex[0], simplex[1]
        sub = jax.lax.dynamic_slice_in_dim(table, off, self.table_size * nf,
                                           axis=table.ndim - 1)
        if bidx is None:
            tbl = sub.reshape(nf, self.table_size)                 # [F, size]
        else:
            B = sub.shape[0]
            tbl = sub.reshape(B, nf, self.table_size) \
                .transpose(1, 0, 2).reshape(nf, B * self.table_size)
        acc = None
        jac = None
        for k in range(self.input_dim + 1):
            rows = _hash_keys(keys[k], self.table_size)
            if bidx is not None:
                rows = bidx * self.table_size + rows
            feats = gather_cols(tbl, rows)                         # [F, N]
            term = bary[k][None, :] * feats
            acc = term if acc is None else acc + term
            if jac_dims:
                # dfeat/dpos reuses the SAME gathered feats; dpos/dx01 = res
                jterm = feats[:, None, :] * (simplex[2][k] * res)[None, :, :]
                jac = jterm if jac is None else jac + jterm        # [F, jd, N]
        if jac_dims:
            return acc, jac
        return acc

    def __call__(self, params: Dict[str, jnp.ndarray], x: jnp.ndarray,
                 bidx: Optional[jnp.ndarray] = None,
                 max_level: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """x: [..., d] in [0,1] -> [..., out_dim]."""
        lead = x.shape[:-1]
        xf = jnp.clip(x.reshape(-1, self.input_dim), 0.0, 1.0).T   # [d, N]
        bf = None if bidx is None else jnp.broadcast_to(bidx, lead).reshape(-1)
        outs = []
        for li in range(self.n_levels):
            f = self._level_features(params["table"], xf, li, bf)
            if max_level is not None:
                f = f * (li <= max_level)
            outs.append(f)
        out = jnp.concatenate(outs, 0)                             # [F_total, N]
        return out.T.reshape(lead + (self.out_dim,))

    def with_jacobian(self, params: Dict[str, jnp.ndarray], x: jnp.ndarray,
                      bidx: Optional[jnp.ndarray] = None,
                      max_level: Optional[jnp.ndarray] = None,
                      jac_dims: int = 3
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Encode AND return the analytic d(features)/dx[:jac_dims] jacobian.

        The permuto analog of the LoTD ``with_jacobian`` (the nr3d_lib CUDA
        dy_dx path): barycentric weights are linear in the elevation inside
        a simplex, so the jacobian contracts the constant ``oh^T E`` weight
        derivative with the SAME gathered vertex features — no extra table
        gathers and no FD tap passes. Only the first ``jac_dims`` input dims
        (the spatial xyz of a concat [xyz, latent, t] input) get derivative
        columns. Differentiable again, so eikonal-through-render trains.

        Returns (features [..., out_dim], jac [..., out_dim, jac_dims]) with
        jac in units of the [0,1]-normalized input domain.
        """
        lead = x.shape[:-1]
        xf = jnp.clip(x.reshape(-1, self.input_dim), 0.0, 1.0).T   # [d, N]
        bf = None if bidx is None else jnp.broadcast_to(bidx, lead).reshape(-1)
        outs, jacs = [], []
        for li in range(self.n_levels):
            f, j = self._level_features(params["table"], xf, li, bf,
                                        jac_dims=jac_dims)
            if max_level is not None:
                f = f * (li <= max_level)
                j = j * (li <= max_level)
            outs.append(f)
            jacs.append(j)
        out = jnp.concatenate(outs, 0)                             # [F_total, N]
        jac = jnp.concatenate(jacs, 0)                             # [F_total, jd, N]
        return (out.T.reshape(lead + (self.out_dim,)),
                jnp.moveaxis(jac, -1, 0).reshape(lead + (self.out_dim, jac_dims)))

    def max_level_at(self, it):
        if self.anneal_cfg is None:
            return None
        start = self.anneal_cfg.get("start_level", 2)
        stop_it = self.anneal_cfg.get("stop_it", 1)
        frac = jnp.clip(jnp.asarray(it, jnp.float32) / max(stop_it, 1), 0.0, 1.0)
        return start + frac * (self.n_levels - 1 - start)
