"""Fixed-depth masked sample-buffer ops — the TPU replacement for pack_ops.

The reference's performance core is a family of CUDA "packed tensor" ops over
ragged per-ray sample lists (``nr3d_lib.graphics.pack_ops``: packed_sum /
packed_sort / packed_alpha_to_vw / merge_two_packs_sorted / interleave_linstep,
consumed by app/renderers/*; see SURVEY.md §2.9 and Appendix A.2).

On TPU, ragged layouts defeat XLA tiling, so the whole framework instead uses
**dense [N_rays, S] buffers with a boolean validity mask** (static shapes).
Every pack_op becomes a masked dense op here:

  packed_alpha_to_vw  -> alpha_to_vw            (masked exclusive cumprod)
  packed_sum/mean     -> masked_sum/masked_mean (axis=-1 reductions)
  packed_sort         -> sort_samples           (invalid lanes pushed to +inf)
  merge_two_packs_sorted / interleave_linstep
                      -> merge_sorted_buffers   (concat on S axis + one sort)

All functions are differentiable and shape-polymorphic over leading batch
dims; they jit/vmap/shard cleanly (sample axis stays on-chip, ray axis is the
sharded data axis).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def exclusive_cumprod(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Exclusive cumulative product along ``axis`` (first element = 1).

    The transmittance recurrence T_i = prod_{j<i} x_j, computed with an
    associative scan so XLA emits a log-depth parallel scan on the VPU.
    """
    incl = jax.lax.associative_scan(jnp.multiply, x, axis=axis)
    one = jnp.ones_like(jax.lax.slice_in_dim(incl, 0, 1, axis=axis))
    return jnp.concatenate(
        [one, jax.lax.slice_in_dim(incl, 0, x.shape[axis] - 1, axis=axis)], axis=axis
    )


def alpha_to_vw(alpha: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-sample alpha -> visibility weights vw_i = alpha_i * T_i.

    Masked-dense equivalent of ``packed_alpha_to_vw`` / ``ray_alpha_to_vw``
    (reference usage: single_volume_renderer.py:73-102,
    buffer_compose_renderer.py:699-714). Invalid samples contribute
    alpha=0 so they neither occlude nor emit.
    """
    if mask is not None:
        alpha = jnp.where(mask, alpha, 0.0)
    trans = exclusive_cumprod(1.0 - alpha + 1e-10, axis=-1)
    return alpha * trans


def tau_to_alpha(tau: jnp.ndarray) -> jnp.ndarray:
    """Optical thickness (sigma * dt) -> alpha."""
    return 1.0 - jnp.exp(-jnp.maximum(tau, 0.0))


def masked_sum(x: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int = -1) -> jnp.ndarray:
    """Sum over the sample axis with invalid lanes zeroed (``packed_sum``)."""
    if mask is not None:
        x = jnp.where(mask, x, 0.0)
    return jnp.sum(x, axis=axis)


def masked_mean(
    x: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int = -1, eps: float = 1e-10
) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x, axis=axis)
    s = jnp.sum(jnp.where(mask, x, 0.0), axis=axis)
    n = jnp.sum(mask, axis=axis)
    return s / jnp.clip(n, eps)


_BIG = 1e10


def sort_samples(
    t: jnp.ndarray, mask: jnp.ndarray, *payloads: jnp.ndarray
) -> Tuple[jnp.ndarray, ...]:
    """Sort samples of each ray by depth, pushing invalid lanes to the end.

    Masked-dense ``packed_sort`` (reference buffer_compose_renderer.py:686-694).
    ``t``/``mask`` are [..., S]; each payload is [..., S] or [..., S, C] and is
    gathered by the same permutation. Returns (t_sorted, mask_sorted,
    *payloads_sorted).
    """
    key = jnp.where(mask, t, _BIG)
    order = jnp.argsort(key, axis=-1)
    t_s = jnp.take_along_axis(t, order, axis=-1)
    m_s = jnp.take_along_axis(mask, order, axis=-1)
    outs = [t_s, m_s]
    for p in payloads:
        if p.ndim == t.ndim:
            outs.append(jnp.take_along_axis(p, order, axis=-1))
        else:  # trailing channel dim
            outs.append(jnp.take_along_axis(p, order[..., None], axis=-2))
    return tuple(outs)


def cross_source_vw(t: jnp.ndarray, mask: jnp.ndarray, alpha: jnp.ndarray,
                    eps: float = 1e-10) -> jnp.ndarray:
    """Exact visibility weights for an UNSORTED dense buffer — order-free
    compositing, the sort-free replacement for (sort_samples -> alpha_to_vw).

    vw_i = alpha_i * prod_{j before i} (1 - alpha_j), where "j before i"
    means (t_j, j) < (t_i, i) lexicographically (index tie-break makes the
    result identical to a stable depth sort). Computed as one fused
    compare-×-reduce per ray:

        log T_i = sum_j [j before i] * log(1 - alpha_j)

    — O(L^2) VPU work per ray with NO per-ray gathers. Measured on the v5e:
    the per-ray ``take_along_axis`` payload gathers of the sort-based merge
    cost ~13.7 ms EACH at [8192, 160] (XLA trace, fusion.44-47), while this
    whole composite is a sub-ms fused reduction. Replaces the reference's
    ``packed_sort`` + ``packed_alpha_to_vw`` pipeline
    (buffer_compose_renderer.py:686-714) for the compose renderer.

    Gradients flow through alpha (and to t only via downstream vw*t sums),
    exactly as in the sort-based formulation (sample ORDER is
    non-differentiable there too).

    Numerics: the log-space form has a 1/(1-a) gradient singularity at
    a -> 1 that the cumprod form does not (its product-rule gradient is
    division-free), so the OCCLUSION term clamps alpha at 1 - occ_cap_eps —
    an occluder then leaks at most occ_cap_eps transmittance (emission
    alpha_i itself stays exact) and the gradient is bounded by
    1/occ_cap_eps. Training with the unclamped form NaN'd within ~30 steps
    on the multi-object bench scene; with the clamp it matches the
    sort-based oracle to 1e-5 at realistic alphas.
    """
    del eps
    occ_cap_eps = 1e-3
    a = jnp.where(mask, jnp.clip(alpha, 0.0, 1.0), 0.0)
    log1ma = jnp.log1p(-jnp.minimum(a, 1.0 - occ_cap_eps))  # [..., L], <= 0
    key = jnp.where(mask, t, _BIG)
    ki = key[..., :, None]                                  # t_i
    kj = key[..., None, :]                                  # t_j
    idx = jnp.arange(t.shape[-1])
    before = (kj < ki) | ((kj == ki) & (idx[None, :] < idx[:, None]))
    log_T = jnp.sum(jnp.where(before, log1ma[..., None, :], 0.0), axis=-1)
    return a * jnp.exp(log_T)


def merge_sorted_samples(
    t_a: jnp.ndarray, t_b: jnp.ndarray,
    *payload_pairs: Tuple[jnp.ndarray, jnp.ndarray],
) -> Tuple[jnp.ndarray, ...]:
    """Merge two per-ray ASCENDING-sorted sample sets without an argsort.

    Gather-free TPU merge for the upsample ladder: ``t_a`` [..., A] and
    ``t_b`` [..., B] must each be sorted ascending along the last axis
    (``t_b`` e.g. from the stratified ``sample_pdf``). Each payload pair
    ``(p_a [..., A], p_b [..., B])`` is merged by the same permutation.

    Ranks come from pairwise compares (A*B tiny), placement from one-hot
    einsum scatters — ties keep a-before-b, matching a stable argsort over
    ``concat([t_a, t_b])``. Measured vs sort_samples at [8192, 16+8]: 6.2 ms
    -> ~0 ms (fuses away; scripts/prof_r5.py, bit-exact on the same inputs).
    Equivalent role: reference packed_sort on merged packs
    (buffer_compose_renderer.py:686-694) for the two-sorted-inputs case.
    """
    A = t_a.shape[-1]
    B = t_b.shape[-1]
    S = A + B
    pos_a = jnp.arange(A) + jnp.sum(
        t_b[..., None, :] < t_a[..., :, None], -1)            # [..., A]
    pos_b = jnp.arange(B) + jnp.sum(
        t_a[..., :, None] <= t_b[..., None, :], -2)           # [..., B]
    iota = jnp.arange(S)
    oh_a = (pos_a[..., None] == iota).astype(t_a.dtype)       # [..., A, S]
    oh_b = (pos_b[..., None] == iota).astype(t_a.dtype)       # [..., B, S]

    def scatter(a, b):
        if a.dtype == jnp.bool_:
            m = (jnp.einsum("...as,...a->...s", oh_a, a.astype(t_a.dtype))
                 + jnp.einsum("...bs,...b->...s", oh_b, b.astype(t_a.dtype)))
            return m > 0.5
        return (jnp.einsum("...as,...a->...s", oh_a, a)
                + jnp.einsum("...bs,...b->...s", oh_b, b))

    outs = [scatter(t_a, t_b)]
    for (p_a, p_b) in payload_pairs:
        outs.append(scatter(p_a, p_b))
    return tuple(outs)


def merge_sorted_buffers(
    buffers: Sequence[dict], payload_keys: Sequence[str] = ("alpha",)
) -> dict:
    """Merge K per-model sample buffers into one depth-ordered buffer.

    Masked-dense equivalent of ``merge_two_packs_sorted`` +
    ``interleave_linstep`` + global ``packed_sort`` (reference
    single_volume_renderer.py:337-407, buffer_compose_renderer.py:649-694).

    Each buffer is a dict with 't' [..., S_k], 'mask' [..., S_k] and payload
    arrays ([..., S_k] or [..., S_k, C]). Buffers are concatenated on the
    sample axis then sorted once per ray — O(S log S) on the VPU, no ragged
    scatter needed.
    """
    t = jnp.concatenate([b["t"] for b in buffers], axis=-1)
    mask = jnp.concatenate([b["mask"] for b in buffers], axis=-1)
    payloads = []
    for k in payload_keys:
        parts = [b[k] for b in buffers]
        axis = -1 if parts[0].ndim == t.ndim else -2
        payloads.append(jnp.concatenate(parts, axis=axis))
    sorted_all = sort_samples(t, mask, *payloads)
    out = {"t": sorted_all[0], "mask": sorted_all[1]}
    for k, v in zip(payload_keys, sorted_all[2:]):
        out[k] = v
    # Provenance: which source buffer each lane came from (for per-obj
    # decomposition, reference vw_in_total machinery).
    src = jnp.concatenate(
        [jnp.full(b["t"].shape, i, dtype=jnp.int32) for i, b in enumerate(buffers)],
        axis=-1,
    )
    order = jnp.argsort(jnp.where(mask, t, _BIG), axis=-1)
    out["src"] = jnp.take_along_axis(src, order, axis=-1)
    return out


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    key: Optional[jax.Array] = None,
    det: bool = False,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Inverse-transform sample ``n_samples`` new depths per ray from a
    piecewise-constant PDF over ``bins``.

    This is the NeuS/NeRF hierarchical upsampling primitive (reference query
    mode ``march_occ_multi_upsample`` draws ``num_fine`` samples per stage,
    SURVEY.md §2.9 fields row). Static output shape [..., n_samples] — the
    fixed-count TPU formulation of adaptive importance sampling.

    bins: [..., S+1] sorted ASCENDING bin edges; weights: [..., S]
    (non-negative, invalid lanes must already be 0).

    TPU formulation: gather-free direct inverse-CDF accumulation —
    ``t(u) = bins[0] + sum_i len_i * clip((u - cdf_i)/(cdf_{i+1}-cdf_i))``
    (exact for a piecewise-linear CDF over sorted edges). Beats the
    searchsorted + 4×take_along_axis form ~2.7× on the v5e and fuses with
    the upstream occupancy probe (measured in scripts/prof_march3.py).
    Stochastic draws are STRATIFIED (jittered inverse-CDF strata), so the
    output is sorted ascending per row by construction — callers need no
    post-sort.
    """
    w = weights + eps
    csum = jnp.cumsum(w, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum], axis=-1) \
        / csum[..., -1:]                                       # [..., S+1]

    if det or key is None:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = (jnp.arange(n_samples)
             + jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))) \
            / n_samples

    # per-bin traversed fraction of each sample: [..., n_samples, S]
    c0 = cdf[..., None, :-1]
    c1 = cdf[..., None, 1:]
    seg = jnp.clip((u[..., :, None] - c0) / jnp.maximum(c1 - c0, 1e-12),
                   0.0, 1.0)
    dt = (bins[..., 1:] - bins[..., :-1])[..., None, :]
    return bins[..., :1] + jnp.sum(seg * dt, axis=-1)
