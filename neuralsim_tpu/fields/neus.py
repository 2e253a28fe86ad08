"""NeuS SDF field: encoding + SDF decoder + radiance net + learned inv_s,
with the full fixed-shape hierarchical ray-query pipeline.

TPU-native re-design of the reference's NeuS model family
(``nr3d_lib.models.fields.*`` — ``LoTDNeuSModel`` / ``MlpPENeuSModel`` with
``NeusRendererMixin.ray_query`` query modes ``march`` /
``march_occ_multi_upsample_compressed``; surface catalogued in SURVEY.md §2.9,
config semantics in SURVEY.md §2 item 4 and App. D.1-D.2).

Key TPU translation (SURVEY.md §7 design table):
  * ragged packed buffers -> dense ``[N_rays, S]`` + bool mask, static S.
  * NeuS multi-stage upsampling -> fixed-count CDF inverse-transform resampling
    per stage (``num_fine`` per ``upsample_inv_s_factors`` stage), merged by a
    single per-ray sort.
  * SDF gradients (nablas) via one reverse-mode vjp over the whole sample
    batch (double-differentiable, so eikonal-through-render works).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .blocks import MLP, get_activation
from .embedders import get_embedder, sinusoidal_embedder
from .encodings.lotd import LoTDEncoding, make_lotd
from .spatial import AABBSpace
from ..ops.segment import alpha_to_vw, merge_sorted_samples, sample_pdf

Params = Dict[str, Any]


def map_chunked(fn, xs, chunk: int):
    """Apply ``fn`` over the leading axis in fixed-size chunks via lax.map.

    Bounds peak HBM for huge sample batches: XLA pads tiny trailing dims of
    gather temps up to 64x, so an unchunked 4M-point field evaluation
    requests tens of GiB (observed OOM on a 16 GiB chip). Backward becomes a
    scan accumulation — same bound. ``xs`` is a pytree whose leaves share the
    leading axis. No-op when everything fits one chunk.
    """
    leaves = jax.tree.leaves(xs)
    M = leaves[0].shape[0]
    if chunk is None or M <= chunk:
        return fn(xs)
    pad = (-M) % chunk

    def prep(a):
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)
        return a.reshape(-1, chunk, *a.shape[1:])

    out = jax.lax.map(fn, jax.tree.map(prep, xs))
    return jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:])[:M], out)


# ---------------------------------------------------------------------------
# NeuS SDF -> alpha math
# ---------------------------------------------------------------------------

def neus_alpha_from_sdf(sdf: jnp.ndarray, cos: jnp.ndarray, dist: jnp.ndarray,
                        inv_s: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Section alpha from sample SDF + directional derivative estimate.

    The NeuS (Wang et al. 2021) CDF-ratio formulation: estimate the section
    endpoint SDFs from the sample SDF and a cosine (d sdf/dt) estimate, then
    alpha = (Phi(prev) - Phi(next)) / Phi(prev) with Phi = sigmoid(inv_s * x).
    All inputs broadcast over [..., S].
    """
    est_prev = sdf - cos * dist * 0.5
    est_next = sdf + cos * dist * 0.5
    cdf_prev = jax.nn.sigmoid(est_prev * inv_s)
    cdf_next = jax.nn.sigmoid(est_next * inv_s)
    alpha = (cdf_prev - cdf_next + eps) / (cdf_prev + eps)
    return jnp.clip(alpha, 0.0, 1.0)


def neighbor_cos_estimate(t: jnp.ndarray, sdf: jnp.ndarray,
                          clip_range: Tuple[float, float] = (-1e3, 0.0)) -> jnp.ndarray:
    """Estimate d(sdf)/dt from neighboring samples (used during upsampling,
    before nablas are available). Clipped non-positive so only front-facing
    sections produce density — the official NeuS up-sample trick."""
    ds = sdf[..., 1:] - sdf[..., :-1]
    dt = jnp.clip(t[..., 1:] - t[..., :-1], 1e-6)
    cos = ds / dt
    cos = jnp.clip(cos, clip_range[0], clip_range[1])
    # pad the last sample with its neighbor's estimate
    return jnp.concatenate([cos, cos[..., -1:]], axis=-1)


def sdf_to_upsample_weights(t: jnp.ndarray, sdf: jnp.ndarray, mask: jnp.ndarray,
                            inv_s: float) -> jnp.ndarray:
    """Visibility weights for one upsampling stage at a fixed inv_s."""
    dt = jnp.concatenate([t[..., 1:] - t[..., :-1],
                          jnp.ones_like(t[..., :1]) * 1e-3], axis=-1)
    cos = neighbor_cos_estimate(t, sdf)
    alpha = neus_alpha_from_sdf(sdf, cos, dt, inv_s)
    return alpha_to_vw(alpha, mask)


# ---------------------------------------------------------------------------
# The field model
# ---------------------------------------------------------------------------

class NeuSField:
    """NeuS implicit surface with grid ('lotd') or PE-MLP ('mlp_pe') geometry.

    Reference analog: ``LoTDNeuSModel`` / ``MlpPENeuSModel`` (SURVEY.md §2.9
    fields row). The object's ``space`` (AABB) normalizes coordinates into the
    encoding domain; radiance conditions on (x, view dir SH, nablas, geo feat
    [, extra embedding h_appear]).
    """

    def __init__(self, space: AABBSpace = None, *,
                 geometry: str = "lotd",
                 encoding_cfg: Optional[Dict] = None,
                 geo_feat_dim: int = 15,
                 decoder_hidden: int = 64, decoder_depth: int = 1,
                 pe_n_freqs: int = 6, mlp_hidden: int = 256, mlp_depth: int = 8,
                 radiance_hidden: int = 64, radiance_depth: int = 2,
                 use_view_dirs: bool = True, sh_degree: int = 4,
                 use_nablas_in_radiance: bool = True,
                 appear_embed_dim: int = 0,
                 ln_inv_s_init: float = math.log(20.0),
                 inv_s_final: Optional[float] = None,
                 inv_s_anneal_start_it: int = 0,
                 inv_s_anneal_stop_it: int = 0,
                 cos_anneal_stop_it: int = 0,
                 radius_init: float = 0.5,
                 sdf_scale: float = 1.0,
                 nablas_mode: str = "auto",
                 nablas_eps: Optional[float] = None,
                 remat="auto",
                 compute_dtype: str = "float32",
                 eval_chunk="auto"):
        self.space = space or AABBSpace()
        self.geometry = geometry
        self.geo_feat_dim = geo_feat_dim
        self.use_view_dirs = use_view_dirs
        self.use_nablas = use_nablas_in_radiance
        self.appear_embed_dim = appear_embed_dim
        self.ln_inv_s_init = ln_inv_s_init
        self.inv_s_final = inv_s_final
        self.inv_s_anneal_start_it = inv_s_anneal_start_it
        self.inv_s_anneal_stop_it = inv_s_anneal_stop_it
        self.cos_anneal_stop_it = cos_anneal_stop_it
        self.sdf_scale = sdf_scale
        # 'analytic' — closed-form interpolation jacobian through the grid
        # encoding chained with one decoder vjp: replaces the 4 extra FD
        # encoding passes (5x -> ~1.5x encoding cost; measured: the encoding
        # is the whole field cost at train scale, PERF.md r2). The jacobian is
        # built from plain matmuls/gathers, so eikonal-through-render
        # second-order autodiff works. 'numerical' (tetrahedron finite
        # differences) kept as the A/B oracle; 'autodiff' for smooth MLPs.
        if nablas_mode == "auto":
            nablas_mode = "analytic" if geometry == "lotd" else "autodiff"
        self.nablas_mode = nablas_mode
        self.remat = remat  # resolved below once the encoding exists
        # 'bfloat16' runs the decoder/radiance MLP activations (and the
        # encoding->decoder feature handoff) in bf16 with fp32 params +
        # fp32 accumulation — the MXU's native mode. SDF/alpha math and
        # nablas stay fp32 (the f32 matmul accumulators are the outputs).
        self.compute_dtype = jnp.bfloat16 if compute_dtype in (
            "bfloat16", "bf16") else jnp.float32
        self.eval_chunk = eval_chunk
        self.nablas_eps = nablas_eps  # resolved after encoding construction

        if geometry == "lotd":
            self.encoding = make_lotd(encoding_cfg or {}, input_dim=3)
            dec_in = self.encoding.out_dim
            self.decoder = MLP(dec_in, 1 + geo_feat_dim, hidden=decoder_hidden,
                               depth=decoder_depth, activation="relu")
            self._geo_init_bias = radius_init
        elif geometry == "mlp_pe":
            self.pe, pe_dim = sinusoidal_embedder(pe_n_freqs, 3, include_input=True)
            self.encoding = None
            from .blocks import geometric_init_mlp
            self.decoder = geometric_init_mlp(pe_dim, 1 + geo_feat_dim,
                                              hidden=mlp_hidden, depth=mlp_depth,
                                              skips=(mlp_depth // 2,),
                                              radius_init=radius_init)
            self._geo_init_bias = 0.0
        else:
            raise ValueError(geometry)

        # 'auto' remat / eval_chunk: rematerialization + chunked evaluation
        # exist to bound the HBM of per-corner GATHER temps (hash levels) —
        # for gather-free plans (dense/CP-only LoTD) they are pure overhead
        # (measured: remat off took the all-CP flagship 209k -> 275k rays/s,
        # PERF.md r2 step 13). Hash levels (and big PE-MLPs) keep both.
        has_gather_levels = (
            self.encoding is not None
            and any(s.typ == "hash" for s in self.encoding.specs))
        if self.remat == "auto":
            self.remat = has_gather_levels or geometry == "mlp_pe"
        if self.eval_chunk in ("auto", None):
            self.eval_chunk = 65536 if (has_gather_levels
                                        or geometry == "mlp_pe") else 2_000_000

        if self.nablas_eps is None:
            if self.encoding is not None:
                # half a voxel of the finest level (eager numpy: jnp ops here
                # would become tracers when called under jit)
                import numpy as np
                finest = max(s.res for s in self.encoding.specs)
                extent = float(np.max(np.asarray(self.space.aabb_max)
                                      - np.asarray(self.space.aabb_min)))
                self.nablas_eps = max(extent / finest * 0.5, 1e-4)
            else:
                self.nablas_eps = 1e-3

        rad_in = 3 + geo_feat_dim + appear_embed_dim
        if use_view_dirs:
            self.dir_embed, dir_dim = get_embedder({"type": "sh", "degree": sh_degree})
            rad_in += dir_dim
        if use_nablas_in_radiance:
            rad_in += 3
        self.radiance_net = MLP(rad_in, 3, hidden=radiance_hidden,
                                depth=radiance_depth, activation="relu",
                                output_activation="sigmoid")

    # -- params --------------------------------------------------------------
    def init(self, key) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        p: Params = {
            "decoder": self.decoder.init(k1),
            "radiance": self.radiance_net.init(k2),
            "ln_inv_s": jnp.asarray(self.ln_inv_s_init, jnp.float32),
        }
        if self.encoding is not None:
            p["encoding"] = self.encoding.init(k3)
        return p

    # -- geometry ------------------------------------------------------------
    def _sdf_feat_impl(self, params: Params, x: jnp.ndarray,
                       max_level: Optional[jnp.ndarray],
                       bidx: Optional[jnp.ndarray] = None,
                       cond: Optional[jnp.ndarray] = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.geometry == "lotd":
            u = self.space.normalize_coords(x)
            h = self.encoding(params["encoding"], u, max_level=max_level)
            # sphere-init bias: start from an approximate sphere SDF so the
            # network has a sane initial surface (the reference pretrains to
            # capsule/road shapes explicitly; this is the zero-shot default).
            out = self.decoder(params["decoder"], h.astype(self.compute_dtype))
            sdf = out[..., 0] * self.sdf_scale
            if self._geo_init_bias:
                d_sphere = jnp.linalg.norm(x - self.space.center, axis=-1) \
                    - self._geo_init_bias * jnp.mean(self.space.half_extent)
                sdf = sdf + d_sphere
            return sdf, out[..., 1:]
        else:
            h = self.pe(x)
            out = self.decoder(params["decoder"], h)
            return out[..., 0] * self.sdf_scale, out[..., 1:]

    def query_sdf_feat(self, params: Params, x: jnp.ndarray,
                       max_level: Optional[jnp.ndarray] = None,
                       bidx: Optional[jnp.ndarray] = None,
                       cond: Optional[jnp.ndarray] = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: [..., 3] object coords -> (sdf [...], geo feature [..., F]).

        With ``remat`` the evaluation is rematerialized in the backward pass
        (jax.checkpoint) — the per-corner gather temps dominate HBM otherwise.
        """
        if self.remat:
            fn = jax.checkpoint(
                lambda p, xx, bb, cc: self._sdf_feat_impl(p, xx, max_level, bb, cc))
            return fn(params, x, bidx, cond)
        return self._sdf_feat_impl(params, x, max_level, bidx, cond)

    def query_sdf(self, params: Params, x: jnp.ndarray, **kw) -> jnp.ndarray:
        return self.query_sdf_feat(params, x, **kw)[0]

    def _fd_eps(self) -> float:
        return self.nablas_eps

    def sdf_nablas_feat(self, params: Params, x: jnp.ndarray,
                        max_level: Optional[jnp.ndarray] = None,
                        bidx: Optional[jnp.ndarray] = None,
                        cond: Optional[jnp.ndarray] = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(sdf, nablas, feat). Two nablas modes:

        'autodiff' — one reverse-mode vjp over the batch (differentiable
        again, used for smooth MLP SDFs);
        'numerical' — 4-tap tetrahedron finite differences (first-order only;
        the eikonal loss then trains through the taps, which is the standard
        formulation for hash-grid SDFs)."""
        if self.nablas_mode == "autodiff":
            def f(xx):
                return self.query_sdf_feat(params, xx, max_level=max_level,
                                           bidx=bidx, cond=cond)
            (sdf, feat), vjp_fn = jax.vjp(f, x)
            nablas, = vjp_fn((jnp.ones_like(sdf), jnp.zeros_like(feat)))
            return sdf, nablas, feat

        if self.nablas_mode == "analytic" and self.geometry == "lotd":
            def impl(params, x, bidx):
                u = self.space.normalize_coords(x)
                h, Jh = self.encoding.with_jacobian(
                    params["encoding"], u, bidx=bidx, max_level=max_level)
                out, dec_vjp = jax.vjp(
                    lambda hh: self.decoder(params["decoder"], hh),
                    h.astype(self.compute_dtype))
                sdf = out[..., 0] * self.sdf_scale
                feat = out[..., 1:]
                cot = jnp.zeros_like(out).at[..., 0].set(1.0)
                g_h, = dec_vjp(cot)                               # [..., F]
                du_dx = 1.0 / (self.space.aabb_max - self.space.aabb_min)
                nablas = jnp.einsum(
                    "...f,...fd->...d", g_h, Jh.astype(g_h.dtype),
                    preferred_element_type=jnp.float32) \
                    * du_dx * self.sdf_scale
                if self._geo_init_bias:
                    delta = x - self.space.center
                    dist = jnp.linalg.norm(delta, axis=-1, keepdims=True)
                    sdf = sdf + (dist[..., 0]
                                 - self._geo_init_bias
                                 * jnp.mean(self.space.half_extent))
                    nablas = nablas + delta / jnp.clip(dist, 1e-8)
                return sdf, nablas, feat
            if self.remat:
                impl = jax.checkpoint(impl)
            return impl(params, x, bidx)

        eps = self._fd_eps()
        # tetrahedron taps (PermutoSDF / instant-nsr practice), fused with
        # the center evaluation into ONE encoding pass
        k = jnp.asarray([[1.0, -1.0, -1.0], [-1.0, 1.0, -1.0],
                         [-1.0, -1.0, 1.0], [1.0, 1.0, 1.0]], x.dtype)
        offs = jnp.concatenate([jnp.zeros((1, 3), x.dtype), eps * k], 0)  # [5,3]
        pts = x[..., None, :] + offs                          # [..., 5, 3]
        bidx5 = None if bidx is None else jnp.broadcast_to(
            bidx[..., None], pts.shape[:-1])
        cond5 = None if cond is None else jnp.broadcast_to(
            cond[..., None, :], pts.shape[:-1] + (cond.shape[-1],))
        sdf5, feat5 = self.query_sdf_feat(params, pts, max_level=max_level,
                                          bidx=bidx5, cond=cond5)
        sdf = sdf5[..., 0]
        feat = feat5[..., 0, :]
        nablas = jnp.einsum("...k,kd->...d", sdf5[..., 1:], k) / (4.0 * eps)
        return sdf, nablas, feat

    # -- appearance ------------------------------------------------------------
    def query_radiance(self, params: Params, x: jnp.ndarray, v: jnp.ndarray,
                       nablas: jnp.ndarray, feat: jnp.ndarray,
                       h_appear: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        inputs = [x]
        if self.use_view_dirs:
            inputs.append(self.dir_embed(v))
        if self.use_nablas:
            # denormal-safe: subnormal nablas (flat-feature regions) made
            # this normalization NaN the grads on TPU (maths.common.safe_norm)
            from ..maths.common import safe_normalize
            n = safe_normalize(nablas)
            inputs.append(n)
        inputs.append(feat)
        if self.appear_embed_dim:
            if h_appear is None:
                h_appear = jnp.zeros(x.shape[:-1] + (self.appear_embed_dim,), x.dtype)
            inputs.append(jnp.broadcast_to(
                h_appear, x.shape[:-1] + (h_appear.shape[-1],)))
        return self.radiance_net(
            params["radiance"],
            jnp.concatenate(inputs, axis=-1).astype(self.compute_dtype))

    # -- inv_s control ---------------------------------------------------------
    def forward_inv_s(self, params: Params, it: Optional[jnp.ndarray] = None,
                      override: Optional[float] = None) -> jnp.ndarray:
        """Learned inv_s with optional scheduled mix toward a final value
        (reference ``var_ctrl_cfg ctrl_type: mix_linear`` — SURVEY.md App. C)
        and a hard override used for LiDAR sharpness (``forward_inv_s``
        bypass, reference render.py:320)."""
        if override is not None:
            return jnp.asarray(override, jnp.float32)
        inv_s = jnp.exp(params["ln_inv_s"])
        if it is None:
            # eval mode: use the checkpoint's stored iteration when the
            # driver provided it (ckpt.load -> field.eval_it, ADVICE r4:
            # evaluating a mid-training checkpoint at inv_s_final renders
            # at a sharpness the SDF never reached and can report
            # artificially transparent geometry)
            it = getattr(self, "eval_it", None)
        if self.inv_s_final is not None and it is None \
                and self.inv_s_anneal_stop_it > 0:
            # eval mode with unknown training stage: assume the anneal is
            # complete — render at the final sharpness
            return jnp.asarray(self.inv_s_final, jnp.float32)
        if self.inv_s_final is not None and it is not None and self.inv_s_anneal_stop_it > 0:
            # reference var_ctrl mix_linear semantics (streetsurf config
            # :149-156): the mix only BEGINS at start_it (e.g. 20% of
            # training) so the learned ln_inv_s warms up on its own first —
            # annealing from step 0 crispens alpha while geometry is still
            # coarse and measurably blows up the SDF (r3 street-collapse
            # bisect, scripts/bisect_street_collapse.py)
            start = self.inv_s_anneal_start_it
            span = max(self.inv_s_anneal_stop_it - start, 1)
            frac = jnp.clip((jnp.asarray(it, jnp.float32) - start) / span,
                            0.0, 1.0)
            inv_s = (1.0 - frac) * inv_s + frac * self.inv_s_final
        return inv_s

    def cos_anneal(self, it: Optional[jnp.ndarray]) -> jnp.ndarray:
        if it is None or self.cos_anneal_stop_it <= 0:
            return jnp.asarray(1.0)
        return jnp.clip(jnp.asarray(it, jnp.float32) / self.cos_anneal_stop_it, 0.0, 1.0)

    # -- ray query -------------------------------------------------------------
    def ray_query(self, params: Params, rays_o: jnp.ndarray, rays_d: jnp.ndarray, *,
                  key: Optional[jax.Array] = None,
                  it: Optional[jnp.ndarray] = None,
                  near: Optional[jnp.ndarray] = None,
                  far: Optional[jnp.ndarray] = None,
                  num_coarse: int = 128,
                  num_fine: Sequence[int] = (32, 32),
                  upsample_inv_s: float = 64.0,
                  upsample_inv_s_factors: Sequence[float] = (1.0, 4.0),
                  perturb: bool = True,
                  with_rgb: bool = True,
                  with_normal: bool = True,
                  proposal_no_grad: bool = True,
                  forward_inv_s: Optional[float] = None,
                  h_appear: Optional[jnp.ndarray] = None,
                  max_level: Optional[jnp.ndarray] = None,
                  bidx: Optional[jnp.ndarray] = None,
                  cond: Optional[jnp.ndarray] = None,
                  occ_t_fn=None) -> Dict[str, Any]:
        """Hierarchical NeuS ray query, fixed shapes throughout.

        Equivalent of the reference's ``march_occ_multi_upsample_compressed``
        pipeline (coarse march + multi-stage CDF upsampling at an
        ``upsample_inv_s * factors`` ladder, then one full evaluation with the
        learned inv_s) — SURVEY.md §2.9 fields row + App. D.1-D.2.

        rays_o/rays_d: [N, 3] in object coords. ``occ_t_fn`` optionally
        replaces the uniform coarse proposal with occupancy-grid-marched
        depths: called as occ_t_fn(rays_o, rays_d, near, far, num_coarse, key)
        -> (t [N, C], mask [N, C]).

        Returns a dense volume buffer (SURVEY.md App. A.2 TPU translation):
        {t, mask, alpha [N,S], rgb, nablas [N,S,3], feat, details}.
        """
        N = rays_o.shape[0]
        n_, f_, hit = self.space.ray_test(rays_o, rays_d, near=near, far=far)

        # --- coarse proposal ------------------------------------------------
        if occ_t_fn is not None:
            t, m_coarse = occ_t_fn(rays_o, rays_d, n_, f_, num_coarse, key)
            m_coarse = m_coarse & hit[:, None]
        else:
            u = jnp.linspace(0.0, 1.0, num_coarse)
            u = jnp.broadcast_to(u, (N, num_coarse))
            if perturb and key is not None:
                jit_k, key = jax.random.split(key)
                u = u + (jax.random.uniform(jit_k, (N, num_coarse)) - 0.5) / num_coarse
                u = jnp.clip(u, 0.0, 1.0)
            t = n_[:, None] + (f_ - n_)[:, None] * u
            m_coarse = jnp.broadcast_to(hit[:, None], t.shape)

        def _bx(shape):
            return None if bidx is None else jnp.broadcast_to(
                bidx[:, None], shape).reshape(-1)

        def _cx(shape):
            return None if cond is None else jnp.broadcast_to(
                cond[:, None, :], shape + (cond.shape[-1],)
                ).reshape(-1, cond.shape[-1])

        def _extras(shape):
            d = {}
            if bidx is not None:
                d["b"] = _bx(shape)
            if cond is not None:
                d["c"] = _cx(shape)
            return d

        # The proposal ladder (coarse march + upsampling) only PLACES samples;
        # the reference runs it under torch.no_grad() (NeuS up_sample). Params
        # are detached here so the coarse/upsample sdf evals cost no backward
        # — the final full evaluation below trains everything.
        prop_params = jax.lax.stop_gradient(params) if proposal_no_grad else params

        x = rays_o[:, None, :] + t[..., None] * rays_d[:, None, :]
        sdf = map_chunked(
            lambda a: self.query_sdf_feat(prop_params, a["x"], max_level=max_level,
                                          bidx=a.get("b"), cond=a.get("c"))[0],
            {"x": x.reshape(-1, 3), **_extras(x.shape[:-1])},
            self.eval_chunk).reshape(x.shape[:-1])
        mask = m_coarse

        # --- multi-stage upsampling ------------------------------------------
        for stage, (nf, fac) in enumerate(zip(num_fine, upsample_inv_s_factors)):
            w = sdf_to_upsample_weights(t, sdf, mask, upsample_inv_s * fac)
            bins = jnp.concatenate([t, jnp.maximum(f_, n_ + 1e-4)[:, None]], axis=-1)
            if key is not None:
                sk, key = jax.random.split(key)
            else:
                sk = None
            t_new = sample_pdf(bins, w, nf, key=sk, det=not perturb)
            x_new = rays_o[:, None, :] + t_new[..., None] * rays_d[:, None, :]
            sdf_new = map_chunked(
                lambda a: self.query_sdf_feat(prop_params, a["x"], max_level=max_level,
                                              bidx=a.get("b"), cond=a.get("c"))[0],
                {"x": x_new.reshape(-1, 3), **_extras(x_new.shape[:-1])},
                self.eval_chunk).reshape(x_new.shape[:-1])
            m_new = jnp.broadcast_to(hit[:, None], t_new.shape)
            # both t (invariant) and t_new (stratified sampler) are sorted
            # per ray -> rank-merge, no argsort (6 ms/stage saved, prof_r5)
            t, mask, sdf = merge_sorted_samples(
                t, t_new, (mask, m_new), (sdf, sdf_new))

        # --- final full evaluation -------------------------------------------
        x = rays_o[:, None, :] + t[..., None] * rays_d[:, None, :]
        shp = x.shape[:-1]
        sdf, nablas, feat = map_chunked(
            lambda a: self.sdf_nablas_feat(params, a["x"], max_level=max_level,
                                           bidx=a.get("b"), cond=a.get("c")),
            {"x": x.reshape(-1, 3), **_extras(shp)},
            self.eval_chunk)
        sdf = sdf.reshape(shp)
        nablas = nablas.reshape(shp + (3,))
        feat = feat.reshape(shp + (feat.shape[-1],))

        dirs = jnp.broadcast_to(rays_d[:, None, :], x.shape)
        true_cos = jnp.sum(dirs * nablas, axis=-1)
        anneal = self.cos_anneal(it)
        iter_cos = -(jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - anneal)
                     + jax.nn.relu(-true_cos) * anneal)

        dt = jnp.concatenate([t[..., 1:] - t[..., :-1],
                              jnp.ones_like(t[..., :1]) * 1e-3], axis=-1)
        inv_s = self.forward_inv_s(params, it, override=forward_inv_s)
        alpha = neus_alpha_from_sdf(sdf, iter_cos, dt, inv_s)
        alpha = jnp.where(mask, alpha, 0.0)

        buf: Dict[str, Any] = {"t": t, "mask": mask, "alpha": alpha,
                               "sdf": sdf, "nablas": nablas}
        if with_rgb:
            buf["rgb"] = self.query_radiance(params, x, dirs, nablas, feat,
                                             h_appear=(None if h_appear is None
                                                       else h_appear[:, None, :]))
        # near-range SDF for ClearanceLoss (reference details.near_sdf).
        # argmax(all-False mask) = 0 would leak arbitrary SDF values from
        # non-hit rays into the clearance loss — park misses at +large.
        first_valid = jnp.argmax(mask, axis=-1)
        near_sdf = jnp.take_along_axis(sdf, first_valid[:, None], axis=-1)[:, 0]
        buf["details"] = {
            "near_sdf": jnp.where(hit, near_sdf, 1e10),
            "inv_s": inv_s,
            "hit": hit, "near": n_, "far": f_,
        }
        return buf

    # -- training helpers --------------------------------------------------------
    def sample_pts_uniform(self, params: Params, key, n: int
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Uniform points in the space + (sdf, nablas) — feeds eikonal and
        sparsity losses (reference ``model.sample_pts_uniform``,
        train.py:603-613)."""
        x = self.space.uniform_points(key, n)
        sdf, nablas, _ = self.sdf_nablas_feat(params, x)
        return x, sdf, nablas
