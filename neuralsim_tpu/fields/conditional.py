"""Conditional NeuS fields: permuto geometry, latent- and time-conditioned.

TPU-native re-design of ``nr3d_lib.models.fields_conditional(_dynamic)`` /
``fields_dynamic`` (reference — SURVEY.md §2.9: ``GenerativePermutoConcatNeuSModel``
for categorical shared assets with per-instance auto-decoder latents,
``DynamicPermutoConcatNeuSModel`` for time-conditioned single objects,
``DynamicGenerativePermutoConcatNeuSModel`` for both).

Design: one class. The permutohedral encoding consumes
``concat(x01, [z01(bidx)], [t01])`` — the "concat" conditioning of the
reference — where z latents live in the params as an auto-decoder table
(``AutoDecoderMixin._latents`` analog). All the NeuS ray-query machinery
(upsampling, inv_s control, numerical nablas, chunked eval) is inherited
from NeuSField via the ``bidx``/``cond`` plumbing.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .blocks import MLP
from .embedders import get_embedder
from .encodings.permuto import PermutoEncoding
from .neus import NeuSField
from .spatial import AABBSpace

Params = Dict[str, Any]


class ConditionalPermutoNeuSField(NeuSField):
    """NeuS with permutohedral geometry over concat(x, [z], [t]).

    n_instances > 0  -> generative (per-instance latents, auto-decoder)
    use_time         -> time-conditioned (cond = normalized ts per ray [N,1])
    """

    def __init__(self, space: AABBSpace = None, *,
                 n_instances: int = 0, z_dim: int = 4,
                 use_time: bool = False,
                 permuto_cfg: Optional[Dict] = None,
                 geo_feat_dim: int = 15,
                 decoder_hidden: int = 64, decoder_depth: int = 1,
                 radiance_hidden: int = 64, radiance_depth: int = 2,
                 use_view_dirs: bool = True, sh_degree: int = 4,
                 use_nablas_in_radiance: bool = True,
                 appear_embed_dim: int = 0,
                 ln_inv_s_init: float = math.log(20.0),
                 inv_s_final: Optional[float] = None,
                 inv_s_anneal_start_it: int = 0,
                 inv_s_anneal_stop_it: int = 0,
                 cos_anneal_stop_it: int = 0,
                 radius_init: float = 0.4,
                 latent_init_scale: float = 1e-2,
                 eval_chunk: int = 65536, remat: bool = True):
        # deliberately NOT calling NeuSField.__init__ (different geometry
        # stack); set up the same attribute surface it expects.
        self.space = space or AABBSpace()
        self.geometry = "permuto_concat"
        self.geo_feat_dim = geo_feat_dim
        self.use_view_dirs = use_view_dirs
        self.use_nablas = use_nablas_in_radiance
        self.appear_embed_dim = appear_embed_dim
        self.ln_inv_s_init = ln_inv_s_init
        self.inv_s_final = inv_s_final
        self.inv_s_anneal_start_it = inv_s_anneal_start_it
        self.inv_s_anneal_stop_it = inv_s_anneal_stop_it
        self.cos_anneal_stop_it = cos_anneal_stop_it
        self.sdf_scale = 1.0
        # analytic: contract the simplex weight-derivative with the already-
        # gathered vertex features (permuto with_jacobian) — replaces the
        # 5-point FD tap pass (1 encoding instead of 5, and a far cheaper
        # backward). 'numerical' kept as the A/B oracle.
        self.nablas_mode = "analytic"
        self.remat = remat
        self.compute_dtype = jnp.float32
        self.eval_chunk = eval_chunk
        self._geo_init_bias = radius_init

        self.n_instances = n_instances
        self.z_dim = z_dim if n_instances > 0 else 0
        self.use_time = use_time
        self.latent_init_scale = latent_init_scale

        in_dim = 3 + self.z_dim + (1 if use_time else 0)
        pc = dict(permuto_cfg or {})
        pc.setdefault("n_levels", 12)
        pc.setdefault("base_res", 4.0)
        pc.setdefault("max_res", 512.0)
        pc.setdefault("log2_hashmap_size", 17)
        self.encoding = PermutoEncoding(in_dim, **pc)
        self.pe = None
        self.decoder = MLP(self.encoding.out_dim, 1 + geo_feat_dim,
                           hidden=decoder_hidden, depth=decoder_depth)
        self.nablas_eps = max(1.0 / float(pc["max_res"]) * 0.5, 1e-4)

        rad_in = 3 + geo_feat_dim + appear_embed_dim
        if use_view_dirs:
            self.dir_embed, dir_dim = get_embedder({"type": "sh", "degree": sh_degree})
            rad_in += dir_dim
        if use_nablas_in_radiance:
            rad_in += 3
        self.radiance_net = MLP(rad_in, 3, hidden=radiance_hidden,
                                depth=radiance_depth, output_activation="sigmoid")

    # -- params --------------------------------------------------------------
    def init(self, key) -> Params:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        p: Params = {
            "encoding": self.encoding.init(k1),
            "decoder": self.decoder.init(k2),
            "radiance": self.radiance_net.init(k3),
            "ln_inv_s": jnp.asarray(self.ln_inv_s_init, jnp.float32),
        }
        if self.n_instances > 0:
            # auto-decoder instance latents (reference z_ins Embedding,
            # batched_neus.py:321-365)
            p["latents"] = jax.random.normal(
                k4, (self.n_instances, self.z_dim)) * self.latent_init_scale
        return p

    # -- geometry -------------------------------------------------------------
    def _lattice_input(self, params: Params, x: jnp.ndarray,
                       bidx: Optional[jnp.ndarray],
                       cond: Optional[jnp.ndarray]) -> jnp.ndarray:
        """concat(x01, [sigmoid(z[bidx])], [t01]) — the reference's
        GenerativePermutoConcat conditioning (batched_neus.py:380)."""
        parts = [self.space.normalize_coords(x)]
        if self.n_instances > 0:
            if bidx is None:
                bidx = jnp.zeros(x.shape[:-1], jnp.int32)
            z = jnp.take(params["latents"], bidx, axis=0, mode="clip")
            # squash latents into the lattice domain
            parts.append(jax.nn.sigmoid(z))
        if self.use_time:
            if cond is None:
                cond = jnp.full(x.shape[:-1] + (1,), 0.5, x.dtype)
            parts.append(jnp.clip(cond, 0.0, 1.0))
        return jnp.concatenate(parts, axis=-1)

    def _sphere_bias(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.linalg.norm(x - self.space.center, axis=-1) \
            - self._geo_init_bias * jnp.mean(self.space.half_extent)

    def _sdf_feat_impl(self, params: Params, x: jnp.ndarray,
                       max_level, bidx: Optional[jnp.ndarray] = None,
                       cond: Optional[jnp.ndarray] = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = self.encoding(params["encoding"],
                          self._lattice_input(params, x, bidx, cond),
                          max_level=max_level)
        out = self.decoder(params["decoder"], h)
        sdf = out[..., 0]
        if self._geo_init_bias:
            sdf = sdf + self._sphere_bias(x)
        return sdf, out[..., 1:]

    def sdf_nablas_feat(self, params: Params, x: jnp.ndarray,
                        max_level: Optional[jnp.ndarray] = None,
                        bidx: Optional[jnp.ndarray] = None,
                        cond: Optional[jnp.ndarray] = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Analytic nablas via the permuto interpolation jacobian (reuses the
        forward's vertex gathers; see PermutoEncoding.with_jacobian). Falls
        back to the base class's FD taps for nablas_mode='numerical'."""
        if self.nablas_mode != "analytic":
            return super().sdf_nablas_feat(params, x, max_level=max_level,
                                           bidx=bidx, cond=cond)

        def impl(params, x, bidx, cond):
            full = self._lattice_input(params, x, bidx, cond)
            h, Jh = self.encoding.with_jacobian(
                params["encoding"], full, max_level=max_level, jac_dims=3)
            out, dec_vjp = jax.vjp(
                lambda hh: self.decoder(params["decoder"], hh), h)
            sdf = out[..., 0]
            feat = out[..., 1:]
            cot = jnp.zeros_like(out).at[..., 0].set(1.0)
            g_h, = dec_vjp(cot)                                   # [..., F]
            du_dx = 1.0 / (self.space.aabb_max - self.space.aabb_min)
            nablas = jnp.einsum("...f,...fd->...d", g_h, Jh,
                                preferred_element_type=jnp.float32) * du_dx
            if self._geo_init_bias:
                sdf = sdf + self._sphere_bias(x)
                delta = x - self.space.center
                dist = jnp.linalg.norm(delta, axis=-1, keepdims=True)
                nablas = nablas + delta / jnp.clip(dist, 1e-8)
            return sdf, nablas, feat

        if self.remat:
            impl = jax.checkpoint(impl)
        return impl(params, x, bidx, cond)

    # -- batched query over instances ------------------------------------------
    def batched_ray_query(self, params: Params, rays_o: jnp.ndarray,
                          rays_d: jnp.ndarray, rays_bidx: jnp.ndarray, *,
                          key=None, it=None, **query_kw) -> Dict[str, Any]:
        """One fused query for rays hitting different instances — the analog
        of the reference's ``batched_ray_query`` (batched_neus.py:263 usage;
        the instance index rides every sample row)."""
        return self.ray_query(params, rays_o, rays_d, key=key, it=it,
                              bidx=rays_bidx, **query_kw)

    def latent_norm(self, params: Params) -> jnp.ndarray:
        """||z|| regularizer hook (reference LatentLoss, conditional.py:17)."""
        if self.n_instances == 0:
            return jnp.asarray(0.0)
        return jnp.mean(jnp.sum(params["latents"] ** 2, axis=-1))


class ConditionalLoTDNeuSField(NeuSField):
    """Gather-free conditional NeuS: shared LoTD (all-CP) geometry over x,
    with the per-instance latent (and optional time embedding) concatenated
    into the SDF decoder input.

    The faithful TPU analog of the reference's style/latent-modulated LoTD
    family (``StyleLoTDNeuSModel`` / ``DITNeuS`` — shared/batched_neus.py:35,
    285: an LoTD backbone whose MLP is modulated by a per-instance style
    latent). Versus the permuto-concat field above, the conditioning moves
    from the lattice input to the decoder input, so the encoding stays 3-D
    and can use the gather-free CP tent-matmul levels — measured ~10x
    cheaper fwd+bwd than the permutohedral hash path on the v5e (PERF.md:
    the K=8 vehicle permuto group was 95% of the multi-object step, and its
    hash scatter-add made backward 2.6x forward). Right fidelity tradeoff
    for RIGID categorical assets (vehicles): per-instance identity needs no
    lattice deformation. Deformable/dynamic categories keep the permuto
    lattice (``ConditionalPermutoNeuSField``).
    """

    def __init__(self, space: AABBSpace = None, *,
                 n_instances: int = 0, z_dim: int = 8,
                 use_time: bool = False, t_n_freqs: int = 2,
                 encoding_cfg: Optional[Dict] = None,
                 latent_init_scale: float = 1e-2,
                 **neus_kw):
        enc = dict(encoding_cfg or {})
        enc.setdefault("type", "tpu_mixed")
        enc.setdefault("n_levels", 10)
        enc.setdefault("base_res", 8)
        enc.setdefault("max_res", 256)
        enc.setdefault("n_feats", 4)
        enc.setdefault("n_hash_levels", 0)       # gather-free default
        enc.setdefault("cp_max_res", 512)
        neus_kw.setdefault("radius_init", 0.4)
        super().__init__(space, geometry="lotd", encoding_cfg=enc, **neus_kw)
        self.n_instances = n_instances
        self.z_dim = z_dim if n_instances > 0 else 0
        self.use_time = use_time
        self.latent_init_scale = latent_init_scale
        if use_time:
            from .embedders import sinusoidal_embedder
            self.t_embed, self.t_dim = sinusoidal_embedder(
                t_n_freqs, 1, include_input=True)
        else:
            self.t_embed, self.t_dim = None, 0
        # rebuild the decoder for the widened input (encoding + z + t)
        dec_in = self.encoding.out_dim + self.z_dim + self.t_dim
        self.decoder = MLP(dec_in, 1 + self.geo_feat_dim,
                           hidden=self.decoder.hidden, depth=self.decoder.depth,
                           activation="relu")

    def init(self, key) -> Params:
        k0, k1 = jax.random.split(key)
        p = super().init(k0)
        if self.n_instances > 0:
            p["latents"] = jax.random.normal(
                k1, (self.n_instances, self.z_dim)) * self.latent_init_scale
        return p

    # -- conditioning ----------------------------------------------------------
    def _cond_feats(self, params: Params, lead: Tuple[int, ...],
                    bidx: Optional[jnp.ndarray],
                    cond: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
        """[..., z_dim + t_dim] decoder-side conditioning row per point."""
        parts = []
        if self.n_instances > 0:
            if bidx is None:
                bidx = jnp.zeros(lead, jnp.int32)
            parts.append(jnp.take(params["latents"],
                                  jnp.broadcast_to(bidx, lead), axis=0,
                                  mode="clip"))
        if self.use_time:
            if cond is None:
                cond = jnp.full(lead + (1,), 0.5, jnp.float32)
            parts.append(self.t_embed(
                jnp.broadcast_to(jnp.clip(cond, 0.0, 1.0), lead + (1,))))
        if not parts:
            return None
        return jnp.concatenate(parts, axis=-1)

    # -- geometry ---------------------------------------------------------------
    def _sdf_feat_impl(self, params: Params, x: jnp.ndarray,
                       max_level, bidx: Optional[jnp.ndarray] = None,
                       cond: Optional[jnp.ndarray] = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        u = self.space.normalize_coords(x)
        h = self.encoding(params["encoding"], u, max_level=max_level)
        zf = self._cond_feats(params, x.shape[:-1], bidx, cond)
        if zf is not None:
            h = jnp.concatenate([h, zf.astype(h.dtype)], axis=-1)
        out = self.decoder(params["decoder"], h.astype(self.compute_dtype))
        sdf = out[..., 0] * self.sdf_scale
        if self._geo_init_bias:
            d_sphere = jnp.linalg.norm(x - self.space.center, axis=-1) \
                - self._geo_init_bias * jnp.mean(self.space.half_extent)
            sdf = sdf + d_sphere
        return sdf, out[..., 1:]

    def sdf_nablas_feat(self, params: Params, x: jnp.ndarray,
                        max_level: Optional[jnp.ndarray] = None,
                        bidx: Optional[jnp.ndarray] = None,
                        cond: Optional[jnp.ndarray] = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Analytic nablas through the 3-D encoding jacobian. z/t are
        constant w.r.t. x, so the decoder vjp is taken only against the
        encoding slice of its input (zf is closed over)."""
        if self.nablas_mode != "analytic":
            return super().sdf_nablas_feat(params, x, max_level=max_level,
                                           bidx=bidx, cond=cond)

        def impl(params, x, bidx, cond):
            u = self.space.normalize_coords(x)
            h, Jh = self.encoding.with_jacobian(
                params["encoding"], u, max_level=max_level)
            zf = self._cond_feats(params, x.shape[:-1], bidx, cond)

            def dec(hh):
                inp = hh if zf is None else jnp.concatenate(
                    [hh, zf.astype(hh.dtype)], axis=-1)
                return self.decoder(params["decoder"], inp)

            out, dec_vjp = jax.vjp(dec, h.astype(self.compute_dtype))
            sdf = out[..., 0] * self.sdf_scale
            feat = out[..., 1:]
            cot = jnp.zeros_like(out).at[..., 0].set(1.0)
            g_h, = dec_vjp(cot)                                   # [..., F]
            du_dx = 1.0 / (self.space.aabb_max - self.space.aabb_min)
            nablas = jnp.einsum(
                "...f,...fd->...d", g_h, Jh.astype(g_h.dtype),
                preferred_element_type=jnp.float32) * du_dx * self.sdf_scale
            if self._geo_init_bias:
                delta = x - self.space.center
                dist = jnp.linalg.norm(delta, axis=-1, keepdims=True)
                sdf = sdf + (dist[..., 0] - self._geo_init_bias
                             * jnp.mean(self.space.half_extent))
                nablas = nablas + delta / jnp.clip(dist, 1e-8)
            return sdf, nablas, feat

        if self.remat:
            impl = jax.checkpoint(impl)
        return impl(params, x, bidx, cond)

    # -- batched/latent API (same surface as the permuto conditional) ----------
    def batched_ray_query(self, params: Params, rays_o, rays_d, rays_bidx, *,
                          key=None, it=None, **query_kw) -> Dict[str, Any]:
        return self.ray_query(params, rays_o, rays_d, key=key, it=it,
                              bidx=rays_bidx, **query_kw)

    def latent_norm(self, params: Params) -> jnp.ndarray:
        if self.n_instances == 0:
            return jnp.asarray(0.0)
        return jnp.mean(jnp.sum(params["latents"] ** 2, axis=-1))


def PermutoNeuSField(space=None, **kw):
    """Plain (unconditioned) permutohedral NeuS — reference PermutoNeuSModel."""
    return ConditionalPermutoNeuSField(space, n_instances=0, use_time=False, **kw)


def GenerativePermutoConcatNeuSField(space=None, *, n_instances: int,
                                     z_dim: int = 4, **kw):
    """Categorical shared NeuS with per-instance latents — reference
    GenerativePermutoConcatNeuSModel."""
    return ConditionalPermutoNeuSField(space, n_instances=n_instances,
                                       z_dim=z_dim, use_time=False, **kw)


def DynamicPermutoConcatNeuSField(space=None, **kw):
    """Time-conditioned NeuS for a single dynamic object — reference
    DynamicPermutoConcatNeuSModel."""
    return ConditionalPermutoNeuSField(space, n_instances=0, use_time=True, **kw)


def DynamicGenerativePermutoConcatNeuSField(space=None, *, n_instances: int,
                                            z_dim: int = 4, **kw):
    """Batched AND time-conditioned categorical NeuS (pedestrians/cyclists) —
    reference DynamicGenerativePermutoConcatNeuSModel."""
    return ConditionalPermutoNeuSField(space, n_instances=n_instances,
                                       z_dim=z_dim, use_time=True, **kw)
