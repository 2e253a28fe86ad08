"""NeRF-family density fields: grid/PE NeRF and the inverted-sphere
"Distant" background model.

TPU-native equivalent of ``nr3d_lib.models.fields.NeRFModel/LoTDNeRFModel``
and ``nr3d_lib.models.fields_distant.{NeRFDistantModel, LoTDNeRFDistantModel,
PermutoNeRFDistantModel}`` (SURVEY.md §2.9). The Distant model consumes the
NeRF++ 4D parameterization (unit direction + inverse radius) and samples an
inverse-depth ladder starting at the close-range model's ``far`` — exactly the
contract the single-volume renderer composes at
single_volume_renderer.py:275-332 (reference).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .blocks import MLP
from .embedders import get_embedder, sinusoidal_embedder
from .encodings.lotd import make_lotd
from .spatial import (AABBSpace, contract_inverted_cuboid,
                      contract_inverted_sphere)
from ..ops.segment import tau_to_alpha

Params = Dict[str, Any]


class NeRFField:
    """Density+radiance field inside an AABB (LoTD-grid or PE-MLP geometry)."""

    def __init__(self, space: AABBSpace = None, *, geometry: str = "lotd",
                 encoding_cfg: Optional[Dict] = None, geo_feat_dim: int = 15,
                 decoder_hidden: int = 64, decoder_depth: int = 1,
                 pe_n_freqs: int = 10, mlp_hidden: int = 256, mlp_depth: int = 8,
                 radiance_hidden: int = 64, radiance_depth: int = 2,
                 use_view_dirs: bool = True, sh_degree: int = 4,
                 appear_embed_dim: int = 0, density_activation: str = "trunc_exp"):
        self.space = space or AABBSpace()
        self.geometry = geometry
        self.appear_embed_dim = appear_embed_dim
        self.use_view_dirs = use_view_dirs
        self.density_activation = density_activation

        if geometry == "lotd":
            self.encoding = make_lotd(encoding_cfg or {}, input_dim=3)
            self.decoder = MLP(self.encoding.out_dim, 1 + geo_feat_dim,
                               hidden=decoder_hidden, depth=decoder_depth)
            self.pe = None
        else:
            self.pe, pe_dim = sinusoidal_embedder(pe_n_freqs, 3)
            self.encoding = None
            self.decoder = MLP(pe_dim, 1 + geo_feat_dim, hidden=mlp_hidden,
                               depth=mlp_depth, skips=(mlp_depth // 2,))

        rad_in = geo_feat_dim
        if use_view_dirs:
            self.dir_embed, dir_dim = get_embedder({"type": "sh", "degree": sh_degree})
            rad_in += dir_dim
        rad_in += appear_embed_dim
        self.radiance_net = MLP(rad_in, 3, hidden=radiance_hidden, depth=radiance_depth,
                                output_activation="sigmoid")

    def init(self, key) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        p: Params = {"decoder": self.decoder.init(k1),
                     "radiance": self.radiance_net.init(k2)}
        if self.encoding is not None:
            p["encoding"] = self.encoding.init(k3)
        return p

    def _density_act(self, raw: jnp.ndarray) -> jnp.ndarray:
        if self.density_activation == "trunc_exp":
            return jnp.exp(jnp.clip(raw, -15.0, 15.0))
        if self.density_activation == "softplus":
            return jax.nn.softplus(raw - 1.0)
        return jax.nn.relu(raw)

    def query_density_feat(self, params: Params, x: jnp.ndarray,
                           max_level=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.geometry == "lotd":
            u = self.space.normalize_coords(x)
            h = self.encoding(params["encoding"], u, max_level=max_level)
        else:
            h = self.pe(x)
        out = self.decoder(params["decoder"], h)
        return self._density_act(out[..., 0]), out[..., 1:]

    def query_radiance(self, params: Params, feat: jnp.ndarray, v: jnp.ndarray,
                       h_appear: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        inputs = [feat]
        if self.use_view_dirs:
            inputs.append(self.dir_embed(v))
        if self.appear_embed_dim:
            if h_appear is None:
                h_appear = jnp.zeros(feat.shape[:-1] + (self.appear_embed_dim,), feat.dtype)
            inputs.append(h_appear)
        return self.radiance_net(params["radiance"], jnp.concatenate(inputs, axis=-1))

    def ray_query(self, params: Params, rays_o: jnp.ndarray, rays_d: jnp.ndarray, *,
                  key: Optional[jax.Array] = None, it=None,
                  near: Optional[jnp.ndarray] = None, far: Optional[jnp.ndarray] = None,
                  num_coarse: int = 128, perturb: bool = True, with_rgb: bool = True,
                  h_appear: Optional[jnp.ndarray] = None, **_unused) -> Dict[str, Any]:
        """Uniform-in-AABB density ray query, dense volume buffer out."""
        N = rays_o.shape[0]
        n_, f_, hit = self.space.ray_test(rays_o, rays_d, near=near, far=far)
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, num_coarse), (N, num_coarse))
        if perturb and key is not None:
            u = u + (jax.random.uniform(key, (N, num_coarse)) - 0.5) / num_coarse
            u = jnp.clip(u, 0.0, 1.0)
        t = n_[:, None] + (f_ - n_)[:, None] * u
        mask = jnp.broadcast_to(hit[:, None], t.shape)

        x = rays_o[:, None, :] + t[..., None] * rays_d[:, None, :]
        sigma, feat = self.query_density_feat(params, x)
        dt = jnp.concatenate([t[..., 1:] - t[..., :-1],
                              jnp.ones_like(t[..., :1]) * 1e-3], axis=-1)
        alpha = jnp.where(mask, tau_to_alpha(sigma * dt), 0.0)
        buf: Dict[str, Any] = {"t": t, "mask": mask, "alpha": alpha,
                               "nablas": jnp.zeros_like(x)}
        if with_rgb:
            dirs = jnp.broadcast_to(rays_d[:, None, :], x.shape)
            buf["rgb"] = self.query_radiance(params, feat, dirs,
                                             None if h_appear is None else h_appear[:, None, :])
        buf["details"] = {"hit": hit, "near": n_, "far": f_}
        return buf


class NeRFDistantField:
    """NeRF++ inverted-sphere background ("Distant" models).

    Input is the 4D contraction (unit dir, R/r); sampling is linear in
    inverse radius from the close-range far plane out to infinity — the
    reference's ``fixed_cuboid_shells``-style ladder (config
    withmask_withlidar_joint.240219.yaml:297-303 semantics).
    """

    def __init__(self, *, inner_radius: float = 1.0, geometry: str = "lotd",
                 encoding_cfg: Optional[Dict] = None, geo_feat_dim: int = 15,
                 decoder_hidden: int = 64, decoder_depth: int = 1,
                 radiance_hidden: int = 64, radiance_depth: int = 2,
                 use_view_dirs: bool = True, sh_degree: int = 4,
                 appear_embed_dim: int = 0,
                 cr_aabb: Optional[Any] = None):
        self.inner_radius = inner_radius
        # fixed_cuboid_shells mode: shells scale the close-range AABB; set
        # at construction (model_params.cr_aabb) or auto-wired from the cr
        # model by the driver builders (set_cr_aabb)
        self.cub_center = None
        self.cub_half = None
        if cr_aabb is not None:
            self.set_cr_aabb(cr_aabb)
        self.appear_embed_dim = appear_embed_dim
        self.use_view_dirs = use_view_dirs
        if geometry == "lotd":
            cfg = dict(encoding_cfg or {})
            cfg.setdefault("n_levels", 12)
            cfg.setdefault("max_res", 1024)
            self.encoding = make_lotd(cfg, input_dim=4)
            self.pe = None
            dec_in = self.encoding.out_dim
        else:
            self.pe, dec_in = sinusoidal_embedder(8, 4)
            self.encoding = None
        self.decoder = MLP(dec_in, 1 + geo_feat_dim, hidden=decoder_hidden,
                           depth=decoder_depth)
        rad_in = geo_feat_dim + appear_embed_dim
        if use_view_dirs:
            self.dir_embed, dir_dim = get_embedder({"type": "sh", "degree": sh_degree})
            rad_in += dir_dim
        self.radiance_net = MLP(rad_in, 3, hidden=radiance_hidden, depth=radiance_depth,
                                output_activation="sigmoid")

    def init(self, key) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        p: Params = {"decoder": self.decoder.init(k1),
                     "radiance": self.radiance_net.init(k2)}
        if self.encoding is not None:
            p["encoding"] = self.encoding.init(k3)
        return p

    def set_cr_aabb(self, aabb) -> None:
        """Switch to fixed_cuboid_shells contraction around the close-range
        AABB (reference LoTDNeRFDistant.asset_populate takes
        cr_obj.model.space.aabb, app/models/single/nerf.py:160-187). Accepts
        an AABBSpace or an (aabb_min, aabb_max) pair / [2, 3] array."""
        if hasattr(aabb, "aabb_min"):
            mn, mx = aabb.aabb_min, aabb.aabb_max
        else:
            arr = jnp.asarray(aabb, jnp.float32).reshape(2, 3)
            mn, mx = arr[0], arr[1]
        mn = jnp.asarray(mn, jnp.float32)
        mx = jnp.asarray(mx, jnp.float32)
        self.cub_center = 0.5 * (mn + mx)
        self.cub_half = jnp.maximum(0.5 * (mx - mn), 1e-6)

    def query_density_feat(self, params: Params, x: jnp.ndarray):
        if self.cub_center is not None:
            c = contract_inverted_cuboid(x, self.cub_center, self.cub_half)
        else:
            c = contract_inverted_sphere(x, self.inner_radius)  # [..., 4]
        if self.encoding is not None:
            u = jnp.concatenate([c[..., :3] * 0.5 + 0.5, c[..., 3:]], axis=-1)
            h = self.encoding(params["encoding"], u)
        else:
            h = self.pe(c)
        out = self.decoder(params["decoder"], h)
        # -1 bias: at init (raw~0) the per-sample optical depth integrates
        # to ~0.4 over the whole shell ladder instead of starting opaque
        return jnp.exp(jnp.clip(out[..., 0] - 1.0, -15.0, 15.0)), out[..., 1:]

    def ray_query(self, params: Params, rays_o: jnp.ndarray, rays_d: jnp.ndarray, *,
                  key: Optional[jax.Array] = None, it=None,
                  near: Optional[jnp.ndarray] = None,
                  num_samples: int = 64, perturb: bool = True, with_rgb: bool = True,
                  far_factor: float = 1e4,
                  h_appear: Optional[jnp.ndarray] = None, **_unused) -> Dict[str, Any]:
        """Sample linearly in inverse depth on [near, near*far_factor].

        ``near`` per ray must be the close-range model's far (the composition
        contract at single_volume_renderer.py:288-290 in the reference).
        """
        N = rays_o.shape[0]
        if near is None:
            near = jnp.full((N,), self.inner_radius)
        near = jnp.maximum(near, 1e-3)
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, num_samples), (N, num_samples))
        if perturb and key is not None:
            u = u + (jax.random.uniform(key, (N, num_samples)) - 0.5) / num_samples
            u = jnp.clip(u, 0.0, 1.0)
        inv_t = (1.0 / near)[:, None] * (1.0 - u) + (1.0 / (near * far_factor))[:, None] * u
        t = 1.0 / inv_t
        mask = jnp.ones_like(t, bool)

        x = rays_o[:, None, :] + t[..., None] * rays_d[:, None, :]
        sigma, feat = self.query_density_feat(params, x)
        # Integrate in the CONTRACTED inverse-depth coordinate s = near/t
        # (NeRF++ background integration): metric dt explodes toward the far
        # shells (t up to near*far_factor), so any nonzero density would make
        # the background opaque from birth and swallow the scene (r4 street
        # collapse). s is uniform in [1/far_factor, 1] by construction; the
        # ladder does NOT close the integral at t=inf — the sky model owns
        # the residual transmittance (reference include_inf_distance: false,
        # withmask_withlidar_joint.240219.yaml:294).
        s = near[:, None] * inv_t
        ds = s[..., :-1] - s[..., 1:]
        ds = jnp.concatenate([ds, ds[..., -1:]], axis=-1)
        alpha = tau_to_alpha(sigma * ds)
        buf: Dict[str, Any] = {"t": t, "mask": mask, "alpha": alpha,
                               "nablas": jnp.zeros_like(x)}
        if with_rgb:
            dirs = jnp.broadcast_to(rays_d[:, None, :], x.shape)
            inputs = [feat]
            if self.use_view_dirs:
                inputs.append(self.dir_embed(dirs))
            if self.appear_embed_dim:
                ha = (jnp.zeros(feat.shape[:-1] + (self.appear_embed_dim,))
                      if h_appear is None else jnp.broadcast_to(
                          h_appear[:, None, :], feat.shape[:-1] + (self.appear_embed_dim,)))
                inputs.append(ha)
            buf["rgb"] = self.radiance_net(params["radiance"],
                                           jnp.concatenate(inputs, axis=-1))
        buf["details"] = {"hit": jnp.ones((N,), bool), "near": near,
                          "far": t[..., -1]}
        return buf
