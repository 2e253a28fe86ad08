"""Single-volume renderer: close-range model (+ Distant background + sky).

TPU-native re-design of ``app/renderers/single_volume_renderer.py``
(reference; SURVEY.md §2.3): query the close-range (cr) model, query the
Distant model with near = cr.far, merge the two buffers sorted by depth, do
one volume-integration pass, blend sky by (1 - mask_volume), and apply an
optional per-ray image postprocessor. Everything is a pure function of
(params, rays) so the whole render lives inside one jitted program.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from .buffers import merge_and_integrate
from ..ops.segment import masked_sum

Params = Dict[str, Any]


class SingleVolumeRenderer:
    """Composes: cr field [+ distant field] [+ sky] [+ postprocessor].

    ``models``: dict with keys
        'cr':      the close-range field object (NeuSField / NeRFField)
        'distant': optional NeRFDistantField
        'sky':     optional sky model (SimpleSky / PureColorSky)
    Query configs mirror the reference's renderer.common/train/val split.
    """

    def __init__(self, models: Dict[str, Any], *,
                 query_cfg: Optional[Dict[str, Any]] = None,
                 distant_query_cfg: Optional[Dict[str, Any]] = None,
                 depth_use_normalized_vw: bool = True,
                 param_keys: Optional[Dict[str, str]] = None,
                 accels: Optional[Dict[str, Any]] = None):
        self.models = models
        self.query_cfg = dict(query_cfg or {})
        self.distant_query_cfg = dict(distant_query_cfg or {})
        self.depth_use_normalized_vw = depth_use_normalized_vw
        # role -> key in the params dict; identity by default, model_ids when
        # driven by an AssetBank (flat {model_id: params} tree)
        self.param_keys = dict(param_keys or {})
        # role -> OccGridEma (occupancy acceleration; state passed per-call)
        self.accels = dict(accels or {})
        # optional per-ray image postprocessor asset (reference
        # image_postprocessor / ColorTransform, single_volume_renderer.py:462)
        self.postprocessor = None  # set via set_postprocessor

    def pkey(self, role: str) -> str:
        return self.param_keys.get(role, role)

    def set_postprocessor(self, asset, model_id: str):
        self.postprocessor = (asset, model_id)

    def init(self, key) -> Params:
        keys = jax.random.split(key, len(self.models))
        return {self.pkey(name): m.init(k)
                for (name, m), k in zip(self.models.items(), keys)}

    def ray_query(self, params: Params, rays_o: jnp.ndarray, rays_d: jnp.ndarray, *,
                  key: Optional[jax.Array] = None, it=None,
                  near: Optional[jnp.ndarray] = None, far: Optional[jnp.ndarray] = None,
                  with_rgb: bool = True, with_normal: bool = True,
                  only_cr: bool = False,
                  h_appear: Optional[jnp.ndarray] = None,
                  cond: Optional[jnp.ndarray] = None,
                  query_overrides: Optional[Dict[str, Any]] = None,
                  occ_states: Optional[Dict[str, Any]] = None,
                  return_buffer: bool = False) -> Dict[str, Any]:
        """Render a flat batch of rays [N, 3] -> ``rendered`` dict
        (SURVEY.md App. A.1 contract). ``occ_states``: {role: OccGridState}
        carried by the trainer — enables grid-skipping coarse proposals
        (reference ``march_occ_*`` query modes)."""
        cr = self.models["cr"]
        kcr = kdv = None
        if key is not None:
            kcr, kdv = jax.random.split(key)
        cfg = dict(self.query_cfg)
        if query_overrides:
            cfg.update(query_overrides)
        if occ_states and "cr" in occ_states and "cr" in self.accels:
            accel = self.accels["cr"]
            st = occ_states["cr"]
            cfg.setdefault("occ_t_fn",
                           lambda ro, rd, n_, f_, nc, k:
                           accel.ray_proposal(st, ro, rd, n_, f_, nc, key=k))
        if h_appear is not None:
            cfg["h_appear"] = h_appear
        if cond is not None:
            # per-ray conditioning (normalized time for dynamic fields);
            # [N,1] or broadcastable [1,1]
            cfg["cond"] = cond
        buf_cr = cr.ray_query(params[self.pkey("cr")], rays_o, rays_d, key=kcr, it=it,
                              near=near, far=far, with_rgb=with_rgb, **cfg)
        buffers = [buf_cr]

        use_distant = ("distant" in self.models) and not only_cr
        if use_distant:
            dv = self.models["distant"]
            # Distant sampling starts at the cr model's far (reference
            # single_volume_renderer.py:288-290). Missed cr rays start at the
            # scene radius.
            cr_far = buf_cr["details"]["far"]
            cr_hit = buf_cr["details"]["hit"]
            dv_near = jnp.where(cr_hit, jnp.maximum(cr_far, 1e-3),
                                jnp.maximum(cr.space.radius3d * 0.1, 1e-3))
            buf_dv = dv.ray_query(params[self.pkey("distant")], rays_o, rays_d, key=kdv, it=it,
                                  near=dv_near, with_rgb=with_rgb,
                                  h_appear=h_appear, **self.distant_query_cfg)
            buffers.append(buf_dv)

        # cr samples end where distant's begin (dv_near = cr_far), so the
        # concatenation is already depth-ordered — skip the per-ray sorts
        rendered = merge_and_integrate(
            buffers, depth_use_normalized_vw=self.depth_use_normalized_vw,
            with_per_src=use_distant, assume_sorted=True)
        if use_distant:
            rendered["rendered_cr"] = rendered["per_src"][0]
            rendered["rendered_dv"] = rendered["per_src"][1]

        if with_rgb and "sky" in self.models:
            sky_rgb = self.models["sky"](params[self.pkey("sky")], rays_d, h_appear=h_appear)
            mask = rendered["mask_volume"][..., None]
            rendered["rgb_sky"] = sky_rgb
            rendered["rgb_volume_occupied"] = rendered["rgb_volume"]
            rendered["rgb_volume_non_occupied"] = (1.0 - mask) * sky_rgb
            rendered["rgb_volume"] = rendered["rgb_volume"] + (1.0 - mask) * sky_rgb

        rendered["details_cr"] = buf_cr["details"]
        if "sigma_dynamic" in buf_cr:
            # EmerNeRF decomposition quantities for the dynamic losses
            rendered["sigma_dynamic_cr"] = jnp.where(
                buf_cr["mask"], buf_cr["sigma_dynamic"], 0.0)
            # Decomposed static/dynamic + flow volumes (reference render.py
            # with_static_dynamic / with_flow channels, code_single/tools/
            # render.py:536-546,674-680). cr samples precede distant's in the
            # merged buffer and transmittance is causal, so the merged vw
            # restricted to the first S_cr lanes IS the cr samples' weight.
            S_cr = buf_cr["t"].shape[-1]
            vw_cr = rendered["vw"][..., :S_cr]
            m_cr = buf_cr["mask"]
            r_dyn = buf_cr.get("dynamic_ratio")
            if r_dyn is not None:
                w_dyn, w_sta = vw_cr * r_dyn, vw_cr * (1.0 - r_dyn)
                rendered["mask_dynamic"] = masked_sum(w_dyn, m_cr)
                rendered["mask_static"] = masked_sum(w_sta, m_cr)
                if with_rgb and "rgb" in buf_cr:
                    rendered["rgb_dynamic"] = masked_sum(
                        w_dyn[..., None] * buf_cr["rgb"], m_cr[..., None], axis=-2)
                    rendered["rgb_static"] = masked_sum(
                        w_sta[..., None] * buf_cr["rgb"], m_cr[..., None], axis=-2)
            for fk in ("flow_fwd", "flow_bwd"):
                if fk in buf_cr:
                    # flow belongs to the dynamic branch: weight by vw*ratio
                    w = vw_cr * r_dyn if r_dyn is not None else vw_cr
                    rendered[fk] = masked_sum(
                        w[..., None] * buf_cr[fk], m_cr[..., None], axis=-2)
        if not return_buffer:
            rendered.pop("merged_buffer", None)
        return rendered

    def apply_postprocess(self, params: Params, rgb: jnp.ndarray,
                          rays_fidx: jnp.ndarray) -> jnp.ndarray:
        """Per-frame learned color transform on composited rgb (reference
        image_postprocessor hook)."""
        if self.postprocessor is None:
            return rgb
        asset, mid = self.postprocessor
        return asset.apply(params[mid], rgb, rays_fidx)

    def render_chunked(self, params: Params, rays_o: jnp.ndarray, rays_d: jnp.ndarray, *,
                       rayschunk: int = 4096, key=None, **kw) -> Dict[str, Any]:
        """Memory-bounded full-frame rendering: fixed-size chunks via lax.map
        (the reference's ``rayschunk`` + ``batchify_query`` eval path,
        single_volume_renderer.py:546-565)."""
        n = rays_o.shape[0]
        pad = (-n) % rayschunk
        ro = jnp.concatenate([rays_o, jnp.ones((pad, 3), rays_o.dtype)], 0)
        rd = jnp.concatenate([rays_d, jnp.ones((pad, 3), rays_d.dtype)], 0)
        ro = ro.reshape(-1, rayschunk, 3)
        rd = rd.reshape(-1, rayschunk, 3)

        def body(args):
            o, d = args
            r = self.ray_query(params, o, d, key=key, with_rgb=True, **kw)
            r.pop("vw", None)
            r.pop("sigma_dynamic_cr", None)
            r.pop("per_src", None)
            r.pop("merged_buffer", None)
            r.pop("details_cr", None)
            r.pop("rendered_cr", None)
            r.pop("rendered_dv", None)
            return r

        out = jax.lax.map(body, (ro, rd))
        return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:])[:n], out)
