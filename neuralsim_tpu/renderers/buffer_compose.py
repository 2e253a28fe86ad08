"""Multi-object buffer-compose renderer: the code_multi rendering path.

TPU-native re-design of ``app/renderers/buffer_compose_renderer.py``
(reference, 1048 LoC — SURVEY.md §2.3, §3.2): transform rays into every
drawable's frame, query each object's model, scatter all per-object sample
buffers into one flat buffer, sort by depth per ray, alpha-composite once,
and decompose per-object/per-class contributions from ``vw_in_total``.

TPU translation (SURVEY.md §7):
  * the ragged scatter + ``packed_sort`` becomes concat-on-sample-axis of K
    fixed-budget dense buffers + ONE ``lax.sort`` per ray;
  * frustum culling is replaced by per-object ray-AABB masking inside the
    graph (static shapes; a culled object contributes zero valid samples);
  * shared categorical models evaluate all their instances in one *batched*
    query (instance index per sample row) — the analog of
    ``batched_query_shared`` (reference :209-391).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .buffers import merge_and_integrate
from ..maths.transforms import apply_rotation

Params = Dict[str, Any]


class ObjectBinding:
    """Static description of one drawable -> model binding."""

    def __init__(self, obj_id: str, model_id: str, field, query_cfg: Dict,
                 bidx: Optional[int] = None):
        self.obj_id = obj_id
        self.model_id = model_id
        self.field = field
        self.query_cfg = dict(query_cfg)
        self.bidx = bidx  # instance index into a shared batched model


class BufferComposeRenderer:
    """Composes K object models + street (cr) + distant + sky.

    ``objects``: list of ObjectBinding for the scene's drawables.
    ``scene_models``: dict with optional 'cr' (street), 'distant', 'sky'
    role -> (field, model_id, query_cfg).
    """

    def __init__(self, scene, objects: Sequence[ObjectBinding],
                 scene_models: Dict[str, Tuple[Any, str, Dict]], *,
                 obj_query_cfg: Optional[Dict] = None,
                 depth_use_normalized_vw: bool = True):
        self.scene = scene
        self.objects = list(objects)
        self.scene_models = dict(scene_models)
        self.obj_query_cfg = {"num_coarse": 24, "num_fine": (8,),
                              "upsample_inv_s_factors": (1.0,),
                              **(obj_query_cfg or {})}
        self.depth_use_normalized_vw = depth_use_normalized_vw

    # ------------------------------------------------------------------
    def ray_query(self, params: Params, frozen, rays_o: jnp.ndarray,
                  rays_d: jnp.ndarray, *, key=None, it=None,
                  with_rgb: bool = True, only_cr: bool = False,
                  h_appear: Optional[jnp.ndarray] = None,
                  return_buffer: bool = False) -> Dict[str, Any]:
        """frozen: FrozenScene at the batch's frame indices (built inside the
        jitted caller so object poses stay differentiable)."""
        buffers: List[Dict[str, Any]] = []
        names: List[str] = []

        # --- per-object queries (reference query_single :490) --------------
        if not only_cr:
            for i, ob in enumerate(self.objects):
                kb = jax.random.fold_in(key, i) if key is not None else None
                o_l, d_l, dn = frozen.rays_to_node(ob.obj_id, rays_o, rays_d)
                valid = frozen.valid(ob.obj_id)
                qkw = dict(ob.query_cfg)
                if ob.bidx is not None:
                    # shared categorical model: constant instance index for
                    # this drawable (reference set_condition({'ins_id': ...}))
                    qkw["bidx"] = jnp.full(rays_o.shape[:-1], ob.bidx,
                                           jnp.int32)
                buf = ob.field.ray_query(
                    params[ob.model_id], o_l, d_l, key=kb, it=it,
                    with_rgb=with_rgb, **qkw)
                # object-frame t -> world t: the world point o_w + t_w*d_w maps
                # to local o_l + (t_w*dn)*d_unit, so t_w = t_local / dn
                # (dn = |R_w2n d / scale| ~ 1/scale for unit world dirs)
                buf = dict(buf)
                buf["t"] = buf["t"] / jnp.clip(dn[:, None], 1e-9)
                v = jnp.asarray(valid)
                vm = v if v.ndim == 0 else v[:, None]
                buf["mask"] = buf["mask"] & jnp.broadcast_to(vm, buf["mask"].shape)
                buf["alpha"] = jnp.where(buf["mask"], buf["alpha"], 0.0)
                if "nablas" in buf:
                    # rotate object-frame nablas to world (reference
                    # rotate_volume_buffer_nablas, renderers/utils.py:17)
                    n2w = frozen.world_transform(ob.obj_id)
                    buf["nablas"] = apply_rotation(
                        n2w if n2w.ndim == 2 else n2w[:, None, :, :],
                        buf["nablas"])
                buffers.append(buf)
                names.append(ob.obj_id)

        # --- street / close-range scene model -------------------------------
        cr_far = None
        cr_hit = None
        if "cr" in self.scene_models:
            field, mid, qcfg = self.scene_models["cr"]
            kb = jax.random.fold_in(key, 1000) if key is not None else None
            buf = field.ray_query(params[mid], rays_o, rays_d, key=kb, it=it,
                                  with_rgb=with_rgb, **qcfg)
            cr_far = buf["details"]["far"]
            cr_hit = buf["details"]["hit"]
            buffers.append(buf)
            names.append("street")

        # --- distant background (forced last, reference :161-164) ------------
        if "distant" in self.scene_models and not only_cr:
            field, mid, qcfg = self.scene_models["distant"]
            kb = jax.random.fold_in(key, 1001) if key is not None else None
            if cr_far is not None:
                dv_near = jnp.where(cr_hit, jnp.maximum(cr_far, 1e-3), 1.0)
            else:
                dv_near = jnp.full(rays_o.shape[:-1], 1.0)
            buf = field.ray_query(params[mid], rays_o, rays_d, key=kb, it=it,
                                  near=dv_near, with_rgb=with_rgb,
                                  h_appear=h_appear, **qcfg)
            buffers.append(buf)
            names.append("distant")

        rendered = merge_and_integrate(
            buffers, depth_use_normalized_vw=self.depth_use_normalized_vw,
            with_per_src=True)
        rendered["src_names"] = names
        rendered["rendered_per_obj_in_scene"] = {
            n: r for n, r in zip(names, rendered["per_src"])}

        if with_rgb and "sky" in self.scene_models:
            sky, mid, _ = self.scene_models["sky"]
            sky_rgb = sky(params[mid], rays_d, h_appear=h_appear)
            m = rendered["mask_volume"][..., None]
            rendered["rgb_sky"] = sky_rgb
            rendered["rgb_volume"] = rendered["rgb_volume"] + (1.0 - m) * sky_rgb

        if not return_buffer:
            rendered.pop("merged_buffer", None)
        return rendered

    # ------------------------------------------------------------------
    @classmethod
    def from_asset_bank(cls, scene, bank, *, obj_query_cfg=None,
                        cr_class: str = "Street", distant_class: str = "Distant",
                        sky_class: str = "Sky") -> "BufferComposeRenderer":
        """Bind every scene drawable + scene-level models from an AssetBank."""
        objects = []
        for oid in scene.drawable_ids():
            mid = bank.model_for(scene.id, oid)
            if mid is None:
                continue
            asset = bank.assets[mid]
            if asset.field is None:
                continue
            bidx = getattr(asset, "instance_index", {}).get(oid)
            objects.append(ObjectBinding(oid, mid, asset.field,
                                         {**(obj_query_cfg or {}),
                                          **asset.query_cfg}, bidx=bidx))
        scene_models = {}
        for role, cname in (("cr", cr_class), ("distant", distant_class),
                            ("sky", sky_class)):
            for mid, asset in bank.assets.items():
                if bank.class_of[mid] == cname and asset.field is not None:
                    scene_models[role] = (asset.field, mid, asset.query_cfg)
                    break
        return cls(scene, objects, scene_models, obj_query_cfg=obj_query_cfg)


def render_instance_segmentation(rendered: Dict[str, Any]) -> jnp.ndarray:
    """Per-ray argmax-source instance id from the per-src decomposition
    (reference z-buffer instance/class segmentation, :184-188)."""
    masses = jnp.stack([r["mask_volume"] for r in rendered["per_src"]], axis=-1)
    return jnp.argmax(masses, axis=-1)
