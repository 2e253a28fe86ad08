"""Multi-object buffer-compose renderer: the code_multi rendering path.

TPU-native re-design of ``app/renderers/buffer_compose_renderer.py``
(reference, 1048 LoC — SURVEY.md §2.3, §3.2): transform rays into every
drawable's frame, query each object's model, scatter all per-object sample
buffers into one flat buffer, sort by depth per ray, alpha-composite once,
and decompose per-object/per-class contributions from ``vw_in_total``.

TPU translation (SURVEY.md §7):
  * the ragged scatter + ``packed_sort`` becomes concat-on-sample-axis of K
    fixed-budget dense buffers + ONE ``lax.sort`` per ray;
  * the reference's ``batched_query_shared`` on hit-compacted rays
    (:209-391) becomes: per object, compact the rays that hit its AABB to a
    fixed ``hit_budget`` (argsort the hit mask), then ONE batched query per
    shared model over the stacked [K, B] compacted rays (instance index per
    row), scattered back to [N, S] before the merge. Evaluation cost is
    O(K*B*S) instead of O(K*N*S) — sublinear in ray count for small
    objects, and shared categorical models run all their instances in one
    program;
  * frustum culling of whole objects stays host-side
    (``camera_filter_drawables``) producing the static binding list.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .buffers import merge_and_integrate
from ..maths.transforms import (apply_rotation, apply_transform,
                                inverse_transform)

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
    ``hit_budget_frac``: fraction of the ray batch each object may evaluate
    (the fixed-shape stand-in for exact hit compaction; objects covering
    more of the image than this drop the overflow rays). None disables
    compaction (exact, O(K*N)).

    ``group_budget_frac``: if set, a shared categorical model group of K>1
    instances gets ONE total budget of ``frac*N`` (instance, ray) pairs
    instead of K per-instance budgets — the field-eval cost of the group is
    then O(N*S) regardless of K (the fixed-shape analog of the reference's
    exact hit compaction across all instances,
    buffer_compose_renderer.py:209-391). Pairs are selected hit-first with
    round-robin interleaving across instances, so no instance starves when
    total hits exceed the budget.

    ``max_hits_per_ray``: in group-budget mode with ``with_per_obj=False``
    (the training path), the queried rows are scattered into ``M`` per-ray
    slot lanes ([N, M*S] — one pseudo-source for the whole group) instead
    of K per-object [N, S] buffers, so the depth-merge sort and buffer
    memory are ALSO K-independent. Rays overlapped by more than M instances
    drop the (occluded) overflow.
    """

    def __init__(self, scene, objects: Sequence[ObjectBinding],
                 scene_models: Dict[str, Tuple[Any, str, Dict]], *,
                 obj_query_cfg: Optional[Dict] = None,
                 depth_use_normalized_vw: bool = True,
                 hit_budget_frac: Optional[float] = 0.5,
                 group_budget_frac: Optional[float] = None,
                 max_hits_per_ray: int = 4,
                 accels: Optional[Dict[str, Any]] = None):
        self.scene = scene
        self.objects = list(objects)
        self.scene_models = dict(scene_models)
        self.obj_query_cfg = {"num_coarse": 24, "num_fine": (8,),
                              "upsample_inv_s_factors": (1.0,),
                              **(obj_query_cfg or {})}
        self.depth_use_normalized_vw = depth_use_normalized_vw
        self.hit_budget_frac = hit_budget_frac
        self.group_budget_frac = group_budget_frac
        self.max_hits_per_ray = max_hits_per_ray
        # role ('cr') or model_id -> OccGrid accel (state passed per call);
        # batched accels serve shared categorical models
        self.accels = dict(accels or {})
        # optional per-ray image postprocessor asset (reference compose-path
        # postprocess, buffer_compose_renderer.py:810-829)
        self.postprocessor = None

    def set_postprocessor(self, asset, model_id: str):
        self.postprocessor = (asset, model_id)

    def apply_postprocess(self, params: Params, rgb: jnp.ndarray,
                          fidx: jnp.ndarray) -> jnp.ndarray:
        if self.postprocessor is None:
            return rgb
        asset, mid = self.postprocessor
        return asset.apply(params[mid], rgb, fidx)

    # ------------------------------------------------------------------
    def _grouped(self):
        groups: Dict[str, List[ObjectBinding]] = {}
        for ob in self.objects:
            groups.setdefault(ob.model_id, []).append(ob)
        return groups

    def ray_query(self, params: Params, frozen, rays_o: jnp.ndarray,
                  rays_d: jnp.ndarray, *, key=None, it=None,
                  with_rgb: bool = True, only_cr: bool = False,
                  h_appear: Optional[jnp.ndarray] = None,
                  cond: Optional[jnp.ndarray] = None,
                  occ_states: Optional[Dict[str, Any]] = None,
                  return_buffer: bool = False,
                  query_overrides: Optional[Dict[str, Any]] = None,
                  with_per_obj: bool = True) -> Dict[str, Any]:
        """frozen: FrozenScene at the batch's frame indices (built inside the
        jitted caller so object poses stay differentiable).

        ``query_overrides`` merge into every field query — the reference's
        ``bypass_ray_query_cfg`` (e.g. perturb=False for deterministic eval,
        forward_inv_s for LiDAR sharpness, render.py:320)."""
        N = rays_o.shape[0]
        _qo = dict(query_overrides or {})
        buffers: List[Dict[str, Any]] = []
        names: List[str] = []
        B = N if self.hit_budget_frac is None else \
            max(min(N, int(round(N * self.hit_budget_frac))), 1)

        # --- per-object queries, grouped per model so shared categorical
        # models evaluate ALL their instances in one batched program
        # (reference batched_query_shared, buffer_compose_renderer.py:209-391).
        # All pre/post work (ray transform, AABB test, hit compaction,
        # scatter-back) is BATCHED over the K instances of a group — one set
        # of ops per group, not K python-loop copies (compile time and step
        # time both O(1) in K outside the field query itself).
        if not only_cr:
            for gi, (model_id, obs) in enumerate(self._grouped().items()):
                kb = jax.random.fold_in(key, gi) if key is not None else None
                K = len(obs)
                w = jnp.stack([frozen.world_transform(ob.obj_id)
                               for ob in obs])              # [K,(N,)4,4]
                scale = jnp.stack([frozen.data(ob.obj_id)["scale"]
                                   for ob in obs])          # [K,(N,)3]
                per_ray_tf = w.ndim > 3
                if not per_ray_tf:
                    w = w[:, None]                          # broadcast rays
                if scale.ndim == 2:                         # [K,3] static scale
                    scale = scale[:, None]
                w2n = inverse_transform(w)
                o_l = apply_transform(w2n, rays_o) / scale  # [K, N, 3]
                d_s = apply_rotation(w2n, rays_d) / scale
                dn = jnp.linalg.norm(d_s, axis=-1)          # [K, N]
                d_l = d_s / jnp.clip(dn[..., None], 1e-9)
                n_, f_, hit = obs[0].field.space.ray_test(o_l, d_l)
                valid = jnp.stack(
                    [jnp.broadcast_to(jnp.asarray(frozen.valid(ob.obj_id)),
                                      (N,)) for ob in obs])
                hit = hit & valid                           # [K, N]
                qkw = dict(obs[0].query_cfg)
                shared = obs[0].bidx is not None
                # "auto": exact per-instance path while K is small (the
                # measured pair-budget quality cost is ~0.9 dB on 2-big-
                # object scenes, PERF.md sweep), K-independent pair budget
                # once the group is large enough that O(K*N) eval hurts
                gf = self.group_budget_frac
                if gf == "auto":
                    gf = None if K <= 4 else 1.0
                pair_mode = (gf is not None and shared and K > 1)
                if pair_mode:
                    # ONE group-wide budget of (instance, ray) pairs: the
                    # j-th hit of every instance sorts with key j*K+k, so
                    # instances are served round-robin up to Bg total rows.
                    Bg = max(min(K * N, int(round(N * gf))), 1)
                    rank = jnp.cumsum(hit, axis=1) - 1      # per-instance hit#
                    keyv = jnp.where(hit, rank * K
                                     + jnp.arange(K, dtype=jnp.int32)[:, None],
                                     jnp.int32(K * N))
                    order = jnp.argsort(keyv.reshape(-1))[:Bg]   # [Bg]
                    k_idx = order // N
                    r_idx = order % N
                    hit_c = jnp.take(keyv.reshape(-1), order) < K * N
                    o_all = o_l[k_idx, r_idx]               # [Bg, 3]
                    d_all = d_l[k_idx, r_idx]
                    dn_c = dn[k_idx, r_idx]                 # [Bg]
                    qkw["bidx"] = jnp.asarray(
                        [ob.bidx for ob in obs], jnp.int32)[k_idx]
                    if cond is not None and getattr(obs[0].field, "use_time",
                                                    False):
                        qkw["cond"] = cond[r_idx]
                else:
                    # hit-first compaction to a per-instance budget, batched
                    sel = jnp.argsort(~hit, axis=1)[:, :B]  # [K, B]
                    take = lambda a: jnp.take_along_axis(
                        a, sel.reshape(sel.shape + (1,) * (a.ndim - 2)),
                        axis=1)
                    o_c, d_c = take(o_l), take(d_l)         # [K, B, 3]
                    dn_c = take(dn[..., None])[..., 0]      # [K, B]
                    hit_c = take(hit[..., None])[..., 0]
                    o_all = o_c.reshape(K * B, 3)
                    d_all = d_c.reshape(K * B, 3)
                    if shared:
                        qkw["bidx"] = jnp.repeat(
                            jnp.asarray([ob.bidx for ob in obs], jnp.int32),
                            B)
                    if cond is not None and getattr(obs[0].field, "use_time",
                                                    False):
                        # per-ray normalized time, compacted like the rays
                        qkw["cond"] = cond[sel].reshape(K * B, cond.shape[-1])
                if occ_states and model_id in occ_states \
                        and model_id in self.accels:
                    accel = self.accels[model_id]
                    st = occ_states[model_id]
                    bx = qkw.get("bidx")
                    qkw.setdefault(
                        "occ_t_fn",
                        lambda ro, rd, n_, f_, nc, k, accel=accel, st=st, bx=bx:
                        accel.ray_proposal(st, ro, rd, n_, f_, nc, key=k)
                        if bx is None else
                        accel.ray_proposal_batched(st, ro, rd, n_, f_, nc,
                                                   bx, key=k))
                buf_all = obs[0].field.ray_query(params[model_id], o_all,
                                                 d_all, key=kb, it=it,
                                                 with_rgb=with_rgb,
                                                 **{**qkw, **_qo})

                # world-t conversion, hit masking, nablas rotation, and
                # scatter-back, batched over the compacted rows
                if pair_mode:
                    rows = Bg
                    def resh(v):
                        return v                            # already [Bg, ...]
                else:
                    rows = (K, B)
                    def resh(v):
                        if hasattr(v, "shape") and v.ndim >= 1 \
                                and v.shape[0] == K * B:
                            return v.reshape((K, B) + v.shape[1:])
                        return v
                def is_rowed(v):
                    return hasattr(v, "shape") and (
                        v.shape[:1] == (rows,) if pair_mode
                        else v.ndim >= 2 and v.shape[:2] == rows)
                buf_b = {k: resh(v) for k, v in buf_all.items()
                         if k != "details"}
                det_b = {k: resh(v) for k, v in buf_all["details"].items()}
                # object-frame t -> world t: world o_w + t_w*d_w maps to
                # local o_l + (t_w*dn)*d_unit, so t_w = t_local / dn
                buf_b["t"] = buf_b["t"] / jnp.clip(dn_c[..., None], 1e-9)
                buf_b["mask"] = buf_b["mask"] & hit_c[..., None]
                buf_b["alpha"] = jnp.where(buf_b["mask"], buf_b["alpha"], 0.0)
                if "nablas" in buf_b:
                    if pair_mode:
                        n2w = (w[k_idx, r_idx] if per_ray_tf
                               else w[k_idx, 0])            # [Bg, 4, 4]
                        buf_b["nablas"] = apply_rotation(n2w[:, None],
                                                         buf_b["nablas"])
                    else:
                        n2w = take(w) if per_ray_tf else w  # [K,B|1,4,4]
                        buf_b["nablas"] = apply_rotation(n2w[:, :, None],
                                                         buf_b["nablas"])

                if pair_mode:
                    def scat(v):
                        if not is_rowed(v):
                            return v
                        # `order` indexes the flattened [K*N] pair grid and
                        # is unique, so one flat scatter restores [K, N, ...]
                        tgt = jnp.zeros((K * N,) + v.shape[1:], v.dtype)
                        return tgt.at[order].set(v).reshape(
                            (K, N) + v.shape[1:])
                else:
                    def scat(v):
                        if not is_rowed(v):
                            return v
                        return jax.vmap(
                            lambda s, vv: jnp.zeros((N,) + vv.shape[1:],
                                                    vv.dtype).at[s].set(vv)
                        )(sel, v)
                if pair_mode and not with_per_obj:
                    # training path: fold the whole group into ONE
                    # pseudo-source of M per-ray slot lanes [N, M*S] — the
                    # depth-merge sort and buffer memory stay O(M*S) per ray
                    # no matter how many instances the scene has
                    M = self.max_hits_per_ray
                    r_for_slot = jnp.where(hit_c, r_idx, N)
                    perm = jnp.argsort(r_for_slot)          # stable
                    r_s = r_for_slot[perm]
                    slot = jnp.arange(Bg) - jnp.searchsorted(r_s, r_s,
                                                             side="left")
                    flat_idx = jnp.where((r_s < N) & (slot < M),
                                         r_s * M + slot, N * M)

                    def slot_scat(v):
                        if not is_rowed(v):
                            return v
                        vs = v[perm]
                        tgt = jnp.zeros((N * M,) + v.shape[1:], v.dtype)
                        out = tgt.at[flat_idx].set(vs, mode="drop") \
                            .reshape((N, M) + v.shape[1:])
                        if v.ndim >= 2:     # fold slots into the sample axis
                            return out.reshape((N, M * v.shape[1])
                                               + v.shape[2:])
                        return out          # per-row scalars -> [N, M]
                    gbuf = {k: slot_scat(v) for k, v in buf_b.items()}
                    gbuf["details"] = {k: slot_scat(v)
                                       for k, v in det_b.items()}
                    buffers.append(gbuf)
                    names.append(f"group:{model_id}")
                else:
                    scattered = {k: scat(v) for k, v in buf_b.items()}
                    det_s = {k: scat(v) for k, v in det_b.items()}
                    for ki, ob in enumerate(obs):
                        buf = {k: (v[ki] if hasattr(v, "shape")
                                   and v.ndim >= 1 and v.shape[0] == K else v)
                               for k, v in scattered.items()}
                        buf["details"] = {
                            k: (v[ki] if hasattr(v, "shape") and v.ndim >= 1
                                and v.shape[0] == K else v)
                            for k, v in det_s.items()}
                        buffers.append(buf)
                        names.append(ob.obj_id)

        # --- street / close-range scene model -------------------------------
        cr_far = None
        cr_hit = None
        if "cr" in self.scene_models:
            field, mid, qcfg = self.scene_models["cr"]
            kb = jax.random.fold_in(key, 1000) if key is not None else None
            qcfg = dict(qcfg)
            if cond is not None and getattr(field, "use_time", False):
                qcfg["cond"] = cond
            if h_appear is not None and getattr(field, "appear_embed_dim", 0):
                qcfg["h_appear"] = h_appear
            if occ_states and "cr" in occ_states and "cr" in self.accels:
                accel = self.accels["cr"]
                st = occ_states["cr"]
                qcfg.setdefault("occ_t_fn",
                                lambda ro, rd, n_, f_, nc, k:
                                accel.ray_proposal(st, ro, rd, n_, f_, nc,
                                                   key=k))
            buf = field.ray_query(params[mid], rays_o, rays_d, key=kb, it=it,
                                  with_rgb=with_rgb, **{**qcfg, **_qo})
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
            dv_qo = {k: v for k, v in _qo.items() if k != "forward_inv_s"}
            buf = field.ray_query(params[mid], rays_o, rays_d, key=kb, it=it,
                                  near=dv_near, with_rgb=with_rgb,
                                  h_appear=h_appear, **{**qcfg, **dv_qo})
            buffers.append(buf)
            names.append("distant")

        # training only consumes the street ('cr') decomposition; render/eval
        # want every object's contribution (with_per_obj=True, the default)
        per_idx = None if with_per_obj else \
            [i for i, n in enumerate(names) if n in ("street", "distant")]
        rendered = merge_and_integrate(
            buffers, depth_use_normalized_vw=self.depth_use_normalized_vw,
            with_per_src=True, per_src_indices=per_idx)
        rendered["src_names"] = names
        rendered["rendered_per_obj_in_scene"] = {
            n: r for n, r in zip(names, rendered["per_src"])
            if r is not None}
        if "street" in names:
            rendered["rendered_cr"] = rendered["per_src"][names.index("street")]
            rendered["details_cr"] = buffers[names.index("street")]["details"]
        if "distant" in names and rendered["per_src"][names.index("distant")] \
                is not None:
            # cr/dv visibility split for the cross_cr_on_dv mask-entropy
            # disentangler (reference mask_entropy.py:80-110)
            rendered["rendered_dv"] = rendered["per_src"][names.index("distant")]

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
    def render_chunked(self, params: Params, frozen, rays_o: jnp.ndarray,
                       rays_d: jnp.ndarray, *, rayschunk: int = 4096,
                       key=None, **kw) -> Dict[str, Any]:
        """Memory-bounded full-frame compose rendering: fixed-size ray chunks
        via ``lax.map`` (the multi-object analog of the reference's
        ``rayschunk`` eval path). ``frozen`` is a single-frame slice shared
        by all chunks. Emits the composited volumes plus the
        per-object/per-class in-scene decomposition
        (``rendered_per_obj_in_scene``) when ``with_per_obj`` (default)."""
        n = rays_o.shape[0]
        pad = (-n) % rayschunk
        ro = jnp.concatenate([rays_o, jnp.ones((pad, 3), rays_o.dtype)], 0)
        rd = jnp.concatenate([rays_d, jnp.ones((pad, 3), rays_d.dtype)], 0)
        ro = ro.reshape(-1, rayschunk, 3)
        rd = rd.reshape(-1, rayschunk, 3)
        cond = kw.pop("cond", None)

        def body(args):
            o, d = args
            r = self.ray_query(params, frozen, o, d, key=key,
                               cond=(None if cond is None else
                                     jnp.broadcast_to(cond, (rayschunk, 1))),
                               **kw)
            out = {k: r[k] for k in ("rgb_volume", "depth_volume",
                                     "mask_volume", "normals_volume",
                                     "rgb_sky")
                   if k in r}
            out["per_obj"] = {
                nm: {k: v for k, v in sub.items()
                     if k in ("rgb_volume", "depth_volume", "mask_volume")}
                for nm, sub in r.get("rendered_per_obj_in_scene", {}).items()
                if sub is not None}
            return out

        out = jax.lax.map(body, (ro, rd))
        return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:])[:n], out)

    # ------------------------------------------------------------------
    @classmethod
    def from_asset_bank(cls, scene, bank, *, obj_query_cfg=None,
                        cr_class: str = "Street", distant_class: str = "Distant",
                        sky_class: str = "Sky", **kw) -> "BufferComposeRenderer":
        """Bind every scene drawable + scene-level models from an AssetBank."""
        objects = []
        accels = {}
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
            if getattr(asset, "accel", None) is not None:
                accels[mid] = asset.accel
        scene_models = {}
        for role, cname in (("cr", cr_class), ("distant", distant_class),
                            ("sky", sky_class)):
            for mid, asset in bank.assets.items():
                if bank.class_of[mid] == cname and asset.field is not None:
                    scene_models[role] = (asset.field, mid, asset.query_cfg)
                    if role == "cr" and getattr(asset, "accel", None) is not None:
                        accels["cr"] = asset.accel
                    break
        # fixed_cuboid_shells auto-wiring (see tools/train.build_everything):
        # the distant field's nearest shell is the street cuboid, so the
        # background cannot steal close-range content (r3 street-collapse fix)
        if "cr" in scene_models and "distant" in scene_models:
            dv = scene_models["distant"][0]
            cr_field = scene_models["cr"][0]
            if hasattr(dv, "set_cr_aabb") \
                    and getattr(dv, "cub_center", None) is None \
                    and hasattr(cr_field, "space"):
                dv.set_cr_aabb(cr_field.space)
        return cls(scene, objects, scene_models, obj_query_cfg=obj_query_cfg,
                   accels=accels, **kw)


def render_instance_segmentation(rendered: Dict[str, Any]) -> jnp.ndarray:
    """Per-ray argmax-source instance id from the per-src decomposition
    (reference z-buffer instance/class segmentation, :184-188)."""
    masses = jnp.stack([r["mask_volume"] for r in rendered["per_src"]], axis=-1)
    return jnp.argmax(masses, axis=-1)
