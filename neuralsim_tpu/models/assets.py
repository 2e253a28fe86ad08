"""Concrete asset models: NeuS/NeRF objects & streets, distant, sky,
pose refinement, image embeddings.

TPU-native re-design of ``app/models/`` (reference inventory SURVEY.md §2.2):
each asset adapts a field model into its scene role — OBJECT assets get a
unit-cube space scaled by the node, the street SCENE asset computes its
cuboid from camera tracks and pretrains the SDF to a road-surface prior,
Distant/Sky are SCENE-level, LearnableParams/ImageEmbeddings are MISC.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .asset_base import AssetAssignment, AssetModel
from ..accel import OccGridEma
from ..fields import AABBSpace, NeRFDistantField, NeRFField, NeuSField, SimpleSky, PureColorSky
from ..fields.embeddings import Embedding, SeqEmbedding


# ---------------------------------------------------------------------------
# SDF pretraining helpers (reference fields.sdf.pretrain_sdf_capsule /
# pretrain_sdf_road_surface, used by asset_training_initialize, neus.py:198-236)
# ---------------------------------------------------------------------------

def pretrain_sdf(field: NeuSField, params, target_sdf_fn, key, *,
                 n_iters: int = 300, n_pts: int = 4096, lr: float = 5e-3):
    """Fit the field's SDF to an analytic target over its space (jitted loop)."""
    opt = optax.adam(lr)

    def step(carry, k):
        p, os = carry
        x = field.space.uniform_points(k, n_pts)
        def loss_fn(pp):
            sdf = field.query_sdf(pp, x)
            return jnp.mean((sdf - target_sdf_fn(x)) ** 2)
        g = jax.grad(loss_fn)(p)
        up, os = opt.update(g, os, p)
        return (optax.apply_updates(p, up), os), None

    keys = jax.random.split(key, n_iters)
    (params, _), _ = jax.lax.scan(step, (params, opt.init(params)), keys)
    return params


def capsule_sdf(x, p0, p1, radius):
    """Capsule between p0-p1 (ego-track prior for object pretraining)."""
    pa = x - p0
    ba = p1 - p0
    h = jnp.clip(jnp.sum(pa * ba, -1) / jnp.clip(jnp.sum(ba * ba), 1e-9), 0.0, 1.0)
    return jnp.linalg.norm(pa - ba * h[..., None], axis=-1) - radius


def road_surface_sdf(x, z_road: float, up_axis: int = 2, sign: float = 1.0):
    """Half-space SDF: distance above the road plane (reference
    pretrain_sdf_road_surface — StreetSurf initializes the street SDF to the
    ego-track road height)."""
    return sign * (x[..., up_axis] - z_road)


# ---------------------------------------------------------------------------
# NeuS assets
# ---------------------------------------------------------------------------

class LoTDNeuSObj(AssetModel):
    """Object-centric hash-grid NeuS (reference single/neus.py:31)."""

    assignment = AssetAssignment.OBJECT

    def populate(self, scene=None, obj_ids=None) -> None:
        mp = self.model_params
        extent = mp.get("extent", 1.0)
        space = AABBSpace([-extent] * 3, [extent] * 3)
        self.field = NeuSField(
            space, geometry="lotd",
            encoding_cfg=mp.get("encoding_cfg", {"n_levels": 12, "base_res": 16,
                                                 "max_res": 512,
                                                 "log2_hashmap_size": 17}),
            geo_feat_dim=mp.get("geo_feat_dim", 15),
            radiance_hidden=mp.get("radiance_hidden", 64),
            ln_inv_s_init=float(np.log(mp.get("inv_s_init", 20.0))),
            cos_anneal_stop_it=mp.get("cos_anneal_stop_it", 0),
            appear_embed_dim=mp.get("appear_embed_dim", 0),
            remat=mp.get("remat", "auto"),
            eval_chunk=mp.get("eval_chunk", "auto"))
        self.query_cfg = dict(mp.get("query_cfg", {}))
        accel_cfg = mp.get("accel_cfg")
        if accel_cfg:
            self.accel = OccGridEma(space, accel_cfg.get("resolution", 64),
                                    occ_thre=accel_cfg.get("occ_thre", 0.3),
                                    ema_decay=accel_cfg.get("ema_decay", 0.95),
                                    occ_inv_s=accel_cfg.get("inv_s", 256.0),
                                    n_steps_between_update=accel_cfg.get(
                                        "n_steps_between_update", 16),
                                    samples_per_voxel=accel_cfg.get(
                                        "samples_per_voxel", 1))


class MLPNeuSObj(LoTDNeuSObj):
    """PE-MLP NeuS object (reference single/neus.py:97)."""

    def populate(self, scene=None, obj_ids=None) -> None:
        mp = self.model_params
        extent = mp.get("extent", 1.0)
        space = AABBSpace([-extent] * 3, [extent] * 3)
        self.field = NeuSField(space, geometry="mlp_pe",
                               pe_n_freqs=mp.get("pe_n_freqs", 6),
                               mlp_hidden=mp.get("mlp_hidden", 256),
                               mlp_depth=mp.get("mlp_depth", 8),
                               geo_feat_dim=mp.get("geo_feat_dim", 64),
                               ln_inv_s_init=float(np.log(mp.get("inv_s_init", 20.0))))
        self.query_cfg = dict(mp.get("query_cfg", {}))


class LoTDNeuSStreet(AssetModel):
    """StreetSurf close-range SDF (reference single/neus.py:128):
    ``populate`` derives the cuboid AABB from the union of camera frusta /
    track extents (:160-196); ``training_initialize`` pretrains the SDF to
    the road-surface prior (:198-236)."""

    assignment = AssetAssignment.SCENE

    def populate(self, scene=None, obj_ids=None) -> None:
        mp = self.model_params
        aabb = mp.get("aabb")
        if aabb is None and scene is not None:
            aabb = self._aabb_from_cameras(scene, mp)
        if aabb is None:
            aabb = ([-60, -60, -10], [60, 60, 30])
        space = AABBSpace(aabb[0], aabb[1])
        self.field = NeuSField(
            space, geometry="lotd",
            encoding_cfg=mp.get("encoding_cfg", {"n_levels": 14, "base_res": 16,
                                                 "max_res": 4096,
                                                 "log2_hashmap_size": 19}),
            geo_feat_dim=mp.get("geo_feat_dim", 15),
            radiance_hidden=mp.get("radiance_hidden", 64),
            ln_inv_s_init=float(np.log(mp.get("inv_s_init", 10.0))),
            inv_s_final=mp.get("inv_s_final", 2000.0),
            inv_s_anneal_start_it=mp.get("inv_s_anneal_start_it", 0),
            inv_s_anneal_stop_it=mp.get("inv_s_anneal_stop_it", 0),
            cos_anneal_stop_it=mp.get("cos_anneal_stop_it", 0),
            appear_embed_dim=mp.get("appear_embed_dim", 0),
            sdf_scale=mp.get("sdf_scale", 1.0),
            # NO sphere-init bias for streets: the object-centric default
            # (sdf += |x-c| - 0.5*mean(half)) puts a +10 m baseline at the
            # road for a street cuboid; whenever the grid's learned
            # cancellation drifts, the sphere resurfaces and empties the
            # street (every r4 collapse plateaued at exactly this baseline).
            # The road_surface pretrain provides the street init instead
            # (reference pretrain_sdf_road_surface, neus.py:198-236).
            radius_init=mp.get("radius_init", 0.0),
            remat=mp.get("remat", "auto"),
            eval_chunk=mp.get("eval_chunk", "auto"))
        self.query_cfg = dict(mp.get("query_cfg", {}))
        accel_cfg = mp.get("accel_cfg", {"resolution": 128})
        if accel_cfg:
            self.accel = OccGridEma(space, accel_cfg.get("resolution", 128),
                                    occ_thre=accel_cfg.get("occ_thre", 0.3),
                                    ema_decay=accel_cfg.get("ema_decay", 0.95),
                                    occ_inv_s=accel_cfg.get("inv_s", 256.0),
                                    n_steps_between_update=accel_cfg.get(
                                        "n_steps_between_update", 16),
                                    samples_per_voxel=accel_cfg.get(
                                        "samples_per_voxel", 1))

    @staticmethod
    def _aabb_from_cameras(scene, mp) -> Any:
        """Cuboid from camera positions extended forward/sideways (the
        reference extends the union of frusta to ``far``; we take the track
        bounding box inflated by ``extend_size``)."""
        import numpy as np
        pts = []
        for oid in scene.observer_ids():
            node = scene.observers[oid]
            if node.class_name != "Camera":
                continue
            T = np.asarray(node.frame_data["transform"])
            valid = np.asarray(node.frame_data["valid"])
            pts.append(T[valid, :3, 3])
        if not pts:
            return None
        pts = np.concatenate(pts, 0)
        ext = float(mp.get("extend_size", 60.0))
        lo = pts.min(0) - ext
        hi = pts.max(0) + ext
        return lo.tolist(), hi.tolist()

    def training_initialize(self, params, key, **kw):
        mp = self.model_params
        pre = mp.get("pretrain", {"type": "road_surface"})
        if not pre:
            return params
        space = self.field.space
        if pre.get("type") == "road_surface":
            z_road = pre.get("z_road")
            if z_road is None:
                z_road = float(space.center[pre.get("up_axis", 2)])
            target = lambda x: road_surface_sdf(x, z_road, pre.get("up_axis", 2),
                                                pre.get("sign", 1.0))
        elif pre.get("type") == "capsule":
            c = space.center
            target = lambda x: capsule_sdf(x, c - jnp.asarray(pre.get("half", [10, 0, 0])),
                                           c + jnp.asarray(pre.get("half", [10, 0, 0])),
                                           pre.get("radius", 2.0))
        else:
            return params
        return pretrain_sdf(self.field, params, target, key,
                            n_iters=pre.get("n_iters", 300),
                            n_pts=pre.get("n_pts", 4096), lr=pre.get("lr", 5e-3))


class MLPNeuSStreet(LoTDNeuSStreet):
    """PE-MLP street variant (reference single/neus.py:250)."""

    def populate(self, scene=None, obj_ids=None) -> None:
        mp = self.model_params
        aabb = mp.get("aabb") or self._aabb_from_cameras(scene, mp) \
            or ([-60, -60, -10], [60, 60, 30])
        space = AABBSpace(aabb[0], aabb[1])
        self.field = NeuSField(space, geometry="mlp_pe",
                               mlp_hidden=mp.get("mlp_hidden", 256),
                               mlp_depth=mp.get("mlp_depth", 8),
                               geo_feat_dim=mp.get("geo_feat_dim", 64),
                               ln_inv_s_init=float(np.log(mp.get("inv_s_init", 10.0))))
        self.query_cfg = dict(mp.get("query_cfg", {}))


# ---------------------------------------------------------------------------
# NeRF assets
# ---------------------------------------------------------------------------

class LoTDNeRFObj(AssetModel):
    assignment = AssetAssignment.OBJECT

    def populate(self, scene=None, obj_ids=None) -> None:
        mp = self.model_params
        extent = mp.get("extent", 1.0)
        self.field = NeRFField(AABBSpace([-extent] * 3, [extent] * 3),
                               geometry="lotd",
                               encoding_cfg=mp.get("encoding_cfg", {}),
                               appear_embed_dim=mp.get("appear_embed_dim", 0))
        self.query_cfg = dict(mp.get("query_cfg", {}))


class LoTDNeRFStreet(AssetModel):
    assignment = AssetAssignment.SCENE

    def populate(self, scene=None, obj_ids=None) -> None:
        mp = self.model_params
        aabb = mp.get("aabb", ([-60, -60, -10], [60, 60, 30]))
        self.field = NeRFField(AABBSpace(aabb[0], aabb[1]), geometry="lotd",
                               encoding_cfg=mp.get("encoding_cfg", {}),
                               appear_embed_dim=mp.get("appear_embed_dim", 0))
        self.query_cfg = dict(mp.get("query_cfg", {}))


class LoTDNeRFDistant(AssetModel):
    """NeRF++ background (reference single/nerf.py:145)."""

    assignment = AssetAssignment.SCENE

    def populate(self, scene=None, obj_ids=None) -> None:
        mp = self.model_params
        self.field = NeRFDistantField(
            inner_radius=mp.get("inner_radius", 1.0),
            geometry=mp.get("geometry", "lotd"),
            encoding_cfg=mp.get("encoding_cfg"),
            geo_feat_dim=mp.get("geo_feat_dim", 15),
            appear_embed_dim=mp.get("appear_embed_dim", 0),
            # fixed_cuboid_shells: explicit AABB here, or auto-wired from
            # the close-range model's space by the driver builders
            # (reference asset_populate cr_obj_classname semantics,
            # app/models/single/nerf.py:160-187)
            cr_aabb=mp.get("cr_aabb"))
        self.query_cfg = dict(mp.get("query_cfg", {}))


class NeRFDistant(LoTDNeRFDistant):
    def populate(self, scene=None, obj_ids=None) -> None:
        self.model_params.setdefault("geometry", "mlp")
        super().populate(scene, obj_ids)


# ---------------------------------------------------------------------------
# Environment / misc assets
# ---------------------------------------------------------------------------

class SimpleSkyAsset(AssetModel):
    assignment = AssetAssignment.SCENE

    def populate(self, scene=None, obj_ids=None) -> None:
        mp = self.model_params
        self.field = SimpleSky(hidden=mp.get("hidden", 64),
                               depth=mp.get("depth", 2),
                               sh_degree=mp.get("sh_degree", 4),
                               appear_embed_dim=mp.get("appear_embed_dim", 0))


class PureColorSkyAsset(AssetModel):
    assignment = AssetAssignment.SCENE

    def populate(self, scene=None, obj_ids=None) -> None:
        self.field = PureColorSky(self.model_params.get("color", (1, 1, 1)),
                                  self.model_params.get("learnable", False))


class ImageEmbeddings(AssetModel):
    """Per-frame appearance embeddings, one SeqEmbedding per camera
    (reference scene/image_embeddings.py:23; consumed via h_appear at
    single_volume_renderer.py:170-175)."""

    assignment = AssetAssignment.SCENE

    def populate(self, scene=None, obj_ids=None) -> None:
        mp = self.model_params
        self.dim = mp.get("dim", 4)
        self.cam_ids = [oid for oid in (scene.observer_ids() if scene else [])
                        if scene.observers[oid].class_name == "Camera"] \
            or mp.get("cam_ids", ["camera_0"])
        self.n_frames = scene.n_frames if scene else mp.get("n_frames", 1)
        self.tables = {cid: SeqEmbedding(self.n_frames, self.dim)
                       for cid in self.cam_ids}

    def init(self, key) -> Dict:
        keys = jax.random.split(key, len(self.tables))
        return {cid: t.init(k) for (cid, t), k in zip(self.tables.items(), keys)}

    def h_appear(self, params, cam_id: str, fi_or_ts, use_ts: bool = False):
        t = self.tables[cam_id]
        if use_ts:
            return t.at_time(params[cam_id], fi_or_ts)
        return t(params[cam_id], jnp.asarray(fi_or_ts, jnp.int32))


class LearnableParams(AssetModel):
    """Pose refinement / self-calibration (reference
    scene/learnable_params.py:28): per-node per-frame rotation-quaternion and
    translation *deltas* added to the scenario poses
    (RotationQuaternionRefinedAdd + TranslationRefinedAdd :98-112)."""

    assignment = AssetAssignment.MISC

    def populate(self, scene=None, obj_ids=None) -> None:
        mp = self.model_params
        self.refine_nodes = mp.get("refine_nodes") or \
            (scene.observer_ids() if scene else [])
        self.n_frames = scene.n_frames if scene else mp.get("n_frames", 1)
        self.enable_after = mp.get("enable_after", 0)
        # camera-intrinsics self-calibration (reference declares
        # refine_camera_intr, learnable_params.py:41 — a `pass` stub there;
        # realized here as per-frame (dfx, dfy, dcx, dcy) deltas)
        ri = mp.get("refine_intr", False)
        cams = [nid for nid in (scene.observer_ids() if scene else [])
                if scene.observers[nid].class_name == "Camera"] \
            if scene else []
        self.intr_nodes = (cams if ri is True else list(ri or []))
        # per-sensor timestamp refinement (reference refine_sensor_ts,
        # learnable_params.py:43,148-160 — real there, timestamp-mode only);
        # ts_holistic_offset=True learns ONE offset per sensor instead of
        # per-frame deltas (reference learn_holistic_offset)
        rt = mp.get("refine_ts", False)
        self.ts_nodes = ((scene.observer_ids() if scene else [])
                         if rt is True else list(rt or []))
        self.ts_holistic = bool(mp.get("ts_holistic_offset", False))

    def init(self, key) -> Dict:
        out = {}
        for nid in self.refine_nodes:
            out[nid] = {
                "dquat": jnp.zeros((self.n_frames, 3)),   # so(3) tangent delta
                "dtrans": jnp.zeros((self.n_frames, 3)),
            }
        for nid in self.intr_nodes:
            out.setdefault(nid, {})["dintr"] = jnp.zeros((self.n_frames, 4))
        for nid in self.ts_nodes:
            out.setdefault(nid, {})["dts"] = jnp.zeros(
                (1,) if self.ts_holistic else (self.n_frames,))
        return out

    @staticmethod
    def apply_intr_delta(intr: jnp.ndarray, dintr: jnp.ndarray) -> jnp.ndarray:
        """Add (dfx, dfy, dcx, dcy) deltas to [..., 3, 3] pinhole/OpenCV
        intrinsics (self-calibration; gradients flow through ray lifting)."""
        zero = jnp.zeros_like(dintr[..., 0])
        dmat = jnp.stack([
            jnp.stack([dintr[..., 0], zero, dintr[..., 2]], -1),
            jnp.stack([zero, dintr[..., 1], dintr[..., 3]], -1),
            jnp.stack([zero, zero, zero], -1)], -2)
        return intr + dmat

    @staticmethod
    def apply_delta(transform: jnp.ndarray, dquat: jnp.ndarray,
                    dtrans: jnp.ndarray) -> jnp.ndarray:
        """Apply small-rotation (exp-map) + translation deltas to [..., 4,4]."""
        from ..maths.transforms import make_transform, quat_to_rot
        # smoothed norm: d||v||/dv at v=0 is NaN; sqrt(|v|^2 + eps^2) keeps
        # the exp-map (sinc form) smooth through zero deltas
        sq = jnp.sum(dquat * dquat, axis=-1, keepdims=True)
        angle = jnp.sqrt(sq + 1e-16)
        half = 0.5 * angle
        w = jnp.cos(half)
        xyz = dquat * (jnp.sin(half) / angle)
        q = jnp.concatenate([w, xyz], axis=-1)
        dR = quat_to_rot(q)
        R = jnp.einsum("...ij,...jk->...ik", transform[..., :3, :3], dR)
        t = transform[..., :3, 3] + dtrans
        return make_transform(R, t)


class EmerNerfStreet(AssetModel):
    """Self-supervised static+dynamic street decomposition (reference
    EmerNerfStreet, app/models/single/dynamic_nerf.py:23): EmerNeRF field
    with LoTD static branch + permuto 4D dynamic branch + scene flow."""

    assignment = AssetAssignment.SCENE
    only_dynamic = False

    def populate(self, scene=None, obj_ids=None) -> None:
        from ..fields.emernerf import EmerNeRFField
        mp = self.model_params
        aabb = mp.get("aabb")
        if aabb is None and scene is not None:
            aabb = LoTDNeuSStreet._aabb_from_cameras(scene, mp)
        if aabb is None:
            aabb = ([-60, -60, -10], [60, 60, 30])
        self.field = EmerNeRFField(
            AABBSpace(aabb[0], aabb[1]),
            static_encoding_cfg=mp.get("static_encoding_cfg"),
            dynamic_permuto_cfg=mp.get("dynamic_permuto_cfg"),
            geo_feat_dim=mp.get("geo_feat_dim", 15),
            radiance_hidden=mp.get("radiance_hidden", 64),
            with_flow=mp.get("with_flow", True),
            only_dynamic=self.only_dynamic)
        self.query_cfg = dict(mp.get("query_cfg", {}))


class EmerNerfStreetOnlyDynamic(EmerNerfStreet):
    """Dynamic-only EmerNeRF variant (reference dynamic_nerf.py:93)."""

    only_dynamic = True


class ADGenerativePermutoConcatNeuSObj(AssetModel):
    """Categorical shared model: ONE generative permuto-NeuS for all
    instances of a class, per-instance auto-decoder latents.

    Reference analog: ``AD_GenerativePermutoConcatNeuSObj``
    (shared/batched_neus.py:295; populate builds z_ins embedding + batched
    occ grid with the class's average aspect ratio :321-365; conditioning via
    set_condition({'ins_id': ...}) :380-410 — SURVEY.md §2.2).
    """

    assignment = AssetAssignment.MULTI_OBJ_ONE_SCENE
    use_time = False

    def populate(self, scene=None, obj_ids=None) -> None:
        from ..accel import OccGridEmaBatched
        from ..fields.conditional import ConditionalPermutoNeuSField
        mp = self.model_params
        obj_ids = list(obj_ids or [])
        self.instance_index = {oid: i for i, oid in enumerate(obj_ids)}

        # canonical unit box with the class-average aspect ratio (reference
        # builds the shared space from mean instance scales)
        aspect = np.ones(3, np.float32)
        if scene is not None and obj_ids:
            scales = []
            for oid in obj_ids:
                sc = np.asarray(scene.drawables[oid].frame_data["scale"])
                valid = np.asarray(scene.drawables[oid].frame_data["valid"])
                if valid.any():
                    scales.append(sc[valid].mean(0))
            if scales:
                aspect = np.mean(scales, 0)
                aspect = aspect / max(aspect.max(), 1e-6)
        space = AABBSpace(-aspect, aspect)

        self.field = ConditionalPermutoNeuSField(
            space,
            n_instances=max(len(obj_ids), 1),
            z_dim=mp.get("z_dim", 4),
            use_time=self.use_time,
            permuto_cfg=mp.get("permuto_cfg", {"n_levels": 12, "base_res": 4.0,
                                               "max_res": 256.0,
                                               "log2_hashmap_size": 17}),
            geo_feat_dim=mp.get("geo_feat_dim", 15),
            radiance_hidden=mp.get("radiance_hidden", 64),
            ln_inv_s_init=float(np.log(mp.get("inv_s_init", 20.0))),
            cos_anneal_stop_it=mp.get("cos_anneal_stop_it", 0))
        self.query_cfg = dict(mp.get("query_cfg", {}))
        accel_cfg = mp.get("accel_cfg")
        if accel_cfg:
            self.accel = OccGridEmaBatched(
                space, n_instances=max(len(obj_ids), 1),
                resolution=accel_cfg.get("resolution", 32),
                occ_thre=accel_cfg.get("occ_thre", 0.3),
                ema_decay=accel_cfg.get("ema_decay", 0.95),
                occ_inv_s=accel_cfg.get("inv_s", 256.0))


class ADDynamicGenerativePermutoConcatNeuSObj(ADGenerativePermutoConcatNeuSObj):
    """Batched AND time-conditioned categorical model (pedestrians/cyclists)
    — reference AD_Dynamic_GenerativePermutoConcatNeuSObj_* variants
    (shared/batched_dynamic_neus.py:31,290)."""

    use_time = True


class DynamicPermutoConcatNeuSObj(AssetModel):
    """Time-conditioned NeuS for one dynamic object (reference
    DynamicPermutoConcatNeuSObj, single/dynamic_neus.py:28)."""

    assignment = AssetAssignment.OBJECT

    def populate(self, scene=None, obj_ids=None) -> None:
        from ..fields.conditional import ConditionalPermutoNeuSField
        mp = self.model_params
        extent = mp.get("extent", 1.0)
        self.field = ConditionalPermutoNeuSField(
            AABBSpace([-extent] * 3, [extent] * 3),
            n_instances=0, use_time=True,
            permuto_cfg=mp.get("permuto_cfg", {"n_levels": 12, "base_res": 4.0,
                                               "max_res": 256.0,
                                               "log2_hashmap_size": 17}),
            geo_feat_dim=mp.get("geo_feat_dim", 15),
            radiance_hidden=mp.get("radiance_hidden", 64),
            ln_inv_s_init=float(np.log(mp.get("inv_s_init", 20.0))))
        self.query_cfg = dict(mp.get("query_cfg", {}))


class PermutoNeuSObj(AssetModel):
    """Unconditioned permutohedral NeuS object (reference PermutoNeuSObj,
    single/neus.py:64)."""

    assignment = AssetAssignment.OBJECT

    def populate(self, scene=None, obj_ids=None) -> None:
        from ..fields.conditional import ConditionalPermutoNeuSField
        mp = self.model_params
        extent = mp.get("extent", 1.0)
        self.field = ConditionalPermutoNeuSField(
            AABBSpace([-extent] * 3, [extent] * 3),
            n_instances=0, use_time=False,
            permuto_cfg=mp.get("permuto_cfg", {"n_levels": 12, "base_res": 4.0,
                                               "max_res": 512.0,
                                               "log2_hashmap_size": 17}),
            geo_feat_dim=mp.get("geo_feat_dim", 15),
            radiance_hidden=mp.get("radiance_hidden", 64),
            ln_inv_s_init=float(np.log(mp.get("inv_s_init", 20.0))))
        self.query_cfg = dict(mp.get("query_cfg", {}))


class ADGenerativeLoTDConcatNeuSObj(ADGenerativePermutoConcatNeuSObj):
    """Categorical shared model on the GATHER-FREE backbone: one all-CP LoTD
    NeuS for all instances of a class, per-instance latents concatenated
    into the SDF decoder (``ConditionalLoTDNeuSField``).

    TPU flagship for RIGID categorical assets (vehicles). Same asset surface
    as ``ADGenerativePermutoConcatNeuSObj`` (instance_index, batched occ
    grid, batched queries, latent_norm) but the field evaluation is pure
    tent-matmul MXU work — no hash gathers forward, no scatter-adds
    backward. Reference analogs: ``AD_GenerativePermutoConcatNeuSObj``
    capability-wise (shared/batched_neus.py:295) and ``StyleLoTDNeuSModel``
    architecture-wise (latent-modulated LoTD, shared/batched_neus.py:35).
    ``encoding_cfg`` takes the LoTD (tpu_mixed) schema; ``permuto_cfg`` is
    accepted and ignored for config compatibility."""

    use_time = False

    def populate(self, scene=None, obj_ids=None) -> None:
        from ..accel import OccGridEmaBatched
        from ..fields.conditional import ConditionalLoTDNeuSField
        mp = self.model_params
        obj_ids = list(obj_ids or [])
        self.instance_index = {oid: i for i, oid in enumerate(obj_ids)}
        aspect = np.ones(3, np.float32)
        if scene is not None and obj_ids:
            scales = []
            for oid in obj_ids:
                sc = np.asarray(scene.drawables[oid].frame_data["scale"])
                valid = np.asarray(scene.drawables[oid].frame_data["valid"])
                if valid.any():
                    scales.append(sc[valid].mean(0))
            if scales:
                aspect = np.mean(scales, 0)
                aspect = aspect / max(aspect.max(), 1e-6)
        space = AABBSpace(-aspect, aspect)
        self.field = ConditionalLoTDNeuSField(
            space,
            n_instances=max(len(obj_ids), 1),
            z_dim=mp.get("z_dim", 8),
            use_time=self.use_time,
            encoding_cfg=mp.get("encoding_cfg"),
            geo_feat_dim=mp.get("geo_feat_dim", 15),
            radiance_hidden=mp.get("radiance_hidden", 64),
            ln_inv_s_init=float(np.log(mp.get("inv_s_init", 20.0))),
            cos_anneal_stop_it=mp.get("cos_anneal_stop_it", 0),
            remat=mp.get("remat", "auto"))
        self.query_cfg = dict(mp.get("query_cfg", {}))
        accel_cfg = mp.get("accel_cfg")
        if accel_cfg:
            self.accel = OccGridEmaBatched(
                space, n_instances=max(len(obj_ids), 1),
                resolution=accel_cfg.get("resolution", 32),
                occ_thre=accel_cfg.get("occ_thre", 0.3),
                ema_decay=accel_cfg.get("ema_decay", 0.95),
                occ_inv_s=accel_cfg.get("inv_s", 256.0))


class ADDynamicGenerativeLoTDConcatNeuSObj(ADGenerativeLoTDConcatNeuSObj):
    """Time-conditioned variant of the gather-free categorical model (time
    enters the decoder as a small sinusoidal embedding). For strongly
    deforming categories prefer the permuto-lattice variant."""

    use_time = True


class StyleLoTDNeuSObj(ADGenerativeLoTDConcatNeuSObj):
    """Config-name-compatible alias for the reference's style/latent-
    conditioned shared NeuS family (StyleLoTDNeuSObj,
    shared/batched_neus.py:35). Backed by ``ConditionalLoTDNeuSField`` —
    architecturally the same idea as the reference (an LoTD backbone whose
    MLP is modulated by a per-instance latent), realized with gather-free
    CP levels. ``z_dim`` maps the reference's style latent width."""


class ADStyleLoTDNeuSObj(StyleLoTDNeuSObj):
    """Reference ``AD_StyleLoTDNeuSObj`` (shared/batched_neus.py:80):
    auto-decoder variant — identical here since per-instance latents are
    always trained as an autodecoder bank."""


class StyleNeuSLXYObj(StyleLoTDNeuSObj):
    """Reference ``StyleNeuSLXYObj`` (shared/batched_neus.py:161) alias."""


class DITNeuS(StyleLoTDNeuSObj):
    """Reference ``DITNeuS`` (shared/batched_neus.py:285) alias; the DIT
    latent-bank mechanics collapse onto the same autodecoder latents."""


class DummyBox(AssetModel):
    """Space-only placeholder (reference asset_base.py:112)."""

    assignment = AssetAssignment.OBJECT

    def populate(self, scene=None, obj_ids=None) -> None:
        extent = self.model_params.get("extent", 1.0)
        self.field = None
        self.space = AABBSpace([-extent] * 3, [extent] * 3)

    def init(self, key) -> Dict:
        return {}
