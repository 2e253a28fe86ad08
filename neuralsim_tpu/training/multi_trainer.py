"""Multi-object trainer over the BufferComposeRenderer (code_multi analog).

TPU-native re-design of ``code_multi/tools/train.py`` (reference, 1552 LoC —
SURVEY.md §2.6: same Trainer skeleton as code_single with the compose
renderer — step types 'pixel' / 'lidar' / 'image_patch'
(code_multi/tools/train.py:240-252), latent/deformation/flow losses,
per-class uniform eikonal, occ-grid states carried for batched models).
The scene is sliced at the batch's (vector) frame indices INSIDE the jitted
step, so object pose gradients remain reachable.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..losses import (clearance_loss, eikonal_loss, lidar_loss,
                      mask_entropy_loss, mask_occupancy_loss, mono_depth_loss,
                      mono_normals_loss, photometric_loss, s3im_loss,
                      sparsity_loss)
from .optimizers import make_optimizer
from .trainer import TrainState, apply_finite_guard


class MultiObjectTrainer:
    def __init__(self, scene, renderer, loss_cfgs: Dict[str, Dict],
                 training_cfgs: Optional[Dict[str, Dict]] = None,
                 uniform_sample_n: int = 256,
                 default_optim_cfg: Optional[Dict] = None,
                 pose_model_id: Optional[str] = None,
                 pose_enable_after: int = 0,
                 embed_model: Optional[Tuple[Any, str]] = None,
                 debug_grads: bool = False,
                 use_ts_interp: bool = False):
        self.scene = scene
        self.renderer = renderer
        self.loss_cfgs = dict(loss_cfgs)
        self.training_cfgs = dict(training_cfgs or {})
        self.uniform_sample_n = uniform_sample_n
        # pose refinement (LearnableParams): deltas applied INSIDE the jitted
        # slice_at — covers camera/ego nodes AND object nodes (the scene
        # graph carries per-object transforms; reference
        # code_multi/tools/train.py:104-139 wires the same asset)
        self.pose_model_id = pose_model_id
        self.pose_enable_after = pose_enable_after
        # per-frame appearance embeddings (ImageEmbeddings asset, model_id)
        self.embed_model = embed_model
        self.debug_grads = debug_grads
        # timestamp-mode (reference use_ts_interp, scenes.py:53-83): freeze
        # the graph by continuous-time interpolation — object tracks between
        # keyframes move smoothly instead of snapping to the frame grid
        self.use_ts_interp = use_ts_interp
        self.default_optim_cfg = default_optim_cfg or \
            {"lr": 1e-2, "betas": (0.9, 0.99), "eps": 1e-15}
        self.optimizer = None

    def init_state(self, key, params: Optional[Any] = None) -> TrainState:
        if params is None:
            raise ValueError("params must come from the AssetBank")
        self.optimizer = make_optimizer(self.training_cfgs, params,
                                        self.default_optim_cfg)
        # occupancy-grid EMA states for every accel-equipped model (incl.
        # batched per-instance grids of shared categorical models)
        occ = {mid: accel.init_state()
               for mid, accel in getattr(self.renderer, "accels", {}).items()} \
            or None
        return TrainState(params, self.optimizer.init(params),
                          jnp.asarray(0, jnp.int32), occ,
                          jnp.asarray(0, jnp.int32))

    # ------------------------------------------------------------------
    def _fields_by_model(self):
        seen: Dict[str, Any] = {}
        for ob in self.renderer.objects:
            seen.setdefault(ob.model_id, ob.field)
        for role in ("cr",):
            sm = self.renderer.scene_models.get(role)
            if sm is not None:
                field, mid, _ = sm
                seen.setdefault(mid, field)
        return seen

    def compute_losses(self, params, batch, it, key,
                       step_type: str = "pixel", occ=None,
                       cam_id: Optional[str] = None
                       ) -> Tuple[jnp.ndarray, Dict]:
        k_render, k_uniform, k_eik = jax.random.split(key, 3)
        with_rgb = step_type != "lidar"
        patch_hw = None
        if step_type in ("image_patch", "view") and "rays_xy" not in batch:
            patch_hw = batch["rays_o"].shape[:2]
            batch = {k: v.reshape((-1,) + v.shape[2:]) for k, v in batch.items()
                     if hasattr(v, "reshape")}
        if step_type in ("image_patch", "view") and "rays_xy" in batch:
            patch_hw = batch["rays_xy"].shape[:2]
            batch = {k: v.reshape((-1,) + v.shape[2:]) for k, v in batch.items()
                     if hasattr(v, "reshape")}
        # learnable pose deltas: applied to EVERY refined node (cameras AND
        # objects) inside the jitted slice, so gradients flow to the
        # refinement parameters through both ray lifting and the compose
        # renderer's per-object world transforms
        deltas = None
        if self.pose_model_id and self.pose_model_id in params:
            gate = (jnp.asarray(it) >= self.pose_enable_after).astype(
                jnp.float32)
            deltas = jax.tree.map(lambda a: a * gate,
                                  params[self.pose_model_id])
        if self.use_ts_interp:
            dts = None
            if deltas is not None and cam_id is not None \
                    and cam_id in deltas and "dts" in deltas[cam_id]:
                dts = deltas[cam_id]["dts"]
            ts = self.scene.sensor_ts(cam_id or self.scene.observer_ids()[0],
                                      batch["rays_fidx"], dts=dts)
            frozen = self.scene.interp_at(ts, pose_deltas=deltas)
        else:
            frozen = self.scene.slice_at(batch["rays_fidx"],
                                         pose_deltas=deltas)
        if "rays_xy" in batch and cam_id is not None:
            # in-jit ray lifting (pose gradients flow; reference defers
            # lifting to the trainer for exactly this reason)
            from ..scene.observers import camera_get_selected_rays
            ro, rd = camera_get_selected_rays(frozen, cam_id, batch["rays_xy"])
            batch = {**{k: v for k, v in batch.items() if k != "rays_xy"},
                     "rays_o": ro, "rays_d": rd}
        # per-ray appearance embedding from the frame index
        h_appear = None
        if self.embed_model is not None and cam_id is not None:
            easset, emid = self.embed_model
            if emid in params and cam_id in easset.tables:
                h_appear = easset.h_appear(params[emid], cam_id,
                                           batch["rays_fidx"])
        # normalized per-ray time for time-conditioned fields (dynamic
        # categorical models / EmerNeRF street) — forwarded only to fields
        # with use_time by the compose renderer
        cond = None
        if self.scene.n_frames > 1:
            cond = (batch["rays_fidx"].astype(jnp.float32)
                    / (self.scene.n_frames - 1))[:, None]
        rendered = self.renderer.ray_query(
            params, frozen, batch["rays_o"], batch["rays_d"],
            key=k_render, it=it, with_rgb=with_rgb, cond=cond,
            h_appear=h_appear,
            only_cr=(step_type == "lidar"), occ_states=occ,
            return_buffer=True, with_per_obj=False)
        buf = rendered.get("merged_buffer")
        if with_rgb and getattr(self.renderer, "postprocessor", None) \
                is not None and "rays_fidx" in batch:
            rendered = dict(rendered)
            rendered["rgb_volume"] = self.renderer.apply_postprocess(
                params, rendered["rgb_volume"], batch["rays_fidx"])

        losses: Dict[str, jnp.ndarray] = {}
        aux: Dict[str, Any] = {}
        if step_type in ("pixel", "image_patch"):
            if "rgb" in self.loss_cfgs:
                losses["loss_rgb"], ph = photometric_loss(rendered, batch, it,
                                                          self.loss_cfgs["rgb"])
                aux.update(ph)
            if "occupancy_mask" in self.loss_cfgs and \
                    "image_occupancy_mask" in batch:
                losses["loss_mask"] = mask_occupancy_loss(
                    rendered, batch, it, self.loss_cfgs["occupancy_mask"])
            if "mask_entropy" in self.loss_cfgs:
                me_cfg = self.loss_cfgs["mask_entropy"]
                if me_cfg.get("mode", "").startswith("cross") and \
                        "rendered_cr" in rendered and "rendered_dv" in rendered:
                    from ..losses import cross_cr_dv_entropy_loss
                    losses["loss_mask_entropy"] = cross_cr_dv_entropy_loss(
                        rendered, it, me_cfg)
                else:
                    losses["loss_mask_entropy"] = mask_entropy_loss(
                        rendered, it, me_cfg)

        if step_type == "image_patch":
            if "s3im" in self.loss_cfgs:
                losses["loss_s3im"] = s3im_loss(
                    rendered["rgb_volume"], batch["image_rgb"], it,
                    self.loss_cfgs["s3im"], key=k_eik)
            if "perceptual" in self.loss_cfgs and patch_hw is not None:
                from ..losses import perceptual_loss
                ph_, pw_ = patch_hw
                losses["loss_perceptual"] = perceptual_loss(
                    rendered["rgb_volume"].reshape(1, ph_, pw_, 3),
                    batch["image_rgb"].reshape(1, ph_, pw_, 3), it,
                    self.loss_cfgs["perceptual"])
            if "mono_depth" in self.loss_cfgs and "image_mono_depth" in batch:
                ph_, pw_ = patch_hw
                dm = batch.get("image_occupancy_mask",
                               jnp.ones(batch["rays_o"].shape[0]))
                losses["loss_mono_depth"] = mono_depth_loss(
                    rendered["depth_volume"].reshape(1, ph_, pw_),
                    batch["image_mono_depth"].reshape(1, ph_, pw_),
                    dm.reshape(1, ph_, pw_) > 0.5, it,
                    self.loss_cfgs["mono_depth"])
            if "mono_normals" in self.loss_cfgs and \
                    "image_mono_normals" in batch and \
                    "normals_volume" in rendered:
                nm = batch.get("image_occupancy_mask",
                               jnp.ones(batch["rays_o"].shape[0]))
                losses["loss_mono_normals"] = mono_normals_loss(
                    rendered["normals_volume"], batch["image_mono_normals"],
                    nm > 0.5, it, self.loss_cfgs["mono_normals"],
                    w2c_rot=batch.get("w2c_rot"))

        if step_type == "lidar" and "lidar" in self.loss_cfgs:
            losses["loss_lidar"], lid_aux = lidar_loss(
                rendered, batch["ranges"], it, self.loss_cfgs["lidar"], buf=buf)
            aux.update({f"lidar_{k}": v for k, v in lid_aux.items()})

        # per-object eikonal + sparsity + clearance on each NeuS field's own
        # space (reference: per-class uniform sampling, code_multi/train.py:240-252)
        needs_uniform = any(k in self.loss_cfgs
                            for k in ("eikonal", "sparsity"))
        if needs_uniform:
            total_eik = jnp.asarray(0.0)
            total_sparse = jnp.asarray(0.0)
            for i, (mid, field) in enumerate(self._fields_by_model().items()):
                if not hasattr(field, "sample_pts_uniform"):
                    continue
                kk = jax.random.fold_in(k_uniform, i)
                x = field.space.uniform_points(kk, self.uniform_sample_n)
                bb = (jnp.zeros((self.uniform_sample_n,), jnp.int32)
                      if getattr(field, "n_instances", 0) else None)
                sdf_u, nab, _ = field.sdf_nablas_feat(params[mid], x, bidx=bb)
                if "eikonal" in self.loss_cfgs:
                    total_eik = total_eik + eikonal_loss(
                        nab, it, self.loss_cfgs["eikonal"], key=k_eik)
                if "sparsity" in self.loss_cfgs:
                    total_sparse = total_sparse + sparsity_loss(
                        sdf_u, it, self.loss_cfgs["sparsity"])
            if "eikonal" in self.loss_cfgs:
                # on-render eikonal: regularize the SDF at the RENDER samples
                # too (reference on_render_type, eikonal.py:31-70; the single
                # trainer defaults to ratio 1.0). Uniform box samples almost
                # never land near a street-scale surface, so without this the
                # SDF renders correctly but is non-metric — and the inv_s
                # anneal + occ grid (both metric) then destroy it (r4
                # streetsky bisect: road probe +9 while lidar depth fits).
                ecfg = self.loss_cfgs["eikonal"]
                # default matches the reference's EikonalLoss
                # on_render_ratio=0.1 (eikonal.py:33) — ADVICE r4: the
                # prior silent 1.0 changed loss magnitudes for configs
                # that never set the key
                orr = ecfg.get("on_render_ratio", 0.1)
                if buf is not None and "nablas" in buf and orr > 0:
                    emask = buf["mask"]
                    if "src" in buf and "src_names" in rendered:
                        neus_src = jnp.asarray(
                            [1.0 if (nm == "street" or not nm.startswith(
                                ("distant", "sky")))
                             else 0.0
                             for nm in rendered["src_names"]])
                        emask = emask & (neus_src[buf["src"]] > 0)
                    total_eik = total_eik + orr \
                        * eikonal_loss(buf["nablas"], it, ecfg,
                                       mask=emask.astype(jnp.float32))
                losses["loss_eikonal"] = total_eik
            if "sparsity" in self.loss_cfgs:
                losses["loss_sparsity"] = total_sparse
        if "clearance" in self.loss_cfgs and "details_cr" in rendered:
            losses["loss_clearance"] = clearance_loss(
                rendered["details_cr"]["near_sdf"], it,
                self.loss_cfgs["clearance"])

        # EmerNeRF self-supervision: flow cycle consistency + dynamic-density
        # sparsity on the rendered samples (reference emernerf losses,
        # app/models/single/dynamic_nerf.py + FlowLoss)
        if "flow" in self.loss_cfgs or "dynamic_sparsity" in self.loss_cfgs:
            for mid, field in self._fields_by_model().items():
                if not hasattr(field, "flow_cycle_residual"):
                    continue
                if "flow" in self.loss_cfgs and getattr(field, "with_flow", False):
                    fcfg = self.loss_cfgs["flow"]
                    kk = jax.random.fold_in(k_uniform, 101)
                    x = field.space.uniform_points(kk, self.uniform_sample_n)
                    t01 = jax.random.uniform(jax.random.fold_in(kk, 1),
                                             x.shape[:-1])
                    res = field.flow_cycle_residual(params[mid], x, t01)
                    losses["loss_flow"] = jnp.mean(res) * fcfg.get("w", 0.01)
                if "dynamic_sparsity" in self.loss_cfgs and buf is not None \
                        and "sigma_dynamic" in buf:
                    dcfg = self.loss_cfgs["dynamic_sparsity"]
                    sd = jnp.where(buf["mask"], buf["sigma_dynamic"], 0.0)
                    losses["loss_dynamic_sparsity"] = \
                        jnp.mean(jnp.abs(sd)) * dcfg.get("w", 0.01)
                break

        # temporal-deformation regularizer for dynamic (time-conditioned)
        # categorical models (reference DeformationLoss,
        # app/loss/conditional.py:20 — a declared stub there; realized here)
        if "deformation" in self.loss_cfgs:
            from ..losses import deformation_loss
            dcfg = self.loss_cfgs["deformation"]
            total_def = jnp.asarray(0.0)
            for i, (mid, field) in enumerate(self._fields_by_model().items()):
                if not getattr(field, "use_time", False):
                    continue
                kk = jax.random.fold_in(k_uniform, 200 + i)
                x = field.space.uniform_points(kk, self.uniform_sample_n)
                t01 = jax.random.uniform(jax.random.fold_in(kk, 1),
                                         x.shape[:-1] + (1,))
                bb = None
                if getattr(field, "n_instances", 0):
                    bb = jax.random.randint(jax.random.fold_in(kk, 2),
                                            x.shape[:-1], 0,
                                            field.n_instances)
                total_def = total_def + deformation_loss(
                    field, params[mid], x, t01, it, dcfg, bidx=bb)
            losses["loss_deformation"] = total_def

        # latent norm regularizer for shared categorical models (reference
        # LatentLoss, app/loss/conditional.py:17)
        if "latent" in self.loss_cfgs:
            cfg = self.loss_cfgs["latent"]
            total_lat = jnp.asarray(0.0)
            for mid, field in self._fields_by_model().items():
                if hasattr(field, "latent_norm"):
                    total_lat = total_lat + field.latent_norm(params[mid])
            losses["loss_latent"] = total_lat * cfg.get("w", 1e-3)

        total = sum(losses.values(), jnp.asarray(0.0))
        aux["rendered_mask_mean"] = jnp.mean(rendered["mask_volume"])
        return total, {"losses": losses, "aux": aux}

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 4, 5, 6), donate_argnums=(1,))
    def train_step(self, state: TrainState, batch, key,
                   step_type: str = "pixel", cam_id: Optional[str] = None,
                   advance_it: bool = True):
        """cam_id (static) selects the camera for in-jit ray lifting of
        rays_xy batches; signature matches Trainer.train_step so
        make_sharded_train_step works on both. ``advance_it=False`` for
        secondary step types within one loop iteration (see
        Trainer.train_step)."""
        def loss_fn(p):
            return self.compute_losses(p, batch, state.it, key, step_type,
                                       occ=state.occ, cam_id=cam_id)
        (total, extras), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if self.debug_grads:
            for mid, g in grads.items():
                leaves = jax.tree_util.tree_leaves(g)
                if not leaves:
                    continue
                extras["aux"][f"gradnorm/{mid}"] = optax.global_norm(g)
                extras["aux"][f"nonfinite/{mid}"] = sum(
                    jnp.sum(~jnp.isfinite(l)) for l in leaves)
        params, opt_state, skips, ok = apply_finite_guard(
            self.optimizer, state, grads, total)

        # EMA occupancy refresh for every accel-equipped model (batched
        # categorical grids update all instances in one pass). Gated on
        # advance_it so only the primary step of each loop iteration
        # refreshes — secondary steps would double-apply the EMA decay
        # on cadence hits (ADVICE r3 medium).
        occ = state.occ
        if occ is not None and advance_it:
            k_occ = jax.random.fold_in(key, 7)
            occ = dict(occ)
            fields = self._fields_by_model()
            for mid, accel in self.renderer.accels.items():
                field = fields.get("cr" if mid == "cr" else mid)
                if field is None:
                    field = self.renderer.scene_models["cr"][0]
                fp = jax.lax.stop_gradient(
                    params[self.renderer.scene_models["cr"][1]
                           if mid == "cr" else mid])
                if getattr(field, "n_instances", 0):
                    occ[mid] = accel.maybe_update(
                        occ[mid],
                        lambda x, b, f=field, p=fp: f.query_sdf(p, x, bidx=b),
                        k_occ, state.it)
                else:
                    occ[mid] = accel.maybe_update(
                        occ[mid],
                        lambda x, f=field, p=fp: f.query_sdf(p, x),
                        k_occ, state.it)
        metrics = {"loss_total": total, **extras["losses"], **extras["aux"],
                   "step_skipped": 1 - ok.astype(jnp.int32),
                   "skips_total": skips}
        it_next = state.it + 1 if advance_it else state.it
        return TrainState(params, opt_state, it_next, occ, skips), metrics
