"""Multi-object trainer over the BufferComposeRenderer (code_multi analog).

TPU-native re-design of ``code_multi/tools/train.py`` (reference, 1552 LoC —
SURVEY.md §2.6: same Trainer skeleton as code_single with the compose
renderer, plus latent/deformation losses and per-class uniform eikonal).
The scene is sliced at the batch's (vector) frame indices INSIDE the jitted
step, so object pose gradients remain reachable.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..losses import (eikonal_loss, mask_entropy_loss, mask_occupancy_loss,
                      photometric_loss, sparsity_loss)
from .optimizers import make_optimizer
from .trainer import TrainState


class MultiObjectTrainer:
    def __init__(self, scene, renderer, loss_cfgs: Dict[str, Dict],
                 training_cfgs: Optional[Dict[str, Dict]] = None,
                 uniform_sample_n: int = 256,
                 default_optim_cfg: Optional[Dict] = None):
        self.scene = scene
        self.renderer = renderer
        self.loss_cfgs = dict(loss_cfgs)
        self.training_cfgs = dict(training_cfgs or {})
        self.uniform_sample_n = uniform_sample_n
        self.default_optim_cfg = default_optim_cfg or \
            {"lr": 1e-2, "betas": (0.9, 0.99), "eps": 1e-15}
        self.optimizer = None

    def init_state(self, key, params: Optional[Any] = None) -> TrainState:
        if params is None:
            raise ValueError("params must come from the AssetBank")
        self.optimizer = make_optimizer(self.training_cfgs, params,
                                        self.default_optim_cfg)
        return TrainState(params, self.optimizer.init(params),
                          jnp.asarray(0, jnp.int32), None)

    # ------------------------------------------------------------------
    def compute_losses(self, params, batch, it, key) -> Tuple[jnp.ndarray, Dict]:
        k_render, k_uniform, k_eik = jax.random.split(key, 3)
        frozen = self.scene.slice_at(batch["rays_fidx"])
        rendered = self.renderer.ray_query(
            params, frozen, batch["rays_o"], batch["rays_d"],
            key=k_render, it=it, return_buffer=True)
        buf = rendered.get("merged_buffer")

        losses: Dict[str, jnp.ndarray] = {}
        aux: Dict[str, Any] = {}
        if "rgb" in self.loss_cfgs:
            losses["loss_rgb"], ph = photometric_loss(rendered, batch, it,
                                                      self.loss_cfgs["rgb"])
            aux.update(ph)
        if "occupancy_mask" in self.loss_cfgs and "image_occupancy_mask" in batch:
            losses["loss_mask"] = mask_occupancy_loss(
                rendered, batch, it, self.loss_cfgs["occupancy_mask"])
        if "mask_entropy" in self.loss_cfgs:
            losses["loss_mask_entropy"] = mask_entropy_loss(
                rendered, it, self.loss_cfgs["mask_entropy"])

        # per-object eikonal + sparsity on each NeuS field's own space
        # (reference: per-class uniform sampling, code_multi/train.py:240-252)
        if "eikonal" in self.loss_cfgs:
            cfg = self.loss_cfgs["eikonal"]
            total_eik = jnp.asarray(0.0)
            seen = set()
            for i, ob in enumerate(self.renderer.objects):
                if ob.model_id in seen or not hasattr(ob.field, "sample_pts_uniform"):
                    continue
                seen.add(ob.model_id)
                kk = jax.random.fold_in(k_uniform, i)
                x = ob.field.space.uniform_points(kk, self.uniform_sample_n)
                bb = (jnp.zeros((self.uniform_sample_n,), jnp.int32)
                      if getattr(ob.field, "n_instances", 0) else None)
                _, nab, _ = ob.field.sdf_nablas_feat(params[ob.model_id], x,
                                                     bidx=bb)
                total_eik = total_eik + eikonal_loss(nab, it, cfg, key=k_eik)
            losses["loss_eikonal"] = total_eik

        # latent norm regularizer for shared categorical models (reference
        # LatentLoss, app/loss/conditional.py:17)
        if "latent" in self.loss_cfgs:
            cfg = self.loss_cfgs["latent"]
            total_lat = jnp.asarray(0.0)
            seen = set()
            for ob in self.renderer.objects:
                if ob.model_id in seen or not hasattr(ob.field, "latent_norm"):
                    continue
                seen.add(ob.model_id)
                total_lat = total_lat + ob.field.latent_norm(params[ob.model_id])
            losses["loss_latent"] = total_lat * cfg.get("w", 1e-3)

        total = sum(losses.values(), jnp.asarray(0.0))
        aux["rendered_mask_mean"] = jnp.mean(rendered["mask_volume"])
        return total, {"losses": losses, "aux": aux}

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def train_step(self, state: TrainState, batch, key):
        def loss_fn(p):
            return self.compute_losses(p, batch, state.it, key)
        (total, extras), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                   state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss_total": total, **extras["losses"], **extras["aux"]}
        return TrainState(params, opt_state, state.it + 1, None), metrics
