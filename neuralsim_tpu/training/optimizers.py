"""Per-model optimizers: one optax multi-transform over the asset-bank pytree.

TPU-native equivalent of the reference's per-model Adam optimizers held by the
AssetBank (asset_bank.py:36,56-76; per-model lr/betas/eps from
``asset_params.training_cfg`` — SURVEY.md §1 key idea 2 and §7 design table).
Learning-rate schedules reuse ``training.annealers`` so
``training_update_lr(it)`` becomes a pure function of the iteration.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from .annealers import get_anneal_val


def make_lr_schedule(cfg: Dict[str, Any]) -> Callable:
    """Build an optax-compatible schedule from the reference's scheduler
    configs (exponential decay with warmup is the common case:
    ``training.scheduler {type: exponential, total_steps, decay_target_factor,
    warmup_steps}``)."""
    typ = cfg.get("type", "exponential")
    lr0 = float(cfg.get("lr", cfg.get("start_val", 1e-2)))
    total = int(cfg.get("total_steps", cfg.get("num_iters", 10000)))
    warmup = int(cfg.get("warmup_steps", 0))

    if typ == "constant":
        base = lambda it: jnp.asarray(lr0)
    elif typ == "exponential":
        target = lr0 * float(cfg.get("decay_target_factor", 0.1))
        def base(it):
            frac = jnp.clip(it / max(total, 1), 0.0, 1.0)
            return jnp.exp(jnp.log(lr0) + (jnp.log(target) - jnp.log(lr0)) * frac)
    elif typ == "cosine":
        target = lr0 * float(cfg.get("decay_target_factor", 0.0))
        def base(it):
            frac = jnp.clip(it / max(total, 1), 0.0, 1.0)
            return target + 0.5 * (lr0 - target) * (1 + jnp.cos(jnp.pi * frac))
    elif typ in ("milestones", "linear"):
        base = lambda it: get_anneal_val(it, **cfg)
    else:
        raise ValueError(typ)

    def sched(it):
        lr = base(jnp.asarray(it, jnp.float32))
        if warmup > 0:
            lr = lr * jnp.clip((it + 1) / warmup, 0.0, 1.0)
        return lr

    return sched


def make_optimizer(training_cfgs: Dict[str, Dict[str, Any]],
                   params_template: Dict[str, Any],
                   default_cfg: Optional[Dict[str, Any]] = None
                   ) -> optax.GradientTransformation:
    """One optimizer for the whole ``{model_id: params}`` bank, with per-model
    hyperparameters via optax.multi_transform.

    training_cfgs: {model_id: {lr, betas, eps, clip_grad_norm?, scheduler...}}.
    Models absent from training_cfgs use default_cfg (or Adam 1e-3).
    """
    default_cfg = default_cfg or {"lr": 1e-3}
    transforms: Dict[str, optax.GradientTransformation] = {}
    for model_id in params_template.keys():
        cfg = dict(default_cfg)
        cfg.update(training_cfgs.get(model_id, {}))
        sched = make_lr_schedule(cfg)
        b1, b2 = cfg.get("betas", (0.9, 0.99))
        eps = cfg.get("eps", 1e-15)
        chain = []
        if cfg.get("clip_grad_norm"):
            chain.append(optax.clip_by_global_norm(float(cfg["clip_grad_norm"])))
        if cfg.get("clip_grad_val"):
            chain.append(optax.clip(float(cfg["clip_grad_val"])))
        chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
        chain.append(optax.scale_by_schedule(lambda it, s=sched: -s(it)))
        transforms[model_id] = optax.chain(*chain)

    labels = {model_id: model_id for model_id in params_template.keys()}
    return optax.multi_transform(transforms, labels)


def current_lrs(training_cfgs: Dict[str, Dict[str, Any]], it,
                default_cfg: Optional[Dict[str, Any]] = None) -> Dict[str, jnp.ndarray]:
    """Per-model learning rates at iteration ``it`` (for logging — the
    reference logs lr per model, train.py:1473-1476)."""
    default_cfg = default_cfg or {"lr": 1e-3}
    out = {}
    for model_id, cfg in training_cfgs.items():
        c = dict(default_cfg)
        c.update(cfg)
        out[model_id] = make_lr_schedule(c)(it)
    return out
