"""Scalar schedules ("annealers") driving loss weights, inv_s control, etc.

Reference analog: ``nr3d_lib.models.annealers.get_annealer/get_anneal_val``
(SURVEY.md §2.9 + Appendix C — annealers drive loss weights, LoTD level
hardmask, NeuS var_ctrl, LoS epsilon milestones). Pure-jnp so schedules can
live inside jitted train steps with the iteration index as a traced scalar.

Config shape (mirrors the reference's config surface)::

    {type: linear,     start_it, stop_it, start_val, stop_val}
    {type: exponential, ...}
    {type: milestones, milestones: [it0, it1, ...], vals: [v0, v1, ..., vK]}
    {type: constant,   val}
    {type: hardmask_level, start_level, stop_it, num_levels}  # LoTD level anneal
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Union

import jax.numpy as jnp

Numeric = Union[float, jnp.ndarray]


def _linear(it, start_it, stop_it, start_val, stop_val):
    frac = jnp.clip((it - start_it) / max(stop_it - start_it, 1e-9), 0.0, 1.0)
    return start_val + (stop_val - start_val) * frac


def _exponential(it, start_it, stop_it, start_val, stop_val):
    frac = jnp.clip((it - start_it) / max(stop_it - start_it, 1e-9), 0.0, 1.0)
    return jnp.exp(jnp.log(start_val) + (jnp.log(stop_val) - jnp.log(start_val)) * frac)


def _milestones(it, milestones, vals):
    milestones = jnp.asarray(milestones, dtype=jnp.float32)
    vals = jnp.asarray(vals, dtype=jnp.float32)
    idx = jnp.sum((jnp.asarray(it, jnp.float32) >= milestones).astype(jnp.int32))
    return vals[jnp.clip(idx, 0, vals.shape[0] - 1)]


def get_anneal_val(it: Numeric, **cfg: Any) -> jnp.ndarray:
    """Evaluate a schedule config at iteration ``it`` (traced-scalar safe)."""
    typ = cfg.get("type", "constant")
    if typ == "constant":
        return jnp.asarray(cfg.get("val", cfg.get("w", 1.0)), jnp.float32)
    if typ == "linear":
        return _linear(it, cfg.get("start_it", 0), cfg["stop_it"],
                       cfg.get("start_val", 0.0), cfg.get("stop_val", 1.0))
    if typ == "exponential":
        return _exponential(it, cfg.get("start_it", 0), cfg["stop_it"],
                            cfg.get("start_val", 1e-3), cfg.get("stop_val", 1.0))
    if typ == "milestones":
        return _milestones(it, cfg["milestones"], cfg["vals"])
    if typ == "mix_linear":
        # NeuS var_ctrl: learned value mixed linearly toward a scheduled final
        # value (reference var_ctrl_cfg ctrl_type: mix_linear, SURVEY.md §2.9).
        # Returns the mixing fraction in [0, 1]; caller mixes learned/final.
        return _linear(it, cfg.get("start_it", 0), cfg["stop_it"], 0.0, 1.0)
    raise ValueError(f"Unknown annealer type: {typ}")


def make_annealer(cfg: Dict[str, Any]) -> Callable[[Numeric], jnp.ndarray]:
    """Bind a schedule config into a callable ``it -> value``."""
    cfg = dict(cfg)
    return lambda it: get_anneal_val(it, **cfg)
