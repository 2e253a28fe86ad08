"""Mesh extraction CLI: SDF level set -> PLY.

TPU-native re-design of ``code_single/tools/extract_mesh.py`` (reference:
marching cubes over the SDF with --res / --to_world; SURVEY.md §2.6).
"""
from __future__ import annotations

import os

import numpy as np


def main_function(cfg):
    import jax
    if cfg.get("platform"):
        jax.config.update("jax_platforms", cfg["platform"])
    import jax.numpy as jnp
    from .train import build_everything
    from ..graphics import export_mesh_ply, extract_mesh
    from ..utils.checkpoint import CheckpointIO

    _, scene, bank, renderer, trainer, loader = build_everything(cfg)
    key = jax.random.PRNGKey(cfg.get("seed", 42))
    params = bank.init_params(key)
    exp_dir = cfg.get("resume_dir") or cfg.get("exp_dir", ".")
    ckpt = CheckpointIO(os.path.join(exp_dir, "ckpts"))
    state = trainer.init_state(key, params=params)
    restored = ckpt.load(state, cfg.get("ckpt"))
    if restored is not None:
        params = restored[0] if isinstance(restored, (tuple, list)) else restored.params

    cr = renderer.models["cr"]
    cr_params = params[renderer.pkey("cr")]
    res = int(cfg.get("res", 128))
    level = float(cfg.get("level", 0.0))

    sdf_jit = jax.jit(lambda x: cr.query_sdf(cr_params, x))

    # optional visible-grid constraint (reference consumes VisibleGrid as
    # model.accel during extraction, code_multi/tools/extract_mesh.py:55-59):
    # points outside the visible hull are forced outside the level set.
    vg = None
    if cfg.get("visible_grid"):
        from ..models.misc_assets import VisibleGrid
        vg = VisibleGrid.load(cfg["visible_grid"])

    def sdf_fn(pts):
        vals = np.asarray(sdf_jit(jnp.asarray(pts)))
        if vg is not None:
            vals = np.where(vg.contains(pts), vals, np.abs(vals) + 1e3)
        return vals

    space = cr.space
    verts, faces = extract_mesh(sdf_fn,
                                aabb_min=np.asarray(space.aabb_min),
                                aabb_max=np.asarray(space.aabb_max),
                                resolution=res, level=level)
    out = cfg.get("out", os.path.join(exp_dir, f"mesh_res{res}.ply"))
    export_mesh_ply(out, verts, faces)
    print(f"mesh: {verts.shape[0]} verts, {faces.shape[0]} faces -> {out}")
    return out


def main(argv=None):
    from ..config import BaseConfig
    cfg = BaseConfig("neuralsim_tpu extract_mesh").parse(argv)
    return main_function(cfg)


if __name__ == "__main__":
    main()
