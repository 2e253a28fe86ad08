"""Occupied-voxel export CLI.

TPU-native re-design of ``code_single/tools/extract_occgrid.py`` (reference,
186 LoC; npz output format documented at code_single/README.md:340-365 —
SURVEY.md §2.6): sample the SDF on a dense grid, threshold by half a voxel
diagonal, export occupied voxel coords + meta.
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
    space = cr.space
    mn = np.asarray(space.aabb_min)
    mx = np.asarray(space.aabb_max)
    voxel = (mx - mn) / res
    thresh = float(np.linalg.norm(voxel)) * 0.5

    sdf_jit = jax.jit(lambda x: cr.query_sdf(cr_params, x))
    xs = [np.linspace(mn[i] + voxel[i] / 2, mx[i] - voxel[i] / 2, res)
          for i in range(3)]
    pts = np.stack(np.meshgrid(*xs, indexing="ij"), -1).reshape(-1, 3).astype(np.float32)
    vals = np.empty(pts.shape[0], np.float32)
    for i in range(0, pts.shape[0], 65536):
        vals[i:i + 65536] = np.asarray(sdf_jit(jnp.asarray(pts[i:i + 65536])))
    occ = np.abs(vals) < thresh
    coords = np.stack(np.unravel_index(np.nonzero(occ)[0], (res, res, res)), -1)

    out = cfg.get("out", os.path.join(exp_dir, f"occgrid_res{res}.npz"))
    np.savez_compressed(out, occ_corners=coords.astype(np.int32),
                        sidelength=np.array([res] * 3, np.int32),
                        aabb_min=mn, aabb_max=mx, voxel_size=voxel,
                        occ_thresh=thresh)
    print(f"occgrid: {coords.shape[0]} occupied voxels / {res ** 3} -> {out}")
    return out


def main(argv=None):
    from ..config import BaseConfig
    cfg = BaseConfig("neuralsim_tpu extract_occgrid").parse(argv)
    return main_function(cfg)


if __name__ == "__main__":
    main()
