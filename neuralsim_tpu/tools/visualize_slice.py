"""SDF slice visualization: axis-aligned cross-sections of the field -> PNG.

TPU-native re-design of ``code_single/tools/visualize_slice.py`` (reference,
207 LoC — SURVEY.md §2.6 misc row): sample the SDF on axis-aligned planes,
color by signed distance with the zero level set highlighted.
"""
from __future__ import annotations

import os

import numpy as np


def sdf_slice_image(sdf_fn, aabb_min, aabb_max, *, axis: int = 2,
                    coord: float = 0.0, res: int = 256) -> np.ndarray:
    """[res, res, 3] image of the slice at ``axis = coord``."""
    aabb_min = np.asarray(aabb_min, np.float32)
    aabb_max = np.asarray(aabb_max, np.float32)
    axes = [i for i in range(3) if i != axis]
    u = np.linspace(aabb_min[axes[0]], aabb_max[axes[0]], res)
    v = np.linspace(aabb_min[axes[1]], aabb_max[axes[1]], res)
    U, V = np.meshgrid(u, v)
    pts = np.zeros((res * res, 3), np.float32)
    pts[:, axes[0]] = U.ravel()
    pts[:, axes[1]] = V.ravel()
    pts[:, axis] = coord
    sdf = np.asarray(sdf_fn(pts)).reshape(res, res)

    scale = float(np.abs(sdf).mean()) * 2 + 1e-6
    t = np.tanh(sdf / scale)
    img = np.zeros((res, res, 3), np.float32)
    img[..., 0] = np.clip(t, 0, 1)              # outside: red
    img[..., 2] = np.clip(-t, 0, 1)             # inside: blue
    img[..., 1] = 0.2
    zero = np.abs(sdf) < scale * 0.02           # zero level set: white
    img[zero] = 1.0
    return img


def main_function(cfg):
    import jax
    if cfg.get("platform"):
        jax.config.update("jax_platforms", cfg["platform"])
    import jax.numpy as jnp
    from .train import build_everything
    from ..utils.checkpoint import CheckpointIO
    from ..utils.logger import _write_png

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
    sdf_jit = jax.jit(lambda x: cr.query_sdf(cr_params, x))
    out_dir = os.path.join(exp_dir, "slices")
    os.makedirs(out_dir, exist_ok=True)
    scfg = cfg.get("slice", {})
    res = int(scfg.get("res", 256))
    for axis in (0, 1, 2):
        for frac in (0.25, 0.5, 0.75):
            mn = np.asarray(cr.space.aabb_min)
            mx = np.asarray(cr.space.aabb_max)
            coord = float(mn[axis] + (mx[axis] - mn[axis]) * frac)
            img = sdf_slice_image(lambda p: np.asarray(sdf_jit(jnp.asarray(p))),
                                  mn, mx, axis=axis, coord=coord, res=res)
            _write_png(os.path.join(out_dir, f"axis{axis}_{frac:.2f}.png"),
                       (img * 255).astype(np.uint8))
    print(f"slices -> {out_dir}")
    return out_dir


def main(argv=None):
    from ..config import BaseConfig
    return main_function(BaseConfig("neuralsim_tpu visualize_slice").parse(argv))


if __name__ == "__main__":
    main()
