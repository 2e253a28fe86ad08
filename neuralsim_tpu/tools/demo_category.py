"""Categorical latent demos: render one drawable with swapped/interpolated
instance latents.

TPU-native re-design of ``code_multi/tools/demo_category.py`` (reference,
505 LoC — SURVEY.md §2.6): the shared categorical model renders an object
with another instance's latent (identity swap) or a latent interpolation —
demonstrating the auto-decoder latent space.
"""
from __future__ import annotations

import os

import numpy as np


def main_function(cfg):
    import jax
    if cfg.get("platform"):
        jax.config.update("jax_platforms", cfg["platform"])
    import jax.numpy as jnp
    from .train_multi import build_everything_multi
    from ..scene.observers import camera_get_selected_rays
    from ..utils.checkpoint import CheckpointIO
    from ..utils.logger import _write_png

    scene, bank, renderer, trainer, loader, dataset = build_everything_multi(cfg)
    key = jax.random.PRNGKey(cfg.get("seed", 42))
    params = bank.init_params(key)
    exp_dir = cfg.get("resume_dir") or cfg.get("exp_dir", ".")
    ckpt = CheckpointIO(os.path.join(exp_dir, "ckpts"))
    state = trainer.init_state(key, params=params)
    restored = ckpt.load(state, cfg.get("ckpt"))
    if restored is not None:
        params = restored[0] if isinstance(restored, (tuple, list)) else restored.params

    dcfg = cfg.get("demo", {})
    fi = int(dcfg.get("frame", 0))
    n_steps = int(dcfg.get("n_interp", 5))
    # find the shared categorical model
    shared = [(mid, a) for mid, a in bank.assets.items()
              if getattr(a, "instance_index", None)]
    if not shared:
        raise SystemExit("no categorical shared asset in the bank")
    mid, asset = shared[0]
    inst_ids = list(asset.instance_index.items())
    if len(inst_ids) < 2:
        raise SystemExit("need >= 2 instances for a latent swap")
    (oid_a, ia), (oid_b, ib) = inst_ids[0], inst_ids[1]

    cam_id = loader.cam_ids[0]
    W, H = loader.image_wh(cam_id)
    ds = int(dcfg.get("downscale", 2))
    ys, xs = np.meshgrid(np.arange(H // ds), np.arange(W // ds), indexing="ij")
    xy = jnp.asarray(np.stack([xs * ds + 0.5 * ds, ys * ds + 0.5 * ds],
                              -1).reshape(-1, 2).astype(np.float32))
    out_dir = os.path.join(exp_dir, "demo_category")
    os.makedirs(out_dir, exist_ok=True)

    z = np.asarray(params[mid]["latents"])
    for step in range(n_steps):
        t = step / max(n_steps - 1, 1)
        z_mix = z.copy()
        # object A sweeps from its own identity to B's
        z_mix[ia] = (1 - t) * z[ia] + t * z[ib]
        p2 = dict(params)
        p2[mid] = {**params[mid], "latents": jnp.asarray(z_mix)}
        frozen = scene.slice_at(fi)
        ro, rd = camera_get_selected_rays(frozen, cam_id, xy)
        r = renderer.ray_query(p2, frozen, ro, rd, key=None)
        rgb = np.asarray(r["rgb_volume"]).reshape(H // ds, W // ds, 3)
        _write_png(os.path.join(out_dir, f"interp_{step:02d}.png"),
                   (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
    print(f"latent interpolation {oid_a} -> {oid_b}: {n_steps} frames -> {out_dir}")
    return out_dir


def main(argv=None):
    from ..config import BaseConfig
    return main_function(BaseConfig("neuralsim_tpu demo_category").parse(argv))


if __name__ == "__main__":
    main()
