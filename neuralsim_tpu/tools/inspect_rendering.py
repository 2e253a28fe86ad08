"""Per-ray rendering introspection: dump sample buffers along chosen rays.

TPU-native re-design of ``code_multi/tools/inspect_rendering.py`` (reference,
973 LoC — SURVEY.md §2.6 misc row): for selected pixels, export the raw
volume buffer (t, sdf, alpha, visibility weights, per-source provenance) as
JSON/npz so training pathologies (floaters, double surfaces, empty rays) can
be diagnosed offline.
"""
from __future__ import annotations

import json
import os

import numpy as np


def inspect_rays(renderer, params, rays_o, rays_d, *, occ=None):
    """Returns a dict of per-sample arrays for the given rays [N, 3]."""
    import jax.numpy as jnp
    from ..ops.segment import alpha_to_vw
    out = renderer.ray_query(params, jnp.asarray(rays_o), jnp.asarray(rays_d),
                             key=None, occ_states=occ, return_buffer=True,
                             query_overrides={"perturb": False})
    buf = out["merged_buffer"]
    vw = alpha_to_vw(buf["alpha"], buf["mask"])
    rec = {"t": buf["t"], "mask": buf["mask"], "alpha": buf["alpha"], "vw": vw}
    for k in ("sdf", "src"):
        if k in buf:
            rec[k] = buf[k]
    rec["depth_volume"] = out["depth_volume"]
    rec["mask_volume"] = out["mask_volume"]
    return {k: np.asarray(v) for k, v in rec.items()}


def main_function(cfg):
    import jax
    if cfg.get("platform"):
        jax.config.update("jax_platforms", cfg["platform"])
    import jax.numpy as jnp
    from .train import build_everything
    from ..scene.observers import camera_get_selected_rays
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

    icfg = cfg.get("inspect", {})
    fi = int(icfg.get("frame", 0))
    cam_id = icfg.get("cam_id", loader.cam_ids[0])
    pixels = icfg.get("pixels")  # [[x, y], ...]
    if pixels is None:
        W, H = loader.image_wh(cam_id)
        pixels = [[W // 2, H // 2], [W // 4, H // 2], [3 * W // 4, H // 2]]
    xy = jnp.asarray(np.asarray(pixels, np.float32) + 0.5)
    fr = scene.slice_at(fi)
    ro, rd = camera_get_selected_rays(fr, cam_id, xy)
    rec = inspect_rays(renderer, params, ro, rd, occ=state.occ)

    out_dir = os.path.join(exp_dir, "inspect")
    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, f"rays_f{fi:04d}.npz"), **rec)
    # human-readable summary
    summary = []
    for i, px in enumerate(pixels):
        m = rec["mask"][i]
        summary.append({
            "pixel": list(map(int, px)),
            "n_valid_samples": int(m.sum()),
            "depth": float(rec["depth_volume"][i]),
            "opacity": float(rec["mask_volume"][i]),
            "peak_vw_t": float(rec["t"][i][rec["vw"][i].argmax()]),
        })
    with open(os.path.join(out_dir, f"summary_f{fi:04d}.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return summary


def main(argv=None):
    from ..config import BaseConfig
    return main_function(BaseConfig("neuralsim_tpu inspect_rendering").parse(argv))


if __name__ == "__main__":
    main()
