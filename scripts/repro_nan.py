"""Offline root-cause harness for a finite-guard capture (VERDICT r5 item 1a).

Loads the (state, batch, key) snapshot that ``training.nan_debug`` captured
at the poisoned step, rebuilds the exact trainer from the run's config
snapshot, and bisects on CPU:
  1. forward: which rendered outputs / loss terms are non-finite;
  2. backward: gradient of EACH loss term separately -> which term's
     gradient poisons which model's params.

Usage: python scripts/repro_nan.py <exp_dir> [it]
"""
from __future__ import annotations

import os
import sys

import numpy as np
import yaml

sys.path.insert(0, "/root/repo")


def main():
    exp = sys.argv[1]
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from neuralsim_tpu.tools.train_multi import build_everything_multi
    from neuralsim_tpu.utils.checkpoint import CheckpointIO

    with open(os.path.join(exp, "config.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg.pop("platform", None)
    scene, bank, renderer, trainer, loader, dataset = \
        build_everything_multi(cfg)

    dump_dir = os.path.join(exp, "nan_dump")
    fn = sorted(os.listdir(dump_dir))[0] if len(sys.argv) < 3 else \
        [f for f in os.listdir(dump_dir) if f"it{sys.argv[2]}_" in f][0]
    z = np.load(os.path.join(dump_dir, fn))
    it = int(z["it"])
    step_type = str(z["step_type"])
    cam_id = str(z["cam_id"]) or None
    key = jnp.asarray(z["key"], jnp.uint32)
    batch = {k: jnp.asarray(z[k]) for k in z.files
             if k not in ("key", "it", "step_type", "cam_id")}
    print(f"repro: {fn} it={it} step={step_type} cam={cam_id}")

    k0 = jax.random.PRNGKey(cfg.get("seed", 42))
    params0 = bank.init_params(k0)
    state_t = trainer.init_state(k0, params=params0)
    ckpt = CheckpointIO(os.path.join(exp, "ckpts"))
    state = ckpt.load(state_t, f"nan_state_it{it}")
    params, occ = state.params, state.occ
    # the capture happens AFTER the skipped step: params are untouched but
    # `it` advanced by 1 — rewind so schedules match the poisoned step
    it_step = jnp.asarray(it, jnp.int32)

    def tree_nonfinite(tree):
        out = {}
        for mid, g in tree.items():
            bad = sum(int(jnp.sum(~jnp.isfinite(l)))
                      for l in jax.tree.leaves(g))
            if bad:
                out[mid] = bad
        return out

    bad_p = tree_nonfinite(params)
    print("nonfinite PARAMS:", bad_p or "none")

    # ---- forward ----------------------------------------------------------
    total, extras = trainer.compute_losses(params, batch, it_step, key,
                                           step_type, occ=occ, cam_id=cam_id)
    print(f"forward total={float(total)}")
    for k, v in sorted(extras["losses"].items()):
        print(f"  {k:24s} {float(v):.6g}")
    for k, v in sorted(extras["aux"].items()):
        try:
            print(f"  aux/{k:20s} {float(v):.6g}")
        except TypeError:
            pass

    # per-ray forward: find NaN rays in the rendered dict
    k_render, _, _ = jax.random.split(key, 3)
    from neuralsim_tpu.scene.observers import camera_get_selected_rays
    frozen = scene.slice_at(batch["rays_fidx"])
    ro, rd = camera_get_selected_rays(frozen, cam_id, batch["rays_xy"])
    rendered = renderer.ray_query(params, frozen, ro, rd, key=k_render,
                                  it=it_step, with_rgb=True, occ_states=occ,
                                  return_buffer=True)
    for k in ("rgb_volume", "depth_volume", "mask_volume"):
        v = np.asarray(rendered[k])
        nb = (~np.isfinite(v)).reshape(v.shape[0], -1).any(-1)
        print(f"rendered {k}: {int(nb.sum())} NaN rays"
              + (f" e.g. idx {np.where(nb)[0][:8]}" if nb.any() else ""))
    buf = rendered.get("merged_buffer")
    if buf:
        for k in ("t", "alpha", "nablas", "rgb"):
            if k in buf:
                v = np.asarray(buf[k])
                nb = int((~np.isfinite(v)).sum())
                print(f"buffer {k}: {nb} nonfinite entries")

    # ---- backward: per-loss gradients ------------------------------------
    loss_keys = sorted(extras["losses"].keys())
    for lk in loss_keys:
        def one_loss(p, lk=lk):
            t, ex = trainer.compute_losses(p, batch, it_step, key,
                                           step_type, occ=occ, cam_id=cam_id)
            return ex["losses"][lk]
        g = jax.grad(one_loss)(params)
        bad = tree_nonfinite(g)
        print(f"grad[{lk}]: " + (f"NONFINITE {bad}" if bad else "clean"))

    def total_loss(p):
        t, _ = trainer.compute_losses(p, batch, it_step, key, step_type,
                                      occ=occ, cam_id=cam_id)
        return t
    bad = tree_nonfinite(jax.grad(total_loss)(params))
    print("grad[TOTAL]:", bad or "clean")


if __name__ == "__main__":
    main()
