"""Re-run a captured poisoned step on the REAL TPU to localize
platform-specific NaNs (the CPU replay of the same (state, batch, key) is
clean — scripts/repro_nan_debug.py — so the poison is in TPU numerics).

Usage: python scripts/repro_nan_tpu.py <exp_dir> <it> [--debug-nans]
"""
from __future__ import annotations

import os
import sys

import numpy as np
import yaml

sys.path.insert(0, "/root/repo")


def main():
    exp = sys.argv[1]
    it_want = sys.argv[2]
    import jax
    if "--debug-nans" in sys.argv:
        jax.config.update("jax_debug_nans", True)
    import jax.numpy as jnp

    from neuralsim_tpu.tools.train_multi import build_everything_multi
    from neuralsim_tpu.utils.checkpoint import CheckpointIO

    with open(os.path.join(exp, "config.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg.pop("platform", None)
    scene, bank, renderer, trainer, loader, dataset = \
        build_everything_multi(cfg)

    dump_dir = os.path.join(exp, "nan_dump")
    fn = [f for f in sorted(os.listdir(dump_dir)) if f"it{it_want}_" in f][0]
    z = np.load(os.path.join(dump_dir, fn))
    it = int(z["it"])
    step_type = str(z["step_type"])
    cam_id = str(z["cam_id"]) or None
    key = jnp.asarray(z["key"], jnp.uint32)
    batch = {k: jnp.asarray(z[k]) for k in z.files
             if k not in ("key", "it", "step_type", "cam_id")}
    print(f"repro[TPU {jax.devices()[0].platform}]: {fn} it={it} "
          f"step={step_type} cam={cam_id}", flush=True)

    k0 = jax.random.PRNGKey(cfg.get("seed", 42))
    params0 = bank.init_params(k0)
    state_t = trainer.init_state(k0, params=params0)
    ckpt = CheckpointIO(os.path.join(exp, "ckpts"))
    state = ckpt.load(state_t, f"nan_state_it{it}")
    params, occ = state.params, state.occ

    def loss_fn(pp):
        t, ex = trainer.compute_losses(pp, batch, jnp.asarray(it), key,
                                       step_type, occ=occ, cam_id=cam_id)
        return t, ex

    vg = jax.jit(lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p))
    (total, extras), grads = vg(params)
    print(f"total={float(total)}", flush=True)
    for k, v in sorted(extras["losses"].items()):
        print(f"  {k:24s} {float(v):.6g}", flush=True)
    for mid, g in grads.items():
        bad = sum(int(jnp.sum(~jnp.isfinite(l)))
                  for l in jax.tree_util.tree_leaves(g))
        tot = sum(int(l.size) for l in jax.tree_util.tree_leaves(g))
        print(f"grad[{mid}]: {bad}/{tot} nonfinite", flush=True)


if __name__ == "__main__":
    from neuralsim_tpu.utils.tpu_lock import tpu_chip_lock
    with tpu_chip_lock("scripts/repro_nan_tpu.py"):
        main()
