"""Pinpoint the first NaN-producing primitive in a captured poisoned step.

Same capture-loading as scripts/repro_nan.py but runs the jitted total-loss
value_and_grad under ``jax_debug_nans`` — JAX de-optimizes on the first
non-finite output and raises with the exact primitive + source line.

Usage: python scripts/repro_nan_debug.py <exp_dir> <it>
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
    jax.config.update("jax_debug_nans", True)
    import jax.numpy as jnp

    from neuralsim_tpu.tools.train_multi import build_everything_multi
    from neuralsim_tpu.utils.checkpoint import CheckpointIO

    with open(os.path.join(exp, "config.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg.pop("platform", None)
    scene, bank, renderer, trainer, loader, dataset = \
        build_everything_multi(cfg)

    it_want = sys.argv[2]
    dump_dir = os.path.join(exp, "nan_dump")
    fn = [f for f in sorted(os.listdir(dump_dir)) if f"it{it_want}_" in f][0]
    z = np.load(os.path.join(dump_dir, fn))
    it = int(z["it"])
    step_type = str(z["step_type"])
    cam_id = str(z["cam_id"]) or None
    key = jnp.asarray(z["key"], jnp.uint32)
    batch = {k: jnp.asarray(z[k]) for k in z.files
             if k not in ("key", "it", "step_type", "cam_id")}
    print(f"repro: {fn} it={it} step={step_type} cam={cam_id}", flush=True)

    k0 = jax.random.PRNGKey(cfg.get("seed", 42))
    params0 = bank.init_params(k0)
    state_t = trainer.init_state(k0, params=params0)
    ckpt = CheckpointIO(os.path.join(exp, "ckpts"))
    state = ckpt.load(state_t, f"nan_state_it{it}")
    params, occ = state.params, state.occ

    @jax.jit
    def vg(p):
        def loss_fn(pp):
            t, ex = trainer.compute_losses(pp, batch, jnp.asarray(it),
                                           key, step_type, occ=occ,
                                           cam_id=cam_id)
            return t, ex
        return jax.value_and_grad(loss_fn, has_aux=True)(p)

    print("running value_and_grad under jax_debug_nans...", flush=True)
    (total, extras), grads = vg(params)
    print(f"total={float(total)} (no NaN raised?)", flush=True)
    for k, v in sorted(extras["losses"].items()):
        print(f"  {k:24s} {float(v):.6g}", flush=True)


if __name__ == "__main__":
    main()
