"""TPU repro via the trainer's own (compile-cached) train_step.

Re-runs the captured poisoned batch through trainer.train_step — the exact
graph the demo run executed (hits the .jax_cache AOT entry, so no 10-minute
recompile) — and reports step_skipped + every per-loss metric, then replays
the step N more times with perturbed keys to probe key-sensitivity.

Usage: python scripts/repro_nan_tpu_step.py <exp_dir> <it>
"""
from __future__ import annotations

import os
import sys

import numpy as np
import yaml

sys.path.insert(0, "/root/repo")


def main():
    exp, it_want = sys.argv[1], sys.argv[2]
    import jax
    import jax.numpy as jnp

    from neuralsim_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache(".jax_cache")
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
    print(f"repro[{jax.devices()[0].platform}] {fn}", flush=True)

    k0 = jax.random.PRNGKey(cfg.get("seed", 42))
    state_t = trainer.init_state(k0, params=bank.init_params(k0))
    ckpt = CheckpointIO(os.path.join(exp, "ckpts"))
    state = ckpt.load(state_t, f"nan_state_it{it}")
    # rewind it: the capture is post-skip (it advanced by 1)
    state = state._replace(it=jnp.asarray(it, jnp.int32))

    for trial, k in [("captured-key", key),
                     ("fold-1", jax.random.fold_in(key, 1)),
                     ("fold-2", jax.random.fold_in(key, 2))]:
        st = jax.tree.map(jnp.copy, state)
        st2, m = trainer.train_step(st, dict(batch), k, step_type, cam_id)
        mm = {kk: float(np.asarray(v)) for kk, v in m.items()
              if np.asarray(v).ndim == 0}
        bad = sorted(kk for kk, v in mm.items() if not np.isfinite(v))
        print(f"[{trial}] skipped={int(mm.get('step_skipped', -1))} "
              f"loss={mm.get('loss_total'):.6g} nonfinite={bad}", flush=True)


if __name__ == "__main__":
    from neuralsim_tpu.utils.tpu_lock import tpu_chip_lock
    with tpu_chip_lock("scripts/repro_nan_tpu_step.py"):
        main()
