"""Quality A/B for bench-config variants on the real TPU: train the
synthetic scene for N iters with the full pipeline, report PSNR + rays/s.

Env knobs: BENCH_COARSE, BENCH_FINE, BENCH_MARCH, AB_ITERS (default 600).
Prints one JSON line per run.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from neuralsim_tpu.accel import OccGridEma
from neuralsim_tpu.dataio.synthetic import SyntheticObjectDataset
from neuralsim_tpu.fields import AABBSpace, NeRFDistantField, NeuSField, SimpleSky
from neuralsim_tpu.renderers import SingleVolumeRenderer
from neuralsim_tpu.training import Trainer, psnr


def main():
    coarse = int(os.environ.get("BENCH_COARSE", "16"))
    fine = tuple(int(x) for x in os.environ.get("BENCH_FINE", "8,8").split(",")
                 if x)
    march = int(os.environ.get("BENCH_MARCH", "48"))
    iters = int(os.environ.get("AB_ITERS", "600"))
    factors = tuple(1.0 * 4.0 ** i for i in range(len(fine))) or (1.0,)

    enc_cfg = {"type": "tpu_mixed",
               "n_levels": int(os.environ.get("BENCH_NLEVELS", "10")),
               "base_res": 16,
               "max_res": 1024,
               "n_feats": int(os.environ.get("BENCH_NFEATS", "4")),
               "n_hash_levels": int(os.environ.get("BENCH_NHASH", "2")),
               "log2_hashmap_size": 17,
               "cp_max_res": int(os.environ.get("BENCH_CPMAX", "512"))}
    space = AABBSpace((-1, -1, -1), (1, 1, 1))
    field = NeuSField(space, geometry="lotd", encoding_cfg=enc_cfg,
                      geo_feat_dim=15, decoder_hidden=64, radiance_hidden=64,
                      ln_inv_s_init=float(np.log(30.0)),
                      cos_anneal_stop_it=300,
                      remat=os.environ.get("BENCH_REMAT", "1") == "1",
                      compute_dtype=("bfloat16"
                                     if os.environ.get("BENCH_BF16", "0") == "1"
                                     else "float32"),
                      eval_chunk=2_000_000)
    renderer = SingleVolumeRenderer(
        {"cr": field,
         "distant": NeRFDistantField(inner_radius=1.0, geometry="mlp",
                                     geo_feat_dim=8, radiance_hidden=32),
         "sky": SimpleSky(hidden=32)},
        query_cfg={"num_coarse": coarse, "num_fine": fine,
                   "upsample_inv_s": 64.0, "upsample_inv_s_factors": factors},
        distant_query_cfg={"num_samples": 32})
    accel = OccGridEma(space, resolution=128, n_warmup_steps=100,
                       occ_inv_s=64.0, march_steps=march,
                       n_steps_between_update=16, samples_per_voxel=4)
    renderer.accels = {"cr": accel}
    trainer = Trainer(
        renderer,
        loss_cfgs={"rgb": {"fn_type": "huber", "w": 10.0},
                   "occupancy_mask": {"w": 0.3},
                   "eikonal": {"w": 0.01, "on_render_ratio": 0.3},
                   "sparsity": {"w": 0.002}},
        training_cfgs={"cr": {"lr": 1e-2}, "distant": {"lr": 5e-3},
                       "sky": {"lr": 3e-3}},
        uniform_sample_n=1024)
    state = trainer.init_state(jax.random.PRNGKey(0))

    n_rays = 8192
    ds = SyntheticObjectDataset(n_frames=8, H=128, W=128)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)

    t_train = 0.0
    for i in range(iters):
        b = ds.sample_pixels(rng, n_rays)
        batch = {k: jnp.asarray(v) for k, v in b.items()
                 if k in ("rays_o", "rays_d", "image_rgb",
                          "image_occupancy_mask")}
        key, sk = jax.random.split(key)
        t0 = time.perf_counter()
        state, m = trainer.train_step(state, batch, sk, "pixel")
        if i == 0 or i == 20:
            jax.block_until_ready(m["loss_total"])
        if i >= 20:
            jax.block_until_ready(m["loss_total"]) if i == iters - 1 else None
            t_train += time.perf_counter() - t0

    # eval PSNR on a fixed held ray set (deterministic render)
    b = ds.sample_pixels(np.random.default_rng(999), 16384)
    r = renderer.ray_query(state.params,
                           jnp.asarray(b["rays_o"]), jnp.asarray(b["rays_d"]),
                           key=None, occ_states=state.occ,
                           query_overrides={"perturb": False})
    p = float(psnr(r["rgb_volume"], jnp.asarray(b["image_rgb"])))
    rate = n_rays * (iters - 20) / t_train
    print(json.dumps({"coarse": coarse, "fine": list(fine), "march": march,
                      "iters": iters, "psnr": round(p, 2),
                      "rays_per_s": round(rate, 0),
                      "occ_frac": round(float(
                          accel.occupied_fraction(state.occ["cr"])), 4)}),
          flush=True)


if __name__ == "__main__":
    from neuralsim_tpu.utils.tpu_lock import tpu_chip_lock
    with tpu_chip_lock("scripts/quality_ab_r2.py"):
        main()
