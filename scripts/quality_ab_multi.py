"""Quality A/B: permuto-lattice-concat vs gather-free LoTD-concat vehicles.

Trains the synthetic multi-object scene (2 vehicles + street + sky) with each
categorical backbone for the same number of iterations at the same sample
budgets, then reports held-in PSNR and wall-clock. The guardrail for making
ADGenerativeLoTDConcatNeuSObj the rigid-class default.

Usage: python scripts/quality_ab_multi.py [iters] [cpu]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

if "cpu" in sys.argv:
    sys.argv.remove("cpu")
    jax.config.update("jax_platforms", "cpu")

from neuralsim_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache("/root/repo/.jax_cache")

from neuralsim_tpu.dataio.synthetic_multi import SyntheticMultiObjectDataset
from neuralsim_tpu.renderers.buffer_compose import BufferComposeRenderer
from neuralsim_tpu.scene import AssetBank, Scene
from neuralsim_tpu.training import psnr
from neuralsim_tpu.training.multi_trainer import MultiObjectTrainer

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 400
N_RAYS = 2048

VEHICLE_CFGS = {
    "permuto": {
        "model_class": "neuralsim_tpu.models.assets."
                       "ADGenerativePermutoConcatNeuSObj",
        "model_params": {
            "z_dim": 4,
            "permuto_cfg": {"n_levels": 8, "base_res": 4, "max_res": 128,
                            "log2_hashmap_size": 15},
            "geo_feat_dim": 15, "radiance_hidden": 32, "inv_s_init": 30.0,
            "query_cfg": {"num_coarse": 24, "num_fine": (8,),
                          "upsample_inv_s_factors": (1.0,)}},
        "asset_params": {"training_cfg": {"lr": 8e-3}}},
    "cp": {
        "model_class": "neuralsim_tpu.models.assets."
                       "ADGenerativeLoTDConcatNeuSObj",
        "model_params": {
            "z_dim": 8,
            "encoding_cfg": {"n_levels": 8, "base_res": 8, "max_res": 128,
                             "n_feats": 4, "cp_max_res": 128},
            "geo_feat_dim": 15, "radiance_hidden": 32, "inv_s_init": 30.0,
            "query_cfg": {"num_coarse": 24, "num_fine": (8,),
                          "upsample_inv_s_factors": (1.0,)}},
        "asset_params": {"training_cfg": {"lr": 8e-3}}},
}


def run(tag: str, group_frac=1.0, hit_frac=0.5, seed=0):
    ds = SyntheticMultiObjectDataset(n_frames=4, H=64, W=64)
    scene = Scene.load_from_scenario(ds.get_scenario())
    bank = AssetBank.create({
        "Vehicle": VEHICLE_CFGS[tag],
        "Street": {
            "model_class": "neuralsim_tpu.models.assets.LoTDNeuSStreet",
            "model_params": {
                "aabb": [[-4, -4, -1.2], [4, 4, 1.6]],
                "encoding_cfg": {"type": "tpu_mixed", "n_levels": 8,
                                 "base_res": 8, "max_res": 256, "n_feats": 4,
                                 "n_hash_levels": 0, "log2_hashmap_size": 15,
                                 "cp_max_res": 256},
                "geo_feat_dim": 15, "radiance_hidden": 32, "inv_s_init": 20.0,
                "accel_cfg": None, "pretrain": None,
                "query_cfg": {"num_coarse": 32, "num_fine": (8,),
                              "upsample_inv_s_factors": (1.0,)}},
            "asset_params": {"training_cfg": {"lr": 8e-3}}},
        "Sky": {"model_class": "neuralsim_tpu.models.assets.SimpleSkyAsset",
                "model_params": {"hidden": 32},
                "asset_params": {"training_cfg": {"lr": 3e-3}}},
    }, [scene])
    renderer = BufferComposeRenderer.from_asset_bank(
        scene, bank, group_budget_frac=group_frac, hit_budget_frac=hit_frac)
    trainer = MultiObjectTrainer(
        scene, renderer,
        loss_cfgs={"rgb": {"fn_type": "huber", "fn_param": {"delta": 0.1},
                           "w": 10.0},
                   "occupancy_mask": {"w": 0.3},
                   "eikonal": {"w": 0.01},
                   "latent": {"w": 1e-3}},
        training_cfgs=bank.training_cfgs(), uniform_sample_n=512)
    params = bank.init_params(jax.random.PRNGKey(seed))
    state = trainer.init_state(jax.random.PRNGKey(seed + 1), params=params)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed + 2)

    batch = {k: jnp.asarray(v) for k, v in ds.sample_pixels(rng, N_RAYS).items()}
    state, m = trainer.train_step(state, dict(batch), key)   # compile
    jax.block_until_ready(m["loss_total"])
    t0 = time.perf_counter()
    for i in range(ITERS):
        batch = {k: jnp.asarray(v)
                 for k, v in ds.sample_pixels(rng, N_RAYS).items()}
        key, sk = jax.random.split(key)
        state, m = trainer.train_step(state, batch, sk)
    jax.block_until_ready(m["loss_total"])
    dt = time.perf_counter() - t0

    # held-in eval: deterministic render of a fixed ray batch. PSNR is
    # always computed through the SAME exact uncompacted-oracle renderer so
    # the number measures what the run's TRAINING path learned, independent
    # of its own eval-time compaction budgets.
    eval_rng = np.random.default_rng(99)
    eb = {k: jnp.asarray(v)
          for k, v in ds.sample_pixels(eval_rng, 4096).items()}
    frozen = scene.slice_at(eb["rays_fidx"])
    oracle = BufferComposeRenderer.from_asset_bank(
        scene, bank, group_budget_frac=None, hit_budget_frac=None)
    rendered = oracle.ray_query(state.params, frozen, eb["rays_o"],
                                eb["rays_d"], key=None, it=ITERS)
    p = float(psnr(rendered["rgb_volume"], eb["image_rgb"]))
    print(json.dumps({"backbone": tag, "iters": ITERS, "seed": seed,
                      "group_budget_frac": group_frac,
                      "hit_budget_frac": hit_frac,
                      "psnr": round(p, 2), "train_s": round(dt, 1),
                      "rays_per_s": round(ITERS * N_RAYS / dt, 1)}),
          flush=True)
    return p


if __name__ == "__main__":
    from neuralsim_tpu.utils.tpu_lock import tpu_chip_lock
    with tpu_chip_lock("scripts/quality_ab_multi.py"):
        frac_args = [a for a in sys.argv if a.startswith("frac=")]
        if frac_args:
            # single extra ladder point, e.g. frac=2.0 (full pair coverage at K=2)
            for a in frac_args:
                sys.argv.remove(a)
                run("cp", group_frac=float(a.split("=", 1)[1]))
        elif "fracs" in sys.argv:
            # group-budget compaction quality sweep (VERDICT r2 item 2): the
            # uncompacted oracle vs realistic group budgets, same backbone/seed
            sys.argv.remove("fracs")
            run("cp", group_frac=None, hit_frac=None)      # exact O(K*N) oracle
            for gf in (1.0, 0.5, 0.25):
                run("cp", group_frac=gf)
        elif "seeds" in sys.argv:
            # seed-variance of the pair-mode-vs-per-instance comparison: at full
            # hit coverage both paths compute the same math (bit-exact fwd+grad,
            # scripts/debug_pairmode_grads.py), so run-to-run PSNR spread across
            # seeds is the yardstick for reading any single-seed gap
            sys.argv.remove("seeds")
            for s in (0, 1, 2):
                run("cp", group_frac=None, hit_frac=0.5, seed=s)   # per-instance
                run("cp", group_frac=1.0, hit_frac=0.5, seed=s)    # pair mode
        else:
            for tag in ("cp", "permuto"):
                run(tag)
