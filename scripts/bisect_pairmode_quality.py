"""Training-trajectory bisect for the pair-mode quality gap (r3).

At full coverage pair mode is bit-exact vs per-instance in a single fwd+grad
(scripts/debug_pairmode_grads.py, key=None) — yet 600-iter TPU A/Bs show a
consistent ~0.9 dB deficit. Train three arms with the SAME seed/budgets at
full coverage and eval through the deterministic oracle:

  perinst   group_frac=None hit_frac=None  (exact per-instance path)
  pairfold  group_frac=4.0 (ample)         training default: slot-lane fold
  pairscat  group_frac=4.0 + with_per_obj=True forced (per-obj scatter)

If pairfold < pairscat == perinst, the slot fold is the bug; if both pair
arms are low, the pair selection/ordering is.

Usage: python scripts/bisect_pairmode_quality.py [iters] [cpu|tpu]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

if "tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from neuralsim_tpu.dataio.synthetic_multi import SyntheticMultiObjectDataset
from neuralsim_tpu.renderers.buffer_compose import BufferComposeRenderer
from neuralsim_tpu.scene import AssetBank, Scene
from neuralsim_tpu.training import psnr
from neuralsim_tpu.training.multi_trainer import MultiObjectTrainer

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 300
N_RAYS = 1024

VEHICLE = {
    "model_class": "neuralsim_tpu.models.assets.ADGenerativeLoTDConcatNeuSObj",
    "model_params": {
        "z_dim": 8,
        "encoding_cfg": {"n_levels": 6, "base_res": 8, "max_res": 64,
                         "n_feats": 4, "cp_max_res": 64},
        "geo_feat_dim": 15, "radiance_hidden": 32, "inv_s_init": 30.0,
        "query_cfg": {"num_coarse": 24, "num_fine": (8,),
                      "upsample_inv_s_factors": (1.0,)}},
    "asset_params": {"training_cfg": {"lr": 8e-3}}}
STREET = {
    "model_class": "neuralsim_tpu.models.assets.LoTDNeuSStreet",
    "model_params": {
        "aabb": [[-4, -4, -1.2], [4, 4, 1.6]],
        "encoding_cfg": {"type": "tpu_mixed", "n_levels": 6, "base_res": 8,
                         "max_res": 128, "n_feats": 4, "n_hash_levels": 0,
                         "log2_hashmap_size": 15, "cp_max_res": 128},
        "geo_feat_dim": 15, "radiance_hidden": 32, "inv_s_init": 20.0,
        "accel_cfg": None, "pretrain": None,
        "query_cfg": {"num_coarse": 32, "num_fine": (8,),
                      "upsample_inv_s_factors": (1.0,)}},
    "asset_params": {"training_cfg": {"lr": 8e-3}}}
SKY = {"model_class": "neuralsim_tpu.models.assets.SimpleSkyAsset",
       "model_params": {"hidden": 32},
       "asset_params": {"training_cfg": {"lr": 3e-3}}}


def run(arm: str, seed: int = 0):
    ds = SyntheticMultiObjectDataset(n_frames=4, H=64, W=64)
    scene = Scene.load_from_scenario(ds.get_scenario())
    bank = AssetBank.create(
        {"Vehicle": VEHICLE, "Street": STREET, "Sky": SKY}, [scene])
    gf = None if arm == "perinst" else 4.0
    hf = None
    renderer = BufferComposeRenderer.from_asset_bank(
        scene, bank, group_budget_frac=gf, hit_budget_frac=hf)
    if arm == "pairscat":
        orig = renderer.ray_query
        renderer.ray_query = (
            lambda *a, **kw: orig(*a, **{**kw, "with_per_obj": True}))
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

    t0 = time.perf_counter()
    for _ in range(ITERS):
        batch = {k: jnp.asarray(v)
                 for k, v in ds.sample_pixels(rng, N_RAYS).items()}
        key, sk = jax.random.split(key)
        state, m = trainer.train_step(state, batch, sk)
    jax.block_until_ready(m["loss_total"])
    dt = time.perf_counter() - t0

    eval_rng = np.random.default_rng(99)
    eb = {k: jnp.asarray(v)
          for k, v in ds.sample_pixels(eval_rng, 4096).items()}
    frozen = scene.slice_at(eb["rays_fidx"])
    oracle = BufferComposeRenderer.from_asset_bank(
        scene, bank, group_budget_frac=None, hit_budget_frac=None)
    rendered = oracle.ray_query(state.params, frozen, eb["rays_o"],
                                eb["rays_d"], key=None, it=ITERS)
    p = float(psnr(rendered["rgb_volume"], eb["image_rgb"]))
    print(json.dumps({"arm": arm, "seed": seed, "iters": ITERS,
                      "psnr": round(p, 3), "train_s": round(dt, 1)}),
          flush=True)


if __name__ == "__main__":
    from neuralsim_tpu.utils.tpu_lock import tpu_chip_lock
    with tpu_chip_lock("scripts/bisect_pairmode_quality.py"):
        for arm in ("perinst", "pairfold", "pairscat"):
            run(arm)
