"""Multi-object compose-renderer throughput vs object count K.

Quantifies the hit-ray-compaction design (BufferComposeRenderer: per-object
compaction to a fixed budget + ONE batched query per shared model —
O(K*B*S), reference batched_query_shared on hit-compacted rays,
buffer_compose_renderer.py:209-391): full train-step rays/s for a scene with
K shared-model vehicles + street + sky, at 8192 rays.

Run on the real TPU: python scripts/bench_multi.py [K ...]
Prints one JSON line per K.
"""
from __future__ import annotations

import json
import math
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

if "cpu" in sys.argv:  # smoke mode: tiny shapes off-TPU
    sys.argv.remove("cpu")
    jax.config.update("jax_platforms", "cpu")

from neuralsim_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache("/root/repo/.jax_cache")

from neuralsim_tpu.dataio.synthetic import look_at
from neuralsim_tpu.renderers.buffer_compose import BufferComposeRenderer
from neuralsim_tpu.scene import AssetBank, Scene
from neuralsim_tpu.training.multi_trainer import MultiObjectTrainer


def make_scenario(K: int, T: int = 4):
    """K vehicles on a ring + ground street + one orbiting camera."""
    H = W = 64
    f = 0.5 * W / math.tan(math.radians(55.0) / 2)
    intr = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    c2ws = np.stack([
        look_at(np.array([4.0 * math.cos(0.5 * i / T * np.pi * 2),
                          4.0 * math.sin(0.5 * i / T * np.pi * 2), 1.5]),
                np.array([0.0, 0.0, 0.0]), up=(0, 0, 1))
        for i in range(T)], axis=0)
    objects = {}
    for k in range(K):
        ang = 2 * np.pi * k / K
        trs = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
        trs[:, 0, 3] = 1.6 * np.cos(ang)
        trs[:, 1, 3] = 1.6 * np.sin(ang)
        trs[:, 2, 3] = -0.1
        objects[f"veh_{k}"] = {"class_name": "Vehicle", "segments": [{
            "start_frame": 0, "n_frames": T,
            "data": {"transform": trs,
                     "scale": np.full((T, 3), 0.4, np.float32)}}]}
    ground = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
    ground[:, 2, 3] = -0.6
    objects["street"] = {"class_name": "Street", "segments": [{
        "start_frame": 0, "n_frames": T,
        "data": {"transform": ground,
                 "scale": np.ones((T, 3), np.float32)}}]}
    return {
        "scene_id": f"bench_multi_{K}",
        "metas": {"num_frames": T, "up_vec": "+z"},
        "observers": {"camera_0": {
            "class_name": "Camera", "n_frames": T,
            "data": {"transform": c2ws, "intr": np.tile(intr, (T, 1, 1)),
                     "hw": np.tile([H, W], (T, 1)),
                     "global_ts": np.arange(T, dtype=np.float32)}}},
        "objects": objects,
    }


def vehicle_model_cfg():
    """BENCH_VEH=cp (default) — gather-free latent-concat LoTD categorical
    model; BENCH_VEH=permuto — the permuto-lattice-concat variant."""
    import os
    if os.environ.get("BENCH_VEH", "cp") == "permuto":
        return {
            "model_class": "neuralsim_tpu.models.assets."
                           "ADGenerativePermutoConcatNeuSObj",
            "model_params": {
                "z_dim": 4,
                "permuto_cfg": {"n_levels": 8, "base_res": 8, "max_res": 256,
                                "log2_hashmap_size": 15},
                "geo_feat_dim": 8, "radiance_hidden": 32, "inv_s_init": 40.0,
                "query_cfg": {"num_coarse": 24, "num_fine": (8,),
                              "upsample_inv_s_factors": (1.0,)}},
            "asset_params": {"training_cfg": {"lr": 8e-3}}}
    return {
        "model_class": "neuralsim_tpu.models.assets."
                       "ADGenerativeLoTDConcatNeuSObj",
        "model_params": {
            "z_dim": 8,
            "encoding_cfg": {"n_levels": 8, "base_res": 8, "max_res": 256,
                             "n_feats": 4, "cp_max_res": 256},
            "geo_feat_dim": 8, "radiance_hidden": 32, "inv_s_init": 40.0,
            "query_cfg": {"num_coarse": 24, "num_fine": (8,),
                          "upsample_inv_s_factors": (1.0,)}},
        "asset_params": {"training_cfg": {"lr": 8e-3}}}


def run(K: int, n_rays: int = None, iters: int = None):
    import os
    n_rays = n_rays or int(os.environ.get("BENCH_RAYS", "8192"))
    iters = iters or int(os.environ.get("BENCH_ITERS", "20"))
    scene = Scene.load_from_scenario(make_scenario(K))
    bank = AssetBank.create({
        "Vehicle": vehicle_model_cfg(),
        "Street": {
            "model_class": "neuralsim_tpu.models.assets.LoTDNeuSStreet",
            "model_params": {
                "aabb": [[-5, -5, -1.2], [5, 5, 2.0]],
                "encoding_cfg": {"type": "tpu_mixed", "n_levels": 8,
                                 "base_res": 16, "max_res": 512,
                                 "n_feats": 4, "n_hash_levels": 0,
                                 "log2_hashmap_size": 15, "cp_max_res": 512},
                "geo_feat_dim": 8, "radiance_hidden": 32, "inv_s_init": 20.0,
                "accel_cfg": None, "pretrain": None,
                "query_cfg": {"num_coarse": 24, "num_fine": (8,),
                              "upsample_inv_s_factors": (1.0,)}},
            "asset_params": {"training_cfg": {"lr": 8e-3}}},
        "Sky": {"model_class": "neuralsim_tpu.models.assets.SimpleSkyAsset",
                "model_params": {"hidden": 32},
                "asset_params": {"training_cfg": {"lr": 3e-3}}},
    }, [scene])
    # pair-mode group budget: default 1.0 = the product default
    # (tools/train_multi.py group_budget_frac) — per-instance mode
    # (BENCH_GROUP_FRAC=off) scales field-eval cost with K and OOMs at K=16
    gbf = os.environ.get("BENCH_GROUP_FRAC", "1.0")
    renderer = BufferComposeRenderer.from_asset_bank(
        scene, bank,
        group_budget_frac=None if gbf == "off" else float(gbf))
    trainer = MultiObjectTrainer(
        scene, renderer,
        loss_cfgs={"rgb": {"fn_type": "huber", "w": 10.0},
                   "eikonal": {"w": 0.01}},
        training_cfgs=bank.training_cfgs(), uniform_sample_n=512)
    params = bank.init_params(jax.random.PRNGKey(0))
    state = trainer.init_state(jax.random.PRNGKey(1), params=params)

    rng = np.random.default_rng(0)
    T = scene.n_frames
    batch = {
        "rays_o": jnp.asarray(rng.normal(size=(n_rays, 3)) * 0.1
                              + np.array([3.0, 0.0, 1.5]), jnp.float32),
        "rays_d": None,
        "image_rgb": jnp.asarray(rng.uniform(size=(n_rays, 3)), jnp.float32),
        "rays_fidx": jnp.asarray(rng.integers(0, T, n_rays), jnp.int32),
    }
    d = rng.normal(size=(n_rays, 3)) - np.array([3.0, 0.0, 1.5]) * 0.3
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch["rays_d"] = jnp.asarray(d, jnp.float32)

    key = jax.random.PRNGKey(2)
    state, m = trainer.train_step(state, dict(batch), key)
    jax.block_until_ready(m["loss_total"])
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sk = jax.random.split(key)
        state, m = trainer.train_step(state, dict(batch), sk)
    jax.block_until_ready(m["loss_total"])
    dt = time.perf_counter() - t0
    rate = n_rays * iters / dt
    print(json.dumps({"metric": "multi_object_train_rays_per_sec",
                      "K_objects": K, "value": round(rate, 1),
                      "unit": "rays/s",
                      "ms_per_step": round(dt / iters * 1e3, 2)}), flush=True)
    return rate


if __name__ == "__main__":
    from neuralsim_tpu.utils.tpu_lock import tpu_chip_lock
    with tpu_chip_lock("scripts/bench_multi.py"):
        ks = [int(a) for a in sys.argv[1:]] or [2, 8, 16]
        for k in ks:
            run(k)
