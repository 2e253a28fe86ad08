"""Street-scene encoding quality A/B at the reference target step count.

The second scene for VERDICT r3 item 4 (option b): the object-scene A/B
lives in quality_ab_r2.py; this one trains a StreetSurf-shaped problem —
the analytic DemoDrive street (ground-plane road, ego forward track,
horizon sky) with a cuboid street AABB — for AB_ITERS iterations and
reports held-ray PSNR + rays/s, per encoding plan.

Env knobs (same as quality_ab_r2 / bench.py): BENCH_NLEVELS, BENCH_NFEATS,
BENCH_NHASH, BENCH_CPMAX, BENCH_REMAT, AB_ITERS (default 600).

Run both plans at the StreetSurf target step count (reference
withmask_withlidar_joint.240219.yaml: 15000 iters):

    AB_ITERS=15000 BENCH_NHASH=0 BENCH_NLEVELS=12 BENCH_NFEATS=8 \
        BENCH_CPMAX=2048 BENCH_REMAT=0 python scripts/quality_ab_street.py
    AB_ITERS=15000 BENCH_NHASH=2 BENCH_NLEVELS=10 BENCH_NFEATS=4 \
        BENCH_CPMAX=512 BENCH_REMAT=1 python scripts/quality_ab_street.py
"""
from __future__ import annotations

import json
import math
import os
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

from neuralsim_tpu.accel import OccGridEma
from neuralsim_tpu.dataio.waymo_demo import DemoDrive, R_CAM2EGO
from neuralsim_tpu.fields import AABBSpace, NeRFDistantField, NeuSField, SimpleSky
from neuralsim_tpu.renderers import SingleVolumeRenderer
from neuralsim_tpu.training import Trainer, psnr

T_FRAMES = int(os.environ.get("AB_FRAMES", "16"))
H, W = 96, 160
SPEED = 1.5


def render_frames():
    """Analytic GT: street-only drive (n_vehicles=0), front camera."""
    drive = DemoDrive(T_FRAMES, SPEED, n_vehicles=0)
    f = 0.5 * W / math.tan(math.radians(62.0) / 2)
    intr = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    cam2ego = np.eye(4, dtype=np.float32)
    cam2ego[:3, :3] = R_CAM2EGO
    cam2ego[:3, 3] = [1.2, 0.0, 0.2]
    u, v = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    dirs_cam = np.stack([(u - intr[0, 2]) / intr[0, 0],
                         (v - intr[1, 2]) / intr[1, 1],
                         np.ones_like(u)], -1)
    frames = []
    for fi in range(T_FRAMES):
        c2w = drive.ego_pose(fi) @ cam2ego
        d = dirs_cam @ c2w[:3, :3].T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.broadcast_to(c2w[:3, 3], d.shape).astype(np.float64)
        p, t, hit = drive.trace(o, d, fi)
        frames.append({
            "rays_o": np.broadcast_to(c2w[:3, 3], d.shape).astype(np.float32),
            "rays_d": d.astype(np.float32),
            "image_rgb": drive.shade(p, d, hit, fi),
            "image_occupancy_mask": hit.astype(np.float32)})
    return frames


def stack_frames(frames):
    """[T,H,W,...] arrays for vectorized batch sampling (the r3 per-ray
    python-loop sampler starved the TPU and blew the 3600s job timeout)."""
    return {k: np.stack([f[k] for f in frames])
            for k in ("rays_o", "rays_d", "image_rgb",
                      "image_occupancy_mask")}


def sample_pixels(stacked, rng, n):
    T = stacked["rays_o"].shape[0]
    fidx = rng.integers(0, T, n)
    ys = rng.integers(0, H, n)
    xs = rng.integers(0, W, n)
    return {k: jnp.asarray(v[fidx, ys, xs]) for k, v in stacked.items()}


def main():
    iters = int(os.environ.get("AB_ITERS", "600"))
    enc_cfg = {"type": "tpu_mixed",
               "n_levels": int(os.environ.get("BENCH_NLEVELS", "12")),
               "base_res": 16, "max_res": 2048,
               "n_feats": int(os.environ.get("BENCH_NFEATS", "8")),
               "n_hash_levels": int(os.environ.get("BENCH_NHASH", "0")),
               "log2_hashmap_size": 17,
               "cp_max_res": int(os.environ.get("BENCH_CPMAX", "2048"))}
    # street cuboid from the ego track (reference LoTDNeuSStreet
    # asset_populate AABB-from-frusta, single/neus.py:160-196)
    aabb_min = (-4.0, -10.0, -0.5)
    aabb_max = (SPEED * T_FRAMES + 24.0, 10.0, 6.0)
    space = AABBSpace(aabb_min, aabb_max)
    field = NeuSField(space, geometry="lotd", encoding_cfg=enc_cfg,
                      geo_feat_dim=15, decoder_hidden=64, radiance_hidden=64,
                      ln_inv_s_init=float(np.log(30.0)),
                      cos_anneal_stop_it=300,
                      remat=os.environ.get("BENCH_REMAT", "0") == "1",
                      eval_chunk=2_000_000)
    renderer = SingleVolumeRenderer(
        {"cr": field,
         "distant": NeRFDistantField(inner_radius=1.0, geometry="mlp",
                                     geo_feat_dim=8, radiance_hidden=32),
         "sky": SimpleSky(hidden=32)},
        query_cfg={"num_coarse": 16, "num_fine": (8, 8),
                   "upsample_inv_s": 64.0,
                   "upsample_inv_s_factors": (1.0, 4.0)},
        distant_query_cfg={"num_samples": 32})
    accel = OccGridEma(space, resolution=128, n_warmup_steps=100,
                       occ_inv_s=64.0, march_steps=48,
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

    stacked = stack_frames(render_frames())
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    n_rays = 8192

    def eval_psnr():
        # chunked: one 16384-ray query with the analytic-jacobian nablas
        # path OOMs the chip next to the training state (r4 queue log)
        eb = sample_pixels(stacked, np.random.default_rng(999), 16384)
        preds = []
        for s in range(0, 16384, 4096):
            r = renderer.ray_query(state.params, eb["rays_o"][s:s + 4096],
                                   eb["rays_d"][s:s + 4096],
                                   key=None, occ_states=state.occ,
                                   query_overrides={"perturb": False})
            preds.append(r["rgb_volume"])
        return float(psnr(jnp.concatenate(preds, 0), eb["image_rgb"]))

    # record intermediate PSNR so a timed-out job still yields data
    # (VERDICT r3 weak #4)
    probe_its = sorted({iters // 3, 2 * iters // 3, iters})
    t_train = 0.0
    for i in range(iters):
        batch = sample_pixels(stacked, rng, n_rays)
        key, sk = jax.random.split(key)
        t0 = time.perf_counter()
        state, m = trainer.train_step(state, batch, sk, "pixel")
        if i in (0, 20):
            jax.block_until_ready(m["loss_total"])
        if i >= 20:
            if i == iters - 1:
                jax.block_until_ready(m["loss_total"])
            t_train += time.perf_counter() - t0
        if (i + 1) in probe_its and (i + 1) != iters:
            print(json.dumps({"scene": "street_demo_drive", "it": i + 1,
                              "psnr": round(eval_psnr(), 2)}), flush=True)

    p = eval_psnr()
    rate = (n_rays * (iters - 20) / t_train) if iters > 20 else 0.0
    print(json.dumps({
        "scene": "street_demo_drive", "iters": iters,
        "n_hash_levels": enc_cfg["n_hash_levels"],
        "n_levels": enc_cfg["n_levels"], "n_feats": enc_cfg["n_feats"],
        "cp_max_res": enc_cfg["cp_max_res"],
        "psnr": round(p, 2), "rays_per_s": round(rate, 0)}), flush=True)


if __name__ == "__main__":
    from neuralsim_tpu.utils.tpu_lock import tpu_chip_lock
    with tpu_chip_lock("scripts/quality_ab_street.py"):
        main()
