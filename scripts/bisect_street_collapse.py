"""Bisect the waymo-demo street-model collapse (r3): train the demo scene
under config variants and track, every N iters,
  * street SDF at the road surface (should stay ~0),
  * street occ-grid occupied fraction,
  * street visibility mass in the camera composite.

Usage: python scripts/bisect_street_collapse.py <variant> [iters] [tpu]
`tpu` runs at the REAL demo scale (80x120, 8 frames, 3 vehicles, 4096-ray
batches) on the chip; default is the tiny CPU scene.
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

ON_TPU = "tpu" in sys.argv
if ON_TPU:
    sys.argv.remove("tpu")
else:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import yaml

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "base"
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 600
PROBE_EVERY = int(__import__("os").environ.get(
    "PROBE_EVERY", 50 if not ON_TPU else 100))


def main():
    import os

    from neuralsim_tpu.dataio.dataloader import LidarSampler, PixelSampler
    from neuralsim_tpu.dataio.waymo_demo import build_demo_sequence
    from neuralsim_tpu.tools.train import lift_lidar_batch, lift_pixel_batch
    from neuralsim_tpu.tools.train_multi import build_everything_multi

    if ON_TPU:
        root = "/root/repo/logs/waymo_demo_r3_data"
        if not os.path.isdir(os.path.join(root, "demo_drive")):
            build_demo_sequence(root, n_frames=8, H=80, W=120, n_vehicles=3)
    else:
        root = "logs/bisect_demo_data"
        if not os.path.isdir(os.path.join(root, "demo_drive")):
            build_demo_sequence(root, n_frames=4, H=40, W=60, n_vehicles=2)

    cfg = yaml.safe_load(open("configs/waymo_demo_multi.yaml"))
    cfg["dataset_cfg"]["params"]["root"] = root
    cfg.update(exp_dir=f"logs/bisect_{VARIANT}")
    if not ON_TPU:
        cfg["platform"] = "cpu"
    n_rays = 4096 if ON_TPU else 512
    cfg["training"].update({"num_iters": ITERS, "n_rays": n_rays,
                            "n_rays_lidar": n_rays // 2, "i_log": 10 ** 9,
                            "i_val": 0})
    st = cfg["assetbank_cfg"]["Street"]["model_params"]
    if not ON_TPU:
        st["encoding_cfg"].update({"n_levels": 6, "max_res": 128,
                                   "cp_max_res": 128})
    if VARIANT == "noaccel":
        st["accel_cfg"] = None
    if VARIANT in ("streetonly", "streetsky"):
        # compose path with ONLY the street (+sky) — isolates the compose
        # street query/merge from vehicles and distant
        cfg["assetbank_cfg"].pop("Vehicle", None)
        cfg["assetbank_cfg"].pop("Distant", None)
        if VARIANT == "streetonly":
            cfg["assetbank_cfg"].pop("Sky", None)
        cfg["training"]["losses"].pop("latent", None)
    if VARIANT == "nosparsity":
        cfg["training"]["losses"].pop("sparsity", None)
    if VARIANT == "nodistant":
        cfg["assetbank_cfg"].pop("Distant")
    if VARIANT == "nomask":
        cfg["training"]["losses"].pop("occupancy_mask", None)
    if VARIANT == "norgb":
        cfg["training"]["losses"]["rgb"]["w"] = 0.0
    if VARIANT == "noeik":
        cfg["training"]["losses"].pop("eikonal", None)
    if VARIANT == "noanneal":
        st.pop("inv_s_final", None)
        st.pop("inv_s_anneal_stop_it", None)
    if VARIANT == "nolidar":
        cfg["training"]["with_lidar"] = False
        cfg["training"]["losses"].pop("lidar", None)
    if VARIANT == "noclearance":
        cfg["training"]["losses"].pop("clearance", None)
    if VARIANT == "nolos":
        cfg["training"]["losses"]["lidar"].pop("line_of_sight", None)
    if VARIANT == "weaklos":
        cfg["training"]["losses"]["lidar"]["line_of_sight"]["w"] = 0.01
    if VARIANT == "urbanlos":
        los = cfg["training"]["losses"]["lidar"]["line_of_sight"]
        los["fn_type"] = "neus_urban"   # adds the gaussian attraction term
    if VARIANT == "l1depth":
        cfg["training"]["losses"]["lidar"]["depth"] = {"fn_type": "l1",
                                                       "w": 0.05}
        cfg["training"]["losses"]["lidar"]["line_of_sight"]["w"] = 0.05
    # --- composite recipes around the known-healthy r3 "noanneal" anchor ---
    def _r3_base():
        st.pop("inv_s_final", None)
        st.pop("inv_s_anneal_start_it", None)
        st.pop("inv_s_anneal_stop_it", None)
        cfg["training"]["losses"].pop("clearance", None)
        cfg["training"]["losses"]["sparsity"] = {"w": 0.002}
        cfg["training"]["losses"]["lidar"]["line_of_sight"] = {
            "fn_type": "neus_unisim", "w": 0.01}
    if VARIANT == "r3recipe":
        _r3_base()
    if VARIANT == "r3anneal30":          # + delayed anneal to 30
        _r3_base()
        st["inv_s_final"] = 30.0
        st["inv_s_anneal_start_it"] = ITERS // 5
        st["inv_s_anneal_stop_it"] = ITERS
    if VARIANT == "r3clear":             # + clearance
        _r3_base()
        cfg["training"]["losses"]["clearance"] = {"w": 0.1, "beta": 10.0,
                                                  "thresh": 0.02}
    if VARIANT == "r3sparseramp":        # + sparsity ramp
        _r3_base()
        cfg["training"]["losses"]["sparsity"] = {
            "w": 0.002, "enable_after": ITERS // 10,
            "anneal": {"type": "linear", "start_it": ITERS // 10,
                       "start_val": 0.0, "stop_it": ITERS // 2,
                       "stop_val": 1.0}}
    if VARIANT in ("minimal", "minimal_eik", "minimal_lidar"):
        # strip to the bare photometric+mask problem to find the killer
        keep = {"rgb", "occupancy_mask", "latent"}
        if VARIANT == "minimal_eik":
            keep.add("eikonal")
        if VARIANT == "minimal_lidar":
            keep.add("lidar")
        cfg["training"]["losses"] = {
            k: v for k, v in cfg["training"]["losses"].items() if k in keep}
        if VARIANT != "minimal_lidar":
            cfg["training"]["with_lidar"] = False
        st.pop("inv_s_final", None)
        st.pop("inv_s_anneal_start_it", None)
        st.pop("inv_s_anneal_stop_it", None)
    if VARIANT == "unitfix":
        # reference regularizer scales converted from sdf_scale=25 units to
        # meters: sparsity inv_scale 16 -> 16/25=0.64 (a gentle 1.5 m shell,
        # not a 6 cm surface laser); clearance beta 10 -> 0.4 /m,
        # thresh 0.02*25 = 0.5 m
        cfg["training"]["losses"]["sparsity"]["inv_scale"] = 0.64
        cfg["training"]["losses"]["clearance"] = {"w": 0.1, "beta": 0.4,
                                                  "thresh": 0.5}
    if VARIANT == "r3los02":             # + LoS 0.02 with eps milestones
        _r3_base()
        cfg["training"]["losses"]["lidar"]["line_of_sight"] = {
            "fn_type": "neus_unisim", "w": 0.02,
            "epsilon": {"type": "milestones",
                        "milestones": [ITERS // 3, 2 * ITERS // 3],
                        "vals": [1.5, 0.75, 0.5]}}

    scene, bank, renderer, trainer, loader, dataset = \
        build_everything_multi(cfg)
    if VARIANT == "nocuboid":
        # isolate the fixed_cuboid_shells contraction: revert the distant
        # model to the inverted-sphere parameterization
        dv = renderer.scene_models.get("distant")
        if dv is not None:
            dv[0].cub_center = None
            dv[0].cub_half = None
    params = bank.init_params(jax.random.PRNGKey(0))
    params = bank.training_initialize(params, jax.random.PRNGKey(1))
    state = trainer.init_state(jax.random.PRNGKey(2), params=params)

    mid = renderer.scene_models["cr"][1]
    field = renderer.scene_models["cr"][0]

    # probes: road-surface SDF + a fixed camera ray batch's street vis mass
    zs = np.array([0.0, 0.05, 0.1], np.float32)
    road_pts = jnp.asarray(np.stack([
        np.repeat(np.array([0.0, 10.0, 25.0], np.float32), 3),
        np.zeros(9, np.float32),
        np.tile(zs, 3)], -1))

    probe_sampler = PixelSampler(loader, n_rays=n_rays, seed=777)
    probe_raw = probe_sampler.sample()
    probe_b = lift_pixel_batch(scene, probe_raw)

    zprof_pts = jnp.asarray(np.stack([
        np.full(8, 10.0, np.float32), np.zeros(8, np.float32),
        np.array([-0.4, -0.2, 0.0, 0.3, 1.0, 2.0, 4.0, 6.0], np.float32)],
        -1))

    def probe(state):
        sdf = np.asarray(field.query_sdf(state.params[mid], road_pts))
        zprof = np.asarray(field.query_sdf(state.params[mid], zprof_pts))
        occ = state.occ.get("cr") if state.occ else None
        occf = float(np.asarray(occ.mask).mean()) if occ is not None else -1.0
        r = renderer.ray_query(state.params,
                               scene.slice_at(jnp.asarray(
                                   probe_raw["rays_fidx"])),
                               probe_b["rays_o"], probe_b["rays_d"],
                               key=None, it=int(state.it),
                               occ_states=state.occ, with_per_obj=True)
        street = r["rendered_per_obj_in_scene"].get("street")
        sv = float(np.asarray(street["mask_volume"]).mean()) \
            if street is not None else -1.0
        dv = r["rendered_per_obj_in_scene"].get("distant")
        dvv = float(np.asarray(dv["mask_volume"]).mean()) \
            if dv is not None else -1.0
        inv_s = float(np.asarray(field.forward_inv_s(
            state.params[mid], it=int(state.it))))
        return dict(inv_s=round(inv_s, 1),
                    road_sdf=round(float(sdf.mean()), 4),
                    zprof=[round(float(v), 2) for v in zprof],
                    occ_frac=round(occf, 4),
                    street_vis=round(sv, 4),
                    distant_vis=round(dvv, 4),
                    total_vis=round(float(np.asarray(
                        r["mask_volume"]).mean()), 4))

    sampler = PixelSampler(loader, n_rays=n_rays, seed=42)
    lidar_sampler = LidarSampler(loader, n_rays=n_rays // 2) \
        if cfg["training"].get("with_lidar") else None

    key = jax.random.PRNGKey(3)
    print(json.dumps({"variant": VARIANT, "it": 0, **probe(state)}),
          flush=True)
    for i in range(1, ITERS + 1):
        raw = sampler.sample()
        key, sk = jax.random.split(key)
        jit_keys = ("rays_xy", "rays_fidx", "image_rgb",
                    "image_occupancy_mask", "image_ignore_mask")
        batch = {k: jnp.asarray(v) for k, v in raw.items() if k in jit_keys}
        state, m = trainer.train_step(state, batch, sk, "pixel",
                                      raw["cam_id"])
        if lidar_sampler is not None:
            lb = lidar_sampler.sample()
            if lb is not None:
                key, sk = jax.random.split(key)
                lbatch = lift_lidar_batch(scene, lb)
                lbatch["rays_fidx"] = jnp.asarray(lb["rays_fidx"])
                # advance_it=False: match the real driver's it-per-loop
                # accounting (one advance per loop iteration)
                state, ml = trainer.train_step(state, lbatch, sk, "lidar",
                                               None, False)
                m.update({f"lidar/{k}": v for k, v in ml.items()})
        if i % PROBE_EVERY == 0:
            comps = {k: round(float(np.asarray(v)), 5)
                     for k, v in m.items()
                     if np.asarray(v).ndim == 0 and (k.startswith("loss")
                                                     or "valid" in k
                                                     or "lidar" in k)}
            print(json.dumps({"variant": VARIANT, "it": i, **comps,
                              **probe(state)}), flush=True)


if __name__ == "__main__":
    from neuralsim_tpu.utils.tpu_lock import tpu_chip_lock
    with tpu_chip_lock("scripts/bisect_street_collapse.py"):
        main()
