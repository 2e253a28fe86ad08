"""Training CLI: config-driven end-to-end reconstruction.

TPU-native re-design of ``code_single/tools/train.py`` (reference, 1698 LoC:
main_function orchestration documented in SURVEY.md §3.1 — scene bank,
asset bank, renderer, dataloaders, loss assembly, checkpointing, periodic
validation). Usage::

    python -m neuralsim_tpu.tools.train --config configs/synthetic_object.yaml \
        [--training.num_iters=5000] [--exp_dir=logs/run0] [--platform=cpu]
"""
from __future__ import annotations

import os
import sys
import time
from typing import Any, Dict, Optional

import numpy as np


def build_everything(cfg):
    """Scene bank + asset bank + renderer + trainer from one config tree
    (reference main_function :1242-1377)."""
    import jax
    from ..config import ConfigDict
    from ..config.config import resolve_interpolations
    from ..dataio.dataloader import (ImageSampler, LidarSampler, PixelSampler,
                                     SceneDataLoader)
    from ..models.asset_base import AssetAssignment
    from ..renderers import SingleVolumeRenderer
    from ..scene import AssetBank, Scene
    from ..training.trainer import Trainer
    from ..utils.misc import import_str

    # library callers may pass a raw yaml.safe_load dict; the CLI path
    # resolves ${...} in load_config, but resolving here too is idempotent
    cfg = resolve_interpolations(cfg)

    # --- dataset + scene bank ---------------------------------------------
    from ..scene.scene_bank import create_scene_bank
    ds_cfg = cfg["dataset_cfg"]
    dataset = import_str(ds_cfg["target"])(**ds_cfg.get("params", {}))
    scene = create_scene_bank(dataset, dict(cfg.get("scenebank_cfg", {})),
                              exp_dir=cfg.get("exp_dir"))[0]

    # --- asset bank ---------------------------------------------------------
    bank = AssetBank.create(cfg["assetbank_cfg"], [scene])

    # --- renderer: bind roles to asset model_ids ----------------------------
    rcfg = cfg.get("renderer", {})
    roles: Dict[str, Any] = {}
    param_keys: Dict[str, str] = {}

    def bind(role, class_name):
        for mid, asset in bank.assets.items():
            if bank.class_of[mid] == class_name and asset.field is not None:
                roles[role] = asset.field
                param_keys[role] = mid
                return asset
        return None

    cr_asset = bind("cr", rcfg.get("cr_class", "Main"))
    if cr_asset is None:
        raise ValueError(f"no close-range asset of class {rcfg.get('cr_class','Main')}")
    bind("distant", rcfg.get("distant_class", "Distant"))
    bind("sky", rcfg.get("sky_class", "Sky"))
    # fixed_cuboid_shells auto-wiring: the distant model's nearest shell is
    # the close-range cuboid itself, so it cannot represent content inside
    # the cr volume (reference LoTDNeRFDistant.asset_populate,
    # app/models/single/nerf.py:160-187)
    dv = roles.get("distant")
    if dv is not None and hasattr(dv, "set_cr_aabb") \
            and getattr(dv, "cub_center", None) is None \
            and hasattr(roles["cr"], "space"):
        dv.set_cr_aabb(roles["cr"].space)

    accels = {}
    if getattr(cr_asset, "accel", None) is not None and \
            rcfg.get("use_occ_accel", True):
        accels["cr"] = cr_asset.accel
    renderer = SingleVolumeRenderer(
        roles,
        query_cfg={**cr_asset.query_cfg, **dict(rcfg.get("query_cfg", {}))},
        distant_query_cfg=dict(rcfg.get("distant_query_cfg", {})),
        param_keys=param_keys, accels=accels)

    # --- trainer -------------------------------------------------------------
    # pose refinement + per-frame appearance embeddings: bind the
    # LearnableParams / ImageEmbeddings assets so the jitted step consumes
    # them (reference train.py: scene.load_assets wiring; VERDICT r1 item 3)
    from ..models.assets import ImageEmbeddings, LearnableParams
    from ..models.misc_assets import ColorTransform
    pose_model_id, pose_enable_after, embed_model = None, 0, None
    for mid, asset in bank.assets.items():
        if isinstance(asset, LearnableParams):
            pose_model_id = mid
            pose_enable_after = asset.enable_after
        elif isinstance(asset, ImageEmbeddings):
            embed_model = (asset, mid)
        elif isinstance(asset, ColorTransform):
            # per-frame learned color transform applied to composited rgb
            # (reference image_postprocessor, single_volume_renderer.py:462)
            renderer.set_postprocessor(asset, mid)

    tcfg = cfg.get("training", {})
    trainer = Trainer(renderer,
                      loss_cfgs=dict(tcfg.get("losses", {})),
                      training_cfgs=bank.training_cfgs(),
                      uniform_sample_n=tcfg.get("uniform_sample_n", 1024),
                      default_optim_cfg=dict(tcfg.get("optim", {"lr": 1e-2})),
                      scene=scene, pose_model_id=pose_model_id,
                      pose_enable_after=pose_enable_after,
                      embed_model=embed_model,
                      debug_grads=bool(tcfg.get("debug_grads", False)),
                      use_ts_interp=bool(tcfg.get("use_ts_interp", False)))

    # --- data ----------------------------------------------------------------
    loader = SceneDataLoader(
        scene, dataset,
        with_mask=tcfg.get("with_mask", True),
        with_lidar=tcfg.get("with_lidar", False),
        filter_lidar_in_cams=tcfg.get("filter_lidar_in_cams", False),
        filter_lidar_max_range=tcfg.get("filter_lidar_max_range", 0.0))
    return ConfigDict.from_dict({}), scene, bank, renderer, trainer, loader


def lift_pixel_batch(scene, batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """(cam, frame, pixel) -> world rays via the frozen scene graph."""
    import jax.numpy as jnp
    from ..scene.observers import camera_get_selected_rays
    fr = scene.slice_at(jnp.asarray(batch["rays_fidx"]))
    ro, rd = camera_get_selected_rays(fr, batch["cam_id"],
                                      jnp.asarray(batch["rays_xy"]))
    out = {"rays_o": ro, "rays_d": rd,
           "image_rgb": jnp.asarray(batch["image_rgb"])}
    if "image_occupancy_mask" in batch:
        out["image_occupancy_mask"] = jnp.asarray(batch["image_occupancy_mask"])
    return out


def lift_lidar_batch(scene, batch) -> Dict[str, Any]:
    import jax.numpy as jnp
    from ..scene.observers import lidar_rays_to_world
    fr = scene.slice_at(jnp.asarray(batch["rays_fidx"]))
    ro, rd = lidar_rays_to_world(fr, batch["lidar_id"],
                                 jnp.asarray(batch["rays_o_local"]),
                                 jnp.asarray(batch["rays_d_local"]))
    return {"rays_o": ro, "rays_d": rd, "ranges": jnp.asarray(batch["ranges"])}


def validate(scene, renderer, params, loader, cam_id: str, fi: int,
             logger, it: int, downscale: int = 2, rayschunk: int = 4096,
             occ=None):
    """Render one validation frame, log PSNR + images (reference
    validate_cameras, train.py:1130)."""
    import jax
    import jax.numpy as jnp
    from ..dataio.dataloader import ImageSampler
    from ..scene.observers import camera_get_selected_rays
    from ..training.trainer import psnr
    from ..utils.logger import color_depth

    frame = ImageSampler(loader, downscale).get(cam_id, fi)
    fr = scene.slice_at(fi)
    ro, rd = camera_get_selected_rays(fr, cam_id, jnp.asarray(frame["rays_xy"]))
    rendered = renderer.render_chunked(params, ro, rd, rayschunk=rayschunk,
                                       occ_states=occ,
                                       query_overrides={"perturb": False})
    H, W = frame["hw"]
    rgb = np.asarray(rendered["rgb_volume"]).reshape(H, W, 3)
    gt = frame["image_rgb"].reshape(H, W, 3)
    p = float(psnr(jnp.asarray(rgb), jnp.asarray(gt)))
    if logger:
        logger.add_scalar("val/psnr", p, it)
        logger.add_image("val/pred", rgb, it)
        logger.add_image("val/gt", gt, it)
        depth = np.asarray(rendered["depth_volume"]).reshape(H, W)
        logger.add_image("val/depth", color_depth(depth), it)
        if "normals_volume" in rendered:
            n = np.asarray(rendered["normals_volume"]).reshape(H, W, 3)
            logger.add_image("val/normals", n * 0.5 + 0.5, it)
    return p


def main_function(cfg) -> Dict[str, Any]:
    import jax
    if cfg.get("platform"):
        jax.config.update("jax_platforms", cfg["platform"])
    from ..utils.compile_cache import setup_compile_cache
    setup_compile_cache(cfg.get("compile_cache", ".jax_cache"))
    import jax.numpy as jnp

    from ..config import save_config
    from ..config.config import resolve_interpolations
    from ..dataio.dataloader import LidarSampler, PixelSampler
    from ..utils.checkpoint import CheckpointIO
    from ..utils.logger import Logger

    cfg = resolve_interpolations(cfg)
    _, scene, bank, renderer, trainer, loader = build_everything(cfg)

    tcfg = cfg.get("training", {})
    if tcfg.get("data_parallel"):
        # DDP analog (reference train.py:1405): one pjit program over all
        # visible devices; batches shard on the ray axis, params replicate,
        # the gradient psum rides ICI inside the backward
        from ..parallel.mesh import ShardedTrainer, make_mesh
        nd = tcfg["data_parallel"]
        trainer = ShardedTrainer(
            trainer, make_mesh(None if nd is True else int(nd)))
        print(f"data-parallel training over {trainer.n_devices} devices",
              flush=True)
    exp_dir = cfg.get("exp_dir", os.path.join("logs", "exp"))
    os.makedirs(exp_dir, exist_ok=True)
    save_config(cfg, os.path.join(exp_dir, "config.yaml"))
    if cfg.get("backup_codebase", True):
        from ..utils.misc import backup_codebase
        backup_codebase(exp_dir)
    logger = Logger(exp_dir)
    ckpt = CheckpointIO(os.path.join(exp_dir, "ckpts"),
                        i_save_seconds=tcfg.get("i_save", 900),
                        i_backup=tcfg.get("i_backup", 0))

    key = jax.random.PRNGKey(cfg.get("seed", 42))
    k_init, k_pre, key = jax.random.split(key, 3)
    params = bank.init_params(k_init)
    params = bank.training_initialize(params, k_pre)
    state = trainer.init_state(key, params=params)

    # resume
    restored = ckpt.load(state) if cfg.get("resume_dir") else None
    if restored is not None:
        state = type(state)(*restored) if not isinstance(restored, type(state)) else restored
        print(f"resumed at it={int(state.it)}")

    # error-map importance sampling (reference ErrorMap/ImpSampler,
    # SURVEY.md App. C)
    imp_sampler = None
    em_cfg = tcfg.get("error_map", {})
    if em_cfg:
        from ..training.error_map import ErrorMap, ImpSampler
        imp_sampler = ImpSampler(
            ErrorMap(scene.n_frames, tuple(em_cfg.get("hw", (32, 64)))),
            frac_uniform=em_cfg.get("frac_uniform", 0.5),
            enable_after=em_cfg.get("enable_after", 0))
    # frame-weighted sampling (reference sampler.py:25-215 'by_speed' etc.)
    frame_sampler = None
    fs_cfg = tcfg.get("frame_sample_mode")
    if fs_cfg:
        from ..dataio.frame_sampler import (WeightedFrameSampler,
                                            frame_weights_by_speed,
                                            frame_weights_uniform)
        mode = fs_cfg if isinstance(fs_cfg, str) else fs_cfg.get("mode", "uniform")
        if mode == "by_speed":
            ego = scene.observers[loader.cam_ids[0]]
            w = frame_weights_by_speed(np.asarray(ego.frame_data["transform"]))
        else:
            w = frame_weights_uniform(scene.n_frames)
        frame_sampler = WeightedFrameSampler(w, seed=cfg.get("seed", 42))

    pixel_sampler = PixelSampler(loader, n_rays=tcfg.get("n_rays", 4096),
                                 seed=cfg.get("seed", 42),
                                 imp_sampler=imp_sampler,
                                 frame_sampler=frame_sampler)
    lidar_sampler = LidarSampler(loader, n_rays=tcfg.get("n_rays_lidar", 4096)) \
        if tcfg.get("with_lidar") else None

    # image-patch step for patch-structured losses (mono cues / s3im /
    # perceptual — reference train.py:1592-1642)
    patch_sampler = None
    p_cfg = tcfg.get("image_patch", {})
    i_patch = int(p_cfg.get("every", 0))
    if i_patch:
        from ..dataio.patch_sampler import ImagePatchSampler
        patch_sampler = ImagePatchSampler(
            loader, mode=p_cfg.get("mode", "flex_grid"),
            seed=cfg.get("seed", 42), dataset=loader.dataset,
            **{k: v for k, v in p_cfg.items()
               if k not in ("every", "mode")})

    # whole-downscaled-frame 'view' step (reference train_step_view,
    # code_single/tools/train.py:443)
    view_sampler = None
    v_cfg = tcfg.get("view", {})
    i_view = int(v_cfg.get("every", 0))
    if i_view:
        from ..dataio.dataloader import ViewSampler
        view_sampler = ViewSampler(
            loader, downscale=v_cfg.get("downscale", 8),
            seed=cfg.get("seed", 42), dataset=loader.dataset)

    num_iters = int(tcfg.get("num_iters", 1000))
    i_val = int(tcfg.get("i_val", max(num_iters // 4, 1)))
    i_log = int(tcfg.get("i_log", 50))
    val_cam = loader.cam_ids[0]

    _jit_keys = ("rays_xy", "rays_fidx", "image_rgb", "image_occupancy_mask",
                 "image_ignore_mask", "image_road_mask", "image_mono_depth",
                 "image_mono_normals", "w2c_rot")

    def to_device_batch(raw):
        return {k: jnp.asarray(v) for k, v in raw.items() if k in _jit_keys}

    # finite-guard watchdog (reference GradScaler skip semantics,
    # train.py:1492-1502): poisoned steps are skipped IN-GRAPH by the
    # trainer; here we only watch the cumulative skip counter at log cadence
    # and halt when training stops making progress entirely.
    _skip_watch = {"last": 0}

    def check_finite(mm, it, tag):
        """NaN forensics + skip watchdog. A non-finite metric no longer
        poisons the params (the trainer skipped that step), so report it;
        abort only when every step of the window was skipped."""
        bad = {k: v for k, v in mm.items()
               if not np.isfinite(v) and not k.startswith(("lidar/", "patch/",
                                                           "view/"))}
        if bad:
            print(f"[finite-guard] non-finite metrics at it={it} ({tag}): "
                  f"{sorted(bad)} (step was skipped)", flush=True)
        skips = int(mm.get("skips_total", 0))
        delta = skips - _skip_watch["last"]
        if delta > 0:
            print(f"[finite-guard] {delta} poisoned step(s) skipped since "
                  f"last log (total {skips})", flush=True)
        _skip_watch["last"] = skips
        if delta >= i_log and it > 0:
            path = ckpt.save(state, it, tag="nan_debug")
            raise FloatingPointError(
                f"every step in the last {i_log}-iteration window was "
                f"skipped by the finite guard at it={it} ({tag}); state "
                f"saved to {path}. Re-run with training.debug_grads=true "
                f"for per-model grad norms.")

    # --profile_iters analog (reference Profiler(warmup, record, then=exit),
    # train.py:1433-1438): run N recorded iterations under the section
    # profiler, print the sorted per-range device-inclusive report, stop.
    profiler = None
    prof_iters = int(tcfg.get("profile_iters", 0))
    if prof_iters:
        from ..utils.profiler import Profiler
        profiler = Profiler(warmup_frames=max(prof_iters // 10, 2),
                            record_frames=prof_iters)
        num_iters = min(num_iters,
                        int(state.it) + profiler.warmup + profiler.record)

    t0 = time.time()
    rays_done = 0
    m = {}
    sticky_m = {}  # latest lidar/patch step metrics (run on their own cadence)
    it = int(state.it)
    try:
        for it in range(int(state.it), num_iters):
            key, sk = jax.random.split(key)
            if profiler is not None:
                with profiler.range("sample_pixel"):
                    raw = pixel_sampler.sample()
                with profiler.range("step_pixel"):
                    state, m = trainer.train_step(
                        state, to_device_batch(raw), sk, "pixel",
                        raw["cam_id"])
                    jax.block_until_ready(m["loss_total"])
                rep = profiler.step()
                if rep is not None:
                    print("profile report (ms/iter, device-inclusive):",
                          flush=True)
                    for name, row in rep.items():
                        print(f"  {name:16s} {row['mean_ms']:9.3f} ms  "
                              f"x{row['count']}", flush=True)
                    break
                rays_done += tcfg.get("n_rays", 4096)
                continue
            # Secondary step types first (advance_it=False), primary pixel
            # step last (advances `it` + refreshes the occ grid): every step
            # type of one loop iteration sees the SAME `it` and the occ EMA
            # fires exactly once per iteration — matching the reference's
            # it-per-loop accounting (train.py:1651; ADVICE r3 medium).
            if lidar_sampler is not None:
                lb = lidar_sampler.sample()
                if lb is not None:
                    key, sk2 = jax.random.split(key)
                    state, ml = trainer.train_step(
                        state, lift_lidar_batch(scene, lb), sk2, "lidar",
                        None, False)
                    sticky_m.update({f"lidar/{k}": v for k, v in ml.items()})
                    rays_done += tcfg.get("n_rays_lidar", 4096)
            if patch_sampler is not None and (it + 1) % i_patch == 0:
                praw = patch_sampler.sample(it)
                key, sk2 = jax.random.split(key)
                state, mp = trainer.train_step(state, to_device_batch(praw),
                                               sk2, "image_patch",
                                               praw["cam_id"], False)
                sticky_m.update({f"patch/{k}": v for k, v in mp.items()})
            if view_sampler is not None and (it + 1) % i_view == 0:
                vraw = view_sampler.sample(it)
                key, sk2 = jax.random.split(key)
                state, mv = trainer.train_step(state, to_device_batch(vraw),
                                               sk2, "view", vraw["cam_id"],
                                               False)
                sticky_m.update({f"view/{k}": v for k, v in mv.items()})
            raw = pixel_sampler.sample()
            # rays lifted INSIDE the jitted step (pose-delta gradients flow);
            # cam_id is a static argument selecting the camera
            state, m = trainer.train_step(state, to_device_batch(raw), sk,
                                          "pixel", raw["cam_id"])
            rays_done += tcfg.get("n_rays", 4096)
            if imp_sampler is not None and "err_map" in m:
                W, H = loader.image_wh(raw["cam_id"])
                imp_sampler.update(raw["rays_fidx"], raw["rays_sel"][:, 1],
                                   raw["rays_sel"][:, 0],
                                   np.asarray(m["err_map"]), H, W,
                                   cam_id=raw["cam_id"])
            if it % i_log == 0:
                mm = {k: float(np.asarray(v)) for k, v in {**sticky_m, **m}.items()
                      if np.asarray(v).ndim == 0}
                logger.add_scalars(mm, it)
                check_finite(mm, it, "train")
                rate = rays_done / max(time.time() - t0, 1e-9)
                print(f"it={it} loss={mm.get('loss_total', float('nan')):.4f} "
                      f"rays/s={rate:.0f}", flush=True)
            if (it + 1) % i_val == 0:
                p = validate(scene, renderer, state.params, loader, val_cam,
                             fi=0, logger=logger, it=it, occ=state.occ,
                             downscale=tcfg.get("val_downscale", 2))
                print(f"[val] it={it} psnr={p:.2f}", flush=True)
            ckpt.maybe_save(state, it)
    except KeyboardInterrupt:
        # graceful interrupt: keep the latest state (reference
        # train.py:1674-1678)
        path = ckpt.save(state, it, tag="latest")
        print(f"interrupted at it={it}; state saved to {path}", flush=True)
        raise

    ckpt.save(state, num_iters, tag="final")
    p = validate(scene, renderer, state.params, loader, val_cam, fi=0,
                 logger=logger, it=num_iters, occ=state.occ)
    logger.save_stats()
    logger.close()
    print(f"done: final psnr={p:.2f} exp_dir={exp_dir}", flush=True)
    return {"psnr": p, "exp_dir": exp_dir, "state": state}


def main(argv=None):
    from ..config import BaseConfig
    bc = BaseConfig("neuralsim_tpu trainer")
    cfg = bc.parse(argv)
    return main_function(cfg)


if __name__ == "__main__":
    main()
