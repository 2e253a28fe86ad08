"""Multi-object training CLI (code_multi analog).

TPU-native re-design of ``code_multi/tools/train.py`` (reference — SURVEY.md
§2.6/§3.2). Usage::

    python -m neuralsim_tpu.tools.train_multi --config configs/synthetic_multi.yaml \
        [--training.num_iters=2000] [--platform=cpu]
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict

import numpy as np


def build_everything_multi(cfg):
    import jax
    from ..config.config import resolve_interpolations
    from ..dataio.dataloader import SceneDataLoader
    from ..renderers.buffer_compose import BufferComposeRenderer
    from ..scene import AssetBank, Scene
    from ..training.multi_trainer import MultiObjectTrainer
    from ..utils.misc import import_str

    # library callers may pass a raw yaml.safe_load dict; the CLI path
    # resolves ${...} in load_config, but resolving here too is idempotent
    cfg = resolve_interpolations(cfg)
    ds_cfg = cfg["dataset_cfg"]
    dataset = import_str(ds_cfg["target"])(**ds_cfg.get("params", {}))
    scenario = dataset.get_scenario(cfg.get("scenebank_cfg", {}).get(
        "scenarios", [None])[0] or dataset.scene_ids()[0]) \
        if hasattr(dataset, "scene_ids") else dataset.get_scenario()
    scene = Scene.load_from_scenario(scenario)
    bank = AssetBank.create(cfg["assetbank_cfg"], [scene])
    rcfg = cfg.get("renderer", {})
    renderer = BufferComposeRenderer.from_asset_bank(
        scene, bank, obj_query_cfg=dict(rcfg.get("obj_query_cfg", {})),
        cr_class=rcfg.get("cr_class", "Street"),
        distant_class=rcfg.get("distant_class", "Distant"),
        sky_class=rcfg.get("sky_class", "Sky"),
        hit_budget_frac=rcfg.get("hit_budget_frac", 0.5),
        # training default: ONE frac*N pair budget for each shared-model
        # group (K-independent cost; set null in config for per-instance
        # budgets). Render/eval tools build their own renderer with the
        # exact per-object path.
        group_budget_frac=rcfg.get("group_budget_frac", 1.0),
        max_hits_per_ray=rcfg.get("max_hits_per_ray", 4))
    # pose refinement / appearance embeddings / color transform assets
    # (reference code_multi/tools/train.py:50,104-139 — the same wiring the
    # single trainer has; VERDICT r2 item 5)
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
            renderer.set_postprocessor(asset, mid)

    tcfg = cfg.get("training", {})
    trainer = MultiObjectTrainer(
        scene, renderer, loss_cfgs=dict(tcfg.get("losses", {})),
        training_cfgs=bank.training_cfgs(),
        uniform_sample_n=tcfg.get("uniform_sample_n", 256),
        pose_model_id=pose_model_id, pose_enable_after=pose_enable_after,
        embed_model=embed_model,
        debug_grads=bool(tcfg.get("debug_grads", False)),
        use_ts_interp=bool(tcfg.get("use_ts_interp", False)))
    loader = SceneDataLoader(scene, dataset,
                             with_mask=tcfg.get("with_mask", True),
                             with_lidar=tcfg.get("with_lidar", False)) \
        if hasattr(dataset, "get_image") else None
    return scene, bank, renderer, trainer, loader, dataset


def main_function(cfg) -> Dict[str, Any]:
    import jax
    if cfg.get("platform"):
        jax.config.update("jax_platforms", cfg["platform"])
    from ..utils.compile_cache import setup_compile_cache
    setup_compile_cache(cfg.get("compile_cache", ".jax_cache"))
    import jax.numpy as jnp
    from ..config import save_config
    from ..config.config import resolve_interpolations
    from ..dataio.dataloader import PixelSampler
    from ..utils.checkpoint import CheckpointIO
    from ..utils.logger import Logger
    from .train import lift_pixel_batch, validate

    cfg = resolve_interpolations(cfg)
    scene, bank, renderer, trainer, loader, dataset = build_everything_multi(cfg)
    tcfg = cfg.get("training", {})
    if tcfg.get("data_parallel"):
        # DDP analog over the compose path (reference code_multi train also
        # rides the same DDP machinery): batches shard on rays, params
        # replicate, gradient psum over ICI
        from ..parallel.mesh import ShardedTrainer, make_mesh
        nd = tcfg["data_parallel"]
        trainer = ShardedTrainer(
            trainer, make_mesh(None if nd is True else int(nd)))
        print(f"data-parallel training over {trainer.n_devices} devices",
              flush=True)
    exp_dir = cfg.get("exp_dir", os.path.join("logs", "exp_multi"))
    os.makedirs(exp_dir, exist_ok=True)
    save_config(cfg, os.path.join(exp_dir, "config.yaml"))
    logger = Logger(exp_dir)
    ckpt = CheckpointIO(os.path.join(exp_dir, "ckpts"),
                        i_save_seconds=tcfg.get("i_save", 900))

    key = jax.random.PRNGKey(cfg.get("seed", 42))
    k_init, k_pre, key = jax.random.split(key, 3)
    params = bank.init_params(k_init)
    params = bank.training_initialize(params, k_pre)
    state = trainer.init_state(key, params=params)
    # checkpoint resume (reference train.py load_checkpoint semantics; the
    # single driver has this at tools/train.py:231 — parity + the
    # halt-and-restore recovery path both need it)
    if cfg.get("resume_dir"):
        restored = ckpt.load(state)
        if restored is not None:
            state = type(state)(*restored) \
                if not isinstance(restored, type(state)) else restored
            print(f"resumed at it={int(np.asarray(state.it))}", flush=True)

    # error-map importance sampling (per-camera ErrorMap; reference
    # code_multi/tools/train.py:50 — ErrorMap/ImpSampler per camera)
    imp_sampler = None
    em_cfg = tcfg.get("error_map", {})
    if em_cfg and loader is not None:
        from ..training.error_map import ErrorMap, ImpSampler
        imp_sampler = ImpSampler(
            ErrorMap(scene.n_frames, tuple(em_cfg.get("hw", (32, 64)))),
            frac_uniform=em_cfg.get("frac_uniform", 0.5),
            enable_after=em_cfg.get("enable_after", 0))
    if loader is not None:
        sampler = PixelSampler(loader, n_rays=tcfg.get("n_rays", 2048),
                               seed=cfg.get("seed", 42),
                               imp_sampler=imp_sampler)
    else:
        # procedural datasets (synthetic_multi) emit world-ray batches
        # directly instead of (cam, frame, pixel) tuples
        class _DirectSampler:
            def __init__(self, ds, n, seed):
                self.ds, self.n = ds, n
                self.rng = np.random.default_rng(seed)

            def sample(self):
                return self.ds.sample_pixels(self.rng, self.n)

        sampler = _DirectSampler(dataset, tcfg.get("n_rays", 2048),
                                 cfg.get("seed", 42))
    # lidar + image_patch cadence (reference code_multi step types,
    # code_multi/tools/train.py:240-252)
    lidar_sampler = None
    if tcfg.get("with_lidar"):
        from ..dataio.dataloader import LidarSampler
        lidar_sampler = LidarSampler(loader,
                                     n_rays=tcfg.get("n_rays_lidar", 2048))
    patch_sampler = None
    p_cfg = tcfg.get("image_patch", {})
    i_patch = int(p_cfg.get("every", 0))
    if i_patch:
        from ..dataio.patch_sampler import ImagePatchSampler
        patch_sampler = ImagePatchSampler(
            loader, mode=p_cfg.get("mode", "flex_grid"),
            seed=cfg.get("seed", 42), dataset=dataset,
            **{k: v for k, v in p_cfg.items() if k not in ("every", "mode")})

    num_iters = int(tcfg.get("num_iters", 2000))
    i_log = int(tcfg.get("i_log", 50))
    # --profile_iters analog (see tools/train.py)
    profiler = None
    prof_iters = int(tcfg.get("profile_iters", 0))
    if prof_iters:
        from ..utils.profiler import Profiler
        profiler = Profiler(warmup_frames=max(prof_iters // 10, 2),
                            record_frames=prof_iters)
        num_iters = min(num_iters, profiler.warmup + profiler.record)
    t0 = time.time()
    m = {}
    sticky_m = {}
    _jit_keys = ("rays_xy", "rays_fidx", "image_rgb", "image_occupancy_mask",
                 "image_ignore_mask", "image_mono_depth",
                 "image_mono_normals", "w2c_rot")

    def to_device_batch(raw):
        return {k: jnp.asarray(v) for k, v in raw.items() if k in _jit_keys}

    # finite-guard watchdog (see tools/train.py check_finite): poisoned steps
    # are skipped in-graph; watch the cumulative counter at log cadence.
    _skip_watch = {"last": 0}
    # nan_debug: sync on the per-step skip flag and capture the exact
    # poisoned (state, batch, key) to disk for offline root-causing. The
    # skipped step leaves params untouched, so the saved state IS the state
    # the bad step saw.
    nan_debug = bool(tcfg.get("nan_debug", False))

    _nan_dumps = {"n": 0}

    def dump_nan_batch(raw_batch, dev_batch, sk, it, step_type, cam_id):
        # cap the captures: once the model is inside a NaN-producing region
        # every step skips, and a full state snapshot per skip floods the
        # disk (observed 1.6 GB in minutes); the first few are what the
        # offline bisect needs
        _nan_dumps["n"] += 1
        if _nan_dumps["n"] > 3:
            return
        dump_dir = os.path.join(exp_dir, "nan_dump")
        os.makedirs(dump_dir, exist_ok=True)
        np.savez(os.path.join(dump_dir, f"batch_it{it}_{step_type}.npz"),
                 key=np.asarray(sk), it=it, step_type=step_type,
                 cam_id=cam_id or "",
                 **{k: np.asarray(v) for k, v in dev_batch.items()})
        ckpt.save(state, it, tag=f"nan_state_it{it}")
        print(f"[nan_debug] poisoned {step_type} step captured at it={it} "
              f"-> {dump_dir}", flush=True)

    for it in range(int(np.asarray(state.it)), num_iters):
        key, sk = jax.random.split(key)
        if profiler is not None:
            with profiler.range("sample"):
                raw = sampler.sample()
            with profiler.range("step"):
                if "rays_o" in raw:
                    batch = {k: jnp.asarray(v) for k, v in raw.items()
                             if not isinstance(v, str)}
                    state, m = trainer.train_step(state, batch, sk)
                else:
                    state, m = trainer.train_step(state, to_device_batch(raw),
                                                  sk, "pixel", raw["cam_id"])
                jax.block_until_ready(m["loss_total"])
            rep = profiler.step()
            if rep is not None:
                print("profile report (ms/iter, device-inclusive):",
                      flush=True)
                for name, row in rep.items():
                    print(f"  {name:16s} {row['mean_ms']:9.3f} ms  "
                          f"x{row['count']}", flush=True)
                break
            continue
        # Secondary step types first (advance_it=False), primary pixel step
        # last (advances `it` + refreshes occ): every step type of one loop
        # iteration sees the SAME `it` and the occ EMA fires exactly once
        # (reference it-per-loop accounting train.py:1651; ADVICE r3 medium).
        if lidar_sampler is not None:
            lb = lidar_sampler.sample()
            if lb is not None:
                from .train import lift_lidar_batch
                key, sk2 = jax.random.split(key)
                lbatch = lift_lidar_batch(scene, lb)
                lbatch["rays_fidx"] = jnp.asarray(lb["rays_fidx"])
                state, ml = trainer.train_step(state, lbatch, sk2, "lidar",
                                               None, False)
                sticky_m.update({f"lidar/{k}": v for k, v in ml.items()})
                if nan_debug and int(ml["step_skipped"]):
                    dump_nan_batch(lb, lbatch, sk2, it, "lidar", None)
        if patch_sampler is not None and (it + 1) % i_patch == 0:
            praw = patch_sampler.sample(it)
            key, sk2 = jax.random.split(key)
            pb = lift_pixel_batch(scene, praw)
            pb["rays_fidx"] = jnp.asarray(praw["rays_fidx"])
            for k in ("image_mono_depth", "image_mono_normals"):
                if k in praw:
                    pb[k] = jnp.asarray(praw[k])
            state, mp = trainer.train_step(state, pb, sk2, "image_patch",
                                           None, False)
            sticky_m.update({f"patch/{k}": v for k, v in mp.items()})
        raw = sampler.sample()
        if "rays_o" in raw:          # direct world-ray batch (procedural)
            batch = {k: jnp.asarray(v) for k, v in raw.items()
                     if not isinstance(v, str)}
            state, m = trainer.train_step(state, batch, sk)
            if nan_debug and int(m["step_skipped"]):
                dump_nan_batch(raw, batch, sk, it, "pixel", None)
        else:
            # rays lifted INSIDE the jitted step (pose-delta gradients flow)
            dev_batch = to_device_batch(raw)
            state, m = trainer.train_step(state, dev_batch, sk,
                                          "pixel", raw["cam_id"])
            if nan_debug and int(m["step_skipped"]):
                dump_nan_batch(raw, dev_batch, sk, it, "pixel",
                               raw["cam_id"])
            if imp_sampler is not None and "err_map" in m:
                W, H = loader.image_wh(raw["cam_id"])
                imp_sampler.update(raw["rays_fidx"], raw["rays_sel"][:, 1],
                                   raw["rays_sel"][:, 0],
                                   np.asarray(m["err_map"]), H, W,
                                   cam_id=raw["cam_id"])
        m = {**sticky_m, **m}
        if it % i_log == 0:
            mm = {k: float(np.asarray(v)) for k, v in m.items()
                  if np.asarray(v).ndim == 0}
            logger.add_scalars(mm, it)
            rate = (it + 1) * tcfg.get("n_rays", 2048) / (time.time() - t0)
            print(f"it={it} loss={mm.get('loss_total', float('nan')):.4f} "
                  f"rays/s={rate:.0f}", flush=True)
            bad = {k: v for k, v in mm.items() if v != v or abs(v) == float("inf")}
            if bad:
                # NaN forensics (reference debug_ret sweeps, train.py:338-363)
                # — with the finite guard these metrics mean a SKIPPED step,
                # not poisoned params.
                print(f"[check_finite] it={it} non-finite metrics (step "
                      f"skipped): {sorted(bad)}", flush=True)
            skips = int(mm.get("skips_total", 0))
            sdelta = skips - _skip_watch["last"]
            if sdelta > 0:
                print(f"[finite-guard] {sdelta} poisoned step(s) skipped "
                      f"since last log (total {skips})", flush=True)
            _skip_watch["last"] = skips
            if sdelta >= i_log and it > 0:
                ckpt.save(state, it, tag="nan_debug")
                raise FloatingPointError(
                    f"every step in the last {i_log}-iteration window was "
                    f"skipped by the finite guard at it={it}")
        ckpt.maybe_save(state, it)

    ckpt.save(state, num_iters, tag="final")
    logger.save_stats()
    logger.close()
    skips_total = int(np.asarray(state.skips)) if state.skips is not None \
        else 0
    print(f"done multi: exp_dir={exp_dir} skips_total={skips_total}",
          flush=True)
    return {"exp_dir": exp_dir, "state": state, "skips_total": skips_total}


def main(argv=None):
    from ..config import BaseConfig
    return main_function(BaseConfig("neuralsim_tpu multi trainer").parse(argv))


if __name__ == "__main__":
    main()
