"""prof.py — the one parameterized profiling harness (chained-scan timing).

Replaces the round-1/2 one-off scripts (prof_r2*.py, prof_r3..r7, prof_march*,
prof_step_r2, prof_cr_r2, prof_multi, profile_tpu). Methodology (PERF.md):
naive timing loops lie on this stack — axon async dispatch + XLA loop
hoisting/CSE make microbenches read ~0 ms. Every segment here is timed as a
data-dependent `lax.scan` chain (each iteration's params perturbed by the
previous output) and reported as (t(2+iters) - t(2)) / iters, min over reps.

Usage (single TPU claim — run AFTER any bench finishes):

    python scripts/prof.py single                 # flagship single-object path
    python scripts/prof.py multi --k 16           # compose path, K vehicles
    python scripts/prof.py single --segments step,loss,field,encoding
    python scripts/prof.py single --cpu --rays 256   # smoke mode off-TPU

Knobs: --rays, --iters, --dtype float32|bfloat16, --remat, --trace DIR
(wraps the chains in a jax.profiler trace for xprof).

Known infra hazard (PERF.md): the standalone remat-off
`grad(sdf_nablas_feat)` subgraph SIGILLs the remote-compile helper inside
XLA's TpuPriorityFusionQueue cost model. That segment ('field_grad_noremat')
is FENCED: it only runs with --allow-hazard, and the default segment list
excludes it. The full train step compiles fine and is unaffected.
"""
from __future__ import annotations

import argparse
import math
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
from jax import lax


def parse_args():
    ap = argparse.ArgumentParser(allow_abbrev=False)
    ap.add_argument("mode", choices=["single", "multi"])
    ap.add_argument("--segments", default=None,
                    help="comma list; default = all safe segments for mode")
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--k", type=int, default=16, help="vehicles (multi mode)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--remat", action="store_true",
                    help="remat ON (flagship default is off)")
    ap.add_argument("--encoding", default="flagship",
                    choices=["flagship", "mixed"],
                    help="flagship = gather-free all-CP; mixed = +hash levels")
    ap.add_argument("--cpu", action="store_true", help="smoke mode off-TPU")
    ap.add_argument("--allow-hazard", action="store_true",
                    help="run the remat-off grad(sdf_nablas_feat) subgraph "
                         "known to SIGILL the remote compiler (PERF.md)")
    ap.add_argument("--trace", default=None,
                    help="jax.profiler trace output dir")
    return ap.parse_args()


ARGS = parse_args()
if ARGS.cpu:
    jax.config.update("jax_platforms", "cpu")

from neuralsim_tpu.utils.compile_cache import setup_compile_cache  # noqa: E402

setup_compile_cache("/root/repo/.jax_cache")


# ---------------------------------------------------------------- timing core
def chain(fn, params, label, iters=None, reps=None):
    """Chained-scan timing: per-iteration cost of fn(params) with a
    data-dependent loop so XLA cannot hoist or CSE across iterations."""
    iters = iters or ARGS.iters
    reps = reps or ARGS.reps

    def run(p, n_iter):
        def body(c, _):
            pp = jax.tree.map(
                lambda a: a + (c * 1e-30).astype(a.dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, p)
            out = fn(pp)
            return sum(jnp.sum(l).astype(jnp.float32)
                       for l in jax.tree.leaves(out)
                       if jnp.issubdtype(l.dtype, jnp.floating)), None
        s, _ = lax.scan(body, jnp.float32(0.0), None, length=n_iter)
        return s

    f = jax.jit(run, static_argnums=1)
    jax.block_until_ready(f(params, 2))
    jax.block_until_ready(f(params, 2 + iters))

    def t(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(params, n))
        return time.perf_counter() - t0

    dt = (min(t(2 + iters) for _ in range(reps)) -
          min(t(2) for _ in range(reps))) / iters
    print(f"[{label}] {dt*1e3:.2f} ms"
          + (f"  ({ARGS.rays/dt:,.0f} rays/s)" if "step" in label else ""),
          flush=True)
    return dt


# ------------------------------------------------------------- single-object
def build_single():
    """Flagship StreetSurf-class single-object path (mirrors bench.py)."""
    from neuralsim_tpu.accel import OccGridEma
    from neuralsim_tpu.dataio.synthetic import SyntheticObjectDataset, _sdf_scene
    from neuralsim_tpu.fields import (AABBSpace, NeRFDistantField, NeuSField,
                                      SimpleSky)
    from neuralsim_tpu.renderers import SingleVolumeRenderer
    from neuralsim_tpu.training import Trainer

    if ARGS.encoding == "flagship":
        enc_cfg = {"type": "tpu_mixed", "n_levels": 12, "base_res": 16,
                   "max_res": 1024, "n_feats": 8, "n_hash_levels": 0,
                   "log2_hashmap_size": 17, "cp_max_res": 2048}
    else:
        enc_cfg = {"type": "tpu_mixed", "n_levels": 10, "base_res": 16,
                   "max_res": 1024, "n_feats": 4, "n_hash_levels": 2,
                   "log2_hashmap_size": 17, "cp_max_res": 512}
    space = AABBSpace((-1, -1, -1), (1, 1, 1))
    field = NeuSField(space, geometry="lotd", encoding_cfg=enc_cfg,
                      geo_feat_dim=15, decoder_hidden=64, radiance_hidden=64,
                      ln_inv_s_init=float(np.log(30.0)),
                      cos_anneal_stop_it=500, remat=ARGS.remat,
                      compute_dtype=ARGS.dtype, eval_chunk=2_000_000)
    accel = OccGridEma(space, resolution=128, n_warmup_steps=0,
                       occ_inv_s=64.0, march_steps=48)
    occ_state = accel.init_state()
    for i in range(8 if ARGS.cpu else 40):
        occ_state = accel.update(
            occ_state, lambda x: jnp.asarray(_sdf_scene(np.asarray(x))),
            jax.random.PRNGKey(i), 1000)
    renderer = SingleVolumeRenderer(
        {"cr": field,
         "distant": NeRFDistantField(inner_radius=1.0, geometry="mlp",
                                     geo_feat_dim=8, radiance_hidden=32),
         "sky": SimpleSky(hidden=32)},
        query_cfg={"num_coarse": 16, "num_fine": (8, 8),
                   "upsample_inv_s": 64.0,
                   "upsample_inv_s_factors": (1.0, 4.0)},
        distant_query_cfg={"num_samples": 32})
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
    state = state._replace(occ={"cr": occ_state})

    N = ARGS.rays
    ds = SyntheticObjectDataset(n_frames=4, H=128, W=128)
    b = ds.sample_pixels(np.random.default_rng(0), N)
    batch = {k: jnp.asarray(v) for k, v in b.items()
             if k in ("rays_o", "rays_d", "image_rgb",
                      "image_occupancy_mask")}
    return dict(field=field, space=space, renderer=renderer, trainer=trainer,
                state=state, batch=batch, accel=accel)


def single_segments(ctx):
    trainer, state, batch = ctx["trainer"], ctx["state"], ctx["batch"]
    field, space, renderer = ctx["field"], ctx["space"], ctx["renderer"]
    params, occ = state.params, state.occ
    key = jax.random.PRNGKey(1)
    it0 = jnp.asarray(1000, jnp.int32)
    N = ARGS.rays

    # final-eval-shaped point cloud (num_coarse+fine ≈ 32 samples/ray)
    ro, rd = batch["rays_o"], batch["rays_d"]
    n_, f_, _hit = space.ray_test(ro, rd)
    t_s = n_[:, None] + (f_ - n_)[:, None] * jnp.linspace(0.05, 0.95, 32)
    x_flat = (ro[:, None, :] + t_s[..., None] * rd[:, None, :]).reshape(-1, 3)
    d_flat = jnp.broadcast_to(rd[:, None, :], (N, 32, 3)).reshape(-1, 3)

    def seg_step(p):
        # full e2e train step cost ≈ loss fwd+bwd + optimizer; uses the
        # trainer's own compute_losses under value_and_grad
        def lf(pp):
            return trainer.compute_losses(pp, dict(batch), it0, key,
                                          "pixel", occ=occ)[0]
        total, g = jax.value_and_grad(lf)(p)
        up, _ = trainer.optimizer.update(g, state.opt_state, p)
        import optax
        return optax.apply_updates(p, up)

    segs = {
        "step": seg_step,
        "loss_fwd": lambda p: trainer.compute_losses(
            p, dict(batch), it0, key, "pixel", occ=occ)[0],
        "loss_fwdbwd": lambda p: jax.grad(lambda pp: trainer.compute_losses(
            pp, dict(batch), it0, key, "pixel", occ=occ)[0])(p),
        "render_fwd": lambda p: renderer.ray_query(
            p, batch["rays_o"], batch["rays_d"], key=key, it=it0,
            occ_states=occ)["rgb_volume"],
        "field_fwd": lambda p: field.sdf_nablas_feat(p["cr"], x_flat)[0],
        "field_fwdbwd": lambda p: jax.grad(lambda pp: jnp.sum(
            field.sdf_nablas_feat(pp["cr"], x_flat)[1]))(p),
        "encoding_fwd": lambda p: field.encoding(
            p["cr"]["encoding"], space.normalize_coords(x_flat)),
        "encoding_fwdbwd": lambda p: jax.grad(lambda pp: jnp.sum(
            field.encoding(pp["cr"]["encoding"],
                           space.normalize_coords(x_flat))))(p),
        "march": lambda p: ctx["accel"].ray_proposal(
            occ["cr"], batch["rays_o"], batch["rays_d"], n_, f_, 16,
            key=key)[0],
    }
    default = ["step", "loss_fwd", "loss_fwdbwd", "render_fwd", "field_fwd",
               "encoding_fwd", "encoding_fwdbwd"]
    return segs, default, params


# ----------------------------------------------------------------- multi-obj
def build_multi():
    from bench_multi import make_scenario, vehicle_model_cfg
    from neuralsim_tpu.renderers.buffer_compose import BufferComposeRenderer
    from neuralsim_tpu.scene import AssetBank, Scene
    from neuralsim_tpu.training.multi_trainer import MultiObjectTrainer

    K = ARGS.k
    scene = Scene.load_from_scenario(make_scenario(K))
    bank = AssetBank.create({
        "Vehicle": vehicle_model_cfg(),
        "Street": {
            "model_class": "neuralsim_tpu.models.assets.LoTDNeuSStreet",
            "model_params": {
                "aabb": [[-8, -8, -1.2], [8, 8, 2.0]],
                "encoding_cfg": {"type": "tpu_mixed", "n_levels": 8,
                                 "base_res": 16, "max_res": 512,
                                 "n_feats": 4, "n_hash_levels": 0,
                                 "cp_max_res": 1024,
                                 "log2_hashmap_size": 15},
                "geo_feat_dim": 15, "radiance_hidden": 64,
                "accel_cfg": None, "pretrain": None,
                "query_cfg": {"num_coarse": 24, "num_fine": (8,),
                              "upsample_inv_s_factors": (1.0,)}},
            "asset_params": {"training_cfg": {"lr": 8e-3}}},
        "Sky": {"model_class": "neuralsim_tpu.models.assets.SimpleSkyAsset",
                "model_params": {"hidden": 32},
                "asset_params": {"training_cfg": {"lr": 3e-3}}},
    }, [scene])
    renderer = BufferComposeRenderer.from_asset_bank(scene, bank)
    trainer = MultiObjectTrainer(
        scene, renderer,
        loss_cfgs={"rgb": {"fn_type": "huber", "w": 10.0},
                   "eikonal": {"w": 0.01}, "latent": {"w": 1e-3}},
        training_cfgs=bank.training_cfgs(), uniform_sample_n=256)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               bank.init_params(jax.random.PRNGKey(1)))

    N = ARGS.rays
    rng = np.random.default_rng(0)
    theta = rng.uniform(0, 2 * math.pi, N)
    phi = rng.uniform(0.3, 1.2, N)
    rd = np.stack([np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi),
                   -np.cos(phi)], -1).astype(np.float32)
    batch = {"rays_o": jnp.asarray(
                 np.tile(np.array([[0, 0, 2.0]], np.float32), (N, 1))),
             "rays_d": jnp.asarray(rd),
             "rays_fidx": jnp.zeros((N,), jnp.int32),
             "image_rgb": jnp.full((N, 3), 0.5)}
    return dict(scene=scene, renderer=renderer, trainer=trainer, state=state,
                batch=batch)


def multi_segments(ctx):
    from neuralsim_tpu.renderers.buffer_compose import (BufferComposeRenderer,
                                                        ObjectBinding)
    trainer, state, batch = ctx["trainer"], ctx["state"], ctx["batch"]
    renderer, scene = ctx["renderer"], ctx["scene"]
    params, occ = state.params, state.occ
    key = jax.random.PRNGKey(1)
    cond = (batch["rays_fidx"].astype(jnp.float32)
            / max(scene.n_frames - 1, 1))[:, None]
    frozen = scene.slice_at(batch["rays_fidx"])

    def seg_step(p):
        def lf(pp):
            return trainer.compute_losses(pp, batch, 0, key, occ=occ)[0]
        total, g = jax.value_and_grad(lf)(p)
        up, _ = trainer.optimizer.update(g, state.opt_state, p)
        import optax
        return optax.apply_updates(p, up)

    # vehicles only / street only sub-renderers
    r_veh = BufferComposeRenderer(scene, renderer.objects, {},
                                  hit_budget_frac=renderer.hit_budget_frac,
                                  group_budget_frac=renderer.group_budget_frac)
    r_cr = BufferComposeRenderer(scene, [], renderer.scene_models)
    # pre/post overhead probe: same group math, 2-sample field budget
    cheap = [ObjectBinding(ob.obj_id, ob.model_id, ob.field,
                           {**ob.query_cfg, "num_coarse": 2, "num_fine": (),
                            "upsample_inv_s_factors": ()}, bidx=ob.bidx)
             for ob in renderer.objects]
    r_cheap = BufferComposeRenderer(scene, cheap, {},
                                    hit_budget_frac=renderer.hit_budget_frac,
                                    group_budget_frac=renderer.group_budget_frac)

    def rq(r, with_grad=False):
        def fwd(p):
            return r.ray_query(p, frozen, batch["rays_o"], batch["rays_d"],
                               key=key, it=0, cond=cond,
                               with_per_obj=False)["rgb_volume"]
        if not with_grad:
            return fwd
        return lambda p: jax.grad(lambda pp: jnp.sum(fwd(pp)))(p)

    segs = {
        "step": seg_step,
        "loss_fwd": lambda p: trainer.compute_losses(p, batch, 0, key,
                                                     occ=occ)[0],
        "loss_fwdbwd": lambda p: jax.grad(lambda pp: trainer.compute_losses(
            pp, batch, 0, key, occ=occ)[0])(p),
        "compose_fwd": rq(renderer),
        "compose_fwdbwd": rq(renderer, True),
        "vehicles_fwd": rq(r_veh),
        "vehicles_fwdbwd": rq(r_veh, True),
        "vehicles_overhead": rq(r_cheap),
        "street_fwd": rq(r_cr),
    }
    default = list(segs.keys())
    return segs, default, params


# ------------------------------------------------------------------- driver
def main():
    print(f"devices: {jax.devices()}  rays={ARGS.rays} "
          f"mode={ARGS.mode}" + (f" K={ARGS.k}" if ARGS.mode == "multi"
                                 else f" encoding={ARGS.encoding}"),
          flush=True)
    ctx = build_single() if ARGS.mode == "single" else build_multi()
    segs, default, params = (single_segments(ctx) if ARGS.mode == "single"
                             else multi_segments(ctx))
    want = (ARGS.segments.split(",") if ARGS.segments else default)
    unknown = [s for s in want if s not in segs]
    if unknown:
        raise SystemExit(f"unknown segments {unknown}; have {sorted(segs)}")
    if ARGS.mode == "single" and "field_fwdbwd" in want \
            and not (ARGS.remat or ARGS.allow_hazard or ARGS.cpu):
        print("[field_fwdbwd] SKIPPED: standalone remat-off "
              "grad(sdf_nablas_feat) SIGILLs the remote compiler "
              "(PERF.md known hazard); pass --allow-hazard to force, or "
              "--remat / --cpu", flush=True)
        want = [s for s in want if s != "field_fwdbwd"]

    import contextlib
    trace = (jax.profiler.trace(ARGS.trace) if ARGS.trace
             else contextlib.nullcontext())
    with trace:
        for name in want:
            fn = segs[name]
            chain(fn, params, f"{ARGS.mode}:{name}")


if __name__ == "__main__":
    from neuralsim_tpu.utils.tpu_lock import tpu_chip_lock
    with tpu_chip_lock("scripts/prof.py"):
        main()
