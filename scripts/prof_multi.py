"""Dissect the multi-object train step (BufferComposeRenderer, K vehicles).

Chained-scan timing (the only methodology that survives axon async dispatch
+ XLA CSE, see PERF.md r2): each phase is timed as a data-dependent scan.

Usage: python scripts/prof_multi.py [K] [cpu]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

if "cpu" in sys.argv:
    sys.argv.remove("cpu")
    jax.config.update("jax_platforms", "cpu")

from neuralsim_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache("/root/repo/.jax_cache")

from bench_multi import make_scenario  # noqa: E402  (scripts/ sibling)
from neuralsim_tpu.scene import AssetBank, Scene
from neuralsim_tpu.renderers.buffer_compose import BufferComposeRenderer
from neuralsim_tpu.training.multi_trainer import MultiObjectTrainer

sys.path.insert(0, "/root/repo/scripts")

K = int(sys.argv[1]) if len(sys.argv) > 1 else 2
N_RAYS = 8192
N_ITER = 8

scene = Scene.load_from_scenario(make_scenario(K))
bank = AssetBank.create({
    "Vehicle": {
        "model_class": "neuralsim_tpu.models.assets."
                       "ADGenerativePermutoConcatNeuSObj",
        "model_params": {
            "z_dim": 4,
            "permuto_cfg": {"n_levels": 8, "base_res": 8, "max_res": 256,
                            "log2_hashmap_size": 15},
            "geo_feat_dim": 8, "radiance_hidden": 32, "inv_s_init": 40.0,
            "query_cfg": {"num_coarse": 24, "num_fine": (8,),
                          "upsample_inv_s_factors": (1.0,)}},
        "asset_params": {"training_cfg": {"lr": 8e-3}}},
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
import os  # noqa: E402
_gbf = os.environ.get("BENCH_GROUP_FRAC")
renderer = BufferComposeRenderer.from_asset_bank(
    scene, bank, group_budget_frac=float(_gbf) if _gbf else None)
trainer = MultiObjectTrainer(
    scene, renderer,
    loss_cfgs={"rgb": {"fn_type": "huber", "w": 10.0}, "eikonal": {"w": 0.01}},
    training_cfgs=bank.training_cfgs(), uniform_sample_n=512)
params0 = bank.init_params(jax.random.PRNGKey(0))
state = trainer.init_state(jax.random.PRNGKey(1), params=params0)

rng = np.random.default_rng(0)
T = scene.n_frames
batch = {
    "rays_o": jnp.asarray(rng.normal(size=(N_RAYS, 3)) * 0.1
                          + np.array([3.0, 0.0, 1.5]), jnp.float32),
    "image_rgb": jnp.asarray(rng.uniform(size=(N_RAYS, 3)), jnp.float32),
    "rays_fidx": jnp.asarray(rng.integers(0, T, N_RAYS), jnp.int32),
}
d = rng.normal(size=(N_RAYS, 3)) - np.array([3.0, 0.0, 1.5]) * 0.3
d /= np.linalg.norm(d, axis=-1, keepdims=True)
batch["rays_d"] = jnp.asarray(d, jnp.float32)


def chain(fn, label, n_iter=N_ITER):
    """Data-dependent scan chain: perturb params slightly by prev output."""
    @jax.jit
    def run(p):
        def body(carry, _):
            pp = jax.tree_util.tree_map(
                lambda a: a * (1.0 + 1e-7 * carry) if a.dtype == jnp.float32
                else a, p)
            out = fn(pp)
            s = sum(jnp.sum(jnp.asarray(o, jnp.float32)) if o is not None
                    else 0.0 for o in jax.tree_util.tree_leaves(out))
            return s * 1e-12, None
        s, _ = lax.scan(body, jnp.float32(0.0), None, length=n_iter)
        return s
    jax.block_until_ready(run(params0))        # compile
    t0 = time.perf_counter()
    jax.block_until_ready(run(params0))
    dt = (time.perf_counter() - t0) / n_iter * 1e3
    print(f"[{label}] {dt:.2f} ms", flush=True)
    return dt


frozen = scene.slice_at(batch["rays_fidx"])
cond = (batch["rays_fidx"].astype(jnp.float32) / (T - 1))[:, None]
key = jax.random.PRNGKey(3)

# full step (ground truth)
import copy
st2 = copy.deepcopy(state)
@jax.jit
def one_step(st, b, k):
    return trainer.train_step(st, b, k)
st2, m = one_step(st2, dict(batch), key)
jax.block_until_ready(m["loss_total"])
t0 = time.perf_counter()
for i in range(N_ITER):
    st2, m = one_step(st2, dict(batch), jax.random.fold_in(key, i))
jax.block_until_ready(m["loss_total"])
e2e = (time.perf_counter() - t0) / N_ITER * 1e3
print(f"[train_step e2e] {e2e:.2f} ms  ({N_RAYS / e2e * 1e3:,.0f} rays/s)",
      flush=True)

# loss fwd / fwd+bwd
chain(lambda p: trainer.compute_losses(p, batch, 0, key)[0], "loss fwd")
chain(lambda p: jax.grad(lambda pp: trainer.compute_losses(
    pp, batch, 0, key)[0])(p), "loss fwd+bwd")

# renderer fwd (full compose)
chain(lambda p: renderer.ray_query(p, frozen, batch["rays_o"],
                                   batch["rays_d"], key=key, it=0,
                                   cond=cond)["rgb_volume"],
      "compose renderer fwd")

# vehicles only (drop street/distant/sky)
r_veh = BufferComposeRenderer(scene, renderer.objects, {},
                              hit_budget_frac=renderer.hit_budget_frac,
                              group_budget_frac=renderer.group_budget_frac)
chain(lambda p: r_veh.ray_query(p, frozen, batch["rays_o"], batch["rays_d"],
                                key=key, it=0, cond=cond)["rgb_volume"],
      "vehicle group fwd")
chain(lambda p: jax.grad(lambda pp: jnp.sum(r_veh.ray_query(
    pp, frozen, batch["rays_o"], batch["rays_d"], key=key, it=0,
    cond=cond)["rgb_volume"]))(p), "vehicle group fwd+bwd")

# street only
r_cr = BufferComposeRenderer(scene, [], renderer.scene_models)
chain(lambda p: r_cr.ray_query(p, frozen, batch["rays_o"], batch["rays_d"],
                               key=key, it=0, cond=cond,
                               only_cr=True)["rgb_volume"], "street-only fwd")

# the vehicle field alone at the query scale (K*B rays x S samples)
veh = [ob for ob in renderer.objects if ob.bidx is not None]
if veh:
    field = veh[0].field
    mid = veh[0].model_id
    B = int(round(N_RAYS * renderer.hit_budget_frac))
    KB = len(veh) * B
    ro = jnp.asarray(rng.uniform(-0.5, 0.5, (KB, 3)), jnp.float32)
    rd_ = rng.normal(size=(KB, 3)); rd_ /= np.linalg.norm(rd_, -1, keepdims=True)
    rd = jnp.asarray(rd_, jnp.float32)
    bb = jnp.repeat(jnp.arange(len(veh), dtype=jnp.int32), B)
    qc = dict(veh[0].query_cfg)
    chain(lambda p: field.ray_query(p[mid], ro, rd, key=key, it=0,
                                    bidx=bb, **qc)["alpha"],
          f"vehicle field.ray_query fwd [{KB}x rays]")
    chain(lambda p: jax.grad(lambda pp: jnp.sum(field.ray_query(
        pp[mid], ro, rd, key=key, it=0, bidx=bb, **qc)["alpha"]))(p),
        "vehicle field.ray_query fwd+bwd")
    # the raw field eval at sample scale
    S = qc.get("num_coarse", 24) + sum(qc.get("num_fine", (8,)))
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (KB * S, 3)), jnp.float32)
    bbs = jnp.repeat(bb, S)
    chain(lambda p: field.sdf_nablas_feat(p[mid], x, bidx=bbs)[1],
          f"vehicle sdf_nablas_feat fwd [{KB*S} pts]")
    chain(lambda p: jax.grad(lambda pp: jnp.sum(field.sdf_nablas_feat(
        pp[mid], x, bidx=bbs)[1]))(p), "vehicle sdf_nablas_feat fwd+bwd")
    # encoding alone
    xe = jnp.asarray(rng.uniform(0.05, 0.95, (KB * S, 7)), jnp.float32)
    chain(lambda p: field.encoding(p[mid]["encoding"], xe),
          "vehicle encoding fwd")
    chain(lambda p: jax.grad(lambda pp: jnp.sum(field.encoding(
        pp[mid]["encoding"], xe)))(p), "vehicle encoding fwd+bwd")
