"""Round-2 (cont.) full-step residual profile at bench shapes.

bench.py measures ~30 ms/step at 8192 rays (274.6k rays/s). PERF.md's last
breakdown predates levers #12/#13; this script re-measures the step's
top-level components with the chained-scan methodology (the only timing
method that survived cross-checks on the axon stack — see PERF.md):

  full loss fwd | loss fwd+bwd | renderer fwd | cr query fwd | march
  proposal | distant query | sky | uniform eikonal/sparsity | optimizer
  update | occ EMA refresh

Run: python scripts/prof_r6.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from neuralsim_tpu.accel import OccGridEma
from neuralsim_tpu.dataio.synthetic import SyntheticObjectDataset, _sdf_scene
from neuralsim_tpu.fields import AABBSpace, NeRFDistantField, NeuSField, SimpleSky
from neuralsim_tpu.renderers import SingleVolumeRenderer
from neuralsim_tpu.training import Trainer

enc_cfg = {"type": "tpu_mixed", "n_levels": 12, "base_res": 16,
           "max_res": 1024, "n_feats": 8, "n_hash_levels": 0,
           "log2_hashmap_size": 17, "cp_max_res": 2048}
space = AABBSpace((-1, -1, -1), (1, 1, 1))
field = NeuSField(space, geometry="lotd", encoding_cfg=enc_cfg,
                  geo_feat_dim=15, decoder_hidden=64, radiance_hidden=64,
                  ln_inv_s_init=float(np.log(30.0)), cos_anneal_stop_it=500,
                  remat=False, eval_chunk=2_000_000)
renderer = SingleVolumeRenderer(
    {"cr": field,
     "distant": NeRFDistantField(inner_radius=1.0, geometry="mlp",
                                 geo_feat_dim=8, radiance_hidden=32),
     "sky": SimpleSky(hidden=32)},
    query_cfg={"num_coarse": 16, "num_fine": (8, 8),
               "upsample_inv_s": 64.0,
               "upsample_inv_s_factors": (1.0, 4.0)},
    distant_query_cfg={"num_samples": 32})

accel = OccGridEma(space, resolution=128, n_warmup_steps=0, occ_inv_s=64.0,
                   march_steps=48)
occ_state = accel.init_state()
for i in range(40):
    occ_state = accel.update(
        occ_state, lambda x: jnp.asarray(_sdf_scene(np.asarray(x))),
        jax.random.PRNGKey(i), 1000)
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
params = state.params

N = int(os.environ.get("BENCH_RAYS", "8192"))
ds = SyntheticObjectDataset(n_frames=4, H=128, W=128)
rng = np.random.default_rng(0)
b = ds.sample_pixels(rng, N)
batch = {k: jnp.asarray(v) for k, v in b.items()
         if k in ("rays_o", "rays_d", "image_rgb", "image_occupancy_mask")}
key = jax.random.PRNGKey(1)
it0 = jnp.asarray(1000, jnp.int32)


def chain(fn, label, iters=8, reps=3):
    def run(p, n_iter):
        def body(c, _):
            pp = jax.tree.map(
                lambda a: a + (c * 1e-30).astype(a.dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, p)
            out = fn(pp)
            return sum(jnp.sum(l).astype(jnp.float32)
                       for l in jax.tree.leaves(out)
                       if jnp.issubdtype(l.dtype, jnp.floating)
                       or jnp.issubdtype(l.dtype, jnp.integer)), None
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
    print(f"[{label}] {dt*1e3:.2f} ms", flush=True)
    return dt


def loss_fwd(p):
    total, extras = trainer.compute_losses(p, dict(batch), it0, key, "pixel",
                                           occ=state.occ)
    return (total,)


def loss_fwdbwd(p):
    def lf(pp):
        total, _ = trainer.compute_losses(pp, dict(batch), it0, key, "pixel",
                                          occ=state.occ)
        return total
    total, grads = jax.value_and_grad(lf)(p)
    return (total, grads)


def render_fwd(p):
    r = renderer.ray_query(p, batch["rays_o"], batch["rays_d"], key=key,
                           it=it0, with_rgb=True, occ_states=state.occ)
    return (r["rgb_volume"], r["depth_volume"], r["mask_volume"])


def cr_fwd(p):
    st = state.occ["cr"]
    cfg = dict(renderer.query_cfg)
    cfg["occ_t_fn"] = lambda ro, rd, n_, f_, nc, k: accel.ray_proposal(
        st, ro, rd, n_, f_, nc, key=k)
    buf = field.ray_query(p["cr"], batch["rays_o"], batch["rays_d"], key=key,
                          it=it0, with_rgb=True, **cfg)
    return (buf["t"], buf["alpha"], buf["rgb"])


def march_only(p):
    ro, rd = batch["rays_o"], batch["rays_d"]
    n_, f_, hit = space.ray_test(ro, rd)
    # perturb via p so the chain is data-dependent
    eps = sum(jnp.sum(l) for l in jax.tree.leaves(p["cr"]["ln_inv_s"])) * 1e-30
    t, m = accel.ray_proposal(state.occ["cr"], ro + eps, rd, n_, f_, 16,
                              key=key)
    return (t, m)


def distant_fwd(p):
    dv = renderer.models["distant"]
    dv_near = jnp.full((N,), 1.0)
    buf = dv.ray_query(p["distant"], batch["rays_o"], batch["rays_d"],
                       key=key, it=it0, near=dv_near, with_rgb=True,
                       num_samples=32)
    return (buf["t"], buf["alpha"])


def sky_fwd(p):
    return (renderer.models["sky"](p["sky"], batch["rays_d"]),)


def uniform_reg(p):
    x_u, sdf_u, nab_u = field.sample_pts_uniform(p["cr"], key, 1024)
    return (sdf_u, nab_u)


def uniform_reg_bwd(p):
    def lf(pp):
        x_u, sdf_u, nab_u = field.sample_pts_uniform(pp["cr"], key, 1024)
        return jnp.mean((jnp.linalg.norm(nab_u, axis=-1) - 1.0) ** 2) \
            + jnp.mean(jnp.abs(sdf_u))
    return jax.value_and_grad(lf)(p)


def opt_update(p):
    g = jax.tree.map(jnp.zeros_like, p)
    updates, _ = trainer.optimizer.update(g, state.opt_state, p)
    return (updates,)


def occ_refresh(p):
    st = accel.update(state.occ["cr"],
                      lambda x: field.query_sdf(p["cr"], x), key, 4096)
    return (st.val, st.mask)


if __name__ == "__main__":
    # ground truth: bench-style wall-clock of the real train_step.
    # train_step donates its state -> run it on a deep copy so the chain
    # functions below keep valid buffers.
    st = jax.tree.map(lambda a: jnp.array(a, copy=True), state)
    st, m = trainer.train_step(st, dict(batch), key, "pixel")
    jax.block_until_ready(m["loss_total"])
    iters = 30
    kk = key
    t0 = time.perf_counter()
    for i in range(iters):
        kk, sk = jax.random.split(kk)
        st, m = trainer.train_step(st, dict(batch), sk, "pixel")
    jax.block_until_ready(m["loss_total"])
    dt = (time.perf_counter() - t0) / iters
    print(f"[train_step e2e] {dt*1e3:.2f} ms  ({N/dt:,.0f} rays/s)",
          flush=True)

    chain(loss_fwd, "loss fwd")
    chain(loss_fwdbwd, "loss fwd+bwd")
    chain(render_fwd, "renderer fwd")
    chain(cr_fwd, "cr query fwd")
    chain(march_only, "march proposal")
    chain(distant_fwd, "distant fwd")
    chain(sky_fwd, "sky fwd")
    chain(uniform_reg, "uniform samples fwd")
    chain(uniform_reg_bwd, "uniform eik+sparsity fwd+bwd")
    chain(opt_update, "optimizer update")
    chain(occ_refresh, "occ EMA refresh (full)")
