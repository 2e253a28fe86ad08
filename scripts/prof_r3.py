"""Round-3 profile: flagship (all-CP) bench step breakdown, chained-scan.

Phases: full train_step / loss fwd / loss fwd+bwd / render fwd / cr query
fwd+bwd / occ proposal / distant+sky / optimizer-only. Same methodology as
scripts/prof_r2b.py (data-dependent scan chains; args as real jit args).
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from neuralsim_tpu.dataio.synthetic import SyntheticObjectDataset, _sdf_scene
from neuralsim_tpu.fields import AABBSpace, NeRFDistantField, NeuSField, SimpleSky
from neuralsim_tpu.renderers import SingleVolumeRenderer
from neuralsim_tpu.training import Trainer
from neuralsim_tpu.accel import OccGridEma

enc_cfg = {"type": "tpu_mixed", "n_levels": 12, "base_res": 16,
           "max_res": 1024, "n_feats": 8, "n_hash_levels": 0,
           "log2_hashmap_size": 17, "cp_max_res": 2048}
space = AABBSpace((-1, -1, -1), (1, 1, 1))
field = NeuSField(space, geometry="lotd", encoding_cfg=enc_cfg,
                  geo_feat_dim=15, decoder_hidden=64, radiance_hidden=64,
                  ln_inv_s_init=float(np.log(30.0)), cos_anneal_stop_it=500,
                  remat=True, eval_chunk=2_000_000)
renderer = SingleVolumeRenderer(
    {"cr": field,
     "distant": NeRFDistantField(inner_radius=1.0, geometry="mlp",
                                 geo_feat_dim=8, radiance_hidden=32),
     "sky": SimpleSky(hidden=32)},
    query_cfg={"num_coarse": 16, "num_fine": (8, 8),
               "upsample_inv_s": 64.0, "upsample_inv_s_factors": (1.0, 4.0)},
    distant_query_cfg={"num_samples": 32})
accel = OccGridEma(space, resolution=128, n_warmup_steps=0, occ_inv_s=64.0,
                   march_steps=48)
occ_state = accel.init_state()
for i in range(40):
    occ_state = accel.update(occ_state,
                             lambda x: jnp.asarray(_sdf_scene(np.asarray(x))),
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

n_rays = 8192
ds = SyntheticObjectDataset(n_frames=4, H=128, W=128)
b = ds.sample_pixels(np.random.default_rng(0), n_rays)
batch = {k: jnp.asarray(v) for k, v in b.items()
         if k in ("rays_o", "rays_d", "image_rgb", "image_occupancy_mask")}
key = jax.random.PRNGKey(5)


def chain(fn, label, iters=8, reps=3):
    def run(params, n_iter):
        def body(c, _):
            p = jax.tree.map(lambda a: a + (c * 1e-30).astype(a.dtype)
                             if jnp.issubdtype(a.dtype, jnp.floating) else a,
                             params)
            out = fn(p)
            return sum(jnp.sum(l).astype(jnp.float32)
                       for l in jax.tree.leaves(out)), None
        s, _ = lax.scan(body, jnp.float32(0.0), None, length=n_iter)
        return s
    f = jax.jit(run, static_argnums=1)
    jax.block_until_ready(f(state.params, 2))
    jax.block_until_ready(f(state.params, 2 + iters))
    def t(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(state.params, n))
        return time.perf_counter() - t0
    dt = (min(t(2 + iters) for _ in range(reps)) -
          min(t(2) for _ in range(reps))) / iters
    print(f"[{label}] {dt*1e3:.1f} ms", flush=True)
    return dt


# full step wall (host dispatch loop, like bench.py). train_step donates its
# state arg — run on a deep copy so the chained phases below keep theirs.
s2 = jax.tree.map(jnp.copy, state)
for _ in range(3):
    s2, m = trainer.train_step(s2, dict(batch), key, "pixel")
jax.block_until_ready(m["loss_total"])
t0 = time.perf_counter()
s3 = s2
for i in range(20):
    s3, m = trainer.train_step(s3, dict(batch), jax.random.fold_in(key, i),
                               "pixel")
jax.block_until_ready(m["loss_total"])
print(f"[full train_step (host loop)] {(time.perf_counter()-t0)/20*1e3:.1f} ms",
      flush=True)

chain(lambda p: trainer.compute_losses(p, dict(batch), state.it, key,
                                       "pixel", occ=state.occ)[0],
      "loss fwd")
chain(lambda p: jax.grad(
    lambda pp: trainer.compute_losses(pp, dict(batch), state.it, key,
                                      "pixel", occ=state.occ)[0])(p),
      "loss fwd+bwd")


def render_only(p):
    r = renderer.ray_query(p, batch["rays_o"], batch["rays_d"], key=key,
                           it=state.it, occ_states=state.occ)
    return r["rgb_volume"]


chain(render_only, "render fwd")
chain(lambda p: jax.grad(lambda pp: jnp.sum(render_only(pp)))(p),
      "render fwd+bwd")


def cr_only(p):
    cfg = dict(renderer.query_cfg)
    st = state.occ["cr"]
    cfg["occ_t_fn"] = lambda ro, rd, n_, f_, nc, k: accel.ray_proposal(
        st, ro, rd, n_, f_, nc, key=k)
    buf = field.ray_query(p["cr"], batch["rays_o"], batch["rays_d"], key=key,
                          it=state.it, **cfg)
    return buf["alpha"], buf["rgb"]


chain(cr_only, "cr query fwd")
chain(lambda p: jax.grad(
    lambda pp: sum(jnp.sum(x) for x in cr_only(pp)))(p),
      "cr query fwd+bwd")

n_, f_, hit = space.ray_test(batch["rays_o"], batch["rays_d"])


def march(p):
    return accel.ray_proposal(occ_state,
                              batch["rays_o"] + p["cr"]["ln_inv_s"] * 1e-30,
                              batch["rays_d"], n_, f_, 16, key=key)


chain(march, "occ march proposal(16) alone")


def distant_sky(p):
    dv = renderer.models["distant"]
    buf = dv.ray_query(p["distant"], batch["rays_o"], batch["rays_d"],
                       key=key, it=state.it, near=jnp.full((n_rays,), 1.0),
                       num_samples=32)
    sky = renderer.models["sky"](p["sky"], batch["rays_d"])
    return buf["alpha"], buf["rgb"], sky


chain(distant_sky, "distant+sky fwd")
chain(lambda p: jax.grad(
    lambda pp: sum(jnp.sum(x) for x in distant_sky(pp)))(p),
      "distant+sky fwd+bwd")
