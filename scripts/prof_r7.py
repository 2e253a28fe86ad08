"""Dissect the 12.75 ms backward residual (prof_r6: loss fwd 14.87 /
fwd+bwd 27.62 at 8192 rays). Suspects: second-order eikonal-through-render,
the radiance<-nablas gradient path, the encoding table cotangent matmuls.

Chained-scan methodology (PERF.md). Run after bench (single TPU claim).
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
                  remat=False,
                  compute_dtype=os.environ.get("PROF_DTYPE", "float32"),
                  eval_chunk=2_000_000)


def make_trainer(loss_cfgs):
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
    return Trainer(
        renderer, loss_cfgs=loss_cfgs,
        training_cfgs={"cr": {"lr": 1e-2}, "distant": {"lr": 5e-3},
                       "sky": {"lr": 3e-3}},
        uniform_sample_n=1024)


accel = OccGridEma(space, resolution=128, n_warmup_steps=0, occ_inv_s=64.0,
                   march_steps=48)
occ_state = accel.init_state()
for i in range(40):
    occ_state = accel.update(
        occ_state, lambda x: jnp.asarray(_sdf_scene(np.asarray(x))),
        jax.random.PRNGKey(i), 1000)

LOSSES_FULL = {"rgb": {"fn_type": "huber", "w": 10.0},
               "occupancy_mask": {"w": 0.3},
               "eikonal": {"w": 0.01, "on_render_ratio": 0.3},
               "sparsity": {"w": 0.002}}
LOSSES_EIK_UNIFORM = {**LOSSES_FULL,
                      "eikonal": {"w": 0.01, "on_render_ratio": 0.0}}
LOSSES_RGB_ONLY = {"rgb": {"fn_type": "huber", "w": 10.0}}

tr_full = make_trainer(LOSSES_FULL)
state = tr_full.init_state(jax.random.PRNGKey(0))
state = state._replace(occ={"cr": occ_state})
params = state.params
occ = state.occ

N = 8192
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
    print(f"[{label}] {dt*1e3:.2f} ms", flush=True)
    return dt


def fwdbwd(trainer):
    def fn(p):
        def lf(pp):
            total, _ = trainer.compute_losses(pp, dict(batch), it0, key,
                                              "pixel", occ=occ)
            return total
        return jax.value_and_grad(lf)(p)
    return fn


# final-eval-shaped standalone: 262k pts through sdf_nablas_feat + radiance
ro, rd = batch["rays_o"], batch["rays_d"]
n_, f_, hit = space.ray_test(ro, rd)
t_s = n_[:, None] + (f_ - n_)[:, None] * jnp.linspace(0.05, 0.95, 32)
x_flat = (ro[:, None, :] + t_s[..., None] * rd[:, None, :]).reshape(-1, 3)
d_flat = jnp.broadcast_to(rd[:, None, :], (N, 32, 3)).reshape(-1, 3)


def final_eval_fwdbwd(p):
    def lf(pp):
        sdf, nab, feat = field.sdf_nablas_feat(pp["cr"], x_flat)
        rgb = field.query_radiance(pp["cr"], x_flat, d_flat, nab, feat)
        return jnp.sum(sdf) * 1e-3 + jnp.sum(rgb) * 1e-3 + jnp.sum(nab) * 1e-3
    return jax.value_and_grad(lf)(p)


def final_eval_fwdbwd_detached_nablas(p):
    def lf(pp):
        sdf, nab, feat = field.sdf_nablas_feat(pp["cr"], x_flat)
        rgb = field.query_radiance(pp["cr"], x_flat, d_flat,
                                   jax.lax.stop_gradient(nab), feat)
        return jnp.sum(sdf) * 1e-3 + jnp.sum(rgb) * 1e-3 + jnp.sum(nab) * 1e-3
    return jax.value_and_grad(lf)(p)


def final_eval_fwdbwd_second_order(p):
    """+ eikonal on the rendered nablas (the second-order term)."""
    def lf(pp):
        sdf, nab, feat = field.sdf_nablas_feat(pp["cr"], x_flat)
        rgb = field.query_radiance(pp["cr"], x_flat, d_flat, nab, feat)
        eik = jnp.mean((jnp.linalg.norm(nab, axis=-1) - 1.0) ** 2)
        return jnp.sum(sdf) * 1e-3 + jnp.sum(rgb) * 1e-3 + eik
    return jax.value_and_grad(lf)(p)


if __name__ == "__main__":
    chain(fwdbwd(tr_full), "loss fwd+bwd FULL")
    chain(fwdbwd(make_trainer(LOSSES_EIK_UNIFORM)),
          "loss fwd+bwd eik-uniform-only (no 2nd order)")
    chain(fwdbwd(make_trainer(LOSSES_RGB_ONLY)), "loss fwd+bwd rgb-only")
    chain(final_eval_fwdbwd, "final eval 262k fwd+bwd (sdf+rgb+nab sums)")
    chain(final_eval_fwdbwd_detached_nablas,
          "final eval 262k fwd+bwd, nablas detached in radiance")
    chain(final_eval_fwdbwd_second_order,
          "final eval 262k fwd+bwd + eikonal 2nd-order")
