"""Phase timing inside the cr NeuS ray query (chained-scan)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from neuralsim_tpu.dataio.synthetic import SyntheticObjectDataset, _sdf_scene
from neuralsim_tpu.fields import AABBSpace, NeuSField
from neuralsim_tpu.accel import OccGridEma
from neuralsim_tpu.ops.segment import sample_pdf, sort_samples

enc_cfg = {"type": "tpu_mixed", "n_levels": 10, "base_res": 16,
           "max_res": 1024, "n_feats": 4, "n_hash_levels": 2,
           "log2_hashmap_size": 17, "cp_max_res": 512}
space = AABBSpace((-1, -1, -1), (1, 1, 1))
field = NeuSField(space, geometry="lotd", encoding_cfg=enc_cfg,
                  geo_feat_dim=15, decoder_hidden=64, radiance_hidden=64,
                  ln_inv_s_init=float(np.log(30.0)), remat=True,
                  eval_chunk=2_000_000)
params = field.init(jax.random.PRNGKey(0))
accel = OccGridEma(space, resolution=128, n_warmup_steps=0, occ_inv_s=64.0)
occ_state = accel.init_state()
for i in range(40):
    occ_state = accel.update(occ_state,
                             lambda x: jnp.asarray(_sdf_scene(np.asarray(x))),
                             jax.random.PRNGKey(i), 1000)

n = 8192
ds = SyntheticObjectDataset(n_frames=4, H=128, W=128)
b = ds.sample_pixels(np.random.default_rng(0), n)
ro, rd = jnp.asarray(b["rays_o"]), jnp.asarray(b["rays_d"])
key = jax.random.PRNGKey(1)

def chain(fn, label, iters=8, reps=3):
    def run(params, n_iter):
        def body(c, _):
            p = jax.tree.map(lambda a: a + (c*1e-30).astype(a.dtype)
                             if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
            out = fn(p)
            return sum(jnp.sum(l).astype(jnp.float32) for l in jax.tree.leaves(out)), None
        s, _ = lax.scan(body, jnp.float32(0.0), None, length=n_iter)
        return s
    f = jax.jit(run, static_argnums=1)
    jax.block_until_ready(f(params, 2)); jax.block_until_ready(f(params, 2+iters))
    def t(nn):
        t0 = time.perf_counter(); jax.block_until_ready(f(params, nn))
        return time.perf_counter()-t0
    dt = (min(t(2+iters) for _ in range(reps)) - min(t(2) for _ in range(reps))) / iters
    print(f"[{label}] {dt*1e3:.1f} ms", flush=True)

n_, f_, hit = space.ray_test(ro, rd)

def march(p):
    return accel.ray_proposal(occ_state, ro + p["ln_inv_s"]*1e-30, rd, n_, f_, 16, key=key)
chain(march, "occ march proposal (16)")

t0_, _ = accel.ray_proposal(occ_state, ro, rd, n_, f_, 16, key=key)

def coarse_sdf(p):
    x = ro[:, None, :] + t0_[..., None] * rd[:, None, :]
    return field.query_sdf_feat(p, x.reshape(-1, 3))[0]
chain(coarse_sdf, "coarse sdf eval fwd (16/ray)")

def upsample_once(p):
    sdf = coarse_sdf(p).reshape(n, 16)
    from neuralsim_tpu.fields.neus import sdf_to_upsample_weights
    w = sdf_to_upsample_weights(t0_, sdf, jnp.ones_like(sdf, bool), 64.0)
    bins = jnp.concatenate([t0_, f_[:, None]], -1)
    t_new = sample_pdf(bins, w, 8, key=key)
    t, m, s = sort_samples(jnp.concatenate([t0_, t_new], -1),
                           jnp.ones((n, 24), bool),
                           jnp.concatenate([sdf, sdf[:, :8]], -1))
    return t, s
chain(upsample_once, "coarse+1 upsample stage (incl sort)")

def final_eval(p):
    x = ro[:, None, :] + jnp.concatenate([t0_, t0_+0.01], -1)[..., None] * rd[:, None, :]
    sdf, nab, feat = field.sdf_nablas_feat(p, x.reshape(-1, 3))
    return sdf, nab
chain(final_eval, "final eval w/ jacobian fwd (32/ray)")

def full_query(p):
    st = occ_state
    buf = field.ray_query(p, ro, rd, key=key, num_coarse=16, num_fine=(8, 8),
                          upsample_inv_s=64.0, upsample_inv_s_factors=(1.0, 4.0),
                          occ_t_fn=lambda r1, r2, nn, ff, nc, k:
                          accel.ray_proposal(st, r1, r2, nn, ff, nc, key=k))
    return buf["alpha"], buf["rgb"]
chain(full_query, "full cr query fwd")
chain(lambda p: jax.grad(lambda pp: sum(jnp.sum(x) for x in full_query(pp)))(p),
      "full cr query fwd+bwd")
