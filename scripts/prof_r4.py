"""Round-3 fine-grained cr-path profile at bench shapes (chained-scan).

Breaks `cr query fwd` (25.7 ms after the march rewrite) into: coarse prop
eval / upsample pdf+sort / upsample evals / final sdf_nablas_feat /
radiance / encoding fwd / encoding with_jac / decoder MLP. Plus fwd+bwd of
the final eval + radiance (the only differentiated parts).
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from neuralsim_tpu.fields import AABBSpace, NeuSField
from neuralsim_tpu.fields.neus import sdf_to_upsample_weights
from neuralsim_tpu.ops.segment import sample_pdf, sort_samples

enc_cfg = {"type": "tpu_mixed", "n_levels": 12, "base_res": 16,
           "max_res": 1024, "n_feats": 8, "n_hash_levels": 0,
           "log2_hashmap_size": 17, "cp_max_res": 2048}
space = AABBSpace((-1, -1, -1), (1, 1, 1))
field = NeuSField(space, geometry="lotd", encoding_cfg=enc_cfg,
                  geo_feat_dim=15, decoder_hidden=64, radiance_hidden=64,
                  ln_inv_s_init=float(np.log(30.0)), cos_anneal_stop_it=500,
                  remat=__import__("os").environ.get("PROF_REMAT", "0") == "1", eval_chunk=2_000_000)
params = field.init(jax.random.PRNGKey(0))
print("levels:", [(s.res, s.n_feats, s.typ) for s in field.encoding.specs],
      flush=True)

N = 8192
C, F1, F2 = 16, 8, 8
S = C + F1 + F2
key = jax.random.PRNGKey(3)
ro = jax.random.normal(jax.random.PRNGKey(1), (N, 3)) * 0.1 \
    - jnp.array([2.0, 0.0, 0.0])
rd = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
n_, f_, hit = space.ray_test(ro, rd)
t_c = n_[:, None] + (f_ - n_)[:, None] * jnp.linspace(0, 1, C)       # [N,C]
x_c = ro[:, None, :] + t_c[..., None] * rd[:, None, :]
x_full = jnp.concatenate(
    [x_c, x_c[:, :F1], x_c[:, :F2]], 1)                              # [N,S,3]
x_flat = x_full.reshape(-1, 3)                                       # 262k
u_flat = space.normalize_coords(x_flat)


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


# --- components --------------------------------------------------------------
chain(lambda p: field.query_sdf_feat(p, x_c)[0], "coarse sdf eval 131k")
chain(lambda p: field.query_sdf_feat(p, x_c[:, :F1])[0],
      "upsample-stage sdf eval 65k")


def pdf_sort_only(p):
    sdf = jnp.sum(x_c * (1 + p["ln_inv_s"] * 1e-30), -1)     # fake sdf [N,C]
    m = jnp.ones_like(sdf, bool)
    w = sdf_to_upsample_weights(t_c, sdf, m, 64.0)
    bins = jnp.concatenate([t_c, f_[:, None]], -1)
    t_new = sample_pdf(bins, w, F1, key=key, det=False)
    tt = jnp.concatenate([t_c, t_new], -1)
    mm = jnp.concatenate([m, m[:, :F1]], -1)
    ss = jnp.concatenate([sdf, sdf[:, :F1]], -1)
    return sort_samples(tt, mm, ss)


chain(pdf_sort_only, "upsample weights+pdf+sort (no eval)")
chain(lambda p: field.sdf_nablas_feat(p, x_flat), "final sdf_nablas_feat 262k")


def radiance_only(p):
    feat = jnp.ones((x_flat.shape[0], 15), jnp.float32) * p["ln_inv_s"]
    nab = x_flat
    return field.query_radiance(p, x_flat, x_flat, nab, feat)


chain(radiance_only, "radiance 262k")
chain(lambda p: field.encoding(p["encoding"], u_flat), "encoding fwd 262k")
chain(lambda p: field.encoding.with_jacobian(p["encoding"], u_flat)[0],
      "encoding with_jac 262k")


def decoder_only(p):
    h = jnp.ones((x_flat.shape[0], field.encoding.out_dim), jnp.float32) \
        * p["ln_inv_s"]
    return field.decoder(p["decoder"], h)


chain(decoder_only, "decoder MLP 262k")

# --- bwd of the differentiated parts ------------------------------------------
def final_plus_rad(p):
    sdf, nab, feat = field.sdf_nablas_feat(p, x_flat)
    rgb = field.query_radiance(p, x_flat, x_flat, nab, feat)
    return jnp.sum(sdf) + jnp.sum(rgb) + jnp.sum(nab)


chain(final_plus_rad, "final+radiance fwd")
chain(lambda p: jax.grad(final_plus_rad)(p), "final+radiance fwd+bwd")
chain(lambda p: jax.grad(
    lambda pp: jnp.sum(field.sdf_nablas_feat(pp, x_flat)[0])
    + jnp.sum(field.sdf_nablas_feat(pp, x_flat)[1]))(p),
      "sdf_nablas_feat fwd+bwd")
chain(lambda p: jax.grad(
    lambda pp: jnp.sum(field.encoding(pp["encoding"], u_flat)))(p),
      "encoding fwd+bwd")
chain(lambda p: jax.grad(lambda pp: jnp.sum(radiance_only(pp)))(p),
      "radiance fwd+bwd")
