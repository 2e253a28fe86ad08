"""Micro A/B of the upsample-ladder stage: split weights / pdf / sort costs
and test a rank-merge (gather-free) replacement for sort_samples.

Both inputs of the per-stage merge are already sorted (t by invariant,
t_new by the stratified sampler), so a merge needs ranks, not argsort:
  pos_old[i] = i + #(t_new <  t_old[i])
  pos_new[j] = j + #(t_old <= t_new[j])
then a one-hot matmul scatter places t/sdf/mask — no gathers at all.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from neuralsim_tpu.fields.neus import sdf_to_upsample_weights
from neuralsim_tpu.ops.segment import sample_pdf, sort_samples

N, C, F = 8192, 16, 8
key = jax.random.PRNGKey(3)
t0_ = jnp.sort(jax.random.uniform(jax.random.PRNGKey(1), (N, C)), -1) * 3 + 0.5
sdf0 = jax.random.normal(jax.random.PRNGKey(2), (N, C)) * 0.3
far = jnp.full((N,), 4.0)
m0 = jnp.ones((N, C), bool)


def chain(fn, label, iters=16, reps=3):
    def run(x0, n_iter):
        def body(c, _):
            out = fn(t0_ + c * 1e-30)
            return sum(jnp.sum(l).astype(jnp.float32)
                       for l in jax.tree.leaves(out)), None
        s, _ = lax.scan(body, jnp.float32(0.0), None, length=n_iter)
        return s
    f = jax.jit(run, static_argnums=1)
    jax.block_until_ready(f(0.0, 2)); jax.block_until_ready(f(0.0, 2 + iters))
    def t(n):
        tA = time.perf_counter(); jax.block_until_ready(f(0.0, n))
        return time.perf_counter() - tA
    dt = (min(t(2 + iters) for _ in range(reps)) - min(t(2) for _ in range(reps))) / iters
    print(f"[{label}] {dt*1e3:.2f} ms", flush=True)


def weights_only(t):
    return sdf_to_upsample_weights(t, sdf0, m0, 64.0)


def pdf_only(t):
    w = sdf_to_upsample_weights(t, sdf0, m0, 64.0)
    bins = jnp.concatenate([t, far[:, None]], -1)
    return sample_pdf(bins, w, F, key=key, det=False)


def stage_current(t):
    w = sdf_to_upsample_weights(t, sdf0, m0, 64.0)
    bins = jnp.concatenate([t, far[:, None]], -1)
    t_new = sample_pdf(bins, w, F, key=key, det=False)
    sdf_new = t_new * 0.1
    tt = jnp.concatenate([t, t_new], -1)
    mm = jnp.concatenate([m0, jnp.ones((N, F), bool)], -1)
    ss = jnp.concatenate([sdf0, sdf_new], -1)
    return sort_samples(tt, mm, ss)


def merge_rank(t, t_new, sdf_new):
    S = C + F
    # ranks via pairwise compares (C*F tiny)
    lt = (t_new[:, None, :] < t[:, :, None])                  # [N, C, F]
    pos_old = jnp.arange(C) + jnp.sum(lt, -1)                 # [N, C]
    le = (t[:, :, None] <= t_new[:, None, :])                 # [N, C, F]
    pos_new = jnp.arange(F) + jnp.sum(le, 1)                  # [N, F]
    iota = jnp.arange(S)
    oh_old = (pos_old[..., None] == iota).astype(t.dtype)     # [N, C, S]
    oh_new = (pos_new[..., None] == iota).astype(t.dtype)     # [N, F, S]
    def sc(a, b):
        return jnp.einsum("ncs,nc->ns", oh_old, a) + \
               jnp.einsum("nfs,nf->ns", oh_new, b)
    t_m = sc(t, t_new)
    s_m = sc(sdf0, sdf_new)
    m_m = sc(m0.astype(t.dtype), jnp.ones((N, F), t.dtype)) > 0.5
    return t_m, m_m, s_m


def stage_merge(t):
    w = sdf_to_upsample_weights(t, sdf0, m0, 64.0)
    bins = jnp.concatenate([t, far[:, None]], -1)
    t_new = sample_pdf(bins, w, F, key=key, det=False)
    sdf_new = t_new * 0.1
    return merge_rank(t, t_new, sdf_new)


def sortonly(t):
    tt = jnp.concatenate([t, t * 0.5 + 1.0], -1)
    mm = jnp.concatenate([m0, jnp.ones((N, C), bool)], -1)
    ss = jnp.concatenate([sdf0, sdf0], -1)
    return sort_samples(tt, mm, ss)


chain(weights_only, "weights only")
chain(pdf_only, "weights+pdf")
chain(stage_current, "stage current (argsort)")
chain(stage_merge, "stage merge-rank")
chain(sortonly, "sort_samples only (32 lanes)")

# correctness: merge == sort on the same inputs
w = sdf_to_upsample_weights(t0_, sdf0, m0, 64.0)
bins = jnp.concatenate([t0_, far[:, None]], -1)
t_new = sample_pdf(bins, w, F, key=key, det=False)
sdf_new = t_new * 0.1
a = sort_samples(jnp.concatenate([t0_, t_new], -1),
                 jnp.concatenate([m0, jnp.ones((N, F), bool)], -1),
                 jnp.concatenate([sdf0, sdf_new], -1))
b = merge_rank(t0_, t_new, sdf_new)
print("t  max|d|:", float(jnp.max(jnp.abs(a[0] - b[0]))))
print("m  mismatch:", int(jnp.sum(a[1] ^ b[1])))
print("sdf max|d|:", float(jnp.max(jnp.abs(a[2] - b[2]))))
