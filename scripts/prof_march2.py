"""Break down OccGridEma.ray_proposal cost on TPU (chained-scan timing)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from neuralsim_tpu.fields import AABBSpace
from neuralsim_tpu.accel import OccGridEma
from neuralsim_tpu.ops.segment import sample_pdf

N, M, S = 8192, 48, 16
space = AABBSpace((-1, -1, -1), (1, 1, 1))
accel = OccGridEma(space, resolution=128, march_steps=M)
st = accel.init_state()
# random-ish occupancy
k = jax.random.PRNGKey(0)
v = jax.random.uniform(k, (128, 128, 128))
st = st._replace(val=v, mask=v > 0.7)
ro = jax.random.normal(jax.random.PRNGKey(1), (N, 3)) * 0.1 - jnp.array([2., 0, 0])
rd = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
near = jnp.full((N,), 0.5); far = jnp.full((N,), 4.0)
key = jax.random.PRNGKey(3)

def chain(fn, label, iters=16, reps=3):
    def run(x0, n_iter):
        def body(c, _):
            out = fn(ro + c * 1e-30)
            return jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32), None
        s, _ = lax.scan(body, jnp.float32(0.0), None, length=n_iter)
        return s
    f = jax.jit(run, static_argnums=1)
    jax.block_until_ready(f(0.0, 2)); jax.block_until_ready(f(0.0, 2 + iters))
    def t(n):
        t0 = time.perf_counter(); jax.block_until_ready(f(0.0, n))
        return time.perf_counter() - t0
    dt = (min(t(2 + iters) for _ in range(reps)) - min(t(2) for _ in range(reps))) / iters
    print(f"[{label}] {dt*1e3:.2f} ms", flush=True)

edges01 = jnp.linspace(0.0, 1.0, M + 1)

def probe_only(o):
    t_edges = near[:, None] + (far - near)[:, None] * edges01
    t_mid = 0.5 * (t_edges[:, 1:] + t_edges[:, :-1])
    x = o[:, None, :] + t_mid[..., None] * rd[:, None, :]
    return accel.occupancy_at(st, x).astype(jnp.float32)

def pdf_only(o):
    t_edges = near[:, None] + (far - near)[:, None] * edges01
    occ = probe_only(o)
    return sample_pdf(t_edges, occ + 1e-3, S, key=key, det=False, eps=1e-6)

def pdf_det(o):
    t_edges = near[:, None] + (far - near)[:, None] * edges01
    occ = probe_only(o)
    return sample_pdf(t_edges, occ + 1e-3, S, key=None, det=True, eps=1e-6)

def full(o):
    return accel.ray_proposal(st, o, rd, near, far, S, key=key)

def sort_only(o):
    t = pdf_only(o)
    return jnp.sort(t, axis=-1)

chain(probe_only, "probe (occupancy gather)")
chain(pdf_det, "probe+sample_pdf det")
chain(pdf_only, "probe+sample_pdf rand")
chain(sort_only, "probe+pdf+sort")
chain(full, "full ray_proposal")
