"""Profile the occ-grid march proposal pieces (chained-scan, real TPU).

The full proposal measured 12.6 ms at [8192 rays, M=48, 16 samples] — far
above first-principles cost. Break it down: 3D-bool-mask gather vs linear
f32 gather, sample_pdf, sort.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from neuralsim_tpu.fields import AABBSpace
from neuralsim_tpu.accel import OccGridEma
from neuralsim_tpu.ops.segment import sample_pdf

N, M, S = 8192, 48, 16
space = AABBSpace((-1, -1, -1), (1, 1, 1))
accel = OccGridEma(space, resolution=128, n_warmup_steps=0, march_steps=M)
rng = np.random.default_rng(0)
val = (rng.random((128, 128, 128)) < 0.05).astype(np.float32)
from neuralsim_tpu.accel.occ_grid import OccGridState
st = OccGridState(val=jnp.asarray(val), mask=jnp.asarray(val > 0.5))

rays_o = jnp.asarray(rng.normal(size=(N, 3)) * 0.1, jnp.float32)
d = rng.normal(size=(N, 3))
rays_d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                     jnp.float32)
near = jnp.full((N,), 0.05)
far = jnp.full((N,), 2.0)
key = jax.random.PRNGKey(0)

mask_f32 = st.mask.astype(jnp.float32).reshape(-1)
mask_i8 = st.mask.reshape(-1)


def chain(fn, label, iters=16, reps=3):
    def run(seed, n_iter):
        def body(c, _):
            out = fn(rays_o + c * 1e-30, seed)
            return sum(jnp.sum(o).astype(jnp.float32)
                       for o in jax.tree.leaves(out)), None
        s, _ = lax.scan(body, jnp.float32(0.0), None, length=n_iter)
        return s
    f = jax.jit(run, static_argnums=1)
    jax.block_until_ready(f(key, 2))
    jax.block_until_ready(f(key, 2 + iters))
    def t(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(key, n))
        return time.perf_counter() - t0
    dt = (min(t(2 + iters) for _ in range(reps)) -
          min(t(2) for _ in range(reps))) / iters
    print(f"[{label}] {dt*1e3:.2f} ms", flush=True)
    return dt


edges01 = jnp.linspace(0.0, 1.0, M + 1)

def probes(ro):
    t_edges = near[:, None] + (far - near)[:, None] * edges01
    t_mid = 0.5 * (t_edges[:, 1:] + t_edges[:, :-1])
    x = ro[:, None, :] + t_mid[..., None] * rays_d[:, None, :]
    return t_edges, x

chain(lambda ro, k: accel.ray_proposal(st, ro, rays_d, near, far, S, key=k),
      "full ray_proposal")

chain(lambda ro, k: accel.occupancy_at(st, probes(ro)[1]),
      "occupancy_at (3D bool advanced indexing)")

def occ_linear(ro, k):
    _, x = probes(ro)
    x01 = space.normalize_coords(x)
    inside = jnp.all((x01 >= 0) & (x01 <= 1), axis=-1)
    cell = jnp.clip((x01 * 128).astype(jnp.int32), 0, 127)
    lin = (cell[..., 0] * 128 + cell[..., 1]) * 128 + cell[..., 2]
    occ = jnp.take(mask_f32, lin.reshape(-1), mode="clip").reshape(lin.shape)
    return occ * inside

chain(occ_linear, "occupancy_at (linear f32 take)")

def occ_linear_bool(ro, k):
    _, x = probes(ro)
    x01 = space.normalize_coords(x)
    inside = jnp.all((x01 >= 0) & (x01 <= 1), axis=-1)
    cell = jnp.clip((x01 * 128).astype(jnp.int32), 0, 127)
    lin = (cell[..., 0] * 128 + cell[..., 1]) * 128 + cell[..., 2]
    occ = jnp.take(mask_i8, lin.reshape(-1), mode="clip").reshape(lin.shape)
    return occ & inside

chain(occ_linear_bool, "occupancy_at (linear bool take)")

def pdf_only(ro, k):
    t_edges, x = probes(ro)
    w = jnp.abs(jnp.sum(x, -1))  # fake weights, data-dependent
    return sample_pdf(t_edges, w, S, key=k, eps=1e-6)

chain(pdf_only, "sample_pdf only")

def pdf_sort(ro, k):
    return jnp.sort(pdf_only(ro, k), axis=-1)

chain(pdf_sort, "sample_pdf + sort")

def full_linear(ro, k):
    t_edges, x = probes(ro)
    x01 = space.normalize_coords(x)
    inside = jnp.all((x01 >= 0) & (x01 <= 1), axis=-1)
    cell = jnp.clip((x01 * 128).astype(jnp.int32), 0, 127)
    lin = (cell[..., 0] * 128 + cell[..., 1]) * 128 + cell[..., 2]
    occ = jnp.take(mask_f32, lin.reshape(-1), mode="clip").reshape(lin.shape) \
        * inside
    hit_any = jnp.max(occ, axis=-1, keepdims=True)
    w = occ + (1.0 - hit_any)
    t = sample_pdf(t_edges, w, S, key=k, eps=1e-6)
    return jnp.sort(t, axis=-1)

chain(full_linear, "full proposal (linear f32 variant)")
