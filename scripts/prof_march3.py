"""A/B alternative formulations for the occupancy probe + CDF sampler."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from neuralsim_tpu.fields import AABBSpace
from neuralsim_tpu.accel import OccGridEma

N, M, S, R = 8192, 48, 16, 128
space = AABBSpace((-1, -1, -1), (1, 1, 1))
accel = OccGridEma(space, resolution=R, march_steps=M)
st = accel.init_state()
k = jax.random.PRNGKey(0)
v = jax.random.uniform(k, (R, R, R))
st = st._replace(val=v, mask=v > 0.7)
mask_f = st.mask.reshape(-1).astype(jnp.float32)     # flat [R^3]
mask_bf = st.mask.reshape(-1).astype(jnp.bfloat16)
ro = jax.random.normal(jax.random.PRNGKey(1), (N, 3)) * 0.1 - jnp.array([2., 0, 0])
rd = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
near = jnp.full((N,), 0.5); far = jnp.full((N,), 4.0)
key = jax.random.PRNGKey(3)
edges01 = jnp.linspace(0.0, 1.0, M + 1)

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

def mids(o):
    t_edges = near[:, None] + (far - near)[:, None] * edges01
    t_mid = 0.5 * (t_edges[:, 1:] + t_edges[:, :-1])
    return t_edges, o[:, None, :] + t_mid[..., None] * rd[:, None, :]

def probe_3d(o):
    _, x = mids(o)
    return accel.occupancy_at(st, x).astype(jnp.float32)

def probe_flat(o):
    _, x = mids(o)
    x01 = space.normalize_coords(x)
    inside = jnp.all((x01 >= 0) & (x01 <= 1), axis=-1)
    cell = jnp.clip((x01 * R).astype(jnp.int32), 0, R - 1)
    lin = (cell[..., 0] * R + cell[..., 1]) * R + cell[..., 2]
    occ = jnp.take(mask_f, lin.reshape(-1), mode="clip").reshape(lin.shape)
    return occ * inside

def probe_flat_bf(o):
    _, x = mids(o)
    x01 = space.normalize_coords(x)
    inside = jnp.all((x01 >= 0) & (x01 <= 1), axis=-1)
    cell = jnp.clip((x01 * R).astype(jnp.int32), 0, R - 1)
    lin = (cell[..., 0] * R + cell[..., 1]) * R + cell[..., 2]
    occ = jnp.take(mask_bf, lin.reshape(-1), mode="clip").reshape(lin.shape)
    return occ.astype(jnp.float32) * inside

# --- samplers over given occ -------------------------------------------------
def pdf_current(o):
    from neuralsim_tpu.ops.segment import sample_pdf
    t_edges, x = mids(o)
    occ = probe_flat(o)
    return sample_pdf(t_edges, occ + 1e-3, S, key=key, det=False, eps=1e-6)

def pdf_onehot(o):
    t_edges, x = mids(o)
    occ = probe_flat(o)
    w = occ + 1e-3
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [N, M+1]
    # stratified sorted draws
    u = (jnp.arange(S) + jax.random.uniform(key, (N, S))) / S       # [N, S]
    ge = (u[..., :, None] >= cdf[..., None, :])                      # [N,S,M+1]
    inds = jnp.sum(ge.astype(jnp.float32), -1)                       # float idx
    below = jnp.clip(inds - 1, 0, M)
    onehot_b = (below[..., None] == jnp.arange(M + 1)).astype(jnp.float32)
    onehot_a = (jnp.clip(inds, 0, M)[..., None]
                == jnp.arange(M + 1)).astype(jnp.float32)
    cdf_b = jnp.einsum("nsm,nm->ns", onehot_b, cdf)
    cdf_a = jnp.einsum("nsm,nm->ns", onehot_a, cdf)
    bin_b = jnp.einsum("nsm,nm->ns", onehot_b, t_edges)
    bin_a = jnp.einsum("nsm,nm->ns", onehot_a, t_edges)
    denom = jnp.where(cdf_a - cdf_b < 1e-6, 1.0, cdf_a - cdf_b)
    return bin_b + (u - cdf_b) / denom * (bin_a - bin_b)

def pdf_direct(o):
    """Gather-free: for equidistant edges, accumulate interpolation directly
    from the compare tensor (no take_along_axis, no one-hot)."""
    t_edges, x = mids(o)
    occ = probe_flat(o)
    w = occ + 1e-3
    csum = jnp.cumsum(w, axis=-1)
    total = csum[..., -1:]
    cdf = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum], -1) / total
    u = (jnp.arange(S) + jax.random.uniform(key, (N, S))) / S
    # fraction through each bin, clipped to [0,1]; sample = near + sum_i
    # len_i * clip((u - cdf_i)/(cdf_{i+1}-cdf_i)) since edges are sorted
    c0 = cdf[..., None, :-1]                                  # [N,1,M]
    c1 = cdf[..., None, 1:]
    seg = jnp.clip((u[..., :, None] - c0) / jnp.maximum(c1 - c0, 1e-12), 0., 1.)
    dt = (t_edges[:, 1:] - t_edges[:, :-1])[:, None, :]       # [N,1,M]
    return near[:, None] + jnp.sum(seg * dt, -1)

chain(probe_3d, "probe 3D indexing")
chain(probe_flat, "probe flat f32 take")
chain(probe_flat_bf, "probe flat bf16 take")
chain(pdf_current, "flatprobe + sample_pdf current")
chain(pdf_onehot, "flatprobe + pdf one-hot matmul")
chain(pdf_direct, "flatprobe + pdf direct accumulate")

# correctness cross-check (det path)
from neuralsim_tpu.ops.segment import sample_pdf
t_edges, _ = mids(ro)
occ = probe_flat(ro)
t_ref = sample_pdf(t_edges, occ + 1e-3, S, key=None, det=True, eps=1e-6)
u = (jnp.arange(S) + 0.5) / S
c0 = None
w = occ + 1e-3
csum = jnp.cumsum(w, -1); total = csum[..., -1:]
cdf = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum], -1) / total
seg = jnp.clip((u[None, :, None] - cdf[:, None, :-1])
               / jnp.maximum((cdf[:, None, 1:] - cdf[:, None, :-1]), 1e-12), 0., 1.)
dtl = (t_edges[:, 1:] - t_edges[:, :-1])[:, None, :]
t_dir = near[:, None] + jnp.sum(seg * dtl, -1)
print("direct vs current max |dt|:", float(jnp.max(jnp.abs(t_dir - t_ref))))
