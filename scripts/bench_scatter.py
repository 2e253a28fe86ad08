"""Compare scatter-add backward (jnp.take autodiff) vs sorted-segment custom
VJP on the TPU at hash-grid scale."""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from neuralsim_tpu.utils.tpu_lock import acquire_for_process
acquire_for_process("scripts/bench_scatter.py")
import jax
jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
import jax.numpy as jnp
from neuralsim_tpu.ops.gather import gather_cols

def timeit(fn, *a, iters=20):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

F, T, N = 2, 131072, 1_000_000
tbl = jax.random.normal(jax.random.PRNGKey(0), (F, T))
rows = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T)
w = jax.random.normal(jax.random.PRNGKey(2), (F, N))

f_old = jax.jit(jax.grad(lambda t: jnp.sum(jnp.take(t, rows, axis=1, mode="clip") * w)))
f_new = jax.jit(jax.grad(lambda t: jnp.sum(gather_cols(t, rows) * w)))
f_fwd = jax.jit(lambda t: jnp.sum(jnp.take(t, rows, axis=1, mode="clip") * w))

r = {"fwd_gather_ms": timeit(f_fwd, tbl) * 1e3,
     "bwd_xla_scatter_ms": timeit(f_old, tbl) * 1e3,
     "bwd_segment_ms": timeit(f_new, tbl) * 1e3}
print(json.dumps(r))
