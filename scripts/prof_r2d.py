"""Hash-gather backward strategies at train scale, hoisting-proof.

The chain perturbs the int INDICES with a runtime-zero derived from the
previous iteration's output — gather does not commute with that, so XLA can
neither hoist the gather out of the scan nor overlap iterations.
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

N = int(os.environ.get("PROF_N", str(8192 * 32 * 5)))
T = 2 ** 17
F = 4
NG = 16  # 8 corners x 2 hash levels


def chain_time(make_fn, label, iters=8, reps=3):
    tbl = jax.random.normal(jax.random.PRNGKey(0), (F, T), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T, jnp.int32)
    g = jax.random.normal(jax.random.PRNGKey(2), (N,), jnp.float32)

    def run(tbl, idx, g, n_iter):
        def body(c, _):
            zero = jnp.int32(jnp.abs(c) * 1e-30)   # runtime 0, opaque to XLA
            out = make_fn(tbl, (idx + zero) % T, g)
            return sum(jnp.sum(l) for l in jax.tree.leaves(out)), None
        s, _ = lax.scan(body, jnp.float32(0.0), None, length=n_iter)
        return s

    f = jax.jit(run, static_argnums=3)
    jax.block_until_ready(f(tbl, idx, g, 2))
    jax.block_until_ready(f(tbl, idx, g, 2 + iters))

    def t(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(tbl, idx, g, n))
        return time.perf_counter() - t0
    t_small = min(t(2) for _ in range(reps))
    t_big = min(t(2 + iters) for _ in range(reps))
    dt = (t_big - t_small) / iters
    print(f"[{label}] {dt*1e3:.2f} ms/iter", flush=True)
    return dt


def fwd_only(tbl, idx, g):
    out = 0.0
    for c in range(NG):
        r = (idx + c * 131) % T
        out = out + jnp.sum(jnp.take(tbl, r, axis=1, mode="clip") * g)
    return out


def plain(tbl, idx, g):
    def loss(tbl):
        return fwd_only(tbl, idx, g)
    return jax.grad(loss)(tbl)


def segsum(tbl, idx, g):
    from neuralsim_tpu.ops.gather import _gather_cols_segment

    def loss(tbl):
        out = 0.0
        for c in range(NG):
            r = (idx + c * 131) % T
            out = out + jnp.sum(_gather_cols_segment(tbl, r) * g)
        return out
    return jax.grad(loss)(tbl)


def plain_wx(tbl, idx, g):
    # grads wrt table AND the per-point multiplier (the x-grad analog)
    def loss(tbl, g):
        return fwd_only(tbl, idx, g)
    return jax.grad(loss, argnums=(0, 1))(tbl, g)


if __name__ == "__main__":
    print(f"devices: {jax.devices()} N={N} NG={NG}", flush=True)
    chain_time(fwd_only, "16x gather fwd only")
    chain_time(plain, "16x gather PLAIN scatter-add bwd")
    chain_time(plain_wx, "16x gather PLAIN bwd (tbl+g)")
    chain_time(segsum, "16x gather SEGSUM custom-vjp bwd")
