"""Trustworthy TPU timing: scan-chained in-jit iteration (no dispatch overlap,
no DCE) + calibration against known-peak matmul and HBM copy.

Usage: python scripts/prof_r2b.py [stage ...]
"""
from __future__ import annotations

import os
import sys
import time
import traceback

import numpy as np

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

N = int(os.environ.get("PROF_N", str(8192 * 32 * 5)))  # 1.3M (with FD taps)
ITERS = 16


def _sum_leaves(out):
    return sum(jnp.sum(l).astype(jnp.float32) for l in jax.tree.leaves(out))


def chain_time(fn, args, label, iters=ITERS, reps=3):
    """fn(args)->pytree; measures per-iter time with data-dependent chaining:
    each iteration's input is perturbed by the previous output's sum, so XLA
    cannot overlap, cache, or eliminate iterations. args are REAL jit args
    (closure capture would embed them as constants -> remote-compile 413s +
    constant folding)."""
    def run(args, n_iter):
        def body(c, _):
            a = jax.tree.map(
                lambda x: x + (c * 1e-30).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, args)
            return _sum_leaves(fn(a)), None
        s, _ = lax.scan(body, jnp.float32(0.0), None, length=n_iter)
        return s

    f = jax.jit(run, static_argnums=1)
    jax.block_until_ready(f(args, 2))          # compile warm graph
    jax.block_until_ready(f(args, 2 + iters))  # compile big graph
    t_small = min(_t(f, args, 2) for _ in range(reps))
    t_big = min(_t(f, args, 2 + iters) for _ in range(reps))
    dt = (t_big - t_small) / iters
    print(f"[{label}] {dt*1e3:.3f} ms/iter", flush=True)
    return dt


def _t(f, args, n):
    t0 = time.perf_counter()
    jax.block_until_ready(f(args, n))
    return time.perf_counter() - t0


def stage_calib():
    # bf16 matmul peak: v5e ~197 TFLOPs
    M = 4096
    a = jax.random.normal(jax.random.PRNGKey(0), (M, M), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (M, M), jnp.bfloat16)
    dt = chain_time(lambda args: jnp.dot(args[0], args[1],
                                         preferred_element_type=jnp.float32),
                    (a, b), "calib matmul 4096^3 bf16")
    print(f"  -> {2*M**3/dt/1e12:.1f} TFLOP/s", flush=True)
    # HBM copy: 256 MB
    x = jax.random.normal(jax.random.PRNGKey(2), (64 * 1024 * 1024,), jnp.float32)
    dt = chain_time(lambda a: a[0] * 1.0000001, (x,), "calib copy 256MB")
    print(f"  -> {2*x.nbytes/dt/1e9:.0f} GB/s effective", flush=True)


def stage_gather():
    T = 2 ** 17
    for F in (2, 4, 8, 16):
        tbl = jax.random.normal(jax.random.PRNGKey(0), (F, T), jnp.float32)
        idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T, jnp.int32)
        dt = chain_time(lambda a: jnp.take(a[0], a[1], axis=1, mode="clip"),
                        (tbl, idx),
                        f"XLA gather [F={F},T] n={N}", iters=8)
        print(f"  -> {N/dt/1e6:.0f} Mrows/s", flush=True)


def stage_gather_int():
    # same but with int idx passed properly (no float chain on idx)
    T = 2 ** 17
    F = 4
    tbl = jax.random.normal(jax.random.PRNGKey(0), (F, T), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T, jnp.int32)

    def fn(a):
        t, i = a
        return jnp.take(t, i, axis=1, mode="clip")
    # chain only on tbl (idx int untouched)
    dt = chain_time(fn, (tbl, idx), f"XLA gather int-idx [F={F}] n={N}", iters=8)
    print(f"  -> {N/dt/1e6:.0f} Mrows/s", flush=True)


def stage_enc():
    from neuralsim_tpu.fields.encodings.lotd import LoTDEncoding, tpu_mixed_levels
    levels = tpu_mixed_levels(10, base_res=16, max_res=1024, n_feats=4,
                              n_hash_levels=2, log2_hashmap_size=17,
                              cp_max_res=512)
    for name, filt in (("mixed", None), ("cp", ("cp",)), ("hash", ("hash",))):
        lv = levels if filt is None else [l for l in levels if l[2] in filt]
        enc = LoTDEncoding(lv, 3, log2_hashmap_size=17)
        params = enc.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
        chain_time(lambda a: enc(a[0], a[1]), (params, x),
                   f"enc_{name} fwd n={N}", iters=8)
        g = jax.grad(lambda p, xx: jnp.sum(enc(p, xx)), argnums=(0, 1))
        chain_time(lambda a: g(a[0], a[1]), (params, x),
                   f"enc_{name} fwd+bwd n={N}", iters=8)


def stage_pallas_dg():
    """tpu.dynamic_gather via take_along_axis inside a Pallas kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = 2 ** 17          # hash table rows
    S = 8                # sublane replication
    n = N
    # lane-dim gather: x [S, T] table replicated across sublanes,
    # idx [S, T] arbitrary indices -> out[i,j] = table[idx[i,j]]
    cols = n // S        # want n total lookups; pad idx grid to [S, T]
    tbl = jax.random.normal(jax.random.PRNGKey(0), (T,), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (S, T), 0, T, jnp.int32)

    def kernel(tbl_ref, idx_ref, out_ref):
        x = jnp.broadcast_to(tbl_ref[:].reshape(1, T), (S, T))
        out_ref[:] = jnp.take_along_axis(x, idx_ref[:], axis=1)

    def run(tbl, idx):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, T), jnp.float32),
        )(tbl, idx)

    try:
        out = jax.jit(run)(tbl, idx)
        ref = tbl[idx]
        print("pallas lane dynamic_gather max err:",
              float(jnp.max(jnp.abs(out - ref))), flush=True)
        dt = chain_time(lambda a: run(a[0], a[1]), (tbl, idx),
                        f"pallas lane-dg [S=8,T=2^17] ({S*T} lookups)", iters=8)
        print(f"  -> {S*T/dt/1e6:.0f} Mrows/s", flush=True)
    except Exception:
        print("pallas lane-dg FAILED:", flush=True)
        traceback.print_exc()

    # sublane-dim gather: x [Tb, L] table-per-lane, idx [Tb, L]
    # -> out[i,j] = x[idx[i,j], j].  Table of Tb rows broadcast across lanes.
    Tb = 4096
    L = 128
    tbl2 = jax.random.normal(jax.random.PRNGKey(0), (Tb,), jnp.float32)
    idx2 = jax.random.randint(jax.random.PRNGKey(1), (Tb, L), 0, Tb, jnp.int32)

    def kernel2(tbl_ref, idx_ref, out_ref):
        x = jnp.broadcast_to(tbl_ref[:].reshape(Tb, 1), (Tb, L))
        out_ref[:] = jnp.take_along_axis(x, idx_ref[:], axis=0)

    def run2(tbl, idx):
        return pl.pallas_call(
            kernel2,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Tb, L), jnp.float32),
        )(tbl, idx)

    try:
        out = jax.jit(run2)(tbl2, idx2)
        ref = tbl2[idx2]
        print("pallas sublane dynamic_gather max err:",
              float(jnp.max(jnp.abs(out - ref))), flush=True)
        dt = chain_time(lambda a: run2(a[0], a[1]), (tbl2, idx2),
                        f"pallas sublane-dg [4096,128] ({Tb*L} lookups)", iters=8)
        print(f"  -> {Tb*L/dt/1e6:.0f} Mrows/s", flush=True)
    except Exception:
        print("pallas sublane-dg FAILED:", flush=True)
        traceback.print_exc()


def stage_pallas_cp():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, F, d = 512, 4, 3
    n = N
    BLK = 1024
    lines = jax.random.normal(jax.random.PRNGKey(0), (d, R, F), jnp.float32)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (d, n), maxval=float(R - 1))

    def kernel(pos_ref, lines_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (R, BLK), 0).astype(jnp.float32)
        acc = None
        for ax in range(d):
            p = pos_ref[ax, :]
            w = jnp.maximum(1.0 - jnp.abs(p[None, :] - iota), 0.0)
            f_ax = jax.lax.dot_general(
                lines_ref[ax].astype(jnp.float32), w,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = f_ax if acc is None else acc * f_ax
        out_ref[:] = acc

    def run(pos, lines):
        return pl.pallas_call(
            kernel,
            grid=(n // BLK,),
            in_specs=[
                pl.BlockSpec((d, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, R, F), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((F, BLK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((F, n), jnp.float32),
        )(pos, lines)

    try:
        out = jax.jit(run)(pos, lines)
        iota = jnp.arange(R, dtype=jnp.float32)
        ref = None
        for ax in range(d):
            w = jax.nn.relu(1.0 - jnp.abs(pos[ax][None, :] - iota[:, None]))
            fa = jnp.dot(lines[ax].T, w, preferred_element_type=jnp.float32)
            ref = fa if ref is None else ref * fa
        print("pallas CP max err:", float(jnp.max(jnp.abs(out - ref))), flush=True)
        chain_time(lambda a: run(a[0], a[1]), (pos, lines),
                   f"pallas CP level R={R} n={n}", iters=8)
    except Exception:
        print("pallas CP FAILED:", flush=True)
        traceback.print_exc()

    def xla_cp(a):
        pos, lines = a
        iota = jnp.arange(R, dtype=pos.dtype)
        acc = None
        for ax in range(d):
            w = jax.nn.relu(1.0 - jnp.abs(pos[ax][None, :] - iota[:, None]))
            fa = jnp.dot(lines[ax].T.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
            acc = fa if acc is None else acc * fa
        return acc
    chain_time(xla_cp, (pos, lines), f"XLA CP level R={R} n={n}", iters=8)


STAGES = {"calib": stage_calib, "gather": stage_gather,
          "gather_int": stage_gather_int, "enc": stage_enc,
          "pallas_dg": stage_pallas_dg, "pallas_cp": stage_pallas_cp}

if __name__ == "__main__":
    names = sys.argv[1:] or list(STAGES)
    print(f"devices: {jax.devices()}  N={N}", flush=True)
    for nm in names:
        print(f"\n=== stage {nm} ===", flush=True)
        try:
            STAGES[nm]()
        except Exception:
            traceback.print_exc()


def stage_bwd_variants():
    """Honest comparison of hash-gather backward strategies at train scale."""
    T = 2 ** 17
    F = 4
    n = N

    tbl = jax.random.normal(jax.random.PRNGKey(0), (F, T), jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n,), minval=0.0, maxval=1.0)

    def rows_of(x):
        # data-dependent rows (so the chain perturbation reaches them)
        return (x * (T - 1)).astype(jnp.int32)

    def run_plain(a):
        tbl, x = a
        def loss(tbl, x):
            out = 0.0
            for c in range(16):   # 8 corners x 2 levels worth of gathers
                r = (rows_of(x) + c * 131) % T
                out = out + jnp.sum(jnp.take(tbl, r, axis=1, mode="clip") * x)
            return out
        return jax.grad(loss, argnums=(0, 1))(tbl, x)

    chain_time(run_plain, (tbl, x), f"16x gather PLAIN fwd+bwd n={n}", iters=4)

    from neuralsim_tpu.ops.gather import _gather_cols_segment

    def run_seg(a):
        tbl, x = a
        def loss(tbl, x):
            out = 0.0
            for c in range(16):
                r = (rows_of(x) + c * 131) % T
                out = out + jnp.sum(_gather_cols_segment(tbl, r) * x)
            return out
        return jax.grad(loss, argnums=(0, 1))(tbl, x)

    chain_time(run_seg, (tbl, x), f"16x gather SEGSUM fwd+bwd n={n}", iters=4)

    def run_one_sort(a):
        # ONE argsort shared by all 16 corner streams: sort once by a fused id
        tbl, x = a
        def loss(tbl, x):
            out = 0.0
            rs, gs = [], []
            for c in range(16):
                r = (rows_of(x) + c * 131) % T
                out = out + jnp.sum(jnp.take(tbl, r, axis=1, mode="clip") * x)
            return out
        return jax.grad(loss, argnums=(0, 1))(tbl, x)
    # placeholder: same as plain (kept for log symmetry)


STAGES["bwd_variants"] = stage_bwd_variants
