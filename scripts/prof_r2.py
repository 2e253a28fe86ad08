"""Round-2 profiling: isolate where the 8x backward lives + Pallas feasibility.

Stages (each independent; failures don't kill later stages):
  enc      - tpu_mixed encoding fwd / fwd+bwd at train-step point counts
  enc_cp   - CP-levels-only encoding fwd / bwd
  enc_hash - hash-levels-only encoding fwd / bwd
  plain    - hash-only with plain XLA scatter-add backward (no custom vjp)
  field    - sdf_nablas_feat (enc + decoder + 5-tap FD) fwd / bwd
  pallas_gather - does a vector gather from a VMEM table compile in Pallas? speed?
  pallas_cp     - fused in-VMEM tent-matmul CP level kernel speed

Run: python scripts/prof_r2.py [stage ...]   (default: all)
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

cache_dir = "/root/repo/.jax_cache"
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = int(os.environ.get("PROF_N", str(8192 * 32)))  # final-eval sample count
NTAP = 5 * N                                        # with FD taps

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, iters=20, warmup=2, label=""):
    t0 = time.perf_counter()
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"[{label}] {dt*1e3:.2f} ms/iter  (compile+warmup {t_compile:.1f}s)",
          flush=True)
    return dt


def make_enc(levels_filter=None):
    from neuralsim_tpu.fields.encodings.lotd import LoTDEncoding, tpu_mixed_levels
    levels = tpu_mixed_levels(10, base_res=16, max_res=1024, n_feats=4,
                              n_hash_levels=2, log2_hashmap_size=17,
                              cp_max_res=512)
    if levels_filter:
        levels = [l for l in levels if l[2] in levels_filter]
    print("levels:", levels, flush=True)
    enc = LoTDEncoding(levels, 3, log2_hashmap_size=17)
    params = enc.init(jax.random.PRNGKey(0))
    return enc, params


def stage_enc_generic(name, filt, n):
    enc, params = make_enc(filt)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))

    fwd = jax.jit(lambda p, xx: enc(p, xx).sum())
    timeit(fwd, params, x, label=f"{name} fwd n={n}")

    g = jax.jit(jax.grad(lambda p, xx: enc(p, xx).sum(), argnums=(0, 1)))

    def gboth(p, xx):
        dp, dx = g(p, xx)
        return dp["table"].sum() + dx.sum()
    timeit(jax.jit(gboth), params, x, label=f"{name} fwd+bwd n={n}")


def stage_enc():
    stage_enc_generic("enc_mixed", None, NTAP)


def stage_enc_cp():
    stage_enc_generic("enc_cp", ("cp",), NTAP)


def stage_enc_hash():
    stage_enc_generic("enc_hash", ("hash",), NTAP)


def stage_plain():
    os.environ["NEURALSIM_PLAIN_GATHER"] = "1"
    import importlib
    import neuralsim_tpu.ops.gather as gmod
    importlib.reload(gmod)
    import neuralsim_tpu.fields.encodings.lotd as lmod
    importlib.reload(lmod)
    from neuralsim_tpu.fields.encodings.lotd import LoTDEncoding, tpu_mixed_levels
    levels = [l for l in tpu_mixed_levels(10, base_res=16, max_res=1024,
                                          n_feats=4, n_hash_levels=2,
                                          log2_hashmap_size=17, cp_max_res=512)
              if l[2] == "hash"]
    enc = LoTDEncoding(levels, 3, log2_hashmap_size=17)
    params = enc.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (NTAP, 3))
    g = jax.jit(jax.grad(lambda p, xx: enc(p, xx).sum(), argnums=(0, 1)))

    def gboth(p, xx):
        dp, dx = g(p, xx)
        return dp["table"].sum() + dx.sum()
    timeit(jax.jit(gboth), params, x, label=f"enc_hash_PLAIN fwd+bwd n={NTAP}")
    os.environ["NEURALSIM_PLAIN_GATHER"] = "0"
    importlib.reload(gmod)
    importlib.reload(lmod)


def stage_field():
    from neuralsim_tpu.fields import AABBSpace, NeuSField
    space = AABBSpace((-1, -1, -1), (1, 1, 1))
    field = NeuSField(space, geometry="lotd",
                      encoding_cfg={"type": "tpu_mixed", "n_levels": 10,
                                    "base_res": 16, "max_res": 1024,
                                    "n_feats": 4, "n_hash_levels": 2,
                                    "log2_hashmap_size": 17, "cp_max_res": 512},
                      geo_feat_dim=15, decoder_hidden=64, radiance_hidden=64,
                      remat=True, eval_chunk=2_000_000)
    params = field.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3), minval=-1, maxval=1)

    fwd = jax.jit(lambda p, xx: sum(v.sum() for v in field.sdf_nablas_feat(p, xx)))
    timeit(fwd, params, x, label=f"field sdf_nablas fwd n={N}")

    g = jax.jit(jax.grad(
        lambda p, xx: sum(v.sum() for v in field.sdf_nablas_feat(p, xx))))

    def gsum(p, xx):
        dp = g(p, xx)
        return sum(l.sum() for l in jax.tree.leaves(dp))
    timeit(jax.jit(gsum), params, x, label=f"field sdf_nablas fwd+bwd n={N}")

    # no-remat variant
    field.remat = False
    g2 = jax.jit(jax.grad(
        lambda p, xx: sum(v.sum() for v in field.sdf_nablas_feat(p, xx))))

    def gsum2(p, xx):
        dp = g2(p, xx)
        return sum(l.sum() for l in jax.tree.leaves(dp))
    timeit(jax.jit(gsum2), params, x, label=f"field sdf_nablas fwd+bwd NOREMAT n={N}")


def stage_pallas_gather():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = 2 ** 17
    F = 4
    n = NTAP
    BLK = 2048
    tbl = jax.random.normal(jax.random.PRNGKey(0), (T, F), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, T, jnp.int32)

    # attempt 1: table [T, F] in VMEM (whole), gather rows by a vector index
    def kernel(idx_ref, tbl_ref, out_ref):
        rows = idx_ref[:]                     # [BLK]
        out_ref[:] = tbl_ref[rows]            # vector gather along sublanes?

    def run(idx, tbl):
        return pl.pallas_call(
            kernel,
            grid=(n // BLK,),
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((T, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, F), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, F), jnp.float32),
        )(idx, tbl)

    try:
        f = jax.jit(run)
        timeit(f, idx, tbl, label=f"pallas row-gather [T,F] n={n}")
    except Exception:
        print("pallas row-gather [T,F] FAILED:", flush=True)
        traceback.print_exc()

    # attempt 2: table [F, T] lane-major, take along lanes
    tbl2 = jnp.asarray(tbl.T)  # [F, T]

    def kernel2(idx_ref, tbl_ref, out_ref):
        rows = idx_ref[:]                     # [1, BLK] int32
        t = tbl_ref[:]                        # [F, T]
        out_ref[:] = jnp.take(t, rows[0], axis=1)

    def run2(idx, tbl):
        return pl.pallas_call(
            kernel2,
            grid=(n // BLK,),
            in_specs=[
                pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((F, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((F, BLK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((F, n), jnp.float32),
        )(idx.reshape(1, n), tbl)

    try:
        f2 = jax.jit(run2)
        timeit(f2, idx.reshape(1, n), tbl2, label=f"pallas lane-take [F,T] n={n}")
    except Exception:
        print("pallas lane-take FAILED:", flush=True)
        traceback.print_exc()

    # XLA reference
    xla = jax.jit(lambda t, i: jnp.take(t, i, axis=1, mode="clip"))
    timeit(xla, tbl2, idx, label=f"XLA gather [F,T] n={n}")


def stage_pallas_cp():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, F = 512, 4
    n = NTAP
    BLK = 2048
    d = 3
    lines = jax.random.normal(jax.random.PRNGKey(0), (d, R, F), jnp.float32)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (d, n), maxval=float(R - 1))

    def kernel(pos_ref, lines_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.float32, (R, BLK), 0)
        acc = None
        for ax in range(d):
            p = pos_ref[ax, :]                                  # [BLK]
            w = jnp.maximum(1.0 - jnp.abs(p[None, :] - iota), 0.0)
            f_ax = jax.lax.dot_general(
                lines_ref[ax], w.astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)             # [F, BLK]
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
        )(pos, lines.astype(jnp.bfloat16))

    try:
        f = jax.jit(run)
        timeit(f, pos, lines, label=f"pallas CP level R={R} n={n}")
        # correctness vs XLA path
        out = f(pos, lines)
        iota = jnp.arange(R, dtype=jnp.float32)
        ref = None
        for ax in range(d):
            w = jnp.maximum(1.0 - jnp.abs(pos[ax][None, :] - iota[:, None]), 0.0)
            fa = jnp.dot(lines[ax].T.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
            ref = fa if ref is None else ref * fa
        err = jnp.max(jnp.abs(out - ref))
        print(f"pallas CP max err vs XLA: {float(err):.2e}", flush=True)
    except Exception:
        print("pallas CP FAILED:", flush=True)
        traceback.print_exc()

    # XLA reference timing for one CP level (3 axes)
    def xla_cp(pos, lines):
        iota = jnp.arange(R, dtype=pos.dtype)
        acc = None
        for ax in range(d):
            w = jax.nn.relu(1.0 - jnp.abs(pos[ax][None, :] - iota[:, None]))
            fa = jnp.dot(lines[ax].T.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
            acc = fa if acc is None else acc * fa
        return acc
    timeit(jax.jit(xla_cp), pos, lines, label=f"XLA CP level R={R} n={n}")


STAGES = {
    "enc": stage_enc, "enc_cp": stage_enc_cp, "enc_hash": stage_enc_hash,
    "plain": stage_plain, "field": stage_field,
    "pallas_gather": stage_pallas_gather, "pallas_cp": stage_pallas_cp,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(STAGES)
    print(f"devices: {jax.devices()}  N={N}", flush=True)
    for nm in names:
        print(f"\n=== stage {nm} ===", flush=True)
        try:
            STAGES[nm]()
        except Exception:
            traceback.print_exc()
