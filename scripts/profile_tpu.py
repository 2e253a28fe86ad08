"""Profile the training step on TPU: component timings to find the bottleneck."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import os
import time

import numpy as np
import jax
cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
import jax.numpy as jnp

from neuralsim_tpu.fields import AABBSpace, NeuSField
from neuralsim_tpu.fields.encodings.lotd import make_lotd


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    results = {}
    space = AABBSpace((-1, -1, -1), (1, 1, 1))
    N = 8192 * 128  # 1M points, the per-step field-eval load

    # 1) raw encoding forward (12-level hash grid)
    enc = make_lotd({"n_levels": 12, "base_res": 16, "max_res": 1024,
                     "log2_hashmap_size": 17, "n_feats": 2}, 3)
    ep = enc.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
    f_enc = jax.jit(lambda p, x: enc(p, x))
    results["enc_fwd_1M"] = timeit(f_enc, ep, x)

    # 2) encoding fwd+bwd (scatter-add path)
    f_encg = jax.jit(lambda p, x: jax.grad(
        lambda pp: jnp.sum(enc(pp, x) ** 2))(p)["table"].sum())
    results["enc_fwdbwd_1M"] = timeit(f_encg, ep, x)

    # 3) full field sdf+nablas (FD taps => 5x evals) fwd only
    field = NeuSField(space, geometry="lotd",
                      encoding_cfg={"n_levels": 12, "base_res": 16, "max_res": 1024,
                                    "log2_hashmap_size": 17, "n_feats": 2},
                      geo_feat_dim=15)
    fp = field.init(jax.random.PRNGKey(2))
    f_nab = jax.jit(lambda p, x: field.sdf_nablas_feat(p, x)[0].sum())
    xs = x[:131072]
    results["field_nablas_fwd_131k"] = timeit(f_nab, fp, xs)

    # 4) field fwd+bwd
    f_nabg = jax.jit(lambda p, x: jax.grad(
        lambda pp: field.sdf_nablas_feat(pp, x)[0].sum())(p)["ln_inv_s"])
    results["field_nablas_fwdbwd_131k"] = timeit(f_nabg, fp, xs)

    # 5) sort cost at render scale
    t = jax.random.uniform(jax.random.PRNGKey(3), (8192, 128))
    f_sort = jax.jit(lambda t: jnp.sort(t, axis=-1))
    results["sort_8192x128"] = timeit(f_sort, t)

    # 6) plain MLP matmul reference (what the MXU can do)
    W = jax.random.normal(jax.random.PRNGKey(4), (64, 64))
    h = jax.random.normal(jax.random.PRNGKey(5), (N, 64))
    f_mm = jax.jit(lambda h, W: jnp.dot(h, W).sum())
    results["matmul_1Mx64x64"] = timeit(f_mm, h, W)

    for k, v in results.items():
        print(f"{k}: {v*1000:.2f} ms")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
