"""Permutohedral-lattice embedding invariants + oracle parity.

The vectorized rank/bary formulation (pairwise-compare rank, one-hot bary
reduce — replacing .at[i].add chains that blew XLA compile time 8x) must be
bit-equivalent to the classic Adams et al. loop formulation.
"""
import jax
import jax.numpy as jnp
import numpy as np

from neuralsim_tpu.fields.encodings.permuto import PermutoEncoding


def _simplex_oracle(pos: np.ndarray, sf):
    """Loop-form reference (the pre-vectorization implementation)."""
    d, N = pos.shape
    elevated = [None] * (d + 1)
    sm = np.zeros(N, pos.dtype)
    for i in range(d, 0, -1):
        cf = pos[i - 1] * sf[i - 1]
        elevated[i] = sm - i * cf
        sm = sm + cf
    elevated[0] = sm
    elevated = np.stack(elevated, 0)

    down = 1.0 / (d + 1)
    up = float(d + 1)
    v = elevated * down
    fl = np.floor(v) * up
    ce = np.ceil(v) * up
    rem0 = np.where(ce - elevated < elevated - fl, ce, fl)
    sum_val = (np.sum(rem0, 0) * down).astype(np.int32)

    diff = elevated - rem0
    rank = np.zeros((d + 1, N), np.int32)
    for i in range(d + 1):
        for j in range(i + 1, d + 1):
            gt = diff[i] < diff[j]
            rank[i] += np.where(gt, 1, 0)
            rank[j] += np.where(gt, 0, 1)
    rank = rank + sum_val[None, :]
    low = rank < 0
    high = rank > d
    rank = np.where(low, rank + d + 1, np.where(high, rank - d - 1, rank))
    rem0 = np.where(low, rem0 + d + 1, np.where(high, rem0 - (d + 1), rem0))

    diff = (elevated - rem0) * down
    bary = np.zeros((d + 2, N), pos.dtype)
    for r in range(d + 2):
        for i in range(d + 1):
            bary[r] += np.where(d - rank[i] == r, diff[i], 0.0)
            bary[r] += np.where(d + 1 - rank[i] == r, -diff[i], 0.0)
    bary[0] += 1.0 + bary[d + 1]

    keys = []
    for k in range(d + 1):
        off = np.where(rank >= (d + 1 - k), k - (d + 1), k)
        keys.append((rem0 + off).astype(np.int32)[:d])
    return keys, bary[: d + 1]


def test_simplex_matches_loop_oracle():
    for d in (3, 7, 11):
        enc = PermutoEncoding(d, n_levels=1, base_res=16, max_res=16,
                              log2_hashmap_size=10)
        rng = np.random.default_rng(d)
        pos = (rng.uniform(0, 1, (d, 257)) * 16).astype(np.float32)
        keys, bary = enc._simplex(jnp.asarray(pos))
        keys_o, bary_o = _simplex_oracle(pos.astype(np.float64), enc._sf)
        np.testing.assert_allclose(np.asarray(bary), bary_o, atol=1e-4)
        for k in range(d + 1):
            np.testing.assert_array_equal(np.asarray(keys[k]), keys_o[k])


def test_simplex_barycentric_properties():
    d = 11
    enc = PermutoEncoding(d, n_levels=1, base_res=32, max_res=32,
                          log2_hashmap_size=10)
    rng = np.random.default_rng(0)
    pos = jnp.asarray((rng.uniform(0, 1, (d, 513)) * 32).astype(np.float32))
    _, bary = enc._simplex(pos)
    b = np.asarray(bary)
    np.testing.assert_allclose(b.sum(0), 1.0, atol=1e-4)
    assert (b > -1e-4).all(), "barycentric weights must be non-negative"


def test_encoding_grad_finite_highdim():
    enc = PermutoEncoding(11, n_levels=4, base_res=4, max_res=64,
                          log2_hashmap_size=12)
    params = enc.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1).uniform(0.02, 0.98, (128, 11)),
                    jnp.float32)
    g = jax.grad(lambda p: jnp.sum(enc(p, x) ** 2))(params)
    assert np.isfinite(np.asarray(g["table"])).all()
    assert np.abs(np.asarray(g["table"])).sum() > 0


def test_with_jacobian_matches_forward_and_jacfwd():
    """with_jacobian: h must equal __call__; jac must equal autodiff
    (autodiff through the lattice is exact inside a simplex — the
    gather indices are locally constant)."""
    for d, bidx in ((3, None), (7, True)):
        enc = PermutoEncoding(d, n_levels=3, base_res=4, max_res=32,
                              log2_hashmap_size=12, n_feats=2)
        key = jax.random.PRNGKey(d)
        if bidx:
            params = enc.init_batched(key, 3)
            bf = jnp.asarray(np.random.default_rng(0).integers(0, 3, (64,)),
                             jnp.int32)
        else:
            params = enc.init(key)
            bf = None
        x = jnp.asarray(np.random.default_rng(1).uniform(0.05, 0.95, (64, d)),
                        jnp.float32)
        h_ref = enc(params, x, bidx=bf)
        h, J = enc.with_jacobian(params, x, bidx=bf, jac_dims=3)
        np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                                   rtol=1e-6, atol=1e-6)
        assert J.shape == (64, enc.out_dim, 3)

        # autodiff oracle: one jvp per spatial column
        J_rows = []
        for c in range(3):
            tang = jnp.zeros((64, d)).at[:, c].set(1.0)
            _, jvp_out = jax.jvp(lambda xx: enc(params, xx, bidx=bf), (x,),
                                 (tang,))
            J_rows.append(jvp_out)
        J_auto = jnp.stack(J_rows, axis=-1)                    # [N, F, 3]
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto),
                                   rtol=1e-4, atol=1e-4)


def test_conditional_analytic_nablas_parity():
    """Conditional field: analytic nablas == autodiff nablas (exact in-
    simplex), and close to the 5-tap FD oracle."""
    from neuralsim_tpu.fields.conditional import GenerativePermutoConcatNeuSField
    from neuralsim_tpu.fields.spatial import AABBSpace

    field = GenerativePermutoConcatNeuSField(
        AABBSpace((-1, -1, -1), (1, 1, 1)), n_instances=3, z_dim=4,
        permuto_cfg={"n_levels": 4, "base_res": 4, "max_res": 32,
                     "log2_hashmap_size": 12},
        geo_feat_dim=4, remat=False)
    params = field.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (128, 3)), jnp.float32)
    bb = jnp.asarray(rng.integers(0, 3, (128,)), jnp.int32)

    sdf_a, nab_a, feat_a = field.sdf_nablas_feat(params, x, bidx=bb)

    # autodiff oracle (vjp of the scalar sdf)
    def sdf_fn(xx):
        return field._sdf_feat_impl(params, xx, None, bidx=bb)[0]
    sdf_o, vjp = jax.vjp(sdf_fn, x)
    nab_o, = vjp(jnp.ones_like(sdf_o))
    np.testing.assert_allclose(np.asarray(sdf_a), np.asarray(sdf_o),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nab_a), np.asarray(nab_o),
                               rtol=2e-3, atol=2e-3)

    # FD oracle (loose: taps can cross simplex faces)
    field.nablas_mode = "numerical"
    _, nab_fd, _ = field.sdf_nablas_feat(params, x, bidx=bb)
    field.nablas_mode = "analytic"
    cos = np.sum(np.asarray(nab_a) * np.asarray(nab_fd), -1) / (
        np.linalg.norm(np.asarray(nab_a), axis=-1)
        * np.linalg.norm(np.asarray(nab_fd), axis=-1) + 1e-9)
    assert np.median(cos) > 0.95

    # eikonal-through-analytic-nablas must be differentiable wrt params
    g = jax.grad(lambda p: jnp.mean(
        (jnp.linalg.norm(field.sdf_nablas_feat(p, x, bidx=bb)[1], axis=-1)
         - 1.0) ** 2))(params)
    flat = np.concatenate([np.ravel(np.asarray(v))
                           for v in jax.tree_util.tree_leaves(g)])
    assert np.isfinite(flat).all() and np.abs(flat).sum() > 0
