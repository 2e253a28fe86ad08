"""Stacked-CP encoding parity (round-5 MXU-utilization redesign).

The per-level CP tent matmul `[F=8, R] @ [R, N]` uses <=8/128 of the MXU's
systolic rows; `cp_stacked` lerps every CP level's lines onto one unified
max-resolution grid and runs one `[L*F, R_max] @ [R_max, N]` matmul per
axis (fields/encodings/lotd.py). With exact nesting ((R_max-1) a multiple
of every (R_l-1)) the represented function is identical, so features and
jacobians must match the per-level path within bf16 rounding.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsim_tpu.fields.encodings.lotd import LoTDEncoding

LEVELS = [(9, 4, "cp"), (17, 4, "cp"), (33, 4, "cp"), (12, 4, "dense")]


@pytest.fixture(scope="module")
def encs():
    return (LoTDEncoding(LEVELS, cp_stacked=True),
            LoTDEncoding(LEVELS, cp_stacked=False))


def test_stacked_enabled_and_layout(encs):
    new, old = encs
    assert new.cp_stacked and not old.cp_stacked
    assert new.cp_rmax == 33
    assert new.total_params == old.total_params
    assert new.out_dim == old.out_dim


def test_feature_and_jacobian_parity(encs):
    new, old = encs
    p = new.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (513, 3))
    f_new, f_old = new(p, x), old(p, x)
    scale = float(jnp.abs(f_old).max())
    assert float(jnp.abs(f_new - f_old).max()) < 0.02 * max(scale, 1.0)
    fn, jn = new.with_jacobian(p, x)
    fo, jo = old.with_jacobian(p, x)
    jscale = float(jnp.abs(jo).max())
    assert float(jnp.abs(jn - jo).max()) < 0.05 * max(jscale, 1.0)
    np.testing.assert_allclose(np.asarray(fn), np.asarray(f_new), atol=1e-6)


def test_batched_parity_and_grads(encs):
    new, old = encs
    pb = new.init_batched(jax.random.PRNGKey(2), 3)
    x = jax.random.uniform(jax.random.PRNGKey(3), (257, 3))
    b = jax.random.randint(jax.random.PRNGKey(4), (257,), 0, 3)
    fn, fo = new(pb, x, bidx=b), old(pb, x, bidx=b)
    scale = float(jnp.abs(fo).max())
    assert float(jnp.abs(fn - fo).max()) < 0.02 * max(scale, 1.0)
    g = jax.grad(lambda p: jnp.sum(new(p, x, bidx=b) ** 2))(pb)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    assert float(sum(jnp.sum(jnp.abs(l)) for l in leaves)) > 0


def test_max_level_anneal_masks_stacked_levels(encs):
    new, old = encs
    p = new.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (65, 3))
    for ml in (0, 1, 2):
        fn = new(p, x, max_level=jnp.asarray(ml))
        fo = old(p, x, max_level=jnp.asarray(ml))
        scale = float(jnp.abs(fo).max())
        assert float(jnp.abs(fn - fo).max()) < 0.02 * max(scale, 1.0)
        # levels above the window are exactly zero in both
        start = sum(s.n_feats for s in new.specs[:ml + 1])
        dense_start = sum(s.n_feats for s in new.specs[:3])
        if ml < 2:
            assert float(jnp.abs(fn[:, start:dense_start]).max()) == 0.0
