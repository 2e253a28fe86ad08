"""Analytic encoding-jacobian nablas vs finite differences + autodiff oracle.

The analytic path (LoTDEncoding.with_jacobian chained with a decoder vjp)
replaces the 4-tap FD encoding passes — the r2 perf centerpiece. These tests
pin its math: jacobian vs numerical differentiation of the encoding itself,
field nablas vs autodiff, and second-order trainability (eikonal-through-
render gradient flows to the table).
"""
import jax
import jax.numpy as jnp
import numpy as np

from neuralsim_tpu.fields import AABBSpace, NeuSField
from neuralsim_tpu.fields.encodings.lotd import LoTDEncoding


def test_encoding_jacobian_matches_autodiff():
    """with_jacobian vs jax.jacfwd of the forward — the exact oracle (an FD
    oracle is invalid here: the CP tent matmuls run in bf16, so FD(eps=1e-4)
    amplifies quantization noise ~20x; autodiff differentiates the same
    quantized program)."""
    levels = [(8, 2, "dense"), (16, 2, "cp"), (24, 2, "hash")]
    enc = LoTDEncoding(levels, 3, log2_hashmap_size=8)
    params = enc.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).uniform(0.05, 0.95, (64, 3)),
                    jnp.float32)
    out, jac = enc.with_jacobian(params, x)
    assert out.shape == (64, enc.out_dim)
    assert jac.shape == (64, enc.out_dim, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(enc(params, x)),
                               rtol=1e-5, atol=1e-6)
    J_ad = jax.vmap(jax.jacfwd(lambda xx: enc(params, xx)))(x)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(J_ad),
                               rtol=1e-3, atol=1e-4)


def test_field_analytic_nablas_matches_autodiff():
    space = AABBSpace((-1, -1, -1), (1, 1, 1))
    kw = dict(space=space, geometry="lotd",
              encoding_cfg={"levels": [(8, 2, "dense"), (12, 2, "cp"),
                                       (16, 2, "hash")],
                            "log2_hashmap_size": 8},
              geo_feat_dim=4, decoder_hidden=16, remat=False)
    f_an = NeuSField(nablas_mode="analytic", **kw)
    f_ad = NeuSField(nablas_mode="autodiff", **kw)
    params = f_an.init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.default_rng(1).uniform(-0.9, 0.9, (128, 3)),
                    jnp.float32)
    sdf_a, nab_a, feat_a = f_an.sdf_nablas_feat(params, x)
    sdf_d, nab_d, feat_d = f_ad.sdf_nablas_feat(params, x)
    np.testing.assert_allclose(np.asarray(sdf_a), np.asarray(sdf_d),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(feat_a), np.asarray(feat_d),
                               rtol=1e-4, atol=1e-4)
    # autodiff through jnp.take/gather and the piecewise-linear interp agrees
    # a.e.; allow bf16-matmul noise on the CP levels
    err = np.abs(np.asarray(nab_a - nab_d))
    scale = np.abs(np.asarray(nab_d)) + 1e-2
    assert np.median(err / scale) < 2e-2
    assert float(np.mean(err / scale < 0.1)) > 0.9


def test_analytic_nablas_second_order_trains():
    """Eikonal-through-nablas must backprop to the encoding table."""
    space = AABBSpace((-1, -1, -1), (1, 1, 1))
    field = NeuSField(space=space, geometry="lotd",
                      encoding_cfg={"levels": [(8, 2, "dense"), (12, 2, "cp"),
                                               (16, 2, "hash")],
                                    "log2_hashmap_size": 8},
                      geo_feat_dim=4, decoder_hidden=16,
                      nablas_mode="analytic", remat=True)
    params = field.init(jax.random.PRNGKey(2))
    x = jnp.asarray(np.random.default_rng(2).uniform(-0.9, 0.9, (256, 3)),
                    jnp.float32)

    def eik(p):
        _, nab, _ = field.sdf_nablas_feat(p, x)
        return jnp.mean((jnp.linalg.norm(nab, axis=-1) - 1.0) ** 2)

    g = jax.grad(eik)(params)
    gt = np.asarray(g["encoding"]["table"])
    assert np.isfinite(gt).all()
    assert np.abs(gt).sum() > 0.0, "no eikonal gradient reached the table"
