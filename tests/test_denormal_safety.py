"""Denormal-flush NaN regression (round-5 flagship divergence root cause).

TPU hardware flushes subnormal fp32 to zero. Analytic CP-jacobian nablas in
feature-flat regions are products of three small slopes and routinely land
below the fp32 normal range (~1.2e-38); ``jnp.linalg.norm`` of such a vector
computes ``sqrt(0)`` on TPU and its backward ``x/norm`` is 0/0 = NaN — which
poisons the WHOLE gradient even under a zero cotangent (NaN*0=NaN through
``reduce``'s x*mask). On CPU the same replay is clean because denormals
survive, which is exactly the round-4/5 capture signature
(scripts/repro_nan_debug.py clean vs the TPU run's skipped steps).

CPU can't flush denormals, but flushing maps subnormals to EXACT ZERO — so
asserting finite gradients at exact-zero inputs covers the TPU behavior.
"""
import jax
import jax.numpy as jnp
import numpy as np

from neuralsim_tpu.losses import eikonal_loss, mono_normals_loss, road_normal_loss
from neuralsim_tpu.maths.common import safe_norm, safe_normalize


def test_safe_norm_zero_and_subnormal_grads_finite():
    for val in (0.0, 1e-39, 1e-45):
        x = jnp.full((8, 3), val)
        g = jax.grad(lambda v: jnp.sum(safe_norm(v, axis=-1)))(x)
        assert np.isfinite(np.asarray(g)).all(), val
        g2 = jax.grad(lambda v: jnp.sum(safe_normalize(v) ** 2))(x)
        assert np.isfinite(np.asarray(g2)).all(), val


def test_eikonal_zero_nablas_grad_finite():
    # a zero (TPU: flushed-subnormal) nabla among normal ones, masked OUT —
    # the poison signature: NaN from the masked lane must not reach the loss
    nablas = jnp.ones((16, 3))
    nablas = nablas.at[3].set(0.0)
    mask = jnp.ones((16,)).at[3].set(0.0)

    def loss(n):
        return eikonal_loss(n, 100, {"w": 1.0}, mask=mask)

    val = loss(nablas)
    g = jax.grad(loss)(nablas)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all()

    # and even UNMASKED zero nablas must yield finite gradients
    g2 = jax.grad(lambda n: eikonal_loss(n, 100, {"w": 1.0}))(nablas)
    assert np.isfinite(np.asarray(g2)).all()


def test_normal_losses_zero_normals_grad_finite():
    normals = jnp.zeros((4, 3))
    gt = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (4, 1))
    mask = jnp.asarray([True, True, False, True])
    g = jax.grad(lambda n: mono_normals_loss(n, gt, mask, 10, {"w": 1.0}))(
        normals)
    assert np.isfinite(np.asarray(g)).all()
    g2 = jax.grad(lambda n: road_normal_loss(
        n, jnp.ones((4,)), 10, {"w": 1.0}))(normals)
    assert np.isfinite(np.asarray(g2)).all()
