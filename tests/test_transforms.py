import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsim_tpu.maths import (
    apply_transform,
    compose_transforms,
    inverse_transform,
    make_transform,
    quat_mul,
    quat_normalize,
    quat_slerp,
    quat_to_rot,
    rot_to_quat,
)


def random_quat(key, batch=()):
    q = jax.random.normal(key, batch + (4,))
    return quat_normalize(q)


def test_quat_rot_roundtrip():
    key = jax.random.PRNGKey(0)
    q = random_quat(key, (64,))
    # canonical sign
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    R = quat_to_rot(q)
    # orthonormality
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bij,bkj->bik", R, R)),
        np.broadcast_to(np.eye(3), (64, 3, 3)),
        atol=1e-5,
    )
    q2 = rot_to_quat(R)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-5)


def test_quat_mul_matches_rot_compose():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    qa, qb = random_quat(k1, (8,)), random_quat(k2, (8,))
    Rab = quat_to_rot(quat_mul(qa, qb))
    Ra_Rb = jnp.einsum("bij,bjk->bik", quat_to_rot(qa), quat_to_rot(qb))
    np.testing.assert_allclose(np.asarray(Rab), np.asarray(Ra_Rb), atol=1e-5)


def test_slerp_endpoints_and_midpoint():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    q0, q1 = random_quat(k1, (4,)), random_quat(k2, (4,))
    s0 = quat_slerp(q0, q1, 0.0)
    s1 = quat_slerp(q0, q1, 1.0)
    # slerp is defined up to sign; compare rotations
    np.testing.assert_allclose(np.asarray(quat_to_rot(s0)), np.asarray(quat_to_rot(q0)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(quat_to_rot(s1)), np.asarray(quat_to_rot(q1)), atol=1e-5)
    # midpoint is equidistant in angle
    sm = quat_slerp(q0, q1, 0.5)
    d0 = jnp.abs(jnp.sum(sm * quat_normalize(q0), -1))
    d1 = jnp.abs(jnp.sum(sm * quat_normalize(q1), -1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-4)


def test_transform_inverse_compose():
    key = jax.random.PRNGKey(3)
    q = random_quat(key, (16,))
    t = jax.random.normal(jax.random.PRNGKey(4), (16, 3)) * 5
    T = make_transform(quat_to_rot(q), t)
    Tinv = inverse_transform(T)
    ident = compose_transforms(T, Tinv)
    np.testing.assert_allclose(
        np.asarray(ident), np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-4
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (16, 3))
    x2 = apply_transform(Tinv, apply_transform(T, x))
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)


def test_transforms_jit_and_grad():
    def f(t):
        T = make_transform(jnp.eye(3), t)
        return jnp.sum(apply_transform(T, jnp.ones(3)) ** 2)

    g = jax.jit(jax.grad(f))(jnp.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(g), 2 * (np.array([1.0, 2.0, 3.0]) + 1), atol=1e-5)
