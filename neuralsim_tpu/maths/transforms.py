"""Rigid-transform and quaternion math (batched, jit-friendly).

TPU-native equivalent of the reference's pose/attribute math
(``nr3d_lib.models.attributes`` TransformMat4x4/TransformRT/
RotationQuaternion + ``nr3d_lib.maths.inverse_transform_matrix``; usage
documented in SURVEY.md §2.9). All functions broadcast over arbitrary
leading batch dimensions and are pure jnp — safe under jit/vmap/grad.

Convention: transforms are 4x4 row-major matrices acting on column vectors,
``x_world = T @ [x_obj, 1]``; quaternions are (w, x, y, z).
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) (w,x,y,z) -> rotation matrix (..., 3, 3)."""
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rot_to_quat(R: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4) (w,x,y,z).

    Branchless (jit-safe) variant: compute all four candidate quaternions and
    select the numerically best by the largest diagonal combination.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    # Four candidates, each valid when its pivot is the largest.
    qw = jnp.stack([1 + m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], -1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    pivots = jnp.stack(
        [1 + m00 + m11 + m22, 1 + m00 - m11 - m22,
         1 - m00 + m11 - m22, 1 - m00 - m11 + m22], -1)
    best = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = quat_normalize(q, eps)
    # Canonicalize sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of two (..., 4) quaternions."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, t: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Spherical interpolation between quaternions; ``t`` broadcasts.

    Used by continuous-timestamp scene slicing (reference ``Scene.interp_at``,
    app/resources/scenes.py:200). Falls back to lerp for nearly-parallel
    quaternions.
    """
    q0 = quat_normalize(q0)
    q1 = quat_normalize(q1)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) < jnp.ndim(dot) else t
    use_lerp = sin_theta < eps
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    return quat_normalize(w0 * q0 + w1 * q1)


def lerp(a: jnp.ndarray, b: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return a + (b - a) * t


def make_transform(R: jnp.ndarray = None, t: jnp.ndarray = None) -> jnp.ndarray:
    """Assemble a (..., 4, 4) homogeneous transform from R (...,3,3) and t (...,3)."""
    if R is None and t is None:
        return jnp.eye(4)
    batch = R.shape[:-2] if R is not None else t.shape[:-1]
    if R is None:
        R = jnp.broadcast_to(jnp.eye(3), batch + (3, 3))
    if t is None:
        t = jnp.zeros(batch + (3,))
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def inverse_transform(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid(+isotropic handling left to caller) 4x4.

    Reference analog: ``nr3d_lib.maths.inverse_transform_matrix`` (SURVEY.md
    §2.9). Assumes the upper-left 3x3 is orthogonal (rotation); for scaled
    nodes the scale is kept as a separate attribute exactly like the
    reference's SceneNode (scale never enters ``transform``).
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", Rt, t)
    return make_transform(Rt, t_inv)


def compose_transforms(parent: jnp.ndarray, child: jnp.ndarray) -> jnp.ndarray:
    """world = parent @ child, broadcasting over batch dims."""
    return jnp.einsum("...ij,...jk->...ik", parent, child)


def apply_transform(T: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to points (..., 3)."""
    return jnp.einsum("...ij,...j->...i", T[..., :3, :3], x) + T[..., :3, 3]


def apply_rotation(T: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply only the rotation part to direction vectors (..., 3)."""
    return jnp.einsum("...ij,...j->...i", T[..., :3, :3], v)
