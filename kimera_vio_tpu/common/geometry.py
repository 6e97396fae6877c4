"""Batched SO(3)/SE(3) Lie-group operations in pure JAX.

This is the geometric core of the framework — the TPU-native replacement for
the Eigen/GTSAM `Rot3`/`Pose3` types used throughout the reference
(e.g. `include/kimera-vio/common/vio_types.h`, GTSAM `Pose3` state in
`src/backend/VioBackend.cpp`). Everything here is:

  * pure functional (no classes holding state),
  * batched-first: every op works on arbitrary leading batch dims via
    plain broadcasting, so `vmap` is rarely needed,
  * float32 by default (TPU-native), with numerically-stable small-angle
    branches implemented via Taylor-series `jnp.where` switches rather than
    data-dependent control flow (XLA-friendly).

Rotations are stored as 3x3 matrices (row-major, world-from-body unless
noted). Poses are (R, t) tuples packed into 3x4 or kept separate — we use a
small pytree `(..., 3, 3)` + `(..., 3)` convention throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Small-angle threshold below which Taylor expansions are used.
_EPS = 1e-6


def hat(w: jax.Array) -> jax.Array:
    """so(3) hat operator: (...,3) -> (...,3,3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of hat: (...,3,3) -> (...,3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta2: jax.Array):
    """Return (A, B, C) = (sinθ/θ, (1−cosθ)/θ², (θ−sinθ)/θ³) with stable
    small-angle Taylor branches. theta2 = θ²."""
    theta = jnp.sqrt(theta2)
    small = theta2 < _EPS
    # Guard against 0/0 in the large branch; values are discarded by where.
    safe_t2 = jnp.where(small, 1.0, theta2)
    safe_t = jnp.sqrt(safe_t2)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe_t) / safe_t)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_t)) / safe_t2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / safe_t2)
    return A, B, C


def so3_exp(w: jax.Array) -> jax.Array:
    """Exponential map so(3) -> SO(3) (Rodrigues). (...,3) -> (...,3,3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def so3_log(R: jax.Array) -> jax.Array:
    """Logarithm map SO(3) -> so(3). (...,3,3) -> (...,3).

    Goes through the quaternion (Shepperd's method is stable for all angles,
    including near pi), then uses theta = 2*atan2(|xyz|, w).
    """
    q = rot_to_quat(R)
    w, xyz = q[..., 0], q[..., 1:4]
    n = jnp.linalg.norm(xyz, axis=-1)
    theta = 2.0 * jnp.arctan2(n, w)
    small = n < 1e-7
    safe_n = jnp.where(small, 1.0, n)
    # scale = theta / |xyz|; Taylor: theta ~ 2n/w for small n, w ~ 1.
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 1e-12), theta / safe_n)
    return scale[..., None] * xyz


def so3_left_jacobian(w: jax.Array) -> jax.Array:
    """Left Jacobian of SO(3): J_l(w) = I + B*W + C*W^2."""
    theta2 = jnp.sum(w * w, axis=-1)
    _, B, C = _sinc_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + B[..., None, None] * W + C[..., None, None] * W2


def so3_right_jacobian(w: jax.Array) -> jax.Array:
    """Right Jacobian of SO(3): J_r(w) = J_l(-w)."""
    return so3_left_jacobian(-w)


def so3_right_jacobian_inv(w: jax.Array) -> jax.Array:
    """Inverse right Jacobian of SO(3), stable small-angle form."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    small = theta2 < _EPS
    safe_t2 = jnp.where(small, 1.0, theta2)
    safe_t = jnp.sqrt(safe_t2)
    # coefficient of W^2: (1/θ² − (1+cosθ)/(2θ sinθ))
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / safe_t2 - (1.0 + jnp.cos(safe_t)) / (2.0 * safe_t * jnp.sin(safe_t)),
    )
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + 0.5 * W + cot_term[..., None, None] * W2


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z) — used for ground-truth IO and trajectory logging
# (EuRoC GT format: qw qx qy qz, cf. reference traj_vio.csv schema in
# src/logging/Logger.cpp:88-103).
# ---------------------------------------------------------------------------


def quat_to_rot(q: jax.Array) -> jax.Array:
    """Unit quaternion (...,4) [w,x,y,z] -> rotation matrix (...,3,3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix (...,3,3) -> unit quaternion (...,4) [w,x,y,z].

    Branch-free Shepperd's method via jnp.where over the four cases.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def case(tw, tx, ty, tz, s):
        return jnp.stack([tw, tx, ty, tz], axis=-1) / (2.0 * jnp.sqrt(s)[..., None])

    s0 = jnp.maximum(1.0 + tr, 1e-12)
    q0 = case(s0, m21 - m12, m02 - m20, m10 - m01, s0)
    s1 = jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)
    q1 = case(m21 - m12, s1, m01 + m10, m02 + m20, s1)
    s2 = jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)
    q2 = case(m02 - m20, m01 + m10, s2, m12 + m21, s2)
    s3 = jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)
    q3 = case(m10 - m01, m02 + m20, m12 + m21, s3, s3)

    cond0 = tr > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    # Canonicalize: w >= 0.
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# SE(3) as (R, t) pairs.
# ---------------------------------------------------------------------------


def se3_compose(Ra, ta, Rb, tb):
    """T_a * T_b for (R, t) pairs."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def se3_transform(R, t, p):
    """Apply pose to points p (...,3)."""
    return (R @ p[..., None])[..., 0] + t


def se3_exp(xi: jax.Array):
    """Exp map se(3) -> SE(3). xi = (...,6) [omega, v] (rotation first,
    matching GTSAM Pose3::Expmap ordering). Returns (R, t)."""
    w = xi[..., 0:3]
    v = xi[..., 3:6]
    R = so3_exp(w)
    J = so3_left_jacobian(w)
    t = (J @ v[..., None])[..., 0]
    return R, t


def se3_log(R, t):
    """Log map SE(3) -> se(3) (...,6) [omega, v]."""
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    _, B, C = _sinc_coeffs(theta2)
    # J_l^{-1} = I - W/2 + coef * W^2 where coef = (1 - A/(2B)) / theta^2
    W = hat(w)
    W2 = W @ W
    small = theta2 < _EPS
    safe_t2 = jnp.where(small, 1.0, theta2)
    A, _, _ = _sinc_coeffs(theta2)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - A / (2.0 * B)) / safe_t2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    Jl_inv = eye - 0.5 * W + coef[..., None, None] * W2
    v = (Jl_inv @ t[..., None])[..., 0]
    return jnp.concatenate([w, v], axis=-1)


def se3_retract(R, t, xi):
    """Right retraction: T * Exp(xi). Used by the smoother's GN update,
    matching GTSAM Pose3 retract-on-manifold semantics
    (cf. updateStates in reference src/backend/VioBackend.cpp:1337)."""
    dR, dt = se3_exp(xi)
    return se3_compose(R, t, dR, dt)


def rotation_between(Ra, Rb):
    """Relative rotation Ra^T Rb."""
    return jnp.swapaxes(Ra, -1, -2) @ Rb


def normalize_rotation(R: jax.Array) -> jax.Array:
    """Project a near-rotation matrix back onto SO(3) (via quaternion
    round-trip — cheap, batched, keeps gradients sane). Useful after long
    products of f32 rotations."""
    return quat_to_rot(rot_to_quat(R))
