import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kimera_vio_tpu.common import geometry as geo


def rand_rotvec(key, n, scale=2.0):
    return scale * jax.random.normal(key, (n, 3))


class TestSO3:
    def test_exp_identity(self):
        R = geo.so3_exp(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_exp_orthonormal(self):
        w = rand_rotvec(jax.random.PRNGKey(0), 64)
        R = geo.so3_exp(w)
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
        det = jnp.linalg.det(R)
        np.testing.assert_allclose(det, np.ones(64), atol=1e-5)

    def test_exp_log_roundtrip(self):
        # Angles spread over (0, pi), including tiny and near-pi.
        key = jax.random.PRNGKey(1)
        axis = jax.random.normal(key, (100, 3))
        axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
        angles = jnp.concatenate(
            [
                jnp.array([1e-9, 1e-6, 1e-4, 0.1, 1.0, 2.0, 3.0, 3.14, 3.1415]),
                jnp.linspace(0.01, 3.1, 91),
            ]
        )
        w = axis * angles[:, None]
        w2 = geo.so3_log(geo.so3_exp(w))
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=2e-3)

    def test_log_exact_pi(self):
        # Rotation by exactly pi about z.
        R = jnp.diag(jnp.array([-1.0, -1.0, 1.0]))
        w = geo.so3_log(R)
        assert abs(float(jnp.linalg.norm(w)) - np.pi) < 1e-3
        np.testing.assert_allclose(np.abs(np.asarray(w)), [0, 0, np.pi], atol=1e-3)

    def test_hat_vee(self):
        w = jnp.array([1.0, -2.0, 3.0])
        np.testing.assert_allclose(geo.vee(geo.hat(w)), w)
        W = geo.hat(w)
        np.testing.assert_allclose(W, -W.T)

    def test_left_jacobian_derivative_property(self):
        # d/dt Exp(w + t*dw)|_0 = Jl(w) approximately relates exp of sum:
        # Exp(w + dw) ~ Exp(Jl(w) dw) Exp(w)
        w = jnp.array([0.3, -0.7, 0.5])
        dw = 1e-4 * jnp.array([1.0, 2.0, -1.0])
        lhs = geo.so3_exp(w + dw)
        rhs = geo.so3_exp((geo.so3_left_jacobian(w) @ dw)) @ geo.so3_exp(w)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)

    def test_right_jacobian_property(self):
        # Exp(w + dw) ~ Exp(w) Exp(Jr(w) dw)
        w = jnp.array([0.3, -0.7, 0.5])
        dw = 1e-4 * jnp.array([1.0, 2.0, -1.0])
        lhs = geo.so3_exp(w + dw)
        rhs = geo.so3_exp(w) @ geo.so3_exp(geo.so3_right_jacobian(w) @ dw)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)

    def test_right_jacobian_inverse(self):
        w = jnp.array([0.9, -0.2, 0.4])
        J = geo.so3_right_jacobian(w)
        Jinv = geo.so3_right_jacobian_inv(w)
        np.testing.assert_allclose(np.asarray(J @ Jinv), np.eye(3), atol=1e-5)

    def test_quat_roundtrip(self):
        w = rand_rotvec(jax.random.PRNGKey(3), 128, scale=1.5)
        R = geo.so3_exp(w)
        R2 = geo.quat_to_rot(geo.rot_to_quat(R))
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(4)
        xi = jax.random.normal(key, (50, 6))
        # Keep rotation magnitude < pi so log returns the same branch.
        w_norm = jnp.linalg.norm(xi[:, :3], axis=-1, keepdims=True)
        xi = xi.at[:, :3].multiply(jnp.minimum(1.0, 2.8 / w_norm))
        R, t = geo.se3_exp(xi)
        xi2 = geo.se3_log(R, t)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)
        # And the transform itself round-trips regardless of branch.
        R2, t2 = geo.se3_exp(xi2)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-4)

    def test_compose_inverse(self):
        key = jax.random.PRNGKey(5)
        xi = jax.random.normal(key, (6,))
        R, t = geo.se3_exp(xi)
        Ri, ti = geo.se3_inverse(R, t)
        Rc, tc = geo.se3_compose(R, t, Ri, ti)
        np.testing.assert_allclose(np.asarray(Rc), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(tc), np.zeros(3), atol=1e-6)

    def test_transform(self):
        R = geo.so3_exp(jnp.array([0.0, 0.0, np.pi / 2]))
        t = jnp.array([1.0, 0.0, 0.0])
        p = jnp.array([1.0, 0.0, 0.0])
        out = geo.se3_transform(R, t, p)
        np.testing.assert_allclose(np.asarray(out), [1.0, 1.0, 0.0], atol=1e-6)

    def test_retract_zero(self):
        R = geo.so3_exp(jnp.array([0.1, 0.2, 0.3]))
        t = jnp.array([1.0, 2.0, 3.0])
        R2, t2 = geo.se3_retract(R, t, jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-6)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-6)


def test_jit_and_vmap_compatible():
    f = jax.jit(lambda w: geo.so3_log(geo.so3_exp(w)))
    w = jnp.array([0.1, -0.2, 0.3])
    np.testing.assert_allclose(np.asarray(f(w)), np.asarray(w), atol=1e-5)
    fv = jax.vmap(geo.se3_exp)
    R, t = fv(jnp.zeros((4, 6)))
    assert R.shape == (4, 3, 3) and t.shape == (4, 3)
