"""RANSAC solver tests with synthetic ground-truth motions and planted
outliers — the same strategy as the reference's testTracker.cpp
(TEST_F list at tests/testTracker.cpp:704-1613)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kimera_vio_tpu.common import geometry as geo
from kimera_vio_tpu.ops import ransac

KEY = jax.random.PRNGKey(7)


def make_scene(n=200, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), rng.uniform(4, 12, n)],
        -1,
    ).astype(np.float32)
    return pts, rng


def relative_view(pts_ref_frame, R_ref_cur, t_ref_cur):
    """Points given in ref camera frame -> cur camera frame.
    x_ref = R x_cur + t  =>  x_cur = R^T (x_ref - t)."""
    return (pts_ref_frame - t_ref_cur) @ R_ref_cur  # (x - t)^T R = R^T(x-t)


def bearings(p):
    return p / np.linalg.norm(p, axis=-1, keepdims=True)


def plant_outliers(f_cur, frac, rng):
    n = len(f_cur)
    n_out = int(frac * n)
    idx = rng.choice(n, n_out, replace=False)
    bad = rng.normal(size=(n_out, 3))
    f_cur = f_cur.copy()
    f_cur[idx] = bearings(bad + [0, 0, 5])
    truth = np.ones(n, bool)
    truth[idx] = False
    return f_cur, truth


class Test2ptMono:
    def test_recovers_translation_direction(self):
        pts, rng = make_scene()
        R = np.asarray(geo.so3_exp(jnp.array([0.02, -0.03, 0.01])))
        t = np.array([0.3, 0.1, -0.2], np.float32)
        p_cur = relative_view(pts, R, t)
        f_ref, f_cur = bearings(pts), bearings(p_cur)
        f_cur, truth = plant_outliers(f_cur, 0.3, rng)
        t_est, inl, n_inl = ransac.ransac_2pt_mono(
            jnp.asarray(f_ref), jnp.asarray(f_cur), jnp.ones(len(pts), bool),
            jnp.asarray(R), KEY, threshold=1e-8,
        )
        t_est = np.asarray(t_est)
        t_unit = t / np.linalg.norm(t)
        cos = abs(np.dot(t_est, t_unit))
        assert cos > 0.999, (t_est, t_unit)
        # Inlier classification accuracy.
        inl = np.asarray(inl)
        assert (inl == truth).mean() > 0.9
        assert int(n_inl) >= 0.9 * truth.sum()


class Test5ptMono:
    def test_recovers_full_relative_pose(self):
        pts, rng = make_scene(seed=1)
        w_true = np.array([0.05, -0.1, 0.04])
        R = np.asarray(geo.so3_exp(jnp.asarray(w_true, jnp.float32)))
        t = np.array([0.4, -0.1, 0.15], np.float32)
        p_cur = relative_view(pts, R, t)
        f_ref, f_cur = bearings(pts), bearings(p_cur)
        f_cur, truth = plant_outliers(f_cur, 0.25, rng)
        R_est, t_est, inl, n_inl = ransac.ransac_5pt_mono(
            jnp.asarray(f_ref), jnp.asarray(f_cur), jnp.ones(len(pts), bool),
            KEY, threshold=1e-9,
        )
        R_est, t_est = np.asarray(R_est), np.asarray(t_est)
        dR = np.asarray(geo.so3_log(jnp.asarray(R.T @ R_est)))
        assert np.linalg.norm(dR) < 0.01, dR
        t_unit = t / np.linalg.norm(t)
        assert abs(np.dot(t_est, t_unit)) > 0.999

    def test_pure_rotation_recovers_rotation(self):
        pts, rng = make_scene(seed=2)
        R = np.asarray(geo.so3_exp(jnp.array([0.0, 0.08, 0.0])))
        p_cur = relative_view(pts, R, np.zeros(3, np.float32))
        f_ref, f_cur = bearings(pts), bearings(p_cur)
        R_est, t_est, inl, n_inl = ransac.ransac_5pt_mono(
            jnp.asarray(f_ref), jnp.asarray(f_cur), jnp.ones(len(pts), bool),
            KEY, threshold=1e-8,
        )
        dR = np.asarray(geo.so3_log(jnp.asarray(R.T @ np.asarray(R_est))))
        assert np.linalg.norm(dR) < 0.02, dR


class Test3ptArun:
    def test_recovers_rigid_transform(self):
        pts, rng = make_scene(seed=3)
        R = np.asarray(geo.so3_exp(jnp.array([0.1, 0.2, -0.05])))
        t = np.array([0.5, -0.3, 0.2], np.float32)
        p_cur = relative_view(pts, R, t)
        noise = rng.normal(0, 0.005, p_cur.shape).astype(np.float32)
        p_cur_noisy = p_cur + noise
        # 30% outliers.
        n_out = len(pts) // 3
        out_idx = rng.choice(len(pts), n_out, replace=False)
        p_cur_noisy[out_idx] += rng.uniform(0.5, 2.0, (n_out, 3))
        R_est, t_est, inl, n_inl = ransac.ransac_3pt_arun(
            jnp.asarray(pts), jnp.asarray(p_cur_noisy),
            jnp.ones(len(pts), bool), KEY, threshold=0.05,
        )
        dR = np.asarray(geo.so3_log(jnp.asarray(R.T @ np.asarray(R_est))))
        assert np.linalg.norm(dR) < 0.01
        np.testing.assert_allclose(np.asarray(t_est), t, atol=0.02)
        assert int(n_inl) > 0.6 * (len(pts) - n_out)


class TestVoting1pt:
    def test_translation_voting(self):
        pts, rng = make_scene(n=150, seed=4)
        R = np.asarray(geo.so3_exp(jnp.array([0.02, 0.01, -0.03])))
        t = np.array([0.2, -0.1, 0.3], np.float32)
        p_cur = relative_view(pts, R, t).astype(np.float32)
        p_cur += rng.normal(0, 0.01, p_cur.shape).astype(np.float32)
        # Outliers.
        out_idx = rng.choice(len(pts), 40, replace=False)
        p_cur[out_idx] += rng.uniform(0.5, 1.5, (40, 3)).astype(np.float32)
        cov = np.tile(np.eye(3, dtype=np.float32) * 0.01**2 * 4, (len(pts), 1, 1))
        t_est, inl, n_inl = ransac.voting_1pt_stereo(
            jnp.asarray(pts), jnp.asarray(p_cur),
            jnp.asarray(cov), jnp.asarray(cov),
            jnp.ones(len(pts), bool), jnp.asarray(R),
            threshold=6.2514,
        )
        np.testing.assert_allclose(np.asarray(t_est), t, atol=0.02)
        inl = np.asarray(inl)
        assert not inl[out_idx].mean() > 0.2
        assert int(n_inl) > 80

    def test_covariance_jacobian_matches_autodiff(self):
        from kimera_vio_tpu.ops.ransac import stereo_point_cov_from_rect

        fx = fy = 450.0
        cx, cy = 376.0, 240.0
        b = 0.11
        uvd = jnp.array([400.0, 380.0, 250.0])

        def backproj(uvd):
            uL, uR, v = uvd
            d = uL - uR
            z = fx * b / d
            return jnp.stack([(uL - cx) * z / fx, (v - cy) * z / fy, z])

        J = jax.jacfwd(backproj)(uvd)
        expected = J @ J.T  # pixel_sigma = 1
        got = stereo_point_cov_from_rect(fx, fy, cx, cy, b, uvd)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-4)


class TestPnP:
    def test_recovers_camera_pose(self):
        pts, rng = make_scene(seed=5)  # treat as world points
        R_cw = np.asarray(geo.so3_exp(jnp.array([0.1, -0.2, 0.3])))
        t_cw = np.array([0.5, 0.2, 1.0], np.float32)
        p_cam = pts @ R_cw.T + t_cw
        f = bearings(p_cam)
        f, truth = plant_outliers(f, 0.2, rng)
        R_est, t_est, inl, n_inl = ransac.ransac_pnp(
            jnp.asarray(pts), jnp.asarray(f), jnp.ones(len(pts), bool), KEY,
            threshold=2.0, focal=450.0,
        )
        dR = np.asarray(geo.so3_log(jnp.asarray(R_cw.T @ np.asarray(R_est))))
        assert np.linalg.norm(dR) < 0.02, dR
        np.testing.assert_allclose(np.asarray(t_est), t_cw, atol=0.05)


def test_determinism():
    """Same key -> identical outputs (sequential-mode determinism)."""
    pts, rng = make_scene(seed=6)
    R = np.asarray(geo.so3_exp(jnp.array([0.02, -0.03, 0.01])))
    p_cur = relative_view(pts, R, np.array([0.3, 0.0, 0.0], np.float32))
    f_ref, f_cur = bearings(pts), bearings(p_cur)
    args = (jnp.asarray(f_ref), jnp.asarray(f_cur), jnp.ones(len(pts), bool))
    r1 = ransac.ransac_5pt_mono(*args, KEY)
    r2 = ransac.ransac_5pt_mono(*args, KEY)
    np.testing.assert_array_equal(np.asarray(r1[0]), np.asarray(r2[0]))
    np.testing.assert_array_equal(np.asarray(r1[2]), np.asarray(r2[2]))
