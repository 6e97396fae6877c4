"""Analytic-vs-autodiff Jacobian cross-checks for hand-written factor blocks.

The reference validates its custom factors against numeric Jacobians
(/root/reference/tests/testPointPlaneFactor.cpp,
testParallelPlaneRegularBasicFactor.cpp); this is the same gate for the
TPU smoother's hand-linearized blocks: `_no_motion_blocks`,
`_between_blocks` (shared by external-odometry and between-stereo
factors), `_const_vel_blocks`, and the smart-factor Schur system
(`_smart_factor_blocks`). The retraction matches `retract_states`
(R <- R Exp(dth), p <- p + dp in the world frame, additive v / bias).

Outcome of this check (round-4 verdict item 6): the "approximate"
Jacobians of the no-motion / between factors are in fact EXACT under the
world-frame additive position retraction — the tests below assert them
to f32 roundoff against jax.jacfwd.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kimera_vio_tpu.backend.smoother as sm
from kimera_vio_tpu.common import geometry as geo

_TH, _P, _V = sm._TH, sm._P, sm._V


def _random_window(K=5, seed=0):
    rng = np.random.default_rng(seed)
    win = sm.Window.empty(K)
    rots = jnp.stack(
        [
            geo.so3_exp(jnp.asarray(rng.uniform(-0.5, 0.5, 3), jnp.float32))
            for _ in range(K)
        ]
    )
    ext_rots = jnp.stack(
        [
            geo.so3_exp(jnp.asarray(rng.uniform(-0.4, 0.4, 3), jnp.float32))
            for _ in range(K)
        ]
    )
    return win.replace(
        rot=rots,
        pos=jnp.asarray(rng.uniform(-1, 1, (K, 3)), jnp.float32),
        vel=jnp.asarray(rng.uniform(-0.5, 0.5, (K, 3)), jnp.float32),
        bias=jnp.asarray(rng.uniform(-0.1, 0.1, (K, 6)), jnp.float32),
        stamp=jnp.arange(K, dtype=jnp.float32) * 0.2,
        mask=jnp.ones(K, bool),
        n=jnp.int32(K),
        status=jnp.full(K, sm.STATUS_LOW_DISPARITY, jnp.int32),
        ext_R=ext_rots,
        ext_t=jnp.asarray(rng.uniform(-0.3, 0.3, (K, 3)), jnp.float32),
        ext_valid=jnp.ones(K, bool),
    )


def _check_pair_block(Ji, Jj, r, resid, k, rtol=2e-4, atol=2e-4):
    """Compare stacked pair-factor rows (slot k-1) against jacfwd of the
    residual in the two states' tangents at zero."""
    z = jnp.zeros(sm.S_DOF, jnp.float32)
    r_ad = resid(z, z)
    Ji_ad = jax.jacfwd(lambda d: resid(d, z))(z)
    Jj_ad = jax.jacfwd(lambda d: resid(z, d))(z)
    scale = max(1.0, float(np.abs(Ji_ad).max()), float(np.abs(Jj_ad).max()))
    idx = k - 1  # blocks are stacked over ks = 1..K-1
    np.testing.assert_allclose(
        np.asarray(r[idx]), np.asarray(r_ad), rtol=rtol, atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(Ji[idx]), np.asarray(Ji_ad), rtol=rtol, atol=atol * scale
    )
    np.testing.assert_allclose(
        np.asarray(Jj[idx]), np.asarray(Jj_ad), rtol=rtol, atol=atol * scale
    )


@pytest.mark.lane2
def test_no_motion_jacobians_match_autodiff():
    K = 5
    win = _random_window(K, seed=1)
    cfg = sm.BackendConfig(nr_states=K, max_landmarks=8)
    Ji, Jj, r = sm._no_motion_blocks(cfg, win)

    for k in (1, 3):
        def resid(di, dj, k=k):
            Ri = win.rot[k - 1] @ geo.so3_exp(di[_TH])
            pi = win.pos[k - 1] + di[_P]
            Rj = win.rot[k] @ geo.so3_exp(dj[_TH])
            pj = win.pos[k] + dj[_P]
            vj = win.vel[k] + dj[_V]
            r_rot = geo.so3_log(Ri.T @ Rj) / cfg.no_motion_rot_sigma
            r_pos = (pj - pi) / cfg.no_motion_pos_sigma
            r_vel = vj / cfg.zero_velocity_sigma
            return jnp.concatenate([r_rot, r_pos, r_vel])

        _check_pair_block(Ji, Jj, r, resid, k)


def test_between_jacobians_match_autodiff():
    """External-odometry flavor of _between_blocks (same code path serves
    the stereo-RANSAC between factors, VioBackend.cpp:324-336/402-420)."""
    K = 5
    win = _random_window(K, seed=2)
    cfg = sm.BackendConfig(nr_states=K, max_landmarks=8)
    Ji, Jj, r = sm._ext_odom_blocks(cfg, win)

    for k in (1, 2, 4):
        def resid(di, dj, k=k):
            Ri = win.rot[k - 1] @ geo.so3_exp(di[_TH])
            pi = win.pos[k - 1] + di[_P]
            Rj = win.rot[k] @ geo.so3_exp(dj[_TH])
            pj = win.pos[k] + dj[_P]
            dR = Ri.T @ Rj
            r_rot = geo.so3_log(win.ext_R[k].T @ dR) / cfg.ext_odom_rot_sigma
            r_pos = (Ri.T @ (pj - pi) - win.ext_t[k]) / cfg.ext_odom_pos_sigma
            return jnp.concatenate([r_rot, r_pos])

        _check_pair_block(Ji, Jj, r, resid, k)


def test_const_vel_jacobians_match_autodiff():
    K = 4
    win = _random_window(K, seed=3)
    cfg = sm.BackendConfig(
        nr_states=K, max_landmarks=8,
        constant_vel_sigma=jnp.float32(0.1),
    )
    Ji, Jj, r = sm._const_vel_blocks(cfg, win)

    def resid(di, dj, k=2):
        vi = win.vel[k - 1] + di[_V]
        vj = win.vel[k] + dj[_V]
        return (vj - vi) / cfg.constant_vel_sigma

    # _const_vel_blocks folds the 1/sigma weight into the `active` scale
    # applied outside one(); rows are already weighted on return.
    _check_pair_block(Ji, Jj, r, resid, 2)


@pytest.mark.lane2
def test_smart_factor_schur_matches_autodiff():
    """Full check of the smart-factor Gauss-Newton system: build F/E per
    landmark by jacfwd of the whitened reprojection residual, Schur-
    eliminate numerically (same 1e-6 damping on Hll), and compare
    H_pose/g_pose from _smart_factor_blocks."""
    K, L = 4, 6
    rng = np.random.default_rng(4)
    cfg = sm.BackendConfig(
        nr_states=K, max_landmarks=L,
        # L2 norms isolate the Jacobian algebra from IRLS weighting.
        mono_norm_type=jnp.int32(0), stereo_norm_type=jnp.int32(0),
    )

    # Cameras near origin looking +z with mild perturbations; points in
    # front at 4-8 m. R_b_cam = I, t_b_cam = 0 (cfg defaults).
    win = sm.Window.empty(K)
    rots = jnp.stack(
        [
            geo.so3_exp(jnp.asarray(rng.uniform(-0.05, 0.05, 3), jnp.float32))
            for _ in range(K)
        ]
    )
    pos = jnp.asarray(rng.uniform(-0.3, 0.3, (K, 3)), jnp.float32)
    win = win.replace(
        rot=rots, pos=pos, mask=jnp.ones(K, bool), n=jnp.int32(K),
        stamp=jnp.arange(K, dtype=jnp.float32) * 0.2,
    )
    pts = jnp.asarray(
        np.stack(
            [
                rng.uniform(-1.5, 1.5, L),
                rng.uniform(-1.0, 1.0, L),
                rng.uniform(4.0, 8.0, L),
            ],
            -1,
        ),
        jnp.float32,
    )

    def project(pt, R, p):
        pc = (R @ cfg.R_b_cam).T @ (pt - (p + R @ cfg.t_b_cam))
        return jnp.stack(
            [
                cfg.fx * pc[0] / pc[2] + cfg.cx,
                cfg.fx * (pc[0] - cfg.baseline) / pc[2] + cfg.cx,
                cfg.fy * pc[1] / pc[2] + cfg.cy,
            ]
        )

    # Observations = projections + 0.5 px noise (residuals are nonzero, so
    # the g_pose comparison is meaningful).
    obs = jax.vmap(
        lambda pt: jax.vmap(lambda R, p: project(pt, R, p))(win.rot, win.pos)
    )(pts)
    obs = obs + jnp.asarray(rng.normal(0, 0.5, obs.shape), jnp.float32)

    lmk = sm.LandmarkTable.empty(L, K)
    lmk = lmk.replace(
        ids=jnp.arange(L, dtype=jnp.int32),
        obs_uvd=obs,
        obs_mask=jnp.ones((L, K), bool),
    )
    ok = jnp.ones(L, bool)
    H_pose, g_pose, pts_out, ok_out = sm._smart_factor_blocks(
        cfg, win, lmk, pts_fixed=(pts, ok)
    )
    assert bool(ok_out.all())

    # ---- autodiff reference -------------------------------------------
    def resid_l(l, dpose, dpt):
        """Whitened residual stack over k for landmark l; dpose: (K,6)."""
        def per_k(k):
            R = win.rot[k] @ geo.so3_exp(dpose[k, 0:3])
            p = win.pos[k] + dpose[k, 3:6]
            return (project(pts[l] + dpt, R, p) - obs[l, k]) / cfg.smart_noise_sigma

        return jnp.stack([per_k(k) for k in range(K)]).reshape(-1)

    H_ad = np.zeros((K * 6, K * 6), np.float64)
    g_ad = np.zeros(K * 6, np.float64)
    z_pose = jnp.zeros((K, 6), jnp.float32)
    z_pt = jnp.zeros(3, jnp.float32)
    for l in range(L):
        r_l = np.asarray(resid_l(l, z_pose, z_pt), np.float64)
        F_l = np.asarray(
            jax.jacfwd(lambda d: resid_l(l, d, z_pt))(z_pose), np.float64
        ).reshape(K * 3, K * 6)
        E_l = np.asarray(
            jax.jacfwd(lambda d: resid_l(l, z_pose, d))(z_pt), np.float64
        ).reshape(K * 3, 3)
        Hll = E_l.T @ E_l + 1e-6 * np.eye(3)
        T_l = F_l.T @ E_l @ np.linalg.inv(Hll)
        H_ad += F_l.T @ F_l - T_l @ E_l.T @ F_l
        g_ad += F_l.T @ r_l - T_l @ (E_l.T @ r_l)

    H_an = np.asarray(H_pose, np.float64).reshape(K * 6, K * 6)
    g_an = np.asarray(g_pose, np.float64).reshape(K * 6)
    scale_H = max(1.0, np.abs(H_ad).max())
    scale_g = max(1.0, np.abs(g_ad).max())
    np.testing.assert_allclose(H_an, H_ad, rtol=2e-3, atol=2e-3 * scale_H)
    np.testing.assert_allclose(g_an, g_ad, rtol=2e-3, atol=2e-3 * scale_g)
