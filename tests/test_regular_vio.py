"""RegularVIO tests: point-plane factor math + joint window/plane GN on a
synthetic scene where most landmarks lie exactly on a known plane."""

import jax
import jax.numpy as jnp
import numpy as np

from kimera_vio_tpu.backend import regular_vio as rv
from kimera_vio_tpu.backend import smoother as sm
from kimera_vio_tpu.common.types import ImuBias, NavState

import tests.test_smoother as ts


def test_point_plane_residual_and_jacobians():
    planes = rv.PlaneStates(
        normal=jnp.array([[0.0, 0.0, 1.0]]),
        d=jnp.array([2.0]),
        mask=jnp.array([True]),
    )
    pts = jnp.array([[0.5, 0.3, 2.1], [1.0, -1.0, 2.0]])
    ok = jnp.ones(2, bool)
    assoc = jnp.array([0, 0], jnp.int32)
    sigma = jnp.float32(0.1)
    r, J_pt, J_plane, w = rv.point_plane_blocks(planes, pts, ok, assoc, sigma)
    np.testing.assert_allclose(np.asarray(r), [1.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(J_pt), [[0, 0, 10.0]] * 2, atol=1e-5)
    # Jacobian wrt plane tangent via finite differences of the residual.
    def res(dn):
        p2 = rv.retract_planes(planes, dn[None])
        n = p2.normal[0]
        return (jnp.dot(n, pts[0]) - p2.d[0]) / sigma

    eps = 1e-3
    for k in range(3):
        dn = jnp.zeros(3).at[k].set(eps)
        fd = (res(dn) - res(jnp.zeros(3))) / eps
        np.testing.assert_allclose(float(J_plane[0, k]), float(fd), atol=2e-2)


def test_unassociated_landmarks_masked():
    planes = rv.PlaneStates.empty(2)
    pts = jnp.ones((4, 3))
    r, J_pt, J_plane, w = rv.point_plane_blocks(
        planes, pts, jnp.ones(4, bool), jnp.array([-1, -1, 0, 1]), jnp.float32(0.1)
    )
    # Planes are unmasked (empty), so even associated landmarks get w=0.
    np.testing.assert_allclose(np.asarray(w), 0.0)


def test_regular_solve_matches_plain_on_plane_scene():
    """Landmarks on a z=6 wall: the regular solve with the true plane must
    converge at least as tightly as the plain smoother."""
    K, L, n_kf = 6, 128, 6
    cfg = sm.BackendConfig(nr_states=K, max_landmarks=L, gn_iters=2)
    win = sm.Window.empty(K)
    lmk = sm.LandmarkTable.empty(L, K)
    # Landmarks exactly on z = 6.
    rng = np.random.default_rng(0)
    n_lmk = 60
    lmk_w = np.stack(
        [rng.uniform(-3, 7, n_lmk), rng.uniform(-2.5, 2.5, n_lmk), np.full(n_lmk, 6.0)],
        -1,
    ).astype(np.float32)
    vel = np.array([1.0, 0, 0], np.float32)
    nav0 = NavState(rot=jnp.eye(3), pos=jnp.zeros(3), vel=jnp.asarray(vel))
    win = sm.bootstrap(cfg, win, nav0, jnp.zeros(6), jnp.float32(0.0))
    ids = np.arange(n_lmk, dtype=np.int32)
    pad = L - n_lmk
    meas_ids = jnp.asarray(np.concatenate([ids, np.full(pad, -1, np.int32)]))
    pim = ts.constant_velocity_pim(vel)
    planes = rv.PlaneStates(
        normal=jnp.array([[0.0, 0.0, 1.0]] * 2),
        d=jnp.array([6.0, 0.0]),
        mask=jnp.array([True, False]),
    )
    assoc = jnp.asarray(
        np.concatenate([np.zeros(n_lmk, np.int32), np.full(pad, -1, np.int32)])
    )
    for k in range(n_kf):
        t = k * 0.2
        uvd, vis = ts.project_stereo(cfg, np.eye(3), vel * t, lmk_w)
        uvd = uvd + rng.normal(0, 0.4, uvd.shape).astype(np.float32)
        mu = jnp.asarray(np.concatenate([uvd, np.zeros((pad, 3), np.float32)]))
        mm = jnp.asarray(np.concatenate([vis, np.zeros(pad, bool)]))
        if k == 0:
            lmk = sm.update_landmarks(lmk, meas_ids, mu, mm, jnp.int32(0))
            continue
        # Insert state like backend_step does, then run the regular solve.
        win, lmk, _ = sm.backend_step(
            cfg, win, lmk, pim=pim, stamp=jnp.float32(t),
            meas_ids=meas_ids, meas_uvd=mu, meas_mask=mm,
            status=jnp.int32(sm.STATUS_VALID),
        )
    win_r, planes_r, (pts, ok) = rv.regular_backend_solve(
        cfg, win, lmk, planes, assoc, jnp.float32(0.05), gn_iters=2
    )
    slot = int(win_r.n) - 1
    gt = vel * (n_kf - 1) * 0.2
    err = np.linalg.norm(np.asarray(win_r.pos[slot]) - gt)
    assert err < 0.05, err
    # Plane estimate stays near truth.
    np.testing.assert_allclose(np.asarray(planes_r.d[0]), 6.0, atol=0.1)
    np.testing.assert_allclose(
        np.abs(np.asarray(planes_r.normal[0])), [0, 0, 1], atol=0.05
    )
    # Landmarks snapped near the plane: mean |n.p - d| small.
    pts_np = np.asarray(pts)[np.asarray(ok)]
    if len(pts_np):
        assert np.abs(pts_np[:, 2] - 6.0).mean() < 0.1
