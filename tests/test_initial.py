"""Initialization subsystem tests: gyro-bias estimation, gravity/velocity
linear alignment (synthetic trajectories with known answers), and the
cross-correlation time aligner recovering a planted offset."""

import jax.numpy as jnp
import numpy as np

from kimera_vio_tpu.common import geometry as geo
from kimera_vio_tpu.common.types import ImuBias, ImuBlock
from kimera_vio_tpu.config.params import ImuParams
from kimera_vio_tpu.frontend import imu_frontend as imu
from kimera_vio_tpu.initial.gravity_alignment import (
    align_velocities_and_gravity,
    estimate_gyro_bias,
)
from kimera_vio_tpu.initial.time_alignment import CrossCorrTimeAligner

PIM_PARAMS = imu.PimParams.from_params(ImuParams())
G = np.array([0.0, 0.0, -9.81], np.float32)


def simulate(n_frames=8, dt_kf=0.2, rate=200.0, gyro_bias=np.zeros(3), seed=0):
    """Rotating + accelerating trajectory; returns visual poses and PIMs
    (integrated WITH the planted bias, i.e. what a biased IMU would give)."""
    rng = np.random.default_rng(seed)
    w_body = np.array([0.25, -0.18, 0.3])
    a_world = np.array([0.4, 0.2, -0.1])
    n_per = int(dt_kf * rate)
    dt = 1.0 / rate
    R = np.eye(3)
    p = np.zeros(3)
    v = np.zeros(3)
    R_vis, p_vis, v_gt = [R.copy()], [p.copy()], [v.copy()]
    pims = []
    for f in range(n_frames - 1):
        acc_blocks, gyr_blocks = [], []
        for _ in range(n_per):
            acc_body = R.T @ (a_world - G)
            acc_blocks.append(acc_body + 0)  # measured (bias added below)
            gyr_blocks.append(w_body + gyro_bias)
            # integrate true state
            p = p + v * dt + 0.5 * a_world * dt * dt
            v = v + a_world * dt
            R = R @ np.asarray(geo.so3_exp(jnp.asarray(w_body * dt, jnp.float32)))
        block = ImuBlock(
            acc=jnp.asarray(np.stack(acc_blocks), jnp.float32),
            gyr=jnp.asarray(np.stack(gyr_blocks), jnp.float32),
            dt=jnp.full((n_per,), dt, jnp.float32),
            mask=jnp.ones((n_per,), bool),
        )
        pims.append(imu.preintegrate(PIM_PARAMS, block, ImuBias.zero()))
        R_vis.append(R.copy())
        p_vis.append(p.copy())
        v_gt.append(v.copy())
    return (
        np.stack(R_vis).astype(np.float32),
        np.stack(p_vis).astype(np.float32),
        np.stack(v_gt).astype(np.float32),
        pims,
    )


def test_gyro_bias_estimation():
    bias = np.array([0.02, -0.015, 0.01])
    R_vis, p_vis, v_gt, pims = simulate(gyro_bias=bias)
    dR = jnp.stack([p.delta_R for p in pims])
    dRdbg = jnp.stack([p.dR_dbg for p in pims])
    est = estimate_gyro_bias(
        jnp.asarray(R_vis), dR, dRdbg, jnp.ones(len(pims), bool)
    )
    np.testing.assert_allclose(np.asarray(est), bias, atol=2e-3)


def test_gravity_and_velocity_alignment():
    R_vis, p_vis, v_gt, pims = simulate()
    dv = jnp.stack([p.delta_v for p in pims])
    dp = jnp.stack([p.delta_p for p in pims])
    dts = jnp.stack([p.delta_t for p in pims])
    vels, gravity = align_velocities_and_gravity(
        jnp.asarray(R_vis), jnp.asarray(p_vis), dts, dv, dp,
        jnp.ones(len(pims), bool),
    )
    # The PIM "gravity" here is the world gravity (acc measured a - g).
    np.testing.assert_allclose(np.asarray(gravity), G, atol=0.05)
    np.testing.assert_allclose(np.asarray(vels), v_gt, atol=0.05)


def test_time_aligner_recovers_offset():
    rng = np.random.default_rng(0)
    rate = 200.0
    n = 2000
    t = np.arange(n) / rate
    # Excited rotation-rate signal.
    w = 0.5 * np.sin(2 * np.pi * 0.7 * t) + 0.3 * np.sin(2 * np.pi * 1.3 * t + 1)
    offset_samples = 14  # IMU leads camera by 70 ms
    aligner = CrossCorrTimeAligner(window_size_s=10.0, imu_rate_hz=rate,
                                   variance_threshold_scaling=0.0)
    for k in range(n):
        aligner.add_imu(int(t[k] * 1e9), np.array([w[k], 0, 0]), 1.0 / rate)
        kv = k - offset_samples
        if kv >= 0:
            aligner.add_frame_rotation(int(t[k] * 1e9), abs(w[kv]) / rate, 1)
    est = aligner.attempt_estimation()
    assert est is not None
    assert abs(est - offset_samples / rate) < 2.5 / rate, est


def test_online_initializer_corrects_attitude():
    """OnlineInitializer (initial/initializer.py): relative poses are
    frame-invariant, so a crude-attitude bootstrap error shows up as a
    wrongly-oriented gravity estimate; the solved correction must restore
    the body-frame gravity direction (roll/pitch — yaw stays unobservable,
    as in the reference InitializationBackend)."""
    from kimera_vio_tpu.initial.initializer import OnlineInitializer

    R_vis, p_vis, v_gt, pims = simulate(n_frames=8)
    # Crude world: bootstrap attitude off by 15 deg about x.
    R_err = np.asarray(
        geo.so3_exp(jnp.asarray(np.array([0.26, 0.0, 0.0], np.float32)))
    )
    init = OnlineInitializer(G, R_err @ R_vis[0], n_kf=8)
    ready = False
    stamps = [0.2 * k for k in range(8)]
    for k in range(8):
        if k == 0:
            fo = {}
        else:
            Rr = R_vis[k - 1].T @ R_vis[k]
            tr = R_vis[k - 1].T @ (p_vis[k] - p_vis[k - 1])
            p = pims[k - 1]
            fo = dict(
                init_R_rel_body=Rr,
                init_t_rel_body=tr,
                init_pim_delta_R=np.asarray(p.delta_R),
                init_pim_delta_v=np.asarray(p.delta_v),
                init_pim_delta_p=np.asarray(p.delta_p),
                init_pim_dR_dbg=np.asarray(p.dR_dbg),
            )
        ready = init.add_keyframe(fo, stamps[k])
    assert ready
    sol = init.solve()
    # Body-frame gravity direction of the corrected attitude matches truth.
    g_dir = G / np.linalg.norm(G)
    body_g_est = sol["R0"].T @ g_dir
    body_g_true = R_vis[-1].T @ g_dir
    np.testing.assert_allclose(body_g_est, body_g_true, atol=0.03)
    # Velocity recovered in the corrected world frame.
    np.testing.assert_allclose(sol["vel"], v_gt[-1], atol=0.1)
    np.testing.assert_allclose(sol["gyro_bias"], 0.0, atol=0.02)


def test_online_initializer_recovers_gyro_bias():
    from kimera_vio_tpu.initial.initializer import OnlineInitializer

    bg = np.array([0.02, -0.015, 0.01])
    R_vis, p_vis, v_gt, pims = simulate(n_frames=8, gyro_bias=bg)
    init = OnlineInitializer(G, R_vis[0], n_kf=8)
    for k in range(8):
        if k == 0:
            fo = {}
        else:
            Rr = R_vis[k - 1].T @ R_vis[k]
            tr = R_vis[k - 1].T @ (p_vis[k] - p_vis[k - 1])
            p = pims[k - 1]
            fo = dict(
                init_R_rel_body=Rr,
                init_t_rel_body=tr,
                init_pim_delta_R=np.asarray(p.delta_R),
                init_pim_delta_v=np.asarray(p.delta_v),
                init_pim_delta_p=np.asarray(p.delta_p),
                init_pim_dR_dbg=np.asarray(p.dR_dbg),
            )
        ready = init.add_keyframe(fo, 0.2 * k)
    assert ready
    sol = init.solve()
    np.testing.assert_allclose(sol["gyro_bias"], bg, atol=0.005)


def test_online_initializer_gyro_residual_gate():
    """The gyroscope_residuals gflag (OnlineGravityAlignment.cpp) rejects
    an init window whose bias-corrected preintegrated rotations still
    disagree with vision (broken tracking): solve() reports ok=False; a
    consistent window reports ok=True."""
    from kimera_vio_tpu.config import flags
    from kimera_vio_tpu.initial.initializer import OnlineInitializer

    R_vis, p_vis, v_gt, pims = simulate(n_frames=8)

    def run(corrupt):
        init = OnlineInitializer(G, R_vis[0], n_kf=8)
        rng = np.random.default_rng(0)
        for k in range(8):
            if k == 0:
                fo = {}
            else:
                Rr = R_vis[k - 1].T @ R_vis[k]
                if corrupt:
                    # Vision disagrees with the IMU by ~0.2 rad per
                    # interval — no constant bias explains it.
                    ax = rng.standard_normal(3)
                    ax *= 0.2 / np.linalg.norm(ax)
                    K = np.array(
                        [[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                         [-ax[1], ax[0], 0]]
                    )
                    Rr = Rr @ (
                        np.eye(3) + np.sin(1.0) * K + (1 - np.cos(1.0)) * K @ K
                    )
                tr = R_vis[k - 1].T @ (p_vis[k] - p_vis[k - 1])
                p = pims[k - 1]
                fo = dict(
                    init_R_rel_body=Rr,
                    init_t_rel_body=tr,
                    init_pim_delta_R=np.asarray(p.delta_R),
                    init_pim_delta_v=np.asarray(p.delta_v),
                    init_pim_delta_p=np.asarray(p.delta_p),
                    init_pim_dR_dbg=np.asarray(p.dR_dbg),
                )
            init.add_keyframe(fo, 0.2 * k)
        return init.solve()

    assert run(corrupt=False)["ok"]
    bad = run(corrupt=True)
    assert not bad["ok"]
    assert bad["gyro_residual"] > flags.get_flag("gyroscope_residuals")


def test_online_initializer_window_size_flag():
    from kimera_vio_tpu.config import flags
    from kimera_vio_tpu.initial.initializer import OnlineInitializer

    try:
        flags.set_flag("num_frames_vio_init", 5)
        init = OnlineInitializer(G, np.eye(3))
        assert init.n_kf == 5
    finally:
        flags.set_flag("num_frames_vio_init", None)
