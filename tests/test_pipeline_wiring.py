"""Wiring tests: dormant-module integrations exercised through the full
pipeline with an asserted EFFECT (VERDICT round-1 item 4) — PnP tracking,
pose-guess sources, between-stereo factors, flags gating, logging suite."""

import os
import tempfile

import numpy as np
import pytest

from kimera_vio_tpu.dataprovider.synthetic import (
    SyntheticStereoProvider,
    synthetic_params,
)
from kimera_vio_tpu.pipeline.stereo_pipeline import StereoImuPipeline

N_FRAMES = 30


def _run(params, **kw):
    prov = SyntheticStereoProvider(n_frames=N_FRAMES, vx=0.5)
    pipe = StereoImuPipeline(params, parallel_run=False, **kw)
    out = pipe.run(prov)
    gt = prov.ground_truth
    est = np.stack(out.positions)
    gt_interp = np.stack(
        [
            np.interp(
                np.array(out.stamps_ns, np.float64),
                gt.stamps_ns.astype(np.float64),
                gt.positions[:, i],
            )
            for i in range(3)
        ],
        -1,
    )
    rmse = float(np.sqrt(((est - gt_interp) ** 2).sum(-1).mean()))
    return out, rmse, pipe


def _params(**over):
    p = synthetic_params(nr_states=10, max_features=96, max_landmarks=128)
    for k, v in over.items():
        setattr(p.backend, k, v) if hasattr(p.backend, k) else setattr(
            p.frontend, k, v
        )
    return p


@pytest.mark.slow
def test_pnp_tracking_wired():
    """use_pnp_tracking + pose_guess_source=PNP runs PnP against the
    backend landmark map in-graph and still converges (the effect: the
    solved trajectory stays near GT with the PnP-sourced initial guess,
    reference Tracker.cpp:1163-1270 / VioBackend.cpp:797-891)."""
    p = _params()
    p.frontend.use_pnp_tracking = True
    p.frontend.min_pnp_inliers = 10
    p.backend.pose_guess_source = 3
    out, rmse, _ = _run(p)
    assert out.n_keyframes >= 3
    assert rmse < 0.06, rmse


@pytest.mark.slow
def test_stereo_pose_guess_source():
    """pose_guess_source=STEREO composes the 1-pt voting relative pose
    onto the previous state for the insert guess (VioBackend.cpp:843-862)
    without degrading accuracy."""
    p = _params()
    p.backend.pose_guess_source = 2
    out, rmse, _ = _run(p)
    assert rmse < 0.06, rmse


@pytest.mark.slow
def test_between_stereo_factors_in_pipeline():
    """addBetweenStereoFactors=1 threads the voting pose into between
    factors; clean synthetic data -> accuracy preserved and keyframes
    carry the factor (reference VioBackend.cpp:324-336)."""
    p = _params()
    p.backend.add_between_stereo_factors = True
    p.backend.between_translation_precision = 100.0
    out, rmse, _ = _run(p)
    assert rmse < 0.06, rmse


@pytest.mark.slow
def test_flags_gate_logging(tmp_path):
    """--log_output/--output_path flags turn on the CSV suite without
    constructor args (reference gflags tier)."""
    from kimera_vio_tpu.config import flags

    flags.set_flag("log_output", True)
    flags.set_flag("output_path", str(tmp_path))
    try:
        p = _params()
        out, rmse, pipe = _run(p)
    finally:
        flags.set_flag("log_output", False)
    files = set(os.listdir(tmp_path))
    assert "traj_vio.csv" in files
    assert "output_frontend_stats.csv" in files
    assert "output_timingOverall.csv" in files
    # frontend stats: one row per processed frame (minus bootstrap)
    n_rows = sum(1 for _ in open(tmp_path / "output_frontend_stats.csv")) - 1
    assert n_rows == out.n_frames - 1


@pytest.mark.slow
def test_auto_initialize_online():
    """autoInitialize=2 runs the online visual-inertial alignment: the
    pipeline bootstraps crude, collects an init window, re-bootstraps with
    the aligned state, and keeps tracking (InitializationBackend path)."""
    from kimera_vio_tpu.config import flags

    p = _params()
    p.backend.auto_initialize = 2
    prov = SyntheticStereoProvider(n_frames=N_FRAMES, vx=0.5)
    # 5-keyframe init window (num_frames_vio_init gflag) so the window
    # completes well inside the 30-frame fixture.
    flags.set_flag("num_frames_vio_init", 5)
    try:
        pipe = StereoImuPipeline(p, parallel_run=False)
        out = pipe.run(prov)
    finally:
        flags.set_flag("num_frames_vio_init", None)
    # The reference publishes no backend states until initialization
    # succeeds; the trajectory restarts at the aligned state, so fewer
    # frames than fed are published.
    assert 1 < out.n_frames < N_FRAMES
    est = np.stack(out.positions)
    assert np.isfinite(est).all()
    assert np.abs(est[-1]).max() < 3.0
    # The alignment must actually recover the 0.5 m/s velocity — a
    # frozen-at-rest trajectory (round-5 bug: vision gated out under the
    # crude bootstrap, IMU chain pinned at the zero-velocity guess) fails
    # this.
    vel = np.stack(out.velocities)
    np.testing.assert_allclose(vel[-1], [0.5, 0.0, 0.0], atol=0.1)
    # Post-init keyframes actually move with the GT motion.
    assert est[-1][0] - est[0][0] > 0.05


@pytest.mark.slow
def test_time_alignment_phase_smoke():
    """--do_fine_imu_camera_temporal_sync engages the alignment phase
    (3-pt Arun rotation export + aligner feed). On a rotation-free
    sequence the variance gate correctly withholds an estimate and the
    pipeline completes nominally (reference stays in the TimeAlignment
    state until excitation)."""
    from kimera_vio_tpu.config import flags

    flags.set_flag("do_fine_imu_camera_temporal_sync", True)
    try:
        p = _params()
        prov = SyntheticStereoProvider(n_frames=N_FRAMES, vx=0.5)
        pipe = StereoImuPipeline(p, parallel_run=False)
        assert not pipe.frontend_cfg.use_1point_stereo  # forced 3-pt
        out = pipe.run(prov)
    finally:
        flags.set_flag("do_fine_imu_camera_temporal_sync", False)
    assert out.n_frames == N_FRAMES
    assert pipe.time_shift_estimate_s is None  # no excitation -> gated


@pytest.mark.slow
def test_external_odometry_end_to_end():
    """A provider-attached OdometryBuffer threads keyframe-relative
    between factors into the backend in-graph (reference
    ThreadsafeOdometryBuffer -> VioBackend.cpp:402-420). Effect: with
    perfect odometry the trajectory stays accurate, and the window's
    ext factors activate."""
    from kimera_vio_tpu.dataprovider.odometry import OdometryBuffer
    from kimera_vio_tpu.common import geometry as geo
    import jax.numpy as jnp

    p = _params()
    prov = SyntheticStereoProvider(n_frames=N_FRAMES, vx=0.5)
    buf = OdometryBuffer()
    gt = prov.ground_truth
    for i in range(len(gt.stamps_ns)):
        R = np.asarray(
            geo.quat_to_rot(jnp.asarray(gt.quats_wxyz[i], jnp.float32))
        )
        buf.add(int(gt.stamps_ns[i]), R, gt.positions[i])
    prov.odometry = buf
    pipe = StereoImuPipeline(p, parallel_run=False)
    out = pipe.run(prov)
    est = np.stack(out.positions)
    gt_interp = np.stack(
        [
            np.interp(
                np.array(out.stamps_ns, np.float64),
                gt.stamps_ns.astype(np.float64),
                gt.positions[:, i],
            )
            for i in range(3)
        ],
        -1,
    )
    rmse = float(np.sqrt(((est - gt_interp) ** 2).sum(-1).mean()))
    assert rmse < 0.06, rmse


@pytest.mark.slow
def test_regular_vio_selected_and_refines():
    """backend_type=1 + mesher: pipeline selects RegularVIO; a synthetic
    horizontal-plane mesh drives the regularity-constrained joint solve
    through _regular_refine (reference RegularVioBackend selection,
    Pipeline-definitions backend_type)."""
    import jax.numpy as jnp
    from kimera_vio_tpu.backend import smoother as sm
    from kimera_vio_tpu.mesher.mesher import Mesh3D

    p = _params()
    p.pipeline.backend_type = 1
    pipe = StereoImuPipeline(p, parallel_run=False, enable_mesher=True)
    assert pipe.use_regular_vio
    # Window with two states; landmarks on a z=1.0 horizontal plane with
    # noise; mesh triangles over them assigned to that plane.
    K = pipe.backend_cfg.nr_states
    L = pipe.backend_cfg.max_landmarks
    win = sm.Window.empty(K)
    from kimera_vio_tpu.common.types import NavState

    win = sm.bootstrap(
        pipe.backend_cfg, win,
        NavState(rot=jnp.eye(3), pos=jnp.zeros(3), vel=jnp.zeros(3)),
        jnp.zeros(6), jnp.float32(0.0),
    )
    lmk = sm.LandmarkTable.empty(L, K)
    rng = np.random.default_rng(0)
    n = 60
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
         np.full(n, 1.0) + rng.normal(0, 0.002, n)], -1
    ).astype(np.float32)
    ids = np.arange(n, dtype=np.int32)
    tris_idx = np.stack([ids[:-2], ids[1:-1], ids[2:]], -1)
    mesh = Mesh3D(lmk_ids=tris_idx, vertices=pts[tris_idx])
    lmk = lmk.replace(
        ids=lmk.ids.at[:n].set(jnp.asarray(ids)),
        pts=lmk.pts.at[:n].set(jnp.asarray(pts)),
        pts_ok=lmk.pts_ok.at[:n].set(True),
    )
    fo = {}
    win2 = pipe._regular_refine(win, lmk, mesh, fo)
    # The refine ran (no-op windows would return the same object).
    assert win2 is not win
    assert np.isfinite(np.asarray(win2.pos)).all()
