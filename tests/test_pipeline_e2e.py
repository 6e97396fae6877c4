"""Full-pipeline integration tests, in the spirit of the reference's
testStereoImuPipeline.cpp (VioPipelineFixture on MicroEurocDataset): a
synthetic sequence with exact ground truth gives a hard ATE bound; the real
MicroEuroc fixture gives a smoke test with bounded drift."""

import os

import numpy as np
import pytest

from kimera_vio_tpu.config.params import VioParams
from kimera_vio_tpu.dataprovider.euroc import EurocDataProvider
from kimera_vio_tpu.dataprovider.synthetic import (
    SyntheticStereoProvider,
    synthetic_params,
)
from kimera_vio_tpu.pipeline.stereo_pipeline import StereoImuPipeline
from kimera_vio_tpu.utils.logger import compute_ate

MICRO_EUROC = "/root/reference/tests/data/MicroEurocDataset"
EUROC_PARAMS = "/root/reference/params/Euroc"


@pytest.mark.slow
def test_synthetic_sequence_ate(tmp_path):
    """Known constant-velocity GT through the full stack: tight ATE."""
    params = synthetic_params(nr_states=8, max_features=256, max_landmarks=384)
    provider = SyntheticStereoProvider(n_frames=30, vx=0.5)
    pipe = StereoImuPipeline(params, output_path=str(tmp_path), parallel_run=False)
    out = pipe.run(provider)
    assert out.n_keyframes >= 4
    est = np.stack(out.positions)
    gt = provider.ground_truth
    ate = compute_ate(np.array(out.stamps_ns), est, gt.stamps_ns, gt.positions, align=False)
    assert ate["rmse"] < 0.05, ate
    # traj_vio.csv written with the reference header.
    with open(tmp_path / "traj_vio.csv") as f:
        header = f.readline().strip()
    assert header.startswith("#timestamp,x,y,z,qw,qx,qy,qz,vx,vy,vz,bg")
    assert len(open(tmp_path / "traj_vio.csv").readlines()) == out.n_keyframes + 1


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(MICRO_EUROC), reason="fixture missing")
def test_micro_euroc_smoke(tmp_path):
    """Real data smoke: pipeline runs, produces keyframes, trajectory stays
    physically bounded (the sequence covers ~1.5 s of slow motion)."""
    params = VioParams.from_folder(EUROC_PARAMS)
    params.max_features = 256
    params.max_landmarks = 384
    provider = EurocDataProvider(MICRO_EUROC, initial_k=10, final_k=40)
    pipe = StereoImuPipeline(params, output_path=str(tmp_path), parallel_run=False)
    out = pipe.run(provider)
    assert out.n_frames == 30
    assert 3 <= out.n_keyframes <= 12
    est = np.stack(out.positions)
    # Bounded drift: displacement under 0.5 m over 1.5 s of near-hover.
    assert np.linalg.norm(est - est[0], axis=-1).max() < 0.5
    vel = np.stack(out.velocities)
    assert np.linalg.norm(vel, axis=-1).max() < 2.0


@pytest.mark.slow
def test_parallel_mode_matches_sequential():
    """Async-dispatch parallel mode must produce identical estimates to
    sequential mode (the reference's determinism contract is sequential;
    ours holds for both since dispatch order is unchanged)."""
    params = synthetic_params(nr_states=6, max_features=256, max_landmarks=384)
    provider1 = SyntheticStereoProvider(n_frames=20, vx=0.5)
    provider2 = SyntheticStereoProvider(n_frames=20, vx=0.5)
    out_seq = StereoImuPipeline(params, parallel_run=False).run(provider1)
    out_par = StereoImuPipeline(params, parallel_run=True).run(provider2)
    assert out_seq.n_keyframes == out_par.n_keyframes
    np.testing.assert_allclose(
        np.stack(out_seq.positions), np.stack(out_par.positions), atol=1e-5
    )


@pytest.mark.slow
def test_mono_pipeline_synthetic():
    """Mono+IMU pipeline (NaN-uR measurements, mono RANSAC only) on the
    synthetic sequence — scale from the IMU, tight ATE."""
    from kimera_vio_tpu.pipeline.mono_pipeline import MonoImuPipeline

    params = synthetic_params(nr_states=8, max_features=256, max_landmarks=384)
    provider = SyntheticStereoProvider(n_frames=30, vx=0.5)
    pipe = MonoImuPipeline(params, parallel_run=False)
    out = pipe.run(provider)
    assert out.n_keyframes >= 4
    est = np.stack(out.positions)
    gt = provider.ground_truth
    ate = compute_ate(np.array(out.stamps_ns), est, gt.stamps_ns, gt.positions, align=False)
    assert ate["rmse"] < 0.05, ate


@pytest.mark.slow
def test_rgbd_pipeline_synthetic():
    """RGB-D pipeline: depth image -> virtual-stereo disparities; tight ATE
    on the synthetic constant-depth scene."""
    from kimera_vio_tpu.pipeline.rgbd_pipeline import RgbdImuPipeline

    params = synthetic_params(nr_states=8, max_features=256, max_landmarks=384)
    base = SyntheticStereoProvider(n_frames=30, vx=0.5)

    class RgbdProvider:
        ground_truth = base.ground_truth
        imu_sync = base.imu_sync

        def load_image(self, key):
            kind, k = key
            if kind == "right":  # depth image, meters
                return np.full((base.height, base.width), base.depth, np.float32)
            return base.load_image(key)

        def frames(self):
            return base.frames()

    pipe = RgbdImuPipeline(params, parallel_run=False)
    out = pipe.run(RgbdProvider())
    assert out.n_keyframes >= 4
    est = np.stack(out.positions)
    gt = base.ground_truth
    ate = compute_ate(np.array(out.stamps_ns), est, gt.stamps_ns, gt.positions, align=False)
    assert ate["rmse"] < 0.05, ate


@pytest.mark.slow
def test_6dof_synthetic_sequence_ate():
    """Full-pipeline accuracy gate on FULL 6-DoF motion: sinusoidal
    rotation + translation over a textured plane, rendered by exact
    ray-plane intersection with analytically consistent IMU. Exercises
    rotational flow prediction, LK under rotation, and gravity/bias
    observability — unlike the translation-only fixture. Threshold is the
    reference's north star ("ATE within 5% of reference" — C++ Kimera
    reports cm-scale on EuRoC; exact-GT synthetic must be mm-scale)."""
    from kimera_vio_tpu.dataprovider.synthetic import (
        SyntheticPlanar6DofProvider,
        synthetic_params,
    )
    from kimera_vio_tpu.utils.logger import compute_ate

    params = synthetic_params(nr_states=10, max_features=128, max_landmarks=192)
    prov = SyntheticPlanar6DofProvider(n_frames=60)
    pipe = StereoImuPipeline(params, parallel_run=False)
    out = pipe.run(prov)
    assert out.n_keyframes >= 8
    gt = prov.ground_truth
    est = np.stack(out.positions)
    ate = compute_ate(
        np.array(out.stamps_ns), est, gt.stamps_ns, gt.positions, align=False
    )
    assert ate["rmse"] < 0.02, ate


@pytest.mark.slow
def test_chunked_mode_matches_sequential():
    """run_chunked (lax.scan batches + super-batch staging + packed
    readback) reproduces run() keyframe-for-keyframe to float tolerance —
    the offline mode's determinism anchor."""
    from kimera_vio_tpu.dataprovider.synthetic import (
        SyntheticStereoProvider,
        synthetic_params,
    )

    params = synthetic_params(nr_states=8, max_features=96, max_landmarks=128)
    prov = SyntheticStereoProvider(n_frames=30, vx=0.5)
    out1 = StereoImuPipeline(params, parallel_run=False).run(prov)
    prov2 = SyntheticStereoProvider(n_frames=30, vx=0.5)
    out2 = StereoImuPipeline(params, parallel_run=False).run_chunked(
        prov2, chunk_size=8
    )
    assert out1.n_frames == out2.n_frames
    assert out1.n_keyframes == out2.n_keyframes
    p1 = np.stack(out1.positions)
    p2 = np.stack(out2.positions)
    # Sub-mm agreement: scan-sliced inputs fuse differently in XLA, so
    # exact bitwise equality is not expected at f32.
    np.testing.assert_allclose(p1, p2, atol=1e-3)
