import math
import os

import numpy as np
import pytest

from kimera_vio_tpu.config.params import (
    BackendParams,
    CameraParams,
    FrontendParams,
    ImuParams,
    PipelineParams,
    VioParams,
)

EUROC_PARAMS = "/root/reference/params/Euroc"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EUROC_PARAMS), reason="reference params not mounted"
)


def test_pipeline_params():
    p = PipelineParams.from_yaml(os.path.join(EUROC_PARAMS, "PipelineParams.yaml"))
    assert p.frontend_type == 1
    assert p.backend_type == 1
    assert p.parallel_run is True


def test_imu_params():
    p = ImuParams.from_yaml(os.path.join(EUROC_PARAMS, "ImuParams.yaml"))
    assert p.rate_hz == 200.0
    assert math.isclose(p.gyro_noise_density, 1.6968e-4)
    assert math.isclose(p.acc_random_walk, 3.0e-2)
    np.testing.assert_allclose(p.n_gravity, [0, 0, -9.81])
    np.testing.assert_allclose(p.T_BS, np.eye(4))
    assert p.preintegration_type == 1


def test_camera_params():
    p = CameraParams.from_yaml(os.path.join(EUROC_PARAMS, "LeftCameraParams.yaml"))
    assert (p.width, p.height) == (752, 480)
    np.testing.assert_allclose(
        p.intrinsics, [458.654, 457.296, 367.215, 248.375]
    )
    assert p.distortion_model == "radial-tangential"
    assert p.T_BS.shape == (4, 4)
    # EuRoC cam0 extrinsics translation
    np.testing.assert_allclose(
        p.T_BS[:3, 3], [-0.0216401454975, -0.064676986768, 0.00981073058949]
    )


def test_frontend_params():
    p = FrontendParams.from_yaml(os.path.join(EUROC_PARAMS, "FrontendParams.yaml"))
    assert p.klt_win_size == 24
    assert p.max_features_per_frame == 300
    assert p.feature_detector_type == 3
    assert p.templ_cols == 101
    assert p.min_intra_keyframe_time_s == 0.2
    assert p.ransac_use_1point_stereo
    assert p.optical_flow_predictor_type == 1


def test_backend_params():
    p = BackendParams.from_yaml(os.path.join(EUROC_PARAMS, "BackendParams.yaml"))
    assert p.nr_states == 25
    assert not p.auto_initialize
    assert p.mono_norm_type == 2
    assert math.isclose(p.mono_norm_param, 4.6851)
    assert math.isclose(p.landmark_distance_threshold, 10.0)


def test_vio_params_aggregate_and_equals():
    v1 = VioParams.from_folder(EUROC_PARAMS)
    v2 = VioParams.from_folder(EUROC_PARAMS)
    assert v1.right_cam is not None
    assert v1.equals(v2)
    v2.backend.nr_states = 10
    assert not v1.equals(v2)


def test_other_param_trees_parse():
    for tree in ["EurocMono", "D455", "KinectAzure", "RealSenseIR", "uHumans1", "uHumans2"]:
        folder = os.path.join("/root/reference/params", tree)
        if os.path.isdir(folder):
            v = VioParams.from_folder(folder)
            assert v.left_cam.width > 0


def test_all_reference_param_trees_load():
    """Every shipped reference params tree parses end to end, including
    DisplayParams and ExternalOdometryParams (Pipeline-definitions.cpp
    aggregate)."""
    import os

    from kimera_vio_tpu.frontend.camera import PinholeCamera

    base = "/root/reference/params"
    if not os.path.isdir(base):
        import pytest

        pytest.skip("reference params not mounted")
    n = 0
    for tree in sorted(os.listdir(base)):
        path = os.path.join(base, tree)
        if not os.path.isdir(path):
            continue
        p = VioParams.from_folder(path)
        PinholeCamera.from_params(p.left_cam)
        assert p.display is not None
        n += 1
    assert n >= 7


def test_uhumans2_odometry_params():
    p = VioParams.from_folder("/root/reference/params/uHumans2")
    assert p.odometry is not None
    assert p.odometry.position_precision == 1.0e-3
    assert p.odometry.rotation_precision == 1.0e-4
    assert p.odometry.T_BS.shape == (4, 4)


def test_coarse_temporal_sync_applies_correction():
    """do_coarse_imu_camera_temporal_sync computes the IMU-camera clock
    correction from the first frame (DataProviderModule.cpp:110-120)."""
    from kimera_vio_tpu.dataprovider.euroc import EurocDataProvider

    d = "/root/reference/tests/data/MicroEurocDataset"
    prov = EurocDataProvider(d, do_coarse_imu_camera_temporal_sync=True)
    packets = list(prov.frames())
    assert len(packets) > 0
    # EuRoC shares one clock: the correction is the sub-sample gap to the
    # nearest IMU stamp (< one IMU period = 5 ms).
    assert abs(prov.imu_timestamp_correction_ns) < 5_000_000
