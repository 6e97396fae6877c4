"""RgbdDataProvider: EuRoC-style RGB-D tree (uHumans2/KinectAzure class).

Generates a miniature on-disk dataset (RGB PNGs + 16-bit mm depth PNGs +
IMU csv, the layout of /root/reference/params/uHumans2 deployments) from
the synthetic constant-velocity scene, then (1) asserts the depth decode
contract (raw * depth_factor -> meters, range-gated) and (2) runs the
full RgbdImuPipeline on it. Reference analog:
src/dataprovider/RgbdDataProviderModule.cpp.
"""
import os

import numpy as np
import pytest

from kimera_vio_tpu.dataprovider.rgbd import RgbdDataProvider
from kimera_vio_tpu.dataprovider.synthetic import (
    SyntheticStereoProvider,
    synthetic_params,
)


@pytest.fixture(scope="module")
def rgbd_tree(tmp_path_factory):
    import cv2

    base = SyntheticStereoProvider(
        n_frames=16, vx=0.5, width=160, height=120, fx=120.0, depth=5.0
    )
    root = tmp_path_factory.mktemp("rgbd_ds")
    mav0 = root / "mav0"
    for d in ("cam0/data", "depth0/data", "imu0",
              "state_groundtruth_estimate0"):
        os.makedirs(mav0 / d, exist_ok=True)

    # imu0/data.csv: stamp, gyr xyz, acc xyz (EuRoC column order).
    sync = base.imu_sync
    with open(mav0 / "imu0" / "data.csv", "w") as fh:
        fh.write("#timestamp,gx,gy,gz,ax,ay,az\n")
        for t, g, a in zip(sync.t, sync.gyr, sync.acc):
            fh.write(f"{int(t)},{g[0]},{g[1]},{g[2]},{a[0]},{a[1]},{a[2]}\n")

    gt = base.ground_truth
    with open(mav0 / "state_groundtruth_estimate0" / "data.csv", "w") as fh:
        fh.write("#timestamp,p,q,v,bg,ba\n")
        for i in range(len(gt.stamps_ns)):
            row = [int(gt.stamps_ns[i]), *gt.positions[i],
                   *gt.quats_wxyz[i], *gt.velocities[i],
                   *gt.gyro_bias[i], *gt.accel_bias[i]]
            fh.write(",".join(str(x) for x in row) + "\n")

    cam_csv = open(mav0 / "cam0" / "data.csv", "w")
    dep_csv = open(mav0 / "depth0" / "data.csv", "w")
    depth_mm = np.full(
        (base.height, base.width), base.depth * 1000.0, np.uint16
    )
    # A hole of invalid (too-far) depth to exercise range gating.
    depth_mm[:10, :10] = 60000
    for k, stamp in enumerate(base.left_stamps):
        name = f"{int(stamp)}.png"
        img = np.clip(base.load_image(("left", k)), 0, 255).astype(np.uint8)
        cv2.imwrite(str(mav0 / "cam0" / "data" / name), img)
        cv2.imwrite(str(mav0 / "depth0" / "data" / name), depth_mm)
        cam_csv.write(f"{int(stamp)},{name}\n")
        dep_csv.write(f"{int(stamp)},{name}\n")
    cam_csv.close()
    dep_csv.close()
    return str(root), base


def test_depth_decode_contract(rgbd_tree):
    root, base = rgbd_tree
    prov = RgbdDataProvider(root, depth_factor=1e-3, max_depth=20.0)
    packets = list(prov.frames())
    assert len(packets) >= 14  # first frame + imu-covered rest
    p = packets[1]
    depth = prov.load_image(p["right_path"])
    assert depth.dtype == np.float32
    # mm -> meters, and the 60 m hole is gated to invalid (0).
    assert abs(float(depth[60, 80]) - base.depth) < 1e-3
    assert float(depth[5, 5]) == 0.0
    gray = prov.load_image(p["left_path"])
    assert gray.dtype == np.uint8 and gray.shape == (120, 160)
    assert p["imu"] is not None and bool(p["imu"].mask.any())


@pytest.mark.slow
def test_rgbd_pipeline_on_disk_tree(rgbd_tree):
    from kimera_vio_tpu.pipeline.rgbd_pipeline import RgbdImuPipeline
    from kimera_vio_tpu.utils.logger import compute_ate

    root, base = rgbd_tree
    params = synthetic_params(
        width=160, height=120, fx=120.0,
        nr_states=8, max_features=64, max_landmarks=96,
    )
    params.frontend.klt_max_level = 2
    params.frontend.templ_cols = 31
    params.frontend.templ_rows = 7
    prov = RgbdDataProvider(root, depth_factor=1e-3, max_depth=20.0)
    pipe = RgbdImuPipeline(params, parallel_run=False)
    out = pipe.run(prov)
    assert out.n_keyframes >= 3
    est = np.stack(out.positions)
    assert np.isfinite(est).all()
    gt = base.ground_truth
    ate = compute_ate(
        np.array(out.stamps_ns), est, gt.stamps_ns, gt.positions,
        align=False,
    )
    assert ate["rmse"] < 0.10, ate
