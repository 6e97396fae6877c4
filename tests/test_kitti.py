"""KittiDataProvider exercised on a synthetic KITTI-format fixture
(round-2 verdict item 9): a tmpdir tree in the raw-KITTI layout
(image_00/image_01 PNG stereo + oxts txt rows) is parsed into packets and
driven through one pipeline step — catching format/timestamp bugs the
real dataset (absent in this environment) would.

Reference: src/dataprovider/KittiDataProvider.cpp (marked unsupported in
examples/KimeraVIO.cpp:37 but shipped; this rebuild supports it)."""

import os

import numpy as np
import pytest

from kimera_vio_tpu.dataprovider.kitti import (
    KittiDataProvider,
    _parse_timestamps,
)

cv2 = pytest.importorskip("cv2")


def _write_kitti_fixture(root, n_frames=4, imu_rate=100.0, fps=10.0):
    """Minimal raw-KITTI tree with textured random stereo + OXTS rows."""
    rng = np.random.default_rng(0)
    h, w = 96, 128

    def stamps_txt(path, times_s):
        with open(path, "w") as f:
            for t in times_s:
                frac = t - int(t)
                hh = int(t) // 3600
                mm = (int(t) % 3600) // 60
                ss = int(t) % 60
                f.write(
                    f"2011-09-26 {hh:02d}:{mm:02d}:{ss + frac:012.9f}\n"
                )

    base_s = 13 * 3600 + 2 * 60 + 25.0
    frame_times = base_s + np.arange(n_frames) / fps
    for cam in ("image_00", "image_01"):
        d = os.path.join(root, cam, "data")
        os.makedirs(d)
        stamps_txt(os.path.join(root, cam, "timestamps.txt"), frame_times)
        for k in range(n_frames):
            img = rng.integers(0, 255, (h, w), np.uint8)
            cv2.imwrite(os.path.join(d, f"{k:010d}.png"), img)

    n_imu = int(n_frames / fps * imu_rate) + 10
    imu_times = base_s - 0.05 + np.arange(n_imu) / imu_rate
    d = os.path.join(root, "oxts", "data")
    os.makedirs(d)
    stamps_txt(os.path.join(root, "oxts", "timestamps.txt"), imu_times)
    for k in range(n_imu):
        row = np.zeros(30)
        row[0:3] = [49.0, 8.4, 112.0]  # lat lon alt
        row[11:14] = [0.0, 0.0, 9.81]  # ax ay az (body, gravity-reaction)
        row[17:20] = [0.01, -0.02, 0.005]  # wx wy wz
        np.savetxt(os.path.join(d, f"{k:010d}.txt"), row[None])
    return h, w


def test_parse_timestamps_subsecond(tmp_path):
    p = tmp_path / "timestamps.txt"
    p.write_text(
        "2011-09-26 13:02:25.964389445\n2011-09-26 13:02:26.064389445\n"
    )
    t = _parse_timestamps(str(p))
    assert t.dtype == np.int64
    # 100 ms apart, ns resolution preserved to float64 precision.
    assert abs((t[1] - t[0]) - 100_000_000) < 1000


def test_kitti_provider_packets(tmp_path):
    h, w = _write_kitti_fixture(str(tmp_path))
    prov = KittiDataProvider(str(tmp_path))
    packets = list(prov.frames())
    assert len(packets) == 4
    assert packets[0]["imu"] is None
    for p in packets[1:]:
        blk = p["imu"]
        assert blk is not None
        m = np.asarray(blk.mask)
        assert m.sum() >= 8  # ~10 samples per 100 ms at 100 Hz
        acc = np.asarray(blk.acc)[m]
        np.testing.assert_allclose(acc[:, 2], 9.81, atol=1e-6)
    img = prov.load_image(packets[0]["left_path"])
    assert img.shape == (h, w)
    assert "right_path" in packets[0]


@pytest.mark.lane2
def test_kitti_through_pipeline_step(tmp_path):
    """Packets drive one bootstrap + one fused pipeline step (IMU-attitude
    init path: KITTI has no GT csv here)."""
    from kimera_vio_tpu.dataprovider.synthetic import synthetic_params
    from kimera_vio_tpu.pipeline.stereo_pipeline import StereoImuPipeline

    h, w = _write_kitti_fixture(str(tmp_path))
    prov = KittiDataProvider(str(tmp_path))
    params = synthetic_params(
        width=w, height=h, fx=100.0, baseline=0.54,
        max_features=64, max_landmarks=96, nr_states=4,
    )
    pipe = StereoImuPipeline(params, parallel_run=False)
    out = pipe.run(prov)
    assert out.n_frames >= 2
    assert out.n_keyframes >= 1
    assert np.isfinite(np.stack(out.positions)).all()
