"""Live (online) data-provider tests — port of the reference's
DataProviderModule sync scenarios (testParallelStereoProvider.cpp:115-267
and MonoDataProviderModule.cpp:46-121): Use/Wait/Drop frame actions,
monotonic-timestamp guard, out-of-order IMU rejection, and
offline == replayed-live pipeline equivalence."""

import numpy as np
import pytest

from kimera_vio_tpu.dataprovider.live import (
    LiveDataProvider,
    LiveImuBuffer,
    replay,
)

MS = 1_000_000  # ns per ms


def img(v=0):
    return np.full((24, 32), v, np.uint8)


def feed_imu(p, t0_ms, t1_ms, step_ms=5):
    for t in range(t0_ms, t1_ms, step_ms):
        p.push_imu(t * MS, (0.0, 0.0, 9.81), (0.0, 0.0, 0.0))


class TestLiveImuBuffer:
    def test_query_triage(self):
        buf = LiveImuBuffer()
        assert buf.query(0, 10 * MS)[0] == LiveImuBuffer.NOT_YET
        for t in range(0, 100, 5):
            assert buf.push(t * MS, (0, 0, 9.81), (0, 0, 0))
        # Fully covered interval -> AVAILABLE with interpolated border.
        st, blk = buf.query(10 * MS, 42 * MS)
        assert st == LiveImuBuffer.AVAILABLE
        n = int(blk.mask.sum())
        # Samples at 15..40 (6) + interpolated at 42.
        assert n == 7
        assert abs(float(np.asarray(blk.dt)[:n].sum()) - 0.032) < 1e-6
        # Query past the newest -> Wait.
        assert buf.query(50 * MS, 200 * MS)[0] == LiveImuBuffer.NOT_YET
        # Query before the oldest -> Never (Drop).
        assert buf.query(-10 * MS, 20 * MS)[0] == LiveImuBuffer.NEVER

    def test_out_of_order_imu_rejected(self):
        buf = LiveImuBuffer()
        assert buf.push(10 * MS, (0, 0, 9.81), (0, 0, 0))
        assert not buf.push(5 * MS, (0, 0, 9.81), (0, 0, 0))
        assert not buf.push(10 * MS, (0, 0, 9.81), (0, 0, 0))
        assert buf.push(15 * MS, (0, 0, 9.81), (0, 0, 0))


class TestLiveProviderSync:
    def test_basic_use(self):
        """IMU leading frames: every frame emits a packet with an IMU
        block spanning exactly the inter-frame interval."""
        p = LiveDataProvider(stereo=True)
        feed_imu(p, 0, 200)
        for t in (50, 100, 150):
            p.push_right_frame(t * MS, img())
            p.push_left_frame(t * MS, img())
        pk0 = p.poll()
        assert pk0 is not None and pk0["imu"] is None  # first frame
        pk1 = p.poll()
        assert pk1 is not None and pk1["stamp_ns"] == 100 * MS
        n = int(pk1["imu"].mask.sum())
        dts = np.asarray(pk1["imu"].dt)[:n]
        assert abs(dts.sum() - 0.050) < 1e-6
        assert p.poll() is not None
        assert p.poll() is None  # queue drained

    def test_image_before_imu_waits(self):
        """Frame arrives before IMU covers it -> Wait (packet appears
        only once IMU catches up). Reference: ImageBeforeImuTest."""
        p = LiveDataProvider(stereo=False)
        p.push_left_frame(100 * MS, img())
        assert p.poll() is None  # no IMU at all yet
        feed_imu(p, 0, 90)
        assert p.poll() is None  # IMU not yet past the frame stamp
        feed_imu(p, 90, 120)
        pk = p.poll()
        assert pk is not None and pk["stamp_ns"] == 100 * MS

    def test_frame_older_than_imu_horizon_dropped(self):
        """Second frame predating the IMU window -> Drop, pipeline
        continues with the next frame. Reference: drop-frames-older-
        than-imu scenario."""
        p = LiveDataProvider(stereo=False)
        feed_imu(p, 100, 300)
        p.push_left_frame(110 * MS, img())
        assert p.poll() is not None
        # A frame whose interval start predates available IMU can only
        # happen with a backwards stamp -- covered by monotonic guard:
        p.push_left_frame(105 * MS, img())
        assert p.poll() is None
        assert p.dropped_frames == 1
        p.push_left_frame(200 * MS, img())
        pk = p.poll()
        assert pk is not None and pk["stamp_ns"] == 200 * MS

    def test_monotonic_guard_drops_stale_frames(self):
        p = LiveDataProvider(stereo=False)
        feed_imu(p, 0, 300)
        p.push_left_frame(100 * MS, img())
        assert p.poll() is not None
        p.push_left_frame(100 * MS, img())  # duplicate stamp
        p.push_left_frame(90 * MS, img())  # older
        assert p.poll() is None
        assert p.dropped_frames == 2

    def test_stereo_right_frame_wait_and_pairing(self):
        """Left waits for its right partner; stale rights are discarded."""
        p = LiveDataProvider(stereo=True)
        feed_imu(p, 0, 300)
        p.push_right_frame(40 * MS, img(1))  # stale right (no left pair)
        p.push_left_frame(100 * MS, img())
        assert p.poll() is None  # Wait: no right frame within tolerance
        p.push_right_frame(100 * MS, img(2))
        pk = p.poll()
        assert pk is not None
        assert np.all(p.load_image(pk["right_path"]) == 2)

    def test_queue_bound_drops_oldest(self):
        p = LiveDataProvider(stereo=False, max_queued_frames=3)
        # No IMU -> frames accumulate; the bound drops the oldest.
        for t in range(100, 100 + 10 * 50, 50):
            p.push_left_frame(t * MS, img())
        assert len(p._left) == 3
        assert p.dropped_frames == 7

    def test_live_time_shift_update(self):
        """imu_time_shift_ns updates apply to subsequent packets
        (DataProviderModule::setImuTimeShift role)."""
        p = LiveDataProvider(stereo=False)
        feed_imu(p, 0, 400)
        p.push_left_frame(100 * MS, img())
        assert p.poll() is not None
        p.imu_time_shift_ns = 20 * MS
        p.push_left_frame(200 * MS, img())
        pk = p.poll()
        n = int(pk["imu"].mask.sum())
        # Interval is (100, 220] in IMU time: 0.120 s of preintegration.
        assert abs(np.asarray(pk["imu"].dt)[:n].sum() - 0.120) < 1e-6


@pytest.mark.slow
def test_replayed_live_matches_offline_pipeline():
    """The offline provider replayed through LiveDataProvider must produce
    the identical trajectory: proves the online sync core implements the
    same semantics the offline generators collapse into (reference keeps
    one DataProviderModule for both; testStereoImuPipeline runs all 4
    online/offline modes on the same data)."""
    import jax

    from kimera_vio_tpu.dataprovider.synthetic import (
        SyntheticStereoProvider,
        synthetic_params,
    )
    from kimera_vio_tpu.pipeline.stereo_pipeline import StereoImuPipeline

    params = synthetic_params(nr_states=8, max_features=96, max_landmarks=128)

    off = SyntheticStereoProvider(n_frames=24, vx=0.5)
    out_off = StereoImuPipeline(params, parallel_run=False).run(off)

    live = LiveDataProvider(stereo=True, max_queued_frames=64)
    src = SyntheticStereoProvider(n_frames=24, vx=0.5)
    import threading

    feeder = threading.Thread(target=replay, args=(src, live))
    feeder.start()
    out_live = StereoImuPipeline(params, parallel_run=False).run(live)
    feeder.join()

    assert out_live.n_frames == out_off.n_frames
    assert out_live.n_keyframes == out_off.n_keyframes
    np.testing.assert_allclose(
        np.stack(out_live.positions), np.stack(out_off.positions),
        atol=1e-6,
    )
