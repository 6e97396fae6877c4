"""ImuSynchronizer unit tests — the reference's ThreadsafeImuBuffer
semantics (utils/ThreadsafeImuBuffer.h:59-192, testThreadsafeImuBuffer.cpp):
interpolated upper border, coverage queries (the QueryResult contract maps
to block()/None), out-of-order input, and over-capacity integral-preserving
merging.
"""
import numpy as np

from kimera_vio_tpu.dataprovider.euroc import ImuSynchronizer


def _sync(stamps, acc=None, gyr=None, cap=16):
    stamps = np.asarray(stamps, np.int64)
    n = len(stamps)
    if acc is None:
        acc = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
    if gyr is None:
        gyr = -np.arange(n * 3, dtype=np.float32).reshape(n, 3)
    return ImuSynchronizer(stamps, np.asarray(acc, np.float32),
                           np.asarray(gyr, np.float32), max_per_block=cap)


def test_exact_boundaries_inclusive_exclusive():
    # Samples at 0..5 * 100ns; query (100, 400] -> samples 200, 300, 400.
    s = _sync([0, 100, 200, 300, 400, 500])
    blk = s.block(100, 400)
    n = int(blk.mask.sum())
    assert n == 3
    np.testing.assert_allclose(blk.dt[:3], [1e-7, 1e-7, 1e-7], rtol=1e-5)
    # acc rows 2, 3, 4 (t0 exclusive, t1 inclusive — upper border exact).
    np.testing.assert_array_equal(blk.acc[0], [6, 7, 8])
    np.testing.assert_array_equal(blk.acc[2], [12, 13, 14])


def test_interpolated_upper_border():
    """Query end between samples: the final block sample is linearly
    interpolated exactly at t1 (getImuDataInterpolatedUpperBorder)."""
    s = _sync([0, 100, 200], acc=[[0, 0, 0], [10, 0, 0], [20, 0, 0]],
              gyr=[[0, 0, 0], [1, 0, 0], [2, 0, 0]])
    blk = s.block(0, 150)
    n = int(blk.mask.sum())
    assert n == 2
    np.testing.assert_allclose(blk.acc[1], [15, 0, 0], atol=1e-5)
    np.testing.assert_allclose(blk.gyr[1], [1.5, 0, 0], atol=1e-6)
    # dt of the interpolated tail covers (100, 150].
    np.testing.assert_allclose(blk.dt[:2], [1e-7, 0.5e-7], rtol=1e-5)


def test_not_covered_returns_none():
    """NeverAvailable / NotYetAvailable map to None (-> FrameAction::Drop
    in the provider, DataProviderModule.cpp)."""
    s = _sync([100, 200, 300])
    assert s.block(0, 50) is None       # entirely before the stream
    assert s.block(50, 150) is None     # t0 before first sample
    assert s.block(150, 400) is None    # t1 after last sample
    assert s.block(150, 300) is not None


def test_out_of_order_input_is_sorted():
    stamps = np.array([300, 100, 200, 0], np.int64)
    acc = np.array([[3, 0, 0], [1, 0, 0], [2, 0, 0], [0, 0, 0]], np.float32)
    s = ImuSynchronizer(stamps, acc, acc.copy(), max_per_block=8)
    blk = s.block(0, 300)
    assert int(blk.mask.sum()) == 3
    np.testing.assert_array_equal(blk.acc[:3, 0], [1, 2, 3])


def test_over_capacity_merging_preserves_integral():
    """A long gap (many samples per frame) merges adjacent pairs with
    dt weighting: sum(acc*dt) is preserved, so the preintegrated velocity
    delta is unchanged."""
    rng = np.random.default_rng(0)
    n = 50
    stamps = (np.arange(1, n + 1) * 5_000_000).astype(np.int64)  # 5 ms
    acc = rng.normal(0, 1, (n, 3)).astype(np.float32)
    gyr = rng.normal(0, 1, (n, 3)).astype(np.float32)
    s = ImuSynchronizer(stamps, acc, gyr, max_per_block=8)
    t0, t1 = int(stamps[0]), int(stamps[-1])  # (t0, t1] -> samples 1..n-1
    blk = s.block(t0, t1)
    m = blk.mask
    assert int(m.sum()) <= 8
    # Exact integral over the interval from the raw stream.
    dts = np.diff(stamps).astype(np.float64) * 1e-9
    integral = (acc[1:] * dts[:, None]).sum(0)
    merged = (blk.acc[m] * blk.dt[m][:, None]).sum(0)
    np.testing.assert_allclose(merged, integral, rtol=1e-4, atol=1e-5)
    # Total dt also preserved.
    np.testing.assert_allclose(blk.dt[m].sum(), dts.sum(), rtol=1e-6)


def test_block_is_fixed_capacity_masked():
    s = _sync([0, 100, 200, 300], cap=16)
    blk = s.block(0, 300)
    assert blk.acc.shape == (16, 3) and blk.mask.shape == (16,)
    assert int(blk.mask.sum()) == 3
    assert not blk.mask[3:].any()
