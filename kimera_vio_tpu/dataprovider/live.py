"""Live (online) data provider: incremental push of sensor data, pull of
time-synced packets.

The reference's online input path is a callback registry
(`DataProviderInterface`, /root/reference/src/dataprovider/
DataProviderInterface.cpp) feeding a `DataProviderModule` that time-syncs
each frame against a `ThreadsafeImuBuffer` with three FrameActions
(/root/reference/src/dataprovider/MonoDataProviderModule.cpp:46-121):

  * **Use**  — IMU covers (t_prev, t_frame]: emit a synced packet,
  * **Wait** — IMU not yet available up to t_frame: keep the frame queued
    (ThreadsafeImuBuffer QueryResult::kDataNotYetAvailable),
  * **Drop** — the frame predates the available IMU horizon or violates
    the monotonic-timestamp guard (kQueueShutdown/kDataNeverAvailable +
    the `timestamp_last_frame_` check).

This module is the TPU-native equivalent: a robot (or replay driver)
`push_*`es measurements from its sensor threads; the pipeline pulls
packets with `poll()` / iterates `frames()`. Packets are schema-identical
to the offline `EurocDataProvider`, so `StereoImuPipeline.run()` drives a
live source unchanged. The offline providers are, semantically, a replay
over this same sync core (see `replay()`).

Also mirrored: live `imu_time_shift_ns` updates from the fine
time-aligner (DataProviderModule::setImuTimeShift) and the coarse
IMU-camera clock alignment on the first frame
(DataProviderModule.cpp:110-120).
"""

from __future__ import annotations

import threading
from collections import deque

import numpy as np

from kimera_vio_tpu.dataprovider.euroc import ImuSynchronizer


class LiveImuBuffer:
    """Incremental IMU ring with the reference ThreadsafeImuBuffer's query
    semantics (utils/ThreadsafeImuBuffer.h:59-192): interpolated-upper-
    border blocks plus the QueryResult triage (available / not-yet /
    never). Appends are O(1) amortized; storage is trimmed to `horizon_s`
    behind the newest sample."""

    AVAILABLE = 0
    NOT_YET = 1  # newest IMU older than t1 -> caller should Wait
    NEVER = 2  # oldest IMU newer than t0 -> caller must Drop

    def __init__(self, max_per_block: int = 16, horizon_s: float = 60.0):
        self.max_per_block = max_per_block
        self.horizon_ns = int(horizon_s * 1e9)
        self._t: deque = deque()
        self._acc: deque = deque()
        self._gyr: deque = deque()
        self._lock = threading.Lock()
        self._newest = -(2**62)

    def push(self, stamp_ns: int, acc, gyr) -> bool:
        """Add one measurement. Out-of-order samples (stamp <= newest) are
        rejected, mirroring ThreadsafeImuBuffer's monotonicity contract
        (addMeasurement CHECK_GT; the reference crashes, we drop+flag)."""
        with self._lock:
            if stamp_ns <= self._newest:
                return False
            self._t.append(int(stamp_ns))
            self._acc.append(np.asarray(acc, np.float32))
            self._gyr.append(np.asarray(gyr, np.float32))
            self._newest = int(stamp_ns)
            # Trim beyond the horizon (bounded RAM on long missions).
            cutoff = self._newest - self.horizon_ns
            while len(self._t) > 2 and self._t[1] < cutoff:
                self._t.popleft()
                self._acc.popleft()
                self._gyr.popleft()
            return True

    @property
    def acc(self) -> np.ndarray:
        """Raw accel samples oldest-first (bootstrap attitude init reads
        the first ~50, InitializationFromImu role)."""
        with self._lock:
            return (
                np.stack(self._acc)
                if self._acc
                else np.zeros((0, 3), np.float32)
            )

    def query(self, t0_ns: int, t1_ns: int):
        """(status, ImuBlock|None) for the interval (t0, t1]."""
        with self._lock:
            if not self._t:
                return self.NOT_YET, None
            if t1_ns > self._t[-1]:
                return self.NOT_YET, None
            if t0_ns < self._t[0]:
                return self.NEVER, None
            sync = ImuSynchronizer(
                np.fromiter(self._t, np.int64, len(self._t)),
                np.stack(self._acc),
                np.stack(self._gyr),
                max_per_block=self.max_per_block,
            )
        blk = sync.block(t0_ns, t1_ns)
        return (self.AVAILABLE, blk) if blk is not None else (self.NEVER, None)


class LiveDataProvider:
    """Push-in / pull-out provider implementing the reference's online
    sync semantics. Pipeline-facing surface matches the offline providers:
    `frames()` generator, `load_image(key)`, `ground_truth` (None),
    `imu_sync` (the live buffer), writable `imu_time_shift_ns`."""

    def __init__(
        self,
        stereo: bool = True,
        max_per_block: int = 16,
        max_queued_frames: int = 10,
        do_coarse_imu_camera_temporal_sync: bool = False,
        right_stamp_tolerance_ns: int = 5_000_000,
    ):
        self.stereo = stereo
        self.imu_sync = LiveImuBuffer(max_per_block=max_per_block)
        self.ground_truth = None
        self.imu_time_shift_ns = 0  # updated live by the fine time-aligner
        self.imu_timestamp_correction_ns = 0
        self._do_coarse_sync = do_coarse_imu_camera_temporal_sync
        self._right_tol_ns = int(right_stamp_tolerance_ns)
        self._left: deque = deque()  # (stamp_ns, key)
        self._right: deque = deque()
        self._images: dict = {}
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._max_queued = max_queued_frames
        self._last_emitted_ns = -(2**62)
        self._prev_t = None  # previous emitted frame's shifted stamp
        self._index = 0
        self._stopped = False
        self.dropped_frames = 0
        self.dropped_imu = 0

    # -- sensor-side (the reference's registered callbacks) ---------------
    def push_imu(self, stamp_ns: int, acc, gyr):
        """registerImuSingleCallback role."""
        if not self.imu_sync.push(stamp_ns, acc, gyr):
            self.dropped_imu += 1
        else:
            with self._cv:
                self._cv.notify_all()

    def push_left_frame(self, stamp_ns: int, image: np.ndarray):
        """registerLeftFrameCallback role. Monotonicity is enforced here
        (MonoDataProviderModule.cpp: 'Dropping frame: older than the last
        processed'); overflow beyond max_queued_frames drops the OLDEST
        queued frame (bounded latency, like the bounded frontend queue)."""
        with self._cv:
            if stamp_ns <= self._last_emitted_ns or (
                self._left and stamp_ns <= self._left[-1][0]
            ):
                self.dropped_frames += 1
                return
            key = f"live://left/{int(stamp_ns)}"
            self._images[key] = image
            self._left.append((int(stamp_ns), key))
            while len(self._left) > self._max_queued:
                old_t, old_key = self._left.popleft()
                self._images.pop(old_key, None)
                self.dropped_frames += 1
            self._cv.notify_all()

    def push_right_frame(self, stamp_ns: int, image: np.ndarray):
        with self._cv:
            key = f"live://right/{int(stamp_ns)}"
            self._images[key] = image
            self._right.append((int(stamp_ns), key))
            while len(self._right) > self._max_queued:
                _, old_key = self._right.popleft()
                self._images.pop(old_key, None)
            self._cv.notify_all()

    def stop(self):
        """End of mission: frames() drains and returns."""
        with self._cv:
            self._stopped = True
            self._cv.notify_all()

    # -- pipeline-side -----------------------------------------------------
    def load_image(self, key: str) -> np.ndarray:
        img = self._images.get(key)
        if img is None:
            raise KeyError(f"live image already consumed: {key}")
        return img

    def _release(self, *keys):
        for k in keys:
            self._images.pop(k, None)

    def poll(self):
        """One sync attempt (non-blocking): returns a packet dict, or None
        when nothing can be emitted yet (Wait), dropping stale frames as a
        side effect (Drop). Mirrors getTimeSyncedImuMeasurements."""
        with self._lock:
            return self._poll_locked()

    def _poll_locked(self):
        while self._left:
            stamp_ns, key = self._left[0]
            if self.stereo:
                # Pair the right frame by nearest timestamp within
                # tolerance (StereoDataProviderModule left/right sync).
                while (
                    len(self._right) > 1
                    and abs(self._right[1][0] - stamp_ns)
                    <= abs(self._right[0][0] - stamp_ns)
                ):
                    _, k_old = self._right.popleft()
                    self._images.pop(k_old, None)
                if not self._right:
                    return None  # Wait for the right frame
                r_stamp, r_key = self._right[0]
                if r_stamp - stamp_ns > self._right_tol_ns:
                    # Right stream has moved past this left frame: Drop.
                    self._left.popleft()
                    self._images.pop(key, None)
                    self.dropped_frames += 1
                    continue
                if abs(r_stamp - stamp_ns) > self._right_tol_ns:
                    return None  # Wait for a matching right frame
            if self._do_coarse_sync:
                # Coarse clock alignment on the first frame
                # (DataProviderModule.cpp:110-120): correction = newest
                # IMU stamp minus frame stamp.
                if not self.imu_sync._t:
                    return None
                self.imu_timestamp_correction_ns = int(
                    self.imu_sync._newest - stamp_ns
                )
                self._do_coarse_sync = False
            t = (
                int(stamp_ns)
                + self.imu_time_shift_ns
                + self.imu_timestamp_correction_ns
            )
            packet = {
                "index": self._index,
                "stamp_ns": int(stamp_ns),
                "left_path": key,
            }
            if self.stereo:
                packet["right_path"] = self._right[0][1]
            if self._prev_t is None:
                # First frame: packet without preintegration, but only
                # once IMU exists at/before t (the backend bootstraps
                # attitude from it) — else Wait.
                status, _ = self.imu_sync.query(t - 1, t)
                if status == LiveImuBuffer.NOT_YET:
                    return None
                packet["imu"] = None
            else:
                status, blk = self.imu_sync.query(self._prev_t, t)
                if status == LiveImuBuffer.NOT_YET:
                    return None  # Wait: IMU will arrive
                if status == LiveImuBuffer.NEVER:
                    # Frame predates the IMU horizon: Drop it.
                    self._left.popleft()
                    self._images.pop(key, None)
                    if self.stereo and self._right:
                        _, rk = self._right.popleft()
                        self._images.pop(rk, None)
                    self.dropped_frames += 1
                    continue
                packet["imu"] = blk
            self._left.popleft()
            if self.stereo:
                self._right.popleft()
            self._prev_t = t
            self._last_emitted_ns = int(stamp_ns)
            self._index += 1
            return packet
        return None

    def frames(self, timeout_s: float = 1.0):
        """Blocking generator over synced packets until `stop()` — the
        surface `StereoImuPipeline.run()` consumes, so a live source
        drives the pipeline exactly like a dataset replay."""
        while True:
            with self._cv:
                packet = self._poll_locked()
                if packet is None:
                    if self._stopped and not self._left:
                        return
                    self._cv.wait(timeout=timeout_s)
                    continue
            yield packet


def replay(offline_provider, live: LiveDataProvider, imu_ahead_ns: int = 0):
    """Feed an offline provider's data through a LiveDataProvider in
    timestamp order (the reference's EurocDataProvider::spin sends all IMU
    first, then frames, EurocDataProvider.cpp:109-128 — here interleaved
    like a real sensor, optionally with IMU leading by `imu_ahead_ns`).
    Used by tests to prove offline == replayed-live."""
    sync = offline_provider.imu_sync
    imu_i = 0
    n_imu = len(sync.t)
    for packet in offline_provider.frames():
        t = packet["stamp_ns"] + imu_ahead_ns
        while imu_i < n_imu and sync.t[imu_i] <= t:
            live.push_imu(
                int(sync.t[imu_i]), sync.acc[imu_i], sync.gyr[imu_i]
            )
            imu_i += 1
        left = offline_provider.load_image(packet["left_path"])
        if "right_path" in packet:
            live.push_right_frame(
                packet["stamp_ns"],
                offline_provider.load_image(packet["right_path"]),
            )
        live.push_left_frame(packet["stamp_ns"], left)
    while imu_i < n_imu:
        live.push_imu(int(sync.t[imu_i]), sync.acc[imu_i], sync.gyr[imu_i])
        imu_i += 1
    live.stop()
