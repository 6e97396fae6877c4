"""IMU-camera time-offset estimation by cross-correlation.

Rebuild of the reference CrossCorrTimeAligner
(src/initial/CrossCorrTimeAligner.cpp:20-140, attemptEstimation :294): the
per-sample gyro rotation-rate magnitude and the per-frame visual rotation
magnitude (from mono RANSAC) are buffered at IMU rate; once the signal
variance clears a threshold, the offset is the argmax of their
cross-correlation. The correlation itself is one `jnp.correlate`
(SURVEY.md §7: "trivially a jnp.correlate"). The result feeds back into the
data provider's `imu_time_shift` (reference
VisionImuFrontend.cpp:77-83 -> DataProviderModule)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class CrossCorrTimeAligner:
    def __init__(
        self,
        window_size_s: float = 10.0,
        imu_rate_hz: float = 200.0,
        variance_threshold_scaling: float = 30.0,
    ):
        self.n = int(window_size_s * imu_rate_hz)
        self.dt = 1.0 / imu_rate_hz
        self.variance_threshold_scaling = variance_threshold_scaling
        self.imu_signal: list[float] = []  # |w|*dt per IMU sample
        self.imu_stamps: list[int] = []
        self.vis_signal: list[float] = []  # rotation angle per frame, resampled
        self.vis_stamps: list[int] = []
        self.estimate_s: float | None = None

    def add_imu(self, stamp_ns: int, gyro: np.ndarray, dt_s: float):
        self.imu_signal.append(float(np.linalg.norm(gyro) * dt_s))
        self.imu_stamps.append(stamp_ns)
        if len(self.imu_signal) > self.n:
            self.imu_signal.pop(0)
            self.imu_stamps.pop(0)

    def add_frame_rotation(self, stamp_ns: int, angle_rad: float, n_imu: int):
        """Distribute the inter-frame visual rotation over its IMU samples
        (the reference's IMU-rate mode, do_imu_rate_time_alignment)."""
        per = angle_rad / max(n_imu, 1)
        for _ in range(max(n_imu, 1)):
            self.vis_signal.append(per)
            self.vis_stamps.append(stamp_ns)
        while len(self.vis_signal) > self.n:
            self.vis_signal.pop(0)
            self.vis_stamps.pop(0)

    def attempt_estimation(self) -> float | None:
        """Returns the IMU-minus-camera time offset in seconds, or None if
        the window lacks excitation (variance gate, reference :294)."""
        m = min(len(self.imu_signal), len(self.vis_signal))
        if m < self.n // 2:
            return None
        a = np.asarray(self.imu_signal[-m:], np.float32)
        b = np.asarray(self.vis_signal[-m:], np.float32)
        var_gate = self.variance_threshold_scaling * np.var(np.diff(a)) if m > 1 else 0
        if np.var(a) < var_gate or np.var(a) < 1e-10:
            return None
        a = a - a.mean()
        b = b - b.mean()
        corr = np.asarray(jnp.correlate(jnp.asarray(a), jnp.asarray(b), mode="full"))
        # np.correlate's 'full' lag axis runs b-relative-to-a; a peak at
        # index i means b is delayed by (m - 1 - i) samples w.r.t. a.
        lag = (m - 1) - int(np.argmax(corr))
        self.estimate_s = lag * self.dt
        return self.estimate_s
