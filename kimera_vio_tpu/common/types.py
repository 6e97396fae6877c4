"""Core value types, as JAX pytrees with static shapes.

TPU-native replacements for the reference's `common/vio_types.h` and
`common/VioNavState.h`. Design rules (see SURVEY.md §7):

  * Timestamps are int64 nanoseconds on the host; on-device time is relative
    float32 seconds.
  * All per-feature containers are fixed-capacity Struct-of-Arrays with a
    validity mask — the TPU equivalent of the reference's ragged
    `std::vector<KeypointCV>` etc. (reference frontend/Frame.h:43-120).
  * Everything is a `flax.struct` dataclass -> a pytree, so whole states can
    be carried through `lax.scan`, donated to jit, and sharded with pjit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

# Host-side scalar aliases (documentation of intent).
Timestamp = int  # int64 nanoseconds, like reference vio_types.h Timestamp


@struct.dataclass
class ImuBias:
    """Accelerometer + gyroscope bias (reference: gtsam::imuBias::ConstantBias
    used in src/imu-frontend/ImuFrontend.cpp)."""

    accel: jax.Array  # (3,)
    gyro: jax.Array  # (3,)

    @classmethod
    def zero(cls, dtype=jnp.float32) -> "ImuBias":
        return cls(accel=jnp.zeros(3, dtype), gyro=jnp.zeros(3, dtype))

    def as_vector(self) -> jax.Array:
        return jnp.concatenate([self.accel, self.gyro], axis=-1)


@struct.dataclass
class NavState:
    """World-frame navigation state: pose + velocity.

    `R_world_body` (3,3), `p_world_body` (3,), `v_world` (3,).
    Reference: kimera-vio/common/VioNavState.h (pose, velocity, imu bias);
    we split bias out so NavState matches gtsam::NavState semantics.
    """

    rot: jax.Array  # (...,3,3) R_wb
    pos: jax.Array  # (...,3)   p_wb in world
    vel: jax.Array  # (...,3)   v in world

    @classmethod
    def identity(cls, dtype=jnp.float32) -> "NavState":
        return cls(
            rot=jnp.eye(3, dtype=dtype),
            pos=jnp.zeros(3, dtype),
            vel=jnp.zeros(3, dtype),
        )


@struct.dataclass
class VioNavState:
    """NavState + IMU bias, the full per-keyframe estimator state
    (reference common/VioNavState.h)."""

    nav: NavState
    bias: ImuBias

    @classmethod
    def identity(cls, dtype=jnp.float32) -> "VioNavState":
        return cls(nav=NavState.identity(dtype), bias=ImuBias.zero(dtype))


@struct.dataclass
class ImuBlock:
    """A fixed-capacity block of IMU measurements between two camera frames.

    The reference passes ragged `ImuStampS` (1xN int64) + `ImuAccGyrS` (6xN)
    columns (vio_types in ImuFrontend-definitions.h); here we pad to
    `MAX_IMU_PER_FRAME` and mask. `dt` is per-sample integration interval in
    seconds (already differenced on the host), zero where invalid.
    """

    acc: jax.Array  # (N, 3) float32 m/s^2
    gyr: jax.Array  # (N, 3) float32 rad/s
    dt: jax.Array  # (N,) float32 seconds; 0 for padding
    mask: jax.Array  # (N,) bool

    @property
    def capacity(self) -> int:
        return self.acc.shape[-2]


@struct.dataclass
class TrackedFeatures:
    """Fixed-capacity feature-track slots for one camera.

    TPU-native SoA replacement of reference Frame keypoint vectors
    (frontend/Frame.h:43-120): `uv` are distorted pixel coords (the raw
    detector/tracker domain), `uv_rect` undistorted-rectified coords,
    `versors` unit bearing vectors in the camera frame, `ids` global landmark
    ids (-1 invalid), `ages` = #keyframes observed.
    """

    uv: jax.Array  # (N, 2) float32
    uv_rect: jax.Array  # (N, 2) float32
    versors: jax.Array  # (N, 3) float32
    ids: jax.Array  # (N,) int32, -1 = empty slot
    ages: jax.Array  # (N,) int32
    mask: jax.Array  # (N,) bool — slot occupied and healthy

    @classmethod
    def empty(cls, capacity: int, dtype=jnp.float32) -> "TrackedFeatures":
        return cls(
            uv=jnp.zeros((capacity, 2), dtype),
            uv_rect=jnp.zeros((capacity, 2), dtype),
            versors=jnp.zeros((capacity, 3), dtype),
            ids=-jnp.ones((capacity,), jnp.int32),
            ages=jnp.zeros((capacity,), jnp.int32),
            mask=jnp.zeros((capacity,), bool),
        )

    @property
    def capacity(self) -> int:
        return self.ids.shape[-1]


@struct.dataclass
class StereoMeasurements:
    """Per-keyframe stereo measurements handed to the backend.

    Mirrors the reference `StatusStereoMeasurements` payload
    (lmk_id + StereoPoint2{uL, uR, v}, StereoVisionImuFrontend.cpp:485-531).
    `uR` is NaN for mono-only measurements, matching the reference's
    convention for mono frontends (MonoVisionImuFrontend.cpp:230-340).
    All in *rectified* pixel coordinates.
    """

    ids: jax.Array  # (N,) int32 landmark ids, -1 invalid
    uvs: jax.Array  # (N, 3) float32 [uL, uR, v]
    mask: jax.Array  # (N,) bool
