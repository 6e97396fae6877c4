"""Fixed-lag smart-factor smoother — the TPU-native VIO backend.

Replaces the reference's GTSAM `IncrementalFixedLagSmoother` (iSAM2) backend
(src/backend/VioBackend.cpp:296-428, 1036-1250) with a batched Gauss-Newton
re-solve of the sliding-window normal equations each keyframe
(SURVEY.md §2.6 "TPU mapping"):

  * window of `K = nr_states` keyframe states (25 in params/Euroc/
    BackendParams.yaml:70), each 15 DoF: [dtheta, dp, dv, dba, dbg],
  * landmarks as *smart stereo factors*: triangulated in closed form from
    all masked observations (ops/triangulation.py, with the reference's
    rankTolerance / landmarkDistanceThreshold / outlierRejection /
    cheirality gates), then Schur-eliminated analytically so only poses
    enter the solve — one einsum over the landmark axis,
  * IMU preintegration factors (9-dim Forster residual, whitened by the
    PIM covariance) + bias random-walk between factors
    (VioBackend.cpp:910-968),
  * zero-velocity prior + no-motion between factor on LOW_DISPARITY
    keyframes (VioBackend.cpp:363-399),
  * marginalization = Schur complement of the oldest state onto the window
    prior, built from the prior + the factors incident to the oldest state;
    landmark observations leaving the horizon are dropped, as the reference
    drops out-of-horizon smart factors (VioBackend.cpp:1095-1104),
  * robust (Huber) weighting of smart-factor rows (monoNormType config).

Everything below is shape-static: partial windows are handled with masks,
and `backend_step` is a single jittable function
(state, keyframe-inputs) -> (state, outputs).

Timestamp representation: window stamps are float32 SECONDS RELATIVE to
a host-owned origin t0 (the pipeline subtracts t0_ns before entering the
graph). The pipeline REBASES t0 periodically
(StereoImuPipeline._rebase_delta_s / _apply_rebase, wired into both
run() and run_chunked()): in-graph stamps stay bounded by
margin + interval (~0.5-1.5 ks) for missions of ANY length, keeping
stamp resolution ~3e-5 s; stamps are only ever consumed as differences,
so the shift is output-neutral (asserted by tests/test_rebase.py). The
trajectory output keeps absolute int64 nanoseconds throughout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from kimera_vio_tpu.common import geometry as geo
from kimera_vio_tpu.common.types import ImuBias, NavState
from kimera_vio_tpu.frontend.imu_frontend import Pim, imu_residual
from kimera_vio_tpu.ops.triangulation import triangulate_stereo_landmarks

# Per-state tangent layout.
S_DOF = 15
_TH = slice(0, 3)  # rotation
_P = slice(3, 6)  # position
_V = slice(6, 9)  # velocity
_BA = slice(9, 12)  # accel bias
_BG = slice(12, 15)  # gyro bias

# Tracking-status codes (mirrors reference TrackingStatus for the backend's
# purposes: VALID / LOW_DISPARITY drive the no-motion factors).
STATUS_VALID = 0
STATUS_LOW_DISPARITY = 1
STATUS_INVALID = 2


@struct.dataclass
class BackendConfig:
    """Static solver configuration (host ints/floats; not traced)."""

    nr_states: int = struct.field(pytree_node=False, default=25)
    max_landmarks: int = struct.field(pytree_node=False, default=512)
    gn_iters: int = struct.field(pytree_node=False, default=2)
    min_obs_for_triangulation: int = struct.field(pytree_node=False, default=2)
    # imu_preintegration_type 0 = Combined (joint 15x15 whitening),
    # 1 = ImuFactor + separate bias between factor (every shipped tree).
    combined_pim: bool = struct.field(pytree_node=False, default=False)
    # Device-side noise/gate parameters.
    smart_noise_sigma: jax.Array = struct.field(default_factory=lambda: jnp.float32(3.0))
    # Robust m-estimator selection per measurement class, from BackendParams
    # (params/Euroc/BackendParams.yaml:44-56; norm types per
    # RegularVioBackend::selectNormType: 0=L2, 1=Huber, 2=Tukey). Stereo
    # observations (finite uR) use the stereo norm, mono rows the mono norm.
    mono_norm_type: jax.Array = struct.field(default_factory=lambda: jnp.int32(2))
    mono_norm_param: jax.Array = struct.field(default_factory=lambda: jnp.float32(4.6851))
    stereo_norm_type: jax.Array = struct.field(default_factory=lambda: jnp.int32(2))
    stereo_norm_param: jax.Array = struct.field(default_factory=lambda: jnp.float32(4.6851))
    rank_tolerance: jax.Array = struct.field(default_factory=lambda: jnp.float32(1.0))
    landmark_distance_threshold: jax.Array = struct.field(default_factory=lambda: jnp.float32(10.0))
    outlier_rejection_px: jax.Array = struct.field(default_factory=lambda: jnp.float32(3.0))
    acc_random_walk: jax.Array = struct.field(default_factory=lambda: jnp.float32(3e-2))
    gyro_random_walk: jax.Array = struct.field(default_factory=lambda: jnp.float32(1.9393e-5))
    zero_velocity_sigma: jax.Array = struct.field(default_factory=lambda: jnp.float32(1.0 / np.sqrt(1000.0)))
    no_motion_pos_sigma: jax.Array = struct.field(default_factory=lambda: jnp.float32(1.0 / np.sqrt(1000.0)))
    no_motion_rot_sigma: jax.Array = struct.field(default_factory=lambda: jnp.float32(1.0 / np.sqrt(10000.0)))
    ext_odom_rot_sigma: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.05))
    ext_odom_pos_sigma: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.1))
    # Between-stereo factors from the tracker's stereo-RANSAC pose
    # (addBetweenStereoFactors, VioBackend.cpp:324-336; precisions from
    # BackendParams.yaml:58-60). Sigma = 1/sqrt(precision); a zero rotation
    # precision (the EuRoC default) disables the rotation rows.
    between_rot_sigma: jax.Array = struct.field(default_factory=lambda: jnp.float32(jnp.inf))
    between_pos_sigma: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.1))
    # Constant-velocity factor (VioBackend::addConstantVelocityFactor,
    # :1322-1330; constant_vel_precision). inf sigma = disabled.
    constant_vel_sigma: jax.Array = struct.field(default_factory=lambda: jnp.float32(jnp.inf))
    init_pos_sigma: jax.Array = struct.field(default_factory=lambda: jnp.float32(1e-5))
    init_rp_sigma: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.174533))
    init_yaw_sigma: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.00174533))
    init_vel_sigma: jax.Array = struct.field(default_factory=lambda: jnp.float32(1e-3))
    init_ba_sigma: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.1))
    init_bg_sigma: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.01))
    n_gravity: jax.Array = struct.field(
        default_factory=lambda: jnp.array([0.0, 0.0, -9.81], jnp.float32)
    )
    # Rectified stereo intrinsics (set from StereoCamera).
    fx: jax.Array = struct.field(default_factory=lambda: jnp.float32(450.0))
    fy: jax.Array = struct.field(default_factory=lambda: jnp.float32(450.0))
    cx: jax.Array = struct.field(default_factory=lambda: jnp.float32(376.0))
    cy: jax.Array = struct.field(default_factory=lambda: jnp.float32(240.0))
    baseline: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.11))
    # Body-from-rectified-camera extrinsics.
    R_b_cam: jax.Array = struct.field(default_factory=lambda: jnp.eye(3, dtype=jnp.float32))
    t_b_cam: jax.Array = struct.field(default_factory=lambda: jnp.zeros(3, jnp.float32))

    @classmethod
    def from_params(cls, backend_params, imu_params, stereo_cam, *, max_landmarks=512, gn_iters=2):
        f = jnp.float32
        return cls(
            nr_states=backend_params.nr_states,
            max_landmarks=max_landmarks,
            # numOptimize (BackendParams.yaml:69) = extra optimize passes on
            # top of the base relinearize+solve (VioBackend.cpp:1222-1226).
            gn_iters=max(
                gn_iters, 1 + int(getattr(backend_params, "num_optimize", 1))
            ),
            combined_pim=(
                int(getattr(imu_params, "preintegration_type", 1)) == 0
            ),
            smart_noise_sigma=f(backend_params.smart_noise_sigma),
            mono_norm_type=jnp.int32(backend_params.mono_norm_type),
            mono_norm_param=f(backend_params.mono_norm_param),
            stereo_norm_type=jnp.int32(backend_params.stereo_norm_type),
            stereo_norm_param=f(backend_params.stereo_norm_param),
            rank_tolerance=f(backend_params.rank_tolerance),
            landmark_distance_threshold=f(backend_params.landmark_distance_threshold),
            outlier_rejection_px=f(backend_params.outlier_rejection),
            acc_random_walk=f(imu_params.acc_random_walk),
            gyro_random_walk=f(imu_params.gyro_random_walk),
            zero_velocity_sigma=f(1.0 / np.sqrt(backend_params.zero_velocity_precision)),
            no_motion_pos_sigma=f(1.0 / np.sqrt(backend_params.no_motion_position_precision)),
            no_motion_rot_sigma=f(1.0 / np.sqrt(backend_params.no_motion_rotation_precision)),
            between_rot_sigma=f(
                1.0 / np.sqrt(backend_params.between_rotation_precision)
                if backend_params.between_rotation_precision > 0
                else np.inf
            ),
            between_pos_sigma=f(
                1.0 / np.sqrt(backend_params.between_translation_precision)
                if backend_params.between_translation_precision > 0
                else np.inf
            ),
            constant_vel_sigma=f(
                1.0 / np.sqrt(backend_params.constant_vel_precision)
                if getattr(backend_params, "use_constant_velocity_factor", False)
                and backend_params.constant_vel_precision > 0
                else np.inf
            ),
            init_pos_sigma=f(backend_params.initial_position_sigma),
            init_rp_sigma=f(backend_params.initial_roll_pitch_sigma),
            init_yaw_sigma=f(backend_params.initial_yaw_sigma),
            init_vel_sigma=f(backend_params.initial_velocity_sigma),
            init_ba_sigma=f(backend_params.initial_acc_bias_sigma),
            init_bg_sigma=f(backend_params.initial_gyro_bias_sigma),
            n_gravity=jnp.asarray(imu_params.n_gravity, jnp.float32),
            fx=stereo_cam.fx,
            fy=stereo_cam.fy,
            cx=stereo_cam.cx,
            cy=stereo_cam.cy,
            baseline=stereo_cam.baseline,
            R_b_cam=stereo_cam.R_b_rect,
            t_b_cam=stereo_cam.t_b_rect,
        )


@struct.dataclass
class Window:
    """The sliding window of keyframe states + factor data + marginal prior."""

    rot: jax.Array  # (K,3,3)
    pos: jax.Array  # (K,3)
    vel: jax.Array  # (K,3)
    bias: jax.Array  # (K,6) [ba, bg]
    stamp: jax.Array  # (K,) float32 seconds (relative)
    mask: jax.Array  # (K,) state slot occupied
    n: jax.Array  # scalar int32 — number of active states
    pim: Pim  # stacked (K, ...); pim[i] connects state i-1 -> i
    pim_valid: jax.Array  # (K,)
    status: jax.Array  # (K,) tracking status at each keyframe
    # External-odometry relative-pose measurements (slot k: k-1 -> k).
    ext_R: jax.Array  # (K,3,3)
    ext_t: jax.Array  # (K,3)
    ext_valid: jax.Array  # (K,)
    # Stereo-RANSAC between measurements (slot k: k-1 -> k, body frame).
    btw_R: jax.Array  # (K,3,3)
    btw_t: jax.Array  # (K,3)
    btw_valid: jax.Array  # (K,)
    # Increment-chained published pose (W_Pose_B_lkf_from_increments_,
    # VioBackend.cpp:1348-1373): prev output composed with the smoothed
    # relative pose — drifts less erratically under relinearization.
    out_rot: jax.Array  # (3,3)
    out_pos: jax.Array  # (3,)
    # Last keyframe's ABSOLUTE external-odometry pose (the reference keeps
    # odom_pose_prev_kf_ to form relative between factors,
    # VisionImuFrontend.cpp:240-302).
    odom_R: jax.Array  # (3,3)
    odom_t: jax.Array  # (3,)
    odom_valid: jax.Array  # () bool
    prior_H: jax.Array  # (D,D) marginal prior information
    prior_g: jax.Array  # (D,) gradient of prior at its lin point
    prior_rot: jax.Array  # (K,3,3) prior linearization point
    prior_pos: jax.Array
    prior_vel: jax.Array
    prior_bias: jax.Array

    @classmethod
    def empty(cls, K: int, dtype=jnp.float32) -> "Window":
        D = K * S_DOF
        eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (K, 3, 3))
        z3 = jnp.zeros((K, 3), dtype)

        def stack_pim():
            p = Pim.zero()
            return jax.tree.map(lambda x: jnp.broadcast_to(x, (K,) + x.shape), p)

        return cls(
            rot=eye,
            pos=z3,
            vel=z3,
            bias=jnp.zeros((K, 6), dtype),
            stamp=jnp.zeros((K,), dtype),
            mask=jnp.zeros((K,), bool),
            n=jnp.int32(0),
            pim=stack_pim(),
            pim_valid=jnp.zeros((K,), bool),
            status=jnp.zeros((K,), jnp.int32),
            ext_R=eye,
            ext_t=z3,
            ext_valid=jnp.zeros((K,), bool),
            btw_R=eye,
            btw_t=z3,
            btw_valid=jnp.zeros((K,), bool),
            out_rot=jnp.eye(3, dtype=dtype),
            out_pos=jnp.zeros(3, dtype),
            odom_R=jnp.eye(3, dtype=dtype),
            odom_t=jnp.zeros(3, dtype),
            odom_valid=jnp.bool_(False),
            prior_H=jnp.zeros((D, D), dtype),
            prior_g=jnp.zeros((D,), dtype),
            prior_rot=eye,
            prior_pos=z3,
            prior_vel=z3,
            prior_bias=jnp.zeros((K, 6), dtype),
        )


@struct.dataclass
class LandmarkTable:
    """Fixed-capacity smart-landmark table: the feature-track bookkeeping of
    the reference backend (addStereoMeasurementsToFeatureTracks,
    VioBackend.cpp:731-793) as one SoA pytree."""

    ids: jax.Array  # (L,) int32, -1 = free slot
    obs_uvd: jax.Array  # (L, K, 3) [uL,uR,v] per window slot
    obs_mask: jax.Array  # (L, K)
    # Last solve's triangulated world positions (the landmark-map export of
    # getMapLmkIdsTo3dPointsInTimeHorizon, VioBackend.cpp:550-704) — read
    # by the frontend's PnP tracking against the backend map.
    pts: jax.Array  # (L, 3)
    pts_ok: jax.Array  # (L,)

    @classmethod
    def empty(cls, L: int, K: int, dtype=jnp.float32) -> "LandmarkTable":
        return cls(
            ids=-jnp.ones((L,), jnp.int32),
            obs_uvd=jnp.zeros((L, K, 3), dtype),
            obs_mask=jnp.zeros((L, K), bool),
            pts=jnp.zeros((L, 3), dtype),
            pts_ok=jnp.zeros((L,), bool),
        )


# ---------------------------------------------------------------------------
# State retraction & tangent difference
# ---------------------------------------------------------------------------


def retract_states(rot, pos, vel, bias, delta):
    """Apply per-state tangent updates delta (K, 15)."""
    dth = delta[:, _TH]
    R_new = rot @ geo.so3_exp(dth)
    return (
        R_new,
        pos + delta[:, _P],
        vel + delta[:, _V],
        bias + jnp.concatenate([delta[:, _BA], delta[:, _BG]], axis=-1),
    )


def local_coords(rot, pos, vel, bias, rot0, pos0, vel0, bias0):
    """Per-state tangent of (state) relative to (state0): x `boxminus` x0."""
    dth = geo.so3_log(jnp.swapaxes(rot0, -1, -2) @ rot)
    return jnp.concatenate(
        [dth, pos - pos0, vel - vel0, bias - bias0], axis=-1
    )


# ---------------------------------------------------------------------------
# Factor linearization
# ---------------------------------------------------------------------------


def robust_weight(rn: jax.Array, norm_type: jax.Array, param: jax.Array) -> jax.Array:
    """IRLS weight w(r) for the configured m-estimator on a whitened residual
    norm `rn` (reference RegularVioBackend::selectNormType semantics,
    RegularVioBackend.cpp:1625-1650): 0 = L2 (w=1), 1 = Huber
    (w = min(1, k/|r|)), 2 = Tukey (w = (1-(r/c)^2)^2 inside, 0 outside).
    All inputs broadcast; norm_type may vary per element."""
    safe = jnp.maximum(rn, 1e-9)
    w_huber = jnp.minimum(1.0, param / safe)
    u = jnp.clip(1.0 - (rn / param) ** 2, 0.0, 1.0)
    w_tukey = u * u
    return jnp.where(
        norm_type == 1, w_huber, jnp.where(norm_type == 2, w_tukey, 1.0)
    )


def _whiten_from_cov(cov, jitter=1e-12):
    """W such that W r has identity covariance (inverse Cholesky factor)."""
    d = cov.shape[-1]
    L = jnp.linalg.cholesky(cov + jitter * jnp.eye(d, dtype=cov.dtype))
    return jax.scipy.linalg.solve_triangular(
        L, jnp.eye(d, dtype=cov.dtype), lower=True
    )


def _imu_factor_blocks(cfg: BackendConfig, win: Window, ks=None):
    """Linearize all IMU + bias-random-walk factors between consecutive
    states. Returns (Ji, Jj, r) stacked over k=1..K-1 (slot k holds the
    factor between states k-1 and k), whitened, zeroed where invalid.

    `ks` optionally restricts to a subset of pair indices (marginalization
    only needs pair (0,1); linearizing all K-1 pairs there wastes ~K x the
    work)."""
    K = cfg.nr_states

    def retract_one(R, p, v, b, d):
        return (
            R @ geo.so3_exp(d[_TH]),
            p + d[_P],
            v + d[_V],
            b + jnp.concatenate([d[_BA], d[_BG]]),
        )

    def one(k):
        pim_k = jax.tree.map(lambda x: x[k], win.pim)
        dt_k = jnp.maximum(win.stamp[k] - win.stamp[k - 1], 1e-3)

        def residual(di, dj):
            Ri, pi, vi, bi = retract_one(
                win.rot[k - 1], win.pos[k - 1], win.vel[k - 1],
                win.bias[k - 1], di,
            )
            Rj, pj, vj, bj = retract_one(
                win.rot[k], win.pos[k], win.vel[k], win.bias[k], dj
            )
            si = NavState(rot=Ri, pos=pi, vel=vi)
            sj = NavState(rot=Rj, pos=pj, vel=vj)
            bias_i = ImuBias(accel=bi[0:3], gyro=bi[3:6])
            r_pim = imu_residual(pim_k, si, bias_i, sj, cfg.n_gravity)
            r_bias = bj - bi
            return r_pim, r_bias

        z = jnp.zeros(S_DOF, win.pos.dtype)
        (r_pim, r_bias) = residual(z, z)
        Jp_i, Jb_i = jax.jacfwd(lambda d: residual(d, z))(z)
        Jp_j, Jb_j = jax.jacfwd(lambda d: residual(z, d))(z)

        if cfg.combined_pim:
            # Combined flavor (imu_preintegration_type: 0): one 15-dim
            # residual jointly whitened by the Combined 15x15 covariance
            # (gtsam CombinedImuFactor; no separate bias between factor).
            from kimera_vio_tpu.frontend.imu_frontend import combined_cov15

            cov15 = combined_cov15(
                pim_k, cfg.acc_random_walk, cfg.gyro_random_walk
            )
            W15 = _whiten_from_cov(cov15, jitter=1e-10)
            r = W15 @ jnp.concatenate([r_pim, r_bias])
            Ji = W15 @ jnp.concatenate([Jp_i, Jb_i], axis=0)
            Jj = W15 @ jnp.concatenate([Jp_j, Jb_j], axis=0)
            return Ji, Jj, r

        # Plain flavor: whiten PIM residual by its 9x9 covariance + a
        # separate bias-random-walk between factor (sigma^2 * dt).
        Wp = _whiten_from_cov(pim_k.cov, jitter=1e-10)
        r_pim_w = Wp @ r_pim
        Jp_i_w = Wp @ Jp_i
        Jp_j_w = Wp @ Jp_j
        sig = jnp.concatenate(
            [
                jnp.full(3, cfg.acc_random_walk, win.pos.dtype),
                jnp.full(3, cfg.gyro_random_walk, win.pos.dtype),
            ]
        ) * jnp.sqrt(dt_k)
        r_bias_w = r_bias / sig
        Jb_i_w = Jb_i / sig[:, None]
        Jb_j_w = Jb_j / sig[:, None]

        r = jnp.concatenate([r_pim_w, r_bias_w])  # (15,)
        Ji = jnp.concatenate([Jp_i_w, Jb_i_w], axis=0)  # (15, 15)
        Jj = jnp.concatenate([Jp_j_w, Jb_j_w], axis=0)
        return Ji, Jj, r

    if ks is None:
        ks = jnp.arange(1, K)
    Ji, Jj, r = jax.vmap(one)(ks)
    ok = (win.pim_valid[ks] & win.mask[ks] & win.mask[ks - 1]).astype(
        win.pos.dtype
    )
    Ji = Ji * ok[:, None, None]
    Jj = Jj * ok[:, None, None]
    r = r * ok[:, None]
    return Ji, Jj, r


def _no_motion_blocks(cfg: BackendConfig, win: Window, ks=None):
    """Zero-velocity prior + no-motion between factor at LOW_DISPARITY
    keyframes (VioBackend.cpp:363-399). Implemented as extra rows on the
    same consecutive-pair layout as the IMU factors."""
    K = cfg.nr_states
    if ks is None:
        ks = jnp.arange(1, K)
    active = (
        (win.status[ks] == STATUS_LOW_DISPARITY)
        & win.mask[ks]
        & win.mask[ks - 1]
    ).astype(win.pos.dtype)

    def one(k):
        # no-motion: identity relative pose between k-1, k
        dR = jnp.swapaxes(win.rot[k - 1], -1, -2) @ win.rot[k]
        r_rot = geo.so3_log(dR) / cfg.no_motion_rot_sigma
        r_pos = (win.pos[k] - win.pos[k - 1]) / cfg.no_motion_pos_sigma
        r_vel = win.vel[k] / cfg.zero_velocity_sigma
        # Exact Jacobians under the world-frame additive position
        # retraction (verified vs jax.jacfwd in
        # tests/test_factor_jacobians.py): dLog(Ri^T Rj)/dth_j = Jr^{-1},
        # dLog(Ri^T Rj)/dth_i = -Jr^{-1} dR^T.
        Jr = geo.so3_right_jacobian_inv(geo.so3_log(dR))
        Ji = jnp.zeros((9, S_DOF), win.pos.dtype)
        Jj = jnp.zeros((9, S_DOF), win.pos.dtype)
        Ji = Ji.at[0:3, _TH].set(-(Jr @ dR.T) / cfg.no_motion_rot_sigma)
        Jj = Jj.at[0:3, _TH].set(Jr / cfg.no_motion_rot_sigma)
        Ji = Ji.at[3:6, _P].set(-jnp.eye(3) / cfg.no_motion_pos_sigma)
        Jj = Jj.at[3:6, _P].set(jnp.eye(3) / cfg.no_motion_pos_sigma)
        Jj = Jj.at[6:9, _V].set(jnp.eye(3) / cfg.zero_velocity_sigma)
        r = jnp.concatenate([r_rot, r_pos, r_vel])
        return Ji, Jj, r

    Ji, Jj, r = jax.vmap(one)(ks)
    return Ji * active[:, None, None], Jj * active[:, None, None], r * active[:, None]


def _between_blocks(cfg, win, mR, mt, mvalid, rot_sigma, pos_sigma, ks=None):
    """Relative-pose BetweenFactor rows on consecutive keyframes: 6-dim
    residual whitened per-axis-class; shared by the external-odometry
    factors (VioBackend.cpp:402-420) and the stereo-RANSAC between factors
    (addBetweenStereoFactors, :324-336 / :974-983). An infinite sigma
    disables that residual class (the reference's precision=0)."""
    K = cfg.nr_states
    if ks is None:
        ks = jnp.arange(1, K)
    active = (mvalid[ks] & win.mask[ks] & win.mask[ks - 1]).astype(
        win.pos.dtype
    )
    w_rot = jnp.where(jnp.isfinite(rot_sigma), 1.0 / rot_sigma, 0.0)
    w_pos = jnp.where(jnp.isfinite(pos_sigma), 1.0 / pos_sigma, 0.0)

    def one(k):
        dR = jnp.swapaxes(win.rot[k - 1], -1, -2) @ win.rot[k]
        xi = geo.so3_log(jnp.swapaxes(mR[k], -1, -2) @ dR)
        r_rot = xi * w_rot
        t_rel = jnp.einsum(
            "ji,j->i", win.rot[k - 1], win.pos[k] - win.pos[k - 1]
        )
        r_pos = (t_rel - mt[k]) * w_pos
        # Exact Jacobians under the world-frame additive position
        # retraction (R <- R Exp(dth), p <- p + dp): for
        # xi = Log(mR^T Ri^T Rj),  dxi/dth_j = Jr^{-1}(xi) and
        # dxi/dth_i = -Jr^{-1}(xi) dR^T; verified against jax.jacfwd in
        # tests/test_factor_jacobians.py (which caught the earlier
        # Jr^{-1}(Log dR) form — exact only at mR == dR).
        Jr = geo.so3_right_jacobian_inv(xi)
        RiT = jnp.swapaxes(win.rot[k - 1], -1, -2)
        Ji = jnp.zeros((6, S_DOF), win.pos.dtype)
        Jj = jnp.zeros((6, S_DOF), win.pos.dtype)
        Ji = Ji.at[0:3, _TH].set(-(Jr @ dR.T) * w_rot)
        Jj = Jj.at[0:3, _TH].set(Jr * w_rot)
        Ji = Ji.at[3:6, _TH].set(geo.hat(t_rel) * w_pos)
        Ji = Ji.at[3:6, _P].set(-RiT * w_pos)
        Jj = Jj.at[3:6, _P].set(RiT * w_pos)
        r = jnp.concatenate([r_rot, r_pos])
        return Ji, Jj, r

    Ji, Jj, r = jax.vmap(one)(ks)
    return Ji * active[:, None, None], Jj * active[:, None, None], r * active[:, None]


def _ext_odom_blocks(cfg: BackendConfig, win: Window, ks=None):
    return _between_blocks(
        cfg, win, win.ext_R, win.ext_t, win.ext_valid,
        cfg.ext_odom_rot_sigma, cfg.ext_odom_pos_sigma, ks=ks,
    )


def _between_stereo_blocks(cfg: BackendConfig, win: Window, ks=None):
    return _between_blocks(
        cfg, win, win.btw_R, win.btw_t, win.btw_valid,
        cfg.between_rot_sigma, cfg.between_pos_sigma, ks=ks,
    )


def _const_vel_blocks(cfg: BackendConfig, win: Window, ks=None):
    """Constant-velocity factor v_k ~ v_{k-1}
    (VioBackend::addConstantVelocityFactor, :1322-1330). Disabled when
    constant_vel_sigma is inf."""
    K = cfg.nr_states
    if ks is None:
        ks = jnp.arange(1, K)
    w = jnp.where(jnp.isfinite(cfg.constant_vel_sigma),
                  1.0 / cfg.constant_vel_sigma, 0.0)
    active = (win.mask[ks] & win.mask[ks - 1]).astype(win.pos.dtype) * w

    def one(k):
        r = win.vel[k] - win.vel[k - 1]
        Ji = jnp.zeros((3, S_DOF), win.pos.dtype).at[:, _V].set(-jnp.eye(3))
        Jj = jnp.zeros((3, S_DOF), win.pos.dtype).at[:, _V].set(jnp.eye(3))
        return Ji, Jj, r

    Ji, Jj, r = jax.vmap(one)(ks)
    return Ji * active[:, None, None], Jj * active[:, None, None], r * active[:, None]


def _smart_factor_blocks(
    cfg: BackendConfig, win: Window, lmk: LandmarkTable, pts_fixed=None
):
    """Linearize + Schur-eliminate all smart stereo landmarks.

    Returns (H_pose (K,6,K,6), g_pose (K,6), lmk_points (L,3), lmk_ok (L,)).

    `pts_fixed=(pts, ok)` reuses a previous iteration's triangulation
    (structure-frozen relinearization): the DLT+refinement is ~half the
    solve's cost, and landmark positions move sub-mm between GN
    iterations of one keyframe update.
    """
    K, L = cfg.nr_states, cfg.max_landmarks
    # Camera poses per state.
    R_w_cam = win.rot @ cfg.R_b_cam  # (K,3,3)
    t_w_cam = win.pos + jnp.einsum("kij,j->ki", win.rot, cfg.t_b_cam)

    obs_mask = lmk.obs_mask & win.mask[None, :] & (lmk.ids >= 0)[:, None]
    if pts_fixed is not None:
        pts, ok = pts_fixed
    else:
        pts, ok, _ = triangulate_stereo_landmarks(
            R_w_cam,
            t_w_cam,
            lmk.obs_uvd,
            obs_mask,
            fx=cfg.fx,
            fy=cfg.fy,
            cx=cfg.cx,
            cy=cfg.cy,
            baseline=cfg.baseline,
            rank_tolerance=cfg.rank_tolerance,
            landmark_distance_threshold=cfg.landmark_distance_threshold,
            outlier_rejection_px=cfg.outlier_rejection_px,
            newest_idx=jnp.maximum(win.n - 1, 0),
        )
        ok = ok & (obs_mask.sum(-1) >= cfg.min_obs_for_triangulation)
    # Invalid landmarks can triangulate to garbage/NaN; 0-weight masking
    # does NOT stop NaNs (0 * NaN = NaN), so substitute a benign point
    # (5 m in front of the newest camera) before linearization.
    newest = jnp.maximum(win.n - 1, 0)
    fallback = t_w_cam[newest] + 5.0 * R_w_cam[newest][:, 2]
    safe = ok & jnp.all(jnp.isfinite(pts), axis=-1)
    pts = jnp.where(safe[:, None], pts, fallback[None])
    ok = safe

    # Residuals + ANALYTIC Jacobians:
    #   p_c = R_bc^T Exp(-dth) q - R_bc^T t_bc - R_bc^T Exp(-dth) R_wb^T dp,
    #   q = R_wb^T (p_w - p_wb)  =>  dp_c/dth = R_bc^T hat(q),
    #   dp_c/dp  = -R_wc^T,  dp_c/dpw = R_wc^T.
    #
    # TPU layout: every batched intermediate keeps (K, L) as its TRAILING
    # two axes (L = max_landmarks is a lane multiple; K pads 25->32
    # sublanes). The naive (L,K,3,3)/(L,K,3,6) layout tiles the tiny
    # trailing dims to (8,128) — a ~100x padded-memory blowup that made
    # this function ~2.2 ms of the 3.4 ms backend step; row/tangent axes
    # in front keep the padding ~1.3x.
    obs = jnp.transpose(lmk.obs_uvd, (2, 1, 0))  # (3,K,L) [uL,uR,v]
    stereo_ok = jnp.isfinite(obs[1])  # (K,L)
    obs_safe = obs.at[1].set(jnp.where(stereo_ok, obs[1], obs[0]))
    ptsT = pts.T  # (3,L)
    q = jnp.einsum(
        "kji,jkl->ikl", win.rot, ptsT[:, None, :] - win.pos.T[:, :, None]
    )  # (3,K,L)  R_wb^T (p_w - p_wb)
    pc = jnp.einsum(
        "kji,jkl->ikl", R_w_cam, ptsT[:, None, :] - t_w_cam.T[:, :, None]
    )  # (3,K,L)
    x, y, z = pc[0], pc[1], pc[2]
    safe_z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    iz = 1.0 / safe_z
    pred = jnp.stack(
        [
            cfg.fx * x * iz + cfg.cx,
            cfg.fx * (x - cfg.baseline) * iz + cfg.cx,
            cfg.fy * y * iz + cfg.cy,
        ]
    )  # (3,K,L)
    r = (pred - obs_safe) / cfg.smart_noise_sigma  # (3,K,L)
    # Projection Jacobian d[uL,uR,v]/dp_c: (3,3,K,L), rows a, cols b.
    zeros = jnp.zeros_like(z)
    Jproj = jnp.stack(
        [
            jnp.stack([cfg.fx * iz, zeros, -cfg.fx * x * iz * iz]),
            jnp.stack(
                [cfg.fx * iz, zeros, -cfg.fx * (x - cfg.baseline) * iz * iz]
            ),
            jnp.stack([zeros, cfg.fy * iz, -cfg.fy * y * iz * iz]),
        ]
    ) / cfg.smart_noise_sigma
    # hat(q): (3,3,K,L).
    q0, q1, q2 = q[0], q[1], q[2]
    hatq = jnp.stack(
        [
            jnp.stack([zeros, -q2, q1]),
            jnp.stack([q2, zeros, -q0]),
            jnp.stack([-q1, q0, zeros]),
        ]
    )
    # dp_c/dth = R_bc^T hat(q): (3,3,K,L).
    dpc_dth = jnp.einsum("jb,jmkl->bmkl", cfg.R_b_cam, hatq)
    J_th = jnp.einsum("abkl,bmkl->amkl", Jproj, dpc_dth)  # (3,3,K,L)
    # dp_c/dpw = +R_wc^T (E); dp_c/dp = -R_wc^T = -E.
    E = jnp.einsum("abkl,kbm->amkl", Jproj, jnp.swapaxes(R_w_cam, -1, -2))
    F = jnp.concatenate([J_th, -E], axis=1)  # (3,6,K,L)
    # Mono rows (NaN uR): kill the uR residual row.
    row_ok = jnp.stack(
        [jnp.ones_like(stereo_ok), stereo_ok, jnp.ones_like(stereo_ok)]
    ).astype(r.dtype)  # (3,K,L)
    r = r * row_ok
    F = F * row_ok[:, None]
    E = E * row_ok[:, None]

    # Robust m-estimator weights on the whitened 3-vector residual norm:
    # stereo observations use the stereo norm config, mono rows (NaN uR)
    # the mono norm config (BackendParams mono/stereoNormType/Param).
    rn = jnp.linalg.norm(r, axis=0)  # (K,L)
    ntype = jnp.where(stereo_ok, cfg.stereo_norm_type, cfg.mono_norm_type)
    nparam = jnp.where(stereo_ok, cfg.stereo_norm_param, cfg.mono_norm_param)
    hw = robust_weight(rn, ntype, nparam)
    w = obs_mask.T & ok[None, :]  # (K,L)
    sw = jnp.sqrt(hw) * w.astype(r.dtype)  # (K,L)
    r = r * sw
    F = F * sw
    E = E * sw

    # Schur complement per landmark.
    Hll = jnp.einsum("aikl,ajkl->ijl", E, E) + 1e-6 * jnp.eye(
        3, dtype=r.dtype
    ).reshape(3, 3, 1)  # (3,3,L)
    # Closed-form symmetric 3x3 inverse (adjugate), batched over trailing L
    # (jnp.linalg.inv would force an (L,3,3) layout back in; the reference
    # hand-unrolls its 3x3 inverses the same way, Tracker.cpp:497-542).
    # Trace-normalize first so the f32 cofactors stay near unit magnitude.
    s_ = jnp.maximum((Hll[0, 0] + Hll[1, 1] + Hll[2, 2]) / 3.0, 1e-9)
    Hll_n = Hll / s_
    a_, b_, c_ = Hll_n[0, 0], Hll_n[0, 1], Hll_n[0, 2]
    d_, e_, f_ = Hll_n[1, 1], Hll_n[1, 2], Hll_n[2, 2]
    c00 = d_ * f_ - e_ * e_
    c01 = c_ * e_ - b_ * f_
    c02 = b_ * e_ - c_ * d_
    c11 = a_ * f_ - c_ * c_
    c12 = b_ * c_ - a_ * e_
    c22 = a_ * d_ - b_ * b_
    det = a_ * c00 + b_ * c01 + c_ * c02
    idet = 1.0 / det
    Hll_inv = (
        jnp.stack(
            [
                jnp.stack([c00, c01, c02]),
                jnp.stack([c01, c11, c12]),
                jnp.stack([c02, c12, c22]),
            ]
        )
        * (idet / s_)
    )  # (3,3,L)
    Hpl = jnp.einsum("aikl,ajkl->ijkl", F, E)  # (6,3,K,L)
    gl = jnp.einsum("aikl,akl->il", E, r)  # (3,L)

    # Pose-pose contributions.
    H_diag = jnp.einsum("aikl,ajkl->kij", F, F)  # (K,6,6) diagonal part
    T = jnp.einsum("ijkl,jml->imkl", Hpl, Hll_inv)  # (6,3,K,L)
    H_schur = jnp.einsum("imkl,jmql->kiqj", T, Hpl)  # (K,6,K,6)
    H_pose = -H_schur
    H_pose = H_pose.at[jnp.arange(K), :, jnp.arange(K), :].add(H_diag)
    g_pose = jnp.einsum("aikl,akl->ki", F, r) - jnp.einsum(
        "imkl,ml->ki", T, gl
    )
    return H_pose, g_pose, pts, ok


def _prior_blocks(cfg: BackendConfig, win: Window):
    """Marginal-prior contribution: H += Lambda, grad += Lambda*dx - g."""
    dx = local_coords(
        win.rot, win.pos, win.vel, win.bias,
        win.prior_rot, win.prior_pos, win.prior_vel, win.prior_bias,
    ).reshape(-1)
    grad = win.prior_H @ dx - win.prior_g
    return win.prior_H, grad


# ---------------------------------------------------------------------------
# Assembly + solve
# ---------------------------------------------------------------------------


def _assemble(cfg: BackendConfig, win: Window, lmk: LandmarkTable, pts_fixed=None):
    """Build the full (D,D) GN system at the current estimates."""
    K = cfg.nr_states
    D = K * S_DOF
    H = jnp.zeros((K, S_DOF, K, S_DOF), win.pos.dtype)
    g = jnp.zeros((K, S_DOF), win.pos.dtype)

    # Smart factors (pose block only: rows 0:6 of the state tangent).
    H_pose, g_pose, pts, lmk_ok = _smart_factor_blocks(cfg, win, lmk, pts_fixed)
    H = H.at[:, 0:6, :, 0:6].add(H_pose)
    g = g.at[:, 0:6].add(g_pose)

    # IMU + bias factors, no-motion and external-odometry factors share
    # the consecutive-pair layout.
    for blocks in (
        _imu_factor_blocks(cfg, win),
        _no_motion_blocks(cfg, win),
        _ext_odom_blocks(cfg, win),
        _between_stereo_blocks(cfg, win),
        _const_vel_blocks(cfg, win),
    ):
        Ji, Jj, r = blocks  # (K-1, rdim, 15) x2, (K-1, rdim)
        i_idx = jnp.arange(K - 1)
        j_idx = i_idx + 1
        H = H.at[i_idx, :, i_idx, :].add(jnp.einsum("kri,krj->kij", Ji, Ji))
        H = H.at[j_idx, :, j_idx, :].add(jnp.einsum("kri,krj->kij", Jj, Jj))
        Hij = jnp.einsum("kri,krj->kij", Ji, Jj)
        H = H.at[i_idx, :, j_idx, :].add(Hij)
        H = H.at[j_idx, :, i_idx, :].add(jnp.swapaxes(Hij, -1, -2))
        g = g.at[i_idx].add(jnp.einsum("kri,kr->ki", Ji, r))
        g = g.at[j_idx].add(jnp.einsum("kri,kr->ki", Jj, r))

    H = H.reshape(D, D)
    g = g.reshape(D)

    Hp, gp = _prior_blocks(cfg, win)
    H = H + Hp
    g = g + gp

    # Inactive state slots: pin with identity to keep the system SPD.
    inactive = (~win.mask).astype(win.pos.dtype)
    pin = jnp.repeat(inactive, S_DOF)
    H = H + jnp.diag(pin)
    return H, g, pts, lmk_ok


def _gn_solve(cfg: BackendConfig, win: Window, lmk: LandmarkTable):
    """Run cfg.gn_iters Gauss-Newton iterations in place.

    Failure detection & recovery (reference VioBackend::updateSmoother's
    backup-and-recover, VioBackend.cpp:1407-1497): non-finite factor blocks
    (the IndeterminantLinearSystem analog at f32) are zeroed, and if the
    Cholesky solve still produces a non-finite step the system is re-solved
    with heavy Levenberg damping plus a fresh prior pinning the NEWEST state
    at its PIM-predicted guess — the same "add priors at the failing key and
    retry" recipe. A still-bad step is rejected entirely (delta = 0), which
    keeps the window finite no matter what the measurement batch contained.
    Returns the per-call count of recovered iterations for observability.

    Iterations after the first relinearize around the updated states with
    the FIRST iteration's triangulation (structure-frozen — the
    triangulation is ~half the per-iteration cost and moves sub-mm
    between iterations; the reference's numOptimize extra iterations
    re-linearize inside iSAM2's cached Bayes tree similarly cheaply)."""

    def body(win, n_recovered, pts_fixed):
        H, g, pts, lmk_ok = _assemble(cfg, win, lmk, pts_fixed)
        D = H.shape[0]
        # Sanitize: one garbage measurement batch must not poison the
        # whole window (0-weight masking does not stop NaNs).
        finite_in = jnp.all(jnp.isfinite(H)) & jnp.all(jnp.isfinite(g))
        H = jnp.where(jnp.isfinite(H), H, 0.0)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        # Jacobi-preconditioned Cholesky: prior information spans ~1e6..1e0
        # across DoF, beyond raw f32 Cholesky's comfort. Scale to unit
        # diagonal, solve, unscale — standard normal-equation equilibration.
        H = 0.5 * (H + H.T)
        d = jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-12))
        dinv = 1.0 / d
        Hs = H * dinv[:, None] * dinv[None, :]

        def solve(damping):
            A = Hs + damping * jnp.eye(D, dtype=H.dtype)
            L = jnp.linalg.cholesky(A)
            y = -jax.scipy.linalg.cho_solve((L, True), g * dinv)
            return y * dinv

        delta = solve(jnp.float32(1e-5))
        bad = ~(jnp.all(jnp.isfinite(delta)) & finite_in)

        def recover(_):
            # Fresh prior at the newest state + heavy damping, then retry.
            newest = jnp.maximum(win.n - 1, 0)
            pin = jnp.zeros((cfg.nr_states,), H.dtype).at[newest].set(1.0)
            extra = jnp.repeat(pin, S_DOF)
            A = (
                Hs
                + jnp.float32(1e-2) * jnp.eye(D, dtype=H.dtype)
                + jnp.diag(extra)
            )
            L = jnp.linalg.cholesky(A)
            y = -jax.scipy.linalg.cho_solve((L, True), g * dinv)
            return y * dinv

        delta = jax.lax.cond(bad, recover, lambda _: delta, None)
        # Last resort: reject the step (keep the PIM-predicted window).
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        delta = delta.reshape(cfg.nr_states, S_DOF) * win.mask[:, None]
        rot, pos, vel, bias = retract_states(
            win.rot, win.pos, win.vel, win.bias, delta
        )
        win = win.replace(rot=rot, pos=pos, vel=vel, bias=bias)
        return win, n_recovered + bad.astype(jnp.int32), (pts, lmk_ok)

    # Unrolled (gn_iters is static): only the first iteration triangulates.
    n_recovered = jnp.int32(0)
    pts_fixed = None
    pts, lmk_ok = None, None
    for _ in range(cfg.gn_iters):
        win, n_recovered, (pts, lmk_ok) = body(win, n_recovered, pts_fixed)
        pts_fixed = (pts, lmk_ok)
    return win, (pts, lmk_ok), n_recovered


# ---------------------------------------------------------------------------
# Marginalization & shift
# ---------------------------------------------------------------------------


def _marginalize_oldest(cfg: BackendConfig, win: Window) -> Window:
    """Schur-eliminate state 0 into the prior and shift the window left.

    The eliminated system contains: the current prior + the IMU/bias factor
    between states 0 and 1 (+ no-motion factors on that pair). Landmark
    observations in state 0 are dropped (reference drops out-of-horizon
    smart factors, VioBackend.cpp:1095-1104)."""
    K = cfg.nr_states
    D = K * S_DOF
    H = jnp.zeros((K, S_DOF, K, S_DOF), win.pos.dtype)
    g = jnp.zeros((K, S_DOF), win.pos.dtype)
    # Only the pair (0,1) participates — linearize just that pair
    # (ks=[1]) instead of all K-1 pairs.
    k0 = jnp.arange(1, 2)
    for blocks in (
        _imu_factor_blocks(cfg, win, ks=k0),
        _no_motion_blocks(cfg, win, ks=k0),
        _ext_odom_blocks(cfg, win, ks=k0),
        _between_stereo_blocks(cfg, win, ks=k0),
        _const_vel_blocks(cfg, win, ks=k0),
    ):
        Ji, Jj, r = blocks
        Ji0, Jj0, r0 = Ji[0], Jj[0], r[0]
        H = H.at[0, :, 0, :].add(Ji0.T @ Ji0)
        H = H.at[1, :, 1, :].add(Jj0.T @ Jj0)
        H01 = Ji0.T @ Jj0
        H = H.at[0, :, 1, :].add(H01)
        H = H.at[1, :, 0, :].add(H01.T)
        g = g.at[0].add(Ji0.T @ r0)
        g = g.at[1].add(Jj0.T @ r0)
    H = H.reshape(D, D)
    g = g.reshape(D)
    Hp, gp = _prior_blocks(cfg, win)
    H = H + Hp
    # Convert gradient to the "eta" convention: prior cost gradient at the
    # current lin point is (Hp dx - g_p); here states == lin point after we
    # reset below, so we track the gradient directly.
    g = g + gp

    # Schur-eliminate the first S_DOF block.
    d = S_DOF
    H00 = H[:d, :d] + 1e-8 * jnp.eye(d, dtype=H.dtype)
    H01 = H[:d, d:]
    H11 = H[d:, d:]
    sol = jnp.linalg.solve(H00, jnp.concatenate([H01, g[:d, None]], axis=1))
    X = sol[:, :-1]
    y = sol[:, -1]
    Lam = H11 - H01.T @ X
    Lam = 0.5 * (Lam + Lam.T)
    eta = g[d:] - H01.T @ y  # gradient on remaining states

    # Place the reduced prior into slots 0..K-2 of a fresh (D,D).
    newH = jnp.zeros((D, D), H.dtype).at[: D - d, : D - d].set(Lam)
    newg = jnp.zeros((D,), H.dtype).at[: D - d].set(-eta)

    shift = lambda a: jnp.roll(a, -1, axis=0)
    win = win.replace(
        rot=shift(win.rot),
        pos=shift(win.pos),
        vel=shift(win.vel),
        bias=shift(win.bias),
        stamp=shift(win.stamp),
        mask=shift(win.mask).at[K - 1].set(False),
        status=shift(win.status),
        ext_R=shift(win.ext_R),
        ext_t=shift(win.ext_t),
        ext_valid=shift(win.ext_valid).at[K - 1].set(False),
        btw_R=shift(win.btw_R),
        btw_t=shift(win.btw_t),
        btw_valid=shift(win.btw_valid).at[K - 1].set(False),
        pim=jax.tree.map(lambda x: jnp.roll(x, -1, axis=0), win.pim),
        pim_valid=shift(win.pim_valid).at[K - 1].set(False),
        n=win.n - 1,
        prior_H=newH,
        prior_g=newg,
        prior_rot=shift(win.rot),
        prior_pos=shift(win.pos),
        prior_vel=shift(win.vel),
        prior_bias=shift(win.bias),
    )
    return win


# ---------------------------------------------------------------------------
# Landmark table maintenance
# ---------------------------------------------------------------------------


def update_landmarks(
    lmk: LandmarkTable,
    meas_ids: jax.Array,  # (N,)
    meas_uvd: jax.Array,  # (N,3)
    meas_mask: jax.Array,  # (N,)
    slot: jax.Array,  # scalar: window slot of this keyframe
) -> LandmarkTable:
    """Insert this keyframe's stereo measurements into the track table."""
    L = lmk.ids.shape[0]
    N = meas_ids.shape[0]
    # Match measurements to existing rows.
    eq = (lmk.ids[:, None] == meas_ids[None, :]) & meas_mask[None, :] & (
        lmk.ids >= 0
    )[:, None]
    row_of_meas = jnp.argmax(eq, axis=0)  # (N,)
    found = eq.any(axis=0)

    # Assign unmatched measurements to free rows, oldest-free first.
    free = lmk.ids < 0
    new_meas = meas_mask & ~found
    free_rows = jnp.argsort(~free)  # free rows first (stable)
    new_rank = jnp.cumsum(new_meas) - 1  # rank among new measurements
    target_row = free_rows[jnp.clip(new_rank, 0, L - 1)]
    # Drop new measurements beyond capacity.
    capacity_ok = new_rank < free.sum()
    new_meas = new_meas & capacity_ok

    rows = jnp.where(new_meas, target_row, row_of_meas)
    write = meas_mask & (found | new_meas)
    # Non-writes are parked at an out-of-bounds row: JAX scatter updates
    # drop out-of-bounds indices, so these vanish without read-modify races.
    rows_safe = jnp.where(write, rows, L)

    ids = lmk.ids.at[rows_safe].set(meas_ids, mode="drop")
    obs_uvd = lmk.obs_uvd.at[rows_safe, slot].set(meas_uvd, mode="drop")
    obs_mask = lmk.obs_mask.at[rows_safe, slot].set(True, mode="drop")
    return lmk.replace(ids=ids, obs_uvd=obs_uvd, obs_mask=obs_mask)


def shift_landmarks(lmk: LandmarkTable) -> LandmarkTable:
    """Drop observations of the state leaving the window; free dead rows."""
    obs_uvd = jnp.roll(lmk.obs_uvd, -1, axis=1)
    obs_mask = jnp.roll(lmk.obs_mask, -1, axis=1).at[:, -1].set(False)
    alive = obs_mask.any(axis=1)
    ids = jnp.where(alive, lmk.ids, -1)
    return lmk.replace(
        ids=ids, obs_uvd=obs_uvd, obs_mask=obs_mask,
        pts_ok=lmk.pts_ok & alive,
    )


# ---------------------------------------------------------------------------
# Public stepping API
# ---------------------------------------------------------------------------


def bootstrap(
    cfg: BackendConfig,
    win: Window,
    nav: NavState,
    bias: jax.Array,  # (6,)
    stamp: jax.Array,
    vel_sigma: float | None = None,
) -> Window:
    """Install the first keyframe state with initial priors
    (reference initStateAndSetPriors, VioBackend.h:143-194).

    `vel_sigma` overrides cfg.init_vel_sigma: the online-initialization
    collection phase (autoInitialize: 2) bootstraps with a crude
    zero-velocity GUESS whose true value is unknown until the
    visual-inertial alignment solves for it — a loose prior there keeps
    the tight config sigma (meant for known-state init) from pinning the
    whole IMU chain at rest (the reference never runs its backend before
    the alignment, so it never faces this state)."""
    K = cfg.nr_states
    win = win.replace(
        rot=win.rot.at[0].set(nav.rot),
        pos=win.pos.at[0].set(nav.pos),
        vel=win.vel.at[0].set(nav.vel),
        bias=win.bias.at[0].set(bias),
        stamp=win.stamp.at[0].set(stamp),
        mask=win.mask.at[0].set(True),
        out_rot=nav.rot,
        out_pos=nav.pos,
        n=jnp.int32(1),
    )
    # Initial prior information on state 0. Sigmas are clamped to 1e-3
    # (info <= 1e6): the reference's 1e-5 sigmas are double-precision GTSAM
    # values; at f32 they would swamp the normal equations without
    # changing the estimate (the prior is still overwhelmingly dominant).
    clamp = lambda s: jnp.maximum(s, 1e-3)
    Info_rot_w = jnp.diag(
        jnp.stack(
            [
                1.0 / clamp(cfg.init_rp_sigma) ** 2,
                1.0 / clamp(cfg.init_rp_sigma) ** 2,
                1.0 / clamp(cfg.init_yaw_sigma) ** 2,
            ]
        )
    )
    R0 = nav.rot
    Info_rot_b = R0.T @ Info_rot_w @ R0
    blocks = [
        Info_rot_b,
        jnp.eye(3) / clamp(cfg.init_pos_sigma) ** 2,
        jnp.eye(3)
        / clamp(
            cfg.init_vel_sigma if vel_sigma is None else jnp.float32(vel_sigma)
        )
        ** 2,
        jnp.eye(3) / clamp(cfg.init_ba_sigma) ** 2,
        jnp.eye(3) / clamp(cfg.init_bg_sigma) ** 2,
    ]
    P0 = jax.scipy.linalg.block_diag(*blocks)
    prior_H = win.prior_H.at[:S_DOF, :S_DOF].set(P0.astype(win.pos.dtype))
    win = win.replace(
        prior_H=prior_H,
        prior_g=jnp.zeros_like(win.prior_g),
        prior_rot=win.rot,
        prior_pos=win.pos,
        prior_vel=win.vel,
        prior_bias=win.bias,
    )
    return win


def backend_step(
    cfg: BackendConfig,
    win: Window,
    lmk: LandmarkTable,
    *,
    pim: Pim,
    stamp: jax.Array,
    meas_ids: jax.Array,
    meas_uvd: jax.Array,
    meas_mask: jax.Array,
    status: jax.Array,
    ext_R_rel: jax.Array | None = None,
    ext_t_rel: jax.Array | None = None,
    ext_valid=None,
    btw_R_rel: jax.Array | None = None,
    btw_t_rel: jax.Array | None = None,
    btw_valid=None,
    guess_R: jax.Array | None = None,
    guess_t: jax.Array | None = None,
    guess_valid=None,
    odom_R_abs: jax.Array | None = None,
    odom_t_abs: jax.Array | None = None,
    odom_valid_abs=None,
):
    """One keyframe update: predict-insert state, add measurements,
    optimize, marginalize if the window is full. `ext_*` optionally attach
    an external-odometry relative-pose measurement (last keyframe -> this
    one; reference addBetweenFactor from external odom).

    The jittable core of VioBackend::addVisualInertialStateAndOptimize +
    optimize (VioBackend.cpp:296-428, 1036-1250). Returns
    (win, lmk, outputs dict)."""
    K = cfg.nr_states
    full = win.n >= K

    def do_shift(args):
        w, l = args
        return _marginalize_oldest(cfg, w), shift_landmarks(l)

    win, lmk = jax.lax.cond(full, do_shift, lambda a: a, (win, lmk))
    slot = jnp.minimum(win.n, K - 1)

    # PIM-predicted initial guess from the previous newest state
    # (pose_guess_source IMU, VioBackend.cpp:797-891).
    prev = jnp.maximum(slot - 1, 0)
    from kimera_vio_tpu.frontend.imu_frontend import pim_predict

    prev_nav = NavState(rot=win.rot[prev], pos=win.pos[prev], vel=win.vel[prev])
    prev_bias = ImuBias(accel=win.bias[prev, 0:3], gyro=win.bias[prev, 3:6])
    guess = pim_predict(pim, prev_nav, prev_bias, cfg.n_gravity)
    # Alternative pose-guess source (pose_guess_source MONO/STEREO/PNP,
    # addStateValues, VioBackend.cpp:797-891): override the PIM-predicted
    # pose with the tracker-derived one; velocity stays PIM-predicted.
    if guess_R is not None:
        use = jnp.bool_(True) if guess_valid is None else guess_valid
        guess = guess.replace(
            rot=jnp.where(use, guess_R, guess.rot),
            pos=jnp.where(use, guess_t, guess.pos),
        )

    # Absolute external-odometry input: form the keyframe-relative pose
    # against the previous keyframe's stored odometry pose (reference
    # VisionImuFrontend::getExternalOdometryRelativeBodyPose,
    # VisionImuFrontend.cpp:240-302).
    if odom_R_abs is not None:
        ov = jnp.bool_(True) if odom_valid_abs is None else odom_valid_abs
        ext_R_rel = jnp.swapaxes(win.odom_R, -1, -2) @ odom_R_abs
        ext_t_rel = jnp.einsum("ji,j->i", win.odom_R, odom_t_abs - win.odom_t)
        ext_valid = win.odom_valid & ov
        win = win.replace(
            odom_R=jnp.where(ov, odom_R_abs, win.odom_R),
            odom_t=jnp.where(ov, odom_t_abs, win.odom_t),
            odom_valid=win.odom_valid | ov,
        )

    win = win.replace(
        rot=win.rot.at[slot].set(guess.rot),
        pos=win.pos.at[slot].set(guess.pos),
        vel=win.vel.at[slot].set(guess.vel),
        bias=win.bias.at[slot].set(win.bias[prev]),
        stamp=win.stamp.at[slot].set(stamp),
        mask=win.mask.at[slot].set(True),
        status=win.status.at[slot].set(status),
        pim=jax.tree.map(
            lambda all_, new: all_.at[slot].set(new), win.pim, pim
        ),
        pim_valid=win.pim_valid.at[slot].set(slot > 0),
        ext_R=(
            win.ext_R.at[slot].set(ext_R_rel)
            if ext_R_rel is not None
            else win.ext_R
        ),
        ext_t=(
            win.ext_t.at[slot].set(ext_t_rel)
            if ext_t_rel is not None
            else win.ext_t
        ),
        ext_valid=(
            win.ext_valid.at[slot].set((slot > 0) & ext_valid)
            if ext_valid is not None
            else win.ext_valid.at[slot].set(False)
        ),
        btw_R=(
            win.btw_R.at[slot].set(btw_R_rel)
            if btw_R_rel is not None
            else win.btw_R
        ),
        btw_t=(
            win.btw_t.at[slot].set(btw_t_rel)
            if btw_t_rel is not None
            else win.btw_t
        ),
        btw_valid=(
            win.btw_valid.at[slot].set((slot > 0) & btw_valid)
            if btw_valid is not None
            else win.btw_valid.at[slot].set(False)
        ),
        n=jnp.minimum(win.n + 1, K),
    )
    lmk = update_landmarks(lmk, meas_ids, meas_uvd, meas_mask, slot)

    win, (pts, lmk_ok), n_recovered = _gn_solve(cfg, win, lmk)
    # Export the triangulated landmark map into the table for PnP tracking
    # (getMapLmkIdsTo3dPointsInTimeHorizon -> Tracker landmark map,
    # VioBackend.cpp:550-704 / Tracker.cpp:1076-1080).
    lmk = lmk.replace(pts=pts, pts_ok=lmk_ok)

    # Dual pose outputs (VioBackend.cpp:1348-1373): the smoothed newest pose
    # AND an increment-chained pose — previous published pose composed with
    # the smoothed relative motion of the last two states.
    prev2 = jnp.maximum(slot - 1, 0)
    rel_R = jnp.swapaxes(win.rot[prev2], -1, -2) @ win.rot[slot]
    rel_t = jnp.einsum(
        "ji,j->i", win.rot[prev2], win.pos[slot] - win.pos[prev2]
    )
    inc_rot = jnp.where(slot > 0, win.out_rot @ rel_R, win.rot[slot])
    inc_pos = jnp.where(
        slot > 0, win.out_pos + win.out_rot @ rel_t, win.pos[slot]
    )
    win = win.replace(out_rot=inc_rot, out_pos=inc_pos)

    outputs = {
        "rot": win.rot[slot],
        "pos": win.pos[slot],
        "vel": win.vel[slot],
        "bias": win.bias[slot],
        "rot_inc": inc_rot,
        "pos_inc": inc_pos,
        "stamp": stamp,
        "slot": slot,
        "lmk_points": pts,
        "lmk_valid": lmk_ok,
        "lmk_ids": lmk.ids,
        # Count of solver iterations that needed the failure-recovery path
        # (reference updateSmoother backup-and-recover analog).
        "n_recovered": n_recovered,
    }
    return win, lmk, outputs


def state_covariance(
    cfg: BackendConfig, win: Window, lmk: LandmarkTable,
    return_ok: bool = False,
):
    """Marginal covariance of the newest state (15x15): invert the full
    window information onto the newest block (reference
    VioBackend::computeStateCovariance, :708-723 — gtsam marginals on
    the joint pose/velocity/bias). Jittable; call on demand.

    `return_ok=True` additionally returns a health flag: the assembly
    reuses the robust weights at the CURRENT estimate without the
    solver's recovery path, so on a sick window (non-finite rows, a
    non-PD Hessian after equilibration, or a non-finite/non-positive
    covariance diagonal) the numbers are meaningless — consumers
    (e.g. a ROS odometry-covariance publisher) must check the flag."""
    K = cfg.nr_states
    D = K * S_DOF
    H, g, _, _ = _assemble(cfg, win, lmk)
    # Jacobi equilibration, as in _gn_solve: the window information spans
    # many orders of magnitude, beyond raw f32 solves.
    H = 0.5 * (H + H.T)
    d = jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-12))
    dinv = 1.0 / d
    Hs = H * dinv[:, None] * dinv[None, :] + 1e-6 * jnp.eye(D, dtype=H.dtype)
    newest = jnp.maximum(win.n - 1, 0)
    rows = newest * S_DOF + jnp.arange(S_DOF)
    E = jnp.zeros((D, S_DOF), H.dtype)
    E = E.at[rows, jnp.arange(S_DOF)].set(1.0)
    Hs = jnp.where(jnp.isfinite(Hs), Hs, 0.0)
    Lc = jnp.linalg.cholesky(Hs)
    X = jax.scipy.linalg.cho_solve((Lc, True), E * dinv[:, None])
    cov = (X * dinv[:, None])[rows, :]  # (15,15) marginal block
    cov = 0.5 * (cov + cov.T)
    if not return_ok:
        return cov
    var = jnp.diagonal(cov)
    ok = (
        jnp.isfinite(H).all()
        & jnp.isfinite(Lc).all()  # NaN Cholesky = not positive definite
        & jnp.isfinite(cov).all()
        & (var > 0).all()
    )
    return cov, ok
