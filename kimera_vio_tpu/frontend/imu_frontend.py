"""On-manifold IMU preintegration (Forster et al., TRO 2017) as a lax.scan.

TPU-native replacement of the reference's GTSAM-backed `ImuFrontend`
(reference src/imu-frontend/ImuFrontend.cpp:158-197, which loops
`integrateMeasurement(acc, gyro, dt)` over a 6xN block). Here the whole
block integrates in one fused `lax.scan` over a fixed-capacity, masked
`ImuBlock`, carrying:

  * DeltaR (3,3), delta_v (3,), delta_p (3,) — the preintegrated motion,
  * 9x9 preintegration covariance (order: [dtheta, dv, dp]),
  * bias Jacobians dR/dbg (3,3), dv/dba, dv/dbg, dp/dba, dp/dbg,
  * delta_t total integration time.

Supports both reference preintegration flavors
(`ImuPreintegrationType` 0=Combined, 1=ImuFactor — ImuFrontend.cpp:68-121):
the plain flavor (the default in every shipped param tree) carries the 9x9
covariance and leaves the bias-random-walk between-factor to the backend
(as GTSAM does); the `Combined` flavor's joint 15x15 covariance is
assembled in closed form from the 9x9 + the bias Jacobians
(`combined_cov15` below) — equal to GTSAM's step-wise joint propagation to
first order in the bias random walk — and the backend then whitens one
15-dim residual instead of adding a separate bias factor.

Everything is branch-free: padded samples carry dt=0 / mask=False and
contribute exactly nothing (exp(0)=I), so one compiled scan serves any
actual number of measurements.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from kimera_vio_tpu.common import geometry as geo
from kimera_vio_tpu.common.types import ImuBias, ImuBlock, NavState


@struct.dataclass
class PimParams:
    """Device-side preintegration noise parameters (from ImuParams YAML)."""

    gyro_noise_density: jax.Array  # scalar
    acc_noise_density: jax.Array
    integration_sigma: jax.Array
    gyro_random_walk: jax.Array
    acc_random_walk: jax.Array
    n_gravity: jax.Array  # (3,)

    @classmethod
    def from_params(cls, imu_params) -> "PimParams":
        f = lambda x: jnp.asarray(x, jnp.float32)
        return cls(
            gyro_noise_density=f(imu_params.gyro_noise_density),
            acc_noise_density=f(imu_params.acc_noise_density),
            integration_sigma=f(imu_params.imu_integration_sigma),
            gyro_random_walk=f(imu_params.gyro_random_walk),
            acc_random_walk=f(imu_params.acc_random_walk),
            n_gravity=f(imu_params.n_gravity),
        )


@struct.dataclass
class Pim:
    """Preintegrated IMU measurements between two (key)frames."""

    delta_R: jax.Array  # (3,3)
    delta_v: jax.Array  # (3,)
    delta_p: jax.Array  # (3,)
    delta_t: jax.Array  # scalar
    cov: jax.Array  # (9,9) [dtheta, dv, dp]
    # Bias Jacobians (first-order correction terms, Forster eq. 44).
    dR_dbg: jax.Array  # (3,3)
    dv_dba: jax.Array  # (3,3)
    dv_dbg: jax.Array  # (3,3)
    dp_dba: jax.Array  # (3,3)
    dp_dbg: jax.Array  # (3,3)
    bias_hat: ImuBias  # bias used during integration

    @classmethod
    def zero(cls, bias: ImuBias | None = None, dtype=jnp.float32) -> "Pim":
        z33 = jnp.zeros((3, 3), dtype)
        return cls(
            delta_R=jnp.eye(3, dtype=dtype),
            delta_v=jnp.zeros(3, dtype),
            delta_p=jnp.zeros(3, dtype),
            delta_t=jnp.zeros((), dtype),
            cov=jnp.zeros((9, 9), dtype),
            dR_dbg=z33,
            dv_dba=z33,
            dv_dbg=z33,
            dp_dba=z33,
            dp_dbg=z33,
            bias_hat=bias if bias is not None else ImuBias.zero(dtype),
        )


def _integrate_step(params: PimParams, carry: Pim, sample) -> tuple[Pim, None]:
    """One Forster preintegration step (corrected measurement, dt)."""
    acc, gyr, dt = sample
    pim = carry
    a = acc - pim.bias_hat.accel
    w = gyr - pim.bias_hat.gyro

    dR_inc = geo.so3_exp(w * dt)
    Jr = geo.so3_right_jacobian(w * dt)
    R_k = pim.delta_R  # DeltaR up to (not incl.) this sample
    Ra = (R_k @ a[..., None])[..., 0]

    new_delta_p = pim.delta_p + pim.delta_v * dt + 0.5 * Ra * dt * dt
    new_delta_v = pim.delta_v + Ra * dt
    new_delta_R = R_k @ dR_inc

    # --- covariance propagation (Forster eq. 63): state [dtheta, dv, dp] ---
    A = jnp.zeros((9, 9), pim.cov.dtype)
    A = A.at[0:3, 0:3].set(dR_inc.T)
    Rhat_a = R_k @ geo.hat(a)  # = hat(R a) R (Forster eq. 63: -DR hat(a) dt)
    A = A.at[3:6, 0:3].set(-Rhat_a * dt)
    A = A.at[6:9, 0:3].set(-0.5 * Rhat_a * dt * dt)
    A = A.at[3:6, 3:6].set(jnp.eye(3))
    A = A.at[6:9, 3:6].set(jnp.eye(3) * dt)
    A = A.at[6:9, 6:9].set(jnp.eye(3))

    # Continuous-time white noise -> discrete: sigma^2 / dt on the measurement,
    # mapped through the measurement Jacobians (B matrices).
    safe_dt = jnp.maximum(dt, 1e-12)
    gyro_cov = (params.gyro_noise_density**2 / safe_dt) * jnp.eye(3)
    acc_cov = (params.acc_noise_density**2 / safe_dt) * jnp.eye(3)
    int_cov = (params.integration_sigma**2 * safe_dt) * jnp.eye(3)

    Bg = jnp.zeros((9, 3), pim.cov.dtype).at[0:3, :].set(Jr * dt)
    Ba = (
        jnp.zeros((9, 3), pim.cov.dtype)
        .at[3:6, :]
        .set(R_k * dt)
        .at[6:9, :]
        .set(0.5 * R_k * dt * dt)
    )
    new_cov = (
        A @ pim.cov @ A.T
        + Bg @ gyro_cov @ Bg.T
        + Ba @ acc_cov @ Ba.T
    )
    # Integration noise on position (GTSAM's integrationCovariance).
    new_cov = new_cov.at[6:9, 6:9].add(int_cov)

    # --- bias Jacobians (Forster eq. 44 supplementary) ---
    # Right-perturbation convention: R_k(bg+dbg) ~= R_k Exp(dR_dbg dbg), so
    # d(R_k a)/dbg = -R_k hat(a) dR_dbg (NOT -hat(R_k a) dR_dbg).
    new_dp_dba = pim.dp_dba + pim.dv_dba * dt - 0.5 * R_k * dt * dt
    new_dp_dbg = pim.dp_dbg + pim.dv_dbg * dt - 0.5 * Rhat_a @ pim.dR_dbg * dt * dt
    new_dv_dba = pim.dv_dba - R_k * dt
    new_dv_dbg = pim.dv_dbg - Rhat_a @ pim.dR_dbg * dt
    new_dR_dbg = dR_inc.T @ pim.dR_dbg - Jr * dt

    # Masked (dt == 0) samples must be exact no-ops.
    valid = dt > 0.0

    def sel(new, old):
        return jnp.where(valid, new, old)

    out = Pim(
        delta_R=sel(new_delta_R, pim.delta_R),
        delta_v=sel(new_delta_v, pim.delta_v),
        delta_p=sel(new_delta_p, pim.delta_p),
        delta_t=sel(pim.delta_t + dt, pim.delta_t),
        cov=sel(new_cov, pim.cov),
        dR_dbg=sel(new_dR_dbg, pim.dR_dbg),
        dv_dba=sel(new_dv_dba, pim.dv_dba),
        dv_dbg=sel(new_dv_dbg, pim.dv_dbg),
        dp_dba=sel(new_dp_dba, pim.dp_dba),
        dp_dbg=sel(new_dp_dbg, pim.dp_dbg),
        bias_hat=pim.bias_hat,
    )
    return out, None


def preintegrate_sequential(
    params: PimParams,
    block: ImuBlock,
    bias: ImuBias,
    init: Pim | None = None,
) -> Pim:
    """Reference-shaped sequential preintegration (lax.scan over samples).
    Kept as the semantic oracle for `preintegrate` (see tests)."""
    pim0 = init if init is not None else Pim.zero(bias)
    dt = jnp.where(block.mask, block.dt, 0.0)
    pim, _ = jax.lax.scan(
        partial(_integrate_step, params), pim0, (block.acc, block.gyr, dt)
    )
    return pim


def _compose_pim(params: PimParams, p1: Pim, p2: Pim) -> Pim:
    """Compose two consecutive preintegrations (same bias_hat): the result
    equals integrating both sample blocks in order. Used to continue the
    inter-keyframe accumulation across frames."""
    R1, v1, pp1, t1 = p1.delta_R, p1.delta_v, p1.delta_p, p1.delta_t
    R2, v2, pp2, t2 = p2.delta_R, p2.delta_v, p2.delta_p, p2.delta_t
    delta_R = R1 @ R2
    delta_v = v1 + (R1 @ v2[..., None])[..., 0]
    delta_p = pp1 + v1 * t2 + (R1 @ pp2[..., None])[..., 0]
    # Covariance: with right-perturbation errors (X~ = X Exp(e) / x + e):
    #   dtheta = R2^T dtheta1 + dtheta2
    #   dv     = dv1 - R1 hat(v2) dtheta1 + R1 dv2
    #   dp     = dp1 + dv1 t2 - R1 hat(p2) dtheta1 + R1 dp2
    eye3 = jnp.eye(3, dtype=R1.dtype)
    A = jnp.zeros((9, 9), R1.dtype)
    A = A.at[0:3, 0:3].set(R2.T)
    A = A.at[3:6, 0:3].set(-R1 @ geo.hat(v2))
    A = A.at[3:6, 3:6].set(eye3)
    A = A.at[6:9, 0:3].set(-R1 @ geo.hat(pp2))
    A = A.at[6:9, 3:6].set(eye3 * t2)
    A = A.at[6:9, 6:9].set(eye3)
    B1 = jnp.zeros((9, 9), R1.dtype)
    B1 = B1.at[0:3, 0:3].set(eye3)
    B1 = B1.at[3:6, 3:6].set(R1)
    B1 = B1.at[6:9, 6:9].set(R1)
    cov = A @ p1.cov @ A.T + B1 @ p2.cov @ B1.T
    # Bias Jacobians compose exactly (chain rule on the three equations):
    dR_dbg = R2.T @ p1.dR_dbg + p2.dR_dbg
    dv_dba = p1.dv_dba + R1 @ p2.dv_dba
    dv_dbg = (
        p1.dv_dbg
        - R1 @ geo.hat(v2) @ p1.dR_dbg
        + R1 @ p2.dv_dbg
    )
    dp_dba = p1.dp_dba + p1.dv_dba * t2 + R1 @ p2.dp_dba
    dp_dbg = (
        p1.dp_dbg
        + p1.dv_dbg * t2
        - R1 @ geo.hat(pp2) @ p1.dR_dbg
        + R1 @ p2.dp_dbg
    )
    return Pim(
        delta_R=delta_R,
        delta_v=delta_v,
        delta_p=delta_p,
        delta_t=t1 + t2,
        cov=cov,
        dR_dbg=dR_dbg,
        dv_dba=dv_dba,
        dv_dbg=dv_dbg,
        dp_dba=dp_dba,
        dp_dbg=dp_dbg,
        bias_hat=p1.bias_hat,
    )


def preintegrate_parallel(
    params: PimParams, block: ImuBlock, bias: ImuBias
) -> Pim:
    """Log-depth preintegration of one block — the TPU-native formulation.

    The sequential Forster recursion is restructured into
      * prefix rotation products via `lax.associative_scan` (log depth),
      * closed-form reordered sums for delta_v / delta_p and all five bias
        Jacobians (each one einsum over the samples),
      * a suffix `associative_scan` of the 9x9 error-state transitions for
        the covariance.
    Matches `preintegrate_sequential` to float32 accuracy (see tests) while
    replacing n sequential small-kernel steps with ~log2(n) batched ones.
    """
    n = block.acc.shape[0]
    dt = jnp.where(block.mask, block.dt, 0.0)  # (n,)
    a = block.acc - bias.accel
    w = block.gyr - bias.gyro

    dR_inc = geo.so3_exp(w * dt[:, None])  # (n,3,3)
    Jr = geo.so3_right_jacobian(w * dt[:, None])

    # Inclusive prefix products S_k = dR_0 ... dR_k.
    S = jax.lax.associative_scan(jnp.matmul, dR_inc)  # (n,3,3)
    eye = jnp.eye(3, dtype=a.dtype)
    # Exclusive prefixes R_k = S_{k-1}, R_0 = I.
    R = jnp.concatenate([eye[None], S[:-1]], axis=0)  # (n,3,3)

    t = jnp.concatenate([jnp.zeros(1, dt.dtype), jnp.cumsum(dt)[:-1]])  # t_k
    T = jnp.sum(dt)
    Ra = jnp.einsum("kij,kj->ki", R, a)  # (n,3)

    delta_R = S[-1]
    delta_v = jnp.einsum("ki,k->i", Ra, dt)
    delta_p = jnp.einsum("ki,k->i", Ra, dt * (T - t - 0.5 * dt))

    # ---- bias Jacobians (reordered sums; see derivation in comments) ----
    # dR_dbg = -S_{n-1}^T sum_j S_j Jr_j dt_j
    SJr = jnp.einsum("kij,kjl->kil", S, Jr)
    dR_dbg = -delta_R.T @ jnp.einsum("kil,k->il", SJr, dt)
    # dv_dba = -sum_j R_j dt_j ; dp_dba = -sum_j R_j dt_j (T - t_j - dt_j/2)
    dv_dba = -jnp.einsum("kij,k->ij", R, dt)
    dp_dba = -jnp.einsum("kij,k->ij", R, dt * (T - t - 0.5 * dt))
    # Prefix bias Jacobian dR_dbg_k = -S_{k-1}^T P_k, P_k = sum_{j<k} S_j Jr_j dt_j
    P_incl = jnp.cumsum(SJr * dt[:, None, None], axis=0)
    P_excl = jnp.concatenate([jnp.zeros((1, 3, 3), a.dtype), P_incl[:-1]])
    dR_dbg_k = -jnp.einsum("kji,kjl->kil", R, P_excl)  # R_k = S_{k-1}
    # dv_dbg = sum_k -R_k hat(a_k) dR_dbg_k dt_k  (right-perturbation form)
    Rhat_a = jnp.einsum("kij,kjl->kil", R, geo.hat(a))
    HdR = jnp.einsum("kij,kjl->kil", Rhat_a, dR_dbg_k)
    dv_dbg = -jnp.einsum("kil,k->il", HdR, dt)
    # dp_dbg = sum_k -hat_k dR_dbg_k dt_k (T - t_k - dt_k/2)
    dp_dbg = -jnp.einsum("kil,k->il", HdR, dt * (T - t - 0.5 * dt))

    # ---- covariance: suffix products of the 9x9 transitions -------------
    A = jnp.zeros((n, 9, 9), a.dtype)
    A = A.at[:, 0:3, 0:3].set(jnp.swapaxes(dR_inc, -1, -2))
    A = A.at[:, 3:6, 0:3].set(-Rhat_a * dt[:, None, None])
    A = A.at[:, 6:9, 0:3].set(-0.5 * Rhat_a * (dt**2)[:, None, None])
    A = A.at[:, 3:6, 3:6].set(eye)
    A = A.at[:, 6:9, 3:6].set(eye * dt[:, None, None])
    A = A.at[:, 6:9, 6:9].set(eye)
    # Masked samples must be identity transitions.
    A = jnp.where(block.mask[:, None, None], A, jnp.eye(9, dtype=a.dtype))

    # Per-sample process noise (as in the sequential step).
    safe_dt = jnp.maximum(dt, 1e-12)
    gyro_cov = params.gyro_noise_density**2 / safe_dt
    acc_cov = params.acc_noise_density**2 / safe_dt
    int_cov = params.integration_sigma**2 * safe_dt
    Bg = jnp.zeros((n, 9, 3), a.dtype).at[:, 0:3, :].set(Jr * dt[:, None, None])
    Ba = (
        jnp.zeros((n, 9, 3), a.dtype)
        .at[:, 3:6, :]
        .set(R * dt[:, None, None])
        .at[:, 6:9, :]
        .set(0.5 * R * (dt**2)[:, None, None])
    )
    Q = (
        gyro_cov[:, None, None] * jnp.einsum("kij,klj->kil", Bg, Bg)
        + acc_cov[:, None, None] * jnp.einsum("kij,klj->kil", Ba, Ba)
    )
    Q = Q.at[:, 6:9, 6:9].add(int_cov[:, None, None] * eye)
    Q = jnp.where(block.mask[:, None, None], Q, 0.0)

    # Suffix products M_k = A_{n-1} ... A_{k+1} (M_{n-1} = I):
    # reverse, inclusive-scan, shift.
    A_rev = jnp.flip(A, axis=0)
    S9 = jax.lax.associative_scan(jnp.matmul, A_rev)  # S9_m = A_{n-1}..A_{n-1-m}
    M_incl = jnp.flip(S9, axis=0)  # M_incl_k = A_{n-1} ... A_k
    M = jnp.concatenate([M_incl[1:], jnp.eye(9, dtype=a.dtype)[None]], axis=0)
    cov = jnp.einsum("kij,kjl,kml->im", M, Q, M)

    return Pim(
        delta_R=delta_R,
        delta_v=delta_v,
        delta_p=delta_p,
        delta_t=T,
        cov=cov,
        dR_dbg=dR_dbg,
        dv_dba=dv_dba,
        dv_dbg=dv_dbg,
        dp_dba=dp_dba,
        dp_dbg=dp_dbg,
        bias_hat=bias,
    )


def preintegrate(
    params: PimParams,
    block: ImuBlock,
    bias: ImuBias,
    init: Pim | None = None,
) -> Pim:
    """Preintegrate a (masked) IMU block, optionally continuing from `init`.

    Mirrors reference ImuFrontend::preintegrateImuMeasurements
    (src/imu-frontend/ImuFrontend.cpp:158-197). Passing `init` continues an
    inter-keyframe accumulation across frames (the reference keeps one PIM
    object alive and resets it on keyframes,
    StereoVisionImuFrontend.cpp:201). Uses the log-depth parallel
    formulation; the new block's PIM is composed onto `init` in closed form.
    """
    pim_block = preintegrate_parallel(params, block, bias)
    if init is None:
        return pim_block
    return _compose_pim(params, init, pim_block)


def preintegrate_gyro(block: ImuBlock, gyro_bias: jax.Array) -> jax.Array:
    """Gyro-only rotation preintegration (AHRS-style), used for time
    alignment (reference ImuFrontend::preintegrateGyroMeasurements,
    ImuFrontend.cpp:200-220). Returns DeltaR (3,3)."""

    def step(R, sample):
        gyr, dt, m = sample
        dR = geo.so3_exp((gyr - gyro_bias) * jnp.where(m, dt, 0.0))
        return R @ dR, None

    R, _ = jax.lax.scan(
        step, jnp.eye(3, dtype=block.gyr.dtype), (block.gyr, block.dt, block.mask)
    )
    return R


def combined_cov15(pim: Pim, acc_random_walk, gyro_random_walk) -> jax.Array:
    """Joint 15x15 covariance of [preintegration error; bias_j - bias_i]
    for the Combined flavor (gtsam PreintegratedCombinedMeasurements /
    CombinedImuFactor, reference ImuFrontend.cpp:68-121).

    Closed-form assembly: bias random walk injected during the interval
    reaches the preintegrated state through the bias Jacobians, which grow
    ~linearly in time, giving the Brownian-integral factors 1/3 (state
    block) and 1/2 (cross block):

        S15 = [[ S9 + Jb Qb Jb^T/3 ,  Jb Qb / 2 ],
               [ (Jb Qb / 2)^T     ,  Qb        ]],  Qb = diag(rw^2) dt.

    Equal to the step-wise joint propagation to first order in the walk."""
    Jb = jnp.zeros((9, 6), pim.cov.dtype)
    Jb = Jb.at[0:3, 3:6].set(pim.dR_dbg)
    Jb = Jb.at[3:6, 0:3].set(pim.dv_dba)
    Jb = Jb.at[3:6, 3:6].set(pim.dv_dbg)
    Jb = Jb.at[6:9, 0:3].set(pim.dp_dba)
    Jb = Jb.at[6:9, 3:6].set(pim.dp_dbg)
    dt = jnp.maximum(pim.delta_t, 1e-6)
    qb = (
        jnp.concatenate(
            [
                jnp.full(3, acc_random_walk**2),
                jnp.full(3, gyro_random_walk**2),
            ]
        )
        * dt
    )
    Qb = jnp.diag(qb.astype(pim.cov.dtype))
    JQ = Jb @ Qb
    top = pim.cov + JQ @ Jb.T / 3.0
    cross = JQ / 2.0
    return jnp.block([[top, cross], [cross.T, Qb]])


def pim_with_bias_correction(pim: Pim, bias: ImuBias):
    """First-order bias-corrected (delta_R, delta_v, delta_p) at a new bias
    estimate (Forster eq. 44). Used by the IMU factor residual."""
    dbg = bias.gyro - pim.bias_hat.gyro
    dba = bias.accel - pim.bias_hat.accel
    dR = pim.delta_R @ geo.so3_exp(pim.dR_dbg @ dbg)
    dv = pim.delta_v + pim.dv_dba @ dba + pim.dv_dbg @ dbg
    dp = pim.delta_p + pim.dp_dba @ dba + pim.dp_dbg @ dbg
    return dR, dv, dp


def pim_predict(pim: Pim, state: NavState, bias: ImuBias, n_gravity: jax.Array) -> NavState:
    """Predict the nav state at the end of the preintegration interval —
    the backend's initial guess source (reference VioBackend.cpp:797-891,
    PoseGuessSource::IMU)."""
    dR, dv, dp = pim_with_bias_correction(pim, bias)
    dt = pim.delta_t
    R_i, p_i, v_i = state.rot, state.pos, state.vel
    R_j = R_i @ dR
    v_j = v_i + n_gravity * dt + (R_i @ dv[..., None])[..., 0]
    p_j = (
        p_i
        + v_i * dt
        + 0.5 * n_gravity * dt * dt
        + (R_i @ dp[..., None])[..., 0]
    )
    return NavState(rot=R_j, pos=p_j, vel=v_j)


def imu_residual(
    pim: Pim,
    state_i: NavState,
    bias_i: ImuBias,
    state_j: NavState,
    n_gravity: jax.Array,
) -> jax.Array:
    """9-dim on-manifold preintegration residual [r_R, r_v, r_p]
    (Forster eq. 45), whitened later by the factor's information matrix.

    Convention: r_R = Log(dR_corrected^T R_i^T R_j).
    """
    dR, dv, dp = pim_with_bias_correction(pim, bias_i)
    dt = pim.delta_t
    R_i, p_i, v_i = state_i.rot, state_i.pos, state_i.vel
    R_j, p_j, v_j = state_j.rot, state_j.pos, state_j.vel
    RiT = R_i.T
    r_R = geo.so3_log(dR.T @ (RiT @ R_j))
    r_v = (RiT @ (v_j - v_i - n_gravity * dt)[..., None])[..., 0] - dv
    r_p = (
        RiT @ (p_j - p_i - v_i * dt - 0.5 * n_gravity * dt * dt)[..., None]
    )[..., 0] - dp
    return jnp.concatenate([r_R, r_v, r_p], axis=-1)
