"""Multi-view triangulation for smart landmarks, batched over landmarks.

The TPU replacement for GTSAM's triangulateSafe inside
SmartStereoProjectionPoseFactor (reference smart-factor machinery,
VioBackend-definitions.h:61, smart-factor parameters in
params/Euroc/BackendParams.yaml:17-42): every landmark is triangulated from
all of its masked observations across the window in closed form (midpoint /
ray least squares over BOTH stereo rays), optionally polished with
Gauss-Newton on the stereo reprojection error, then gated by the same
degeneracy checks the reference configures:

  * rankTolerance -> minimum eigenvalue of the ray normal matrix,
  * landmarkDistanceThreshold -> distance from the newest camera,
  * outlierRejection -> mean reprojection error after triangulation,
  * cheirality -> positive depth in every observing camera.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate_rays(
    origins: jax.Array,  # (..., M, 3) ray origins (world)
    dirs: jax.Array,  # (..., M, 3) unit ray directions (world)
    mask: jax.Array,  # (..., M)
):
    """Least-squares point minimizing sum of squared distances to rays.

    Solves  [sum_m (I - d d^T)] p = sum_m (I - d d^T) o.
    Returns (point (...,3), ok (...,), min_eig (...,)) where min_eig is the
    smallest eigenvalue of the (trace-normalized) normal matrix — the rank /
    parallax measure used for the rankTolerance gate."""
    w = mask.astype(origins.dtype)[..., None, None]
    eye = jnp.eye(3, dtype=origins.dtype)
    P = eye - dirs[..., :, None] * dirs[..., None, :]  # (..., M, 3, 3)
    A = jnp.sum(P * w, axis=-3)
    b = jnp.sum((P @ origins[..., None]) * w, axis=-3)[..., 0]
    n_obs = mask.sum(-1)
    # Regularize for the unobserved case; gates kill those anyway.
    A_reg = A + 1e-9 * eye
    p = jnp.linalg.solve(A_reg, b[..., None])[..., 0]
    eigs = jnp.linalg.eigvalsh(A_reg)
    # Normalize by the ray count so the threshold is scale-free.
    min_eig = eigs[..., 0] / jnp.maximum(n_obs, 1)
    ok = n_obs >= 2
    return p, ok, min_eig


def triangulate_stereo_landmarks(
    R_w_cam: jax.Array,  # (K,3,3) world-from-rect-cam rotations per state
    t_w_cam: jax.Array,  # (K,3) camera centers (world)
    obs_uvd: jax.Array,  # (L,K,3) [uL,uR,v] rectified stereo measurements
    obs_mask: jax.Array,  # (L,K)
    *,
    fx,
    fy,
    cx,
    cy,
    baseline,
    refine_iters: int = 2,
    rank_tolerance: float = 1.0,
    landmark_distance_threshold: float = 10.0,
    outlier_rejection_px: float = 3.0,
    newest_idx: int | jax.Array = -1,
):
    """Triangulate L landmarks from stereo observations across K states.

    Returns (points_w (L,3), valid (L,), mean_reproj_err (L,)).

    Each stereo observation contributes two rays (left pinhole at the
    camera center, right pinhole at center + baseline * cam_x_axis).
    """
    L, K, _ = obs_uvd.shape
    uL, uR, v = obs_uvd[..., 0], obs_uvd[..., 1], obs_uvd[..., 2]
    # Mono measurements carry uR = NaN (reference convention,
    # MonoVisionImuFrontend.cpp:230-340): their right ray is masked out and
    # the NaN replaced to keep arithmetic clean.
    stereo_ok = jnp.isfinite(uR)
    uR = jnp.where(stereo_ok, uR, uL)

    # Ray directions in the rectified camera frame.
    def cam_ray(u, vv):
        x = (u - cx) / fx
        y = (vv - cy) / fy
        d = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
        return d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    d_left = cam_ray(uL, v)  # (L,K,3)
    d_right = cam_ray(uR, v)
    # To world.
    dw_left = jnp.einsum("kij,lkj->lki", R_w_cam, d_left)
    dw_right = jnp.einsum("kij,lkj->lki", R_w_cam, d_right)
    right_center = t_w_cam + baseline * R_w_cam[:, :, 0]  # +x axis
    o_left = jnp.broadcast_to(t_w_cam[None], (L, K, 3))
    o_right = jnp.broadcast_to(right_center[None], (L, K, 3))

    origins = jnp.concatenate([o_left, o_right], axis=1)  # (L, 2K, 3)
    dirs = jnp.concatenate([dw_left, dw_right], axis=1)
    mask2 = jnp.concatenate([obs_mask, obs_mask & stereo_ok], axis=1)

    p, ok, min_eig = triangulate_rays(origins, dirs, mask2)

    # --- Gauss-Newton polish on stereo reprojection error ------------------
    def reproject(pts):
        # (L,3) world points -> (L,K,3) predicted [uL,uR,v] + depth
        pc = jnp.einsum("kji,lkj->lki", R_w_cam, pts[:, None] - t_w_cam[None])
        z = pc[..., 2]
        safe_z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        puL = fx * pc[..., 0] / safe_z + cx
        puR = fx * (pc[..., 0] - baseline) / safe_z + cx
        pv = fy * pc[..., 1] / safe_z + cy
        return jnp.stack([puL, puR, pv], axis=-1), z

    def gn_step(pts, _):
        def point_residual(pt, Rk, tk, meas):
            pc = Rk.T @ (pt - tk)
            z = jnp.where(jnp.abs(pc[2]) < 1e-6, 1e-6, pc[2])
            pred = jnp.stack(
                [
                    fx * pc[0] / z + cx,
                    fx * (pc[0] - baseline) / z + cx,
                    fy * pc[1] / z + cy,
                ]
            )
            return pred - meas

        def one(pt, uvd_l, m_l):
            fin = jnp.isfinite(uvd_l[:, 1])
            uvd_safe = uvd_l.at[:, 1].set(jnp.where(fin, uvd_l[:, 1], uvd_l[:, 0]))

            def res_all(p):
                r = jax.vmap(point_residual, in_axes=(None, 0, 0, 0))(
                    p, R_w_cam, t_w_cam, uvd_safe
                )  # (K,3)
                r = r.at[:, 1].set(jnp.where(fin, r[:, 1], 0.0))
                return jnp.where(m_l[:, None], r, 0.0).reshape(-1)

            r = res_all(pt)
            J = jax.jacfwd(res_all)(pt)  # (3K, 3)
            H = J.T @ J + 1e-6 * jnp.eye(3, dtype=pt.dtype)
            g = J.T @ r
            return pt - jnp.linalg.solve(H, g)

        return jax.vmap(one)(pts, obs_uvd, obs_mask), None

    if refine_iters > 0:
        p, _ = jax.lax.scan(gn_step, p, None, length=refine_iters)

    # --- degeneracy / outlier gates ----------------------------------------
    pred, depth = reproject(p)
    diff = pred - obs_uvd
    diff = diff.at[..., 1].set(jnp.where(stereo_ok, diff[..., 1], 0.0))
    err = jnp.linalg.norm(diff, axis=-1)
    err = jnp.where(obs_mask, err, 0.0)
    n_obs = jnp.maximum(obs_mask.sum(-1), 1)
    mean_err = err.sum(-1) / n_obs
    cheirality_ok = jnp.all(jnp.where(obs_mask, depth > 0.05, True), axis=-1)
    # Distance from the newest observing camera.
    t_new = t_w_cam[newest_idx]
    dist = jnp.linalg.norm(p - t_new[None], axis=-1)
    valid = (
        ok
        & cheirality_ok
        & (mean_err < outlier_rejection_px)
        & (dist < landmark_distance_threshold)
        & (min_eig > 1e-5 * rank_tolerance)
        & jnp.all(jnp.isfinite(p), axis=-1)
    )
    return p, valid, mean_err
