"""Online gravity alignment (VINS-Mono-style linear initialization).

Rebuild of the reference OnlineGravityAlignment
(src/initial/OnlineGravityAlignment.cpp, citing Qin & Shen IROS'17 at
OnlineGravityAlignment.h:12-16): given visual relative poses over an
initialization window (from stereo/mono BA or RANSAC chains) and the
corresponding PIMs, estimate

  1. the gyroscope bias (least squares on preintegrated-rotation error),
  2. per-frame velocities + the gravity vector in the visual frame
     (one linear system from the Delta-v / Delta-p preintegration
     equations),
  3. gravity refined on its magnitude manifold (2-DoF tangent update).

All solves are small dense least squares — one jit, no iteration beyond the
gravity refinement loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kimera_vio_tpu.common import geometry as geo
from kimera_vio_tpu.frontend.imu_frontend import Pim


def estimate_gyro_bias(
    R_vis: jax.Array,  # (F,3,3) camera/body rotations from vision (world)
    pim_delta_R: jax.Array,  # (F-1,3,3) preintegrated rotations i->i+1
    pim_dR_dbg: jax.Array,  # (F-1,3,3) rotation-vs-gyro-bias Jacobians
    mask: jax.Array,  # (F-1,)
) -> jax.Array:
    """Least-squares gyro bias: for each interval,
    Log(DeltaR_pim^T R_i^T R_j) ~ J dbg (reference
    OnlineGravityAlignment::estimateGyroscopeBias)."""
    R_rel = jnp.einsum("fji,fjk->fik", R_vis[:-1], R_vis[1:])  # R_i^T R_j
    err = geo.so3_log(
        jnp.einsum("fji,fjk->fik", pim_delta_R, R_rel)
    )  # (F-1,3)
    J = pim_dR_dbg  # d(log err)/d bg ~ dR_dbg (first order)
    w = mask.astype(err.dtype)
    # DeltaR(bg) = DeltaR_pim * Exp(dR_dbg @ bg) must equal R_rel, so
    # err = Log(DeltaR_pim^T R_rel) ~ dR_dbg @ bg.
    H = jnp.einsum("f,fij,fik->jk", w, J, J) + 1e-8 * jnp.eye(3)
    g = jnp.einsum("f,fij,fi->j", w, J, err)
    return jnp.linalg.solve(H, g)


def align_velocities_and_gravity(
    R_vis: jax.Array,  # (F,3,3) body rotations (visual frame)
    p_vis: jax.Array,  # (F,3) body positions (visual frame, metric)
    delta_t: jax.Array,  # (F-1,)
    delta_v: jax.Array,  # (F-1,3) PIM delta_v (bias-corrected)
    delta_p: jax.Array,  # (F-1,3) PIM delta_p
    mask: jax.Array,  # (F-1,)
    gravity_norm: float = 9.81,
    refine_iters: int = 2,
):
    """Solve per-frame velocities + gravity from the preintegration
    equations (reference constructs the same linear system,
    OnlineGravityAlignment.cpp):

        R_i^T (p_j - p_i - v_i dt - 0.5 g dt^2) = delta_p
        R_i^T (v_j - v_i - g dt) = delta_v

    Unknowns x = [v_0..v_{F-1}, g] (3F + 3). Returns (velocities (F,3),
    gravity (3,)), with |g| refined to `gravity_norm`."""
    F = R_vis.shape[0]
    n = 3 * F + 3
    RiT = jnp.swapaxes(R_vis[:-1], -1, -2)  # (F-1,3,3)
    dt = delta_t[:, None]

    # Build the stacked least-squares system with scatter-adds on H.
    H = jnp.zeros((n, n))
    b = jnp.zeros(n)
    w = mask.astype(R_vis.dtype)

    def add_block(H, b, rows_J, rhs):
        """rows_J: list of (col_start, (F-1,3,3) block); rhs (F-1,3)."""
        for ci, Ji in rows_J:
            for cj, Jj in rows_J:
                blk = jnp.einsum("f,fri,frj->fij", w, Ji, Jj)  # (F-1,3,3)
                # scatter: H[ci_f, cj_f] += blk — cols vary per interval
                H = H.at[
                    ci[:, None, None] + jnp.arange(3)[None, :, None],
                    cj[:, None, None] + jnp.arange(3)[None, None, :],
                ].add(blk)
            rhs_i = jnp.einsum("f,fri,fr->fi", w, Ji, rhs)
            b = b.at[ci[:, None] + jnp.arange(3)[None, :]].add(rhs_i)
        return H, b

    idx = jnp.arange(F - 1)
    col_vi = 3 * idx
    col_vj = 3 * (idx + 1)
    col_g = jnp.full(F - 1, 3 * F)

    # Equation 1 (delta_p): -RiT dt * v_i - 0.5 RiT dt^2 * g = delta_p - RiT (p_j - p_i)
    J_vi_1 = -RiT * dt[..., None]
    J_g_1 = -0.5 * RiT * (dt**2)[..., None]
    rhs_1 = delta_p - jnp.einsum(
        "fij,fj->fi", RiT, p_vis[1:] - p_vis[:-1]
    )
    H, b = add_block(H, b, [(col_vi, J_vi_1), (col_g, J_g_1)], rhs_1)

    # Equation 2 (delta_v): RiT v_j - RiT v_i - RiT dt g = delta_v
    J_vi_2 = -RiT
    J_vj_2 = RiT
    J_g_2 = -RiT * dt[..., None]
    rhs_2 = delta_v
    H, b = add_block(
        H, b, [(col_vi, J_vi_2), (col_vj, J_vj_2), (col_g, J_g_2)], rhs_2
    )

    x = jnp.linalg.solve(H + 1e-6 * jnp.eye(n), b)
    vels = x[: 3 * F].reshape(F, 3)
    gravity = x[3 * F :]

    # Refine on the |g| = gravity_norm manifold: re-solve with g = g0 + B dxy
    # where B spans the tangent of the sphere (reference's refinement).
    def refine(carry, _):
        vels, gravity = carry
        g0 = gravity / jnp.linalg.norm(gravity) * gravity_norm
        # tangent basis
        tmp = jnp.where(
            jnp.abs(g0[0]) < 0.9 * gravity_norm,
            jnp.array([1.0, 0.0, 0.0]),
            jnp.array([0.0, 1.0, 0.0]),
        )
        b1 = jnp.cross(g0, tmp)
        b1 = b1 / jnp.linalg.norm(b1)
        b2 = jnp.cross(g0, b1)
        b2 = b2 / jnp.linalg.norm(b2)
        B = jnp.stack([b1, b2], axis=1)  # (3,2)
        m = 3 * F + 2
        H2 = jnp.zeros((m, m))
        bb = jnp.zeros(m)

        def add2(H2, bb, rows_J, rhs):
            for ci, Ji in rows_J:
                for cj, Jj in rows_J:
                    blk = jnp.einsum("f,fri,frj->fij", w, Ji, Jj)
                    di = Ji.shape[-1]
                    dj = Jj.shape[-1]
                    H2 = H2.at[
                        ci[:, None, None] + jnp.arange(di)[None, :, None],
                        cj[:, None, None] + jnp.arange(dj)[None, None, :],
                    ].add(blk)
                rhs_i = jnp.einsum("f,fri,fr->fi", w, Ji, rhs)
                bb = bb.at[ci[:, None] + jnp.arange(Ji.shape[-1])[None, :]].add(rhs_i)
            return H2, bb

        col_g2 = jnp.full(F - 1, 3 * F)
        rhs_1b = rhs_1 - jnp.einsum("fij,j->fi", J_g_1, g0)
        rhs_2b = rhs_2 - jnp.einsum("fij,j->fi", J_g_2, g0)
        Jg1B = jnp.einsum("fij,jk->fik", J_g_1, B)
        Jg2B = jnp.einsum("fij,jk->fik", J_g_2, B)
        H2, bb = add2(H2, bb, [(col_vi, J_vi_1), (col_g2, Jg1B)], rhs_1b)
        H2, bb = add2(
            H2, bb, [(col_vi, J_vi_2), (col_vj, J_vj_2), (col_g2, Jg2B)], rhs_2b
        )
        x2 = jnp.linalg.solve(H2 + 1e-6 * jnp.eye(m), bb)
        vels = x2[: 3 * F].reshape(F, 3)
        g_new = g0 + B @ x2[3 * F :]
        return (vels, g_new), None

    (vels, gravity), _ = jax.lax.scan(
        refine, (vels, gravity), None, length=refine_iters
    )
    gravity = gravity / jnp.linalg.norm(gravity) * gravity_norm
    return vels, gravity
