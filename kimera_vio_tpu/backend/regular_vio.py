"""RegularVIO backend: structural-regularity (point-on-plane) factors.

Rebuild of the reference RegularVioBackend (Rosinol ICRA'19;
src/backend/RegularVioBackend.cpp): landmarks associated to mesher-detected
planes get an explicit point-on-plane constraint. The reference converts
their smart factors into projection factors + landmark values and adds
gtsam PointPlaneFactors (src/factors/PointPlaneFactor.cpp: residual
n . p - d); planes live in the state.

TPU formulation (keeps the one-big-solve shape of backend/smoother.py):

  * plane states: `P` slots of [n (unit-ish normal), d], parametrized by a
    3-DoF tangent [dn_tangent(2), dd(1)] — reference OrientedPlane3,
  * landmarks stay *eliminated*: the plane factor attaches to the landmark
    3-DoF block BEFORE the Schur complement, so eliminating the landmark
    produces exactly the plane<->pose couplings the explicit-landmark
    formulation would — same information, no landmark states in the solve,
  * the window tangent extends to D = K*15 + P*3; marginalization treats
    plane states as long-lived (re-anchored, not marginalized — planes are
    persistent structure, reference keeps them across the horizon).

`plane_assoc` (L,) holds the plane index per landmark (-1 = none), produced
by the Mesher's segmentation + association step (mesher/mesher.py,
reference Mesher::associatePlanes, Mesher.cpp:1316).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from kimera_vio_tpu.backend import smoother as sm
from kimera_vio_tpu.common import geometry as geo


@struct.dataclass
class PlaneStates:
    """P plane slots: unit normal + signed distance (n . p = d)."""

    normal: jax.Array  # (P,3)
    d: jax.Array  # (P,)
    mask: jax.Array  # (P,)

    @classmethod
    def empty(cls, P: int, dtype=jnp.float32) -> "PlaneStates":
        n = jnp.zeros((P, 3), dtype).at[:, 2].set(1.0)
        return cls(normal=n, d=jnp.zeros(P, dtype), mask=jnp.zeros(P, bool))


def plane_tangent_basis(normal: jax.Array) -> jax.Array:
    """(...,3) unit normal -> (...,3,2) tangent basis of the unit sphere."""
    n = normal
    tmp = jnp.where(
        (jnp.abs(n[..., 0:1]) < 0.9),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype), n.shape),
    )
    b1 = jnp.cross(n, tmp)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1, axis=-1, keepdims=True), 1e-9)
    b2 = jnp.cross(n, b1)
    return jnp.stack([b1, b2], axis=-1)  # (...,3,2)


def retract_planes(planes: PlaneStates, delta: jax.Array) -> PlaneStates:
    """delta (P,3): [2 normal-tangent, 1 distance]."""
    B = plane_tangent_basis(planes.normal)  # (P,3,2)
    n_new = planes.normal + jnp.einsum("pij,pj->pi", B, delta[:, 0:2])
    n_new = n_new / jnp.maximum(
        jnp.linalg.norm(n_new, axis=-1, keepdims=True), 1e-9
    )
    return planes.replace(normal=n_new, d=planes.d + delta[:, 2])


def point_plane_blocks(
    planes: PlaneStates,
    pts: jax.Array,  # (L,3) triangulated landmark positions
    lmk_ok: jax.Array,  # (L,)
    plane_assoc: jax.Array,  # (L,) int32 plane index or -1
    sigma: jax.Array,  # regularityNoiseSigma
):
    """Per-landmark point-on-plane residual r = (n.p - d)/sigma with
    Jacobians wrt the landmark point (1,3) and the plane tangent (1,3).

    Returns (r (L,), J_pt (L,3), J_plane (L,3), w (L,)) — `w` masks
    landmarks without a valid plane."""
    idx = jnp.clip(plane_assoc, 0, planes.normal.shape[0] - 1)
    n = planes.normal[idx]  # (L,3)
    d = planes.d[idx]
    B = plane_tangent_basis(planes.normal)[idx]  # (L,3,2)
    r = (jnp.einsum("li,li->l", n, pts) - d) / sigma
    J_pt = n / sigma  # (L,3)
    # d r / d [normal tangent, distance]
    J_n = jnp.einsum("li,lij->lj", pts, B) / sigma  # (L,2)
    J_plane = jnp.concatenate([J_n, -jnp.ones_like(d[:, None]) / sigma], -1)
    w = (
        (plane_assoc >= 0)
        & lmk_ok
        & planes.mask[idx]
    ).astype(pts.dtype)
    return r, J_pt, J_plane, w


def parallel_plane_residual(
    n1, d1, n2, d2, measured_dist=None, sigma_n=1.0, sigma_d=1.0
):
    """ParallelPlaneRegularFactor residuals (reference
    factors/ParallelPlaneRegularFactor.h):

      * tangent-space variant (measured_dist=None): 2-dim geodesic
        parallelism error e = B(n1)^T n2 (zero iff the normals agree),
      * basic variant: adds the plane-distance row
        e3 = (d2 - d1 - measured_dist).

    Returns (r, J1, J2) with analytic Jacobians in each plane's
    [2 normal-tangent, 1 distance] coordinates (the layout of
    `retract_planes`)."""
    B1 = plane_tangent_basis(n1)  # (3,2)
    e_n = jnp.einsum("ij,i->j", B1, n2) / sigma_n  # (2,)
    B2 = plane_tangent_basis(n2)
    # d e / d delta2_n = B1^T B2 exactly (B2 columns are orthogonal to n2,
    # so the normalize() projector is the identity on them).
    J2_n = jnp.einsum("ij,ik->jk", B1, B2) / sigma_n  # (2,2)

    # d e / d delta1_n includes the derivative of n1's tangent basis —
    # forward-mode through the retraction gives it exactly (2x2 jacfwd of
    # a tiny closed-form function; fuses into the surrounding graph).
    def _e1(dl):
        n1p = n1 + jnp.einsum("ij,j->i", B1, dl)
        n1p = n1p / jnp.maximum(jnp.linalg.norm(n1p), 1e-9)
        return jnp.einsum("ij,i->j", plane_tangent_basis(n1p), n2) / sigma_n

    J1_n = jax.jacfwd(_e1)(jnp.zeros(2, n1.dtype))
    if measured_dist is None:
        r = e_n
        J1 = jnp.concatenate([J1_n, jnp.zeros((2, 1), n1.dtype)], axis=1)
        J2 = jnp.concatenate([J2_n, jnp.zeros((2, 1), n1.dtype)], axis=1)
        return r, J1, J2
    e_d = (d2 - d1 - measured_dist) / sigma_d
    r = jnp.concatenate([e_n, e_d[None]])
    J1 = jnp.zeros((3, 3), n1.dtype)
    J1 = J1.at[0:2, 0:2].set(J1_n).at[2, 2].set(-1.0 / sigma_d)
    J2 = jnp.zeros((3, 3), n1.dtype)
    J2 = J2.at[0:2, 0:2].set(J2_n).at[2, 2].set(1.0 / sigma_d)
    return r, J1, J2


def parallel_plane_blocks(
    planes: PlaneStates,
    pairs: jax.Array,  # (Q,2) int32 plane-index pairs
    pair_mask: jax.Array,  # (Q,)
    measured_dists: jax.Array | None = None,  # (Q,) or None
    sigma_n: float = 0.1,
    sigma_d: float = 0.1,
):
    """Batched parallel-plane regularities between plane pairs. Returns
    (r (Q,rd), J1 (Q,rd,3), J2 (Q,rd,3), w (Q,))."""
    i, j = pairs[:, 0], pairs[:, 1]
    P = planes.normal.shape[0]
    ic = jnp.clip(i, 0, P - 1)
    jc = jnp.clip(j, 0, P - 1)

    def one(k):
        md = None if measured_dists is None else measured_dists[k]
        return parallel_plane_residual(
            planes.normal[ic[k]], planes.d[ic[k]],
            planes.normal[jc[k]], planes.d[jc[k]],
            measured_dist=md, sigma_n=sigma_n, sigma_d=sigma_d,
        )

    r, J1, J2 = jax.vmap(one)(jnp.arange(pairs.shape[0]))
    w = (
        pair_mask & (i >= 0) & (j >= 0)
        & planes.mask[ic] & planes.mask[jc]
    ).astype(planes.normal.dtype)
    return r * w[:, None], J1 * w[:, None, None], J2 * w[:, None, None], w


def regular_smart_factor_blocks(
    cfg: sm.BackendConfig,
    win: sm.Window,
    lmk: sm.LandmarkTable,
    planes: PlaneStates,
    plane_assoc: jax.Array,
    regularity_sigma: jax.Array,
):
    """Smart-factor linearization with the point-plane factor folded into
    the landmark block before Schur elimination.

    Mirrors the *information content* of the reference's conversion of
    smart factors to projection factors + PointPlaneFactor
    (RegularVioBackend.cpp:635-803, 1008-1140) without introducing
    landmark states. Returns (H_pose (K,6,K,6), g_pose, H_plane (P,3,P,3),
    g_plane, H_cross (K,6,P,3), pts, lmk_ok)."""
    K, L = cfg.nr_states, cfg.max_landmarks
    P = planes.normal.shape[0]
    # Reuse the plain smart-factor pipeline for the projection part by
    # re-deriving its internals (triangulation + per-obs Jacobians).
    R_w_cam = win.rot @ cfg.R_b_cam
    t_w_cam = win.pos + jnp.einsum("kij,j->ki", win.rot, cfg.t_b_cam)
    from kimera_vio_tpu.ops.triangulation import triangulate_stereo_landmarks

    obs_mask = lmk.obs_mask & win.mask[None, :] & (lmk.ids >= 0)[:, None]
    pts, ok, _ = triangulate_stereo_landmarks(
        R_w_cam, t_w_cam, lmk.obs_uvd, obs_mask,
        fx=cfg.fx, fy=cfg.fy, cx=cfg.cx, cy=cfg.cy, baseline=cfg.baseline,
        rank_tolerance=cfg.rank_tolerance,
        landmark_distance_threshold=cfg.landmark_distance_threshold,
        outlier_rejection_px=cfg.outlier_rejection_px,
        newest_idx=jnp.maximum(win.n - 1, 0),
    )
    ok = ok & (obs_mask.sum(-1) >= cfg.min_obs_for_triangulation)
    newest = jnp.maximum(win.n - 1, 0)
    fallback = t_w_cam[newest] + 5.0 * R_w_cam[newest][:, 2]
    safe = ok & jnp.all(jnp.isfinite(pts), axis=-1)
    pts = jnp.where(safe[:, None], pts, fallback[None])
    ok = safe

    def obs_residual(dpose, dpoint, Rk, pk, meas, point):
        R = Rk @ geo.so3_exp(dpose[0:3])
        p = pk + dpose[3:6]
        pw = point + dpoint
        R_wc = R @ cfg.R_b_cam
        t_wc = p + R @ cfg.t_b_cam
        pc = R_wc.T @ (pw - t_wc)
        z = jnp.where(jnp.abs(pc[2]) < 1e-6, 1e-6, pc[2])
        pred = jnp.stack(
            [
                cfg.fx * pc[0] / z + cfg.cx,
                cfg.fx * (pc[0] - cfg.baseline) / z + cfg.cx,
                cfg.fy * pc[1] / z + cfg.cy,
            ]
        )
        return (pred - meas) / cfg.smart_noise_sigma

    z6 = jnp.zeros(6, win.pos.dtype)
    z3 = jnp.zeros(3, win.pos.dtype)

    def per_obs(Rk, pk, meas, point):
        r = obs_residual(z6, z3, Rk, pk, meas, point)
        F = jax.jacfwd(lambda d: obs_residual(d, z3, Rk, pk, meas, point))(z6)
        E = jax.jacfwd(lambda d: obs_residual(z6, d, Rk, pk, meas, point))(z3)
        return r, F, E

    stereo_ok = jnp.isfinite(lmk.obs_uvd[..., 1])
    obs_uvd_safe = lmk.obs_uvd.at[..., 1].set(
        jnp.where(stereo_ok, lmk.obs_uvd[..., 1], lmk.obs_uvd[..., 0])
    )
    per_lmk = jax.vmap(
        jax.vmap(per_obs, in_axes=(0, 0, 0, None)), in_axes=(None, None, 0, 0)
    )
    r, F, E = per_lmk(win.rot, win.pos, obs_uvd_safe, pts)
    row_ok = stereo_ok[..., None].astype(r.dtype) * jnp.ones((1, 1, 3), r.dtype)
    row_ok = row_ok.at[..., 0].set(1.0).at[..., 2].set(1.0)
    r = r * row_ok
    F = F * row_ok[..., None]
    E = E * row_ok[..., None]

    rn = jnp.linalg.norm(r, axis=-1)
    ntype = jnp.where(stereo_ok, cfg.stereo_norm_type, cfg.mono_norm_type)
    nparam = jnp.where(stereo_ok, cfg.stereo_norm_param, cfg.mono_norm_param)
    hw = sm.robust_weight(rn, ntype, nparam)
    w = obs_mask & ok[:, None]
    sw = jnp.sqrt(hw) * w.astype(r.dtype)
    r = r * sw[..., None]
    F = F * sw[..., None, None]
    E = E * sw[..., None, None]

    # --- point-plane rows on the landmark block -------------------------
    rp, Jp_pt, Jp_plane, wp = point_plane_blocks(
        planes, pts, ok, plane_assoc, regularity_sigma
    )
    rp = rp * wp
    Jp_pt = Jp_pt * wp[:, None]
    Jp_plane = Jp_plane * wp[:, None]

    # Landmark-block system including the plane rows:
    Hll = (
        jnp.einsum("lkai,lkaj->lij", E, E)
        + jnp.einsum("li,lj->lij", Jp_pt, Jp_pt)
        + 1e-6 * jnp.eye(3, dtype=r.dtype)
    )
    Hll_inv = jnp.linalg.inv(Hll)
    Hpl = jnp.einsum("lkai,lkaj->lkij", F, E)  # (L,K,6,3) pose-point
    Hql = jnp.einsum("li,lj->lij", Jp_plane, Jp_pt)  # (L,3,3) plane-point
    gl = jnp.einsum("lkai,lka->li", E, r) + Jp_pt * rp[:, None]  # (L,3)
    gq = Jp_plane * rp[:, None]  # (L,3) plane gradient (own rows)

    # Schur eliminate the landmark:
    T = jnp.einsum("lkij,ljm->lkim", Hpl, Hll_inv)  # (L,K,6,3)
    Tq = jnp.einsum("lij,ljm->lim", Hql, Hll_inv)  # (L,3,3)

    H_pose = -jnp.einsum("lkim,lqjm->kiqj", T, Hpl)
    H_diag = jnp.einsum("lkai,lkaj->kij", F, F)
    H_pose = H_pose.at[jnp.arange(K), :, jnp.arange(K), :].add(H_diag)
    g_pose = jnp.einsum("lkai,lka->ki", F, r) - jnp.einsum(
        "lkim,lm->ki", T, gl
    )

    # Plane blocks: own information minus eliminated part, scattered by
    # plane index.
    P_idx = jnp.clip(plane_assoc, 0, P - 1)
    Hqq_l = jnp.einsum("li,lj->lij", Jp_plane, Jp_plane) - jnp.einsum(
        "lim,ljm->lij", Tq, Hql
    )  # (L,3,3)
    gq_l = gq - jnp.einsum("lim,lm->li", Tq, gl)
    H_plane = jnp.zeros((P, 3, P, 3), r.dtype)
    H_plane = H_plane.at[P_idx, :, P_idx, :].add(Hqq_l)
    g_plane = jnp.zeros((P, 3), r.dtype).at[P_idx].add(gq_l)

    # Pose-plane cross terms: -T_l (Hql)^T scattered to (k, plane_l).
    cross_l = -jnp.einsum("lkim,ljm->lkij", T, Hql)  # (L,K,6,3)
    H_cross = jnp.zeros((K, 6, P, 3), r.dtype)
    # scatter-add over landmarks into plane columns
    H_cross = H_cross.at[:, :, P_idx, :].add(
        jnp.transpose(cross_l, (1, 2, 0, 3))
    )
    return H_pose, g_pose, H_plane, g_plane, H_cross, pts, ok


def regular_backend_solve(
    cfg: sm.BackendConfig,
    win: sm.Window,
    lmk: sm.LandmarkTable,
    planes: PlaneStates,
    plane_assoc: jax.Array,
    regularity_sigma: jax.Array,
    gn_iters: int = 2,
    parallel_pairs: jax.Array | None = None,  # (Q,2) int32
    parallel_pair_mask: jax.Array | None = None,  # (Q,)
):
    """Joint GN over window states + plane states (one solve per iter).

    This is the RegularVIO optimize() analog. Window factor blocks (IMU,
    priors, no-motion) come from the base smoother assembly; the smart +
    regularity blocks replace the plain smart-factor blocks.
    `parallel_pairs` optionally adds tangent-space
    ParallelPlaneRegularFactor rows between co-tracked plane slots
    (the PlaneTracker supplies the pairs)."""
    K = cfg.nr_states
    P = planes.normal.shape[0]
    D = K * sm.S_DOF
    Dp = D + P * 3

    def body(carry, _):
        win, planes = carry
        Hp, gp, Hq, gq, Hx, pts, ok = regular_smart_factor_blocks(
            cfg, win, lmk, planes, plane_assoc, regularity_sigma
        )
        if parallel_pairs is not None and parallel_pairs.shape[0] > 0:
            rq, J1q, J2q, wq = parallel_plane_blocks(
                planes, parallel_pairs,
                (
                    parallel_pair_mask
                    if parallel_pair_mask is not None
                    else jnp.ones(parallel_pairs.shape[0], bool)
                ),
            )
            pi = jnp.clip(parallel_pairs[:, 0], 0, P - 1)
            pj = jnp.clip(parallel_pairs[:, 1], 0, P - 1)
            Hq = Hq.at[pi, :, pi, :].add(jnp.einsum("qri,qrj->qij", J1q, J1q))
            Hq = Hq.at[pj, :, pj, :].add(jnp.einsum("qri,qrj->qij", J2q, J2q))
            Hij_q = jnp.einsum("qri,qrj->qij", J1q, J2q)
            Hq = Hq.at[pi, :, pj, :].add(Hij_q)
            Hq = Hq.at[pj, :, pi, :].add(jnp.swapaxes(Hij_q, -1, -2))
            gq = gq.at[pi].add(jnp.einsum("qri,qr->qi", J1q, rq))
            gq = gq.at[pj].add(jnp.einsum("qri,qr->qi", J2q, rq))
        # Base assembly WITHOUT smart factors: IMU + no-motion + prior.
        H = jnp.zeros((K, sm.S_DOF, K, sm.S_DOF), win.pos.dtype)
        g = jnp.zeros((K, sm.S_DOF), win.pos.dtype)
        for blocks in (sm._imu_factor_blocks(cfg, win), sm._no_motion_blocks(cfg, win)):
            Ji, Jj, r = blocks
            i_idx = jnp.arange(K - 1)
            j_idx = i_idx + 1
            H = H.at[i_idx, :, i_idx, :].add(jnp.einsum("kri,krj->kij", Ji, Ji))
            H = H.at[j_idx, :, j_idx, :].add(jnp.einsum("kri,krj->kij", Jj, Jj))
            Hij = jnp.einsum("kri,krj->kij", Ji, Jj)
            H = H.at[i_idx, :, j_idx, :].add(Hij)
            H = H.at[j_idx, :, i_idx, :].add(jnp.swapaxes(Hij, -1, -2))
            g = g.at[i_idx].add(jnp.einsum("kri,kr->ki", Ji, r))
            g = g.at[j_idx].add(jnp.einsum("kri,kr->ki", Jj, r))
        H = H.at[:, 0:6, :, 0:6].add(Hp)
        g = g.at[:, 0:6].add(gp)
        H = H.reshape(D, D)
        g = g.reshape(D)
        Hprior, gprior = sm._prior_blocks(cfg, win)
        H = H + Hprior
        g = g + gprior
        inactive = (~win.mask).astype(win.pos.dtype)
        H = H + jnp.diag(jnp.repeat(inactive, sm.S_DOF))

        # Extend with plane blocks.
        Hfull = jnp.zeros((Dp, Dp), H.dtype)
        Hfull = Hfull.at[:D, :D].set(H)
        Hfull = Hfull.at[D:, D:].set(
            Hq.reshape(P * 3, P * 3)
            + jnp.diag(
                jnp.repeat((~planes.mask).astype(H.dtype) + 1e-4, 3)
            )
        )
        Hx_f = jnp.zeros((K, sm.S_DOF, P, 3), H.dtype)
        Hx_f = Hx_f.at[:, 0:6].set(Hx)
        Hx_f = Hx_f.reshape(D, P * 3)
        Hfull = Hfull.at[:D, D:].set(Hx_f)
        Hfull = Hfull.at[D:, :D].set(Hx_f.T)
        gfull = jnp.concatenate([g, gq.reshape(-1)])

        Hfull = 0.5 * (Hfull + Hfull.T)
        d = jnp.sqrt(jnp.maximum(jnp.diag(Hfull), 1e-12))
        dinv = 1.0 / d
        Hs = Hfull * dinv[:, None] * dinv[None, :] + 1e-5 * jnp.eye(
            Dp, dtype=H.dtype
        )
        Lc = jnp.linalg.cholesky(Hs)
        y = -jax.scipy.linalg.cho_solve((Lc, True), gfull * dinv)
        delta = y * dinv
        dwin = (delta[:D].reshape(K, sm.S_DOF)) * win.mask[:, None]
        rot, pos, vel, bias = sm.retract_states(
            win.rot, win.pos, win.vel, win.bias, dwin
        )
        win = win.replace(rot=rot, pos=pos, vel=vel, bias=bias)
        dplane = delta[D:].reshape(P, 3) * planes.mask[:, None]
        planes = retract_planes(planes, dplane)
        return (win, planes), (pts, ok)

    (win, planes), (pts, ok) = jax.lax.scan(
        body, (win, planes), None, length=gn_iters
    )
    return win, planes, jax.tree.map(lambda x: x[-1], (pts, ok))
