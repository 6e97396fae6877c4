"""Batched geometric-verification solvers (the RANSAC family).

TPU-native rebuild of the reference Tracker's outlier rejection
(src/frontend/Tracker.cpp): instead of OpenGV's sequential adaptive RANSAC,
every solver generates a *fixed batch* of hypotheses (vmap over minimal
samples drawn with a counter-based PRNG) and scores all of them against all
correspondences in one shot — same statistical contract, compiler-friendly
shapes (SURVEY.md §7 "RANSAC on TPU").

Solvers (reference dispatch in VisionImuFrontend.cpp:90-173):

  * mono 2-pt given rotation  (Tracker.cpp:213-319, opengv 2-pt)     -> here
  * mono 5-pt Nister          (Tracker.cpp:213-319, opengv Nister)   -> batched
    8-point essential + cheirality decomposition (documented substitution:
    same model, same inlier metric, linear minimal solver; the extra 3
    samples per hypothesis are free when hypotheses are batched)
  * stereo 1-pt translation voting given rotation (Tracker.cpp:393-620,
    custom Mahalanobis coherence voting)                             -> exact
    batched reproduction (the O(n^2) vote is a natural [N,N] kernel)
  * stereo 3-pt Arun 3d3d     (Tracker.cpp:667-742, opengv Arun)     -> batched
  * PnP                       (Tracker.cpp:1163-1270, opengv Kneip..) -> batched
    linear 6-pt DLT + inlier refit (EPNP-class accuracy for VIO use)

All functions take/return fixed-size masked arrays and a `jax.random` key
(fixed per frame index => deterministic sequential mode, reference
Pipeline.cpp:35-40).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kimera_vio_tpu.common import geometry as geo


def _sample_indices(key, n_hyp: int, k: int, n: int, weights: jax.Array):
    """(n_hyp, k) random correspondence indices, drawn from valid entries.

    `weights` is a 0/1 mask converted to categorical probabilities. Minimal
    samples may repeat an index when few matches are valid — those
    hypotheses simply score poorly and lose.
    """
    p = weights / jnp.maximum(weights.sum(), 1e-9)
    return jax.random.choice(key, n, shape=(n_hyp, k), replace=True, p=p)


# ---------------------------------------------------------------------------
# Epipolar (mono) solvers
# ---------------------------------------------------------------------------


def _epipolar_residual_sq(E: jax.Array, f_ref: jax.Array, f_cur: jax.Array):
    """Squared normalized epipolar residual for unit bearing vectors.

    r = (f_ref^T E f_cur)^2 / (|n1|^2 + |n2|^2) with n1 = E f_cur,
    n2 = E^T f_ref — a Sampson-style normalization on the bearing sphere,
    comparable across hypotheses (OpenGV thresholds the same class of
    algebraic-angular error; calibrate thresholds statistically)."""
    Ef2 = jnp.einsum("ij,nj->ni", E, f_cur)
    Etf1 = jnp.einsum("ji,nj->ni", E, f_ref)
    num = jnp.einsum("ni,ni->n", f_ref, Ef2) ** 2
    den = jnp.sum(Ef2**2, -1) + jnp.sum(Etf1**2, -1)
    return num / jnp.maximum(den, 1e-12)


def ransac_2pt_mono(
    f_ref: jax.Array,  # (N,3) unit bearings in ref cam
    f_cur: jax.Array,  # (N,3) unit bearings in cur cam
    mask: jax.Array,  # (N,)
    R_ref_cur: jax.Array,  # (3,3) rotation (from gyro) mapping cur->ref
    key: jax.Array,
    *,
    n_hyp: int = 256,
    threshold: float = 1e-6,
):
    """Translation-only RANSAC given known rotation (the reference's
    2-point mono method, TrackerParams ransac_use_2point_mono).

    Each match constrains t . (f_ref x (R f_cur)) = 0; two matches give
    t = n_i x n_j. Returns (t_unit (3,), inliers (N,), n_inliers)."""
    n = f_ref.shape[0]
    Rf = jnp.einsum("ij,nj->ni", R_ref_cur, f_cur)
    normals = jnp.cross(f_ref, Rf)  # (N,3): each t must be orthogonal to these
    idx = _sample_indices(key, n_hyp, 2, n, mask.astype(jnp.float32))
    n1 = normals[idx[:, 0]]
    n2 = normals[idx[:, 1]]
    t_hyp = jnp.cross(n1, n2)  # (n_hyp, 3)
    t_norm = jnp.linalg.norm(t_hyp, axis=-1, keepdims=True)
    t_hyp = t_hyp / jnp.maximum(t_norm, 1e-12)

    # Residual of match m under hypothesis h: (t_h . normals_m)^2, with
    # normals normalized => angular-algebraic error.
    nn = normals / jnp.maximum(
        jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12
    )
    res = jnp.einsum("hi,ni->hn", t_hyp, nn) ** 2  # (n_hyp, N)
    inl = (res < threshold) & mask[None, :]
    scores = inl.sum(-1)
    best = jnp.argmax(scores)
    t_best = t_hyp[best]
    inliers = inl[best]
    # Refit: least-squares t orthogonal to all inlier normals (smallest
    # eigenvector of sum n n^T over inliers).
    w = inliers.astype(f_ref.dtype)
    Mmat = jnp.einsum("n,ni,nj->ij", w, nn, nn)
    _, vecs = jnp.linalg.eigh(Mmat)
    t_fit = vecs[:, 0]
    # Keep orientation consistent with the voted hypothesis.
    t_fit = t_fit * jnp.sign(jnp.sum(t_fit * t_best) + 1e-12)
    return t_fit, inliers, scores[best]


def _essential_from_8pt(f_ref: jax.Array, f_cur: jax.Array):
    """Essential matrix from >=8 bearing pairs (one hypothesis).

    A e = 0 with A rows = kron(f_cur, f_ref) (e stacked row-major E).
    Solved via eigh of A^T A (9x9) then projected onto the essential
    manifold (two equal singular values, third zero)."""
    A = jnp.einsum("ni,nj->nij", f_ref, f_cur).reshape(-1, 9)
    M = A.T @ A
    _, vecs = jnp.linalg.eigh(M)
    E = vecs[:, 0].reshape(3, 3)
    U, s, Vt = jnp.linalg.svd(E)
    s_proj = jnp.array([1.0, 1.0, 0.0], E.dtype)
    return U @ jnp.diag(s_proj) @ Vt


def decompose_essential(
    E: jax.Array, f_ref: jax.Array, f_cur: jax.Array, mask: jax.Array
):
    """E -> (R_ref_cur, t_unit) with the cheirality vote over the 4
    candidate decompositions, using midpoint triangulation depth signs."""
    U, _, Vt = jnp.linalg.svd(E)
    # Enforce proper rotations.
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    # Candidate rotations/translations for x_ref = R x_cur + t.
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]

    def depth_score(R, t):
        # Midpoint depths: solve for scales a,b in a f_ref ~ b R f_cur + t.
        Rf = jnp.einsum("ij,nj->ni", R, f_cur)
        # Per match 2x2 system [f_ref, -Rf] [a;b] = t (least squares).
        f11 = jnp.sum(f_ref * f_ref, -1)
        f12 = -jnp.sum(f_ref * Rf, -1)
        f22 = jnp.sum(Rf * Rf, -1)
        b1 = jnp.sum(f_ref * t, -1)
        b2 = -jnp.sum(Rf * t, -1)
        det = f11 * f22 - f12 * f12
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        a = (f22 * b1 - f12 * b2) / det
        b = (f11 * b2 - f12 * b1) / det
        return jnp.sum((a > 0) & (b > 0) & mask)

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    scores = jnp.stack([depth_score(R, tt) for R, tt in cands])
    k = jnp.argmax(scores)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return Rs[k], ts[k]


def ransac_5pt_mono(
    f_ref: jax.Array,
    f_cur: jax.Array,
    mask: jax.Array,
    key: jax.Array,
    *,
    n_hyp: int = 128,
    threshold: float = 1e-6,
):
    """Essential-matrix RANSAC (the reference's Nister 5-pt role,
    Tracker.cpp:213-319) as batched 8-point hypotheses.

    Returns (R_ref_cur, t_unit, inliers, n_inliers)."""
    n = f_ref.shape[0]
    idx = _sample_indices(key, n_hyp, 8, n, mask.astype(jnp.float32))
    E_hyp = jax.vmap(
        lambda ii: _essential_from_8pt(f_ref[ii], f_cur[ii])
    )(idx)  # (n_hyp, 3, 3)
    res = jax.vmap(lambda E: _epipolar_residual_sq(E, f_ref, f_cur))(E_hyp)
    inl = (res < threshold) & mask[None, :]
    scores = inl.sum(-1)
    best = jnp.argmax(scores)
    inliers = inl[best]
    # Refit E on the best inlier set (weighted 8-point over all inliers).
    w = inliers.astype(f_ref.dtype)[:, None]
    A = jnp.einsum("ni,nj->nij", f_ref * w, f_cur).reshape(-1, 9)
    M = A.T @ A
    _, vecs = jnp.linalg.eigh(M)
    E = vecs[:, 0].reshape(3, 3)
    U, s, Vt = jnp.linalg.svd(E)
    E = U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], E.dtype)) @ Vt
    R, t = decompose_essential(E, f_ref, f_cur, inliers)
    return R, t, inliers, scores[best]


# ---------------------------------------------------------------------------
# Stereo (3D-3D) solvers
# ---------------------------------------------------------------------------


def _arun(p_ref: jax.Array, p_cur: jax.Array, w: jax.Array):
    """Weighted closed-form 3D-3D alignment (Arun/Umeyama, no scale):
    returns (R, t) with p_ref ~ R p_cur + t."""
    wsum = jnp.maximum(w.sum(), 1e-9)
    mu_r = jnp.einsum("n,ni->i", w, p_ref) / wsum
    mu_c = jnp.einsum("n,ni->i", w, p_cur) / wsum
    X = p_cur - mu_c
    Y = p_ref - mu_r
    H = jnp.einsum("n,ni,nj->ij", w, X, Y)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 0.0], H.dtype)) + jnp.diag(
        jnp.array([0.0, 0.0, 1.0], H.dtype)
    ) * d
    R = Vt.T @ D @ U.T
    t = mu_r - R @ mu_c
    return R, t


def ransac_3pt_arun(
    p_ref: jax.Array,  # (N,3) 3D points in ref frame
    p_cur: jax.Array,  # (N,3) 3D points in cur frame
    mask: jax.Array,
    key: jax.Array,
    *,
    n_hyp: int = 128,
    threshold: float = 0.1,  # meters (3D alignment residual)
):
    """3-point Arun 3d3d RANSAC (reference Tracker.cpp:667-742).

    Returns (R_ref_cur, t, inliers, n_inliers)."""
    n = p_ref.shape[0]
    idx = _sample_indices(key, n_hyp, 3, n, mask.astype(jnp.float32))
    w3 = jnp.ones(3, p_ref.dtype)
    Rs, ts = jax.vmap(lambda ii: _arun(p_ref[ii], p_cur[ii], w3))(idx)
    pred = jnp.einsum("hij,nj->hni", Rs, p_cur) + ts[:, None, :]
    res = jnp.linalg.norm(pred - p_ref[None], axis=-1)
    inl = (res < threshold) & mask[None, :]
    scores = inl.sum(-1)
    best = jnp.argmax(scores)
    inliers = inl[best]
    R, t = _arun(p_ref, p_cur, inliers.astype(p_ref.dtype))
    return R, t, inliers, scores[best]


def stereo_point_cov_from_rect(fx, fy, cx, cy, baseline, uvd, pixel_sigma=1.0):
    """(..., 3, 3) covariance of backprojected stereo points wrt pixel noise
    on (uL, uR, v): J Sigma J^T with the analytic backprojection Jacobian
    (the reference uses gtsam StereoCamera::backproject2's Jacobian,
    Tracker.cpp:772-819). uvd: (..., 3) rectified [uL, uR, v]."""
    uL, uR, v = uvd[..., 0], uvd[..., 1], uvd[..., 2]
    d = jnp.maximum(uL - uR, 1e-6)
    z = fx * baseline / d
    xl = uL - cx
    yl = v - cy
    dz_duL = -z / d
    dz_duR = z / d
    # x = xl * z / fx
    dx_duL = (z + xl * dz_duL) / fx
    dx_duR = xl * dz_duR / fx
    dx_dv = jnp.zeros_like(z)
    # y = yl * z / fy
    dy_duL = yl * dz_duL / fy
    dy_duR = yl * dz_duR / fy
    dy_dv = z / fy
    dz_dv = jnp.zeros_like(z)
    J = jnp.stack(
        [
            jnp.stack([dx_duL, dx_duR, dx_dv], -1),
            jnp.stack([dy_duL, dy_duR, dy_dv], -1),
            jnp.stack([dz_duL, dz_duR, dz_dv], -1),
        ],
        axis=-2,
    )  # (..., 3, 3)
    return (pixel_sigma**2) * jnp.einsum("...ij,...kj->...ik", J, J)


def _inv3(M: jax.Array):
    """Batched closed-form 3x3 inverse (the reference hand-unrolls the same
    for speed, Tracker.cpp:497-542)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    inv = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), (b * f - c * e)], -1),
            jnp.stack([B, (a * i - c * g), -(a * f - c * d)], -1),
            jnp.stack([C, -(a * h - b * g), (a * e - b * d)], -1),
        ],
        axis=-2,
    )
    return inv / det[..., None, None]


def voting_1pt_stereo(
    p_ref: jax.Array,  # (N,3) stereo-backprojected points, ref rect frame
    p_cur: jax.Array,  # (N,3) points in cur rect frame
    cov_ref: jax.Array,  # (N,3,3)
    cov_cur: jax.Array,  # (N,3,3)
    mask: jax.Array,  # (N,)
    R_ref_cur: jax.Array,  # (3,3) known rotation (from PIM)
    *,
    threshold: float = 6.2514,  # chi2inv(0.9, 3) as in Tracker.cpp:484-490
):
    """The reference's custom 1-point translation voting solver
    (Tracker.cpp:393-620), exactly, as one [N,N] kernel:

    per-match translation v_i = p_ref_i - R p_cur_i with covariance
    M_i = cov_ref_i + R cov_cur_i R^T; pairwise Mahalanobis coherence
    d_ij = (v_i - v_j)^T (M_i + M_j)^{-1} (v_i - v_j) < threshold;
    inliers = densest coherent row; t = information-weighted mean.

    Returns (t (3,), inliers (N,), n_inliers)."""
    Rp = jnp.einsum("ij,nj->ni", R_ref_cur, p_cur)
    v = p_ref - Rp  # (N,3)
    M = cov_ref + jnp.einsum("ij,njk,lk->nil", R_ref_cur, cov_cur, R_ref_cur)

    dv = v[:, None, :] - v[None, :, :]  # (N,N,3)
    S = M[:, None] + M[None, :]  # (N,N,3,3)
    Sinv = _inv3(S)
    maha = jnp.einsum("abi,abij,abj->ab", dv, Sinv, dv)
    pair_ok = mask[:, None] & mask[None, :]
    coherent = (maha < threshold) & pair_ok  # includes diagonal (maha=0)
    counts = coherent.sum(-1)
    counts = jnp.where(mask, counts, 0)
    best = jnp.argmax(counts)
    inliers = coherent[best] & mask
    n_inl = counts[best]

    info = _inv3(M)  # (N,3,3)
    w = inliers.astype(v.dtype)
    total_info = jnp.einsum("n,nij->ij", w, info)
    rhs = jnp.einsum("n,nij,nj->i", w, info, v)
    t = jnp.linalg.solve(
        total_info + 1e-9 * jnp.eye(3, dtype=v.dtype), rhs
    )
    return t, inliers, n_inl


# ---------------------------------------------------------------------------
# PnP (2D-3D)
# ---------------------------------------------------------------------------


def _dlt_pnp(p_world: jax.Array, f_bearing: jax.Array, w: jax.Array):
    """Linear PnP from >=6 world-point/bearing pairs: estimate P = [R|t]
    (world -> camera) by DLT on the cross-product constraint
    f x (R p + t) = 0, then project R onto SO(3)."""
    # Constraint rows: [f]_x [p^T kron I3 | I3] vec = 0, vec = [r1 r2 r3 t].
    fx_hat = geo.hat(f_bearing)  # (N,3,3)
    # Build A (3N x 12): [f]_x @ [p0 I, p1 I, p2 I, I]; unknowns are the
    # stacked columns of R then t: vec = [c1; c2; c3; t], c_k = R[:, k].
    p = p_world
    blocks = [
        fx_hat * p[..., 0:1, None],
        fx_hat * p[..., 1:2, None],
        fx_hat * p[..., 2:3, None],
        fx_hat,
    ]
    A = jnp.concatenate(blocks, axis=-1)  # (N, 3, 12)
    A = A * w[:, None, None]
    A = A.reshape(-1, 12)
    M = A.T @ A
    _, vecs = jnp.linalg.eigh(M)
    vec = vecs[:, 0]

    def build(vec):
        R_est = jnp.stack([vec[0:3], vec[3:6], vec[6:9]], axis=1)  # cols
        t_est = vec[9:12]
        U, s, Vt = jnp.linalg.svd(R_est)
        scale = jnp.maximum(jnp.mean(s), 1e-12)
        det = jnp.linalg.det(U @ Vt)
        D = jnp.diag(jnp.array([1.0, 1.0, 0.0], vec.dtype)) + jnp.diag(
            jnp.array([0.0, 0.0, 1.0], vec.dtype)
        ) * det
        R = U @ D @ Vt
        t = t_est / scale
        depth = jnp.einsum(
            "ni,ni->n", jnp.einsum("ij,nj->ni", R, p_world) + t, f_bearing
        )
        score = jnp.sum(jnp.where(w > 0, (depth > 0).astype(vec.dtype), 0.0))
        return R, t, score

    # The DLT null vector has a global sign ambiguity; -R_est projects to a
    # different rotation, so evaluate both and keep the one with points in
    # front of the camera.
    R_p, t_p, s_p = build(vec)
    R_m, t_m, s_m = build(-vec)
    pick = s_p >= s_m
    R = jnp.where(pick, R_p, R_m)
    t = jnp.where(pick, t_p, t_m)
    return R, t


def ransac_pnp(
    p_world: jax.Array,  # (N,3) landmark positions (world)
    f_bearing: jax.Array,  # (N,3) unit bearings in camera frame
    mask: jax.Array,
    key: jax.Array,
    *,
    n_hyp: int = 128,
    threshold: float = 1.0,  # angular residual in pixels-at-focal ~ rad*f
    focal: float = 450.0,
):
    """Batched linear-PnP RANSAC (reference PnP tracking,
    Tracker.cpp:1163-1270). Returns (R_cw, t_cw, inliers, n_inliers) with
    x_cam = R_cw x_world + t_cw."""
    n = p_world.shape[0]
    idx = _sample_indices(key, n_hyp, 6, n, mask.astype(jnp.float32))
    w6 = jnp.ones(6, p_world.dtype)
    Rs, ts = jax.vmap(lambda ii: _dlt_pnp(p_world[ii], f_bearing[ii], w6))(idx)
    pred = jnp.einsum("hij,nj->hni", Rs, p_world) + ts[:, None, :]
    pred_n = pred / jnp.maximum(
        jnp.linalg.norm(pred, axis=-1, keepdims=True), 1e-12
    )
    # Angular residual scaled by focal length ~ pixel reprojection error.
    cos = jnp.clip(jnp.einsum("hni,ni->hn", pred_n, f_bearing), -1.0, 1.0)
    res_px = focal * jnp.sqrt(jnp.maximum(1.0 - cos**2, 0.0))
    inl = (res_px < threshold) & mask[None, :] & (cos > 0)
    scores = inl.sum(-1)
    best = jnp.argmax(scores)
    inliers = inl[best]
    R, t = _dlt_pnp(p_world, f_bearing, inliers.astype(p_world.dtype))
    return R, t, inliers, scores[best]


# ---------------------------------------------------------------------------
# Loop-pose refinement (the reference's optional GTSAM refinement of the
# recovered loop pose, LoopClosureDetector::refinePoses,
# /root/reference/src/loopclosure/LoopClosureDetector.cpp:979: a small
# NonlinearFactorGraph over the inlier correspondences re-optimizes the
# RANSAC pose). TPU-native: fixed-iteration IRLS / Gauss-Newton, jittable.
# ---------------------------------------------------------------------------


def refine_arun_huber(
    p_ref: jax.Array,  # (N,3) points in ref (match) frame
    p_cur: jax.Array,  # (N,3) points in cur (query) frame
    inliers: jax.Array,  # (N,) bool RANSAC inlier set
    R0: jax.Array,
    t0: jax.Array,
    *,
    huber_m: float = 0.10,
    iters: int = 5,
):
    """Robust 3D-3D loop-pose refinement: IRLS-weighted Arun with a Huber
    kernel on the alignment residual ||p_ref - (R p_cur + t)||. Each
    iteration is a closed-form weighted alignment, so the whole refine is
    `iters` SVDs — the role of the reference's BetweenFactorPoint3 graph
    (refinePoses, LoopClosureDetector.cpp:979-1045) without an iterative
    linear solver."""
    base_w = inliers.astype(p_ref.dtype)

    def step(carry, _):
        R, t = carry
        res = jnp.linalg.norm(p_ref - (p_cur @ R.T + t), axis=-1)
        w = base_w * jnp.minimum(1.0, huber_m / jnp.maximum(res, 1e-12))
        return _arun(p_ref, p_cur, w), None

    (R, t), _ = jax.lax.scan(step, (R0, t0), None, length=iters)
    return R, t


def refine_pnp_gn(
    p_world: jax.Array,  # (N,3) landmark positions (match frame)
    f_bearing: jax.Array,  # (N,3) unit bearings in query camera frame
    inliers: jax.Array,  # (N,) bool RANSAC inlier set
    R0: jax.Array,  # initial R_cw (x_cam = R_cw x_world + t_cw)
    t0: jax.Array,
    *,
    focal: float = 450.0,
    huber_px: float = 3.0,
    iters: int = 8,
):
    """Reprojection Gauss-Newton refinement of a PnP pose (kPnP flavor of
    the reference's refinePoses role): minimize the Huber-weighted
    bearing residual focal * (normalize(R x + t) - b) over a 6-dof twist
    (left-multiplied rotation perturbation + translation delta). Fixed
    iteration count keeps it jittable; each step is a 6x6 solve."""
    from kimera_vio_tpu.common.geometry import so3_exp

    base_w = inliers.astype(p_world.dtype)

    def residual(params, R, t):
        Rp = so3_exp(params[:3]) @ R
        pred = p_world @ Rp.T + (t + params[3:])
        pred_n = pred / jnp.maximum(
            jnp.linalg.norm(pred, axis=-1, keepdims=True), 1e-12
        )
        return focal * (pred_n - f_bearing).reshape(-1)  # (3N,)

    def step(carry, _):
        R, t = carry
        z6 = jnp.zeros(6, p_world.dtype)
        r = residual(z6, R, t)  # (3N,)
        # Huber IRLS weights on the per-point residual norm.
        rn = jnp.linalg.norm(r.reshape(-1, 3), axis=-1)
        w = base_w * jnp.minimum(1.0, huber_px / jnp.maximum(rn, 1e-12))
        w3 = jnp.repeat(w, 3)
        J = jax.jacfwd(residual)(z6, R, t)  # (3N, 6)
        H = J.T @ (J * w3[:, None]) + 1e-6 * jnp.eye(6, dtype=J.dtype)
        g = J.T @ (r * w3)
        dx = -jnp.linalg.solve(H, g)
        return (so3_exp(dx[:3]) @ R, t + dx[3:]), None

    (R, t), _ = jax.lax.scan(step, (R0, t0), None, length=iters)
    return R, t
