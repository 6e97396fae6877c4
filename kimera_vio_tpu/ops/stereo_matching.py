"""Sparse epipolar stereo matching as a batched template-match op.

TPU-native rebuild of StereoMatcher::searchRightKeypointEpipolar
(reference src/frontend/StereoMatcher.cpp:283-423): for every left keypoint,
an 11x101 template around the (rounded) rectified position is slid along a
disparity-bounded stripe of the same rows in the rectified right image;
the SSD minimum gives the right keypoint; disparity->depth gating with
min/max point distance follows (StereoMatcher.cpp:425-483).

Batched formulation: the per-keypoint stripes are gathered with one aligned
dynamic slice each (vmap), then ALL keypoints' sliding SSDs are computed in
a single grouped convolution (keypoints = channel groups):

    SSD(d) = sum(T^2) - 2 * corr(T, S)(d) + boxsum(S^2)(d)

which XLA lowers onto the MXU. Subpixel disparity comes from a parabola fit
over the SSD minimum's neighbors (the reference optionally re-runs
cornerSubPix; parabola on the matching cost is the standard equivalent).

The match-quality gate uses the normalized SSD score (SQDIFF_NORMED-style);
note the reference min-max-normalizes the score map and thresholds its
minimum, which is identically zero, so its `toleranceTemplateMatching` gate
never rejects — the effective contract is "best SSD along the stripe +
depth-range gating", which is reproduced here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def match_stereo(
    left_rect: jax.Array,  # (H, W) rectified left image
    right_rect: jax.Array,  # (H, W) rectified right image
    uv_rect: jax.Array,  # (N, 2) left keypoints (rectified coords)
    valid: jax.Array,  # (N,)
    *,
    fx: jax.Array,
    baseline: jax.Array,
    templ_cols: int = 101,
    templ_rows: int = 11,
    stripe_extra_rows: int = 0,
    max_disparity: int = 128,  # static: >= fx*b/min_depth + slack
    min_point_dist: float = 0.5,
    max_point_dist: float = 10.0,
    tolerance: float = 0.15,
):
    """Returns (uv_right (N,2), depth (N,), ok (N,)).

    `max_disparity` must be a static bound covering fx*b/min_point_dist;
    the dynamic depth gates still apply exactly.
    """
    H, W = left_rect.shape
    N = uv_rect.shape[0]
    left = left_rect.astype(jnp.float32)
    right = right_rect.astype(jnp.float32)
    # Clamp the static geometry to the image (small test/crop images):
    # the reference's template/stripe sizes assume VGA-class frames.
    tc = min(templ_cols, W)
    tr = min(templ_rows, H)
    max_disparity = min(max_disparity, W - tc)
    sr = min(tr + stripe_extra_rows, H)
    n_disp = max_disparity + 1
    stripe_cols = tc + max_disparity

    # Integer anchor (reference rounds the left keypoint).
    xi = jnp.round(uv_rect[:, 0]).astype(jnp.int32)
    yi = jnp.round(uv_rect[:, 1]).astype(jnp.int32)

    # Template top-left in left image; clamp like the reference offsets.
    tx0 = jnp.clip(xi - (tc - 1) // 2, 0, W - tc)
    ty0 = jnp.clip(yi - (tr - 1) // 2, 0, H - tr)
    # Stripe: covers right-image columns [x_templ_right_edge - stripe_cols,
    # ...]; i.e. disparities 0..max_disparity for this template placement.
    sx0 = jnp.clip(tx0 - max_disparity, 0, W - stripe_cols)
    sy0 = jnp.clip(yi - (sr - 1) // 2, 0, H - sr)

    def slice_templ(x0, y0):
        return jax.lax.dynamic_slice(left, (y0, x0), (tr, tc))

    def slice_stripe(x0, y0):
        return jax.lax.dynamic_slice(right, (y0, x0), (sr, stripe_cols))

    T = jax.vmap(slice_templ)(tx0, ty0)  # (N, tr, tc)
    S = jax.vmap(slice_stripe)(sx0, sy0)  # (N, sr, stripe_cols)

    # Grouped correlation: keypoints as channel groups, one conv for all.
    # input (1, N, sr, stripe_cols), kernel (N, 1, tr, tc) -> (1, N, sv, n_disp)
    def gconv(x, k):
        return jax.lax.conv_general_dilated(
            x[None],
            k[:, None],
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=N,
        )[0]

    corr = gconv(S, T)  # (N, sv, n_disp) with sv = sr - tr + 1
    ones = jnp.ones_like(T)
    s2 = gconv(S * S, ones)
    t2 = jnp.sum(T * T, axis=(-2, -1))[:, None, None]
    ssd = t2 - 2.0 * corr + s2  # (N, sv, n_disp)
    # Collapse the (tiny) vertical search dim: best row offset per disparity.
    ssd = jnp.min(ssd, axis=1)  # (N, n_disp)

    # Invalidate stripe positions that fell outside the true image (the
    # clamped slice re-reads in-image data at wrong disparities). Compute
    # the disparity each stripe column actually represents.
    # Column d of ssd corresponds to template x-position sx0 + d in right
    # image; disparity = tx0 - (sx0 + d).
    d_idx = jnp.arange(n_disp)[None, :]
    disparity_at = (tx0[:, None] - (sx0[:, None] + d_idx)).astype(jnp.float32)
    feasible = disparity_at >= 0.0
    big = jnp.float32(3.4e38)
    ssd = jnp.where(feasible, ssd, big)

    best = jnp.argmin(ssd, axis=1)  # (N,)
    take = lambda arr, idx: jnp.take_along_axis(arr, idx[:, None], axis=1)[:, 0]
    best_ssd = take(ssd, best)
    # Parabola subpixel on the cost around the minimum.
    bm1 = jnp.clip(best - 1, 0, n_disp - 1)
    bp1 = jnp.clip(best + 1, 0, n_disp - 1)
    c0 = take(ssd, bm1)
    c1 = best_ssd
    c2 = take(ssd, bp1)
    denom = c0 - 2 * c1 + c2
    delta = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (c0 - c2) / jnp.where(jnp.abs(denom) > 1e-6, denom, 1.0), 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)

    disp_int = take(disparity_at, best)
    disparity = disp_int - delta  # subpixel: larger d index = smaller disp
    # Right keypoint: uR = (template center x) - disparity, with the true
    # (unrounded) left coordinate re-applied so disparity stays consistent.
    uR = uv_rect[:, 0] - disparity
    vR = uv_rect[:, 1]

    # Normalized match quality (SQDIFF_NORMED).
    s2_best = take(jnp.min(s2, axis=1), best)
    norm = jnp.sqrt(jnp.maximum(t2[:, 0, 0] * s2_best, 1e-12))
    score = best_ssd / norm

    # Texture gate: a (near-)constant template matches everywhere, so its
    # "best" disparity is arbitrary. The reference never hits this case
    # (only corner keypoints reach the matcher); we reject it explicitly.
    t_mean = jnp.mean(T, axis=(-2, -1), keepdims=True)
    t_var = jnp.mean((T - t_mean) ** 2, axis=(-2, -1))
    textured = t_var > 1.0  # intensity units^2 on 0..255 images

    # Depth from disparity + gates (StereoMatcher::getDepthFromRectifiedMatches).
    safe_disp = jnp.maximum(disparity, 1e-3)
    depth = fx * baseline / safe_disp
    ok = (
        valid
        & (disparity > 0.5)
        & (depth >= min_point_dist)
        & (depth <= max_point_dist)
        & (score < tolerance)
        & textured
        & (yi >= (tr - 1) // 2)
        & (yi < H - (tr - 1) // 2)
        & jnp.isfinite(score)
    )
    uv_right = jnp.stack([uR, vR], axis=-1)
    return uv_right, depth, ok


def dense_stereo(
    left_rect: jax.Array,  # (H,W) rectified left
    right_rect: jax.Array,  # (H,W) rectified right
    *,
    min_disparity: int = 0,
    num_disparities: int = 64,
    block_size: int = 9,
    uniqueness_ratio: float = 1.05,
    subpixel: bool = True,
    lr_check: bool = False,
    lr_max_diff: float = 1.0,
    prefilter_xsobel: bool = False,
    prefilter_cap: float = 31.0,
):
    """Dense block-matching disparity map — the role of the reference's
    StereoBM/SGBM passthrough (StereoMatcher::denseStereoReconstruction,
    StereoMatcher.cpp:32-121), TPU-native: the SAD cost volume is a
    lax.scan over disparities of box-filtered absolute differences (one
    shifted elementwise pass per disparity, no per-pixel gathers), then
    argmin + OpenCV-style uniqueness (second-best excludes the +-1
    neighborhood of the winner) + 3-tap parabola subpixel refinement.

    `prefilter_xsobel=True` matches on the clamped horizontal Sobel
    response instead of raw intensity — cv::StereoBM's PREFILTER_XSOBEL
    stage. This is what makes BM robust to stereo exposure differences;
    measured on a MicroEuroc pair it lifts cv2.StereoBM agreement from
    65% to 99.8% of pixels within 2 px.

    `lr_check=True` additionally runs the right-view winner-take-all on
    the SAME cost volume (costR[d, y, xr] = costL[d, y, xr + d], a roll —
    no second matching pass) and rejects pixels whose left and right
    disparities disagree by more than `lr_max_diff` (the role of
    StereoBM's disp12MaxDiff / SGBM's disp_12_max_diff_, reference
    dense-stereo params StereoMatchingParams.h).

    Returns (disparity (H,W) float32, valid (H,W) bool)."""
    from kimera_vio_tpu.ops.corner_detection import _conv2d

    H, W = left_rect.shape
    L = left_rect.astype(jnp.float32)
    R = right_rect.astype(jnp.float32)
    if prefilter_xsobel:
        kx = np.array(
            [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32
        ) / 8.0
        cap = jnp.float32(prefilter_cap)
        L = jnp.clip(_conv2d(L, kx), -cap, cap) + cap
        R = jnp.clip(_conv2d(R, kx), -cap, cap) + cap
    r = block_size // 2
    kcol = np.ones((block_size, 1), np.float32)
    big = jnp.float32(1e30)
    x = jnp.arange(W)

    def one_cost(_, d):
        Rs = jnp.roll(R, d, axis=1)  # Rs[y,x] = R[y, x-d]
        ad = jnp.abs(L - Rs)
        c = _conv2d(_conv2d(ad, kcol), kcol.T)
        c = jnp.where(
            (x[None, :] >= d + r) & (x[None, :] < W - r), c, big
        )
        if not lr_check:
            return None, c
        # Right-view cost at right pixel xr is the left cost at xr + d.
        cr = jnp.roll(c, -d, axis=1)
        cr = jnp.where(
            (x[None, :] >= r) & (x[None, :] < W - d - r), cr, big
        )
        return None, (c, cr)

    ds = jnp.arange(min_disparity, min_disparity + num_disparities)
    if lr_check:
        _, (costs, costs_r) = jax.lax.scan(one_cost, None, ds)  # (D,H,W)
    else:
        _, costs = jax.lax.scan(one_cost, None, ds)

    best_i = jnp.argmin(costs, axis=0)  # (H,W) index into ds
    best = jnp.min(costs, axis=0)
    # Uniqueness: second-best outside the winner's +-1 neighborhood.
    di = jnp.arange(num_disparities)
    near = jnp.abs(di[:, None, None] - best_i[None]) <= 1
    second = jnp.min(jnp.where(near, big, costs), axis=0)

    disparity = (best_i + min_disparity).astype(jnp.float32)
    if subpixel:
        cm1 = jnp.take_along_axis(
            costs, jnp.clip(best_i - 1, 0, num_disparities - 1)[None], axis=0
        )[0]
        cp1 = jnp.take_along_axis(
            costs, jnp.clip(best_i + 1, 0, num_disparities - 1)[None], axis=0
        )[0]
        denom = cm1 + cp1 - 2.0 * best
        delta = jnp.where(
            denom > 1e-6, 0.5 * (cm1 - cp1) / jnp.maximum(denom, 1e-6), 0.0
        )
        disparity = disparity + jnp.clip(delta, -0.5, 0.5)

    valid = (
        (best < big * 0.5)
        & (second >= best * uniqueness_ratio)
        & (best_i > 0)
        & (best_i < num_disparities - 1)
    )
    if lr_check:
        # D_R at right pixel xr = x - D_L(x); disagreement kills the match.
        best_r = (
            jnp.argmin(costs_r, axis=0) + min_disparity
        ).astype(jnp.float32)
        xr = jnp.clip(
            x[None, :] - jnp.round(disparity).astype(jnp.int32), 0, W - 1
        )
        d_r_at = jnp.take_along_axis(best_r, xr, axis=1)
        valid = valid & (jnp.abs(d_r_at - disparity) <= lr_max_diff)
    return disparity, valid


def dense_depth(
    left_rect: jax.Array,
    right_rect: jax.Array,
    *,
    fx: float,
    baseline: float,
    min_depth: float = 0.1,
    max_depth: float = 15.0,
    num_disparities: int = 64,
    block_size: int = 9,
):
    """Dense metric depth image from a rectified stereo pair: the depth
    source the mesh-refinement path (MeshOptimization.cpp) expects on
    stereo (non-RGB-D) sequences. Invalid / out-of-range pixels are 0
    (the RGB-D convention used by _refine_mesh / optimize_mesh).
    """
    disparity, valid = dense_stereo(
        left_rect,
        right_rect,
        num_disparities=num_disparities,
        block_size=block_size,
        lr_check=True,
        prefilter_xsobel=True,
    )
    depth = fx * baseline / jnp.maximum(disparity, 1e-3)
    ok = valid & (depth >= min_depth) & (depth <= max_depth)
    return jnp.where(ok, depth, 0.0)
