"""Pyramidal Lucas-Kanade feature tracking, batched over keypoints.

TPU-native rebuild of the reference tracking hot loop —
cv::calcOpticalFlowPyrLK with OPTFLOW_USE_INITIAL_FLOW as called from
Tracker::featureTracking (reference src/frontend/Tracker.cpp:137-146) — and
of the rotational optical-flow predictor
(src/frontend/OpticalFlowPredictor.cpp:70-126).

Key design decision (the "one gather per iteration" trick): sampling a
(W x W) patch at a fractional position is done as ONE integer-aligned
dynamic slice of (W+1 x W+1), followed by a 4-tap bilinear blend with
*scalar* weights — the fractional offset is shared by every pixel of the
patch. This turns the classic per-pixel bilinear gather (576 gathers/patch)
into 1 gather + VPU math, which is the shape TPUs want. `vmap` over
keypoints batches the gathers.

Per pyramid level the spatial-gradient matrix G is computed once from the
previous image (matching OpenCV), then a `lax.while_loop` iterates the flow
update until every keypoint moved < eps or max_iter is hit — convergence is
evaluated for the whole batch, preserving static shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from kimera_vio_tpu.ops.corner_detection import _conv2d

# 5-tap binomial kernel used by cv::pyrDown.
_PYR_K = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def pyr_down(img: jax.Array) -> jax.Array:
    """Gaussian blur + 2x decimation (cv::pyrDown equivalent).

    Decimating rows between the separable passes halves the horizontal
    conv's work (exact: the kept output samples only read kept rows)."""
    k = _PYR_K
    v = _conv2d(img, k[:, None])[::2, :]
    return _conv2d(v, k[None, :])[:, ::2]


def build_pyramid(img: jax.Array, max_level: int) -> list[jax.Array]:
    """List of images, level 0 = full res ... max_level = coarsest."""
    levels = [img.astype(jnp.float32)]
    for _ in range(max_level):
        levels.append(pyr_down(levels[-1]))
    return levels


# 3-tap Scharr, as used by cv::calcOpticalFlowPyrLK's gradient pass.
_DERIV_X = np.array([[-3, 0, 3], [-10, 0, 10], [-3, 0, 3]], np.float32) / 32.0
_DERIV_Y = _DERIV_X.T


def _grad(img):
    return _conv2d(img, _DERIV_X), _conv2d(img, _DERIV_Y)


def _sample_patch(img: jax.Array, center: jax.Array, win: int) -> jax.Array:
    """Bilinear (win x win) patch around fractional `center` (x, y).

    One aligned (win+1, win+1) dynamic slice + scalar-weight 4-tap blend.
    dynamic_slice clamps at borders (callers gate with bounds checks)."""
    H, W = img.shape
    half = (win - 1) * 0.5
    x0f = center[0] - half
    y0f = center[1] - half
    x0 = jnp.floor(x0f)
    y0 = jnp.floor(y0f)
    fx = x0f - x0
    fy = y0f - y0
    xi = jnp.clip(x0.astype(jnp.int32), 0, W - win - 1)
    yi = jnp.clip(y0.astype(jnp.int32), 0, H - win - 1)
    raw = jax.lax.dynamic_slice(img, (yi, xi), (win + 1, win + 1))
    w00 = (1 - fx) * (1 - fy)
    w01 = fx * (1 - fy)
    w10 = (1 - fx) * fy
    w11 = fx * fy
    return (
        w00 * raw[:-1, :-1]
        + w01 * raw[:-1, 1:]
        + w10 * raw[1:, :-1]
        + w11 * raw[1:, 1:]
    )


def _track_level(
    prev_img,
    prev_Ix,
    prev_Iy,
    cur_img,
    prev_pts,  # (N,2) positions at this level
    cur_pts,  # (N,2) current flow guess at this level
    valid,  # (N,)
    win: int,
    max_iter: int,
    eps: float,
    min_eig_thresh: float,
    is_level0: bool,
):
    """One pyramid level of LK for all keypoints. Returns (cur_pts, ok)."""
    H, W = prev_img.shape
    # Edge-replicate padding so windows may straddle the image border, as
    # cv::buildOpticalFlowPyramid does with its winSize border.
    pad = win // 2 + 2
    off = jnp.array([pad, pad], prev_img.dtype)
    pp = lambda im: jnp.pad(im, pad, mode="edge")
    prev_p, cur_p, Ix_p, Iy_p = pp(prev_img), pp(cur_img), pp(prev_Ix), pp(prev_Iy)

    sample = jax.vmap(lambda c: _sample_patch(cur_p, c + off, win))
    sample_prev = jax.vmap(lambda c: _sample_patch(prev_p, c + off, win))
    sample_gx = jax.vmap(lambda c: _sample_patch(Ix_p, c + off, win))
    sample_gy = jax.vmap(lambda c: _sample_patch(Iy_p, c + off, win))

    tmpl = sample_prev(prev_pts)  # (N, win, win)
    gx = sample_gx(prev_pts)
    gy = sample_gy(prev_pts)

    # Spatial gradient matrix per keypoint (constant over iterations).
    gxx = jnp.sum(gx * gx, axis=(-2, -1))
    gxy = jnp.sum(gx * gy, axis=(-2, -1))
    gyy = jnp.sum(gy * gy, axis=(-2, -1))
    det = gxx * gyy - gxy * gxy
    # Minimum eigenvalue per unit area — OpenCV's track-quality gate.
    half_tr = 0.5 * (gxx + gyy)
    min_eig = (half_tr - jnp.sqrt(jnp.maximum(half_tr**2 - det, 0.0))) / (
        win * win
    )
    good_g = (min_eig > min_eig_thresh) & valid
    safe_det = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    inv00 = gyy / safe_det
    inv01 = -gxy / safe_det
    inv11 = gxx / safe_det

    def cond(state):
        it, pts, moving = state
        return (it < max_iter) & moving.any()

    def body(state):
        it, pts, moving = state
        cur = sample(pts)
        dI = cur - tmpl
        bx = jnp.sum(dI * gx, axis=(-2, -1))
        by = jnp.sum(dI * gy, axis=(-2, -1))
        dx = -(inv00 * bx + inv01 * by)
        dy = -(inv01 * bx + inv11 * by)
        step = jnp.stack([dx, dy], axis=-1)
        step = jnp.where((good_g & moving)[:, None], step, 0.0)
        new_pts = pts + step
        still = jnp.sum(step * step, axis=-1) >= eps * eps
        return it + 1, new_pts, moving & still

    _, pts, _ = jax.lax.while_loop(
        cond, body, (0, cur_pts, jnp.ones(cur_pts.shape[0], bool))
    )
    # Failure gates apply only at full resolution (OpenCV semantics): coarse
    # levels legitimately clamp windows at borders and have tiny images.
    if not is_level0:
        return pts, valid
    half = win * 0.5
    inb = (
        (pts[:, 0] >= half)
        & (pts[:, 0] < W - half)
        & (pts[:, 1] >= half)
        & (pts[:, 1] < H - half)
    )
    return pts, good_g & inb


# ---------------------------------------------------------------------------
# Matmul-form LK ("MXU LK"): the per-iteration bilinear window sample is
# expressed as two small batched matmuls against interpolation-weight
# matrices, instead of per-pixel gathers. TPUs run batched matmuls on the
# MXU at full rate while gathers crawl through the VPU — measured ~10x
# faster than the vmapped dynamic-slice formulation above at N=256.
#
#   window[n] = Wy[n] @ patch[n] @ Wx[n]^T
#
# where patch[n] is an (S,S) integer-aligned region extracted ONCE per
# level around the initial guess, and Wy/Wx are (win,S) two-hot bilinear
# weight rows built from iota: Wy[i,j] = max(0, 1-|off_y + i - j|).
# All `max_iter` iterations then run entirely in patch space (dense math,
# zero gathers). Points whose window would leave the patch (> `slack` px
# of drift from the initial guess) are clamped and flagged diverged — the
# same tracks cv::calcOpticalFlowPyrLK kills via its window-in-image and
# convergence gates.
# ---------------------------------------------------------------------------


# Precision of the matmul-form bilinear resample. HIGHEST keeps the f32
# image values exact through the MXU (3-pass); DEFAULT takes the bf16
# fast path (~1 gray-level rounding on 8-bit imagery). Overridable for
# the accuracy/throughput experiment (profile_tpu.py) via
# KIMERA_LK_PRECISION={default,high,highest}.
import os as _os

_PRECISION_MAP = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}
RESAMPLE_PRECISION = _PRECISION_MAP[
    _os.environ.get("KIMERA_LK_PRECISION", "highest").lower()
]


def _extract_patches(img: jax.Array, origin_yx: jax.Array, S: int) -> jax.Array:
    """(N,S,S) integer-aligned patches; origin_yx (N,2) int32 (y,x) in
    PADDED image coords. One vmapped dynamic_slice (the only gather)."""
    return jax.vmap(
        lambda o: jax.lax.dynamic_slice(img, (o[0], o[1]), (S, S))
    )(origin_yx)


def _resample_from_patch(patches, off_xy, win, precision):
    """Bilinear (N,win,win) windows from (N,S,S) patches.

    off_xy: (N,2) fractional (x,y) of the window origin in patch coords.
    Exact bilinear: weight rows have two adjacent nonzeros summing to 1."""
    N, S, _ = patches.shape
    i = jnp.arange(win, dtype=patches.dtype)
    j = jnp.arange(S, dtype=patches.dtype)
    dgrid = i[None, :, None] - j[None, None, :]
    Wy = jnp.maximum(0.0, 1.0 - jnp.abs(off_xy[:, 1, None, None] + dgrid))
    Wx = jnp.maximum(0.0, 1.0 - jnp.abs(off_xy[:, 0, None, None] + dgrid))
    tmp = jnp.einsum("nis,nst->nit", Wy, patches, precision=precision)
    return jnp.einsum("nit,njt->nij", tmp, Wx, precision=precision)


def _build_level_template(
    prev_img, prev_Ix, prev_Iy, prev_pts, valid, win, min_eig_thresh
):
    """Template data for one LK level: resampled template window, template
    gradients, inverse spatial-gradient matrix, and the min-eig quality
    gate. All of it depends only on the PREVIOUS (keyframe) image and the
    keypoint positions there, so the frontend computes it once per
    keyframe and carries it in state (the reference's analog: OpenCV
    re-derives this every call; caching it is free accuracy-neutral
    speed).

    When prev_Ix/prev_Iy are None, the Scharr gradients are computed ON
    the extracted patches instead of the full image — one image extraction
    + tiny per-patch shift-convs replaces three full-image passes + three
    extractions (the gather op count is what costs on TPU)."""
    St = win + 2
    prec = RESAMPLE_PRECISION
    half = (win - 1) * 0.5
    t_corner = jnp.floor(prev_pts - half)  # (N,2) float (x,y)
    t_origin = t_corner.astype(jnp.int32)
    t_off = prev_pts - half - t_corner  # in [0,1)
    if prev_Ix is None:
        Sg = St + 2  # +1 px ring for the 3x3 Scharr on the patch
        pad = Sg + 2
        img_p = jnp.pad(prev_img, pad, mode="edge")
        t_oyx = jnp.stack(
            [t_origin[:, 1] + pad - 1, t_origin[:, 0] + pad - 1], -1
        )
        raw = _extract_patches(img_p, t_oyx, Sg)  # (N,Sg,Sg)
        gxp = sum(
            float(_DERIV_X[dy, dx])
            * jax.lax.slice(raw, (0, dy, dx), (raw.shape[0], dy + St, dx + St))
            for dy in range(3)
            for dx in range(3)
            if _DERIV_X[dy, dx] != 0
        )
        gyp = sum(
            float(_DERIV_Y[dy, dx])
            * jax.lax.slice(raw, (0, dy, dx), (raw.shape[0], dy + St, dx + St))
            for dy in range(3)
            for dx in range(3)
            if _DERIV_Y[dy, dx] != 0
        )
        imgp = raw[:, 1 : 1 + St, 1 : 1 + St]
        flat = jnp.stack([imgp, gxp, gyp], axis=1).reshape(-1, St, St)
        off3 = jnp.repeat(t_off, 3, axis=0)
        res = _resample_from_patch(flat, off3, win, prec).reshape(
            -1, 3, win, win
        )
        tmpl, gx, gy = res[:, 0], res[:, 1], res[:, 2]
    else:
        pad = St + 2
        trio = jnp.stack([prev_img, prev_Ix, prev_Iy])
        trio_p = jnp.pad(trio, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
        t_oyx = jnp.stack([t_origin[:, 1] + pad, t_origin[:, 0] + pad], -1)
        patches3 = jax.vmap(
            lambda o: jax.lax.dynamic_slice(
                trio_p, (0, o[0], o[1]), (3, St, St)
            )
        )(t_oyx)  # (N,3,St,St)
        flat = patches3.reshape(-1, St, St)  # (3N,St,St)
        off3 = jnp.repeat(t_off, 3, axis=0)
        res = _resample_from_patch(flat, off3, win, prec).reshape(
            -1, 3, win, win
        )
        tmpl, gx, gy = res[:, 0], res[:, 1], res[:, 2]

    gxx = jnp.sum(gx * gx, axis=(-2, -1))
    gxy = jnp.sum(gx * gy, axis=(-2, -1))
    gyy = jnp.sum(gy * gy, axis=(-2, -1))
    det = gxx * gyy - gxy * gxy
    half_tr = 0.5 * (gxx + gyy)
    min_eig = (half_tr - jnp.sqrt(jnp.maximum(half_tr**2 - det, 0.0))) / (
        win * win
    )
    good_g = (min_eig > min_eig_thresh) & valid
    safe_det = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    return {
        "tmpl": tmpl,
        "gx": gx,
        "gy": gy,
        "inv00": gyy / safe_det,
        "inv01": -gxy / safe_det,
        "inv11": gxx / safe_det,
        "good_g": good_g,
    }


def build_lk_templates(
    prev_pyr,
    prev_pts,
    valid,
    *,
    win: int = 24,
    min_eig_thresh: float = 1e-4,
    prev_grads=None,
):
    """Per-level LK template cache for `klt_track_cached` (tuple of level
    dicts, coarsest-first ordering matches prev_pyr). Without prev_grads,
    gradients are computed on the extracted patches (cheaper than three
    full-image Scharr passes + extra extractions)."""
    n_levels = len(prev_pyr)
    out = []
    for lvl in range(n_levels):
        if min(prev_pyr[lvl].shape) < win + 2:
            out.append(None)
            continue
        pts_l = prev_pts / (2.0**lvl)
        Ix, Iy = prev_grads[lvl] if prev_grads is not None else (None, None)
        out.append(
            _build_level_template(
                prev_pyr[lvl], Ix, Iy, pts_l, valid, win, min_eig_thresh
            )
        )
    return tuple(out)


def _iterate_level_cached(
    T,
    cur_img,
    cur_pts,
    valid,
    win: int,
    max_iter: int,
    eps: float,
    is_level0: bool,
    slack: int = 8,
):
    """Iterate one LK level from cached template data. Returns
    (pts, ok, diverged)."""
    H, W = cur_img.shape
    S = win + 2 * slack + 2
    prec = RESAMPLE_PRECISION
    half = (win - 1) * 0.5
    pad = S
    cur_p = jnp.pad(cur_img, pad, mode="edge")
    tmpl, gx, gy = T["tmpl"], T["gx"], T["gy"]
    inv00, inv01, inv11 = T["inv00"], T["inv01"], T["inv11"]
    good_g = T["good_g"]

    # ---- search patch around the initial guess, iterate in patch space ----
    c_origin = (
        jnp.floor(cur_pts - half).astype(jnp.int32) - (slack + 1)
    )  # (N,2) int (x,y): initial off lands at slack+1+frac
    c_oyx = jnp.stack([c_origin[:, 1] + pad, c_origin[:, 0] + pad], -1)
    cur_patches = _extract_patches(cur_p, c_oyx, S)
    off_lo, off_hi = 0.0, float(S - win - 1)
    rel0 = cur_pts - c_origin.astype(cur_pts.dtype)  # position in patch coords

    def cond(state):
        it, rel, moving, diverged = state
        return (it < max_iter) & moving.any()

    def body(state):
        it, rel, moving, diverged = state
        off = rel - half
        off_c = jnp.clip(off, off_lo, off_hi)
        diverged = diverged | (jnp.abs(off - off_c) > 0.5).any(-1)
        cur = _resample_from_patch(cur_patches, off_c, win, prec)
        dI = cur - tmpl
        bx = jnp.sum(dI * gx, axis=(-2, -1))
        by = jnp.sum(dI * gy, axis=(-2, -1))
        dx = -(inv00 * bx + inv01 * by)
        dy = -(inv01 * bx + inv11 * by)
        step = jnp.stack([dx, dy], axis=-1)
        step = jnp.where((good_g & moving)[:, None], step, 0.0)
        new_rel = rel + step
        still = jnp.sum(step * step, axis=-1) >= eps * eps
        return it + 1, new_rel, moving & still, diverged

    _, rel, _, diverged = jax.lax.while_loop(
        cond,
        body,
        (0, rel0, jnp.ones(cur_pts.shape[0], bool), jnp.zeros(cur_pts.shape[0], bool)),
    )
    pts = rel + c_origin.astype(rel.dtype)
    if not is_level0:
        return pts, valid, diverged
    halfw = win * 0.5
    inb = (
        (pts[:, 0] >= halfw)
        & (pts[:, 0] < W - halfw)
        & (pts[:, 1] >= halfw)
        & (pts[:, 1] < H - halfw)
    )
    return pts, good_g & inb, diverged


def klt_track_matmul(
    prev_pyr: list[jax.Array],
    cur_pyr: list[jax.Array],
    prev_pts: jax.Array,
    init_pts: jax.Array,
    valid: jax.Array,
    *,
    win: int = 24,
    max_iter: int = 30,
    eps: float = 0.1,
    min_eig_thresh: float = 1e-4,
    prev_grads: list[tuple[jax.Array, jax.Array]] | None = None,
):
    """Pyramidal LK in matmul form (MXU-resident window sampling).

    Same contract as `klt_track`; tracks that drift more than ~8 px from
    their coarse-to-fine seed at any level are reported failed (the
    dense-gather version clamps them at the image border instead — both
    behaviors kill the same diverging tracks)."""
    templates = build_lk_templates(
        prev_pyr,
        prev_pts,
        valid,
        win=win,
        min_eig_thresh=min_eig_thresh,
        prev_grads=prev_grads,
    )
    return klt_track_cached(
        templates,
        cur_pyr,
        init_pts,
        valid,
        win=win,
        max_iter=max_iter,
        eps=eps,
    )


def klt_track_cached(
    templates,
    cur_pyr: list[jax.Array],
    init_pts: jax.Array,
    valid: jax.Array,
    *,
    win: int = 24,
    max_iter: int = 30,
    eps: float = 0.1,
):
    """Pyramidal LK against a cached template set (`build_lk_templates`).

    The per-frame work is only: extract one search patch per keypoint per
    level from the CURRENT pyramid + run the matmul-resampling iterations.
    Everything derived from the previous (keyframe) image comes from the
    cache."""
    n_levels = len(cur_pyr)
    scale_top = 2.0 ** (n_levels - 1)
    pts = init_pts / scale_top
    ok = valid
    diverged = jnp.zeros(init_pts.shape[0], bool)
    for lvl in range(n_levels - 1, -1, -1):
        if lvl != n_levels - 1:
            pts = pts * 2.0
        if templates[lvl] is None:
            continue
        pts, ok_lvl, div_lvl = _iterate_level_cached(
            templates[lvl],
            cur_pyr[lvl],
            pts,
            valid,
            win,
            max_iter,
            eps,
            lvl == 0,
        )
        ok = ok & ok_lvl
        diverged = diverged | div_lvl
    return pts, ok & ~diverged


def klt_track(
    prev_pyr: list[jax.Array],
    cur_pyr: list[jax.Array],
    prev_pts: jax.Array,  # (N,2) level-0 pixel coords
    init_pts: jax.Array,  # (N,2) initial flow guess (level 0)
    valid: jax.Array,  # (N,)
    *,
    win: int = 24,
    max_iter: int = 30,
    eps: float = 0.1,
    min_eig_thresh: float = 1e-4,
    prev_grads: list[tuple[jax.Array, jax.Array]] | None = None,
):
    """Pyramidal LK: track `prev_pts` from prev to cur images.

    `init_pts` seeds the level-0 search (OPTFLOW_USE_INITIAL_FLOW — the
    reference seeds with the rotation-predicted positions,
    Tracker.cpp:137-146). Returns (tracked_pts (N,2), ok (N,)).

    `prev_grads` optionally reuses the previous frame's per-level Scharr
    gradients (they only depend on prev_pyr, so the frontend caches them).
    """
    n_levels = len(prev_pyr)
    scale_top = 2.0 ** (n_levels - 1)
    pts = init_pts / scale_top
    base = prev_pts / scale_top
    ok = valid
    if prev_grads is None:
        prev_grads = [_grad(p) for p in prev_pyr]
    for lvl in range(n_levels - 1, -1, -1):
        if lvl != n_levels - 1:
            pts = pts * 2.0
            base = base * 2.0
        # Skip levels whose image cannot hold one window (OpenCV caps
        # maxLevel from winSize the same way).
        if min(prev_pyr[lvl].shape) < win + 2:
            continue
        Ix, Iy = prev_grads[lvl]
        pts, ok_lvl = _track_level(
            prev_pyr[lvl],
            Ix,
            Iy,
            cur_pyr[lvl],
            base,
            pts,
            valid,
            win,
            max_iter,
            eps,
            min_eig_thresh,
            lvl == 0,
        )
        ok = ok & ok_lvl
    return pts, ok


def predict_flow_rotational(
    uv: jax.Array,
    valid: jax.Array,
    R_cur_prev: jax.Array,
    K: jax.Array,
    K_inv: jax.Array,
    width: int,
    height: int,
) -> jax.Array:
    """Rotation-only optical-flow prediction: warp keypoints by the
    infinite-depth homography H = K R K^-1 (reference
    RotationalOpticalFlowPredictor, OpticalFlowPredictor.cpp:70-126).

    `R_cur_prev` rotates prev-camera coords into cur-camera coords.
    Out-of-image predictions fall back to the original position, as in the
    reference (clamp-to-source behavior)."""
    ones = jnp.ones_like(uv[..., :1])
    h = jnp.concatenate([uv, ones], axis=-1)
    rays = (K_inv @ h[..., None])[..., 0]
    rays = (R_cur_prev @ rays[..., None])[..., 0]
    proj = (K @ rays[..., None])[..., 0]
    z = proj[..., 2:3]
    good_z = z[..., 0] > 1e-6
    warped = proj[..., 0:2] / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    inb = (
        (warped[..., 0] >= 0)
        & (warped[..., 0] < width)
        & (warped[..., 1] >= 0)
        & (warped[..., 1] < height)
        & good_z
        & valid
    )
    return jnp.where(inb[..., None], warped, uv)
