"""Corner detection: GFTT/Harris response + binned ANMS top-k selection.

TPU-native rebuild of the reference `FeatureDetector`
(src/frontend/feature-detector/FeatureDetector.cpp:94-299):

  reference                                  | here
  -------------------------------------------+---------------------------------
  cv::goodFeaturesToTrack (GFTT, type 3)     | dense min-eigenvalue response
  cv::FastFeatureDetector (type 0)           | FAST-score response (approx)
  Harris (use_harris_detector)               | Harris response
  mask circles around existing tracks        | occupancy-grid suppression
  ANMS (SSC type 6 / binning type 7)         | per-bin top-k quota selection
  cv::cornerSubPix refinement                | batched gradient-centroid iter

Design notes (SURVEY.md §2.12 "TPU equivalents"): selection runs entirely on
device with static shapes — a dense response image is reduced with
`jax.lax.top_k` inside spatial bins, giving the spatial uniformity that SSC
provides in the reference while being one fused XLA program instead of a
sequential suppression loop. The output is a fixed-size (K, 2) keypoint
array + validity mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _conv2d(img: jax.Array, kernel: np.ndarray) -> jax.Array:
    """Same-padding 2D correlation of a single-channel image (H, W).

    Small kernels are applied as shifted adds (pad + static slices): XLA
    fuses these into a handful of VPU passes, whereas a C=1
    conv_general_dilated cannot use the MXU and lowers poorly on TPU
    (measured ~10x slower for the 3x3/5x1 kernels used here)."""
    k = np.asarray(kernel, np.float32)
    kh, kw = k.shape
    if kh * kw > 32:
        kj = jnp.asarray(k, img.dtype)
        return jax.lax.conv_general_dilated(
            img[None, None], kj[None, None], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[0, 0]
    H, W = img.shape
    ph, pw = kh // 2, kw // 2
    padded = jnp.pad(img, ((ph, kh - 1 - ph), (pw, kw - 1 - pw)))
    out = None
    for dy in range(kh):
        for dx in range(kw):
            c = float(k[dy, dx])
            if c == 0.0:
                continue
            term = c * jax.lax.slice(padded, (dy, dx), (dy + H, dx + W))
            out = term if out is None else out + term
    return out if out is not None else jnp.zeros_like(img)


_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32) / 8.0
_SOBEL_Y = _SOBEL_X.T
_SCHARR_X = np.array([[-3, 0, 3], [-10, 0, 10], [-3, 0, 3]], np.float32) / 32.0
_SCHARR_Y = _SCHARR_X.T


def image_gradients(img: jax.Array, scharr: bool = True):
    """(Ix, Iy) via Scharr (cv::Scharr, used by LK) or Sobel."""
    kx, ky = (_SCHARR_X, _SCHARR_Y) if scharr else (_SOBEL_X, _SOBEL_Y)
    return _conv2d(img, kx), _conv2d(img, ky)


def _box_filter(img: jax.Array, size: int) -> jax.Array:
    """Separable box sum over a size x size window (same padding)."""
    k1 = np.ones((size, 1), np.float32)
    return _conv2d(_conv2d(img, k1), k1.T)


def gftt_response(
    img: jax.Array, block_size: int = 3, use_harris: bool = False, k: float = 0.04
) -> jax.Array:
    """Dense GFTT (min eigenvalue of the structure tensor) or Harris
    response — the TPU equivalent of cv::cornerMinEigenVal / cornerHarris
    that backs cv::goodFeaturesToTrack (FeatureDetector.cpp:34-88)."""
    Ix, Iy = image_gradients(img, scharr=False)
    a = _box_filter(Ix * Ix, block_size)
    b = _box_filter(Ix * Iy, block_size)
    c = _box_filter(Iy * Iy, block_size)
    if use_harris:
        det = a * c - b * b
        tr = a + c
        return det - k * tr * tr
    half_tr = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.25 * (a - c) ** 2 + b * b, 0.0))
    return half_tr - disc  # min eigenvalue


def fast_score(img: jax.Array, thresh: float = 10.0) -> jax.Array:
    """Approximate FAST corner response: for the 16-pixel Bresenham circle,
    count of contiguous-ish brighter/darker neighbors approximated by the
    sum of clamped absolute differences exceeding `thresh`. A dense,
    branch-free stand-in for cv::FastFeatureDetector (detector type 0,
    FeatureDetector.cpp:48-56); selection semantics (threshold + NMS + ANMS)
    match the reference even though scores differ from OpenCV's exact
    segment-test score."""
    offsets = [
        (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    ]
    H, W = img.shape
    center = img
    diffs = []
    for dy, dx in offsets:
        shifted = jnp.roll(img, (-dy, -dx), axis=(0, 1))
        diffs.append(shifted - center)
    d = jnp.stack(diffs)  # (16, H, W)
    bright = jnp.maximum(d - thresh, 0.0)
    dark = jnp.maximum(-d - thresh, 0.0)
    return jnp.maximum(bright.sum(0), dark.sum(0))


def local_max_mask(resp: jax.Array, radius: int = 1) -> jax.Array:
    """True where resp is the maximum of its (2r+1)^2 neighborhood.

    Max-pooling is separable: two 1-D reduce_windows instead of one 2-D
    (the 2-D window costs O(size^2) per pixel; the pair O(size)) — matters
    because the radius scales with min_distance (see detect_features)."""
    size = 2 * radius + 1
    m = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max,
        window_dimensions=(size, 1), window_strides=(1, 1), padding="SAME",
    )
    m = jax.lax.reduce_window(
        m, -jnp.inf, jax.lax.max,
        window_dimensions=(1, size), window_strides=(1, 1), padding="SAME",
    )
    return resp >= m


def occupancy_suppression(
    resp: jax.Array,
    existing_uv: jax.Array,
    existing_mask: jax.Array,
    min_distance: float,
) -> jax.Array:
    """Zero out response in cells near existing features.

    The TPU-shaped version of the reference's mask-out-circles step
    (FeatureDetector.cpp:185-203): existing keypoints are rasterized into a
    coarse grid with cell size `min_distance`; response pixels whose 3x3
    grid-cell neighborhood is occupied are suppressed. This covers at least
    the min_distance circle (conservatively up to ~2x at diagonals).
    """
    H, W = resp.shape
    cell = max(int(min_distance), 1)
    gh = (H + cell - 1) // cell
    gw = (W + cell - 1) // cell
    gx = jnp.clip((existing_uv[:, 0] / cell).astype(jnp.int32), 0, gw - 1)
    gy = jnp.clip((existing_uv[:, 1] / cell).astype(jnp.int32), 0, gh - 1)
    grid = jnp.zeros((gh, gw), bool)
    grid = grid.at[gy, gx].max(existing_mask)
    # Dilate 3x3 so neighbors of occupied cells are also suppressed.
    grid_d = jax.lax.reduce_window(
        grid.astype(jnp.float32),
        0.0,
        jax.lax.max,
        window_dimensions=(3, 3),
        window_strides=(1, 1),
        padding="SAME",
    )
    # Blockwise upsample via repeat (a 360k-element 2D gather here measured
    # ~68 ms on TPU; repeat+crop is pure data movement).
    up = jnp.repeat(jnp.repeat(grid_d, cell, axis=0), cell, axis=1)
    occupied = up[:H, :W] > 0
    return jnp.where(occupied, -jnp.inf, resp)


def binned_topk_select(
    resp: jax.Array,
    k_total: int,
    nr_horizontal_bins: int = 7,
    nr_vertical_bins: int = 5,
    border: int = 4,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Select up to `k_total` keypoints, spatially spread via per-bin top-k.

    The TPU-native ANMS (SURVEY.md §2.12): the image is split into
    `nr_vertical_bins x nr_horizontal_bins` regions (reference binning ANMS,
    NonMaximumSuppression.cpp:125-169, and the spatial-uniformity contract
    of SSC type 6); each bin contributes its strongest corners up to a
    quota, then a global top-k over the pooled candidates enforces k_total.

    Returns (uv (k,2) float32, score (k,), valid (k,) bool).
    """
    H, W = resp.shape
    nb = nr_horizontal_bins * nr_vertical_bins
    quota = -(-k_total // nb) + 2  # per-bin overshoot; global top-k trims
    bh = -(-H // nr_vertical_bins)
    bw = -(-W // nr_horizontal_bins)
    Hp, Wp = bh * nr_vertical_bins, bw * nr_horizontal_bins
    # Suppress the image border (reference excludes border keypoints).
    ys = jnp.arange(H)
    xs = jnp.arange(W)
    border_ok = (
        (ys[:, None] >= border)
        & (ys[:, None] < H - border)
        & (xs[None, :] >= border)
        & (xs[None, :] < W - border)
    )
    r = jnp.where(border_ok, resp, -jnp.inf)
    r = jnp.pad(r, ((0, Hp - H), (0, Wp - W)), constant_values=-jnp.inf)
    # (vb, bh, hb, bw) -> (vb*hb, bh*bw)
    tiles = r.reshape(nr_vertical_bins, bh, nr_horizontal_bins, bw)
    tiles = tiles.transpose(0, 2, 1, 3).reshape(nb, bh * bw)
    scores, flat_idx = jax.lax.top_k(tiles, quota)  # (nb, quota)
    # Recover absolute pixel coordinates.
    in_y = flat_idx // bw
    in_x = flat_idx % bw
    bin_ids = jnp.arange(nb)
    by = (bin_ids // nr_horizontal_bins)[:, None] * bh
    bx = (bin_ids % nr_horizontal_bins)[:, None] * bw
    abs_y = by + in_y
    abs_x = bx + in_x
    pool_scores = scores.reshape(-1)
    pool_xy = jnp.stack([abs_x.reshape(-1), abs_y.reshape(-1)], axis=-1)
    top_scores, top_idx = jax.lax.top_k(pool_scores, k_total)
    uv = pool_xy[top_idx].astype(jnp.float32)
    valid = jnp.isfinite(top_scores) & (top_scores > 0)
    return uv, top_scores, valid


def subpixel_refine(
    img: jax.Array,
    uv: jax.Array,
    valid: jax.Array,
    window: int = 10,
    iters: int = 5,
) -> jax.Array:
    """Batched corner sub-pixel refinement, equivalent in role to
    cv::cornerSubPix (FeatureDetector.cpp:283-296).

    Solves, per keypoint, the cornerSubPix normal equations
    sum(grad gradT) q = sum(grad gradT p) over a (2*window+1)^2 patch,
    iterating a few times.

    TPU shape: gradients are extracted ONCE per keypoint as an (S,S)
    patch (S = window size + drift slack), and every iteration re-windows
    inside the patch with one-hot weight matmuls — zero per-iteration
    gathers, the same trick as the matmul-form LK."""
    Ix, Iy = image_gradients(img, scharr=False)
    H, W = img.shape
    size = 2 * window + 1
    slack = 2
    S = size + 2 * slack
    pad = S
    duo = jnp.stack([Ix, Iy])  # (2,H,W)
    duo_p = jnp.pad(duo, ((0, 0), (pad, pad), (pad, pad)))
    o = jnp.round(uv).astype(jnp.int32) - window - slack  # (N,2) patch org
    oyx = jnp.stack([o[:, 1] + pad, o[:, 0] + pad], -1)
    patches = jax.vmap(
        lambda oo: jax.lax.dynamic_slice(duo_p, (0, oo[0], oo[1]), (2, S, S))
    )(oyx)  # (N,2,S,S)
    Pgx, Pgy = patches[:, 0], patches[:, 1]

    i = jnp.arange(size, dtype=jnp.float32)
    j = jnp.arange(S, dtype=jnp.float32)
    ps = jnp.arange(size, dtype=jnp.float32) - window
    py, px = jnp.meshgrid(ps, ps, indexing="ij")
    prec = jax.lax.Precision.HIGHEST
    of = o.astype(jnp.float32)

    def body(_, uv_c):
        # Integer window origin within the patch (clamped to the slack).
        x0 = jnp.clip(
            jnp.round(uv_c[:, 0]) - window - of[:, 0], 0.0, 2.0 * slack
        )
        y0 = jnp.clip(
            jnp.round(uv_c[:, 1]) - window - of[:, 1], 0.0, 2.0 * slack
        )
        Wy = (jnp.abs(y0[:, None, None] + i[None, :, None] - j[None, None, :]) < 0.5).astype(jnp.float32)
        Wx = (jnp.abs(x0[:, None, None] + i[None, :, None] - j[None, None, :]) < 0.5).astype(jnp.float32)
        gx = jnp.einsum(
            "nis,nst,njt->nij", Wy, Pgx, Wx, precision=prec
        )
        gy = jnp.einsum(
            "nis,nst,njt->nij", Wy, Pgy, Wx, precision=prec
        )
        # Absolute patch pixel coordinates of the window.
        axx = px[None] + (x0 + of[:, 0] + window)[:, None, None]
        ayy = py[None] + (y0 + of[:, 1] + window)[:, None, None]
        gxx = gx * gx
        gxy = gx * gy
        gyy = gy * gy
        a = gxx.sum((-2, -1))
        b = gxy.sum((-2, -1))
        c = gyy.sum((-2, -1))
        b0 = (gxx * axx + gxy * ayy).sum((-2, -1))
        b1 = (gxy * axx + gyy * ayy).sum((-2, -1))
        det = a * c - b * b
        good = jnp.abs(det) > 1e-8
        safe_det = jnp.where(good, det, 1.0)
        sol = jnp.stack(
            [(c * b0 - b * b1) / safe_det, (-b * b0 + a * b1) / safe_det], -1
        )
        delta = jnp.clip(sol - uv_c, -float(window), float(window))
        return jnp.where(good[:, None], uv_c + delta, uv_c)

    out = jax.lax.fori_loop(0, iters, body, uv)
    return jnp.where(valid[:, None], out, uv)


def detect_features(
    img: jax.Array,
    existing_uv: jax.Array,
    existing_mask: jax.Array,
    k_new: int,
    *,
    detector_type: int = 3,
    quality_level: float = 0.001,
    min_distance: float = 20.0,
    block_size: int = 3,
    use_harris: bool = False,
    harris_k: float = 0.04,
    fast_thresh: float = 10.0,
    nr_horizontal_bins: int = 7,
    nr_vertical_bins: int = 5,
    do_subpixel: bool = True,
    subpix_window: int = 10,
    anms_type: int = 6,
    max_nr_keypoints_before_anms: int = 1024,
) -> tuple[jax.Array, jax.Array]:
    """Full detection pass: response -> NMS -> existing-feature suppression
    -> quality threshold -> ANMS -> subpixel refinement.

    Mirrors FeatureDetector::featureDetection (FeatureDetector.cpp:94-163).
    Returns (uv (k_new,2), valid (k_new,)). `k_new` is static.

    `anms_type` selects the suppression algorithm (AnmsAlgorithmType,
    NonMaximumSuppression.h:52-60): 6 = binning, the fused default — a
    per-bin top-k directly on the dense response; 0-5 route through
    ops/anms.py (TopN / BrownANMS / SDC / KdTree / RangeTree / SSC) over
    the `max_nr_keypoints_before_anms` strongest candidates, matching the
    reference's candidate-pool-then-suppress structure
    (FeatureDetector.cpp:174-299).
    """
    img = img.astype(jnp.float32)
    if detector_type == 0:
        resp = fast_score(img, fast_thresh)
    elif detector_type == 1:
        # ORB = FAST detection ranked by the Harris response (the cv::ORB
        # HARRIS_SCORE default): corners must pass the FAST ring test and
        # are ordered by Harris strength.
        fs = fast_score(img, fast_thresh)
        hr = gftt_response(img, block_size, use_harris=True, k=harris_k)
        resp = jnp.where(fs > 0, hr, -jnp.inf)
    elif detector_type == 2:
        # AGAST: unsupported — the reference LOG(FATAL)s on it too
        # (FeatureDetector.cpp:34-88).
        raise NotImplementedError("AGAST detector is not supported")
    else:  # 3 = GFTT (default); Harris via flag, like the reference GFTT
        resp = gftt_response(img, block_size, use_harris, harris_k)
    # NMS radius: for the fused binning path it scales with min_distance —
    # cv::goodFeaturesToTrack enforces minDistance among SELECTED corners
    # (greedily) and SSC enforces its adaptive radius; a (min_distance/2)-
    # radius local-max pass is the fused-kernel equivalent, guaranteeing
    # pairwise separation > min_distance/2 among new detections (measured
    # vs the SSC contract in tests/test_anms_uniformity.py). The explicit
    # ANMS algorithms (types 0-5) do their own spatial suppression, so
    # they get a plain radius-1 local max for the candidate pool.
    # (int() straight on min_distance: it may be a closed-over concrete
    # jnp scalar — any jnp arithmetic on it first would create a tracer
    # inside jit; plain int() of a constant stays host-side.)
    nms_radius = max(1, int(min_distance) // 2) if anms_type == 6 else 1
    resp = jnp.where(local_max_mask(resp, radius=nms_radius), resp, -jnp.inf)
    # Quality threshold relative to the global max (cv::goodFeaturesToTrack).
    resp = jnp.where(resp >= quality_level * resp.max(), resp, -jnp.inf)
    resp = occupancy_suppression(resp, existing_uv, existing_mask, min_distance)
    if anms_type == 6:
        uv, score, valid = binned_topk_select(
            resp, k_new, nr_horizontal_bins, nr_vertical_bins
        )
    else:
        from kimera_vio_tpu.ops import anms as anms_mod

        H, W = resp.shape
        m = min(max_nr_keypoints_before_anms, H * W)
        cand_scores, flat = jax.lax.top_k(resp.reshape(-1), m)
        cand_uv = jnp.stack(
            [(flat % W).astype(jnp.float32), (flat // W).astype(jnp.float32)],
            -1,
        )
        cand_ok = jnp.isfinite(cand_scores) & (cand_scores > 0)
        keep = anms_mod.suppress_non_max(
            cand_uv, cand_scores, cand_ok, k_new, anms_type, W, H
        )
        top_scores, sel = jax.lax.top_k(
            jnp.where(keep, cand_scores, -jnp.inf), k_new
        )
        uv = cand_uv[sel]
        valid = jnp.isfinite(top_scores) & (top_scores > 0)
    if do_subpixel:
        uv = subpixel_refine(img, uv, valid, window=subpix_window)
    return uv, valid
