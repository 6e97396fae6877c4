"""Stereo matching tests: synthetic disparity recovery (integer + subpixel),
depth gating, and behavior on textureless regions."""

import jax.numpy as jnp
import numpy as np
import pytest

from kimera_vio_tpu.ops.stereo_matching import match_stereo

FX = 450.0
BASELINE = 0.11


def textured(h=240, w=376, seed=0):
    rng = np.random.default_rng(seed)
    import scipy.ndimage as ndi

    img = rng.uniform(0, 255, (h // 4, w // 4)).astype(np.float32)
    return ndi.zoom(img, 4, order=3)[:h, :w].astype(np.float32)


def shifted_right(left, disparity):
    """Right image = left shifted left by `disparity` px (constant depth)."""
    import scipy.ndimage as ndi

    return ndi.shift(left, (0, -disparity), order=3, mode="nearest").astype(
        np.float32
    )


def run(left, right, pts, **kw):
    kwargs = dict(
        fx=jnp.float32(FX),
        baseline=jnp.float32(BASELINE),
        templ_cols=31,
        templ_rows=11,
        max_disparity=64,
        min_point_dist=0.5,
        max_point_dist=30.0,
    )
    kwargs.update(kw)
    uvr, depth, ok = match_stereo(
        jnp.asarray(left),
        jnp.asarray(right),
        jnp.asarray(pts, jnp.float32),
        jnp.ones(len(pts), bool),
        **kwargs,
    )
    return np.asarray(uvr), np.asarray(depth), np.asarray(ok)


def grid_pts(h, w, margin=50, step=30):
    ys, xs = np.mgrid[margin : h - margin : step, margin : w - margin : step]
    return np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)


def test_integer_disparity():
    left = textured()
    disp = 17.0
    right = shifted_right(left, disp)
    pts = grid_pts(240, 376)
    uvr, depth, ok = run(left, right, pts)
    assert ok.mean() > 0.9
    rec = pts[ok, 0] - uvr[ok, 0]
    np.testing.assert_allclose(rec, disp, atol=0.25)
    np.testing.assert_allclose(depth[ok], FX * BASELINE / disp, rtol=0.02)
    # Right v equals left v (rectified rows).
    np.testing.assert_allclose(uvr[ok, 1], pts[ok, 1])


def test_subpixel_disparity():
    left = textured(seed=1)
    disp = 12.37
    right = shifted_right(left, disp)
    pts = grid_pts(240, 376)
    uvr, depth, ok = run(left, right, pts)
    rec = pts[ok, 0] - uvr[ok, 0]
    assert np.median(np.abs(rec - disp)) < 0.15, np.median(np.abs(rec - disp))


def test_depth_gating():
    left = textured(seed=2)
    # Disparity 80 -> depth 0.62m (inside), disparity 2 -> 24.75m.
    pts = grid_pts(240, 376, margin=90)
    right_near = shifted_right(left, 50.0)  # depth ~0.99 m: pass
    _, depth, ok = run(left, right_near, pts, max_disparity=96)
    assert ok.mean() > 0.8
    right_far = shifted_right(left, 1.2)  # depth ~41 m: fail max gate
    _, depth2, ok2 = run(left, right_far, pts, max_point_dist=10.0)
    assert ok2.mean() < 0.2


def test_textureless_rejected():
    left = np.full((240, 376), 100.0, np.float32)
    right = left.copy()
    pts = grid_pts(240, 376)
    uvr, depth, ok = run(left, right, pts)
    # Flat SSD: disparity gate (>0.5 px) + finite score kill most; any
    # survivors would carry arbitrary depth — must be none with real gates.
    assert ok.mean() < 0.5


def test_invalid_inputs_stay_invalid():
    left = textured(seed=3)
    right = shifted_right(left, 10.0)
    pts = grid_pts(240, 376)
    uvr, depth, ok = match_stereo(
        jnp.asarray(left),
        jnp.asarray(right),
        jnp.asarray(pts, jnp.float32),
        jnp.zeros(len(pts), bool),
        fx=jnp.float32(FX),
        baseline=jnp.float32(BASELINE),
        templ_cols=31,
        templ_rows=11,
        max_disparity=64,
    )
    assert not np.asarray(ok).any()


def test_dense_stereo_recovers_constant_disparity():
    """Dense BM path (StereoMatcher::denseStereoReconstruction role):
    subpixel-accurate on a synthetic constant-disparity pair."""
    from kimera_vio_tpu.ops.stereo_matching import dense_stereo
    from scipy.ndimage import gaussian_filter

    rng = np.random.RandomState(0)
    H, W, D = 96, 160, 24
    tex = gaussian_filter(rng.rand(H, W + D + 10).astype(np.float32) * 255, 1.2)
    d_true = 7.3
    left = tex[:, D : D + W]
    xs = np.arange(W) + D + d_true
    x0 = np.floor(xs).astype(int)
    f = xs - x0
    right = tex[:, x0] * (1 - f) + tex[:, x0 + 1] * f
    disp, ok = dense_stereo(
        jnp.asarray(left), jnp.asarray(right), num_disparities=D
    )
    disp = np.asarray(disp)
    ok = np.asarray(ok)
    assert ok.mean() > 0.8
    err = np.abs(disp[ok] - d_true)
    assert np.median(err) < 0.2
    assert np.percentile(err, 90) < 0.5
