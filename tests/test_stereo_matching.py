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


def test_dense_stereo_lr_check_rejects_occlusions():
    """LR consistency (StereoBM disp12MaxDiff role): a foreground strip at
    higher disparity occludes background in the right view; the occluded
    band must be rejected by the LR check, while accuracy elsewhere is
    unchanged."""
    from kimera_vio_tpu.ops.stereo_matching import dense_stereo

    H, W = 96, 192
    D_BG, D_FG = 4, 20
    tex = textured(H, W + 64, seed=3)
    left = tex[:, 32 : 32 + W].copy()
    right_bg = tex[:, 32 + D_BG : 32 + D_BG + W]
    right = right_bg.copy()
    # Foreground strip in left columns [90, 130) -> right cols shift by D_FG.
    fg = tex[:, :W]
    left[:, 90:130] = fg[:, 90:130]
    right[:, 90 - D_FG : 130 - D_FG] = fg[:, 90:130]
    disp_nolr, ok_nolr = dense_stereo(
        jnp.asarray(left), jnp.asarray(right), num_disparities=32
    )
    disp_lr, ok_lr = dense_stereo(
        jnp.asarray(left),
        jnp.asarray(right),
        num_disparities=32,
        lr_check=True,
    )
    ok_nolr, ok_lr = np.asarray(ok_nolr), np.asarray(ok_lr)
    disp_lr = np.asarray(disp_lr)
    # The LR check only removes pixels (monotone gate).
    assert (ok_lr & ~ok_nolr).sum() == 0
    # Background region far from the strip stays valid and accurate.
    bg = np.zeros((H, W), bool)
    bg[8:-8, 8:70] = True
    assert (ok_lr & bg).mean() / max(bg.mean(), 1e-9) > 0.6
    err = np.abs(disp_lr[ok_lr & bg] - D_BG)
    assert np.median(err) < 0.3
    # The occluded band: left background pixels whose right correspondence
    # (x - D_BG) falls under the foreground strip's right-view position
    # ([90 - D_FG, 130 - D_FG)) — i.e. x in [90 - D_FG + D_BG, 90).
    occ = np.zeros((H, W), bool)
    occ[8:-8, 90 - D_FG + D_BG : 90] = True
    keep_occ = (ok_lr & occ).sum() / max((ok_nolr & occ).sum(), 1)
    assert keep_occ < 0.55


MICRO_EUROC_DS = "/root/reference/tests/data/MicroEurocDataset"


@pytest.mark.skipif(
    not (
        __import__("os").path.isdir(MICRO_EUROC_DS)
        and __import__("os").path.isdir("/root/reference/params/Euroc")
    ),
    reason="MicroEuroc not present",
)
def test_dense_stereo_parity_with_opencv_bm_on_micro_euroc():
    """Statistical parity with cv2.StereoBM on a real MicroEuroc pair
    (the reference's denseStereoReconstruction is a cv::StereoBM
    passthrough, StereoMatcher.cpp:32-121): on pixels both matchers mark
    valid, the disparities must agree to ~1 px median."""
    import cv2

    from kimera_vio_tpu.config.params import VioParams
    from kimera_vio_tpu.dataprovider.euroc import EurocDataProvider
    from kimera_vio_tpu.frontend.camera import (
        StereoCamera,
        rectification_map,
        remap_bilinear,
    )
    from kimera_vio_tpu.ops.stereo_matching import dense_stereo

    params = VioParams.from_folder("/root/reference/params/Euroc")
    stereo = StereoCamera.from_params(params.left_cam, params.right_cam)
    prov = EurocDataProvider(MICRO_EUROC_DS)
    pk = list(prov.frames())[40]
    left = prov.load_image(pk["left_path"])
    right = prov.load_image(pk["right_path"])
    map_l = rectification_map(stereo, stereo.left, stereo.R_rect_l)
    map_r = rectification_map(stereo, stereo.right, stereo.R_rect_r)
    lrect = np.asarray(remap_bilinear(jnp.asarray(left), map_l))
    rrect = np.asarray(remap_bilinear(jnp.asarray(right), map_r))

    D, BS = 64, 9
    disp, ok = dense_stereo(
        jnp.asarray(lrect),
        jnp.asarray(rrect),
        num_disparities=D,
        block_size=BS,
        lr_check=True,
        prefilter_xsobel=True,
    )
    disp, ok = np.asarray(disp), np.asarray(ok)

    bm = cv2.StereoBM_create(numDisparities=D, blockSize=BS)
    bm.setUniquenessRatio(5)
    bm.setDisp12MaxDiff(1)
    bm_disp = (
        bm.compute(
            np.clip(lrect, 0, 255).astype(np.uint8),
            np.clip(rrect, 0, 255).astype(np.uint8),
        ).astype(np.float32)
        / 16.0
    )
    bm_ok = bm_disp > 0

    both = ok & bm_ok
    # Meaningful overlap: the two matchers agree on a sizable valid set
    # (measured 0.70 on this pair).
    assert both.mean() > 0.4
    err = np.abs(disp[both] - bm_disp[both])
    assert np.median(err) <= 0.5
    assert (err <= 2.0).mean() > 0.95


def test_dense_depth_invalid_is_zero():
    """dense_depth: invalid / out-of-range pixels are 0 (the RGB-D depth
    image convention _refine_mesh expects)."""
    from kimera_vio_tpu.ops.stereo_matching import dense_depth

    left = textured(96, 160, seed=5)
    right = shifted_right(left, 6.0)
    depth = np.asarray(
        dense_depth(
            jnp.asarray(left),
            jnp.asarray(right),
            fx=FX,
            baseline=BASELINE,
            min_depth=0.5,
            max_depth=30.0,
            num_disparities=32,
        )
    )
    assert np.isfinite(depth).all()
    assert (depth >= 0).all()
    good = depth > 0
    assert good.mean() > 0.5
    # Constant disparity 6 -> depth fx*b/6.
    np.testing.assert_allclose(
        np.median(depth[good]), FX * BASELINE / 6.0, rtol=0.1
    )
