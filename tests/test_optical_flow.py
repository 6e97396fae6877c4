"""Pyramidal LK tests: synthetic translations (subpixel accuracy), large
displacement through the pyramid, rotational flow prediction, and a
cross-check against cv2.calcOpticalFlowPyrLK on a real image pair."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from kimera_vio_tpu.ops import optical_flow as of
from kimera_vio_tpu.ops import corner_detection as det

REAL_IMG = "/root/reference/tests/data/realImage.png"


def textured_image(h=240, w=320, seed=0):
    """Smooth random texture with plenty of gradient structure."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h // 8, w // 8)).astype(np.float32)
    # Upsample smoothly (bicubic-ish via double linear).
    import scipy.ndimage as ndi

    return ndi.zoom(img, 8, order=3)[:h, :w].astype(np.float32)


def shift_image(img, dx, dy):
    import scipy.ndimage as ndi

    return ndi.shift(img, (dy, dx), order=3, mode="nearest").astype(np.float32)


def grid_points(h, w, margin=40, step=40):
    ys, xs = np.mgrid[margin : h - margin : step, margin : w - margin : step]
    return np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)


def run_track(prev, cur, pts, init=None, **kw):
    max_level = kw.pop("max_level", 3)
    prev_pyr = of.build_pyramid(jnp.asarray(prev), max_level)
    cur_pyr = of.build_pyramid(jnp.asarray(cur), max_level)
    valid = jnp.ones(len(pts), bool)
    init = pts if init is None else init
    out, ok = of.klt_track(
        prev_pyr, cur_pyr, jnp.asarray(pts), jnp.asarray(init), valid, **kw
    )
    return np.asarray(out), np.asarray(ok)


@pytest.mark.lane2
def test_subpixel_translation():
    img = textured_image()
    dx, dy = 1.3, -0.7
    cur = shift_image(img, dx, dy)
    pts = grid_points(240, 320)
    out, ok = run_track(img, cur, pts)
    assert ok.mean() > 0.9
    err = np.linalg.norm(out[ok] - (pts[ok] + [dx, dy]), axis=-1)
    assert np.median(err) < 0.1, np.median(err)


def test_large_displacement_needs_pyramid():
    img = textured_image(seed=1)
    dx, dy = 13.0, -9.0
    cur = shift_image(img, dx, dy)
    pts = grid_points(240, 320, margin=50)
    out, ok = run_track(img, cur, pts, max_level=3)
    err = np.linalg.norm(out[ok] - (pts[ok] + [dx, dy]), axis=-1)
    assert ok.mean() > 0.8
    assert np.median(err) < 0.3, np.median(err)


def test_initial_flow_guess_enables_huge_motion():
    img = textured_image(seed=2)
    dx, dy = 40.0, 25.0
    cur = shift_image(img, dx, dy)
    pts = grid_points(240, 320, margin=70)
    # Without a guess, fails; with approximate init, locks on.
    init = pts + [dx - 2.0, dy + 1.5]
    out, ok = run_track(img, cur, pts, init=init, max_level=2)
    err = np.linalg.norm(out[ok] - (pts[ok] + [dx, dy]), axis=-1)
    assert np.median(err) < 0.3, np.median(err)


def test_flat_regions_rejected():
    img = np.full((240, 320), 128.0, np.float32)
    pts = grid_points(240, 320)
    out, ok = run_track(img, img, pts)
    assert not ok.any()


@pytest.mark.skipif(not os.path.exists(REAL_IMG), reason="no reference image")
@pytest.mark.lane2
def test_matches_opencv_on_real_image():
    cv2 = pytest.importorskip("cv2")
    img = cv2.imread(REAL_IMG, cv2.IMREAD_GRAYSCALE).astype(np.float32)
    cur = shift_image(img, 4.2, -2.7)
    # Track actual corners (LK needs texture).
    uv, valid = det.detect_features(
        jnp.asarray(img),
        jnp.zeros((8, 2), jnp.float32),
        jnp.zeros(8, bool),
        k_new=128,
        min_distance=15.0,
        do_subpixel=False,
    )
    pts = np.asarray(uv)[np.asarray(valid)]
    # Keep points away from borders.
    H, W = img.shape
    m = (
        (pts[:, 0] > 40) & (pts[:, 0] < W - 40)
        & (pts[:, 1] > 40) & (pts[:, 1] < H - 40)
    )
    pts = pts[m].astype(np.float32)
    ours, ok = run_track(img, cur, pts, win=21, max_level=3)
    cv_out, cv_st, _ = cv2.calcOpticalFlowPyrLK(
        img.astype(np.uint8),
        cur.astype(np.uint8),
        pts.reshape(-1, 1, 2),
        None,
        winSize=(21, 21),
        maxLevel=3,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01),
    )
    cv_out = cv_out.reshape(-1, 2)
    cv_st = cv_st.ravel().astype(bool)
    both = ok & cv_st
    assert both.mean() > 0.7
    # Compare both trackers to the known true shift. cv2 runs on uint8 so it
    # carries ~0.25 px quantization error; we must be at least as accurate.
    gt = pts[both] + [4.2, -2.7]
    err_ours = np.median(np.linalg.norm(ours[both] - gt, axis=-1))
    err_cv = np.median(np.linalg.norm(cv_out[both] - gt, axis=-1))
    assert err_ours < 0.1, err_ours
    assert err_ours <= err_cv + 0.05, (err_ours, err_cv)


def test_rotational_flow_prediction():
    from kimera_vio_tpu.common import geometry as geo

    fx = fy = 400.0
    cx, cy = 160.0, 120.0
    K = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], jnp.float32)
    K_inv = jnp.linalg.inv(K)
    # Pure yaw of 2 degrees: points shift ~ fx * tan(2deg) ~ 14 px.
    R = geo.so3_exp(jnp.array([0.0, np.deg2rad(2.0), 0.0]))
    uv = jnp.array([[160.0, 120.0], [100.0, 80.0]], jnp.float32)
    valid = jnp.ones(2, bool)
    pred = of.predict_flow_rotational(uv, valid, R.T, K, K_inv, 320, 240)
    # Principal-axis point moves by ~ -fx*tan(2deg) (camera yaw right ->
    # features move left or right depending on sign convention); check
    # magnitude and that it stayed in-image.
    shift = np.asarray(pred) - np.asarray(uv)
    assert abs(abs(shift[0, 0]) - fx * np.tan(np.deg2rad(2.0))) < 1.0
    # Out-of-image prediction falls back to source.
    uv2 = jnp.array([[315.0, 120.0]], jnp.float32)
    R_big = geo.so3_exp(jnp.array([0.0, np.deg2rad(30.0), 0.0]))
    pred2 = of.predict_flow_rotational(
        uv2, jnp.ones(1, bool), R_big, K, K_inv, 320, 240
    )
    np.testing.assert_allclose(np.asarray(pred2), np.asarray(uv2))


@pytest.mark.slow
def test_pallas_kernel_matches_xla():
    """The Pallas LK kernel (interpret mode on CPU) must agree with the XLA
    tracker on a full-size pyramid."""
    from kimera_vio_tpu.ops.pallas.lk_kernel import klt_track_pallas

    img = textured_image(480, 752, seed=5)
    cur = shift_image(img, 7.0, -3.0)
    pts = grid_points(480, 752, margin=70, step=60).astype(np.float32)
    prev_pyr = of.build_pyramid(jnp.asarray(img), 3)
    cur_pyr = of.build_pyramid(jnp.asarray(cur), 3)
    valid = jnp.ones(len(pts), bool)
    out_p, ok_p = klt_track_pallas(
        prev_pyr, cur_pyr, jnp.asarray(pts), jnp.asarray(pts), valid,
        interpret=True,
    )
    out_x, ok_x = of.klt_track(
        prev_pyr, cur_pyr, jnp.asarray(pts), jnp.asarray(pts), valid
    )
    both = np.asarray(ok_p) & np.asarray(ok_x)
    assert both.mean() > 0.8
    d = np.linalg.norm(np.asarray(out_p)[both] - np.asarray(out_x)[both], axis=-1)
    assert np.median(d) < 0.05, np.median(d)
