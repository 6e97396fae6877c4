"""Feature detection tests: synthetic corners at known positions, spatial
spread of binned ANMS, suppression near existing features, and a loose
cross-check against cv2.goodFeaturesToTrack on a real image."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from kimera_vio_tpu.ops import corner_detection as det

REAL_IMG = "/root/reference/tests/data/realImage.png"


def checkerboard(h=240, w=320, sq=40):
    ys, xs = np.mgrid[0:h, 0:w]
    img = (((ys // sq) + (xs // sq)) % 2).astype(np.float32) * 255.0
    return img


def no_existing(n=8):
    return jnp.zeros((n, 2), jnp.float32), jnp.zeros((n,), bool)


def test_detects_checkerboard_corners():
    img = checkerboard()
    uv, valid = det.detect_features(
        jnp.asarray(img), *no_existing(), k_new=64, min_distance=10.0,
        do_subpixel=False,
    )
    uv = np.asarray(uv)[np.asarray(valid)]
    assert len(uv) >= 20
    # Every detection should be near a true checkerboard crossing
    # (multiples of 40 in both coords, ignoring outer border).
    for x, y in uv:
        assert abs(x - round(x / 40) * 40) < 3, (x, y)
        assert abs(y - round(y / 40) * 40) < 3, (x, y)


def test_subpixel_refinement_improves_accuracy():
    # Corner at a non-integer location via a smoothed step pattern.
    h = w = 128
    cx, cy = 64.3, 63.7
    ys, xs = np.mgrid[0:h, 0:w]

    def smooth_step(t):
        return 1.0 / (1.0 + np.exp(-t * 2.0))

    img = 255.0 * (
        smooth_step(xs - cx) * smooth_step(ys - cy)
        + smooth_step(cx - xs) * smooth_step(cy - ys)
    ).astype(np.float32)
    uv, valid = det.detect_features(
        jnp.asarray(img), *no_existing(), k_new=4, min_distance=5.0,
        do_subpixel=True, subpix_window=8,
    )
    uv = np.asarray(uv)[np.asarray(valid)]
    d = np.linalg.norm(uv - [cx, cy], axis=-1).min()
    assert d < 0.5, uv


def test_existing_feature_suppression():
    img = checkerboard()
    uv1, v1 = det.detect_features(
        jnp.asarray(img), *no_existing(), k_new=32, min_distance=15.0,
        do_subpixel=False,
    )
    # Feed the first detections back as "existing" — new ones must stay away.
    uv2, v2 = det.detect_features(
        jnp.asarray(img), uv1, v1, k_new=32, min_distance=15.0,
        do_subpixel=False,
    )
    a = np.asarray(uv1)[np.asarray(v1)]
    b = np.asarray(uv2)[np.asarray(v2)]
    if len(b) and len(a):
        dists = np.linalg.norm(a[None] - b[:, None], axis=-1).min(axis=-1)
        assert dists.min() > 15.0


def test_binned_spread():
    """Detections must cover multiple bins, not cluster in one corner."""
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (240, 320)).astype(np.float32)
    uv, valid = det.detect_features(
        jnp.asarray(img), *no_existing(), k_new=70, min_distance=3.0,
        do_subpixel=False, nr_horizontal_bins=7, nr_vertical_bins=5,
    )
    uv = np.asarray(uv)[np.asarray(valid)]
    bins = set()
    for x, y in uv:
        bins.add((int(y // 48), int(x // (320 / 7))))
    assert len(bins) >= 20  # of 35


@pytest.mark.skipif(not os.path.exists(REAL_IMG), reason="no reference image")
def test_real_image_vs_opencv():
    cv2 = pytest.importorskip("cv2")
    img = cv2.imread(REAL_IMG, cv2.IMREAD_GRAYSCALE).astype(np.float32)
    uv, valid = det.detect_features(
        jnp.asarray(img), *no_existing(), k_new=128, min_distance=20.0,
        do_subpixel=False,
    )
    ours = np.asarray(uv)[np.asarray(valid)]
    cv_pts = cv2.goodFeaturesToTrack(
        img.astype(np.uint8), 128, 0.001, 20
    ).reshape(-1, 2)
    # At least half of our detections lie within 3 px of an OpenCV corner
    # (responses and tie-breaking differ; the contract is statistical).
    d = np.linalg.norm(ours[:, None] - cv_pts[None], axis=-1).min(axis=-1)
    assert (d < 3.0).mean() > 0.5, (d < 3.0).mean()
    assert len(ours) >= 100


def test_fast_score_positive_on_corner():
    img = checkerboard()
    s = det.fast_score(jnp.asarray(img), 10.0)
    # Corner pixels score higher than flat regions.
    assert float(s[40, 40]) > float(s[20, 20])


def test_detector_type_orb_and_fast():
    """Detector-type dispatch (FeatureDetector.cpp:34-88): FAST(0),
    ORB(1) = FAST-gated Harris ranking, AGAST(2) unsupported like the
    reference, GFTT(3) default."""
    img = checkerboard()
    uv0, m0 = no_existing()
    for dtype_ in (0, 1, 3):
        uv, ok = det.detect_features(
            jnp.asarray(img), uv0, m0, 32, detector_type=dtype_,
            min_distance=8.0, do_subpixel=False,
        )
        assert int(np.asarray(ok).sum()) > 4, dtype_
    import pytest

    with pytest.raises(NotImplementedError):
        det.detect_features(
            jnp.asarray(img), uv0, m0, 32, detector_type=2,
            min_distance=8.0, do_subpixel=False,
        )
