"""Camera model tests: projection/undistortion round trips, bearing vectors,
stereo rectification geometry (epipolar alignment of rectified rows),
cross-checked against OpenCV where available."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from kimera_vio_tpu.config.params import CameraParams, VioParams
from kimera_vio_tpu.frontend import camera as cam_mod
from kimera_vio_tpu.frontend.camera import (
    PinholeCamera,
    StereoCamera,
    backproject,
    bearing_vectors,
    distort,
    project,
    rectify_keypoints,
    undistort_to_normalized,
    unrectify_keypoints,
)

EUROC = "/root/reference/params/Euroc"
needs_euroc = pytest.mark.skipif(not os.path.isdir(EUROC), reason="no reference params")


def euroc_cams():
    v = VioParams.from_folder(EUROC)
    return v.left_cam, v.right_cam


@needs_euroc
def test_undistort_roundtrip_radtan():
    left_p, _ = euroc_cams()
    cam = PinholeCamera.from_params(left_p)
    rng = np.random.default_rng(0)
    uv = rng.uniform([50, 50], [700, 430], (256, 2)).astype(np.float32)
    xy = undistort_to_normalized(cam, jnp.asarray(uv))
    xyd = distort(cam, xy)
    u2 = np.asarray(cam.fx * xyd[..., 0] + cam.cx)
    v2 = np.asarray(cam.fy * xyd[..., 1] + cam.cy)
    np.testing.assert_allclose(np.stack([u2, v2], -1), uv, atol=1e-2)


@needs_euroc
def test_undistort_matches_opencv():
    cv2 = pytest.importorskip("cv2")
    left_p, _ = euroc_cams()
    cam = PinholeCamera.from_params(left_p)
    rng = np.random.default_rng(1)
    uv = rng.uniform([30, 30], [720, 450], (128, 2)).astype(np.float32)
    K = np.array(
        [[left_p.intrinsics[0], 0, left_p.intrinsics[2]],
         [0, left_p.intrinsics[1], left_p.intrinsics[3]],
         [0, 0, 1]]
    )
    ours = np.asarray(undistort_to_normalized(cam, jnp.asarray(uv)))
    cv = cv2.undistortPoints(
        uv.reshape(-1, 1, 2), K, np.asarray(left_p.distortion_coeffs)
    ).reshape(-1, 2)
    # cv2.undistortPoints uses only 5 fixed-point iterations internally, so
    # near the border it is itself ~1e-3 off the true inverse (our version
    # round-trips through distort() to <1e-2 px, see previous test).
    np.testing.assert_allclose(ours, cv, atol=2e-3)


def test_equidistant_roundtrip():
    p = CameraParams(
        intrinsics=np.array([350.0, 350.0, 376.0, 240.0]),
        distortion_model="equidistant",
        distortion_coeffs=np.array([-0.01, 0.02, -0.005, 0.001]),
    )
    cam = PinholeCamera.from_params(p)
    rng = np.random.default_rng(2)
    uv = rng.uniform([100, 100], [650, 380], (64, 2)).astype(np.float32)
    xy = undistort_to_normalized(cam, jnp.asarray(uv), iters=20)
    xyd = distort(cam, xy)
    u2 = np.asarray(cam.fx * xyd[..., 0] + cam.cx)
    v2 = np.asarray(cam.fy * xyd[..., 1] + cam.cy)
    np.testing.assert_allclose(np.stack([u2, v2], -1), uv, atol=5e-2)


@needs_euroc
def test_project_backproject_roundtrip():
    left_p, _ = euroc_cams()
    cam = PinholeCamera.from_params(left_p)
    rng = np.random.default_rng(3)
    pts = np.stack(
        [rng.uniform(-1, 1, 100), rng.uniform(-0.7, 0.7, 100), rng.uniform(1, 8, 100)],
        axis=-1,
    ).astype(np.float32)
    uv, valid = project(cam, jnp.asarray(pts))
    back = backproject(cam, uv, jnp.asarray(pts[:, 2]))
    m = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(back)[m], pts[m], rtol=1e-3, atol=1e-3)


@needs_euroc
def test_bearing_vectors_unit_norm_and_direction():
    left_p, _ = euroc_cams()
    cam = PinholeCamera.from_params(left_p)
    pts = jnp.array([[0.3, -0.2, 4.0], [0.0, 0.0, 2.0]], jnp.float32)
    uv, _ = project(cam, pts)
    vs = bearing_vectors(cam, uv)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(vs), axis=-1), 1.0, atol=1e-5)
    expected = np.asarray(pts) / np.linalg.norm(pts, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(vs), expected, atol=1e-4)


@needs_euroc
class TestStereoRectification:
    def setup_method(self):
        left_p, right_p = euroc_cams()
        self.stereo = StereoCamera.from_params(left_p, right_p)

    def test_baseline(self):
        # EuRoC baseline ~11cm (FrontendParams nominalBaseline: 0.11).
        assert abs(float(self.stereo.baseline) - 0.11) < 0.01

    def test_rect_rotations_are_rotations(self):
        for R in [self.stereo.R_rect_l, self.stereo.R_rect_r]:
            R = np.asarray(R, np.float64)
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
            assert abs(np.linalg.det(R) - 1.0) < 1e-5

    def test_epipolar_alignment(self):
        """A 3D world point must land on the same rectified row in both
        cameras — the whole point of rectification."""
        left_p, right_p = euroc_cams()
        T_b_l = left_p.T_BS
        T_b_r = right_p.T_BS
        rng = np.random.default_rng(5)
        # Points in the left camera frame, in front of the rig.
        pts_l = np.stack(
            [rng.uniform(-0.5, 0.5, 50), rng.uniform(-0.3, 0.3, 50), rng.uniform(2, 6, 50)],
            axis=-1,
        )
        # Transform to right camera frame.
        T_r_l = np.linalg.inv(T_b_r) @ T_b_l
        pts_r = (T_r_l[:3, :3] @ pts_l.T).T + T_r_l[:3, 3]
        uv_l, ok_l = project(self.stereo.left, jnp.asarray(pts_l, jnp.float32))
        uv_r, ok_r = project(self.stereo.right, jnp.asarray(pts_r, jnp.float32))
        rect_l = rectify_keypoints(self.stereo, self.stereo.left, self.stereo.R_rect_l, uv_l)
        rect_r = rectify_keypoints(self.stereo, self.stereo.right, self.stereo.R_rect_r, uv_r)
        m = np.asarray(ok_l) & np.asarray(ok_r)
        v_l = np.asarray(rect_l)[m, 1]
        v_r = np.asarray(rect_r)[m, 1]
        np.testing.assert_allclose(v_l, v_r, atol=0.05)  # sub-pixel rows
        # Disparity positive (right image shifted left).
        disp = np.asarray(rect_l)[m, 0] - np.asarray(rect_r)[m, 0]
        assert (disp > 0).all()

    def test_disparity_depth_consistency(self):
        """backproject_rect(project via both cams) recovers the 3D point."""
        left_p, right_p = euroc_cams()
        T_b_l = left_p.T_BS
        pts_l = np.array([[0.2, -0.1, 3.0], [-0.4, 0.2, 5.0]], np.float64)
        # Rectified-left frame coords.
        R_rect_l = np.asarray(self.stereo.R_rect_l, np.float64)
        pts_rect = (R_rect_l @ pts_l.T).T
        uvd, ok = self.stereo.project_rect(jnp.asarray(pts_rect, jnp.float32))
        back = self.stereo.backproject_rect(uvd)
        np.testing.assert_allclose(np.asarray(back), pts_rect, rtol=1e-3)

    def test_rectify_unrectify_roundtrip(self):
        rng = np.random.default_rng(6)
        uv = rng.uniform([100, 100], [650, 380], (64, 2)).astype(np.float32)
        rect = rectify_keypoints(self.stereo, self.stereo.left, self.stereo.R_rect_l, jnp.asarray(uv))
        back = unrectify_keypoints(self.stereo, self.stereo.left, self.stereo.R_rect_l, rect)
        np.testing.assert_allclose(np.asarray(back), uv, atol=1e-2)


@needs_euroc
def test_remap_identity():
    left_p, _ = euroc_cams()
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 255, (left_p.height, left_p.width)).astype(np.float32)
    ys, xs = np.mgrid[0 : left_p.height, 0 : left_p.width]
    mapxy = jnp.asarray(np.stack([xs, ys], -1), jnp.float32)
    out = cam_mod.remap_bilinear(jnp.asarray(img), mapxy)
    np.testing.assert_allclose(np.asarray(out)[:-1, :-1], img[:-1, :-1], atol=1e-3)


def test_separable_remap_matches_gather_remap():
    """SeparableRemap (shifted-select two-pass) must match the generic
    gather-based remap_bilinear on the real EuRoC rectification map."""
    import numpy as np
    from kimera_vio_tpu.config.params import VioParams
    from kimera_vio_tpu.frontend.camera import (
        SeparableRemap,
        StereoCamera,
        rectification_map,
        remap_bilinear,
    )

    params = VioParams.from_folder("/root/reference/params/Euroc")
    stereo = StereoCamera.from_params(params.left_cam, params.right_cam)
    mp = rectification_map(stereo, stereo.left, stereo.R_rect_l)
    sep = SeparableRemap(np.asarray(mp))

    H, W = stereo.left.height, stereo.left.width
    # Smooth synthetic image (bilinear sampling agreement is only defined up
    # to the local gradient; use a band-limited pattern).
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = (
        100.0
        + 80.0 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
        + 40.0 * np.sin((xx + 2 * yy) / 31.0)
    ).astype(np.float32)
    ref = np.asarray(remap_bilinear(jnp.asarray(img), mp))
    out = np.asarray(sep(jnp.asarray(img)))
    # Interior agreement (borders differ by clamp-order only).
    err = np.abs(ref[4:-4, 4:-4] - out[4:-4, 4:-4])
    assert err.max() < 0.35, err.max()
    assert np.mean(err) < 0.03, np.mean(err)


class TestOmniCamera:
    """OCamCalib omni model against the reference's ForOmniCamera fixture
    (reference CameraParams.cpp:62-95, Camera::BackProjectOmni)."""

    def _cam(self):
        from kimera_vio_tpu.config.params import CameraParams
        from kimera_vio_tpu.frontend.camera import PinholeCamera

        p = CameraParams.from_yaml(
            "/root/reference/tests/data/ForOmniCamera/OmniCamParams.yaml"
        )
        assert p.camera_model == "omni"
        return PinholeCamera.from_params(p), p

    def test_center_pixel_backprojects_forward(self):
        import jax.numpy as jnp
        from kimera_vio_tpu.frontend.camera import (
            omni_backproject_normalized,
        )

        cam, p = self._cam()
        uv = jnp.asarray(p.omni_distortion_center, jnp.float32)[None]
        xy = np.asarray(omni_backproject_normalized(cam, uv))
        np.testing.assert_allclose(xy, 0.0, atol=1e-6)

    def test_backproject_matches_reference_math(self):
        """Numpy transliteration of Camera::BackProjectOmni as the oracle."""
        import jax.numpy as jnp
        from kimera_vio_tpu.frontend.camera import backproject

        cam, p = self._cam()
        rng = np.random.default_rng(0)
        uv = rng.uniform([400, 300], [1600, 1200], (50, 2)).astype(np.float32)
        depth = rng.uniform(1.0, 10.0, 50).astype(np.float32)
        # Oracle (double precision, exact reference recurrence)
        coeffs = p.distortion_coeffs
        c_, d_, e_ = p.omni_affine
        A_inv = np.linalg.inv(np.array([[1.0, c_], [d_, e_]]))
        rect = (uv - p.omni_distortion_center) @ A_inv.T
        rho = np.linalg.norm(rect, axis=-1)
        z = coeffs[4]
        for k in (3, 2, 1, 0):
            z = coeffs[k] + z * rho
        exp = np.stack(
            [
                rect[:, 0] * depth / z,
                rect[:, 1] * depth / z,
                depth,
            ],
            -1,
        )
        got = np.asarray(backproject(cam, jnp.asarray(uv), jnp.asarray(depth)))
        np.testing.assert_allclose(got, exp, rtol=2e-4, atol=2e-4)

    def test_project_backproject_roundtrip(self):
        """omni_project (Newton inversion — beyond the reference, which
        aborts in projectOmni) must invert BackProjectOmni."""
        import jax.numpy as jnp
        from kimera_vio_tpu.frontend.camera import backproject, project

        cam, p = self._cam()
        rng = np.random.default_rng(1)
        uv = rng.uniform([500, 400], [1500, 1100], (40, 2)).astype(np.float32)
        depth = rng.uniform(2.0, 8.0, 40).astype(np.float32)
        pts = backproject(cam, jnp.asarray(uv), jnp.asarray(depth))
        uv2, ok = project(cam, pts)
        assert bool(np.asarray(ok).all())
        np.testing.assert_allclose(np.asarray(uv2), uv, atol=0.1)
