"""Camera models: projection, distortion, undistortion, stereo rectification.

TPU-native rebuild of the reference camera stack
(src/frontend/Camera.cpp, StereoCamera.cpp, UndistorterRectifier.cpp):

  * pinhole projection with radial-tangential (radtan) and equidistant
    (Kannala-Brandt fisheye) distortion models (CameraParams.cpp:62-95),
  * iterative (Gauss-Newton) undistortion of keypoints — the batched
    equivalent of cv::undistortPoints,
  * bearing-vector computation (UndistorterRectifier::GetBearingVector,
    UndistorterRectifier.cpp:73-113),
  * stereo rectification computing R_rect_left/right + a shared rectified
    pinhole (the TPU equivalent of cv::stereoRectify, StereoCamera.cpp:292),
  * dense undistort-rectify image remap maps (precomputed once, applied as
    a batched bilinear gather — the equivalent of cv::initUndistortRectifyMap
    + cv::remap, UndistorterRectifier.cpp:230).

Everything is batched over trailing keypoint dims; camera constants live in
a small frozen pytree so jitted functions close over them cleanly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from kimera_vio_tpu.common import geometry as geo
from kimera_vio_tpu.config.params import CameraParams

def cpu_backend():
    """Context manager pinning eager jax ops to the host CPU backend.

    Construction-time geometry (rectification maps, calib inverses) must
    NOT run on the accelerator: over a remote-TPU tunnel each eager
    program costs a compile round-trip and the d2h result fetch runs at
    ~10 MB/s (measured: the two rectification maps alone cost ~165 s of
    warmup). Falls back to a no-op context when no CPU backend exists.
    """
    import contextlib

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return contextlib.nullcontext()
    return jax.default_device(cpu)


# Distortion model codes (static ints, selected at trace time).
DIST_NONE = 0
DIST_RADTAN = 1
DIST_EQUIDISTANT = 2
DIST_OMNI = 3  # OCamCalib (Scaramuzza) polynomial fisheye

_DIST_CODES = {
    "none": DIST_NONE,
    "plumb_bob": DIST_RADTAN,
    "radial-tangential": DIST_RADTAN,
    "radtan": DIST_RADTAN,
    "equidistant": DIST_EQUIDISTANT,
    "kannala_brandt": DIST_EQUIDISTANT,
    "omni": DIST_OMNI,
}


@struct.dataclass
class PinholeCamera:
    """Intrinsics + distortion + body-from-camera extrinsics as a pytree.

    `dist_model` is static (pytree_node=False) so jit specializes per model.
    """

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    dist: jax.Array  # (5,) distortion coefficients (omni uses all 5)
    R_bc: jax.Array  # (3,3) body-from-camera rotation
    t_bc: jax.Array  # (3,) body-from-camera translation
    # OCamCalib omni model data (CameraParams.cpp:62-95): pixel ->
    # sensor-plane affine inverse + distortion center.
    omni_center: jax.Array = struct.field(
        default_factory=lambda: jnp.zeros(2, jnp.float32)
    )
    omni_affine_inv: jax.Array = struct.field(
        default_factory=lambda: jnp.eye(2, dtype=jnp.float32)
    )
    dist_model: int = struct.field(pytree_node=False, default=DIST_RADTAN)
    width: int = struct.field(pytree_node=False, default=752)
    height: int = struct.field(pytree_node=False, default=480)

    @classmethod
    def from_params(cls, p: CameraParams) -> "PinholeCamera":
        f = lambda x: jnp.asarray(x, jnp.float32)
        d = np.zeros(5)
        d[: min(5, len(p.distortion_coeffs))] = p.distortion_coeffs[:5]
        model = (
            DIST_OMNI
            if getattr(p, "camera_model", "pinhole") == "omni"
            else _DIST_CODES[p.distortion_model]
        )
        center = np.zeros(2)
        affine = np.eye(2)
        intr = np.asarray(p.intrinsics, np.float64)
        if model == DIST_OMNI:
            center = np.asarray(p.omni_distortion_center, np.float64)
            # omni_affine yaml = [c, d, e]; A = [[1, c], [d, e]]
            c_, d_, e_ = p.omni_affine
            affine = np.linalg.inv(np.array([[1.0, c_], [d_, e_]]))
            if intr.size < 4:
                # "intrinsics: [] must be empty for omni" (fixture yaml):
                # pixel mapping runs through the affine+center instead.
                intr = np.array(
                    [1.0, 1.0, float(center[0]), float(center[1])]
                )
        return cls(
            fx=f(intr[0]),
            fy=f(intr[1]),
            cx=f(intr[2]),
            cy=f(intr[3]),
            dist=f(d),
            R_bc=f(p.T_BS[:3, :3]),
            t_bc=f(p.T_BS[:3, 3]),
            omni_center=f(center),
            omni_affine_inv=f(affine),
            dist_model=model,
            width=p.width,
            height=p.height,
        )

    # -- intrinsics as a K matrix --------------------------------------
    def K(self) -> jax.Array:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )


def distort(cam: PinholeCamera, xy: jax.Array) -> jax.Array:
    """Apply the distortion model to normalized coords xy (...,2)."""
    if cam.dist_model == DIST_NONE:
        return xy
    x, y = xy[..., 0], xy[..., 1]
    k1, k2, p1, p2 = cam.dist[0], cam.dist[1], cam.dist[2], cam.dist[3]
    if cam.dist_model == DIST_RADTAN:
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return jnp.stack([xd, yd], axis=-1)
    # Equidistant (Kannala-Brandt): coeffs are k1..k4 on theta.
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1 + k1 * t2 + k2 * t2**2 + p1 * t2**3 + p2 * t2**4)
    scale = jnp.where(r > 1e-8, theta_d / jnp.maximum(r, 1e-8), 1.0)
    return xy * scale[..., None]


def _omni_poly(cam: PinholeCamera, rho: jax.Array) -> jax.Array:
    """OCamCalib z-polynomial f(rho) via Horner (BackProjectOmni,
    Camera.cpp: coefficients a0..a4)."""
    d = cam.dist
    z = d[4]
    z = d[3] + z * rho
    z = d[2] + z * rho
    z = d[1] + z * rho
    return d[0] + z * rho


def omni_backproject_normalized(cam: PinholeCamera, uv: jax.Array) -> jax.Array:
    """Omni pixels -> normalized coords (x/z, y/z): affine-correct around
    the distortion center, evaluate the polynomial for z
    (Camera::BackProjectOmni)."""
    rect = jnp.einsum(
        "ij,...j->...i", cam.omni_affine_inv, uv - cam.omni_center
    )
    rho = jnp.linalg.norm(rect, axis=-1)
    z = _omni_poly(cam, rho)
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    return rect / safe_z[..., None]


def omni_project(cam: PinholeCamera, p_cam: jax.Array, iters: int = 12):
    """Omni projection by Newton inversion of the radial polynomial
    (beyond the reference, which leaves projectOmni unimplemented —
    Camera.cpp:196-198): solve m*f(rho) - z*rho = 0 for rho, where m is
    the in-plane norm of the camera point."""
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    m = jnp.sqrt(x * x + y * y)
    d = cam.dist
    rho = jnp.full_like(m, 100.0)  # generic fisheye starting radius
    for _ in range(iters):
        f = _omni_poly(cam, rho)
        df = d[1] + rho * (2 * d[2] + rho * (3 * d[3] + rho * 4 * d[4]))
        g = m * f - z * rho
        dg = m * df - z
        rho = rho - g / jnp.where(jnp.abs(dg) < 1e-9, 1e-9, dg)
    scale = jnp.where(m > 1e-9, rho / jnp.maximum(m, 1e-9), 0.0)
    rect = jnp.stack([x * scale, y * scale], -1)
    affine = jnp.linalg.inv(cam.omni_affine_inv)
    uv = jnp.einsum("ij,...j->...i", affine, rect) + cam.omni_center
    valid = (
        (uv[..., 0] >= 0)
        & (uv[..., 0] < cam.width)
        & (uv[..., 1] >= 0)
        & (uv[..., 1] < cam.height)
    )
    return uv, valid


def project(cam: PinholeCamera, p_cam: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Project camera-frame points (...,3) to distorted pixels (...,2).

    Returns (uv, valid) where valid = in front of camera and inside image
    (reference Camera::project + visibility checks, Camera.cpp:50-141)."""
    if cam.dist_model == DIST_OMNI:
        return omni_project(cam, p_cam)
    z = p_cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    xy = p_cam[..., 0:2] / safe_z[..., None]
    xyd = distort(cam, xy)
    u = cam.fx * xyd[..., 0] + cam.cx
    v = cam.fy * xyd[..., 1] + cam.cy
    uv = jnp.stack([u, v], axis=-1)
    valid = (
        (z > 1e-6)
        & (u >= 0)
        & (u < cam.width)
        & (v >= 0)
        & (v < cam.height)
    )
    return uv, valid


def undistort_to_normalized(
    cam: PinholeCamera, uv: jax.Array, iters: int = 25
) -> jax.Array:
    """Invert the distortion: pixels (...,2) -> undistorted normalized
    coords. Fixed-iteration Newton/fixed-point, the batched equivalent of
    cv::undistortPoints (used by UndistorterRectifier.cpp:213-230)."""
    if cam.dist_model == DIST_OMNI:
        return omni_backproject_normalized(cam, uv)
    xd = (uv[..., 0] - cam.cx) / cam.fx
    yd = (uv[..., 1] - cam.cy) / cam.fy
    target = jnp.stack([xd, yd], axis=-1)
    if cam.dist_model == DIST_NONE:
        return target

    # Unrolled fixed point xy <- xy - (distort(xy) - target): a lax loop
    # would keep each tiny (N,2) step a separate sequential kernel on TPU;
    # unrolling lets XLA fuse the whole chain into one.
    xy = target
    for _ in range(iters):
        xy = xy - (distort(cam, xy) - target)
    return xy


def backproject(cam: PinholeCamera, uv: jax.Array, depth: jax.Array) -> jax.Array:
    """Pixels + depth(z) -> camera-frame 3D points (reference
    Camera::backProject)."""
    xy = undistort_to_normalized(cam, uv)
    ones = jnp.ones_like(xy[..., :1])
    return jnp.concatenate([xy, ones], axis=-1) * depth[..., None]


def bearing_vectors(cam: PinholeCamera, uv: jax.Array) -> jax.Array:
    """Unit bearing vectors in the camera frame for distorted pixels
    (reference UndistorterRectifier::GetBearingVector,
    UndistorterRectifier.cpp:73-113)."""
    xy = undistort_to_normalized(cam, uv)
    ones = jnp.ones_like(xy[..., :1])
    v = jnp.concatenate([xy, ones], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Stereo rectification
# ---------------------------------------------------------------------------


@struct.dataclass
class StereoCamera:
    """A rectified stereo rig.

    After rectification both cameras share pinhole intrinsics
    (fx, fy, cx, cy) with zero distortion; the right camera sits at
    baseline b along rectified x. `R_rect_l` maps *left-camera* coords to
    *rectified-left* coords (and likewise right). Mirrors the data the
    reference derives via cv::stereoRectify (StereoCamera.cpp:34-94).
    """

    left: PinholeCamera
    right: PinholeCamera
    # Rectified shared intrinsics
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    baseline: jax.Array  # meters
    R_rect_l: jax.Array  # (3,3) rect-from-leftcam
    R_rect_r: jax.Array  # (3,3) rect-from-rightcam
    # Body-from-rectified-left-camera pose (the backend's camera frame).
    R_b_rect: jax.Array
    t_b_rect: jax.Array

    @classmethod
    def from_params(cls, left_p: CameraParams, right_p: CameraParams) -> "StereoCamera":
        left = PinholeCamera.from_params(left_p)
        right = PinholeCamera.from_params(right_p)
        # Relative pose right-from-left in camera frames (numpy, host-side).
        T_b_l = np.asarray(left_p.T_BS, np.float64)
        T_b_r = np.asarray(right_p.T_BS, np.float64)
        T_r_l = np.linalg.inv(T_b_r) @ T_b_l  # left-cam coords -> right-cam
        R = T_r_l[:3, :3]
        t = T_r_l[:3, 3]  # position of left origin in right frame

        # --- Bouguet-style rectification (what cv::stereoRectify does) ---
        # Split the relative rotation: left rotates forward by half, right
        # rotates back by half, so both share one orientation.
        from scipy.spatial.transform import Rotation

        om = Rotation.from_matrix(R).as_rotvec()
        r_fwd = Rotation.from_rotvec(0.5 * om).as_matrix()  # exp(+om/2)
        r_back = r_fwd.T  # exp(-om/2)
        # Baseline in the shared (half-rotated) orientation.
        t_rect = r_back @ t
        b = np.linalg.norm(t_rect)
        # Minimal rotation wR aligning t_rect with the (signed) x axis.
        uu = np.array([1.0 if t_rect[0] > 0 else -1.0, 0.0, 0.0])
        ww = np.cross(t_rect, uu)
        nw = np.linalg.norm(ww)
        angle = np.arccos(np.clip(abs(t_rect[0]) / b, -1.0, 1.0))
        if nw > 1e-12:
            wR = Rotation.from_rotvec(ww / nw * angle).as_matrix()
        else:
            wR = np.eye(3)
        R_rect_l = wR @ r_fwd
        R_rect_r = wR @ r_back

        # Shared rectified intrinsics: follow OpenCV default alpha=-1-ish
        # choice: fy' = fx' = fy of left, principal point centered.
        f_new = float(left_p.intrinsics[1])
        cx_new = left_p.width / 2.0
        cy_new = left_p.height / 2.0

        # Body-from-rectified-left: T_b_l composed with rect rotation.
        R_b_rect = T_b_l[:3, :3] @ R_rect_l.T
        t_b_rect = T_b_l[:3, 3]

        f = lambda x: jnp.asarray(x, jnp.float32)
        return cls(
            left=left,
            right=right,
            fx=f(f_new),
            fy=f(f_new),
            cx=f(cx_new),
            cy=f(cy_new),
            baseline=f(b),
            R_rect_l=f(R_rect_l),
            R_rect_r=f(R_rect_r),
            R_b_rect=f(R_b_rect),
            t_b_rect=f(t_b_rect),
        )

    def project_rect(self, p_rect: jax.Array):
        """Rectified-left-frame points (...,3) -> (uL, uR, v) stereo pixels.
        Mirrors gtsam::StereoCamera::project used by the backend's smart
        stereo factors."""
        z = p_rect[..., 2]
        safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
        uL = self.fx * p_rect[..., 0] / safe_z + self.cx
        uR = self.fx * (p_rect[..., 0] - self.baseline) / safe_z + self.cx
        v = self.fy * p_rect[..., 1] / safe_z + self.cy
        return jnp.stack([uL, uR, v], axis=-1), z > 1e-6

    def backproject_rect(self, uLuRv: jax.Array) -> jax.Array:
        """Stereo measurement -> rectified-left 3D point (disparity depth)."""
        uL, uR, v = uLuRv[..., 0], uLuRv[..., 1], uLuRv[..., 2]
        disp = jnp.maximum(uL - uR, 1e-6)
        z = self.fx * self.baseline / disp
        x = (uL - self.cx) * z / self.fx
        y = (v - self.cy) * z / self.fy
        return jnp.stack([x, y, z], axis=-1)


def rectify_keypoints(stereo: StereoCamera, cam: PinholeCamera, R_rect: jax.Array, uv: jax.Array) -> jax.Array:
    """Distorted pixels in `cam` -> rectified pixel coords (shared
    intrinsics). Reference StereoCamera::rectifyLeftKeypoints / the
    keypoint path of UndistorterRectifier (StereoCamera.cpp:236)."""
    xy = undistort_to_normalized(cam, uv)
    ones = jnp.ones_like(xy[..., :1])
    rays = jnp.concatenate([xy, ones], axis=-1)
    rays_rect = (R_rect @ rays[..., None])[..., 0]
    z = jnp.maximum(rays_rect[..., 2], 1e-8)
    u = stereo.fx * rays_rect[..., 0] / z + stereo.cx
    v = stereo.fy * rays_rect[..., 1] / z + stereo.cy
    return jnp.stack([u, v], axis=-1)


def unrectify_keypoints(stereo: StereoCamera, cam: PinholeCamera, R_rect: jax.Array, uv_rect: jax.Array) -> jax.Array:
    """Rectified pixels -> distorted pixels in the original camera
    (reference UndistorterRectifier::distortUnrectifyKeypoints,
    UndistorterRectifier.cpp:213)."""
    x = (uv_rect[..., 0] - stereo.cx) / stereo.fx
    y = (uv_rect[..., 1] - stereo.cy) / stereo.fy
    rays_rect = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    rays = (R_rect.T @ rays_rect[..., None])[..., 0]
    z = jnp.maximum(rays[..., 2], 1e-8)
    xy = rays[..., 0:2] / z[..., None]
    xyd = distort(cam, xy)
    u = cam.fx * xyd[..., 0] + cam.cx
    v = cam.fy * xyd[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def _distort_np(dist_model: int, dist: np.ndarray, xy: np.ndarray) -> np.ndarray:
    """Pure-numpy mirror of `distort` (radtan / equidistant) for
    construction-time map building — no accelerator involvement."""
    if dist_model == DIST_NONE:
        return xy
    x, y = xy[..., 0], xy[..., 1]
    k1, k2, p1, p2 = float(dist[0]), float(dist[1]), float(dist[2]), float(dist[3])
    if dist_model == DIST_RADTAN:
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return np.stack([xd, yd], axis=-1)
    r = np.sqrt(x * x + y * y)
    theta = np.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1 + k1 * t2 + k2 * t2**2 + p1 * t2**3 + p2 * t2**4)
    scale = np.where(r > 1e-8, theta_d / np.maximum(r, 1e-8), 1.0)
    return xy * scale[..., None]


def rectification_map(stereo: StereoCamera, cam: PinholeCamera, R_rect: jax.Array) -> np.ndarray:
    """Dense inverse map for image rectification: for every *rectified*
    pixel, the (x, y) source location in the distorted image. Shape
    (H, W, 2), float32. Precomputed once per rig (the equivalent of
    cv::initUndistortRectifyMap, UndistorterRectifier.cpp:230); applied
    with `remap_bilinear`.

    Computed in PURE NUMPY on the host: this runs at pipeline
    construction, and eager accelerator math here costs compile
    round-trips + d2h fetches over a remote-TPU tunnel (measured ~165 s
    of bench warmup before this was host-side). Mirrors
    `unrectify_keypoints` for the pinhole+radtan/equidistant models
    (UndistorterRectifier::distortUnrectifyKeypoints,
    UndistorterRectifier.cpp:213)."""
    H, W = cam.height, cam.width
    ys = np.arange(H, dtype=np.float64)
    xs = np.arange(W, dtype=np.float64)
    vv, uu = np.meshgrid(ys, xs, indexing="ij")
    x = (uu - float(stereo.cx)) / float(stereo.fx)
    y = (vv - float(stereo.cy)) / float(stereo.fy)
    rays_rect = np.stack([x, y, np.ones_like(x)], axis=-1)  # (H, W, 3)
    Rt = np.asarray(R_rect, np.float64).T
    rays = rays_rect @ Rt.T
    z = np.maximum(rays[..., 2], 1e-8)
    xy = rays[..., 0:2] / z[..., None]
    if cam.dist_model == DIST_OMNI:
        # Omni rigs never take this path in practice (the reference's
        # omni support is backproject-only); fall back to the jax
        # implementation for exactness if ever hit.
        return np.asarray(
            unrectify_keypoints(
                stereo, cam, jnp.asarray(R_rect),
                jnp.asarray(np.stack([uu, vv], -1), jnp.float32),
            )
        )
    xyd = _distort_np(cam.dist_model, np.asarray(cam.dist), xy)
    u = float(cam.fx) * xyd[..., 0] + float(cam.cx)
    v = float(cam.fy) * xyd[..., 1] + float(cam.cy)
    return np.stack([u, v], axis=-1).astype(np.float32)


class SeparableRemap:
    """TPU-native fixed-map bilinear remap as two spatially-varying
    SEPARABLE resampling passes built from static shifted-select taps.

    The generic `remap_bilinear` is a 4-way per-pixel gather; large 2D
    gathers are extremely slow on TPU (~20 ms for a 480x752 image, measured)
    because they cannot be tiled onto the vector units. For a FIXED map
    (rectification, cv::initUndistortRectifyMap semantics,
    UndistorterRectifier.cpp:230) the displacement field is smooth and
    bounded, so the remap factors into:

      pass 1 (vertical):   tmp(i,j) = lerp_y img(Y(i,j), j)
      pass 2 (horizontal): out(i,j) = lerp_x tmp(i, x(i,j))

    where Y(i, j') = y(i, x^-1(i, j')) is the row-wise reparametrized
    vertical map (precomputed on host by inverting the monotone x-map per
    row), making the composition exact up to the variation of Y between
    adjacent source columns (|dY/dj| * 1px ~ 0.03 px for EuRoC — far below
    bilinear-remap quantization in OpenCV, which uses 1/32 px fixed point).
    Each pass is a sum over a STATIC tap range of shifted images weighted by
    precomputed selector fields — pure VPU element-wise work, no gathers.
    """

    def __init__(self, mapxy):
        mapxy = np.asarray(mapxy, np.float32)
        H, W, _ = mapxy.shape
        x = np.clip(mapxy[..., 0], 0.0, W - 1.001)
        y = np.clip(mapxy[..., 1], 0.0, H - 1.001)
        cols = np.arange(W, dtype=np.float32)
        Y = np.empty_like(y)
        for i in range(H):
            xi = x[i]
            if not np.all(np.diff(xi) > 0):
                # Degenerate map row: enforce monotonicity for the inverse.
                xi = np.maximum.accumulate(xi + np.arange(W) * 1e-6)
            Y[i] = np.interp(cols, xi, y[i])
        Y = np.clip(Y, 0.0, H - 1.001)
        fy = (Y - np.floor(Y)).astype(np.float32)
        dy = np.floor(Y).astype(np.int32) - np.arange(H, dtype=np.int32)[:, None]
        fx = (x - np.floor(x)).astype(np.float32)
        dx = np.floor(x).astype(np.int32) - np.arange(W, dtype=np.int32)[None, :]
        self.r_lo, self.r_hi = int(dy.min()), int(dy.max()) + 1
        self.c_lo, self.c_hi = int(dx.min()), int(dx.max()) + 1
        # Kept as NUMPY on the host object. The selector fields must reach
        # the jitted frame step as ARGUMENTS (see device_taps), never as
        # closed-over constants: device-resident constants are re-fetched
        # d2h (~10 MB/s tunnel) on every lowering, and host constants
        # constant-fold into per-tap dense weight planes that blow the
        # lowered module to ~780 MB of text (measured) and wreck compile
        # time + compilation-cache behavior.
        self.dy, self.fy = dy, fy
        self.dx, self.fx = dx, fx
        self.H, self.W = H, W
        self.n_taps = (self.r_hi - self.r_lo + 1) + (self.c_hi - self.c_lo + 1)

    def device_taps(self) -> tuple:
        """Selector fields as device arrays, to be passed as jit
        arguments (they enter the program as parameters, keeping the
        lowered module small and its cache key stable)."""
        return (
            jnp.asarray(self.dy), jnp.asarray(self.fy),
            jnp.asarray(self.dx), jnp.asarray(self.fx),
        )

    def __call__(self, img: jax.Array, taps: tuple | None = None) -> jax.Array:
        H, W = self.H, self.W
        dy, fy, dx, fx = taps if taps is not None else (
            self.dy, self.fy, self.dx, self.fx
        )
        img = img.astype(jnp.float32)
        pt, pb = max(-self.r_lo, 0), max(self.r_hi, 0)
        imgp = jnp.pad(img, ((pt, pb), (0, 0)), mode="edge")
        tmp = jnp.zeros_like(img)
        for r in range(self.r_lo, self.r_hi + 1):
            w = jnp.where(dy == r, 1.0 - fy, 0.0) + jnp.where(
                dy == r - 1, fy, 0.0
            )
            tmp = tmp + w * jax.lax.slice(imgp, (pt + r, 0), (pt + r + H, W))
        pl, pr = max(-self.c_lo, 0), max(self.c_hi, 0)
        tmpp = jnp.pad(tmp, ((0, 0), (pl, pr)), mode="edge")
        out = jnp.zeros_like(img)
        for c in range(self.c_lo, self.c_hi + 1):
            w = jnp.where(dx == c, 1.0 - fx, 0.0) + jnp.where(
                dx == c - 1, fx, 0.0
            )
            out = out + w * jax.lax.slice(tmpp, (0, pl + c), (H, pl + c + W))
        return out


def remap_bilinear(img: jax.Array, mapxy: jax.Array) -> jax.Array:
    """Bilinear remap of img (H,W) by map (H,W,2) of source coords.
    Out-of-bounds reads clamp to the border (cv::BORDER_REPLICATE-like)."""
    H, W = img.shape[-2], img.shape[-1]
    x = mapxy[..., 0]
    y = mapxy[..., 1]
    x0 = jnp.clip(jnp.floor(x), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2)
    wx = jnp.clip(x - x0, 0.0, 1.0)
    wy = jnp.clip(y - y0, 0.0, 1.0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    img_f = img.astype(jnp.float32)
    g = lambda yy, xx: img_f[yy, xx]
    v00 = g(y0i, x0i)
    v01 = g(y0i, x0i + 1)
    v10 = g(y0i + 1, x0i)
    v11 = g(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
