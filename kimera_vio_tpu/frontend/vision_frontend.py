"""Stereo vision frontend: per-frame tracking + per-keyframe geometry.

TPU-native rebuild of StereoVisionImuFrontend
(reference src/frontend/StereoVisionImuFrontend.cpp:102-481) and the shared
VisionImuFrontend state machine (VisionImuFrontend.cpp:50-64):

per frame (jitted, device-resident):
  1. preintegrate the frame's IMU block, continuing from the last keyframe
     (ImuFrontend accumulation, StereoVisionImuFrontend.cpp:129-150),
  2. predict keypoint motion from the gyro rotation (rotational optical
     flow, OpticalFlowPredictor.cpp:70-126),
  3. pyramidal LK track from the last keyframe's image
     (Tracker::featureTracking, Tracker.cpp:137-188),
  4. keyframe policy: max/min intra-keyframe time, min features, disparity
     (shouldBeKeyframe, VisionImuFrontend.cpp:175-232);

per keyframe (jitted):
  5. mono RANSAC (2-pt with gyro rotation / 5-pt)
     (StereoVisionImuFrontend.cpp:353-360),
  6. sparse stereo matching -> (uL, uR, v) + depths
     (StereoMatcher, :364),
  7. stereo RANSAC (1-pt voting given rotation / 3-pt Arun) (:369-387),
  8. feature re-detection with occupancy suppression (:421),
  9. emit StereoMeasurements for the backend (:485-531).

The tracked-feature state lives on device as a fixed-capacity
`TrackedFeatures` SoA; landmark ids are assigned by a monotonically growing
on-device counter (FeatureDetector.cpp:140-152).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from kimera_vio_tpu.common import geometry as geo
from kimera_vio_tpu.common.types import (
    ImuBias,
    ImuBlock,
    StereoMeasurements,
    TrackedFeatures,
)
from kimera_vio_tpu.frontend import imu_frontend as imu
from kimera_vio_tpu.frontend.camera import (
    PinholeCamera,
    StereoCamera,
    bearing_vectors,
    rectification_map,
    rectify_keypoints,
    remap_bilinear,
)
from kimera_vio_tpu.ops import corner_detection as det
from kimera_vio_tpu.ops import optical_flow as of
from kimera_vio_tpu.ops import ransac
from kimera_vio_tpu.ops.stereo_matching import match_stereo

TRACKING_VALID = 0
TRACKING_LOW_DISPARITY = 1
TRACKING_FEW_MATCHES = 2
TRACKING_INVALID = 3


@struct.dataclass
class FrontendConfig:
    """Static frontend configuration + precomputed camera data."""

    # static ints (specialize the trace)
    max_features: int = struct.field(pytree_node=False, default=384)
    klt_win: int = struct.field(pytree_node=False, default=24)
    klt_max_iter: int = struct.field(pytree_node=False, default=30)
    klt_max_level: int = struct.field(pytree_node=False, default=4)
    templ_cols: int = struct.field(pytree_node=False, default=101)
    templ_rows: int = struct.field(pytree_node=False, default=11)
    max_disparity: int = struct.field(pytree_node=False, default=128)
    n_hyp_mono: int = struct.field(pytree_node=False, default=128)
    nr_horizontal_bins: int = struct.field(pytree_node=False, default=7)
    nr_vertical_bins: int = struct.field(pytree_node=False, default=5)
    # FeatureDetector type (FeatureDetector.cpp:34-88): 0 FAST, 1 ORB
    # (FAST detection + Harris ranking), 2 AGAST (unsupported, like the
    # reference which LOG(FATAL)s), 3 GFTT (the EuRoC default).
    detector_type: int = struct.field(pytree_node=False, default=3)
    # ANMS algorithm (AnmsAlgorithmType, NonMaximumSuppression.h:52-60):
    # 6 = binning (the reference FrontendParams.yaml:40 default — fused
    # per-bin top-k here); 0-5 = TopN/BrownANMS/SDC/KdTree/RangeTree/SSC
    # via ops/anms.py.
    anms_type: int = struct.field(pytree_node=False, default=6)
    max_nr_keypoints_before_anms: int = struct.field(
        pytree_node=False, default=1024
    )
    mono: bool = struct.field(pytree_node=False, default=False)
    rgbd: bool = struct.field(pytree_node=False, default=False)
    # LCD feature capacity: > 0 fuses the loop-closure front half
    # (detect + oriented-binary descriptors + sparse stereo) into the
    # keyframe branch — the images are already on device, so the host LCD
    # module gets its features from the frame outputs instead of paying
    # per-keyframe image re-transfers + dispatches over the tunnel
    # (reference extracts cv::ORB inside the LCD thread,
    # LoopClosureDetector.cpp:142-150).
    lcd_features: int = struct.field(pytree_node=False, default=0)
    # Grid-detector spacing for the fused LCD extraction (from
    # LcdParams.min_distance via the pipeline; reference drives its LCD
    # ORB params from LcdParams the same way).
    lcd_min_distance: float = struct.field(pytree_node=False, default=12.0)
    # LK implementation: "matmul" (MXU window resampling + per-keyframe
    # template cache — measured fastest on TPU v5e, see ROADMAP round 5
    # LK table), "gather" (vmapped dynamic-slice), or "pallas"
    # (ops/pallas/lk_kernel.py Mosaic kernel). One selector, no silent
    # fallback paths (round-4 verdict: a use_pallas_lk flag existed that
    # never executed).
    lk_impl: str = struct.field(pytree_node=False, default="matmul")
    # RGB-D: depth below min or above max -> invalid (RgbdCamera gates).
    depth_min: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.1))
    depth_max: jax.Array = struct.field(default_factory=lambda: jnp.float32(10.0))
    use_2point_mono: bool = struct.field(pytree_node=False, default=True)
    use_1point_stereo: bool = struct.field(pytree_node=False, default=True)
    do_subpixel: bool = struct.field(pytree_node=False, default=True)
    # static floats consumed inside Pallas kernels
    klt_eps: float = struct.field(pytree_node=False, default=0.1)
    # traced scalars
    max_feature_age: jax.Array = struct.field(default_factory=lambda: jnp.int32(25))
    quality_level: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.001))
    min_distance: jax.Array = struct.field(default_factory=lambda: jnp.float32(20.0))
    min_intra_kf_time: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.2))
    max_intra_kf_time: jax.Array = struct.field(default_factory=lambda: jnp.float32(5.0))
    min_features: jax.Array = struct.field(default_factory=lambda: jnp.int32(0))
    disparity_threshold: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.5))
    max_disparity_since_lkf: jax.Array = struct.field(default_factory=lambda: jnp.float32(1000.0))
    ransac_threshold_mono: jax.Array = struct.field(default_factory=lambda: jnp.float32(1e-6))
    ransac_threshold_stereo: jax.Array = struct.field(default_factory=lambda: jnp.float32(6.2514))
    min_mono_inliers: jax.Array = struct.field(default_factory=lambda: jnp.int32(10))
    min_stereo_inliers: jax.Array = struct.field(default_factory=lambda: jnp.int32(5))
    min_point_dist: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.5))
    max_point_dist: jax.Array = struct.field(default_factory=lambda: jnp.float32(10.0))
    templ_tolerance: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.15))
    pixel_sigma: jax.Array = struct.field(default_factory=lambda: jnp.float32(1.0))

    @classmethod
    def from_params(cls, fp, max_features=384):
        """Build from a FrontendParams (config/params.py)."""
        f, i = jnp.float32, jnp.int32
        # Static max disparity bound (fx*b/minDepth is ~101 on EuRoC).
        return cls(
            max_features=max_features,
            klt_win=fp.klt_win_size,
            klt_max_iter=fp.klt_max_iter,
            klt_max_level=fp.klt_max_level,
            templ_cols=fp.templ_cols,
            templ_rows=fp.templ_rows,
            nr_horizontal_bins=fp.nr_horizontal_bins,
            nr_vertical_bins=fp.nr_vertical_bins,
            detector_type=fp.feature_detector_type,
            anms_type=(
                fp.non_max_suppression_type
                if fp.enable_non_max_suppression
                else 0
            ),
            # Candidate-pool bound for the explicit ANMS algorithms; the
            # reference detects up to this many before suppression
            # (FrontendParams.yaml:38). Capped at 1024: the pairwise/greedy
            # kernels are O(M^2)/O(M*G^2) and 1024 strongest candidates
            # saturate a 480x752 frame's corner population anyway.
            max_nr_keypoints_before_anms=min(
                int(fp.max_nr_keypoints_before_anms), 1024
            ),
            use_2point_mono=fp.ransac_use_2point_mono,
            use_1point_stereo=fp.ransac_use_1point_stereo,
            # NOTE equalize_image is consumed by the DATA PROVIDER
            # (EurocDataProvider(equalize=...), plumbed in __main__.py) —
            # the reference equalizes at provider level too
            # (EurocDataProvider.cpp mono histogram equalization).
            do_subpixel=fp.enable_subpixel_corner_finder,
            klt_eps=float(fp.klt_eps),
            max_feature_age=i(fp.max_feature_age),
            quality_level=f(fp.quality_level),
            min_distance=f(fp.min_distance),
            min_intra_kf_time=f(fp.min_intra_keyframe_time_s),
            max_intra_kf_time=f(fp.max_intra_keyframe_time_s),
            min_features=i(fp.min_number_features),
            disparity_threshold=f(fp.disparity_threshold),
            max_disparity_since_lkf=f(fp.max_disparity_since_lkf),
            ransac_threshold_mono=f(fp.ransac_threshold_mono),
            # reference yaml value 1.0 is fed to the chi2 voting gate; the
            # comment in Tracker.cpp:484-490 documents 6.2514 = chi2inv(.9,3)
            ransac_threshold_stereo=f(6.2514 * fp.ransac_threshold_stereo),
            min_mono_inliers=i(fp.min_nr_mono_inliers),
            min_stereo_inliers=i(fp.min_nr_stereo_inliers),
            min_point_dist=f(fp.min_point_dist),
            max_point_dist=f(fp.max_point_dist),
            templ_tolerance=f(fp.tolerance_template_matching),
            # ransac_max_iterations maps onto the batched-hypothesis count
            # (the reference's opengv max_iterations is a sequential
            # iteration cap; here all hypotheses evaluate in parallel, so
            # the cap IS the batch size — rounded to a lane multiple).
            # Intentionally not consumed (parity notes):
            # - bidirectional_matching / subpixel_refinement_stereo: parsed
            #   for schema parity; the REFERENCE never implements them
            #   either (StereoMatcher.cpp:258 "TODO ... bidirectional
            #   checking" — dead fields in StereoMatchingParams).
            # - ransac_probability: sequential-RANSAC early-exit
            #   confidence; meaningless for a fixed parallel batch.
            n_hyp_mono=max(64, min(512, (fp.ransac_max_iterations + 63) // 64 * 64)),
        )


@struct.dataclass
class FrontendState:
    """Device-resident frontend state carried frame to frame."""

    features: TrackedFeatures  # tracked at the CURRENT frame
    lkf_features: TrackedFeatures  # as of the last keyframe
    lkf_pyramid: jax.Array  # (n_levels...) stacked? -> stored as tuple
    cur_pyramid: jax.Array
    lkf_grads: jax.Array
    pim: imu.Pim  # accumulated since last keyframe
    imu_bias: ImuBias
    lkf_uvd: jax.Array  # (N,3) last-keyframe stereo meas [uL,uR,v]
    lkf_uvd_mask: jax.Array  # (N,)
    lkf_stamp: jax.Array  # float32 s
    next_id: jax.Array  # int32 landmark id counter
    frame_count: jax.Array  # int32
    kf_count: jax.Array
    # Previous frame's tracking status: the reference keyframes immediately
    # the FIRST time disparity drops below threshold (disparity_low_first_time,
    # VisionImuFrontend.cpp:195-209) so zero-velocity factors engage at the
    # start of a stationary stretch, not after max_intra_kf_time.
    last_status: jax.Array = struct.field(
        default_factory=lambda: jnp.int32(TRACKING_VALID)
    )
    # Cached LK template stack (matmul LK only): template windows, template
    # gradients and inverse G matrices per pyramid level, all fixed between
    # keyframes (see ops/optical_flow.build_lk_templates). Saves the
    # per-frame template resampling entirely.
    lkf_templates: tuple = ()
    # Rectification-remap selector fields ((left_taps, right_taps), each
    # from SeparableRemap.device_taps()), threaded as ARGUMENTS so the
    # jitted step never embeds them as constants (constants are re-fetched
    # d2h per lowering / constant-fold into a ~780 MB module — see
    # SeparableRemap). Loop-invariant in the chunk scan carry.
    remaps: tuple = ()


def _stack_pyr(pyr: list[jax.Array]) -> tuple:
    return tuple(pyr)


class StereoFrontend:
    """Host-side orchestrator owning the jitted per-frame / per-keyframe
    computations. Not a pytree; holds static config + camera constants."""

    def __init__(self, cfg: FrontendConfig, stereo: StereoCamera, pim_params: imu.PimParams):
        self.cfg = cfg
        self.stereo = stereo
        self.pim_params = pim_params
        self.left = stereo.left
        H, W = self.left.height, self.left.width
        # Precompute rectification maps (host once). The dense remap runs as
        # a separable shifted-select resample (SeparableRemap): the generic
        # per-pixel gather costs ~20 ms/image on TPU, the separable form <1 ms.
        from kimera_vio_tpu.frontend.camera import SeparableRemap, cpu_backend

        # Construction-time geometry runs on the HOST CPU backend and is
        # stored as numpy: eager map construction on the accelerator costs
        # a tunnel round-trip per program (measured: the rectification-map
        # compile + d2h fetch alone was ~165 s of bench warmup), and
        # device-resident constants closed over by the jitted step are
        # re-fetched d2h at ~10 MB/s during EVERY lowering
        # (jax mlir ir_constant -> ArrayImpl._value). Numpy constants
        # embed from host memory for free.
        with cpu_backend():
            self.map_left = np.asarray(
                rectification_map(stereo, stereo.left, stereo.R_rect_l)
            )
            self.map_right = np.asarray(
                rectification_map(stereo, stereo.right, stereo.R_rect_r)
            )
        self.sep_remap_left = SeparableRemap(self.map_left)
        self.sep_remap_right = SeparableRemap(self.map_right)
        # Rectified intrinsics matrix for flow prediction.
        fx, fy = float(stereo.fx), float(stereo.fy)
        cx, cy = float(stereo.cx), float(stereo.cy)
        self.K_rect = np.array(
            [[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32
        )
        self.K_rect_inv = np.linalg.inv(self.K_rect).astype(np.float32)
        # R from body to rectified-left cam (for gyro rotation transfer).
        self.R_cam_body = np.asarray(stereo.R_b_rect).T
        # Raw-left-camera quantities: tracking/detection run on the RAW
        # image (the reference tracks unrectified frames and rectifies
        # keypoints, Tracker.cpp / UndistorterRectifier); full-image remap
        # happens only inside the keyframe branch for stereo matching.
        lf = self.left
        self.K_raw = np.array(
            [
                [float(lf.fx), 0.0, float(lf.cx)],
                [0.0, float(lf.fy), float(lf.cy)],
                [0.0, 0.0, 1.0],
            ],
            np.float32,
        )
        self.K_raw_inv = np.linalg.inv(self.K_raw).astype(np.float32)
        self.R_leftcam_body = np.asarray(self.left.R_bc).T
        # Identity rectification (mono / RGB-D rigs, distortion-free
        # synthetic cameras): skip the remap entirely.
        import numpy as _np
        from kimera_vio_tpu.frontend.camera import DIST_NONE

        self.identity_rect = bool(
            self.left.dist_model == DIST_NONE
            and _np.allclose(_np.asarray(stereo.R_rect_l), _np.eye(3), atol=1e-6)
            and _np.allclose(
                [float(stereo.fx), float(stereo.fy), float(stereo.cx), float(stereo.cy)],
                [float(lf.fx), float(lf.fy), float(lf.cx), float(lf.cy)],
            )
        )

        # Remap selector fields as device arrays: these enter every jitted
        # step as ARGUMENTS (threaded via FrontendState.remaps), never as
        # closed-over constants — see SeparableRemap.device_taps.
        self.remap_taps = (
            ()
            if self.identity_rect
            else (
                self.sep_remap_left.device_taps(),
                self.sep_remap_right.device_taps(),
            )
        )

        self._process_frame = jax.jit(self._process_frame_impl)
        self._init_state = jax.jit(self._init_state_impl)

    # ------------------------------------------------------------------
    # LK state-storage policy: the matmul tracker carries a per-keyframe
    # template cache instead of the full previous pyramid + gradients
    # (smaller state, no per-frame template work).
    def _pyr_store(self, pyr):
        return () if self.cfg.lk_impl == "matmul" else _stack_pyr(pyr)

    def _grads_store(self, grads):
        return () if grads is None else tuple(grads)

    def _lk_templates(self, pyr, grads, feats):
        if self.cfg.lk_impl != "matmul":
            return ()
        return of.build_lk_templates(
            list(pyr),
            feats.uv,
            feats.mask,
            win=self.cfg.klt_win,
            prev_grads=list(grads) if grads is not None else None,
        )

    def _grads_for_templates(self, pyr):
        """Full-image gradients only for the non-matmul trackers; the
        matmul template builder computes gradients on its patches."""
        if self.cfg.lk_impl == "matmul":
            return None
        return tuple(of._grad(p) for p in pyr)

    # ------------------------------------------------------------------
    def _rectify_uv(self, uv):
        if self.identity_rect:
            return uv
        return rectify_keypoints(
            self.stereo, self.stereo.left, self.stereo.R_rect_l, uv
        )

    def _remap_left(self, img, remaps=()):
        return (
            img
            if self.identity_rect
            else self.sep_remap_left(img, remaps[0] if remaps else None)
        )

    def _remap_right(self, img, remaps=()):
        return (
            img
            if self.identity_rect
            else self.sep_remap_right(img, remaps[1] if remaps else None)
        )

    def _versors_from_raw(self, uv_raw):
        """Unit bearing vectors in the RECTIFIED-left frame from raw
        (distorted) pixel coords."""
        return self._rect_and_versors(uv_raw)[1]

    def _rect_and_versors(self, uv_raw):
        """(uv_rect, versors) from ONE shared undistortion — the rectified
        pixel coords and the unit bearing vectors both live on the same
        undistorted ray (UndistorterRectifier::GetBearingVector +
        StereoCamera::rectifyLeftKeypoints share cv::undistortPoints)."""
        from kimera_vio_tpu.frontend.camera import undistort_to_normalized

        xy = undistort_to_normalized(self.left, uv_raw, iters=10)
        rays = jnp.concatenate([xy, jnp.ones_like(xy[:, :1])], axis=-1)
        rays = (self.stereo.R_rect_l @ rays[..., None])[..., 0]
        versors = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
        if self.identity_rect:
            return uv_raw, versors
        z = jnp.maximum(rays[..., 2], 1e-8)
        u = self.stereo.fx * rays[..., 0] / z + self.stereo.cx
        v = self.stereo.fy * rays[..., 1] / z + self.stereo.cy
        return jnp.stack([u, v], axis=-1), versors

    # ------------------------------------------------------------------
    def init_state(self, left_img, right_img, stamp):
        return self._init_state(
            left_img, right_img, jnp.float32(stamp), self.remap_taps
        )

    def _init_state_impl(self, left_img, right_img, stamp, remaps=()):
        cfg = self.cfg
        left_img = left_img.astype(jnp.float32)
        if not cfg.rgbd:
            right_img = right_img.astype(jnp.float32)
        pyr = of.build_pyramid(left_img, cfg.klt_max_level)
        grads = self._grads_for_templates(pyr)
        feats = TrackedFeatures.empty(cfg.max_features)
        uv, valid = det.detect_features(
            left_img,
            feats.uv,
            feats.mask,
            cfg.max_features,
            detector_type=cfg.detector_type,
            quality_level=cfg.quality_level,
            min_distance=cfg.min_distance,
            nr_horizontal_bins=cfg.nr_horizontal_bins,
            nr_vertical_bins=cfg.nr_vertical_bins,
            do_subpixel=cfg.do_subpixel,
            anms_type=cfg.anms_type,
            max_nr_keypoints_before_anms=cfg.max_nr_keypoints_before_anms,
        )
        ids = jnp.where(valid, jnp.arange(cfg.max_features, dtype=jnp.int32), -1)
        uv_rect0, versors0 = self._rect_and_versors(uv)
        feats = TrackedFeatures(
            uv=uv,  # raw (distorted) coords — the tracking domain
            uv_rect=uv_rect0,
            versors=versors0,
            ids=ids,
            ages=jnp.zeros(cfg.max_features, jnp.int32),
            mask=valid,
        )
        state = FrontendState(
            features=feats,
            lkf_features=feats,
            lkf_pyramid=self._pyr_store(pyr),
            cur_pyramid=self._pyr_store(pyr),
            lkf_grads=self._grads_store(grads),
            lkf_templates=self._lk_templates(pyr, grads, feats),
            pim=imu.Pim.zero(),
            imu_bias=ImuBias.zero(),
            lkf_uvd=jnp.zeros((cfg.max_features, 3), jnp.float32),
            lkf_uvd_mask=jnp.zeros(cfg.max_features, bool),
            lkf_stamp=stamp,
            next_id=jnp.int32(cfg.max_features),
            frame_count=jnp.int32(1),
            kf_count=jnp.int32(1),
            remaps=remaps,
        )
        # First keyframe output: stereo-match the fresh detections.
        left_rect = self._remap_left(left_img, remaps)
        right_rect = (
            right_img if cfg.rgbd else self._remap_right(right_img, remaps)
        )
        meas, n_stereo = self._stereo_measurements(left_rect, right_rect, feats)
        state = state.replace(lkf_uvd=meas.uvs, lkf_uvd_mask=meas.mask)
        return state, meas

    # ------------------------------------------------------------------
    def _stereo_measurements(self, left_rect, right_rect, feats):
        """Stereo measurements for the current feature set. In RGB-D mode
        `right_rect` is the DEPTH image: each keypoint's depth is sampled
        bilinearly and converted to a virtual-stereo disparity
        uR = uL - fx*b/z (reference RgbdFrame::fillStereoFrame,
        RgbdVisionImuFrontend.cpp:210,312,363 and the fake-stereo calib of
        RgbdCamera.cpp:92-104)."""
        cfg = self.cfg
        if cfg.rgbd:
            depth_img = right_rect
            x = feats.uv_rect[:, 0]
            y = feats.uv_rect[:, 1]
            H, W = depth_img.shape
            x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
            y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
            fx_ = jnp.clip(x - x0, 0.0, 1.0)
            fy_ = jnp.clip(y - y0, 0.0, 1.0)
            z = (
                depth_img[y0, x0] * (1 - fx_) * (1 - fy_)
                + depth_img[y0, x0 + 1] * fx_ * (1 - fy_)
                + depth_img[y0 + 1, x0] * (1 - fx_) * fy_
                + depth_img[y0 + 1, x0 + 1] * fx_ * fy_
            )
            ok = (
                feats.mask
                & (z > cfg.depth_min)
                & (z < cfg.depth_max)
                & jnp.isfinite(z)
            )
            safe_z = jnp.maximum(z, 1e-3)
            disparity = self.stereo.fx * self.stereo.baseline / safe_z
            uvd = jnp.stack(
                [feats.uv_rect[:, 0], feats.uv_rect[:, 0] - disparity,
                 feats.uv_rect[:, 1]], -1,
            )
            meas = StereoMeasurements(ids=feats.ids, uvs=uvd, mask=ok)
            return meas, ok.sum()
        if cfg.mono:
            # Mono frontend: measurements carry uR = NaN (reference
            # MonoVisionImuFrontend.cpp:230-340 packs mono keypoints as
            # StereoPoint2 with NaN uR).
            uvd = jnp.stack(
                [
                    feats.uv_rect[:, 0],
                    jnp.full_like(feats.uv_rect[:, 0], jnp.nan),
                    feats.uv_rect[:, 1],
                ],
                -1,
            )
            meas = StereoMeasurements(ids=feats.ids, uvs=uvd, mask=feats.mask)
            return meas, feats.mask.sum()
        uv_right, depth, ok = match_stereo(
            left_rect,
            right_rect,
            feats.uv_rect,
            feats.mask,
            fx=self.stereo.fx,
            baseline=self.stereo.baseline,
            templ_cols=cfg.templ_cols,
            templ_rows=cfg.templ_rows,
            max_disparity=cfg.max_disparity,
            min_point_dist=cfg.min_point_dist,
            max_point_dist=cfg.max_point_dist,
            tolerance=cfg.templ_tolerance,
        )
        uvd = jnp.stack(
            [feats.uv_rect[:, 0], uv_right[:, 0], feats.uv_rect[:, 1]], -1
        )
        meas = StereoMeasurements(ids=feats.ids, uvs=uvd, mask=ok & feats.mask)
        return meas, ok.sum()

    # ------------------------------------------------------------------
    def process_frame(self, state, left_img, right_img, imu_block, stamp):
        """Returns (state, outputs dict). Host wrapper over the jitted impl."""
        return self._process_frame(
            state, left_img, right_img, imu_block, jnp.float32(stamp)
        )

    def _process_frame_impl(
        self, state: FrontendState, left_img, right_img, imu_block: ImuBlock, stamp
    ):
        cfg = self.cfg
        left_img = left_img.astype(jnp.float32)
        if not cfg.rgbd:
            right_img = right_img.astype(jnp.float32)
        cur_pyr = of.build_pyramid(left_img, cfg.klt_max_level)

        # 1. Continue PIM accumulation since last keyframe.
        pim = imu.preintegrate(
            self.pim_params, imu_block, state.imu_bias, init=state.pim
        )

        # 2. Rotational flow prediction on RAW pixels: body rotation since
        # lkf -> left cam frame (the reference predictor also runs on the
        # distorted frame with the raw K, OpticalFlowPredictor.cpp:70-126).
        R_cam = self.R_cam_body @ pim.delta_R @ self.R_cam_body.T
        R_cam_raw = self.R_leftcam_body @ pim.delta_R @ self.R_leftcam_body.T
        feats = state.lkf_features
        init_uv = of.predict_flow_rotational(
            feats.uv,
            feats.mask,
            R_cam_raw.T,  # warp lkf points into current frame
            self.K_raw,
            self.K_raw_inv,
            self.left.width,
            self.left.height,
        )

        # 3. LK track lkf -> current (reference tracks kf-to-frame).
        if cfg.lk_impl == "matmul":
            tracked_uv, ok = of.klt_track_cached(
                state.lkf_templates,
                list(cur_pyr),
                init_uv,
                feats.mask,
                win=cfg.klt_win,
                max_iter=cfg.klt_max_iter,
                eps=cfg.klt_eps,
            )
        else:
            if cfg.lk_impl == "pallas":
                from kimera_vio_tpu.ops.pallas.lk_kernel import klt_track_pallas

                lk_fn = klt_track_pallas
            else:
                lk_fn = of.klt_track
            tracked_uv, ok = lk_fn(
                list(state.lkf_pyramid),
                list(cur_pyr),
                feats.uv,
                init_uv,
                feats.mask,
                win=cfg.klt_win,
                max_iter=cfg.klt_max_iter,
                eps=cfg.klt_eps,
                prev_grads=list(state.lkf_grads),
            )
        ok = ok & feats.mask & (feats.ages < cfg.max_feature_age)
        tracked_rect, tracked_versors = self._rect_and_versors(tracked_uv)
        cur_feats = TrackedFeatures(
            uv=tracked_uv,
            uv_rect=tracked_rect,
            versors=tracked_versors,
            ids=jnp.where(ok, feats.ids, -1),
            ages=feats.ages,
            mask=ok,
        )

        # 4. Keyframe policy (VisionImuFrontend::shouldBeKeyframe).
        dt = stamp - state.lkf_stamp
        disp = jnp.linalg.norm(tracked_uv - feats.uv, axis=-1)
        disp_ok = ok
        n_ok = ok.sum()
        med_disp = jnp.nanmedian(jnp.where(disp_ok, disp, jnp.nan))
        med_disp = jnp.nan_to_num(med_disp, nan=0.0)
        time_min = dt >= cfg.min_intra_kf_time
        time_max = dt >= cfg.max_intra_kf_time
        enough_disp = med_disp >= cfg.disparity_threshold
        too_few = n_ok < jnp.maximum(cfg.min_features, 1)
        low_disparity = time_min & ~enough_disp & ~too_few
        # Reference triggers (VisionImuFrontend.cpp:195-209): keyframe on the
        # FIRST low-disparity frame (so no-motion factors engage immediately)
        # and when disparity since lkf exceeds max_disparity_since_lkf.
        first_time_low = state.last_status != TRACKING_LOW_DISPARITY
        max_disp_reached = med_disp > cfg.max_disparity_since_lkf
        is_keyframe = (
            time_max
            | too_few
            | (time_min & enough_disp)
            | (low_disparity & first_time_low)
            | max_disp_reached
        )

        status = jnp.where(
            low_disparity,
            TRACKING_LOW_DISPARITY,
            jnp.where(too_few, TRACKING_FEW_MATCHES, TRACKING_VALID),
        )

        # --- keyframe branch under lax.cond: the detector / stereo matcher
        # / RANSAC stack only *executes* on keyframes (cond compiles both
        # branches but runs one), which is most frames' saving since
        # keyframes come at ~1/4 the frame rate ---
        def kf_fn(args):
            state, cur_feats, cur_pyr, left_img, right_img, pim, R_cam, stamp = args
            return self._keyframe_branch(
                state, cur_feats, cur_pyr, left_img, right_img, pim, R_cam, stamp
            )

        def nk_fn(args):
            state, cur_feats, cur_pyr, left_img, right_img, pim, R_cam, stamp = args
            nk_state = state.replace(
                features=cur_feats,
                cur_pyramid=self._pyr_store(cur_pyr),
                pim=pim,
                frame_count=state.frame_count + 1,
            )
            dummy_meas = StereoMeasurements(
                ids=cur_feats.ids,
                uvs=jnp.concatenate(
                    [
                        cur_feats.uv_rect[:, 0:1],
                        jnp.full_like(cur_feats.uv_rect[:, 0:1], jnp.nan),
                        cur_feats.uv_rect[:, 1:2],
                    ],
                    axis=-1,
                ),
                mask=jnp.zeros_like(cur_feats.mask),
            )
            dummy_extras = {
                "n_mono_inliers": jnp.int32(0),
                "n_stereo_inliers": jnp.int32(0),
                "t_stereo_vote": jnp.zeros(3, cur_feats.uv.dtype),
                "R_stereo": jnp.eye(3, dtype=cur_feats.uv.dtype),
                "t_mono": jnp.zeros(3, cur_feats.uv.dtype),
                "R_mono": jnp.eye(3, dtype=cur_feats.uv.dtype),
            }
            if cfg.lcd_features > 0:
                dummy_extras.update(self._lcd_zeros())
            return nk_state, dummy_meas, dummy_extras

        operands = (
            state, cur_feats, cur_pyr, left_img, right_img, pim, R_cam, stamp
        )
        new_state, kf_meas, kf_extras = jax.lax.cond(
            is_keyframe, kf_fn, nk_fn, operands
        )
        # RANSAC inlier-count gate: too few mono/stereo inliers downgrade the
        # keyframe status to FEW_MATCHES (reference Tracker marks
        # FEW_MATCHES/INVALID; min_*_inliers from TrackerParams).
        ransac_few = is_keyframe & (
            (kf_extras["n_mono_inliers"] < cfg.min_mono_inliers)
            | (
                jnp.bool_(not (cfg.mono or cfg.rgbd))
                & (kf_extras["n_stereo_inliers"] < cfg.min_stereo_inliers)
            )
        )
        status = jnp.where(
            ransac_few & (status == TRACKING_VALID), TRACKING_FEW_MATCHES, status
        )
        new_state = new_state.replace(last_status=status)
        outputs = {
            "is_keyframe": is_keyframe,
            "status": jnp.where(is_keyframe, status, TRACKING_VALID),
            "n_tracked": n_ok,
            "median_disparity": med_disp,
            "pim": pim,
            "measurements": kf_meas,
            "stamp": stamp,
            **kf_extras,
        }
        return new_state, outputs

    # ------------------------------------------------------------------
    def _lcd_extract(self, left_rect, right_rect):
        """Loop-closure feature front half, fused into the keyframe branch
        (mirrors LcdModule._extract; reference LoopClosureDetector.cpp:
        125-150 re-detects ORB + rebuilds sparse stereo in the LCD thread).
        Runs on device where the rectified images already live — the host
        LCD consumes these fields from the frame output instead of paying
        per-keyframe image uploads + extraction dispatches."""
        from kimera_vio_tpu.loopclosure import orb as orb_mod
        from kimera_vio_tpu.ops.stereo_matching import match_stereo

        n = self.cfg.lcd_features
        uv, ok = det.detect_features(
            left_rect,
            jnp.zeros((8, 2), jnp.float32),
            jnp.zeros(8, bool),
            n,
            min_distance=self.cfg.lcd_min_distance,
            do_subpixel=False,
        )
        desc, _, dok = orb_mod.orb_descriptors(left_rect, uv, ok)
        uvr, depth, sok = match_stereo(
            left_rect, right_rect, uv, ok,
            fx=self.stereo.fx, baseline=self.stereo.baseline,
            templ_cols=31, templ_rows=11, max_disparity=128,
        )
        uvd = jnp.stack([uv[:, 0], uvr[:, 0], uv[:, 1]], -1)
        pts3 = self.stereo.backproject_rect(uvd)
        versors = pts3 / jnp.maximum(
            jnp.linalg.norm(pts3, axis=-1, keepdims=True), 1e-9
        )
        return {
            "lcd_uv": uv.astype(jnp.float32),
            "lcd_ok": dok & sok,
            "lcd_desc": desc,
            "lcd_versors": versors.astype(jnp.float32),
            "lcd_pts3": pts3.astype(jnp.float32),
        }

    def _lcd_zeros(self, dtype=jnp.float32):
        n = self.cfg.lcd_features
        return {
            "lcd_uv": jnp.zeros((n, 2), jnp.float32),
            "lcd_ok": jnp.zeros(n, bool),
            "lcd_desc": jnp.zeros((n, 8), jnp.uint32),
            "lcd_versors": jnp.zeros((n, 3), jnp.float32),
            "lcd_pts3": jnp.zeros((n, 3), jnp.float32),
        }

    # ------------------------------------------------------------------
    def _keyframe_branch(
        self, state, cur_feats, cur_pyr, left_img, right_img, pim, R_cam, stamp
    ):
        cfg = self.cfg
        left_rect = self._remap_left(left_img, state.remaps)
        right_rect = (
            right_img
            if cfg.rgbd
            else self._remap_right(right_img, state.remaps)
        )
        lcd_extras = (
            self._lcd_extract(
                left_rect, left_rect if cfg.mono else right_rect
            )
            if cfg.lcd_features > 0
            else {}
        )

        # 5. Mono RANSAC on lkf<->cur bearing correspondences.
        f_ref = state.lkf_features.versors
        f_cur = cur_feats.versors
        pair_mask = cur_feats.mask & state.lkf_features.mask
        key = jax.random.fold_in(jax.random.PRNGKey(0), state.frame_count)
        if cfg.use_2point_mono:
            t_mono, mono_inl, n_mono = ransac.ransac_2pt_mono(
                f_ref, f_cur, pair_mask, R_cam, key,
                n_hyp=cfg.n_hyp_mono, threshold=cfg.ransac_threshold_mono,
            )
            R_mono = R_cam  # rotation given (gyro), 2-pt estimates t only
        else:
            R_mono, t_mono, mono_inl, n_mono = ransac.ransac_5pt_mono(
                f_ref, f_cur, pair_mask, key,
                n_hyp=cfg.n_hyp_mono, threshold=cfg.ransac_threshold_mono,
            )
        # Trust the RANSAC model only with enough inliers (otherwise keep all
        # tracks: the reference marks FEW_MATCHES and does not filter).
        mono_trust = n_mono >= cfg.min_mono_inliers
        feats_inl = cur_feats.replace(
            mask=cur_feats.mask & (mono_inl | ~pair_mask | ~mono_trust)
        )

        if cfg.mono:
            # Mono: no stereo matching / 1-pt voting; refill detections and
            # emit NaN-uR measurements.
            uv_new, new_valid = det.detect_features(
                left_img,
                feats_inl.uv,
                feats_inl.mask,
                cfg.max_features,
                detector_type=cfg.detector_type,
                quality_level=cfg.quality_level,
                min_distance=cfg.min_distance,
                nr_horizontal_bins=cfg.nr_horizontal_bins,
                nr_vertical_bins=cfg.nr_vertical_bins,
                do_subpixel=cfg.do_subpixel,
                anms_type=cfg.anms_type,
                max_nr_keypoints_before_anms=cfg.max_nr_keypoints_before_anms,
            )
            feats_full, next_id = self._merge_detections(
                feats_inl, uv_new, new_valid, state.next_id
            )
            meas_out, _ = self._stereo_measurements(left_rect, left_rect, feats_full)
            grads = self._grads_for_templates(cur_pyr)
            kf_state = state.replace(
                features=feats_full,
                lkf_features=feats_full,
                lkf_uvd=meas_out.uvs,
                lkf_uvd_mask=meas_out.mask,
                lkf_pyramid=self._pyr_store(cur_pyr),
                cur_pyramid=self._pyr_store(cur_pyr),
                lkf_grads=self._grads_store(grads),
                lkf_templates=self._lk_templates(cur_pyr, grads, feats_full),
                pim=imu.Pim.zero(state.imu_bias),
                lkf_stamp=stamp,
                next_id=next_id,
                frame_count=state.frame_count + 1,
                kf_count=state.kf_count + 1,
            )
            extras = {
                "n_mono_inliers": n_mono,
                "n_stereo_inliers": jnp.int32(0),
                "t_stereo_vote": jnp.zeros(3, cur_feats.uv.dtype),
                "R_stereo": jnp.eye(3, dtype=cur_feats.uv.dtype),
                "t_mono": t_mono,
                "R_mono": R_mono,
                **lcd_extras,
            }
            return kf_state, meas_out, extras

        # 6+8 reordered for ONE stereo-match call per keyframe (the
        # reference matches twice — before RANSAC on tracked features and
        # again after refill, StereoVisionImuFrontend.cpp:364,426; here
        # re-detection runs first and a single match covers the merged
        # set. The stereo RANSAC below is unaffected: it only uses pairs
        # with last-keyframe stereo data, which new detections lack. The
        # one deviation is that re-detection occupancy cannot see
        # stereo-RANSAC outliers, whose cells refill next keyframe.)
        uv_new, new_valid = det.detect_features(
            left_img,
            feats_inl.uv,
            feats_inl.mask,
            cfg.max_features,
            detector_type=cfg.detector_type,
            quality_level=cfg.quality_level,
            min_distance=cfg.min_distance,
            nr_horizontal_bins=cfg.nr_horizontal_bins,
            nr_vertical_bins=cfg.nr_vertical_bins,
            do_subpixel=cfg.do_subpixel,
            anms_type=cfg.anms_type,
            max_nr_keypoints_before_anms=cfg.max_nr_keypoints_before_anms,
        )
        feats_full, next_id = self._merge_detections(
            feats_inl, uv_new, new_valid, state.next_id
        )
        meas_full, _ = self._stereo_measurements(
            left_rect, right_rect, feats_full
        )

        # 7. Stereo RANSAC: 1-pt voting given rotation on 3D-3D pairs
        # between the last keyframe and now (needs lkf stereo depths; we
        # use the backend's triangulations in the pipeline — here the
        # voting runs on instantaneous stereo backprojections).
        meas_tracked = meas_full.replace(
            mask=meas_full.mask & feats_inl.mask
        )
        p_cur = self.stereo.backproject_rect(meas_tracked.uvs)
        # lkf 3D points from stored lkf measurements.
        p_ref = self.stereo.backproject_rect(state.lkf_uvd)
        both = meas_tracked.mask & state.lkf_uvd_mask
        cov_cur = ransac.stereo_point_cov_from_rect(
            self.stereo.fx, self.stereo.fy, self.stereo.cx, self.stereo.cy,
            self.stereo.baseline, meas_tracked.uvs, cfg.pixel_sigma,
        )
        cov_ref = ransac.stereo_point_cov_from_rect(
            self.stereo.fx, self.stereo.fy, self.stereo.cx, self.stereo.cy,
            self.stereo.baseline, state.lkf_uvd, cfg.pixel_sigma,
        )
        if cfg.use_1point_stereo:
            # 1-pt Mahalanobis voting, rotation from gyro (reference
            # Tracker custom solver, Tracker.cpp:497-596).
            t_vote, stereo_inl, n_stereo = ransac.voting_1pt_stereo(
                p_ref, p_cur, cov_ref, cov_cur, both, R_cam,
                threshold=cfg.ransac_threshold_stereo,
            )
            R_stereo = R_cam
        else:
            # 3-pt Arun 3d3d RANSAC: rotation estimated from vision
            # (Tracker.cpp:667-742; selected by ransac_use_1point_stereo=0).
            R_stereo, t_vote, stereo_inl, n_stereo = ransac.ransac_3pt_arun(
                p_ref, p_cur, both,
                jax.random.fold_in(key, 1),
                threshold=0.1,
            )
        # Remove stereo-RANSAC outlier tracks (reference Tracker marks their
        # landmarks invalid, Tracker.cpp:856-917) — but only when the model
        # is trusted (enough inliers).
        stereo_trust = n_stereo >= cfg.min_stereo_inliers
        kill = both & ~stereo_inl & stereo_trust
        feats_full = feats_full.replace(
            mask=feats_full.mask & ~kill,
            ids=jnp.where(kill, -1, feats_full.ids),
        )
        meas_out = meas_full.replace(
            ids=feats_full.ids, mask=meas_full.mask & ~kill
        )

        grads = self._grads_for_templates(cur_pyr)
        kf_state = state.replace(
            features=feats_full,
            lkf_features=feats_full,
            lkf_uvd=meas_out.uvs,
            lkf_uvd_mask=meas_out.mask,
            lkf_pyramid=self._pyr_store(cur_pyr),
            cur_pyramid=self._pyr_store(cur_pyr),
            lkf_grads=self._grads_store(grads),
            lkf_templates=self._lk_templates(cur_pyr, grads, feats_full),
            pim=imu.Pim.zero(state.imu_bias),
            lkf_stamp=stamp,
            next_id=next_id,
            frame_count=state.frame_count + 1,
            kf_count=state.kf_count + 1,
        )
        extras = {
            "n_mono_inliers": n_mono,
            "n_stereo_inliers": n_stereo,
            "t_stereo_vote": t_vote,
            "R_stereo": R_stereo,
            "t_mono": t_mono,
            "R_mono": R_mono,
            **lcd_extras,
        }
        return kf_state, meas_out, extras

    # ------------------------------------------------------------------
    def _merge_detections(self, feats, uv_new, new_valid, next_id):
        """Fill empty slots with new detections; age surviving tracks."""
        cfg = self.cfg
        N = cfg.max_features
        free = ~feats.mask
        # Rank new detections into free slots.
        free_slots = jnp.argsort(~free)  # free first
        rank = jnp.cumsum(new_valid) - 1
        can = new_valid & (rank < free.sum())
        slot = jnp.where(can, free_slots[jnp.clip(rank, 0, N - 1)], N)
        new_ids = next_id + rank.astype(jnp.int32)
        uv = feats.uv.at[slot].set(uv_new, mode="drop")  # raw coords
        ids = feats.ids.at[slot].set(jnp.where(can, new_ids, -1), mode="drop")
        ages = feats.ages.at[slot].set(0, mode="drop")
        mask = feats.mask.at[slot].set(True, mode="drop")
        uv_rect_m, versors_m = self._rect_and_versors(uv)
        out = TrackedFeatures(
            uv=uv,
            uv_rect=uv_rect_m,
            versors=versors_m,
            ids=ids,
            ages=jnp.where(mask, ages + 1, ages),
            mask=mask,
        )
        return out, next_id + can.sum().astype(jnp.int32)
