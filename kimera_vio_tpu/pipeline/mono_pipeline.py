"""MonoImuPipeline: monocular + IMU wiring.

Rebuild of the reference MonoImuPipeline (src/pipeline/MonoImuPipeline.cpp):
single camera, no mesher, mono (NaN-uR) measurements, mono-only RANSAC. The
"rig" is a degenerate StereoCamera whose rectification is plain
undistortion (R_rect = I, rectified intrinsics = original, left == right),
so every stereo-shaped op downstream is reused with uR masked.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from kimera_vio_tpu.config.params import CameraParams, VioParams
from kimera_vio_tpu.frontend.camera import PinholeCamera, StereoCamera
from kimera_vio_tpu.frontend.vision_frontend import FrontendConfig, StereoFrontend
from kimera_vio_tpu.pipeline.stereo_pipeline import StereoImuPipeline


def mono_rig(cam_params: CameraParams, nominal_baseline: float = 0.11) -> StereoCamera:
    """Degenerate stereo rig for the mono pipeline: identity rectification,
    original intrinsics, virtual baseline only used by code paths that are
    masked out for mono measurements."""
    cam = PinholeCamera.from_params(cam_params)
    f = jnp.float32
    T = np.asarray(cam_params.T_BS, np.float64)
    return StereoCamera(
        left=cam,
        right=cam,
        fx=cam.fx,
        fy=cam.fy,
        cx=cam.cx,
        cy=cam.cy,
        baseline=f(nominal_baseline),
        R_rect_l=jnp.eye(3),
        R_rect_r=jnp.eye(3),
        R_b_rect=f(T[:3, :3]),
        t_b_rect=f(T[:3, 3]),
    )


class MonoImuPipeline(StereoImuPipeline):
    """Mono+IMU VIO. Note: without stereo, scale is observable only through
    the IMU — accuracy depends on accelerometer excitation (same caveat as
    the reference's mono pipeline)."""

    def __init__(self, params: VioParams, output_path=None, parallel_run=None):
        # Build the degenerate rig BEFORE the parent constructor uses it.
        self._mono_params = params
        super().__init__(params, output_path=output_path, parallel_run=parallel_run)

    # Override the rig + frontend construction hooks.
    def _build_rig(self, params):
        return mono_rig(params.left_cam, params.frontend.nominal_baseline)

    def _build_frontend_cfg(self, params):
        cfg = FrontendConfig.from_params(
            params.frontend, max_features=params.max_features
        )
        return cfg.replace(mono=True)
