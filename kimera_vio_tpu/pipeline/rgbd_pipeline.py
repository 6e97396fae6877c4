"""RgbdImuPipeline: RGB + depth + IMU wiring.

Rebuild of the reference RgbdImuPipeline (src/pipeline/RgbdImuPipeline.cpp):
the depth image is converted per-keypoint into a virtual-stereo disparity
with a nominal baseline (depth -> fake stereo calib,
RgbdImuPipeline.cpp:45,123-124 / RgbdCamera.cpp:92-104); the backend then
runs unchanged on (uL, uR, v) measurements. Mesher is disabled, as in the
reference (RgbdImuPipeline.cpp:157-175 commented out).

The data provider must yield packets whose "right_path" loads the DEPTH
image in meters (use `depth_factor` for mm-scaled uHumans/KinectAzure
datasets).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from kimera_vio_tpu.config.params import VioParams
from kimera_vio_tpu.frontend.vision_frontend import FrontendConfig
from kimera_vio_tpu.pipeline.mono_pipeline import mono_rig
from kimera_vio_tpu.pipeline.stereo_pipeline import StereoImuPipeline


class RgbdImuPipeline(StereoImuPipeline):
    def __init__(self, params: VioParams, output_path=None, parallel_run=None,
                 virtual_baseline: float | None = None):
        self._virtual_baseline = (
            virtual_baseline
            if virtual_baseline is not None
            else params.frontend.nominal_baseline
        )
        super().__init__(params, output_path=output_path, parallel_run=parallel_run)

    def _build_rig(self, params):
        # Identity-rectified rig with the virtual baseline: RGB-D depth is
        # already metric, so no rectification pass is applied to the depth.
        return mono_rig(params.left_cam, self._virtual_baseline)

    def _build_frontend_cfg(self, params):
        cfg = FrontendConfig.from_params(
            params.frontend, max_features=params.max_features
        )
        return cfg.replace(
            rgbd=True,
            depth_min=jnp.float32(params.frontend.min_point_dist),
            depth_max=jnp.float32(params.frontend.max_point_dist),
        )
