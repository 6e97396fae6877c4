"""RGB-D dataset provider (uHumans2 / KinectAzure-class EuRoC-style trees).

Rebuild of the reference RgbdDataProviderModule
(/root/reference/src/dataprovider/RgbdDataProviderModule.cpp: RGB frame +
DepthFrame -> RgbdImuSyncPacket) for offline EuRoC-format RGB-D datasets
(the layout Kimera's uHumans2 / KinectAzure param trees target,
/root/reference/params/uHumans2 + params/KinectAzure/LeftCameraParams.yaml
depth block: virtual_baseline / depth_to_meters / min_depth / max_depth):

    mav0/
      cam0/data.csv   + cam0/data/<stamp>.png    (RGB or grayscale)
      depth0/data.csv + depth0/data/<stamp>.png  (16-bit depth PNG)
      imu0/data.csv
      state_groundtruth_estimate0/data.csv       (optional)

Duck-typed like EurocDataProvider; packets carry the depth image path as
"right_path" (the RgbdImuPipeline contract: depth decodes to METERS via
`depth_factor`, then per-keypoint depth -> virtual-stereo disparity,
frontend/vision_frontend.py:399-435).
"""

from __future__ import annotations

import os

import numpy as np

from kimera_vio_tpu.dataprovider.euroc import EurocDataProvider, _read_csv


class RgbdDataProvider(EurocDataProvider):
    def __init__(
        self,
        dataset_path: str,
        depth_factor: float = 1.0e-3,
        min_depth: float = 0.0,
        max_depth: float = 10.0,
        depth_dir: str = "depth0",
        **kw,
    ):
        """depth_factor: meters per raw depth unit (1e-3 for the usual
        mm-scaled 16-bit PNGs; the KinectAzure yaml's depth_to_meters)."""
        super().__init__(dataset_path, **kw)
        self.depth_factor = float(depth_factor)
        self.min_depth = float(min_depth)
        self.max_depth = float(max_depth)
        ddir = os.path.join(self.root, depth_dir)
        if not os.path.isdir(ddir):
            raise FileNotFoundError(f"no depth stream at {ddir}")
        rows = _read_csv(os.path.join(ddir, "data.csv"))
        self.depth_stamps = np.array([int(r[0]) for r in rows], np.int64)
        self.depth_files = [
            os.path.join(ddir, "data", r[1].strip()) for r in rows
        ]
        self._depth_prefix = os.path.join(ddir, "data")
        # The synthetic right camera does not exist; frames() pairs cam0
        # with the nearest depth frame instead.
        self.has_right = False

    # ------------------------------------------------------------------
    def load_image(self, path: str) -> np.ndarray:
        import cv2

        if path.startswith(self._depth_prefix):
            raw = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            if raw is None:
                raise FileNotFoundError(path)
            if raw.ndim == 3:
                raw = raw[..., 0]
            depth = raw.astype(np.float32) * self.depth_factor
            # Range gating (DepthFrame min/max depth): out-of-range depth
            # is invalid -> 0 (the virtual-disparity path masks z<=0).
            bad = (depth < self.min_depth) | (depth > self.max_depth)
            depth[bad] = 0.0
            return depth
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(path)
        if self.equalize:
            img = cv2.equalizeHist(img)
        return img

    def frames(self):
        """EuRoC frame packets with the nearest-stamp depth image attached
        as "right_path" (reference RgbdDataProviderModule pairs RGB+depth
        by timestamp the same way)."""
        for packet in super().frames():
            j = int(
                np.argmin(np.abs(self.depth_stamps - packet["stamp_ns"]))
            )
            packet["right_path"] = self.depth_files[j]
            yield packet
