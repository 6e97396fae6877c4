"""Frontend debug imagery: per-keyframe feature-track overlays.

The reference logs/displays annotated tracking images
(StereoVisionImuFrontend.cpp:540,599 logFrontendImg -> "monoTrackingUnrect"
/ "monoMatching"; OpenCvDisplay.cpp:114 spin2dWindow) — this is the
headless equivalent, gated by --log_frontend_images: PNGs under
<output_path>/frontend_images with the reference's color classes
(green = tracked from the previous keyframe, blue = newly detected,
red = dead slot).
"""

from __future__ import annotations

import os

import numpy as np


def save_feature_track_overlay(
    img_gray: np.ndarray,
    uv: np.ndarray,  # (N,2) rectified pixel coords
    ids: np.ndarray,  # (N,) landmark ids, -1 = free slot
    mask: np.ndarray,  # (N,) slot currently valid
    prev_ids,  # iterable of ids valid at the previous keyframe (or None)
    path: str,
) -> None:
    import cv2

    img = np.clip(np.asarray(img_gray), 0, 255).astype(np.uint8)
    vis = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
    prev = set(int(i) for i in prev_ids) if prev_ids is not None else set()
    uv = np.asarray(uv)
    ids = np.asarray(ids)
    mask = np.asarray(mask)
    H, W = img.shape[:2]
    for n in range(len(ids)):
        u, v = float(uv[n, 0]), float(uv[n, 1])
        if not (0 <= u < W and 0 <= v < H):
            continue
        c = (int(round(u)), int(round(v)))
        if mask[n] and ids[n] >= 0:
            if int(ids[n]) in prev:
                cv2.circle(vis, c, 3, (0, 200, 0), 1)  # tracked: green
            else:
                cv2.circle(vis, c, 3, (255, 80, 0), 1)  # new: blue
        elif ids[n] >= 0:
            cv2.drawMarker(
                vis, c, (0, 0, 220), cv2.MARKER_TILTED_CROSS, 5, 1
            )  # rejected/dead: red
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, vis)
