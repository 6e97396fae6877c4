"""EurocPlayground: ground-truth visualization sandbox.

Rebuild of the reference playground (include/kimera-vio/playground/
EurocPlayground.h:58): load a EuRoC sequence's ground truth + frames and
render the GT trajectory / depth structure through the visualizer — a dev
tool, not part of the pipeline.
"""

from __future__ import annotations

import numpy as np

from kimera_vio_tpu.dataprovider.euroc import EurocDataProvider
from kimera_vio_tpu.visualizer.visualizer import FileDisplay, Visualizer3D


def visualize_gt_data(dataset_path: str, output_path: str = "/tmp/playground",
                      every: int = 10):
    """Render the sequence's GT trajectory to PLY/PNG artifacts."""
    provider = EurocDataProvider(dataset_path)
    if provider.ground_truth is None:
        raise ValueError("dataset has no ground truth")
    viz = Visualizer3D()
    disp = FileDisplay(output_path, save_every=1)
    gt = provider.ground_truth
    from kimera_vio_tpu.common import geometry as geo
    import jax.numpy as jnp

    for k in range(0, len(gt.stamps_ns), every):
        R = np.asarray(geo.quat_to_rot(jnp.asarray(gt.quats_wxyz[k], jnp.float32)))
        w = viz.spin_once(R, gt.positions[k])
        disp.spin_once(w)
    return output_path
