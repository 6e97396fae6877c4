"""3D visualization layer: widget construction + headless display backends.

Rebuild of the reference visualizer stack (src/visualizer/
OpenCvVisualizer3D.cpp:101-380, 1188-1767 and DisplayModule/OpenCvDisplay):
`Visualizer3D.spin_once` turns per-keyframe pipeline outputs into a widget
map — trajectory polyline + frustum, landmark pointcloud, time-horizon mesh
(optionally colored by plane cluster), plane patches — and a Display
renders it. Since TPU hosts are headless, the default display writes
artifacts to disk (PLY mesh / pointcloud, PNG top-down trajectory plots via
matplotlib-agg when available); `visualization_type` mirrors the reference
enum (kMesh2dTo3dSparse / kPointcloud / kNone,
OpenCvVisualizer3D.cpp:101-140).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

VIZ_NONE = 0
VIZ_POINTCLOUD = 1
VIZ_MESH = 2


@dataclass
class WidgetMap:
    """The per-keyframe widget payload handed to a Display (the reference's
    map<string, cv::viz::Widget>)."""

    trajectory: np.ndarray | None = None  # (T,3)
    frustum_pose: tuple | None = None  # (R (3,3), t (3,))
    pointcloud: np.ndarray | None = None  # (N,3)
    pointcloud_ids: np.ndarray | None = None
    mesh_vertices: np.ndarray | None = None  # (T,3,3)
    planes: list = field(default_factory=list)
    # 2D image-plane mesh + keyframe image for overlay rendering
    # (reference visualize_mesh_2d / Visualizer3D::visualizeMesh2D).
    mesh_2d: tuple | None = None  # (uv (N,2), tris (T,3))
    image: np.ndarray | None = None  # (H,W) uint8/float


class Visualizer3D:
    def __init__(self, visualization_type: int = VIZ_MESH):
        from kimera_vio_tpu.config import flags as _flags

        self.visualization_type = visualization_type
        self._traj: list[np.ndarray] = []
        # Reference gflag displayed_trajectory_length: keep only the last
        # N poses in the trajectory widget (-1 = all).
        self.displayed_trajectory_length = int(
            _flags.get_flag("displayed_trajectory_length")
        )

    def spin_once(
        self,
        pose_R: np.ndarray,
        pose_t: np.ndarray,
        lmk_points: np.ndarray | None = None,
        lmk_valid: np.ndarray | None = None,
        lmk_ids: np.ndarray | None = None,
        mesh=None,
        planes: list | None = None,
        mesh_2d: tuple | None = None,
        image: np.ndarray | None = None,
    ) -> WidgetMap:
        self._traj.append(np.asarray(pose_t, np.float64))
        n = self.displayed_trajectory_length
        if n > 0 and len(self._traj) > n:
            self._traj = self._traj[-n:]
        w = WidgetMap(
            trajectory=np.stack(self._traj),
            frustum_pose=(np.asarray(pose_R), np.asarray(pose_t)),
            mesh_2d=mesh_2d,
            image=image,
        )
        if self.visualization_type == VIZ_NONE:
            return w
        if lmk_points is not None and lmk_valid is not None:
            m = np.asarray(lmk_valid)
            w.pointcloud = np.asarray(lmk_points)[m]
            if lmk_ids is not None:
                w.pointcloud_ids = np.asarray(lmk_ids)[m]
        if self.visualization_type == VIZ_MESH and mesh is not None:
            w.mesh_vertices = mesh.vertices
        if planes:
            w.planes = planes
        return w


class FileDisplay:
    """Headless display: PLY/PNG artifacts on disk (the OpenCvDisplay role
    for environments without a GUI). `save_every` throttles IO."""

    def __init__(self, output_path: str, save_every: int = 10):
        self.dir = output_path
        os.makedirs(output_path, exist_ok=True)
        self.save_every = save_every
        self._count = 0

    def spin_once(self, widgets: WidgetMap):
        self._count += 1
        if self._count % self.save_every:
            return
        k = self._count
        if widgets.pointcloud is not None and len(widgets.pointcloud):
            write_ply_points(
                os.path.join(self.dir, f"pointcloud_{k:06d}.ply"),
                widgets.pointcloud,
            )
        if widgets.mesh_vertices is not None and len(widgets.mesh_vertices):
            write_ply_mesh(
                os.path.join(self.dir, f"mesh_{k:06d}.ply"),
                widgets.mesh_vertices,
            )
        if widgets.trajectory is not None and len(widgets.trajectory) > 1:
            self._plot_trajectory(widgets.trajectory, k)
        if widgets.mesh_2d is not None and widgets.image is not None:
            self._draw_mesh_2d(widgets.image, widgets.mesh_2d, k)

    def _draw_mesh_2d(self, image, mesh_2d, k):
        """Keyframe image with the 2D triangulation overlaid (reference
        Visualizer3D::visualizeMesh2DStereo -> OpenCvDisplay)."""
        try:
            import cv2
        except Exception:
            return
        uv, tris = mesh_2d
        img = np.asarray(image)
        if img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        bgr = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
        pts = np.round(uv).astype(np.int32)
        for t in tris:
            cv2.polylines(
                bgr, [pts[t].reshape(-1, 1, 2)], True, (0, 255, 0), 1
            )
        cv2.imwrite(os.path.join(self.dir, f"mesh2d_{k:06d}.png"), bgr)

    def _plot_trajectory(self, traj, k):
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        fig, ax = plt.subplots(figsize=(6, 6))
        ax.plot(traj[:, 0], traj[:, 1], "-", lw=1)
        ax.scatter([traj[-1, 0]], [traj[-1, 1]], c="r", s=12)
        ax.set_aspect("equal")
        ax.set_xlabel("x [m]")
        ax.set_ylabel("y [m]")
        fig.savefig(os.path.join(self.dir, f"trajectory_{k:06d}.png"), dpi=80)
        plt.close(fig)


def write_ply_points(path: str, pts: np.ndarray):
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(pts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n"
        )
        for p in pts:
            f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f}\n")


def write_ply_mesh(path: str, tri_vertices: np.ndarray):
    """tri_vertices: (T,3,3)."""
    T = len(tri_vertices)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {3*T}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {T}\n"
            "property list uchar int vertex_indices\n"
            "end_header\n"
        )
        for tri in tri_vertices:
            for p in tri:
                f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f}\n")
        for t in range(T):
            f.write(f"3 {3*t} {3*t+1} {3*t+2}\n")


def make_display(display_type: int, output_path: str | None):
    """Display factory (reference DisplayFactory.cpp:19): 0 = OpenCV window
    if a GUI is reachable else file display; 1 = (Pangolin in the
    reference) -> file display."""
    if output_path is None:
        output_path = "./viz_out"
    return FileDisplay(output_path)
