"""Per-keyframe 3D mesher + plane segmentation.

TPU-native rebuild of the reference Mesher (src/mesh/Mesher.cpp) and Mesh
containers (mesh/Mesh.h:34-381):

  * 2D Delaunay triangulation of the keyframe keypoints whose landmarks the
    backend triangulated (reference uses vendored Triangle /
    cv::Subdiv2D, Mesher.cpp:242, 1671-1744) -> host scipy.spatial.Delaunay
    (tiny input, ~300 points; dataset IO and this are the only host steps),
  * 3D lift from backend landmark positions + bad-triangle filtering
    (elongated / oversized / grazing, filterOutBadTriangles,
    Mesher.cpp:375) -> batched JAX predicate over all triangles,
  * time-horizon mesh keyed by landmark ids
    (updatePolygonMeshToTimeHorizon, Mesher.cpp:592),
  * plane segmentation for RegularVIO: per-triangle normals
    (calculateNormals :657), gravity-axis clustering (:736,768),
    z-histogram for horizontal planes (segmentHorizontalPlanes :1198) and
    a theta/distance histogram for walls (segmentWalls :1132) — histograms
    are jnp.histogram-style scatter-adds.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class Mesh3D:
    """Triangle mesh over landmarks: SoA, host-side container with device
    compute (the reference's Mesh<Vertex3D> keyed by landmark id)."""

    lmk_ids: np.ndarray  # (T, 3) int landmark ids per triangle corner
    vertices: np.ndarray  # (T, 3, 3) float32 positions

    @property
    def n_triangles(self):
        return len(self.lmk_ids)


def delaunay_2d(uv: np.ndarray) -> np.ndarray:
    """Host 2D Delaunay: (N,2) -> (T,3) vertex indices."""
    from scipy.spatial import Delaunay

    if len(uv) < 3:
        return np.zeros((0, 3), np.int32)
    try:
        tri = Delaunay(uv)
    except Exception:
        return np.zeros((0, 3), np.int32)
    return tri.simplices.astype(np.int32)


def filter_triangles(
    verts: jax.Array,  # (T,3,3) triangle vertex positions
    *,
    max_ratio: float = 0.5,  # min/max side ratio gate (elongation)
    min_ratio_btw_largest_smallest_side: float = 0.5,
    min_elongation_ratio: float = 0.5,
    max_triangle_side: float = 0.5,
) -> jax.Array:
    """Batched bad-triangle predicate (reference filterOutBadTriangles,
    Mesher.cpp:375 with gflags defaults: ratio 0.5, max side 0.5 m).
    Returns keep-mask (T,)."""
    a, b, c = verts[:, 0], verts[:, 1], verts[:, 2]
    e1 = jnp.linalg.norm(b - a, axis=-1)
    e2 = jnp.linalg.norm(c - b, axis=-1)
    e3 = jnp.linalg.norm(a - c, axis=-1)
    sides = jnp.stack([e1, e2, e3], -1)
    smin = sides.min(-1)
    smax = sides.max(-1)
    ratio = smin / jnp.maximum(smax, 1e-9)
    # Elongation gate: needles have near-equal side ratios but ~zero area;
    # height = 2*area / longest side must not collapse vs the longest side.
    area = 0.5 * jnp.linalg.norm(jnp.cross(b - a, c - a), axis=-1)
    height_ratio = (2.0 * area / jnp.maximum(smax, 1e-9)) / jnp.maximum(
        smax, 1e-9
    )
    keep = (
        (ratio >= min_ratio_btw_largest_smallest_side)
        & (smax <= max_triangle_side)
        & (height_ratio >= 0.1 * min_elongation_ratio)
    )
    return keep


def triangle_normals(verts: jax.Array) -> jax.Array:
    """(T,3,3) -> unit normals (T,3) (reference calculateNormals,
    Mesher.cpp:657)."""
    n = jnp.cross(verts[:, 1] - verts[:, 0], verts[:, 2] - verts[:, 0])
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


def cluster_by_direction(
    normals: jax.Array,
    axis: jax.Array,
    tolerance: float = 0.011,
) -> jax.Array:
    """Cluster triangle normals parallel to `axis` (gravity) — reference
    clusterNormalsAroundAxis (Mesher.cpp:736): |1 - |n.axis|| < tol."""
    d = jnp.abs(jnp.einsum("ti,i->t", normals, axis))
    return jnp.abs(1.0 - d) < tolerance


def segment_horizontal_planes(
    verts: jax.Array,  # (T,3,3)
    keep: jax.Array,  # (T,)
    normals: jax.Array,
    gravity_axis: jax.Array,
    *,
    z_min: float = -4.0,
    z_max: float = 4.0,
    n_bins: int = 512,
    min_support: int = 20,
    normal_tol: float = 0.011,
    max_planes: int = 4,
):
    """Z-histogram peak-picking for horizontal planes (reference
    segmentHorizontalPlanes, Mesher.cpp:1198). Returns
    (plane_normals (P,3), plane_ds (P,), plane_valid (P,), tri_assignment
    (T,) int32 plane index or -1)."""
    horiz = cluster_by_direction(normals, gravity_axis, normal_tol) & keep
    z_centroid = verts.mean(axis=1) @ gravity_axis  # signed height
    # Histogram of triangle heights (weighted by validity).
    bins = jnp.linspace(z_min, z_max, n_bins + 1)
    idx = jnp.clip(
        ((z_centroid - z_min) / (z_max - z_min) * n_bins).astype(jnp.int32),
        0,
        n_bins - 1,
    )
    hist = jnp.zeros(n_bins, jnp.int32).at[idx].add(horiz.astype(jnp.int32))
    # Local-max peaks with support threshold; take top max_planes.
    left = jnp.roll(hist, 1).at[0].set(0)
    right = jnp.roll(hist, -1).at[-1].set(0)
    is_peak = (hist >= left) & (hist >= right) & (hist >= min_support)
    peak_score = jnp.where(is_peak, hist, 0)
    top_vals, top_idx = jax.lax.top_k(peak_score, max_planes)
    plane_valid = top_vals > 0
    plane_z = z_min + (top_idx + 0.5) * (z_max - z_min) / n_bins
    plane_normals = jnp.broadcast_to(gravity_axis, (max_planes, 3))
    # Assign triangles to nearest valid plane within one bin width.
    bin_w = (z_max - z_min) / n_bins
    dz = jnp.abs(z_centroid[:, None] - plane_z[None, :])
    close = (dz < 2 * bin_w) & plane_valid[None, :] & horiz[:, None]
    assign = jnp.where(close.any(-1), jnp.argmax(close, -1), -1)
    return plane_normals, plane_z, plane_valid, assign


def segment_walls(
    verts: jax.Array,
    keep: jax.Array,
    normals: jax.Array,
    gravity_axis: jax.Array,
    *,
    n_theta: int = 40,
    n_dist: int = 80,
    dist_max: float = 6.0,
    min_support: int = 20,
    max_planes: int = 4,
):
    """Theta/distance 2D histogram for vertical planes (reference
    segmentWalls, Mesher.cpp:1132). Returns (normals (P,3), ds (P,),
    valid (P,), assignment (T,))."""
    # Vertical = normal orthogonal to gravity.
    vert = (jnp.abs(jnp.einsum("ti,i->t", normals, gravity_axis)) < 0.1) & keep
    # Azimuth of the projected normal.
    g = gravity_axis
    e1 = jnp.array([1.0, 0.0, 0.0])
    e1 = e1 - (e1 @ g) * g
    e1 = e1 / jnp.maximum(jnp.linalg.norm(e1), 1e-9)
    e2 = jnp.cross(g, e1)
    nx = normals @ e1
    ny = normals @ e2
    theta = jnp.arctan2(ny, nx)  # [-pi, pi]
    # Fold antipodal normals (a wall's normal sign is arbitrary).
    theta = jnp.where(theta < 0, theta + jnp.pi, theta)  # [0, pi)
    centroid = verts.mean(axis=1)
    d = centroid @ e1 * jnp.cos(theta) + centroid @ e2 * jnp.sin(theta)
    ti = jnp.clip((theta / jnp.pi * n_theta).astype(jnp.int32), 0, n_theta - 1)
    di = jnp.clip(
        ((d + dist_max) / (2 * dist_max) * n_dist).astype(jnp.int32),
        0,
        n_dist - 1,
    )
    flat = ti * n_dist + di
    hist = jnp.zeros(n_theta * n_dist, jnp.int32).at[flat].add(
        vert.astype(jnp.int32)
    )
    top_vals, top_idx = jax.lax.top_k(
        jnp.where(hist >= min_support, hist, 0), max_planes
    )
    plane_valid = top_vals > 0
    p_ti = top_idx // n_dist
    p_di = top_idx % n_dist
    p_theta = (p_ti + 0.5) / n_theta * jnp.pi
    p_d = (p_di + 0.5) / n_dist * 2 * dist_max - dist_max
    p_normals = (
        jnp.cos(p_theta)[:, None] * e1[None] + jnp.sin(p_theta)[:, None] * e2[None]
    )
    same_cell = (flat[:, None] == top_idx[None, :]) & plane_valid[None, :] & vert[:, None]
    assign = jnp.where(same_cell.any(-1), jnp.argmax(same_cell, -1), -1)
    return p_normals, p_d, plane_valid, assign


class Mesher:
    """Host orchestrator: keyframe keypoints + backend landmark map ->
    filtered 3D mesh + time-horizon maintenance + plane hypotheses
    (Mesher::spinOnce + updateMesh3D, Mesher.cpp:219-240, 1446-1531)."""

    def __init__(
        self,
        max_triangle_side: float | None = None,
        min_side_ratio: float | None = None,
        gravity_axis=np.array([0.0, 0.0, 1.0], np.float32),
    ):
        # Defaults come from the gflags tier (config/flags.py), mirroring
        # the reference's Mesher.cpp gflags; explicit args win.
        from kimera_vio_tpu.config import flags as _flags

        self.max_triangle_side = (
            _flags.get_flag("max_triangle_side")
            if max_triangle_side is None
            else max_triangle_side
        )
        self.min_side_ratio = (
            _flags.get_flag("min_ratio_btw_largest_smallest_side")
            if min_side_ratio is None
            else min_side_ratio
        )
        self.min_elongation_ratio = _flags.get_flag("min_elongation_ratio")
        self.reduce_to_horizon = _flags.get_flag("reduce_mesh_to_time_horizon")
        self._seg_flags = {
            "z_bins": _flags.get_flag("z_histogram_bins"),
            "z_min_support": _flags.get_flag("z_histogram_min_support"),
            "z_min": _flags.get_flag("z_histogram_min_range"),
            "z_max": _flags.get_flag("z_histogram_max_range"),
            "theta_bins": _flags.get_flag("hist_2d_theta_bins"),
            "dist_bins": _flags.get_flag("hist_2d_distance_bins"),
            "wall_min_support": _flags.get_flag("hist_2d_min_support"),
        }
        self.gravity_axis = jnp.asarray(gravity_axis)
        # time-horizon mesh: lmk-id-keyed triangles
        self._horizon: dict[tuple, np.ndarray] = {}
        # Last keyframe's image-plane triangulation (reference gflag
        # return_mesh_2d / viz_type MESH2D): (uv (N,2), tri indices (T,3)
        # into uv, post-filter).
        self.mesh_2d: tuple[np.ndarray, np.ndarray] | None = None

    def spin_once(
        self,
        kp_uv: np.ndarray,  # (N,2) keyframe keypoint pixels
        kp_ids: np.ndarray,  # (N,) landmark ids
        lmk_ids: np.ndarray,  # (L,) backend landmark ids
        lmk_pts: np.ndarray,  # (L,3) positions (world)
        lmk_valid: np.ndarray,  # (L,)
        horizon_ids: set | None = None,
    ) -> Mesh3D:
        """One keyframe: Delaunay -> lift -> filter -> horizon update."""
        self._evict(horizon_ids)
        # Keep keypoints whose landmark the backend triangulated.
        id_to_pt = {
            int(i): lmk_pts[r]
            for r, i in enumerate(lmk_ids)
            if lmk_valid[r] and i >= 0
        }
        sel = [k for k in range(len(kp_ids)) if int(kp_ids[k]) in id_to_pt]
        if len(sel) < 3:
            return self.horizon_mesh(horizon_ids)
        uv = kp_uv[sel]
        ids = kp_ids[sel]
        tris = delaunay_2d(uv)
        if len(tris) == 0:
            return self.horizon_mesh(horizon_ids)
        tri_ids = ids[tris]  # (T,3)
        verts = np.stack(
            [
                np.stack([id_to_pt[int(i)] for i in corner_ids])
                for corner_ids in tri_ids
            ]
        ).astype(np.float32)
        keep = np.asarray(
            filter_triangles(
                jnp.asarray(verts),
                min_ratio_btw_largest_smallest_side=self.min_side_ratio,
                min_elongation_ratio=self.min_elongation_ratio,
                max_triangle_side=self.max_triangle_side,
            )
        )
        tri_ids, verts = tri_ids[keep], verts[keep]
        # Image-plane 2D mesh of this keyframe (reference return_mesh_2d /
        # viz_type MESH2D: pixel-position triangulation for display /
        # semantic segmentation consumers).
        self.mesh_2d = (uv, tris[keep])
        # Time-horizon: triangles keyed by sorted landmark-id triple; new
        # keyframes update positions, old triangles persist while their
        # landmarks stay in the horizon.
        for t in range(len(tri_ids)):
            key = tuple(sorted(int(x) for x in tri_ids[t]))
            self._horizon[key] = verts[t]
        self._evict(horizon_ids)
        return self.horizon_mesh(horizon_ids)

    def _evict(self, horizon_ids):
        """Drop triangles whose landmarks left the time horizon
        (updatePolygonMeshToTimeHorizon, Mesher.cpp:592; gated by the
        reduce_mesh_to_time_horizon gflag like the reference)."""
        if horizon_ids is None or not self.reduce_to_horizon:
            return
        dead = [
            k for k in self._horizon if not all(i in horizon_ids for i in k)
        ]
        for k in dead:
            del self._horizon[k]

    def horizon_mesh(self, horizon_ids=None) -> Mesh3D:
        if not self._horizon:
            return Mesh3D(np.zeros((0, 3), np.int64), np.zeros((0, 3, 3), np.float32))
        keys = list(self._horizon.keys())
        return Mesh3D(
            lmk_ids=np.array(keys, np.int64),
            vertices=np.stack([self._horizon[k] for k in keys]),
        )

    def segment_planes(self, mesh: Mesh3D):
        """Plane hypotheses for the RegularVIO backend."""
        if mesh.n_triangles == 0:
            return []
        verts = jnp.asarray(mesh.vertices)
        normals = triangle_normals(verts)
        keep = jnp.ones(mesh.n_triangles, bool)
        hn, hd, hv, _ = segment_horizontal_planes(
            verts, keep, normals, self.gravity_axis,
            z_min=self._seg_flags["z_min"],
            z_max=self._seg_flags["z_max"],
            n_bins=self._seg_flags["z_bins"],
            min_support=self._seg_flags["z_min_support"],
        )
        wn, wd, wv, _ = segment_walls(
            verts, keep, normals, self.gravity_axis,
            n_theta=self._seg_flags["theta_bins"],
            n_dist=self._seg_flags["dist_bins"],
            min_support=self._seg_flags["wall_min_support"],
        )
        planes = []
        for i in range(len(np.asarray(hv))):
            if np.asarray(hv)[i]:
                planes.append(
                    {"normal": np.asarray(hn)[i], "d": float(np.asarray(hd)[i]), "type": "horizontal"}
                )
        for i in range(len(np.asarray(wv))):
            if np.asarray(wv)[i]:
                planes.append(
                    {"normal": np.asarray(wn)[i], "d": float(np.asarray(wd)[i]), "type": "wall"}
                )
        return planes
