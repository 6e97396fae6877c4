"""Mesher tests: Delaunay lift, bad-triangle filtering, horizon
maintenance, plane segmentation on synthetic geometry."""

import jax.numpy as jnp
import numpy as np

from kimera_vio_tpu.mesher import mesher as M


def grid_scene(nx=8, ny=6, z=2.0, spacing=0.3):
    """A horizontal plane of landmarks at height z + projected pixels."""
    xs, ys = np.meshgrid(np.arange(nx) * spacing, np.arange(ny) * spacing)
    pts = np.stack([xs.ravel(), ys.ravel(), np.full(nx * ny, z)], -1).astype(
        np.float32
    )
    ids = np.arange(nx * ny, dtype=np.int32)
    uv = (pts[:, :2] * 100).astype(np.float32)  # fake image coords
    return uv, ids, pts


def test_mesh_construction_and_filtering():
    uv, ids, pts = grid_scene()
    mesher = M.Mesher(max_triangle_side=1.0)
    mesh = mesher.spin_once(uv, ids, ids, pts, np.ones(len(ids), bool))
    assert mesh.n_triangles > 30
    # All triangles lie on the z=2 plane.
    np.testing.assert_allclose(mesh.vertices[..., 2], 2.0, atol=1e-5)


def test_bad_triangle_filter():
    # One equilateral-ish triangle, one needle, one oversized.
    verts = jnp.asarray(
        np.array(
            [
                [[0, 0, 0], [0.3, 0, 0], [0.15, 0.26, 0]],  # good
                [[0, 0, 0], [0.5, 0, 0], [0.25, 0.001, 0]],  # needle
                [[0, 0, 0], [2.0, 0, 0], [1.0, 1.7, 0]],  # too big
            ],
            np.float32,
        )
    )
    keep = np.asarray(M.filter_triangles(verts, max_triangle_side=0.5))
    assert keep.tolist() == [True, False, False]


def test_horizon_eviction():
    uv, ids, pts = grid_scene()
    mesher = M.Mesher(max_triangle_side=1.0)
    mesher.spin_once(uv, ids, ids, pts, np.ones(len(ids), bool))
    n1 = mesher.horizon_mesh().n_triangles
    # Evict all but the first 10 landmark ids.
    mesh2 = mesher.spin_once(
        uv[:3], ids[:3], ids, pts, np.ones(len(ids), bool),
        horizon_ids=set(range(10)),
    )
    assert mesh2.n_triangles < n1


def test_plane_segmentation_horizontal():
    uv, ids, pts = grid_scene(z=1.5)
    mesher = M.Mesher(max_triangle_side=1.0)
    mesh = mesher.spin_once(uv, ids, ids, pts, np.ones(len(ids), bool))
    planes = mesher.segment_planes(mesh)
    horiz = [p for p in planes if p["type"] == "horizontal"]
    assert len(horiz) >= 1
    assert abs(horiz[0]["d"] - 1.5) < 0.1
    np.testing.assert_allclose(np.abs(horiz[0]["normal"]), [0, 0, 1], atol=1e-5)


def test_plane_segmentation_wall():
    # Vertical wall: landmarks on the x=1.0 plane.
    ys, zs = np.meshgrid(np.arange(8) * 0.3, np.arange(6) * 0.3)
    pts = np.stack([np.full(48, 1.0), ys.ravel(), zs.ravel()], -1).astype(np.float32)
    ids = np.arange(48, dtype=np.int32)
    uv = np.stack([pts[:, 1], pts[:, 2]], -1) * 100
    mesher = M.Mesher(max_triangle_side=1.0)
    mesh = mesher.spin_once(uv.astype(np.float32), ids, ids, pts, np.ones(48, bool))
    planes = mesher.segment_planes(mesh)
    walls = [p for p in planes if p["type"] == "wall"]
    assert len(walls) >= 1
    n = walls[0]["normal"]
    assert abs(abs(n[0]) - 1.0) < 0.15, n  # normal ~ +-x
    assert abs(abs(walls[0]["d"]) - 1.0) < 0.15


class TestMeshOptimization:
    """Depth-based mesh refinement (reference MeshOptimization.cpp):
    perturbed vertex depths must move back onto the observed surface."""

    def _scene(self, seed=0):
        rng = np.random.default_rng(seed)
        H, W = 120, 160
        fx = fy = 100.0
        cx, cy = W / 2, H / 2
        # GT surface: slanted plane z = 2 + 0.004x + 0.002y (camera frame).
        ys, xs = np.mgrid[0:H, 0:W]
        x_n = (xs - cx) / fx
        y_n = (ys - cy) / fy
        # z(1 - slope terms) = 2 -> closed form for ray-plane intersection
        denom = 1.0 - 0.4 * x_n - 0.2 * y_n
        depth = 2.0 / np.maximum(denom, 0.3)
        # Mesh: grid of vertices on the same plane, depths perturbed.
        gu = np.linspace(20, W - 20, 6)
        gv = np.linspace(15, H - 15, 5)
        uu, vv = np.meshgrid(gu, gv)
        uv = np.stack([uu.ravel(), vv.ravel()], -1)
        x_nv = (uv[:, 0] - cx) / fx
        y_nv = (uv[:, 1] - cy) / fy
        z_gt = 2.0 / np.maximum(1.0 - 0.4 * x_nv - 0.2 * y_nv, 0.3)
        z_pert = z_gt * (1.0 + rng.uniform(-0.15, 0.15, z_gt.shape))
        verts = np.stack([x_nv * z_pert, y_nv * z_pert, z_pert], -1)
        from scipy.spatial import Delaunay

        tris = Delaunay(uv).simplices.astype(np.int32)
        return (
            jnp.asarray(verts, jnp.float32),
            jnp.asarray(tris),
            jnp.asarray(depth, jnp.float32),
            z_gt,
            fx, fy, cx, cy,
        )

    def test_refinement_reduces_depth_error(self):
        from kimera_vio_tpu.mesher.mesh_optimization import (
            optimize_mesh_depths,
        )

        verts, tris, depth, z_gt, fx, fy, cx, cy = self._scene()
        tri_mask = jnp.ones(tris.shape[0], bool)
        refined, n_obs = optimize_mesh_depths(
            verts, tris, tri_mask, depth, fx, fy, cx, cy
        )
        err_before = np.abs(np.asarray(verts)[:, 2] - z_gt)
        err_after = np.abs(np.asarray(refined)[:, 2] - z_gt)
        assert err_after.mean() < 0.25 * err_before.mean(), (
            err_before.mean(), err_after.mean(),
        )
        assert int(np.asarray(n_obs).min()) > 0

    def test_optimizer_variants(self):
        """MeshOptimizerType parity (reference MeshOptimization-definitions
        .h:25-29): disconnected roughly matches connected on clean data;
        the robust iterative mode (kGtsamMesh role) beats the closed form
        under depth-image outlier contamination."""
        from kimera_vio_tpu.mesher.mesh_optimization import (
            K_DISCONNECTED_MESH,
            K_GTSAM_MESH,
            optimize_mesh,
            optimize_mesh_depths,
        )

        verts, tris, depth, z_gt, fx, fy, cx, cy = self._scene()
        tri_mask = jnp.ones(tris.shape[0], bool)

        # Clean data: disconnected ~ connected.
        ref, _ = optimize_mesh_depths(
            verts, tris, tri_mask, depth, fx, fy, cx, cy
        )
        dis, _ = optimize_mesh(
            verts, tris, tri_mask, depth, fx, fy, cx, cy,
            optimizer_type=K_DISCONNECTED_MESH,
        )
        err_ref = np.abs(np.asarray(ref)[:, 2] - z_gt).mean()
        err_dis = np.abs(np.asarray(dis)[:, 2] - z_gt).mean()
        assert err_dis < 3.0 * err_ref + 0.02, (err_dis, err_ref)

        # Outlier-contaminated depth: 10% of pixels blown up.
        rng = np.random.default_rng(3)
        d = np.asarray(depth).copy()
        mask = rng.random(d.shape) < 0.10
        d[mask] = 25.0
        d_bad = jnp.asarray(d)
        cf, _ = optimize_mesh_depths(
            verts, tris, tri_mask, d_bad, fx, fy, cx, cy
        )
        rob, _ = optimize_mesh(
            verts, tris, tri_mask, d_bad, fx, fy, cx, cy,
            optimizer_type=K_GTSAM_MESH,
        )
        err_cf = np.abs(np.asarray(cf)[:, 2] - z_gt).mean()
        err_rob = np.abs(np.asarray(rob)[:, 2] - z_gt).mean()
        assert err_rob < 0.6 * err_cf, (err_rob, err_cf)

    def test_unobserved_vertices_keep_prior(self):
        from kimera_vio_tpu.mesher.mesh_optimization import (
            optimize_mesh_depths,
        )

        verts, tris, depth, z_gt, fx, fy, cx, cy = self._scene()
        # Invalidate ALL depth: nothing observed -> prior keeps depths.
        bad = jnp.full_like(depth, jnp.nan)
        refined, n_obs = optimize_mesh_depths(
            verts, tris, jnp.ones(tris.shape[0], bool), bad, fx, fy, cx, cy
        )
        np.testing.assert_allclose(
            np.asarray(refined), np.asarray(verts), atol=1e-3
        )
        assert int(np.asarray(n_obs).max()) == 0


def test_mesher_gflags_wiring(tmp_path):
    """The Mesher.cpp gflags tier is live: filter/eviction/histogram knobs
    flow from config.flags into Mesher behavior, and the 2D image-plane
    mesh (return_mesh_2d role) is kept per keyframe."""
    from kimera_vio_tpu.config import flags

    uv, ids, pts = grid_scene()
    try:
        # Without horizon reduction, triangles never evict.
        flags.set_flag("reduce_mesh_to_time_horizon", False)
        m1 = M.Mesher(max_triangle_side=1.0)
        m1.spin_once(uv, ids, ids, pts, np.ones(len(ids), bool))
        n1 = m1.horizon_mesh().n_triangles
        m1.spin_once(
            uv[:3], ids[:3], ids, pts, np.ones(len(ids), bool),
            horizon_ids=set(range(3)),
        )
        assert m1.horizon_mesh().n_triangles >= n1
        # 2D mesh kept: pixel triangulation indices into kept uv.
        assert m1.mesh_2d is not None
        uv2d, tris2d = m1.mesh_2d
        assert tris2d.ndim == 2 and tris2d.shape[1] == 3
        assert tris2d.max() < len(uv2d)
        # Triangle-side flag flows into the filter: an absurdly small
        # max side kills every triangle of the fresh mesh.
        flags.set_flag("max_triangle_side", 1e-6)
        m2 = M.Mesher()
        mesh = m2.spin_once(uv, ids, ids, pts, np.ones(len(ids), bool))
        assert mesh.n_triangles == 0
    finally:
        flags.set_flag("reduce_mesh_to_time_horizon", None)
        flags.set_flag("max_triangle_side", None)


def test_mesh2d_display_artifact(tmp_path):
    """visualize_mesh_2d: FileDisplay writes the keyframe image with the
    2D triangulation overlaid (reference visualizeMesh2DStereo)."""
    import os

    from kimera_vio_tpu.visualizer.visualizer import FileDisplay, WidgetMap

    img = np.full((60, 80), 90, np.uint8)
    uv = np.array([[5, 5], [70, 8], [40, 50]], np.float32)
    tris = np.array([[0, 1, 2]])
    disp = FileDisplay(str(tmp_path), save_every=1)
    disp.spin_once(WidgetMap(mesh_2d=(uv, tris), image=img))
    files = [f for f in os.listdir(tmp_path) if f.startswith("mesh2d_")]
    assert len(files) == 1
