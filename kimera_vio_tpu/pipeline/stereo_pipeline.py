"""StereoImuPipeline: full wiring of dataprovider -> frontend -> backend.

TPU-native rebuild of the reference StereoImuPipeline
(src/pipeline/StereoImuPipeline.cpp:39-254) and the Pipeline spin logic
(src/pipeline/Pipeline.cpp): the module/queue/thread machinery becomes a
host driver loop invoking two jitted device programs (frontend per frame,
backend per keyframe), per SURVEY.md §2.2's TPU mapping.

Modes:
  * sequential (parallel_run=False): frame -> frontend -> (keyframe?) ->
    backend, one at a time — deterministic, the testing anchor
    (reference Pipeline.cpp:197-215);
  * parallel (parallel_run=True): the frontend for frame k+1 is dispatched
    before the backend result of keyframe k is awaited — JAX async dispatch
    gives the same overlap the reference gets from its frontend/backend
    threads (Pipeline.cpp:329-358) without host threads.

Bias feedback: the backend's optimized IMU bias is pushed back into the
frontend state after every keyframe, like the reference's
imu_bias_update_callback (StereoImuPipeline.cpp:141-145).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from kimera_vio_tpu.backend import smoother as sm
from kimera_vio_tpu.common import geometry as geo
from kimera_vio_tpu.common.types import ImuBias, NavState
from kimera_vio_tpu.config.params import VioParams
from kimera_vio_tpu.dataprovider.euroc import EurocDataProvider
from kimera_vio_tpu.frontend import imu_frontend as imu
from kimera_vio_tpu.frontend.camera import StereoCamera
from kimera_vio_tpu.frontend.vision_frontend import (
    FrontendConfig,
    StereoFrontend,
)
from kimera_vio_tpu.ops.frame_codec import (
    decode_delta3,
    decode_delta4,
    decode_delta4c,
    encode_delta3,
    encode_delta4,
    encode_delta4c,
    encode_delta4c_planes,
    wire_bytes,
)
from kimera_vio_tpu.utils.logger import BackendLogger, FrontendLogger
from kimera_vio_tpu.utils.stats import StatsCollector


@dataclass
class PipelineOutput:
    stamps_ns: list = field(default_factory=list)
    positions: list = field(default_factory=list)
    quats_wxyz: list = field(default_factory=list)
    velocities: list = field(default_factory=list)
    biases: list = field(default_factory=list)
    n_keyframes: int = 0
    n_frames: int = 0


class StereoImuPipeline:
    """End-to-end stereo-inertial VIO on one TPU chip."""

    def __init__(
        self,
        params: VioParams,
        output_path: str | None = None,
        parallel_run: bool | None = None,
        enable_mesher: bool = False,
        enable_lcd: bool = False,
        enable_visualizer: bool = False,
    ):
        # Flag tier (reference gflags): --use_lcd / --visualize / --log_output
        # gate the optional modules exactly like the reference binary
        # (examples/KimeraVIO.cpp + docs/gflags_parameters.md).
        from kimera_vio_tpu.config import flags

        self.enable_mesher = enable_mesher
        self.enable_lcd = enable_lcd or flags.get_flag("use_lcd")
        self.enable_visualizer = enable_visualizer or flags.get_flag("visualize")
        if output_path is None and flags.get_flag("log_output"):
            output_path = flags.get_flag("output_path")
        self.params = params
        self.stereo = self._build_rig(params)
        self.frontend_cfg = self._build_frontend_cfg(params)
        # Fine IMU-camera temporal sync (reference InitialTimeAlignment
        # frontend state, gated by --do_fine_imu_camera_temporal_sync):
        # needs VISION-estimated rotation, so force the 3-pt Arun solver.
        self._do_time_align = bool(
            flags.get_flag("do_fine_imu_camera_temporal_sync")
        )
        # backend_type: 1 selects RegularVIO (the EuRoC default,
        # PipelineParams.yaml): the mesher's plane hypotheses feed
        # regularity factors; needs the mesher running.
        self.use_regular_vio = params.pipeline.backend_type == 1
        if self.use_regular_vio and not enable_mesher:
            # Without plane hypotheses RegularVIO degenerates to the plain
            # backend — exactly the reference's shipped default (mesher
            # plane hypotheses disabled, RegularVioBackend.h:83-87).
            self.use_regular_vio = False
        if self._do_time_align:
            self.frontend_cfg = self.frontend_cfg.replace(
                use_1point_stereo=False
            )
        if self.enable_lcd:
            # Fuse the LCD feature front half into the keyframe branch
            # (detect + descriptors + sparse stereo on the already-on-device
            # rectified images); the host LcdModule consumes the fields from
            # the frame outputs. Budget and spacing come from LcdParams
            # (nfeatures / min_distance) so the fused path matches
            # LcdModule's capacity — the reference drives its LCD ORB
            # params from the same YAML (LoopClosureDetectorParams).
            _lcd_p = getattr(params, "lcd", None)
            self.frontend_cfg = self.frontend_cfg.replace(
                lcd_features=int(getattr(_lcd_p, "nfeatures", 256) or 256),
                lcd_min_distance=float(
                    getattr(_lcd_p, "min_distance", 12.0) or 12.0
                ),
            )
        self.pim_params = imu.PimParams.from_params(params.imu)
        self.frontend = StereoFrontend(
            self.frontend_cfg, self.stereo, self.pim_params
        )
        self.backend_cfg = sm.BackendConfig.from_params(
            params.backend, params.imu, self.stereo,
            max_landmarks=params.max_landmarks,
        )
        if params.odometry is not None:
            # External-odometry noise from ExternalOdometryParams.yaml
            # (odomRotation/PositionPrecision -> between-factor sigmas).
            self.backend_cfg = self.backend_cfg.replace(
                ext_odom_rot_sigma=jnp.float32(
                    1.0 / np.sqrt(max(params.odometry.rotation_precision, 1e-12))
                ),
                ext_odom_pos_sigma=jnp.float32(
                    1.0 / np.sqrt(max(params.odometry.position_precision, 1e-12))
                ),
            )
        self.parallel_run = (
            params.pipeline.parallel_run if parallel_run is None else parallel_run
        )
        self._backend_step = jax.jit(
            lambda w, l, pim, stamp, ids, uvs, mask, status: sm.backend_step(
                self.backend_cfg, w, l, pim=pim, stamp=stamp, meas_ids=ids,
                meas_uvd=uvs, meas_mask=mask, status=status,
            )
        )
        self._fused_step = jax.jit(self._fused_step_impl)
        # f32 time-origin rebase (the "rebase on the host for long
        # missions" contract of backend/smoother.py's stamp
        # representation): in-graph stamps are f32 seconds relative to a
        # host-owned t0; once the mission time passes margin+interval,
        # t0 advances by whole multiples of the interval and the window /
        # frontend stamps are shifted in-graph. The margin exceeds the
        # maximum window time-span (nr_states * max_intra_keyframe_time),
        # so shifted stamps stay positive and the f32 subtraction is exact
        # (Sterbenz); in-graph stamps are thus bounded by
        # margin + interval + one keyframe period forever, keeping stamp
        # resolution ~3e-5 s regardless of mission length.
        span = float(params.backend.nr_states) * float(
            getattr(params.frontend, "max_intra_keyframe_time_s", 5.0)
        )
        self._rebase_margin_s = max(128.0, span + 8.0)
        self._rebase_interval_s = float(
            max(256.0, 2.0 ** np.ceil(np.log2(2.0 * self._rebase_margin_s)))
        )
        self._n_rebases = 0
        self.output_path = output_path
        self.logger = BackendLogger(output_path) if output_path else None
        self.frontend_logger = FrontendLogger(output_path) if output_path else None
        self.stats = StatsCollector()
        # Module-failure propagation state (reference is_backend_ok_).
        self.backend_healthy = True
        self._consecutive_recoveries = 0

    # Overridable construction hooks (MonoImuPipeline swaps these).
    def _build_rig(self, params):
        return StereoCamera.from_params(params.left_cam, params.right_cam)

    def _build_lcd(self):
        """Production-shaped LCD: pretrained packaged vocabulary + disk
        frame cache (under output_path when logging), LcdParams from the
        YAML tier (reference LcdModule + LoopClosureDetectorParams)."""
        import os

        from kimera_vio_tpu.pipeline.lcd_module import LcdModule

        cache_dir = (
            os.path.join(self.output_path, "lcd_cache")
            if self.output_path
            else None
        )
        return LcdModule(
            self.stereo,
            lcd_params=getattr(self.params, "lcd", None),
            cache_dir=cache_dir,
        )

    def state_covariance(self, return_ok: bool = False):
        """Marginal 15x15 covariance of the newest state of the LAST run's
        final window (reference VioBackend::computeStateCovariance /
        getStateCovariance, consumed by the ROS wrapper for odometry
        covariance). On-demand — one extra device solve, not per-frame.
        `return_ok=True` adds a health flag (False = sick window, the
        numbers are meaningless — see smoother.state_covariance)."""
        if not hasattr(self, "_last_win"):
            raise RuntimeError("state_covariance: no completed run yet")
        out = sm.state_covariance(
            self.backend_cfg, self._last_win, self._last_lmk,
            return_ok=return_ok,
        )
        if return_ok:
            cov, ok = out
            return np.asarray(cov), bool(ok)
        return np.asarray(out)

    def _log_frontend_img(self, stamp_ns: int, uv, ids, mask, left):
        """--log_frontend_images: per-keyframe feature-track overlay PNG
        (reference logFrontendImg, StereoVisionImuFrontend.cpp:540,599;
        green tracked / blue new / red dead)."""
        from kimera_vio_tpu.config import flags as _flags
        from kimera_vio_tpu.utils.debug_images import (
            save_feature_track_overlay,
        )

        out_dir = self.output_path or _flags.get_flag("output_path")
        ids = np.asarray(ids)
        mask = np.asarray(mask)
        left_rect = np.asarray(self.frontend._remap_left(jnp.asarray(left)))
        save_feature_track_overlay(
            left_rect, np.asarray(uv), ids, mask,
            getattr(self, "_prev_kf_ids", None),
            os.path.join(out_dir, "frontend_images", f"{stamp_ns}.png"),
        )
        self._prev_kf_ids = [int(i) for i in ids[mask & (ids >= 0)]]

    def _rebase_delta_s(self, rel_s: float) -> float:
        """Whole-interval t0 shift due at relative mission time `rel_s`
        (0.0 when no rebase is needed). Multiples of the interval are
        exactly representable in f32."""
        import math

        if rel_s < self._rebase_margin_s + self._rebase_interval_s:
            return 0.0
        return self._rebase_interval_s * math.floor(
            (rel_s - self._rebase_margin_s) / self._rebase_interval_s
        )

    def _apply_rebase(self, delta_s: float, win, fe_state):
        """Shift every in-graph stamp by -delta_s (window keyframe stamps +
        the frontend's last-keyframe stamp; both are only ever consumed as
        differences, so a common shift is output-neutral — asserted by
        tests/test_rebase.py)."""
        d = jnp.float32(delta_s)
        win = win.replace(stamp=win.stamp - d)
        fe_state = fe_state.replace(lkf_stamp=fe_state.lkf_stamp - d)
        self._n_rebases += 1
        return win, fe_state

    def _note_backend_health(self, n_recovered: int):
        """Module-failure propagation (reference Pipeline.cpp:253-269 /
        is_backend_ok_): count consecutive keyframe solves that needed the
        failure-recovery path; past the flag threshold, mark the backend
        unhealthy so the run loop stops gracefully instead of silently
        publishing a sick estimate forever."""
        from kimera_vio_tpu.config import flags as _flags

        if n_recovered > 0:
            self._consecutive_recoveries += 1
            self.stats.add("backend_recoveries [#]", float(n_recovered))
        else:
            self._consecutive_recoveries = 0
        limit = _flags.get_flag("max_consecutive_backend_failures")
        if limit > 0 and self._consecutive_recoveries >= limit:
            if self.backend_healthy:
                import logging

                logging.getLogger(__name__).error(
                    "Backend needed solver recovery on %d consecutive "
                    "keyframes - stopping pipeline (reference "
                    "is_backend_ok_ analog)",
                    self._consecutive_recoveries,
                )
            self.backend_healthy = False

    def _setup_aux_modules(self):
        """Instantiate the keyframe-paced aux modules (reference
        Mesher/LcdModule); shared by run() and run_chunked."""
        mesher = lcd_module = None
        self._mesher_logger = None
        if self.enable_mesher:
            from kimera_vio_tpu.mesher.mesher import Mesher

            mesher = Mesher()
            if self.output_path:
                from kimera_vio_tpu.utils.logger import MesherLogger

                self._mesher_logger = MesherLogger(self.output_path)
        if self.enable_lcd:
            lcd_module = self._build_lcd()
        return mesher, lcd_module

    def _feed_aux_kf(
        self, stamp_ns, fo, left, right, win, lmk,
        mesher, lcd_module, visualizer=None, display=None,
    ):
        """One keyframe through the aux modules (mesher -> RegularVIO
        plane feedback -> LCD -> visualizer). Returns the (possibly
        plane-refined) window. `fo` must carry the full keyframe output
        fields (kp_uv/kp_ids/lmk_*)."""
        from kimera_vio_tpu.config import flags as _flags

        if not bool(fo["is_keyframe"]):
            return win
        pose_R = np.asarray(fo["rot"])
        pose_t = np.asarray(fo["pos"])
        mesh = None
        if mesher is not None:
            ids_alive = set(
                int(i) for i in np.asarray(fo["lmk_ids"]) if i >= 0
            )
            mesh = mesher.spin_once(
                np.asarray(fo["kp_uv"]),
                np.asarray(fo["kp_ids"]),
                np.asarray(fo["lmk_ids"]),
                np.asarray(fo["lmk_points"]),
                np.asarray(fo["lmk_valid"]),
                horizon_ids=ids_alive,
            )
            if self.frontend_cfg.rgbd and mesh is not None:
                # Depth-based mesh refinement (MeshOptimization.cpp):
                # `right` is the metric depth image in RGB-D mode.
                mesh = self._refine_mesh(mesh, right, pose_R, pose_t)
            elif mesh is not None and _flags.get_flag(
                "use_dense_depth_mesh_refinement"
            ):
                # Stereo sequences: dense block-matching depth (the
                # reference's denseStereoReconstruction role,
                # StereoMatcher.cpp:32-121) stands in for the RGB-D
                # sensor depth.
                depth = self._dense_depth_for_kf(left, right)
                mesh = self._refine_mesh(mesh, depth, pose_R, pose_t)
            if self.use_regular_vio and mesh is not None:
                # RegularVIO plane feedback (backend_type: 1, the EuRoC
                # default): mesher plane hypotheses + landmark-plane
                # association feed the regularity-constrained joint
                # solve, refining the live window (reference
                # RegularVioBackend.cpp:635-803 + Mesher association
                # :1316; the plane queue is keyframe-lagged there too).
                win = self._regular_refine(win, lmk, mesh, fo)
        if lcd_module is not None:
            if "lcd_uv" in fo:
                # LCD features were extracted on device inside the fused
                # keyframe branch — no image re-upload / extraction
                # dispatches (each costs 30-80 ms tunnel latency).
                lcd_module.add_keyframe_packed(
                    np.asarray(fo["lcd_uv"]),
                    np.asarray(fo["lcd_ok"]),
                    np.asarray(fo["lcd_desc"]),
                    np.asarray(fo["lcd_versors"]),
                    np.asarray(fo["lcd_pts3"]),
                    pose_R, pose_t, stamp_ns,
                )
            else:
                from kimera_vio_tpu.frontend.camera import remap_bilinear

                lrect = remap_bilinear(left, self.frontend.map_left)
                rrect = remap_bilinear(right, self.frontend.map_right)
                lcd_module.add_keyframe(
                    lrect, rrect, pose_R, pose_t, stamp_ns
                )
        if mesh is not None and self.output_path and self._mesher_logger:
            verts = mesh.vertices.reshape(-1, 3)
            tri_idx = np.arange(len(verts)).reshape(-1, 3)
            self._mesher_logger.log(verts, tri_idx)
        if visualizer is not None:
            show_2d = (
                _flags.get_flag("visualize_mesh_2d")
                and mesher is not None
                and mesher.mesh_2d is not None
            )
            w = visualizer.spin_once(
                pose_R, pose_t,
                np.asarray(fo["lmk_points"]),
                np.asarray(fo["lmk_valid"]),
                np.asarray(fo["lmk_ids"]),
                mesh=mesh,
                mesh_2d=mesher.mesh_2d if show_2d else None,
                image=np.asarray(left) if show_2d else None,
            )
            display.spin_once(w)
        return win

    def _regular_refine(self, win, lmk, mesh, fo):
        """One RegularVIO joint solve over window + PERSISTENT plane
        states: freshly segmented planes are associated to tracked planes
        (Mesher::associatePlanes, Mesher.cpp:1316-1420) so the same plane
        identity persists across keyframes and regularities accumulate;
        co-tracked near-parallel planes additionally get
        ParallelPlaneRegularFactor rows."""
        from kimera_vio_tpu.backend import regular_vio as rv
        from kimera_vio_tpu.mesher import mesher as mm
        from kimera_vio_tpu.mesher.plane_tracker import PlaneTracker

        if mesh.n_triangles == 0:
            return win
        if not hasattr(self, "_plane_tracker"):
            self._plane_tracker = PlaneTracker()
        tracker = self._plane_tracker
        verts = jnp.asarray(mesh.vertices, jnp.float32)
        normals = mm.triangle_normals(verts)
        g_axis = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
        keep = jnp.ones(len(mesh.vertices), bool)
        pn, pd, pv, tri_assign = mm.segment_horizontal_planes(
            verts, keep, normals, g_axis
        )
        # Vertical planes (walls, theta-d histogram — Mesher.cpp:1132)
        # join the hypothesis set after the horizontal ones.
        wn, wd, wv, wall_assign = mm.segment_walls(verts, keep, normals, g_axis)
        n_h = pn.shape[0]
        pn = jnp.concatenate([pn, wn])
        pd = jnp.concatenate([pd, wd])
        pv = jnp.concatenate([pv, wv])
        tri_assign = jnp.where(
            (tri_assign < 0) & (wall_assign >= 0),
            wall_assign + n_h,
            tri_assign,
        )
        pv_np = np.asarray(pv)
        if not pv_np.any():
            return win
        # --- associate segmented planes to persistent slots -------------
        seg_idx = np.flatnonzero(pv_np)  # valid segmented planes
        slot_of_seg_valid, _seen = tracker.associate(
            np.asarray(pn)[seg_idx], np.asarray(pd)[seg_idx]
        )
        # segmented-plane index (incl. invalid) -> persistent slot
        seg_to_slot = np.full(len(pv_np), -1, np.int32)
        seg_to_slot[seg_idx] = slot_of_seg_valid
        planes = rv.PlaneStates(
            normal=jnp.asarray(tracker.normals),
            d=jnp.asarray(tracker.ds),
            mask=jnp.asarray(tracker.active),
        )
        # Landmark id -> persistent slot via triangle membership.
        assign_np = np.asarray(tri_assign)
        id_to_plane: dict[int, int] = {}
        for t_i, ids3 in enumerate(np.asarray(mesh.lmk_ids)):
            p = int(assign_np[t_i])
            if p < 0 or seg_to_slot[p] < 0:
                continue
            for lid in ids3:
                id_to_plane.setdefault(int(lid), int(seg_to_slot[p]))
        lmk_ids_np = np.asarray(lmk.ids)
        plane_assoc = np.full(len(lmk_ids_np), -1, np.int32)
        for r, lid in enumerate(lmk_ids_np):
            if lid >= 0 and int(lid) in id_to_plane:
                plane_assoc[r] = id_to_plane[int(lid)]
        if (plane_assoc >= 0).sum() < 3:
            return win
        # Co-tracked parallel planes -> regularity pairs (static Q=4 slot
        # array so the jitted solve's shape is stable).
        pairs = tracker.parallel_pairs()
        Q = 4
        pairs_arr = np.full((Q, 2), -1, np.int32)
        for q, (i, j) in enumerate(pairs[:Q]):
            pairs_arr[q] = (i, j)
        pair_mask = jnp.asarray(pairs_arr[:, 0] >= 0)
        win2, planes2, _ = rv.regular_backend_solve(
            self.backend_cfg, win, lmk, planes,
            jnp.asarray(plane_assoc),
            jnp.float32(0.1),
            gn_iters=1,
            parallel_pairs=jnp.asarray(pairs_arr),
            parallel_pair_mask=pair_mask,
        )
        # Re-anchor the persistent states with the refined solution.
        tracker.update_from_solver(
            np.asarray(planes2.normal), np.asarray(planes2.d)
        )
        return win2

    def _dense_depth_for_kf(self, left, right):
        """Dense metric depth image for a stereo keyframe: rectify the
        raw pair and run the block-matching disparity op (the reference's
        StereoMatcher::denseStereoReconstruction role, StereoMatcher.cpp:
        32-121 — there a cv::StereoBM passthrough, here a TPU cost-volume
        scan, ops/stereo_matching.dense_stereo)."""
        from kimera_vio_tpu.config import flags as _flags
        from kimera_vio_tpu.frontend.camera import remap_bilinear
        from kimera_vio_tpu.ops.stereo_matching import dense_depth

        if not hasattr(self, "_dense_depth_jit"):
            nd = int(_flags.get_flag("dense_stereo_num_disparities"))
            bs = int(_flags.get_flag("dense_stereo_block_size"))
            fx = float(np.asarray(self.stereo.fx))
            bl = float(np.asarray(self.stereo.baseline))
            mind = float(self.params.frontend.min_point_dist)
            maxd = float(self.params.frontend.max_point_dist)

            def _impl(l, r):
                lr = remap_bilinear(l, self.frontend.map_left)
                rr = remap_bilinear(r, self.frontend.map_right)
                return dense_depth(
                    lr, rr, fx=fx, baseline=bl,
                    min_depth=mind, max_depth=maxd,
                    num_disparities=nd, block_size=bs,
                )

            self._dense_depth_jit = jax.jit(_impl)
        return self._dense_depth_jit(jnp.asarray(left), jnp.asarray(right))

    def _refine_mesh(self, mesh, depth_img, pose_R, pose_t):
        """Depth-based mesh refinement (reference MeshOptimization.cpp):
        unique mesh vertices move along their camera rays to match the
        dense depth image. Used by the RGB-D path. The solver variant is
        selected by --mesh_optimizer_type (reference MeshOptimizerType)."""
        from kimera_vio_tpu.config import flags as _flags
        from kimera_vio_tpu.mesher.mesh_optimization import optimize_mesh

        if mesh is None or mesh.n_triangles == 0:
            return mesh
        # Deduplicate vertices by landmark id -> (V,3) + (T,3) indexing.
        ids_flat = mesh.lmk_ids.reshape(-1)
        verts_flat = mesh.vertices.reshape(-1, 3)
        uniq, inv = np.unique(ids_flat, return_inverse=True)
        V = len(uniq)
        verts_w = np.zeros((V, 3), np.float32)
        verts_w[inv] = verts_flat
        tris = inv.reshape(-1, 3).astype(np.int32)
        # World -> camera frame of this keyframe.
        C_R = np.asarray(self.frontend.stereo.R_b_rect)
        C_t = np.asarray(self.frontend.stereo.t_b_rect)
        R_wc = pose_R @ C_R
        t_wc = pose_t + pose_R @ C_t
        verts_c = (verts_w - t_wc) @ R_wc
        refined_c, _ = optimize_mesh(
            jnp.asarray(verts_c),
            jnp.asarray(tris),
            jnp.ones(len(tris), bool),
            jnp.asarray(np.asarray(depth_img), jnp.float32),
            float(np.asarray(self.stereo.fx)),
            float(np.asarray(self.stereo.fy)),
            float(np.asarray(self.stereo.cx)),
            float(np.asarray(self.stereo.cy)),
            optimizer_type=int(_flags.get_flag("mesh_optimizer_type")),
        )
        refined_w = np.asarray(refined_c) @ R_wc.T + t_wc
        from kimera_vio_tpu.mesher.mesher import Mesh3D

        return Mesh3D(lmk_ids=mesh.lmk_ids, vertices=refined_w[tris])

    def _build_frontend_cfg(self, params):
        cfg = FrontendConfig.from_params(
            params.frontend, max_features=params.max_features
        )
        # LK implementation: the matmul-form tracker with per-keyframe
        # template cache is the measured winner on real TPU hardware
        # (scripts/scanbench + profile_tpu tables, ROADMAP round 5); the
        # Pallas kernel stays available via KIMERA_LK_IMPL=pallas for
        # re-evaluation on future hardware.
        lk_env = os.environ.get("KIMERA_LK_IMPL", "")
        if lk_env in ("matmul", "gather", "pallas"):
            cfg = cfg.replace(lk_impl=lk_env)
        return cfg

    # ------------------------------------------------------------------
    def _fused_step_impl(
        self, fe_state, win, lmk, left, right, imu_block, stamp, ext_odom=None
    ):
        """One fully-fused VIO frame: frontend + (conditional) backend in a
        single device program — ZERO host synchronization per frame. The
        keyframe decision gates the backend with lax.cond on device (the
        TPU-native replacement of the frontend->backend queue handoff,
        reference StereoImuPipeline.cpp:95-114)."""
        cfg = self.backend_cfg
        fe_state, fe_out = self.frontend._process_frame_impl(
            fe_state, left, right, imu_block, stamp
        )
        meas = fe_out["measurements"]

        # Between-stereo factor from the tracker's stereo-RANSAC pose
        # (addBetweenStereoFactors, VioBackend.cpp:324-336): rotation = PIM
        # gyro rotation (the 1-pt voting solver's given-rotation), translation
        # = the Mahalanobis-voted estimate, moved cam -> body frame.
        stereo_rel = None
        btw_kwargs = {}
        if (
            self.params.backend.add_between_stereo_factors
            or self.params.backend.pose_guess_source == 2
            or self.params.backend.auto_initialize == 2
        ) and not self.frontend_cfg.mono:
            C_R = self.frontend.stereo.R_b_rect
            C_t = self.frontend.stereo.t_b_rect
            # R_stereo = gyro rotation (1-pt voting) or the Arun-estimated
            # rotation (3-pt); both in the rectified-cam frame.
            R_b = C_R @ fe_out["R_stereo"] @ C_R.T
            t_b = C_R @ fe_out["t_stereo_vote"] + C_t - R_b @ C_t
            stereo_rel = (
                R_b,
                t_b,
                fe_out["n_stereo_inliers"]
                >= self.frontend_cfg.min_stereo_inliers,
            )
            if self.params.backend.add_between_stereo_factors:
                btw_kwargs = dict(
                    btw_R_rel=R_b, btw_t_rel=t_b, btw_valid=stereo_rel[2]
                )

        def do_backend(args):
            win, lmk = args
            guess_kwargs = {}
            src = self.params.backend.pose_guess_source
            prev_slot = jnp.maximum(win.n - 1, 0)
            if self.params.frontend.use_pnp_tracking or src == 3:
                # PnP against the backend landmark map (Tracker::pnp,
                # Tracker.cpp:1163-1270; map export :1076-1080): match
                # current measurement ids to table rows, solve camera-from-
                # world, convert to body pose.
                from kimera_vio_tpu.ops import ransac as rs

                eq = (meas.ids[:, None] == lmk.ids[None, :]) & meas.mask[
                    :, None
                ] & (lmk.ids >= 0)[None, :]
                row = jnp.argmax(eq, axis=1)
                has3d = eq.any(axis=1) & lmk.pts_ok[row]
                p_world = lmk.pts[row]
                xy = jnp.stack(
                    [
                        (meas.uvs[:, 0] - self.stereo.cx) / self.stereo.fx,
                        (meas.uvs[:, 2] - self.stereo.cy) / self.stereo.fy,
                    ],
                    -1,
                )
                rays = jnp.concatenate([xy, jnp.ones_like(xy[:, :1])], -1)
                bearings = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
                key = jax.random.fold_in(
                    jax.random.PRNGKey(7), fe_state.frame_count
                )
                R_cw, t_cw, _, n_pnp = rs.ransac_pnp(
                    p_world, bearings, has3d, key,
                    focal=float(np.asarray(self.stereo.fx)),
                )
                # W_T_body = (W_T_cam) * (B_T_cam)^-1
                R_wc = jnp.swapaxes(R_cw, -1, -2)
                p_wc = -R_wc @ t_cw
                C_R = self.frontend.stereo.R_b_rect
                C_t = self.frontend.stereo.t_b_rect
                R_wb = R_wc @ C_R.T
                p_wb = p_wc - R_wb @ C_t
                pnp_ok = n_pnp >= jnp.int32(
                    self.params.frontend.min_pnp_inliers
                )
                if src == 3:
                    guess_kwargs = dict(
                        guess_R=R_wb, guess_t=p_wb, guess_valid=pnp_ok
                    )
            if src == 1:
                # MONO guess (VioBackend.cpp:817-835): previous smoothed
                # pose composed with the mono-RANSAC relative (rotation
                # from gyro/5-pt, translation a unit direction), then the
                # WORLD translation scaled by mono_translation_scale_factor
                # — reproducing the reference's literal formula.
                C_R = self.frontend.stereo.R_b_rect
                C_t = self.frontend.stereo.t_b_rect
                R_mb = C_R @ fe_out["R_mono"] @ C_R.T
                t_mb = C_R @ fe_out["t_mono"] + C_t - R_mb @ C_t
                gR = win.rot[prev_slot] @ R_mb
                gt_ = (
                    win.pos[prev_slot] + win.rot[prev_slot] @ t_mb
                ) * jnp.float32(
                    self.params.backend.mono_translation_scale_factor
                )
                mono_ok = fe_out["n_mono_inliers"] >= jnp.int32(
                    self.params.frontend.min_nr_mono_inliers
                )
                guess_kwargs = dict(
                    guess_R=gR, guess_t=gt_, guess_valid=mono_ok
                )
            if src == 2 and stereo_rel is not None:
                # STEREO guess: previous smoothed pose composed with the
                # stereo-RANSAC relative (VioBackend.cpp:843-862).
                R_rel, t_rel, rel_ok = stereo_rel
                gR = win.rot[prev_slot] @ R_rel
                gt_ = win.pos[prev_slot] + win.rot[prev_slot] @ t_rel
                guess_kwargs = dict(
                    guess_R=gR, guess_t=gt_, guess_valid=rel_ok
                )
            odom_kwargs = {}
            if ext_odom is not None:
                odom_kwargs = dict(
                    odom_R_abs=ext_odom[0],
                    odom_t_abs=ext_odom[1],
                    odom_valid_abs=ext_odom[2],
                )
            return sm.backend_step(
                cfg, win, lmk, pim=fe_out["pim"], stamp=stamp,
                meas_ids=meas.ids, meas_uvd=meas.uvs, meas_mask=meas.mask,
                status=fe_out["status"], **btw_kwargs, **guess_kwargs,
                **odom_kwargs,
            )

        def skip_backend(args):
            win, lmk = args
            slot = jnp.maximum(win.n - 1, 0)
            bout = {
                "rot": win.rot[slot],
                "pos": win.pos[slot],
                "vel": win.vel[slot],
                "bias": win.bias[slot],
                "rot_inc": win.out_rot,
                "pos_inc": win.out_pos,
                "stamp": win.stamp[slot],
                "slot": slot,
                "lmk_points": jnp.zeros((cfg.max_landmarks, 3), win.pos.dtype),
                "lmk_valid": jnp.zeros(cfg.max_landmarks, bool),
                "lmk_ids": lmk.ids,
                "n_recovered": jnp.int32(0),
            }
            return win, lmk, bout

        win, lmk, bout = jax.lax.cond(
            fe_out["is_keyframe"], do_backend, skip_backend, (win, lmk)
        )
        # Bias feedback + PIM rebase on keyframes (in-graph; reference's
        # imu_bias_update_callback, StereoImuPipeline.cpp:141-145).
        new_bias = ImuBias(accel=bout["bias"][0:3], gyro=bout["bias"][3:6])
        fe_state = jax.lax.cond(
            fe_out["is_keyframe"],
            lambda s: s.replace(
                imu_bias=new_bias, pim=imu.Pim.zero(new_bias)
            ),
            lambda s: s,
            fe_state,
        )
        frame_out = {
            "is_keyframe": fe_out["is_keyframe"],
            "n_tracked": fe_out["n_tracked"],
            "median_disparity": fe_out["median_disparity"],
            "n_mono_inliers": fe_out["n_mono_inliers"],
            "n_stereo_inliers": fe_out["n_stereo_inliers"],
            "rot": bout["rot"],
            "pos": bout["pos"],
            "vel": bout["vel"],
            "bias": bout["bias"],
            # For the keyframe-paced aux modules (mesher / LCD / viz).
            "lmk_points": bout["lmk_points"],
            "lmk_valid": bout["lmk_valid"],
            "lmk_ids": bout["lmk_ids"],
            "kp_uv": jnp.stack([meas.uvs[:, 0], meas.uvs[:, 2]], -1),
            "kp_ids": meas.ids,
            "kp_mask": meas.mask,
            # Solver failure-recovery count (module-health propagation).
            "n_recovered": bout["n_recovered"],
        }
        if self.frontend_cfg.lcd_features > 0:
            # On-device LCD features (keyframe branch; zeros otherwise).
            for k in ("lcd_uv", "lcd_ok", "lcd_desc", "lcd_versors",
                      "lcd_pts3"):
                frame_out[k] = fe_out[k]
        if getattr(self, "_do_time_align", False):
            # Visual rotation magnitude for the cross-correlation time
            # aligner (CrossCorrTimeAligner.cpp; needs VISION-estimated
            # rotation — the pipeline forces the 3-pt Arun solver then).
            frame_out["vis_rot_angle"] = jnp.linalg.norm(
                geo.so3_log(fe_out["R_stereo"])
            )
        if self.params.backend.auto_initialize == 2 and stereo_rel is not None:
            # Extras for the online initializer (initial/initializer.py):
            # the tracker's keyframe-relative pose + the keyframe PIM.
            p = fe_out["pim"]
            frame_out.update(
                init_R_rel_body=stereo_rel[0],
                init_t_rel_body=stereo_rel[1],
                init_pim_delta_R=p.delta_R,
                init_pim_delta_v=p.delta_v,
                init_pim_delta_p=p.delta_p,
                init_pim_dR_dbg=p.dR_dbg,
            )
        return fe_state, win, lmk, frame_out

    # ------------------------------------------------------------------
    def _chunk_step_impl(self, fe_state, win, lmk, imgs, aux, B, minimal):
        """Frame-chunked offline step: lax.scan the fused per-frame program
        over a whole chunk of frames inside ONE device dispatch. Amortizes
        the per-dispatch host/tunnel overhead across the chunk (the TPU
        replacement for the reference's offline dataset-parse-then-spin
        batch mode).

        imgs: (C,2,H,W) uint8 stacked stereo pairs; aux: (C, B*8+1) packed
        float32 [acc 3B | gyr 3B | dt B | mask B | stamp]. `minimal=True`
        strips the per-frame outputs to the trajectory fields — device->
        host readback is the slowest link on this platform, so the bench
        path fetches only what the trajectory logger needs."""
        from kimera_vio_tpu.common.types import ImuBlock

        def body(carry, xs):
            fe_state, win, lmk = carry
            pair, a = xs
            blk = ImuBlock(
                acc=a[: B * 3].reshape(B, 3),
                gyr=a[B * 3 : B * 6].reshape(B, 3),
                dt=a[B * 6 : B * 7],
                mask=a[B * 7 : B * 8] > 0.5,
            )
            fe_state, win, lmk, fo = self._fused_step_impl(
                fe_state, win, lmk, pair[0], pair[1], blk, a[B * 8]
            )
            if minimal:
                # ONE packed (27,) f32 row per frame: device->host transfers
                # on this platform pay ~30-80 ms latency EACH, so the whole
                # chunk's outputs ride back in a single (C,27) array.
                fo = jnp.concatenate(
                    [
                        fo["is_keyframe"].astype(jnp.float32)[None],
                        fo["n_tracked"].astype(jnp.float32)[None],
                        fo["median_disparity"][None],
                        fo["n_mono_inliers"].astype(jnp.float32)[None],
                        fo["n_stereo_inliers"].astype(jnp.float32)[None],
                        fo["rot"].reshape(9),
                        fo["pos"],
                        fo["vel"],
                        fo["bias"],
                        fo["n_recovered"].astype(jnp.float32)[None],
                    ]
                )
            else:
                # Aux mode: same single-fetch principle — pack the per-frame
                # field dict into ONE f32 + ONE i32 row (ids stay exact in
                # int32; f32 would silently round ids past 2^24 on long
                # missions). Unpacked host-side by _unpack_aux_rows.
                f_parts = [
                    fo["median_disparity"][None],
                    fo["rot"].reshape(9),
                    fo["pos"],
                    fo["vel"],
                    fo["bias"],
                    fo["lmk_points"].reshape(-1),
                    fo["kp_uv"].reshape(-1),
                ]
                i_parts = [
                    jnp.stack(
                        [
                            fo["is_keyframe"].astype(jnp.int32),
                            fo["n_tracked"].astype(jnp.int32),
                            fo["n_mono_inliers"].astype(jnp.int32),
                            fo["n_stereo_inliers"].astype(jnp.int32),
                            fo["n_recovered"].astype(jnp.int32),
                        ]
                    ),
                    fo["lmk_ids"].astype(jnp.int32),
                    fo["lmk_valid"].astype(jnp.int32),
                    fo["kp_ids"].astype(jnp.int32),
                    fo["kp_mask"].astype(jnp.int32),
                ]
                if "lcd_uv" in fo:
                    f_parts += [
                        fo["lcd_uv"].reshape(-1),
                        fo["lcd_versors"].reshape(-1),
                        fo["lcd_pts3"].reshape(-1),
                    ]
                    i_parts += [
                        fo["lcd_ok"].astype(jnp.int32),
                        # bitcast keeps the 256 descriptor bits exact
                        jax.lax.bitcast_convert_type(
                            fo["lcd_desc"], jnp.int32
                        ).reshape(-1),
                    ]
                fo = (jnp.concatenate(f_parts), jnp.concatenate(i_parts))
            return (fe_state, win, lmk), fo

        (fe_state, win, lmk), fos = jax.lax.scan(
            body, (fe_state, win, lmk), (imgs, aux)
        )
        return fe_state, win, lmk, fos

    def _unpack_aux_rows(self, fos):
        """Host-side inverse of the aux-mode packing in _chunk_step_impl:
        (C,Pf) f32 + (C,Pi) i32 -> per-field host dict. TWO device fetches
        per chunk instead of one per field (each fetch pays ~30-80 ms
        tunnel latency on this platform)."""
        f = np.asarray(fos[0])
        ii = np.asarray(fos[1])
        L = self.backend_cfg.max_landmarks
        N = self.frontend_cfg.max_features
        C = f.shape[0]
        out = {}
        o = 0

        def takef(n, shape=None):
            nonlocal o
            v = f[:, o : o + n]
            o += n
            return v.reshape((C,) + shape) if shape else v[:, 0] if n == 1 else v

        out["median_disparity"] = takef(1)
        out["rot"] = takef(9, (3, 3))
        out["pos"] = takef(3)
        out["vel"] = takef(3)
        out["bias"] = takef(6)
        out["lmk_points"] = takef(L * 3, (L, 3))
        out["kp_uv"] = takef(N * 2, (N, 2))
        oi = 0

        def takei(n, dtype=np.int32, shape=None):
            nonlocal oi
            v = ii[:, oi : oi + n].astype(dtype)
            oi += n
            if shape:
                return v.reshape((C,) + shape)
            return v[:, 0] if n == 1 else v

        out["is_keyframe"] = takei(1, bool)
        out["n_tracked"] = takei(1)
        out["n_mono_inliers"] = takei(1)
        out["n_stereo_inliers"] = takei(1)
        out["n_recovered"] = takei(1)
        out["lmk_ids"] = takei(L)
        out["lmk_valid"] = takei(L, bool)
        out["kp_ids"] = takei(N)
        out["kp_mask"] = takei(N, bool)
        M = self.frontend_cfg.lcd_features
        if M > 0:
            out["lcd_uv"] = takef(M * 2, (M, 2))
            out["lcd_versors"] = takef(M * 3, (M, 3))
            out["lcd_pts3"] = takef(M * 3, (M, 3))
            out["lcd_ok"] = takei(M, bool)
            out["lcd_desc"] = (
                takei(M * 8, shape=(M, 8)).view(np.uint32)
            )
        return out

    def run_chunked(
        self,
        provider: EurocDataProvider,
        chunk_size: int = 16,
        verbose: bool = False,
        collect_aux: bool = False,
        super_batch_bytes: int = 32 * 1024 * 1024,
    ) -> PipelineOutput:
        """Offline mode: process the sequence in `chunk_size`-frame device
        dispatches with batched image staging and lagged async readback.

        Equivalent trajectory to `run()` (same fused per-frame program,
        scanned); differs only in host choreography. Equivalence is
        algorithmic, not bitwise: the scanned program fuses differently
        than the per-frame one, and on real imagery last-ulp rounding can
        flip a RANSAC/track gate (measured on MicroEuroc: identical
        keyframe cadence, trajectories within ~2.5 cm at near-hover; the
        synthetic fixtures agree to <1e-3). `collect_aux=True`
        additionally returns per-frame landmark/keypoint fields and drives
        the keyframe-paced aux modules (mesher / LCD / RegularVIO plane
        feedback), matching `run()`'s aux path with chunk-lagged feedback.

        NOT supported in chunked mode (host-phase features that interleave
        with the per-frame loop): fine time alignment, online
        initialization (autoInitialize: 2), and external odometry — these
        raise to avoid a silent divergence from `run()`."""
        import threading
        import queue as _q

        if self._do_time_align:
            raise NotImplementedError(
                "run_chunked does not support fine IMU-camera time "
                "alignment; use run()"
            )
        if self.params.backend.auto_initialize == 2:
            raise NotImplementedError(
                "run_chunked does not support online initialization "
                "(autoInitialize: 2); use run()"
            )
        if getattr(provider, "odometry", None) is not None:
            raise NotImplementedError(
                "run_chunked does not support external odometry; use run()"
            )
        if (self.enable_mesher or self.enable_lcd) and not collect_aux:
            import warnings

            warnings.warn(
                "mesher/LCD enabled but collect_aux=False: aux modules "
                "will not run in chunked mode", stacklevel=2,
            )

        out = PipelineOutput()
        self.lcd_result = None
        self.backend_healthy = True
        self._consecutive_recoveries = 0
        K = self.backend_cfg.nr_states
        L = self.backend_cfg.max_landmarks
        win = sm.Window.empty(K)
        lmk = sm.LandmarkTable.empty(L, K)
        if not hasattr(self, "_chunk_step"):
            self._chunk_step = jax.jit(
                self._chunk_step_impl, static_argnames=("B", "minimal")
            )

        packets = [p for p in provider.frames()]
        if not packets:
            return out
        first = packets[0]
        t0_ns = first["stamp_ns"]
        rest = [p for p in packets[1:] if p.get("imu") is not None]

        # ---- background stager ------------------------------------------
        # h2d on this platform has ~28 ms fixed latency and bandwidth that
        # IMPROVES with transfer size (one big transfer streams ~1 GB/s;
        # chunk-sized ones can crawl) — so frames are staged in SUPER-
        # batches of several chunks in ONE stacked uint8 transfer + one
        # packed f32 aux transfer, and the per-dispatch chunks are sliced
        # on-device (device-to-device, off the host path). Started BEFORE
        # the bootstrap below so the first super-batch streams while the
        # bootstrap transfers/dispatches (~0.1 s of tunnel time hidden).
        C = chunk_size
        # Lossless temporal-delta staging codec (ops/frame_codec.py): ships
        # ~1.7x fewer bytes over the transfer-bound h2d link; the device
        # reconstructs exact frames (unpack + scatter + time cumsum), so
        # trajectories are bit-identical to raw staging. Default is delta4:
        # delta3 ships ~25% fewer bytes still, but its decode needs
        # full-length gathers + prefix sums over the flat pixel axis that
        # cost more device time than the wire saving buys (measured on
        # MicroEuroc/v5e: 18-22 fps e2e vs delta4's 68 — see ROADMAP round
        # 5). KIMERA_STAGE_CODEC=delta3 keeps it available for slower
        # links where the trade flips. Per-super-batch fallback to
        # delta4/raw when the scene defeats the deltas.
        codec = os.environ.get("KIMERA_STAGE_CODEC", "delta4c")
        use_codec = codec != "raw"
        if rest:
            frame_bytes = 2 * int(
                np.prod(provider.load_image(rest[0]["left_path"]).shape)
            )
            # super_batch_bytes budgets WIRE bytes; delta-coded frames
            # cost ~0.45-0.6x raw, so more frames fit per transfer.
            _f = (9, 20) if codec == "delta3" else (3, 5)
            eff_bytes = (
                (frame_bytes * _f[0]) // _f[1] if use_codec else frame_bytes
            )
            super_frames = max(
                C, super_batch_bytes // max(eff_bytes, 1) // C * C
            )
        else:
            super_frames = C

        def stage(batch, shift_ns=0):
            tic = time.perf_counter()
            n_real = len(batch)
            n_pad = (-n_real) % C
            padded = batch + [batch[-1]] * n_pad
            left_imgs = [provider.load_image(p["left_path"]) for p in padded]
            right_imgs = (
                [provider.load_image(p["right_path"]) for p in padded]
                if "right_path" in batch[0]
                else left_imgs
            )
            B = batch[0]["imu"].capacity
            F = len(padded)
            aux = np.zeros((F, B * 8 + 1), np.float32)
            for i, p in enumerate(padded):
                blk = p["imu"]
                aux[i, : B * 3] = np.asarray(blk.acc, np.float32).ravel()
                aux[i, B * 3 : B * 6] = np.asarray(blk.gyr, np.float32).ravel()
                aux[i, B * 6 : B * 7] = np.asarray(blk.dt, np.float32)
                if i < n_real:
                    aux[i, B * 7 : B * 8] = np.asarray(blk.mask, np.float32)
                aux[i, B * 8] = (p["stamp_ns"] - t0_ns - shift_ns) * 1e-9
            # delta4c reads the original image planes through a pointer
            # table (native fused encoder) — the (F,2,H,W) stack is only
            # materialized for the fallback codecs / raw staging.
            enc4c = None
            if use_codec and codec == "delta4c":
                planes = [
                    im
                    for pair in zip(left_imgs, right_imgs)
                    for im in pair
                ]
                if all(
                    isinstance(im, np.ndarray) and im.dtype == np.uint8
                    for im in planes
                ):
                    H, W = left_imgs[0].shape[:2]
                    enc4c = encode_delta4c_planes(
                        planes, 2, (F, 2, H, W), aux
                    )
            imgs = None
            if enc4c is None:
                imgs = np.stack(
                    [np.stack(left_imgs), np.stack(right_imgs)], axis=1
                )  # (F,2,H,W)
            enc3 = (
                encode_delta3(imgs)
                if use_codec and codec == "delta3" and imgs is not None
                else None
            )
            self.stats.add(
                "stage encode [ms]", (time.perf_counter() - tic) * 1e3
            )
            tic = time.perf_counter()
            if enc4c is not None:
                # ONE transfer per super-batch: frames + escapes + aux in
                # a single uint8 buffer (each h2d transfer pays ~28 ms
                # fixed latency on this link — see ops/frame_codec.py).
                payload = (
                    "delta4c",
                    jnp.asarray(enc4c["buf"]),
                    enc4c["shape"],
                    enc4c["n_tok"],
                    enc4c["aux_shape"],
                    B,
                )
                mb = wire_bytes(enc4c) / 1e6
            elif enc3 is not None:
                wire = (
                    jnp.asarray(enc3["base"]),
                    jnp.asarray(enc3["t1"]),
                    jnp.asarray(enc3["t2"]),
                    jnp.asarray(enc3["t3"]),
                    enc3["shape"],
                )
                payload = ("delta3", wire, jnp.asarray(aux), B)
                mb = wire_bytes(enc3) / 1e6
            else:
                enc = encode_delta4(imgs) if use_codec else None
                if enc is not None:
                    wire = (
                        jnp.asarray(enc["base"]),
                        jnp.asarray(enc["packed"]),
                        jnp.asarray(enc["esc_idx"]),
                        jnp.asarray(enc["esc_val"]),
                        enc["shape"],
                    )
                    payload = ("delta4", wire, jnp.asarray(aux), B)
                    mb = wire_bytes(enc) / 1e6
                else:
                    payload = ("raw", jnp.asarray(imgs), jnp.asarray(aux), B)
                    mb = imgs.nbytes / 1e6
            put_s = time.perf_counter() - tic
            self.stats.add("stage h2d [ms]", put_s * 1e3)
            self.stats.add("stage wire [MB]", mb)
            if put_s > 1e-4:
                self.stats.add("stage h2d [MB/s]", mb / put_s)
            return payload

        def materialize(payload):
            """Staged payload -> (imgs_super_batch, aux, B) on device."""
            if payload[0] == "delta4c":
                _, buf, shape, n_tok, aux_shape, B = payload
                imgs, aux = decode_delta4c(buf, shape, n_tok, aux_shape)
                return imgs, aux, B
            if payload[0] == "delta3":
                _, (base, t1, t2, t3, shape), aux, B = payload
                return decode_delta3(base, t1, t2, t3, shape), aux, B
            if payload[0] == "delta4":
                _, (base, packed, ei, ev, shape), aux, B = payload
                return decode_delta4(base, packed, ei, ev, shape), aux, B
            return payload[1], payload[2], payload[3]

        chunks = [
            rest[i : i + chunk_size] for i in range(0, len(rest), chunk_size)
        ]
        supers = [
            rest[i : i + super_frames]
            for i in range(0, len(rest), super_frames)
        ]
        # Long-mission f32 stamp rebase (see __init__): precompute the
        # cumulative t0 shift per super-batch (a pure function of the
        # stamps, so the stager thread and the dispatch loop agree without
        # synchronization); the dispatch loops shift the device carry when
        # they cross a super-batch whose shift advanced.
        super_shift_ns = []
        _tot_s = 0.0
        for s_pk in supers:
            _rel = (s_pk[0]["stamp_ns"] - t0_ns) * 1e-9 - _tot_s
            _tot_s += self._rebase_delta_s(_rel)
            super_shift_ns.append(int(round(_tot_s * 1e9)))
        staged: _q.Queue = _q.Queue(maxsize=2)

        def stager():
            # An exception here must PROPAGATE: a silently-dead stager
            # leaves every consumer blocked in staged.get() forever.
            try:
                for j, c in enumerate(supers):
                    staged.put((stage(c, super_shift_ns[j]), len(c), j))
                staged.put(None)
            except BaseException as e:  # noqa: BLE001 - re-raised below
                staged.put(("stager_error", e))

        def _check_staged(item):
            if isinstance(item, tuple) and item and item[0] == "stager_error":
                raise RuntimeError("staging thread failed") from item[1]
            return item

        th = threading.Thread(target=stager, daemon=True)
        th.start()

        # ---- bootstrap on frame 0: ONE stacked transfer + ONE dispatch
        # (each separate dispatch/transfer pays ~30-80 ms tunnel latency).
        l0 = provider.load_image(first["left_path"])
        r0 = (
            provider.load_image(first["right_path"])
            if "right_path" in first
            else l0
        )
        stack0 = np.stack([l0, r0])
        if l0.dtype != r0.dtype:  # RGB-D: uint8 left + float depth
            stack0 = np.stack([l0, r0]).astype(np.float32)
        pair0 = jnp.asarray(stack0)
        nav0, bias0 = self._bootstrap_state(provider, t0_ns, first["imu"])
        if not hasattr(self, "_bootstrap_fused"):

            def _bootstrap_impl(pair, R0, p0, v0, b0, remaps):
                fe_state, meas0 = self.frontend._init_state_impl(
                    pair[0], pair[1], jnp.float32(0.0), remaps
                )
                fe_state = fe_state.replace(
                    imu_bias=ImuBias(accel=b0[0:3], gyro=b0[3:6])
                )
                w = sm.Window.empty(self.backend_cfg.nr_states)
                w = sm.bootstrap(
                    cfg=self.backend_cfg, win=w,
                    nav=NavState(rot=R0, pos=p0, vel=v0), bias=b0,
                    stamp=jnp.float32(0.0),
                )
                l = sm.LandmarkTable.empty(
                    self.backend_cfg.max_landmarks, self.backend_cfg.nr_states
                )
                l = sm.update_landmarks(
                    l, meas0.ids, meas0.uvs, meas0.mask, jnp.int32(0)
                )
                return fe_state, w, l

            self._bootstrap_fused = jax.jit(_bootstrap_impl)
        fe_state, win, lmk = self._bootstrap_fused(
            pair0, nav0.rot, nav0.pos, nav0.vel, bias0,
            self.frontend.remap_taps,
        )
        # Record the bootstrap state from the HOST-side values (a device
        # fetch costs ~30-80 ms on the tunnel; win slot 0 == nav0 exactly).
        self._record_raw(
            out, t0_ns, np.asarray(nav0.pos),
            self._np_rot_to_quat(np.asarray(nav0.rot)),
            np.asarray(nav0.vel), np.asarray(bias0),
        )
        out.n_keyframes += 1
        out.n_frames += 1

        minimal = not collect_aux
        mesher = lcd_module = None
        if collect_aux:
            mesher, lcd_module = self._setup_aux_modules()
        # RegularVIO plane feedback must reach the device carry before the
        # next chunk dispatch -> synchronous per-chunk aux; mesher/LCD
        # without feedback can drain on a worker thread.
        sync_aux = collect_aux and self.use_regular_vio

        from kimera_vio_tpu.config import flags as _flags

        log_fe_imgs = bool(_flags.get_flag("log_frontend_images"))
        self._prev_kf_ids = None

        def feed_aux_chunk(chunk, host, win, lmk):
            """Keyframes of one drained chunk through the aux modules
            (mirrors run()'s feed_aux; chunk-lagged like its aux_lag)."""
            for i, p in enumerate(chunk):
                if not bool(host["is_keyframe"][i]):
                    continue
                fo_i = {k: v[i] for k, v in host.items()}
                left = jnp.asarray(provider.load_image(p["left_path"]))
                right = (
                    jnp.asarray(provider.load_image(p["right_path"]))
                    if "right_path" in p
                    else left
                )
                if log_fe_imgs and "kp_uv" in fo_i:
                    self._log_frontend_img(
                        p["stamp_ns"], fo_i["kp_uv"], fo_i["kp_ids"],
                        fo_i["kp_mask"], left,
                    )
                win = self._feed_aux_kf(
                    p["stamp_ns"], fo_i, left, right, win, lmk,
                    mesher, lcd_module,
                )
            return win

        def drain(item):
            chunk, fos = item
            if minimal:
                host = np.asarray(fos)  # (C,27) — one transfer
                for i, p in enumerate(chunk):
                    out.n_frames += 1
                    row = host[i]
                    if self.frontend_logger:
                        self.frontend_logger.log(
                            p["stamp_ns"], bool(row[0] > 0.5), int(row[1]),
                            float(row[2]), int(row[3]), int(row[4]), 0.0,
                        )
                    if row[0] > 0.5:
                        out.n_keyframes += 1
                        self._record_raw(
                            out, p["stamp_ns"], row[14:17],
                            self._np_rot_to_quat(row[5:14].reshape(3, 3)),
                            row[17:20], row[20:26],
                        )
                        self._note_backend_health(int(row[26]))
                        if self.logger:
                            self.logger.log_timing(p["stamp_ns"], 0.0)
                return
            host = fos  # already unpacked to a host dict by the callers
            for i, p in enumerate(chunk):
                out.n_frames += 1
                if self.frontend_logger:
                    self.frontend_logger.log(
                        p["stamp_ns"],
                        bool(host["is_keyframe"][i]),
                        int(host["n_tracked"][i]),
                        float(host["median_disparity"][i]),
                        int(host["n_mono_inliers"][i]),
                        int(host["n_stereo_inliers"][i]),
                        0.0,
                    )
                if bool(host["is_keyframe"][i]):
                    out.n_keyframes += 1
                    fo_i = {k: v[i] for k, v in host.items()}
                    self._record_out(out, p["stamp_ns"], fo_i)
                    self._note_backend_health(
                        int(host["n_recovered"][i])
                        if "n_recovered" in host
                        else 0
                    )

        _applied_shift_ns = 0

        def apply_super_shift(j, win, fe_state):
            """Rebase the device carry when super-batch j's stamps use an
            advanced t0 (output-neutral; tests/test_rebase.py)."""
            nonlocal _applied_shift_ns
            if super_shift_ns[j] != _applied_shift_ns:
                d = (super_shift_ns[j] - _applied_shift_ns) * 1e-9
                win, fe_state = self._apply_rebase(d, win, fe_state)
                _applied_shift_ns = super_shift_ns[j]
            return win, fe_state

        if minimal:
            # Minimal outputs are (C,26) rows: keep them ON DEVICE during
            # the run and fetch everything in ONE end-of-run transfer —
            # per-chunk d2h fetches contend with the staging h2d stream
            # on the tunnel.
            ci = 0
            fos_list = []
            while True:
                tic = time.perf_counter()
                item = _check_staged(staged.get())
                self.stats.add(
                    "dispatch wait-for-stage [ms]",
                    (time.perf_counter() - tic) * 1e3,
                )
                if item is None:
                    break
                payload, n_real, j = item
                win, fe_state = apply_super_shift(j, win, fe_state)
                tic = time.perf_counter()
                imgs_sb, aux_sb, B = materialize(payload)
                n_inner = imgs_sb.shape[0] // C
                for k in range(n_inner):
                    imgs = jax.lax.slice_in_dim(imgs_sb, k * C, (k + 1) * C)
                    aux = jax.lax.slice_in_dim(aux_sb, k * C, (k + 1) * C)
                    fe_state, win, lmk, fos = self._chunk_step(
                        fe_state, win, lmk, imgs, aux, B, minimal=True
                    )
                    fos_list.append(fos)
                    ci += 1
                    if verbose and ci % 8 == 0:
                        print(f"chunk {ci}/{len(chunks)}")
                self.stats.add(
                    "chunk dispatch [ms]", (time.perf_counter() - tic) * 1e3
                )
            if fos_list:
                tic = time.perf_counter()
                all_rows = np.asarray(jnp.concatenate(fos_list, axis=0))
                self.stats.add(
                    "readback [ms]", (time.perf_counter() - tic) * 1e3
                )
                tic = time.perf_counter()
                for ci, chunk in enumerate(chunks):
                    drain((chunk, all_rows[ci * C : (ci + 1) * C]))
                self.stats.add(
                    "drain [ms]", (time.perf_counter() - tic) * 1e3
                )
            self._last_win, self._last_lmk = win, lmk
            self._write_final_logs(out)
            return out

        if sync_aux:
            # RegularVIO feedback: drain + aux inline so the plane-refined
            # window re-enters the device carry before the next chunk
            # (same keyframe lag class as run()'s aux_lag, here <= chunk).
            ci = 0
            while True:
                item = _check_staged(staged.get())
                if item is None:
                    break
                payload, n_real, j = item
                win, fe_state = apply_super_shift(j, win, fe_state)
                imgs_sb, aux_sb, B = materialize(payload)
                n_inner = imgs_sb.shape[0] // C
                for k in range(n_inner):
                    imgs = jax.lax.slice_in_dim(imgs_sb, k * C, (k + 1) * C)
                    aux = jax.lax.slice_in_dim(aux_sb, k * C, (k + 1) * C)
                    fe_state, win, lmk, fos = self._chunk_step(
                        fe_state, win, lmk, imgs, aux, B, minimal=False
                    )
                    host = self._unpack_aux_rows(fos)
                    drain((chunks[ci], host))
                    win = feed_aux_chunk(chunks[ci], host, win, lmk)
                    ci += 1
                    if verbose and ci % 8 == 0:
                        print(f"chunk {ci}/{len(chunks)}")
            self.lcd_result = lcd_module.finish() if lcd_module else None
            self._last_win, self._last_lmk = win, lmk
            self._write_final_logs(out)
            return out

        # Aux-collecting path without window feedback: per-chunk readbacks
        # + mesher/LCD on a worker thread.
        drain_q: _q.Queue = _q.Queue()

        def drainer():
            while True:
                item = drain_q.get()
                if item is None:
                    return
                chunk, fos = item
                host = self._unpack_aux_rows(fos)
                drain((chunk, host))
                if collect_aux:
                    feed_aux_chunk(chunk, host, None, None)

        dth = threading.Thread(target=drainer, daemon=True)
        dth.start()

        ci = 0
        while True:
            item = _check_staged(staged.get())
            if item is None:
                break
            payload, n_real, j = item
            win, fe_state = apply_super_shift(j, win, fe_state)
            imgs_sb, aux_sb, B = materialize(payload)
            n_inner = imgs_sb.shape[0] // C
            for k in range(n_inner):
                # Device-side chunk slice (no host traffic).
                imgs = jax.lax.slice_in_dim(imgs_sb, k * C, (k + 1) * C)
                aux = jax.lax.slice_in_dim(aux_sb, k * C, (k + 1) * C)
                fe_state, win, lmk, fos = self._chunk_step(
                    fe_state, win, lmk, imgs, aux, B, minimal=minimal
                )
                try:
                    jax.tree.map(lambda x: x.copy_to_host_async(), fos)
                except Exception:
                    pass
                drain_q.put((chunks[ci], fos))
                ci += 1
                if verbose and ci % 8 == 0:
                    print(f"chunk {ci}/{len(chunks)}")
        drain_q.put(None)
        dth.join()
        self.lcd_result = lcd_module.finish() if lcd_module else None
        self._last_win, self._last_lmk = win, lmk
        self._write_final_logs(out)
        return out

    # ------------------------------------------------------------------
    def _bootstrap_state(self, provider: EurocDataProvider, stamp_ns: int, first_imu):
        """Initial VioNavState: ground truth if available (reference
        autoInitialize=0 default) else IMU attitude (InitializationFromImu,
        src/initial/InitializationFromImu.cpp)."""
        if provider.ground_truth is not None and not self.params.backend.auto_initialize:
            gt = provider.ground_truth.state_at(stamp_ns)
            R = np.asarray(
                geo.quat_to_rot(jnp.asarray(gt["quat_wxyz"], jnp.float32))
            )
            return (
                NavState(
                    rot=jnp.asarray(R),
                    pos=jnp.asarray(gt["position"], jnp.float32),
                    vel=jnp.asarray(gt["velocity"], jnp.float32),
                ),
                jnp.asarray(
                    np.concatenate([gt["accel_bias"], gt["gyro_bias"]]),
                    jnp.float32,
                ),
            )
        # IMU attitude init: mean accel ~ -gravity in body frame.
        if first_imu is not None:
            acc = np.asarray(first_imu.acc)[np.asarray(first_imu.mask)]
        else:
            # First frame carries no block; average the earliest samples
            # (InitializationFromImu averages an initial window).
            acc = provider.imu_sync.acc[:50]
        g_body = acc.mean(0)
        g_body = g_body / np.linalg.norm(g_body)
        g_world = -np.asarray(self.params.imu.n_gravity)
        g_world = g_world / np.linalg.norm(g_world)
        # Rotation taking body gravity direction to world gravity direction.
        v = np.cross(g_body, g_world)
        c = float(np.dot(g_body, g_world))
        s = np.linalg.norm(v)
        if s < 1e-8:
            R = np.eye(3)
        else:
            axis = v / s
            R = np.asarray(
                geo.so3_exp(jnp.asarray(axis * np.arctan2(s, c), jnp.float32))
            )
        return (
            NavState(
                rot=jnp.asarray(R, jnp.float32),
                pos=jnp.zeros(3),
                vel=jnp.zeros(3),
            ),
            jnp.zeros(6),
        )

    # ------------------------------------------------------------------
    def run(self, provider: EurocDataProvider, verbose: bool = False) -> PipelineOutput:
        out = PipelineOutput()
        self.backend_healthy = True
        self._consecutive_recoveries = 0
        K = self.backend_cfg.nr_states
        L = self.backend_cfg.max_landmarks
        win = sm.Window.empty(K)
        lmk = sm.LandmarkTable.empty(L, K)
        fe_state = None
        t0_ns = None
        pending_outs = []  # (stamp_ns, frame_out) futures, drained at end
        from kimera_vio_tpu.config import flags as _flags

        log_fe_imgs = bool(_flags.get_flag("log_frontend_images"))
        self._prev_kf_ids = None
        initializer = None
        if (
            self.params.backend.auto_initialize == 2
            and not self.frontend_cfg.mono
        ):
            from kimera_vio_tpu.initial.initializer import OnlineInitializer

            initializer = "pending"  # built after bootstrap (needs R0)
        # Fine time alignment phase (reference VisionImuFrontend.cpp:50-83 +
        # the imu_time_shift_update_callback_ feedback into the provider,
        # StereoImuPipeline.cpp:91-94).
        aligner = None
        self.time_shift_estimate_s = None
        if self._do_time_align:
            from kimera_vio_tpu.initial.time_alignment import (
                CrossCorrTimeAligner,
            )

            aligner = CrossCorrTimeAligner(
                window_size_s=self.params.imu.time_alignment_window_size_s,
                variance_threshold_scaling=(
                    self.params.imu.time_alignment_variance_threshold_scaling
                ),
            )

        aligner_imu_since_kf = [0]

        def feed_aligner(packet, frame_out, stamp_ns):
            """Returns True when an offset estimate landed (caller resets
            the estimator, like the reference's post-alignment Bootstrap)."""
            blk = packet["imu"]
            gyr = np.asarray(blk.gyr)
            dts = np.asarray(blk.dt)
            msk = np.asarray(blk.mask)
            # n_imu must span the whole inter-keyframe interval: the visual
            # rotation is accumulated since the last keyframe, so distribute
            # it over every IMU sample seen since then (reference
            # CrossCorrTimeAligner interpolates vision onto IMU rate).
            aligner_imu_since_kf[0] += int(msk.sum())
            for i in range(len(dts)):
                if msk[i]:
                    aligner.add_imu(stamp_ns, gyr[i], float(dts[i]))
            if bool(frame_out["is_keyframe"]):
                n_imu = max(aligner_imu_since_kf[0], 1)
                aligner_imu_since_kf[0] = 0
                aligner.add_frame_rotation(
                    stamp_ns, float(frame_out["vis_rot_angle"]), n_imu
                )
                est = aligner.attempt_estimation()
                if est is not None:
                    self.time_shift_estimate_s = est
                    if hasattr(provider, "imu_time_shift_ns"):
                        provider.imu_time_shift_ns = int(est * 1e9)
                    return True
            return False
        # Keyframe-paced aux modules (reference Mesher/Lcd/Visualizer
        # modules): fed from a lagged drain so async dispatch stays deep.
        # External odometry source: a duck-typed provider may expose an
        # OdometryBuffer as `.odometry` (the reference registers odometry
        # callbacks on the DataProviderInterface).
        odom_buf = getattr(provider, "odometry", None)
        from kimera_vio_tpu.config import flags as _flags

        self._gt_to_log = (
            provider.ground_truth
            if _flags.get_flag("log_euroc_gt_data")
            and getattr(provider, "ground_truth", None) is not None
            else None
        )
        mesher, lcd_module = self._setup_aux_modules()
        visualizer = display = None
        if self.enable_visualizer:
            from kimera_vio_tpu.visualizer.visualizer import (
                FileDisplay,
                Visualizer3D,
            )

            visualizer = Visualizer3D()
            display = FileDisplay(
                os.path.join(self.output_path, "viz")
                if self.output_path
                else "/tmp/viz_out"
            )
        aux_lag = 8
        aux_queue = []  # (stamp_ns, frame_out, left, right)

        def drain_out(stamp_ns, fo):
            if self.frontend_logger:
                self.frontend_logger.log(
                    stamp_ns,
                    bool(fo["is_keyframe"]),
                    int(fo["n_tracked"]),
                    float(fo["median_disparity"]),
                    int(fo["n_mono_inliers"]),
                    int(fo["n_stereo_inliers"]),
                    0.0,
                )
            if bool(fo["is_keyframe"]):
                out.n_keyframes += 1
                self._record_out(out, stamp_ns, fo)
                self._note_backend_health(int(fo.get("n_recovered", 0)))
                if self.logger:
                    self.logger.log_timing(stamp_ns, 0.0)

        def feed_aux(stamp_ns, fo, left, right):
            nonlocal win
            win = self._feed_aux_kf(
                stamp_ns, fo, left, right, win, lmk,
                mesher, lcd_module, visualizer, display,
            )

        def load(packet):
            l = provider.load_image(packet["left_path"])
            r = (
                provider.load_image(packet["right_path"])
                if "right_path" in packet
                else None
            )
            if r is not None and r.shape == l.shape and r.dtype == l.dtype:
                # One stacked transfer per frame (per-transfer latency on
                # the TPU tunnel dominates; uint8 keeps it 4x smaller).
                pair = jnp.asarray(np.stack([l, r]))
                return packet, pair[0], pair[1]
            left = jnp.asarray(l)
            right = jnp.asarray(r) if r is not None else left
            return packet, left, right

        if self.parallel_run:
            # Dataprovider thread: decode images ahead of the device
            # (reference Pipeline.cpp:318 bounded-queue backpressure).
            from kimera_vio_tpu.utils.prefetch import PrefetchIterator

            stream = PrefetchIterator(provider.frames(), load, depth=4)
        else:
            stream = (load(p) for p in provider.frames())

        for packet, left, right in stream:
            stamp_ns = packet["stamp_ns"]
            if t0_ns is None:
                t0_ns = stamp_ns
            stamp_s = (stamp_ns - t0_ns) * 1e-9
            if fe_state is not None:
                # Long-mission f32 stamp rebase (see __init__). Cannot
                # trigger during online initialization / time alignment
                # (those finish within the first margin seconds).
                _d = self._rebase_delta_s(stamp_s)
                if _d > 0.0:
                    t0_ns += int(round(_d * 1e9))
                    stamp_s = (stamp_ns - t0_ns) * 1e-9
                    win, fe_state = self._apply_rebase(_d, win, fe_state)

            if fe_state is None:
                tic = time.perf_counter()
                fe_state, meas0 = self.frontend.init_state(left, right, stamp_s)
                nav0, bias0 = self._bootstrap_state(
                    provider, stamp_ns, packet["imu"]
                )
                fe_state = fe_state.replace(
                    imu_bias=ImuBias(accel=bias0[0:3], gyro=bias0[3:6])
                )
                win = sm.bootstrap(
                    cfg=self.backend_cfg, win=win, nav=nav0, bias=bias0,
                    stamp=jnp.float32(stamp_s),
                    # Collection phase of autoInitialize: 2 — velocity is
                    # a zero GUESS until the alignment solves for it;
                    # loose prior (see sm.bootstrap docstring).
                    vel_sigma=1.0 if initializer is not None else None,
                )
                if initializer == "pending":
                    from kimera_vio_tpu.initial.initializer import (
                        OnlineInitializer,
                    )

                    initializer = OnlineInitializer(
                        self.params.imu.n_gravity, np.asarray(nav0.rot)
                    )
                lmk = sm.update_landmarks(
                    lmk, meas0.ids, meas0.uvs, meas0.mask, jnp.int32(0)
                )
                self._record(out, stamp_ns, win, slot=0)
                out.n_keyframes += 1
                out.n_frames += 1
                last_kf_state = None
                self.stats.add("bootstrap [ms]", (time.perf_counter() - tic) * 1e3)
                continue

            if packet["imu"] is None:
                continue
            imu_block = jax.tree.map(jnp.asarray, packet["imu"])

            tic = time.perf_counter()
            if odom_buf is not None:
                # External-odometry nearest state for this frame; the
                # backend forms the keyframe-relative between factor
                # in-graph (ThreadsafeOdometryBuffer::getNearest ->
                # VioBackend.cpp:402-420).
                near = odom_buf.get_nearest(stamp_ns, tolerance_ns=10**8)
                if near is None:
                    ext = (jnp.eye(3), jnp.zeros(3), jnp.bool_(False))
                else:
                    ext = (
                        jnp.asarray(near["R"], jnp.float32),
                        jnp.asarray(near["t"], jnp.float32),
                        jnp.bool_(True),
                    )
                fe_state, win, lmk, frame_out = self._fused_step(
                    fe_state, win, lmk, left, right, imu_block,
                    jnp.float32(stamp_s), ext,
                )
            else:
                fe_state, win, lmk, frame_out = self._fused_step(
                    fe_state, win, lmk, left, right, imu_block,
                    jnp.float32(stamp_s),
                )
            if not self.parallel_run:
                # Sequential determinism anchor: block every frame
                # (reference parallel_run=0, Pipeline.cpp:197-215).
                jax.block_until_ready(frame_out["pos"])
            step_ms = (time.perf_counter() - tic) * 1e3
            self.stats.add("vio_step [ms]", step_ms)
            if not self.parallel_run:
                # Frame-rate vs keyframe-rate attribution (the reference's
                # "VioFrontend Frame Rate [ms]" / "Keyframe Rate [ms]"
                # table rows, README.md:211-250). Sequential mode only:
                # reading the keyframe flag forces a device sync.
                self.stats.add(
                    "VioFrontend Keyframe Rate [ms]"
                    if bool(frame_out["is_keyframe"])
                    else "VioFrontend Frame Rate [ms]",
                    step_ms,
                )
            out.n_frames += 1
            if aligner is not None:
                if feed_aligner(packet, frame_out, stamp_ns):
                    # Offset found: apply to the provider and restart the
                    # estimator from scratch (reference transitions
                    # TimeAlignment -> Bootstrap).
                    aligner = None
                    fe_state = None
                    win = sm.Window.empty(K)
                    lmk = sm.LandmarkTable.empty(L, K)
                    pending_outs.clear()
                    out = PipelineOutput()
                    continue
            # Online initialization window (autoInitialize: 2): feed the
            # collector at keyframes; when full, solve the visual-inertial
            # alignment and re-bootstrap the estimator with the corrected
            # attitude/velocity/gyro-bias (InitializationBackend::
            # bundleAdjustmentAndGravityAlignment analog).
            if initializer not in (None, "pending") and not initializer.done:
                if bool(frame_out["is_keyframe"]):
                    fo_np = {
                        k: np.asarray(v)
                        for k, v in frame_out.items()
                        if k.startswith("init_")
                    }
                    if initializer.add_keyframe(fo_np, stamp_s):
                        sol = initializer.solve()
                        if not sol.get("ok", True):
                            # Post-bias-correction gyro residual above the
                            # gyroscope_residuals gflag: reject this init
                            # window and re-collect, anchored at the
                            # current attitude estimate (reference
                            # OnlineGravityAlignment returns false and the
                            # initialization is retried).
                            from kimera_vio_tpu.initial.initializer import (
                                OnlineInitializer,
                            )

                            self.stats.add(
                                "init window rejected [resid rad]",
                                sol["gyro_residual"],
                            )
                            initializer = OnlineInitializer(
                                self.params.imu.n_gravity,
                                initializer.R_chain[-1],
                            )
                        else:
                            nav = NavState(
                                rot=jnp.asarray(sol["R0"]),
                                pos=jnp.asarray(sol["pos0"]),
                                vel=jnp.asarray(sol["vel"]),
                            )
                            bias0 = jnp.concatenate(
                                [jnp.zeros(3), jnp.asarray(sol["gyro_bias"])]
                            )
                            win = sm.Window.empty(K)
                            lmk = sm.LandmarkTable.empty(L, K)
                            win = sm.bootstrap(
                                cfg=self.backend_cfg, win=win, nav=nav,
                                bias=bias0, stamp=jnp.float32(stamp_s),
                            )
                            fe_state = fe_state.replace(
                                imu_bias=ImuBias(
                                    accel=bias0[0:3], gyro=bias0[3:6]
                                ),
                                pim=imu.Pim.zero(
                                    ImuBias(accel=bias0[0:3], gyro=bias0[3:6])
                                ),
                            )
                            # The reference publishes NO backend states
                            # until initialization succeeds (its backend
                            # only starts after the alignment); states
                            # estimated during the collection window used
                            # a crude zero-velocity bootstrap and are
                            # discarded — the published trajectory starts
                            # at the aligned state (same restart shape as
                            # the time-aligner path above).
                            pending_outs.clear()
                            out = PipelineOutput()
                            self._record(out, stamp_ns, win, slot=0)
                            out.n_keyframes += 1
                            out.n_frames += 1
                            # Drop this frame's pre-alignment outputs
                            # (same continue as the aligner restart).
                            continue
            pending_outs.append((stamp_ns, frame_out))
            if log_fe_imgs and bool(frame_out["is_keyframe"]):
                self._log_frontend_img(
                    stamp_ns, frame_out["kp_uv"], frame_out["kp_ids"],
                    frame_out["kp_mask"], left,
                )
            # Incremental drain (a lag behind the dispatch horizon) keeps
            # host+device memory bounded on long sequences instead of
            # retaining every frame's outputs until the end.
            if len(pending_outs) > aux_lag * 2:
                drain_out(*pending_outs.pop(0))
            if mesher or lcd_module or visualizer:
                aux_queue.append((stamp_ns, frame_out, left, right))
                if len(aux_queue) > aux_lag:
                    feed_aux(*aux_queue.pop(0))

            if verbose and out.n_frames % 50 == 0:
                print(f"frame {out.n_frames} pos {np.asarray(frame_out['pos'])}")
            if not self.backend_healthy:
                # Graceful stop on persistent backend failure
                # (Pipeline.cpp:253-269).
                break

        # Drain remaining aux work, then record the keyframe trajectory.
        for item in aux_queue:
            feed_aux(*item)
        self.lcd_result = lcd_module.finish() if lcd_module else None
        for stamp_ns, fo in pending_outs:
            drain_out(stamp_ns, fo)
        self._last_win, self._last_lmk = win, lmk
        self._write_final_logs(out)
        if verbose:
            print(self.stats.print_table())
        return out

    def _write_final_logs(self, out):
        """Close per-run CSVs; write the PGO-optimized trajectory + loop
        list (reference LoopClosureDetectorLogger) and overall timing."""
        if self.logger:
            self.logger.close()
            self.logger = None
        if self.frontend_logger:
            self.frontend_logger.close()
            self.frontend_logger = None
        if self.output_path and getattr(self, "lcd_result", None):
            from kimera_vio_tpu.utils.logger import LcdLogger

            lcd_log = LcdLogger(self.output_path)
            lcd_log.log_pgo_trajectory(
                self.lcd_result["stamps"],
                np.asarray(self.lcd_result["rot"]),
                np.asarray(self.lcd_result["pos"]),
            )
            for lp in self.lcd_result["loops"]:
                lcd_log.log_loop(lp.query_id, lp.match_id)
            lcd_log.close()
        if self.output_path:
            from kimera_vio_tpu.utils.logger import PipelineLogger

            plog = PipelineLogger(self.output_path)
            wall = self.stats.get("vio_step [ms]").total / 1e3
            plog.log(out.n_frames, max(wall, 1e-9), out.n_keyframes)
            plog.close()
        if self.output_path and getattr(self, "_gt_to_log", None) is not None:
            # EurocGtLogger (reference Logger.cpp:66-85): traj_gt.csv in
            # the same schema, behind --log_euroc_gt_data.
            gt = self._gt_to_log
            with open(
                os.path.join(self.output_path, "traj_gt.csv"), "w"
            ) as f:
                f.write(
                    "#timestamp,x,y,z,qw,qx,qy,qz,vx,vy,vz,bgx,bgy,bgz,"
                    "bax,bay,baz\n"
                )
                for i in range(len(gt.stamps_ns)):
                    row = [
                        int(gt.stamps_ns[i]), *gt.positions[i],
                        *gt.quats_wxyz[i], *gt.velocities[i],
                        *gt.gyro_bias[i], *gt.accel_bias[i],
                    ]
                    f.write(
                        ",".join(
                            f"{x:.9g}" if j else str(x)
                            for j, x in enumerate(row)
                        )
                        + "\n"
                    )

    # ------------------------------------------------------------------
    @staticmethod
    def _np_rot_to_quat(R):
        """Host-side rotation->quaternion (wxyz). Numpy only: recording a
        keyframe must not dispatch device work (a device round trip costs
        ~30 ms on the TPU tunnel)."""
        R = np.asarray(R, np.float64)
        t = np.trace(R)
        if t > 0:
            s = np.sqrt(t + 1.0) * 2
            q = np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                          (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
        else:
            i = int(np.argmax(np.diag(R)))
            j, k = (i + 1) % 3, (i + 2) % 3
            s = np.sqrt(max(1.0 + R[i, i] - R[j, j] - R[k, k], 1e-12)) * 2
            q = np.empty(4)
            q[0] = (R[k, j] - R[j, k]) / s
            q[1 + i] = 0.25 * s
            q[1 + j] = (R[j, i] + R[i, j]) / s
            q[1 + k] = (R[k, i] + R[i, k]) / s
        return (q / np.linalg.norm(q)).astype(np.float32)

    def _record(self, out, stamp_ns, win, slot):
        R = np.asarray(win.rot[slot])
        self._record_raw(
            out, stamp_ns, np.asarray(win.pos[slot]), self._np_rot_to_quat(R),
            np.asarray(win.vel[slot]), np.asarray(win.bias[slot]),
        )

    def _record_out(self, out, stamp_ns, bout):
        R = np.asarray(bout["rot"])
        self._record_raw(
            out, stamp_ns, np.asarray(bout["pos"]), self._np_rot_to_quat(R),
            np.asarray(bout["vel"]), np.asarray(bout["bias"]),
        )

    def _record_raw(self, out, stamp_ns, pos, quat, vel, bias):
        out.stamps_ns.append(stamp_ns)
        out.positions.append(pos)
        out.quats_wxyz.append(quat)
        out.velocities.append(vel)
        out.biases.append(bias)
        if self.logger:
            self.logger.log_state(
                stamp_ns, pos, quat, vel, bias[3:6], bias[0:3]
            )
