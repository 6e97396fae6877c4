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
        self.enable_mesher = enable_mesher
        self.enable_lcd = enable_lcd
        self.enable_visualizer = enable_visualizer
        self.params = params
        self.stereo = self._build_rig(params)
        self.frontend_cfg = self._build_frontend_cfg(params)
        self.pim_params = imu.PimParams.from_params(params.imu)
        self.frontend = StereoFrontend(
            self.frontend_cfg, self.stereo, self.pim_params
        )
        self.backend_cfg = sm.BackendConfig.from_params(
            params.backend, params.imu, self.stereo,
            max_landmarks=params.max_landmarks,
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
        self.logger = BackendLogger(output_path) if output_path else None
        self.frontend_logger = FrontendLogger(output_path) if output_path else None
        self.stats = StatsCollector()

    # Overridable construction hooks (MonoImuPipeline swaps these).
    def _build_rig(self, params):
        return StereoCamera.from_params(params.left_cam, params.right_cam)

    def _build_frontend_cfg(self, params):
        cfg = FrontendConfig.from_params(
            params.frontend, max_features=params.max_features
        )
        # The Pallas LK kernel targets real TPUs (Mosaic); CPU runs use the
        # XLA tracker (interpret-mode pallas would be much slower).
        if jax.devices()[0].platform not in ("cpu",):
            cfg = cfg.replace(use_pallas_lk=True)
        return cfg

    # ------------------------------------------------------------------
    def _fused_step_impl(self, fe_state, win, lmk, left, right, imu_block, stamp):
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

        def do_backend(args):
            win, lmk = args
            return sm.backend_step(
                cfg, win, lmk, pim=fe_out["pim"], stamp=stamp,
                meas_ids=meas.ids, meas_uvd=meas.uvs, meas_mask=meas.mask,
                status=fe_out["status"],
            )

        def skip_backend(args):
            win, lmk = args
            slot = jnp.maximum(win.n - 1, 0)
            bout = {
                "rot": win.rot[slot],
                "pos": win.pos[slot],
                "vel": win.vel[slot],
                "bias": win.bias[slot],
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
        }
        return fe_state, win, lmk, frame_out

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
        K = self.backend_cfg.nr_states
        L = self.backend_cfg.max_landmarks
        win = sm.Window.empty(K)
        lmk = sm.LandmarkTable.empty(L, K)
        fe_state = None
        t0_ns = None
        pending_outs = []  # (stamp_ns, frame_out) futures, drained at end
        # Keyframe-paced aux modules (reference Mesher/Lcd/Visualizer
        # modules): fed from a lagged drain so async dispatch stays deep.
        mesher = lcd_module = visualizer = display = None
        if self.enable_mesher:
            from kimera_vio_tpu.mesher.mesher import Mesher

            mesher = Mesher()
        if self.enable_lcd:
            from kimera_vio_tpu.pipeline.lcd_module import LcdModule

            lcd_module = LcdModule(self.stereo)
        if self.enable_visualizer:
            from kimera_vio_tpu.visualizer.visualizer import (
                FileDisplay,
                Visualizer3D,
            )

            visualizer = Visualizer3D()
            display = FileDisplay(self.logger and "viz_out" or "/tmp/viz_out")
        aux_lag = 8
        aux_queue = []  # (stamp_ns, frame_out, left, right)

        def feed_aux(stamp_ns, fo, left, right):
            if not bool(fo["is_keyframe"]):
                return
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
            if lcd_module is not None:
                from kimera_vio_tpu.frontend.camera import remap_bilinear

                lrect = remap_bilinear(left, self.frontend.map_left)
                rrect = remap_bilinear(right, self.frontend.map_right)
                lcd_module.add_keyframe(lrect, rrect, pose_R, pose_t, stamp_ns)
            if visualizer is not None:
                w = visualizer.spin_once(
                    pose_R, pose_t,
                    np.asarray(fo["lmk_points"]),
                    np.asarray(fo["lmk_valid"]),
                    np.asarray(fo["lmk_ids"]),
                    mesh=mesh,
                )
                display.spin_once(w)

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

            if fe_state is None:
                tic = time.perf_counter()
                fe_state, meas0 = self.frontend.init_state(left, right, stamp_s)
                nav0, bias0 = self._bootstrap_state(
                    provider, stamp_ns, packet["imu"]
                )
                fe_state = fe_state.replace(
                    imu_bias=ImuBias(accel=bias0[0:3], gyro=bias0[3:6])
                )
                win = sm.bootstrap(cfg=self.backend_cfg, win=win, nav=nav0,
                                   bias=bias0, stamp=jnp.float32(stamp_s))
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
            fe_state, win, lmk, frame_out = self._fused_step(
                fe_state, win, lmk, left, right, imu_block, jnp.float32(stamp_s)
            )
            if not self.parallel_run:
                # Sequential determinism anchor: block every frame
                # (reference parallel_run=0, Pipeline.cpp:197-215).
                jax.block_until_ready(frame_out["pos"])
            self.stats.add("vio_step [ms]", (time.perf_counter() - tic) * 1e3)
            out.n_frames += 1
            pending_outs.append((stamp_ns, frame_out))
            if mesher or lcd_module or visualizer:
                aux_queue.append((stamp_ns, frame_out, left, right))
                if len(aux_queue) > aux_lag:
                    feed_aux(*aux_queue.pop(0))

            if verbose and out.n_frames % 50 == 0:
                print(f"frame {out.n_frames} pos {np.asarray(frame_out['pos'])}")

        # Drain remaining aux work, then record the keyframe trajectory.
        for item in aux_queue:
            feed_aux(*item)
        self.lcd_result = lcd_module.finish() if lcd_module else None
        for stamp_ns, fo in pending_outs:
            if bool(fo["is_keyframe"]):
                out.n_keyframes += 1
                self._record_out(out, stamp_ns, fo)
                if self.logger:
                    self.logger.log_timing(stamp_ns, 0.0)
        if self.logger:
            self.logger.close()
        if self.frontend_logger:
            self.frontend_logger.close()
        if verbose:
            print(self.stats.print_table())
        return out

    # ------------------------------------------------------------------
    def _record(self, out, stamp_ns, win, slot):
        q = geo.rot_to_quat(win.rot[slot])
        self._record_raw(
            out, stamp_ns, np.asarray(win.pos[slot]), np.asarray(q),
            np.asarray(win.vel[slot]), np.asarray(win.bias[slot]),
        )

    def _record_out(self, out, stamp_ns, bout):
        q = geo.rot_to_quat(bout["rot"])
        self._record_raw(
            out, stamp_ns, np.asarray(bout["pos"]), np.asarray(q),
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
