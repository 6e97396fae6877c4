"""Online initialization driver: visual-inertial alignment at mission start.

Rebuild of the reference's dormant online-init path — `InitializationBackend`
(src/initial/InitializationBackend.cpp:46 `bundleAdjustmentAndGravityAlignment`)
feeding `OnlineGravityAlignment` (src/initial/OnlineGravityAlignment.cpp):
selected by `autoInitialize: 2` in BackendParams.

Design difference, TPU-first: the reference runs a mono visual-only bundle
adjustment over the init window to get up-to-scale poses, then solves for
scale/velocities/gravity/gyro-bias. This framework has METRIC visual
odometry from the stereo tracker (3-pt Arun rotation+translation, or 1-pt
voting translation with gyro rotation), so the init window collects the
tracker's keyframe-relative poses + the keyframe PIMs directly and runs the
same linear alignment (initial/gravity_alignment.py) — no extra BA needed.

Flow (host-paced, init window only):
  1. Pipeline bootstraps with the crude IMU-attitude guess and runs
     normally, while this collector gathers per-keyframe:
     visual relative pose (body frame), PIM (delta_R/v/p, dR/dbg), dt.
  2. After `n_kf` keyframes: estimate gyro bias, then per-keyframe
     velocities + the gravity direction in the crude world frame.
  3. The pipeline re-bootstraps: attitude corrected so gravity matches
     `n_gravity`, velocity from the alignment, gyro bias installed.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from kimera_vio_tpu.initial.gravity_alignment import (
    align_velocities_and_gravity,
    estimate_gyro_bias,
)


class OnlineInitializer:
    def __init__(self, n_gravity, R0: np.ndarray, n_kf: int | None = None):
        from kimera_vio_tpu.config import flags as _flags

        self.n_gravity = np.asarray(n_gravity, np.float64)
        # Window size from the gflags tier (reference num_frames_vio_init).
        self.n_kf = (
            int(_flags.get_flag("num_frames_vio_init"))
            if n_kf is None
            else n_kf
        )
        self._refine_iters = int(
            _flags.get_flag("num_iterations_gravity_refinement")
        )
        self._max_gyro_residual = float(_flags.get_flag("gyroscope_residuals"))
        self.done = False
        # Visual pose chain in the crude world frame, seeded at the
        # bootstrap attitude.
        self.R_chain = [np.asarray(R0, np.float64)]
        self.p_chain = [np.zeros(3)]
        self.rel = []  # dicts per keyframe interval

    def add_keyframe(self, fo: dict, stamp_s: float) -> bool:
        """fo: numpy-fetched frame_out with init extras. Returns True when
        the window is full (call `solve`)."""
        if self.done:
            return False
        if not self.rel:
            self._last_stamp = stamp_s
            self.rel.append(None)  # first keyframe anchors the chain
            return False
        R_rel = np.asarray(fo["init_R_rel_body"], np.float64)
        t_rel = np.asarray(fo["init_t_rel_body"], np.float64)
        self.R_chain.append(self.R_chain[-1] @ R_rel)
        self.p_chain.append(self.p_chain[-1] + self.R_chain[-2] @ t_rel)
        self.rel.append(
            dict(
                dt=stamp_s - self._last_stamp,
                delta_R=np.asarray(fo["init_pim_delta_R"], np.float64),
                delta_v=np.asarray(fo["init_pim_delta_v"], np.float64),
                delta_p=np.asarray(fo["init_pim_delta_p"], np.float64),
                dR_dbg=np.asarray(fo["init_pim_dR_dbg"], np.float64),
            )
        )
        self._last_stamp = stamp_s
        return len(self.R_chain) >= self.n_kf

    def solve(self) -> dict:
        """Returns {"R0": corrected attitude of the LAST keyframe,
        "vel": its world velocity, "gyro_bias": (3,)}."""
        rel = self.rel[1:]
        F = len(self.R_chain)
        R_vis = jnp.asarray(np.stack(self.R_chain), jnp.float32)
        p_vis = jnp.asarray(np.stack(self.p_chain), jnp.float32)
        mask = jnp.ones(F - 1, bool)
        pim_dR = jnp.asarray(np.stack([r["delta_R"] for r in rel]), jnp.float32)
        dR_dbg = jnp.asarray(np.stack([r["dR_dbg"] for r in rel]), jnp.float32)
        bg = estimate_gyro_bias(R_vis, pim_dR, dR_dbg, mask)
        # Post-correction rotation residual gate (reference
        # OnlineGravityAlignment gyroscope_residuals gflag: reject the
        # window when the bias-corrected preintegrated rotations still
        # disagree with vision — bad tracking or non-static bias).
        from kimera_vio_tpu.common import geometry as _geo

        R_rel = jnp.einsum("fji,fjk->fik", R_vis[:-1], R_vis[1:])
        err = _geo.so3_log(
            jnp.einsum("fji,fjk->fik", pim_dR, R_rel)
        ) - jnp.einsum("fij,j->fi", dR_dbg, bg)
        gyro_residual = float(
            jnp.linalg.norm(err, axis=-1).mean()
        )
        ok = gyro_residual <= self._max_gyro_residual
        # First-order bias correction of the PIM deltas before alignment
        # (the reference re-integrates; dR_dbg-based correction matches to
        # first order over these short intervals).
        vels, gravity = align_velocities_and_gravity(
            R_vis,
            p_vis,
            jnp.asarray(np.array([r["dt"] for r in rel]), jnp.float32),
            jnp.asarray(np.stack([r["delta_v"] for r in rel]), jnp.float32),
            jnp.asarray(np.stack([r["delta_p"] for r in rel]), jnp.float32),
            mask,
            gravity_norm=float(np.linalg.norm(self.n_gravity)),
            refine_iters=self._refine_iters,
        )
        g_est = np.asarray(gravity, np.float64)
        g_tgt = self.n_gravity
        # Rotation taking estimated gravity (crude world) -> n_gravity.
        a = g_est / np.linalg.norm(g_est)
        b = g_tgt / np.linalg.norm(g_tgt)
        v = np.cross(a, b)
        c = float(a @ b)
        s = np.linalg.norm(v)
        if s < 1e-9:
            if c > 0:
                R_fix = np.eye(3)
            else:
                # Antiparallel: rotate pi about any axis perpendicular to a
                # (a proper rotation; -I would be a reflection, det=-1).
                perp = np.cross(a, [1.0, 0.0, 0.0])
                if np.linalg.norm(perp) < 1e-6:
                    perp = np.cross(a, [0.0, 1.0, 0.0])
                perp /= np.linalg.norm(perp)
                R_fix = 2.0 * np.outer(perp, perp) - np.eye(3)
        else:
            vx = np.array(
                [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]]
            )
            R_fix = np.eye(3) + vx + vx @ vx * ((1 - c) / (s * s))
        self.done = True
        return {
            "R0": (R_fix @ self.R_chain[-1]).astype(np.float32),
            "pos0": (R_fix @ self.p_chain[-1]).astype(np.float32),
            "vel": (R_fix @ np.asarray(vels[-1], np.float64)).astype(
                np.float32
            ),
            "gyro_bias": np.asarray(bg, np.float32),
            "gravity_crude_frame": g_est.astype(np.float32),
            "ok": bool(ok),
            "gyro_residual": gyro_residual,
        }
