"""FleetVio: batched multi-stream VIO over a device mesh.

Single-stream VIO saturates a fraction of one TPU chip; the production
scale-out axis is SERVING MANY ROBOTS AT ONCE. FleetVio runs B
independent camera+IMU streams through the same fused per-frame VIO
program (`StereoImuPipeline._fused_step_impl`: frontend + on-device
keyframe-gated smoother), vmapped over the stream axis and sharded over
a `jax.sharding.Mesh`:

  * `data` axis  — streams. Each chip owns B/data streams end to end;
    no cross-stream communication exists, so scaling is embarrassing
    and rides ICI only for the optional model axis below.
  * `model` axis — the per-stream landmark/observation tables split
    along their landmark dimension. Smart-factor linearization is
    landmark-parallel; XLA inserts the psum over the shard axis when
    the Gauss-Newton system contracts over landmarks.

The reference has no analog (it is a single-robot, single-process
pipeline; SURVEY.md section 2.13): this is the TPU-native layer that
turns the rebuilt pipeline into a serving framework. The driver's
`__graft_entry__.dryrun_multichip` exercises the same sharding recipe;
FleetVio is the user-facing API, tested on a virtual 8-device CPU mesh
(tests/test_fleet.py).

All streams share one camera rig + parameter set (a fleet of identical
robots); heterogeneous rigs would shard by pipeline instance instead.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kimera_vio_tpu.backend import smoother as sm
from kimera_vio_tpu.common.types import ImuBias, ImuBlock, NavState
from kimera_vio_tpu.config.params import VioParams
from kimera_vio_tpu.pipeline.stereo_pipeline import StereoImuPipeline


@dataclass
class FleetState:
    """Batched per-stream state (leading axis = stream)."""

    fe_state: Any
    win: Any
    lmk: Any


class FleetVio:
    def __init__(
        self,
        params: VioParams,
        n_streams: int,
        mesh: Mesh | None = None,
        model_shards: int = 1,
    ):
        if mesh is None:
            devs = np.array(jax.devices())
            n_dev = devs.size
            model_shards = min(model_shards, n_dev)
            while n_dev % model_shards:
                model_shards -= 1
            mesh = Mesh(
                devs.reshape(n_dev // model_shards, model_shards),
                ("data", "model"),
            )
        self.mesh = mesh
        self.B = n_streams
        data_size = mesh.shape["data"]
        if n_streams % data_size:
            raise ValueError(
                f"n_streams={n_streams} must divide over the data axis "
                f"({data_size} shards)"
            )
        # One pipeline instance supplies the fused per-frame program and
        # all configs; its per-stream state is never used.
        self._pipe = StereoImuPipeline(params, parallel_run=False)
        self._fleet_step = jax.jit(
            jax.vmap(
                lambda s, w, l, li, ri, blk, t: self._pipe._fused_step_impl(
                    s, w, l, li, ri, blk, t
                )
            )
        )

    # -- sharding helpers ------------------------------------------------
    def _shard(self, tree):
        """Stream axis -> data; landmark-sized axis 1 -> model (when it
        divides evenly)."""
        model = self.mesh.shape["model"]

        def put(x):
            x = jnp.asarray(x)
            if (
                model > 1
                and x.ndim >= 2
                and x.shape[1] >= model
                and x.shape[1] % model == 0
            ):
                spec = P("data", "model")
            elif x.ndim >= 1:
                spec = P("data")
            else:
                spec = P()
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        return jax.tree.map(put, tree)

    def _batch(self, x):
        x = jnp.asarray(x)
        return jnp.broadcast_to(x, (self.B,) + x.shape)

    # -- API ---------------------------------------------------------------
    def init(self, lefts, rights, navs: NavState | None = None, biases=None):
        """Bootstrap all streams from their first stereo pair.

        lefts/rights: (B,H,W). navs/biases: batched initial states
        (identity / zeros when omitted — the InitializationFromImu
        attitude seed can be fed per stream by the caller)."""
        pipe = self._pipe
        B = self.B
        if navs is None:
            navs = jax.tree.map(self._batch, NavState.identity())
        if biases is None:
            biases = jnp.zeros((B, 6), jnp.float32)

        def one(left, right, nav, bias):
            fe_state, meas0 = pipe.frontend._init_state_impl(
                jnp.asarray(left), jnp.asarray(right), jnp.float32(0.0),
                pipe.frontend.remap_taps,
            )
            fe_state = fe_state.replace(
                imu_bias=ImuBias(accel=bias[0:3], gyro=bias[3:6])
            )
            win = sm.Window.empty(pipe.backend_cfg.nr_states)
            win = sm.bootstrap(
                cfg=pipe.backend_cfg, win=win, nav=nav, bias=bias,
                stamp=jnp.float32(0.0),
            )
            lmk = sm.LandmarkTable.empty(
                pipe.backend_cfg.max_landmarks, pipe.backend_cfg.nr_states
            )
            lmk = sm.update_landmarks(
                lmk, meas0.ids, meas0.uvs, meas0.mask, jnp.int32(0)
            )
            return fe_state, win, lmk

        fe_state, win, lmk = jax.jit(jax.vmap(one))(
            jnp.asarray(lefts), jnp.asarray(rights), navs, biases
        )
        return FleetState(
            fe_state=self._shard(fe_state),
            win=self._shard(win),
            lmk=self._shard(lmk),
        )

    def step(self, state: FleetState, lefts, rights, imu_blocks: ImuBlock,
             stamps):
        """One fused VIO frame for every stream in ONE device program.

        lefts/rights: (B,H,W); imu_blocks: ImuBlock with (B,n,...) leaves;
        stamps: (B,) seconds. Returns (state, out) with out containing
        batched trajectory fields (is_keyframe, pos, rot, vel, bias, ...)."""
        lefts = self._shard(lefts)
        rights = self._shard(rights)
        imu_blocks = self._shard(imu_blocks)
        stamps = self._shard(jnp.asarray(stamps, jnp.float32))
        with self.mesh:
            fe_state, win, lmk, out = self._fleet_step(
                state.fe_state, state.win, state.lmk, lefts, rights,
                imu_blocks, stamps,
            )
        return FleetState(fe_state=fe_state, win=win, lmk=lmk), out
