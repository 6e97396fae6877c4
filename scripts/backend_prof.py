#!/usr/bin/env python
"""Sub-profile backend_step internals on the TPU (scanbench methodology)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from scanbench import scanbench  # noqa: E402


def main():
    from kimera_vio_tpu.config.params import VioParams
    from kimera_vio_tpu.dataprovider.euroc import EurocDataProvider
    from kimera_vio_tpu.pipeline.stereo_pipeline import StereoImuPipeline
    from kimera_vio_tpu.frontend import imu_frontend as imu
    from kimera_vio_tpu.common.types import ImuBias
    import kimera_vio_tpu.backend.smoother as smod

    params = VioParams.from_folder("/root/reference/params/Euroc")
    params.max_features = 256
    params.max_landmarks = 384
    provider = EurocDataProvider("/root/reference/tests/data/MicroEurocDataset")
    pipe = StereoImuPipeline(params, parallel_run=True)
    fe = pipe.frontend
    packets = list(provider.frames())
    limg = jnp.asarray(provider.load_image(packets[0]["left_path"])).astype(jnp.float32)
    rimg = jnp.asarray(provider.load_image(packets[0]["right_path"])).astype(jnp.float32)
    blk = jax.tree.map(jnp.asarray, packets[1]["imu"])
    fe_state, meas0 = fe.init_state(limg, rimg, 0.0)
    cfg = pipe.backend_cfg
    K, L = cfg.nr_states, cfg.max_landmarks
    print(f"device: {jax.devices()[0]}  K={K} L={L} D={K*smod.S_DOF}", flush=True)

    win = smod.Window.empty(K)
    lmk = smod.LandmarkTable.empty(L, K)
    nav0, bias0 = pipe._bootstrap_state(provider, packets[0]["stamp_ns"], None)
    win = smod.bootstrap(cfg=cfg, win=win, nav=nav0, bias=bias0, stamp=jnp.float32(0.0))
    lmk = smod.update_landmarks(lmk, meas0.ids, meas0.uvs, meas0.mask, jnp.int32(0))
    pim = imu.preintegrate(fe.pim_params, blk, ImuBias.zero())

    # Fill the window to K states so the profile reflects steady state.
    @jax.jit
    def fill(win, lmk):
        def body(carry, stamp):
            w, l = carry
            w, l, _ = smod.backend_step(
                cfg, w, l, pim=pim, stamp=stamp, meas_ids=meas0.ids,
                meas_uvd=meas0.uvs, meas_mask=meas0.mask, status=jnp.int32(0))
            return (w, l), None
        stamps = 0.2 + 0.2 * jnp.arange(K + 1, dtype=jnp.float32)
        (w, l), _ = jax.lax.scan(body, (win, lmk), stamps)
        return w, l

    w2, l2 = fill(win, lmk)
    jax.block_until_ready(w2.pos)

    scanbench("smart_factor_blocks", lambda w: smod._smart_factor_blocks(cfg, w, l2, None), (w2,))
    scanbench("assemble full", lambda w: smod._assemble(cfg, w, l2)[:2], (w2,))

    H, g, pts, ok = smod._assemble(cfg, w2, l2)
    H = jax.block_until_ready(0.5 * (H + H.T))
    D = H.shape[0]

    def chol_solve(H, g):
        d = jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-12))
        dinv = 1.0 / d
        Hs = H * dinv[:, None] * dinv[None, :] + 1e-5 * jnp.eye(D, dtype=H.dtype)
        Lc = jnp.linalg.cholesky(Hs)
        return jax.scipy.linalg.cho_solve((Lc, True), g * dinv) * dinv

    scanbench("cholesky+cho_solve 375", chol_solve, (H, g))
    scanbench("cholesky only 375", lambda A: jnp.linalg.cholesky(A + 1e-5 * jnp.eye(D)), (H,))
    def tri(w):
        R_w_cam = w.rot @ cfg.R_b_cam
        t_w_cam = w.pos + jnp.einsum("kij,j->ki", w.rot, cfg.t_b_cam)
        obs_mask = l2.obs_mask & w.mask[None, :] & (l2.ids >= 0)[:, None]
        return smod.triangulate_stereo_landmarks(
            R_w_cam, t_w_cam, l2.obs_uvd, obs_mask, fx=cfg.fx, fy=cfg.fy,
            cx=cfg.cx, cy=cfg.cy, baseline=cfg.baseline,
            rank_tolerance=cfg.rank_tolerance,
            landmark_distance_threshold=cfg.landmark_distance_threshold,
            outlier_rejection_px=cfg.outlier_rejection_px,
            newest_idx=jnp.maximum(w.n - 1, 0))

    scanbench("triangulate landmarks", tri, (w2,), reps=16)
    scanbench("gn_solve (2 iters)", lambda w: smod._gn_solve(cfg, w, l2)[0].pos, (w2,), reps=16)
    scanbench("marginalize_oldest", lambda w: smod._marginalize_oldest(cfg, w).pos, (w2,))
    scanbench("update_landmarks", lambda ids: smod.update_landmarks(l2, ids, meas0.uvs, meas0.mask, jnp.int32(3)).obs_uvd, (meas0.ids,))


if __name__ == "__main__":
    main()
