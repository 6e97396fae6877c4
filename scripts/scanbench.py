#!/usr/bin/env python
"""Scan-chained op microbenchmark for the axon TPU tunnel.

Per-dispatch overhead on the tunnel (~1-5 ms, noisy) swamps small-op
timings. This harness times ops INSIDE one compiled program: a lax.scan
chains `reps` executions of the op, feeding a scalar digest of each output
back into the next input so XLA cannot hoist or elide any iteration. One
dispatch, one sync; per-rep time = (t_scan(reps) - t_scan(1)) / (reps - 1).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np


def scanbench(name, op, args, reps=32, n_outer=3):
    """op(*args) -> pytree. Times per-rep cost via scan chaining."""

    def chained(reps_):
        def body(carry, _):
            eps, args_ = carry
            # eps is ~1e-30 * sum(out): numerically a no-op on the inputs
            # but a real loop-carried dependency, so the op body cannot be
            # hoisted out of the scan.
            out = op(*jax.tree.map(lambda a: a + eps if jnp.issubdtype(jnp.asarray(a).dtype, jnp.inexact) else a, args_))
            # Digest feeds the next iteration's perturbation: a true data
            # dependency chain that costs nothing but defeats CSE/hoisting.
            leaves = [jnp.asarray(x) for x in jax.tree.leaves(out)]
            dig = jnp.float32(0.0)
            for x in leaves:
                if jnp.issubdtype(x.dtype, jnp.inexact):
                    dig = dig + jnp.sum(x).astype(jnp.float32) * 1e-30
                else:
                    dig = dig + jnp.sum(x).astype(jnp.float32) * 1e-30
            return (dig, args_), None

        def run(args_):
            (dig, _), _ = jax.lax.scan(
                body, (jnp.float32(0.0), args_), None, length=reps_
            )
            return dig

        return jax.jit(run)

    f1 = chained(1)
    fN = chained(reps)
    d1 = f1(args); jax.block_until_ready(d1)
    dN = fN(args); jax.block_until_ready(dN)
    best = np.inf
    for _ in range(n_outer):
        t0 = time.perf_counter(); jax.block_until_ready(f1(args)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); jax.block_until_ready(fN(args)); tN = time.perf_counter() - t0
        best = min(best, (tN - t1) / (reps - 1))
    print(f"{name:46s} {best*1e3:8.3f} ms", flush=True)
    return best


def main():
    from kimera_vio_tpu.config.params import VioParams
    from kimera_vio_tpu.dataprovider.euroc import EurocDataProvider
    from kimera_vio_tpu.pipeline.stereo_pipeline import StereoImuPipeline
    from kimera_vio_tpu.ops import optical_flow as of
    from kimera_vio_tpu.frontend import imu_frontend as imu
    from kimera_vio_tpu.common.types import ImuBias

    params = VioParams.from_folder("/root/reference/params/Euroc")
    params.max_features = 256
    params.max_landmarks = 384
    provider = EurocDataProvider("/root/reference/tests/data/MicroEurocDataset")
    pipe = StereoImuPipeline(params, parallel_run=True)
    fe = pipe.frontend
    cfg = fe.cfg
    packets = list(provider.frames())
    limg = jnp.asarray(provider.load_image(packets[0]["left_path"])).astype(jnp.float32)
    rimg = jnp.asarray(provider.load_image(packets[0]["right_path"])).astype(jnp.float32)
    blk = jax.tree.map(jnp.asarray, packets[1]["imu"])

    print(f"device: {jax.devices()[0]}", flush=True)

    scanbench("build_pyramid (5 lvl)", lambda x: of.build_pyramid(x, cfg.klt_max_level), (limg,))
    scanbench("grads all levels", lambda x: [of._grad(p) for p in of.build_pyramid(x, cfg.klt_max_level)], (limg,))

    fe_state, meas0 = fe.init_state(limg, rimg, 0.0)
    jax.block_until_ready(fe_state.features.uv)
    pyr = of.build_pyramid(limg, cfg.klt_max_level)
    feats = fe_state.features

    scanbench(
        "LK cached (matmul)",
        lambda uv: of.klt_track_cached(
            fe_state.lkf_templates, list(pyr), uv, feats.mask,
            win=cfg.klt_win, max_iter=cfg.klt_max_iter, eps=cfg.klt_eps,
        ),
        (feats.uv,),
    )
    scanbench(
        "build_lk_templates",
        lambda uv: of.build_lk_templates(list(pyr), uv, feats.mask, win=cfg.klt_win),
        (feats.uv,),
    )
    scanbench("PIM preintegrate", lambda a: imu.preintegrate(fe.pim_params, blk, ImuBias(accel=a[:3], gyro=a[3:])), (jnp.zeros(6),))
    scanbench("rect+versors", lambda uv: fe._rect_and_versors(uv), (feats.uv,))
    scanbench(
        "flow predict",
        lambda uv: of.predict_flow_rotational(
            uv, feats.mask, jnp.eye(3), fe.K_raw, fe.K_raw_inv,
            fe.left.width, fe.left.height,
        ),
        (feats.uv,),
    )
    scanbench("nanmedian policy", lambda d: jnp.nan_to_num(jnp.nanmedian(jnp.where(feats.mask, d, jnp.nan))), (jnp.abs(feats.uv[:, 0]),))

    from kimera_vio_tpu.ops import corner_detection as det
    scanbench(
        "detect_features",
        lambda img: det.detect_features(
            img, feats.uv, feats.mask, cfg.max_features,
            quality_level=cfg.quality_level, min_distance=cfg.min_distance,
            nr_horizontal_bins=cfg.nr_horizontal_bins,
            nr_vertical_bins=cfg.nr_vertical_bins, do_subpixel=cfg.do_subpixel,
        ),
        (limg,), reps=16,
    )
    from kimera_vio_tpu.ops.stereo_matching import match_stereo
    lrect = fe._remap_left(limg); rrect = fe._remap_right(rimg)
    jax.block_until_ready((lrect, rrect))
    scanbench(
        "match_stereo",
        lambda l, r: match_stereo(
            l, r, feats.uv_rect, feats.mask, fx=fe.stereo.fx,
            baseline=fe.stereo.baseline, templ_cols=cfg.templ_cols,
            templ_rows=cfg.templ_rows, max_disparity=cfg.max_disparity,
            min_point_dist=cfg.min_point_dist, max_point_dist=cfg.max_point_dist,
            tolerance=cfg.templ_tolerance,
        ),
        (lrect, rrect), reps=16,
    )
    scanbench("remap left (rectify)", lambda x: fe._remap_left(x), (limg,))

    from kimera_vio_tpu.ops import ransac
    key = jax.random.PRNGKey(0)
    scanbench(
        "ransac 2pt mono",
        lambda f1: ransac.ransac_2pt_mono(
            f1, feats.versors, feats.mask, jnp.eye(3), key,
            n_hyp=cfg.n_hyp_mono, threshold=cfg.ransac_threshold_mono,
        ),
        (feats.versors,), reps=16,
    )
    import kimera_vio_tpu.backend.smoother as smod
    K, L = pipe.backend_cfg.nr_states, pipe.backend_cfg.max_landmarks
    win = smod.Window.empty(K)
    lmk = smod.LandmarkTable.empty(L, K)
    nav0, bias0 = pipe._bootstrap_state(provider, packets[0]["stamp_ns"], None)
    win = smod.bootstrap(cfg=pipe.backend_cfg, win=win, nav=nav0, bias=bias0, stamp=jnp.float32(0.0))
    lmk = smod.update_landmarks(lmk, meas0.ids, meas0.uvs, meas0.mask, jnp.int32(0))
    pim = imu.preintegrate(fe.pim_params, blk, ImuBias.zero())
    scanbench(
        "backend_step",
        lambda st: smod.backend_step(
            pipe.backend_cfg, win, lmk, pim=pim, stamp=st,
            meas_ids=meas0.ids, meas_uvd=meas0.uvs, meas_mask=meas0.mask,
            status=jnp.int32(0),
        )[2],
        (jnp.float32(0.2),), reps=16,
    )


if __name__ == "__main__":
    main()
