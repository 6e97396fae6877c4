#!/usr/bin/env python
"""Profile the fused VIO step's components on the real TPU.

Times each sub-computation with VARYING inputs (the axon tunnel dedups
repeated arrays) and block_until_ready per repetition batch.

NOTE: dispatch-based timings on the tunnel carry 1-5 ms of noisy
per-dispatch overhead — prefer scripts/scanbench.py (scan-chained,
in-graph) for anything small. This script remains useful for end-to-end
dispatch-level numbers.
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from kimera_vio_tpu.config.params import VioParams
from kimera_vio_tpu.dataprovider.euroc import EurocDataProvider
from kimera_vio_tpu.pipeline.stereo_pipeline import StereoImuPipeline

MICRO_EUROC = "/root/reference/tests/data/MicroEurocDataset"
EUROC_PARAMS = "/root/reference/params/Euroc"


def timeit(name, fn, args_list, n=8, sync=None):
    """fn(*args) dispatched over n varying arg tuples, one final sync."""
    outs = [fn(*a) for a in args_list[:2]]  # warm compile
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*args_list[i % len(args_list)]) for i in range(n)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:42s} {dt:8.2f} ms")
    return dt


def main():
    params = VioParams.from_folder(EUROC_PARAMS)
    params.max_features = 256
    params.max_landmarks = 384
    provider = EurocDataProvider(MICRO_EUROC)
    pipe = StereoImuPipeline(params, parallel_run=True)
    fe = pipe.frontend
    # The LK comparison below needs the stored pyramid/gradient state of
    # the gather/pallas configurations (the default matmul tracker carries
    # a template cache instead).
    fe.cfg = fe.cfg.replace(lk_impl="gather")
    cfg = fe.cfg

    packets = [p for p in provider.frames()]
    imgs = []
    for p in packets[:12]:
        l = provider.load_image(p["left_path"])
        r = provider.load_image(p["right_path"])
        imgs.append((l, r))

    print(f"device: {jax.devices()[0]}")
    print(f"max_features={cfg.max_features} klt_win={cfg.klt_win} "
          f"levels={cfg.klt_max_level} iters={cfg.klt_max_iter}")

    # ---- transfer bandwidth ----
    pairs = [np.stack([l, r]) for l, r in imgs]
    t0 = time.perf_counter()
    devp = [jax.device_put(p) for p in pairs]
    jax.block_until_ready(devp)
    dt = (time.perf_counter() - t0) / len(pairs)
    mb = pairs[0].nbytes / 1e6
    print(f"{'h2d uint8 stereo pair':42s} {dt*1e3:8.2f} ms "
          f"({mb/dt:.1f} MB/s)")

    # single left-only uint8
    lefts = [np.ascontiguousarray(l) for l, r in imgs]
    t0 = time.perf_counter()
    devl = [jax.device_put(x) for x in lefts]
    jax.block_until_ready(devl)
    dt = (time.perf_counter() - t0) / len(lefts)
    print(f"{'h2d uint8 left only':42s} {dt*1e3:8.2f} ms")

    from kimera_vio_tpu.ops import optical_flow as of

    dimgs = [(jnp.asarray(l).astype(jnp.float32),
              jnp.asarray(r).astype(jnp.float32)) for l, r in imgs]
    jax.block_until_ready(dimgs)

    # ---- pyramid ----
    build_pyr = jax.jit(lambda x: of.build_pyramid(x, cfg.klt_max_level))
    timeit("build_pyramid", build_pyr, [(d[0],) for d in dimgs])
    grad_all = jax.jit(
        lambda x: tuple(of._grad(p) for p in of.build_pyramid(x, cfg.klt_max_level))
    )
    timeit("pyramid+grads", grad_all, [(d[0],) for d in dimgs])

    # ---- set up a frontend state for component timing ----
    fe_state, meas0 = fe.init_state(dimgs[0][0], dimgs[0][1], 0.0)
    jax.block_until_ready(fe_state.features.uv)

    pyrs = [build_pyr(d[0]) for d in dimgs]
    jax.block_until_ready(pyrs)

    # ---- LK pallas vs XLA ----
    from kimera_vio_tpu.ops.pallas.lk_kernel import klt_track_pallas

    feats = fe_state.features
    lkf_pyr = list(fe_state.lkf_pyramid)
    lkf_grads = list(fe_state.lkf_grads)

    def lk_pallas(cur_pyr, uv):
        return klt_track_pallas(
            lkf_pyr, list(cur_pyr), uv, uv, feats.mask,
            win=cfg.klt_win, max_iter=cfg.klt_max_iter, eps=cfg.klt_eps,
            prev_grads=lkf_grads,
        )

    def lk_xla(cur_pyr, uv):
        return of.klt_track(
            lkf_pyr, list(cur_pyr), uv, uv, feats.mask,
            win=cfg.klt_win, max_iter=cfg.klt_max_iter, eps=cfg.klt_eps,
            prev_grads=lkf_grads,
        )

    # Matmul-form LK with the per-keyframe template cache (the production
    # default, FrontendConfig.lk_impl="matmul").
    templates = of.build_lk_templates(
        lkf_pyr, feats.uv, feats.mask,
        win=cfg.klt_win, prev_grads=lkf_grads,
    )
    jax.block_until_ready(templates)

    def lk_matmul(cur_pyr, uv):
        return of.klt_track_cached(
            templates, list(cur_pyr), uv, feats.mask,
            win=cfg.klt_win, max_iter=cfg.klt_max_iter, eps=cfg.klt_eps,
        )

    uvs = [feats.uv + i * 0.01 for i in range(8)]
    timeit("LK pallas", jax.jit(lk_pallas),
           [(pyrs[i % len(pyrs)], uvs[i % 8]) for i in range(8)])
    timeit("LK xla gather", jax.jit(lk_xla),
           [(pyrs[i % len(pyrs)], uvs[i % 8]) for i in range(8)])
    timeit("LK matmul+template-cache (default)", jax.jit(lk_matmul),
           [(pyrs[i % len(pyrs)], uvs[i % 8]) for i in range(8)])

    # ---- rectify + versors ----
    rect_fn = jax.jit(lambda uv: (fe._rectify_uv(uv), fe._versors_from_raw(uv)))
    timeit("rectify+versors (256 kp)", rect_fn, [(u,) for u in uvs])

    # ---- PIM ----
    from kimera_vio_tpu.frontend import imu_frontend as imu
    from kimera_vio_tpu.common.types import ImuBias

    blocks = [jax.tree.map(jnp.asarray, p["imu"]) for p in packets[1:9]]
    pim_fn = jax.jit(lambda b: imu.preintegrate(fe.pim_params, b, ImuBias.zero()))
    timeit("PIM parallel (64-cap block)", pim_fn, [(b,) for b in blocks])

    # ---- full fused step (non-keyframe by construction: short dt) ----
    from kimera_vio_tpu.backend import smoother as sm
    from kimera_vio_tpu.common.types import NavState

    K, L = pipe.backend_cfg.nr_states, pipe.backend_cfg.max_landmarks
    win = sm.Window.empty(K)
    lmk = sm.LandmarkTable.empty(L, K)
    nav0, bias0 = pipe._bootstrap_state(provider, packets[0]["stamp_ns"], None)
    win = sm.bootstrap(cfg=pipe.backend_cfg, win=win, nav=nav0, bias=bias0,
                       stamp=jnp.float32(0.0))
    lmk = sm.update_landmarks(lmk, meas0.ids, meas0.uvs, meas0.mask, jnp.int32(0))

    d8 = [(jnp.asarray(imgs[i][0]), jnp.asarray(imgs[i][1])) for i in range(8)]
    jax.block_until_ready(d8)
    args_nk = [
        (fe_state, win, lmk, d8[i][0], d8[i][1], blocks[i % len(blocks)],
         jnp.float32(0.05 + 0.001 * i))
        for i in range(8)
    ]
    timeit("fused step (non-keyframe)", pipe._fused_step, args_nk)
    args_kf = [
        (fe_state, win, lmk, d8[i][0], d8[i][1], blocks[i % len(blocks)],
         jnp.float32(6.0 + 0.001 * i))  # > max_intra_kf_time => keyframe
        for i in range(8)
    ]
    timeit("fused step (keyframe)", pipe._fused_step, args_kf)

    # ---- backend step alone ----
    be_args = [
        (win, lmk, pim_fn(blocks[i % len(blocks)]), jnp.float32(0.2 + 0.01 * i),
         meas0.ids, meas0.uvs, meas0.mask, jnp.int32(0))
        for i in range(8)
    ]
    timeit("backend step", pipe._backend_step, be_args)

    # ---- detection ----
    from kimera_vio_tpu.ops import corner_detection as det

    det_fn = jax.jit(
        lambda img, uv, m: det.detect_features(
            img, uv, m, cfg.max_features,
            quality_level=cfg.quality_level, min_distance=cfg.min_distance,
            nr_horizontal_bins=cfg.nr_horizontal_bins,
            nr_vertical_bins=cfg.nr_vertical_bins, do_subpixel=cfg.do_subpixel,
        )
    )
    timeit("detect_features", det_fn,
           [(dimgs[i % len(dimgs)][0], uvs[i % 8], feats.mask) for i in range(8)])

    # ---- stereo matching ----
    from kimera_vio_tpu.ops.stereo_matching import match_stereo

    lr = [(fe._remap_left(d[0]), fe._remap_right(d[1])) for d in dimgs[:8]]
    jax.block_until_ready(lr)
    ms_fn = jax.jit(
        lambda l, r, uv: match_stereo(
            l, r, uv, feats.mask, fx=fe.stereo.fx, baseline=fe.stereo.baseline,
            templ_cols=cfg.templ_cols, templ_rows=cfg.templ_rows,
            max_disparity=cfg.max_disparity, min_point_dist=cfg.min_point_dist,
            max_point_dist=cfg.max_point_dist, tolerance=cfg.templ_tolerance,
        )
    )
    timeit("match_stereo", ms_fn,
           [(lr[i][0], lr[i][1], uvs[i % 8]) for i in range(8)])

    remap = jax.jit(lambda x: fe._remap_left(x))
    timeit("remap (rectify image)", remap, [(d[0],) for d in dimgs])


if __name__ == "__main__":
    main()
