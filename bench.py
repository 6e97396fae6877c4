#!/usr/bin/env python
"""Benchmark: stereo-inertial VIO throughput (frontend+backend) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference Kimera-VIO frontend sustains ~78 Hz on a desktop CPU
(README.md:219 — "12.16 +- 10.7 ms @ ~78 Hz"), with the backend on a second
thread; 78 fps is the reference pipeline's effective frame throughput.

Dataset: MicroEurocDataset from the reference test data when mounted (real
EuRoC images + IMU), else the synthetic stereo provider. Warm-up frames are
excluded from timing (XLA compilation). Accuracy is also sanity-checked on
the synthetic sequence (exact GT) and reported in the JSON's extra fields.
"""

import json
import os
import sys
import time

# Persistent compilation cache: repeat runs skip the 20-40 s XLA compiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

BASELINE_FPS = 78.0
MICRO_EUROC = "/root/reference/tests/data/MicroEurocDataset"
EUROC_PARAMS = "/root/reference/params/Euroc"


def main():
    import jax

    # The env var alone does not reliably enable the persistent cache on
    # this backend; set the config explicitly (compiles are 20-40 s over
    # the axon tunnel — caching them is essential).
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from kimera_vio_tpu.config.params import VioParams
    from kimera_vio_tpu.dataprovider.euroc import EurocDataProvider
    from kimera_vio_tpu.dataprovider.synthetic import (
        SyntheticStereoProvider,
        synthetic_params,
    )
    from kimera_vio_tpu.pipeline.stereo_pipeline import StereoImuPipeline
    from kimera_vio_tpu.utils.logger import compute_ate

    use_euroc = os.path.isdir(MICRO_EUROC) and os.path.isdir(EUROC_PARAMS)
    if use_euroc:
        params = VioParams.from_folder(EUROC_PARAMS)
        params.max_features = 256
        params.max_landmarks = 384
        provider = EurocDataProvider(MICRO_EUROC)
        n_total = len(provider)
        dataset = "MicroEuroc"
    else:
        params = synthetic_params(nr_states=10, max_features=256, max_landmarks=384)
        provider = SyntheticStereoProvider(n_frames=80, vx=0.5)
        n_total = provider.n_frames
        dataset = "synthetic"

    pipe = StereoImuPipeline(params, parallel_run=True)

    # --- warm-up pass: compile every program variant -----------------------
    warm_frames = []
    frames_iter = provider.frames()
    all_packets = list(frames_iter)
    # Preload all images (host IO excluded from timing, like the reference's
    # offline dataset-parse-then-spin benchmark structure).
    images = {}
    for p in all_packets:
        images[p["left_path"]] = provider.load_image(p["left_path"])
        images[p["right_path"]] = provider.load_image(p["right_path"])

    class Preloaded:
        ground_truth = provider.ground_truth
        imu_sync = provider.imu_sync

        def load_image(self, key):
            return images[key]

        def frames(self):
            return iter(all_packets)

    pre = Preloaded()

    # Warm-up: run the full sequence once (compiles frontend, keyframe and
    # backend paths).
    t0 = time.perf_counter()
    out = pipe.run(pre)
    warm_s = time.perf_counter() - t0

    # --- timed pass --------------------------------------------------------
    pipe2 = StereoImuPipeline(params, parallel_run=True)
    pipe2.frontend = pipe.frontend  # reuse compiled programs
    pipe2._backend_step = pipe._backend_step
    pipe2._fused_step = pipe._fused_step
    t0 = time.perf_counter()
    out2 = pipe2.run(pre)
    dt = time.perf_counter() - t0
    fps = out2.n_frames / dt

    # Supplementary: device-only throughput (images pre-staged on device,
    # chained dispatch) — isolates framework speed from this environment's
    # slow (~36 MB/s) host->device tunnel, which real deployments lack.
    import jax.numpy as jnp

    import kimera_vio_tpu.backend.smoother as smod
    from kimera_vio_tpu.common.types import ImuBias

    dev_packets = [p for p in all_packets if p.get("imu") is not None]
    dev_imgs = [
        (
            jnp.asarray(images[p["left_path"]]),
            jnp.asarray(images[p.get("right_path", p["left_path"])]),
        )
        for p in dev_packets
    ]
    dev_blocks = [jax.tree.map(jnp.asarray, p["imu"]) for p in dev_packets]
    K = pipe.backend_cfg.nr_states
    L = pipe.backend_cfg.max_landmarks
    win = smod.Window.empty(K)
    lmk = smod.LandmarkTable.empty(L, K)
    fe_state, meas0 = pipe.frontend.init_state(*dev_imgs[0], 0.0)
    nav0, bias0 = pipe._bootstrap_state(pre, all_packets[0]["stamp_ns"], None)
    fe_state = fe_state.replace(
        imu_bias=ImuBias(accel=bias0[0:3], gyro=bias0[3:6])
    )
    win = smod.bootstrap(
        cfg=pipe.backend_cfg, win=win, nav=nav0, bias=bias0,
        stamp=jnp.float32(0.0),
    )
    lmk = smod.update_landmarks(lmk, meas0.ids, meas0.uvs, meas0.mask, jnp.int32(0))
    t0ns = dev_packets[0]["stamp_ns"]
    s = (fe_state, win, lmk)
    for k in range(1, min(6, len(dev_packets))):  # warm
        ss = (dev_packets[k]["stamp_ns"] - t0ns) * 1e-9
        s = pipe._fused_step(
            s[0], s[1], s[2], *dev_imgs[k], dev_blocks[k], jnp.float32(ss)
        )[:3]
    jax.block_until_ready(s[1].pos)
    t0 = time.perf_counter()
    nd = 0
    for k in range(6, len(dev_packets)):
        ss = (dev_packets[k]["stamp_ns"] - t0ns) * 1e-9
        s = pipe._fused_step(
            s[0], s[1], s[2], *dev_imgs[k], dev_blocks[k], jnp.float32(ss)
        )[:3]
        nd += 1
    jax.block_until_ready(s[1].pos)
    device_fps = nd / (time.perf_counter() - t0)

    extras = {
        "device_fps": round(device_fps, 2),
        "dataset": dataset,
        "n_frames": out2.n_frames,
        "n_keyframes": out2.n_keyframes,
        "warmup_s": round(warm_s, 2),
        "device": str(jax.devices()[0]),
    }
    # Accuracy sanity on synthetic GT.
    if dataset == "synthetic":
        est = np.stack(out2.positions)
        gt = provider.ground_truth
        ate = compute_ate(
            np.array(out2.stamps_ns), est, gt.stamps_ns, gt.positions, align=False
        )
        extras["ate_rmse_m"] = round(ate["rmse"], 4)

    print(
        json.dumps(
            {
                "metric": "euroc_stereo_inertial_fps",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
