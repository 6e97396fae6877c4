#!/usr/bin/env python
"""Aux-config throughput: chunked-mode wall fps for the BASELINE.json
config family beyond the core frontend+backend number.

Rows (MicroEuroc, offline chunked mode, best-of-N wall):
  core         -- minimal fused path (the bench.py headline)
  lcd          -- + LoopClosureDetector (pretrained vocab, disk cache)
  regular_vio  -- backend_type: 1 + mesher plane feedback (sync aux)

Reference anatomy: the reference runs these as extra threads at keyframe
rate (Mesher/LcdModule, Pipeline.cpp:329-358), so its frame throughput is
unchanged while they keep up; here the aux modules are host-side phases
between chunk dispatches, so their cost shows up directly in wall fps.

Prints one JSON line per config.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)

import numpy as np

MICRO_EUROC = "/root/reference/tests/data/MicroEurocDataset"
EUROC_PARAMS = "/root/reference/params/Euroc"
CHUNK = int(os.environ.get("BENCH_CHUNK", "16"))
SUPER_MB = int(os.environ.get("BENCH_SUPER_MB", "32"))
REPS = int(os.environ.get("AUXBENCH_REPS", "4"))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from kimera_vio_tpu.config.params import VioParams
    from kimera_vio_tpu.dataprovider.euroc import EurocDataProvider
    from kimera_vio_tpu.pipeline.stereo_pipeline import StereoImuPipeline

    provider = EurocDataProvider(MICRO_EUROC)
    all_packets = list(provider.frames())
    max_frames = int(os.environ.get("AUXBENCH_MAX_FRAMES", "0"))
    if max_frames:
        all_packets = all_packets[:max_frames]
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

    def build(config):
        params = VioParams.from_folder(EUROC_PARAMS)
        params.max_features = 256
        params.max_landmarks = 384
        kw = {}
        collect_aux = False
        if config == "lcd":
            # output_path turns on the production LCD shape (disk frame
            # cache under <output>/lcd_cache) plus the CSV loggers.
            kw = dict(
                enable_lcd=True,
                output_path=tempfile.mkdtemp(prefix="auxbench_lcd_"),
            )
            collect_aux = True
        elif config == "regular_vio":
            params.pipeline.backend_type = 1
            kw = dict(enable_mesher=True)
            collect_aux = True
        pipe = StereoImuPipeline(params, parallel_run=True, **kw)
        return pipe, collect_aux

    for config in ("core", "lcd", "regular_vio"):
        pipe, collect_aux = build(config)
        run = lambda: pipe.run_chunked(
            pre,
            chunk_size=CHUNK,
            collect_aux=collect_aux,
            super_batch_bytes=SUPER_MB * 1024 * 1024,
        )
        t0 = time.perf_counter()
        out = run()  # warm-up/compile pass
        warm_s = time.perf_counter() - t0
        best = np.inf
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = run()
            best = min(best, time.perf_counter() - t0)
        row = {
            "config": config,
            "wall_fps": round(out.n_frames / best, 2),
            "n_frames": out.n_frames,
            "n_keyframes": out.n_keyframes,
            "warmup_s": round(warm_s, 1),
        }
        if config == "lcd" and pipe.lcd_result is not None:
            row["lcd_loops"] = len(pipe.lcd_result.get("loops", []))
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
