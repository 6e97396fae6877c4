"""CLI entry point — the reference's example binary
(`examples/KimeraVIO.cpp` / `stereoVIOEuroc`) as a module runner:

    python -m kimera_vio_tpu \
        --params_folder /path/to/params/Euroc \
        --dataset_path /path/to/EuRoC/V1_01_easy \
        [--initial_k 0] [--final_k -1] [--use_lcd] [--visualize] \
        [--log_output] [--output_path ./output_logs] [--parallel_run 1] \
        [--chunked] [--equalize_image]

Flags mirror the reference gflags (docs/gflags_parameters.md); values set
here land in the config.flags registry so the rest of the framework sees
them exactly as it would env-var-set flags.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="python -m kimera_vio_tpu",
        description="TPU-native Kimera-VIO: stereo/mono VIO pipeline",
    )
    ap.add_argument("--params_folder", required=True,
                    help="reference-layout params folder (e.g. params/Euroc)")
    ap.add_argument("--dataset_path", required=True,
                    help="EuRoC-format dataset root (contains mav0/)")
    ap.add_argument("--initial_k", type=int, default=0)
    ap.add_argument("--final_k", type=int, default=-1)
    ap.add_argument("--use_lcd", action="store_true")
    ap.add_argument("--visualize", action="store_true")
    ap.add_argument("--enable_mesher", action="store_true")
    ap.add_argument("--log_output", action="store_true")
    ap.add_argument("--log_euroc_gt_data", action="store_true")
    ap.add_argument("--output_path", default="./output_logs")
    ap.add_argument("--parallel_run", type=int, default=None,
                    help="override PipelineParams.parallel_run")
    ap.add_argument("--chunked", action="store_true",
                    help="offline chunked mode (fast scan-batched path)")
    ap.add_argument("--chunk_size", type=int, default=16)
    ap.add_argument("--equalize_image", action="store_true",
                    help="histogram-equalize input images (also read from "
                    "FrontendParams.yaml equalizeImage)")
    ap.add_argument("--do_fine_imu_camera_temporal_sync", action="store_true")
    ap.add_argument("--do_coarse_imu_camera_temporal_sync",
                    action="store_true")
    ap.add_argument("--max_features", type=int, default=None)
    ap.add_argument("--max_landmarks", type=int, default=None)
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument(
        "--gflag", action="append", default=[], metavar="NAME=VALUE",
        help="set any registered runtime flag (the reference's gflags "
        "tier; see kimera_vio_tpu/config/flags.py for the registry, "
        "e.g. --gflag max_triangle_side=0.7 --gflag visualize_mesh_2d=1)",
    )
    return ap


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    from kimera_vio_tpu.config import flags
    from kimera_vio_tpu.config.params import VioParams
    from kimera_vio_tpu.dataprovider.euroc import EurocDataProvider
    from kimera_vio_tpu.pipeline.stereo_pipeline import StereoImuPipeline

    for name in (
        "use_lcd", "visualize", "log_output", "log_euroc_gt_data",
        "do_fine_imu_camera_temporal_sync",
    ):
        if getattr(args, name):
            flags.set_flag(name, True)
    flags.set_flag("initial_k", args.initial_k)
    flags.set_flag("final_k", args.final_k)
    flags.set_flag("output_path", args.output_path)
    # Generic gflags tier: --gflag name=value, typed via the registry
    # (reference binaries accept every gflag on the command line).
    for item in args.gflag:
        name, _, raw = item.partition("=")
        if not _ or name not in flags._REGISTRY:
            known = ", ".join(sorted(flags._REGISTRY))
            raise SystemExit(
                f"--gflag {item!r}: unknown flag or missing '='; "
                f"registered flags: {known}"
            )
        typ = flags._REGISTRY[name].type
        if typ is bool:
            flags.set_flag(name, raw.lower() in ("1", "true", "yes"))
        else:
            flags.set_flag(name, typ(raw))

    params = VioParams.from_folder(args.params_folder)
    if args.max_features:
        params.max_features = args.max_features
    if args.max_landmarks:
        params.max_landmarks = args.max_landmarks

    equalize = args.equalize_image or getattr(
        params.frontend, "equalize_image", False
    )
    # skip_n_start_frames / skip_n_end_frames (reference ETH_parser.cpp
    # gflags) compose with the explicit --initial_k/--final_k window.
    initial_k = flags.get_flag("initial_k") + flags.get_flag(
        "skip_n_start_frames"
    )
    final_k = (
        None if flags.get_flag("final_k") < 0 else flags.get_flag("final_k")
    )
    skip_end = flags.get_flag("skip_n_end_frames")
    if skip_end:
        if final_k is None:
            import csv as _csv

            cam_csv = os.path.join(
                args.dataset_path, "mav0", "cam0", "data.csv"
            )
            if not os.path.exists(cam_csv):
                cam_csv = os.path.join(args.dataset_path, "cam0", "data.csv")
            with open(cam_csv) as fh:
                n_total = sum(1 for row in fh if row and row[0] != "#")
            final_k = n_total
        final_k = max(initial_k, final_k - skip_end)
    provider = EurocDataProvider(
        args.dataset_path,
        initial_k=initial_k,
        final_k=final_k,
        max_imu_per_frame=params.max_imu_per_frame,
        equalize=equalize,
        do_coarse_imu_camera_temporal_sync=(
            args.do_coarse_imu_camera_temporal_sync
        ),
    )
    mono = params.pipeline.frontend_type == 0 or params.right_cam is None
    if mono:
        from kimera_vio_tpu.pipeline.mono_pipeline import MonoImuPipeline

        pipe_cls = MonoImuPipeline
    else:
        pipe_cls = StereoImuPipeline
    pipe = pipe_cls(
        params,
        output_path=(
            args.output_path if flags.get_flag("log_output") else None
        ),
        parallel_run=(
            bool(args.parallel_run) if args.parallel_run is not None else None
        ),
        enable_mesher=args.enable_mesher,
    )

    t0 = time.perf_counter()
    if args.chunked:
        out = pipe.run_chunked(
            provider, chunk_size=args.chunk_size, verbose=args.verbose,
            collect_aux=args.enable_mesher or flags.get_flag("use_lcd"),
        )
    else:
        out = pipe.run(provider, verbose=args.verbose)
    wall = time.perf_counter() - t0

    fps = out.n_frames / max(wall, 1e-9)
    print(
        f"frames={out.n_frames} keyframes={out.n_keyframes} "
        f"wall={wall:.2f}s fps={fps:.1f}"
    )
    # Reference-style statistics table (Pipeline::printStatistics,
    # README.md:211-250) + the CI-trended timing CSV
    # (output_timingOverall.csv, Logger.cpp:575-582, Jenkinsfile:89-95).
    print(pipe.stats.print_table())
    if flags.get_flag("log_output"):
        pipe.stats.write_timing_csv(args.output_path, wall * 1e3)
    return 0


if __name__ == "__main__":
    sys.exit(main())
