#!/usr/bin/env python
"""Measure 300-keyframe LCD recall/precision per packaged vocabulary.

Same harness as tests/test_lcd_large_map.py (exactly-periodic 6-DoF
orbit, 3 laps of 100 keyframes, pose-accurate precision vs analytic GT);
run for each candidate vocabulary npz to pick the shipped default.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def run_one(vocab_path):
    from kimera_vio_tpu.dataprovider.synthetic import (
        SyntheticPlanar6DofProvider,
        synthetic_params,
    )
    from kimera_vio_tpu.frontend.camera import StereoCamera
    from kimera_vio_tpu.loopclosure.lcd import LcdConfig
    from kimera_vio_tpu.pipeline.lcd_module import LcdModule
    from tests.test_lcd_large_map import _quat_to_rot

    n_kf, period, fps = 300, 100, 20.0
    f = 2.0 * np.pi * fps / period
    prov = SyntheticPlanar6DofProvider(
        n_frames=n_kf, fps=fps, width=320, height=240, fx=300.0, plane_z=3.0,
        trans_amp=(0.8, 0.4, 0.2), rot_amp=(0.05, 0.07, 0.3),
        trans_freq=(f, 2 * f, 3 * f), rot_freq=(f, 2 * f, f),
        trans_phase=(0.0, 1.0, 0.4), rot_phase=(0.3, 0.0, 0.7),
    )
    params = synthetic_params(width=320, height=240, fx=300.0)
    stereo = StereoCamera.from_params(params.left_cam, params.right_cam)
    gt = prov.ground_truth
    gt_pos = gt.positions
    cfg = LcdConfig(
        recent_frames_window=30, min_temporal_matches=1, alpha=0.1,
        min_inliers=20, arun_threshold_m=0.10, n_features=256,
        max_keyframes=128,
    )
    lcd = LcdModule(stereo, cfg=cfg, vocab_path=vocab_path)
    fired = []
    for k in range(n_kf):
        left = prov.load_image(("left", k))
        right = prov.load_image(("right", k))
        R = _quat_to_rot(gt.quats_wxyz[k])
        res = lcd.add_keyframe(
            left, right, R.astype(np.float32),
            gt_pos[k].astype(np.float32), int(gt.stamps_ns[k]),
        )
        if res is not None:
            fired.append(res)
    rots = [_quat_to_rot(q) for q in gt.quats_wxyz]

    def pose_err(res):
        q, m = res.query_id, res.match_id
        cands = [
            (rots[q].T @ rots[m], rots[q].T @ (gt_pos[m] - gt_pos[q])),
            (rots[m].T @ rots[q], rots[m].T @ (gt_pos[q] - gt_pos[m])),
        ]
        best = np.inf, np.inf
        for Rgt, tgt in cands:
            ang = np.arccos(np.clip(
                (np.trace(Rgt.T @ res.R_match_query) - 1) / 2, -1, 1))
            dt = np.linalg.norm(res.t_match_query - tgt)
            if (ang, dt) < best:
                best = (ang, dt)
        return best

    errs = [pose_err(r) for r in fired]
    good = [e for e in errs if e[0] < 0.10 and e[1] < 0.15]
    precision = len(good) / max(len(fired), 1)
    hit = {r.query_id for r, e in zip(fired, errs)
           if e[0] < 0.10 and e[1] < 0.15}
    queries = list(range(period, n_kf))
    recall = len([q for q in queries if q in hit]) / len(queries)
    return len(fired), precision, recall


def main():
    data = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "kimera_vio_tpu", "data")
    for name in sys.argv[1:] or [
        "bow_vocab_tree_4096.npz", "bow_vocab_tree_32768.npz"
    ]:
        n, p, r = run_one(os.path.join(data, name))
        print(f"{name}: fired={n} precision={p:.3f} recall={r:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
