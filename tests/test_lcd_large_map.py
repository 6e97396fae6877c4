"""Large-map place recognition: recall/precision at 300 keyframes.

The reference ships a ~1M-leaf DBoW2 ORB vocabulary and its recall at
scale is taken on faith; this repo's substitution (flat k-majority
codebook, loopclosure/vocab.py) needs the equivalent measured: run 300
rendered keyframes of an exactly-periodic 6-DoF orbit (3 laps of 100
keyframes) through the full LcdModule and score detected loops against
the analytic poses. Also exercises database growth past the initial
LcdConfig.max_keyframes capacity.

Measured numbers are reported in ROADMAP.md (round-4 verdict item 4).
Reference analog: LoopClosureDetector.cpp:37-75 (vocabulary),
:682-764 (detectLoop).
"""
import numpy as np
import pytest

from kimera_vio_tpu.dataprovider.synthetic import (
    SyntheticPlanar6DofProvider,
    synthetic_params,
)
from kimera_vio_tpu.frontend.camera import StereoCamera
from kimera_vio_tpu.loopclosure.lcd import LcdConfig
from kimera_vio_tpu.pipeline.lcd_module import LcdModule


@pytest.mark.slow
def test_lcd_recall_precision_300_keyframes():
    n_kf = 300
    period = 100  # frames per orbit lap
    fps = 20.0
    f = 2.0 * np.pi * fps / period  # exactly periodic every `period` frames
    # plane_z=3 / fx=300: stereo depth noise sigma_z ~ z^2/(fx b) sigma_d
    # ~ 0.14 m/point — at plane_z=5 the 3d3d translation noise floor
    # (~0.4 m) would dominate the precision measurement.
    prov = SyntheticPlanar6DofProvider(
        n_frames=n_kf, fps=fps,
        width=320, height=240, fx=300.0, plane_z=3.0,
        trans_amp=(0.8, 0.4, 0.2), rot_amp=(0.05, 0.07, 0.3),
        trans_freq=(f, 2 * f, 3 * f), rot_freq=(f, 2 * f, f),
        trans_phase=(0.0, 1.0, 0.4), rot_phase=(0.3, 0.0, 0.7),
    )
    params = synthetic_params(width=320, height=240, fx=300.0)
    stereo = StereoCamera.from_params(params.left_cam, params.right_cam)

    gt = prov.ground_truth
    gt_pos = gt.positions

    cfg = LcdConfig(
        recent_frames_window=30,
        min_temporal_matches=1,
        alpha=0.1,
        min_inliers=20,  # wide-baseline sloppy matches die here
        arun_threshold_m=0.10,
        n_features=256,
        max_keyframes=128,  # forces database growth to 300
    )
    lcd = LcdModule(stereo, cfg=cfg)

    fired = []  # LoopResult
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

    assert lcd.lcd.n_kf == n_kf  # growth past max_keyframes=128 worked

    # Precision = recovered-relative-pose accuracy vs the analytic GT (the
    # contract that matters: a wrong loop pose corrupts the pose graph;
    # a loop between two views 1 m apart with the CORRECT relative pose is
    # a valid loop — the scene overlaps). Checked against both camera-
    # frame conventions; the synthetic rig has identity body-cam
    # extrinsics.
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
    # Recall over revisit queries: keyframes in laps 2-3 (each has its
    # exact period-mate in the database, far outside the exclusion
    # window) that fired a pose-accurate loop.
    hit = {
        r.query_id for r, e in zip(fired, errs)
        if e[0] < 0.10 and e[1] < 0.15
    }
    queries = list(range(period, n_kf))
    recall = len([q for q in queries if q in hit]) / len(queries)

    worst = sorted(
        [(round(e[0], 3), round(e[1], 3), r.query_id, r.match_id)
         for r, e in zip(fired, errs)], reverse=True
    )[:5]
    print(f"LCD large-map: {len(fired)} fired, pose-accurate precision="
          f"{precision:.3f}, recall={recall:.3f}, worst={worst}")
    assert len(fired) >= 20, f"only {len(fired)} loops fired at 300 kf"
    assert precision >= 0.9, f"precision {precision:.3f} < 0.9"
    assert recall >= 0.3, f"recall {recall:.3f} < 0.3"


def _quat_to_rot(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        np.float64,
    )
