"""utils.stats / utils.logger unit tests — the reference's
testTimer.cpp / Statistics accumulators (utils/Statistics.h:58-206) and
the CSV-logger contract (src/logging/Logger.cpp; traj_vio.csv is the
kimera_eval/evo input format, reference Jenkinsfile:61-98).
"""
import math
import os

import numpy as np

from kimera_vio_tpu.utils.logger import (
    BackendLogger,
    FrontendLogger,
    compute_ate,
)
from kimera_vio_tpu.utils.stats import StatsCollector


def test_accumulator_windowed_stats():
    sc = StatsCollector()
    for v in range(250):
        sc.add("backend [ms]", float(v))
    a = sc.get("backend [ms]")
    # Lifetime totals span everything; the window keeps the last 100
    # (the reference Accumulator<double, double, 100>).
    assert a.count == 250
    assert a.vmin == 0.0 and a.vmax == 249.0
    assert a.windowed_mean == np.mean(np.arange(150, 250))
    expected_std = np.std(np.arange(150, 250), ddof=1)
    assert math.isclose(a.std, expected_std, rel_tol=1e-9)
    assert a.mean == np.mean(np.arange(250))


def test_stats_table_format():
    sc = StatsCollector()
    sc.add("frontend [ms]", 5.0)
    sc.add("frontend [ms]", 7.0)
    sc.add("backend [ms]", 15.0)
    table = sc.print_table()
    # One row per tag, sorted, with count / mean +- std / [min, max] — the
    # shape of Pipeline::printStatistics (README.md:211-250).
    lines = table.splitlines()
    assert lines[0] == "Statistics"
    # Header carries the reference's column labels (README.md:212):
    # `#  Log Hz  {avg +- std}  [min,max]`.
    assert "Log Hz" in lines[1] and "avg" in lines[1]
    rows = [l for l in lines[2:] if l.strip()]
    assert len(rows) == 2
    assert rows[0].startswith("backend [ms]")
    assert "+-" in rows[0] and "[" in rows[0]
    assert "{6 +-" in rows[1]  # windowed mean of 5, 7
    assert "[5," in rows[1] and "7]" in rows[1]


def test_backend_logger_traj_vio_schema(tmp_path):
    """traj_vio.csv: 17-column EuRoC-GT-format rows (BackendLogger
    writes the same schema the reference logs for kimera_eval,
    Logger.cpp:88-103)."""
    log = BackendLogger(str(tmp_path))
    log.log_state(
        123456789,
        np.array([1.0, 2.0, 3.0]),
        np.array([1.0, 0.0, 0.0, 0.0]),
        np.array([0.1, 0.2, 0.3]),
        np.array([1e-3, 2e-3, 3e-3]),
        np.array([1e-2, 2e-2, 3e-2]),
    )
    log.log_timing(123456789, 4.2)
    log.close()
    traj = open(os.path.join(str(tmp_path), "traj_vio.csv")).read().splitlines()
    assert traj[0] == (
        "#timestamp,x,y,z,qw,qx,qy,qz,vx,vy,vz,bgx,bgy,bgz,bax,bay,baz"
    )
    row = traj[1].split(",")
    assert len(row) == 17
    assert row[0] == "123456789"
    assert float(row[1]) == 1.0 and float(row[4]) == 1.0
    timing = open(
        os.path.join(str(tmp_path), "output_backendTiming.csv")
    ).read().splitlines()
    assert len(timing) == 2 and timing[1].startswith("123456789,")


def test_frontend_logger_rows(tmp_path):
    log = FrontendLogger(str(tmp_path))
    log.log(100, True, 42, 1.5, 30, 25, 3.3)
    log.log(200, False, 40, 0.2, 0, 0, 1.1)
    log.close()
    files = os.listdir(str(tmp_path))
    fname = [f for f in files if "frontend" in f.lower()][0]
    rows = open(os.path.join(str(tmp_path), fname)).read().splitlines()
    assert rows[0].startswith("#timestamp")
    assert len(rows) == 3
    assert rows[1].split(",")[1] == "1" and rows[2].split(",")[1] == "0"


def test_compute_ate_identity_and_alignment():
    rng = np.random.default_rng(0)
    stamps = (np.arange(50) * 1e8).astype(np.int64)
    gt = np.cumsum(rng.normal(0, 0.1, (50, 3)), 0)
    # Identity: zero error.
    r = compute_ate(stamps, gt.copy(), stamps, gt, align=False)
    assert r["rmse"] < 1e-12 and r["n"] == 50
    # A rigid SE(3) transform of the trajectory aligns back to ~zero.
    th = 0.7
    R = np.array(
        [
            [np.cos(th), -np.sin(th), 0],
            [np.sin(th), np.cos(th), 0],
            [0, 0, 1.0],
        ]
    )
    est = gt @ R.T + np.array([5.0, -2.0, 1.0])
    r_al = compute_ate(stamps, est, stamps, gt, align=True)
    assert r_al["rmse"] < 1e-9
    r_un = compute_ate(stamps, est, stamps, gt, align=False)
    assert r_un["rmse"] > 1.0
    # GT interpolation: estimate stamps between GT samples.
    mid = stamps[:-1] + 5 * 10**7
    gt_mid = 0.5 * (gt[:-1] + gt[1:])
    r_mid = compute_ate(mid, gt_mid, stamps, gt, align=False)
    assert r_mid["rmse"] < 1e-12
