"""ANMS algorithm family (ops/anms.py) — the reference's seven
AnmsAlgorithmType variants (NonMaximumSuppression.cpp:64-118).

Contracts tested per algorithm: exact count cap, validity masking,
score priority (the strongest candidate always survives), and spatial
separation (every pair of kept points is farther apart than a bound tied
to the algorithm's suppression geometry).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kimera_vio_tpu.ops import anms
from kimera_vio_tpu.ops import corner_detection as det


def _grid_candidates(rng, m=400, w=752, h=480):
    uv = np.stack(
        [rng.uniform(5, w - 5, m), rng.uniform(5, h - 5, m)], -1
    ).astype(np.float32)
    score = rng.uniform(1.0, 100.0, m).astype(np.float32)
    ok = rng.random(m) < 0.9
    return jnp.asarray(uv), jnp.asarray(score), jnp.asarray(ok)


def _min_pair_dist(uv, keep):
    pts = np.asarray(uv)[np.asarray(keep)]
    if len(pts) < 2:
        return np.inf
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    return d.min()


@pytest.mark.parametrize("anms_type", [0, 1, 2, 5])
def test_count_validity_and_strongest(anms_type):
    rng = np.random.default_rng(anms_type)
    uv, score, ok = _grid_candidates(rng)
    k = 60
    keep = jax.jit(
        lambda u, s, o: anms.suppress_non_max(u, s, o, k, anms_type, 752, 480)
    )(uv, score, ok)
    keep = np.asarray(keep)
    assert keep.sum() <= k
    assert not (keep & ~np.asarray(ok)).any()
    # The globally strongest valid candidate is never suppressed.
    s = np.where(np.asarray(ok), np.asarray(score), -np.inf)
    assert keep[s.argmax()]


def test_topn_is_pure_score_ranking():
    rng = np.random.default_rng(10)
    uv, score, ok = _grid_candidates(rng, m=200)
    keep = anms.top_n(score, ok, 50)
    s = np.where(np.asarray(ok), np.asarray(score), -np.inf)
    expected = set(np.argsort(-s)[:50])
    assert set(np.flatnonzero(np.asarray(keep))) == expected


def test_brown_anms_spreads_better_than_topn():
    """BrownANMS's kept set has a larger minimum pairwise distance than
    raw top-k on a clustered candidate field."""
    rng = np.random.default_rng(11)
    # Clustered scores: a tight high-score blob + uniform background.
    blob = np.stack(
        [rng.uniform(300, 340, 80), rng.uniform(200, 240, 80)], -1
    )
    bg = np.stack([rng.uniform(5, 747, 220), rng.uniform(5, 475, 220)], -1)
    uv = jnp.asarray(np.concatenate([blob, bg]).astype(np.float32))
    score = jnp.asarray(
        np.concatenate(
            [rng.uniform(90, 100, 80), rng.uniform(1, 50, 220)]
        ).astype(np.float32)
    )
    ok = jnp.ones(300, bool)
    k = 40
    d_top = _min_pair_dist(uv, anms.top_n(score, ok, k))
    d_brown = _min_pair_dist(uv, anms.brown_anms(uv, score, ok, k))
    assert d_brown > 3.0 * max(d_top, 1e-6)


@pytest.mark.parametrize("fn", [anms.sdc, anms.ssc])
def test_radius_search_enforces_separation(fn):
    rng = np.random.default_rng(12)
    uv, score, ok = _grid_candidates(rng, m=500)
    k = 50
    keep = fn(uv, score, ok, k, 752, 480)
    keep_np = np.asarray(keep)
    n = keep_np.sum()
    assert 10 <= n <= int(k * 1.1) + 1
    # Homogeneous-coverage bound: with ~k points spread over the image the
    # greedy radius lands near sqrt(W*H/k); kept points must not collapse.
    expected_r = np.sqrt(752 * 480 / k)
    bound = expected_r / 6.0 if fn is anms.ssc else expected_r / 4.0
    assert _min_pair_dist(uv, keep) > bound


def test_aliases():
    assert anms.kd_tree is anms.sdc and anms.range_tree is anms.sdc


@pytest.mark.parametrize("anms_type", [0, 1, 2, 3, 4, 5])
def test_detect_features_dispatch(anms_type):
    """detect_features runs end-to-end (jitted) with every explicit ANMS
    algorithm and returns spread, valid corners on a synthetic scene."""
    rng = np.random.default_rng(20)
    img = jnp.asarray(
        (rng.random((120, 160)) * 20).astype(np.float32)
    )
    # Strong checkerboard corners.
    y, x = np.meshgrid(np.arange(120), np.arange(160), indexing="ij")
    img = img + jnp.asarray(
        (((y // 12) + (x // 12)) % 2 * 120).astype(np.float32)
    )
    uv, valid = jax.jit(
        lambda im: det.detect_features(
            im,
            jnp.zeros((8, 2), jnp.float32),
            jnp.zeros(8, bool),
            32,
            min_distance=6.0,
            do_subpixel=False,
            anms_type=anms_type,
            max_nr_keypoints_before_anms=256,
        )
    )(img)
    uv, valid = np.asarray(uv), np.asarray(valid)
    assert valid.sum() >= 8
    pts = uv[valid]
    assert (pts[:, 0] < 160).all() and (pts[:, 1] < 120).all()
    # Spread check: points cover more than one quadrant.
    assert len(np.unique((pts[:, 0] > 80).astype(int) * 2 + (pts[:, 1] > 60))) >= 2
