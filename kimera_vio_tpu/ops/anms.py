"""Adaptive non-maximum suppression family — TPU-native rebuilds of the
reference's seven ANMS algorithms (AnmsAlgorithmType,
include/kimera-vio/frontend/feature-detector/NonMaximumSuppression.h:52-60,
dispatch src/frontend/feature-detector/NonMaximumSuppression.cpp:64-118;
the vendored algorithms follow Bailo et al., "Efficient adaptive non-maximal
suppression algorithms for homogeneous spatial keypoint distribution").

All operate on a fixed-size candidate set (uv (M,2), score (M,), ok (M,))
and return a selection mask — static shapes, jittable, keyframe-rate.

  type | reference        | here
  -----+------------------+----------------------------------------------
   0   | anms::TopN       | top-k by score (no spatial term)
   1   | anms::BrownANMS  | exact: per-point suppression radius = distance
       |                  | to nearest stronger point, as one (M,M)
       |                  | pairwise matrix; top-k radii
   2   | anms::Sdc        | binary search on suppression radius +
   3   | anms::KdTree     | strongest-first greedy with exact disk
   4   | anms::RangeTree  | coverage. SDC/KdTree/RangeTree are the same
       |                  | algorithm behind different range-query
       |                  | structures; the batched (M,) covered-mask scan
       |                  | IS the TPU-native range query, so all three
       |                  | map to one program (documented substitution)
   5   | anms::Ssc        | binary search + greedy with SSC's square-grid
       |                  | covering (the paper's defining approximation)
   6   | binning          | per-bin top-k quota (corner_detection.
       |                  | binned_topk_select — the in-response-image
       |                  | fused path used by the frontend default)

The greedy passes are lax.scan over score-sorted candidates — sequential by
nature (each keep decision depends on prior coverage), but M is small
(hundreds to ~2k) and this runs only on keyframes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Binary-search iterations for the radius search: the interval halves each
# step, so 14 iterations localize the radius to ~diag/16384 px.
_SEARCH_ITERS = 14
# SSC coverage grid edge (static allocation). The final SSC cell size is
# ~radius/2 and radius ~ sqrt(W*H/k); for any practical (image, k) this
# grid is far finer than needed; radii whose grid would exceed it are
# clamped out of the search interval.
_SSC_GRID = 96


def top_n(score: jax.Array, ok: jax.Array, k: int):
    """AnmsAlgorithmType::TopN — strongest k, no spatial spreading."""
    s = jnp.where(ok, score, -jnp.inf)
    _, idx = jax.lax.top_k(s, k)
    keep = jnp.zeros_like(ok).at[idx].set(True)
    return keep & ok


def brown_anms(uv: jax.Array, score: jax.Array, ok: jax.Array, k: int):
    """AnmsAlgorithmType::BrownANMS (Brown et al. adaptive NMS): each
    point's suppression radius is the distance to the nearest point with
    a (robustly) higher score; keep the k largest radii. One (M, M)
    pairwise distance matrix — exact, not approximated."""
    d2 = jnp.sum((uv[:, None, :] - uv[None, :, :]) ** 2, -1)  # (M, M)
    # j suppresses i if score_j > score_i (strict; ties broken by index so
    # equal-score points do not suppress each other symmetrically).
    m = score.shape[0]
    ids = jnp.arange(m)
    stronger = (score[None, :] > score[:, None]) | (
        (score[None, :] == score[:, None]) & (ids[None, :] < ids[:, None])
    )
    stronger = stronger & ok[None, :]
    d2 = jnp.where(stronger, d2, jnp.inf)
    radius = jnp.sqrt(d2.min(1))  # inf for the global maximum
    radius = jnp.where(ok, radius, -jnp.inf)
    _, idx = jax.lax.top_k(radius, k)
    keep = jnp.zeros_like(ok).at[idx].set(True)
    return keep & ok


def _sort_by_score(uv, score, ok):
    s = jnp.where(ok, score, -jnp.inf)
    order = jnp.argsort(-s)
    return uv[order], ok[order] & jnp.isfinite(s[order]), order


def _greedy_disk_count(uv_s, ok_s, radius):
    """Strongest-first greedy with exact disk suppression at `radius`.
    Returns (keep mask over sorted candidates, count). The covered state
    is a per-candidate boolean vector updated in one vectorized op per
    scan step (the batched equivalent of the reference's kd-tree /
    range-tree / SDC disk queries)."""
    m = uv_s.shape[0]
    r2 = radius * radius

    def step(carry, i):
        covered, count = carry
        keep = ok_s[i] & ~covered[i]
        d2 = jnp.sum((uv_s - uv_s[i]) ** 2, -1)
        covered = covered | (keep & (d2 < r2))
        return (covered, count + keep.astype(jnp.int32)), keep

    (_, count), keep = jax.lax.scan(
        step, (jnp.zeros(m, bool), jnp.int32(0)), jnp.arange(m)
    )
    return keep, count


def _greedy_ssc_count(uv_s, ok_s, width, cols, rows):
    """Strongest-first greedy with SSC square covering: cell size c =
    width/2, keeping a point covers the +-2-cell square around its cell
    (anms.h Ssc: the covering that makes SSC O(n) in the reference)."""
    c = jnp.maximum(width / 2.0, 1.0)
    m = uv_s.shape[0]
    G = _SSC_GRID
    gx_all = jnp.clip((uv_s[:, 0] / c).astype(jnp.int32), 0, G - 1)
    gy_all = jnp.clip((uv_s[:, 1] / c).astype(jnp.int32), 0, G - 1)
    gxs = jnp.arange(G)

    def step(carry, i):
        covered, count = carry  # covered: (G, G) bool
        gx, gy = gx_all[i], gy_all[i]
        keep = ok_s[i] & ~covered[gy, gx]
        patch = (jnp.abs(gxs[None, :] - gx) <= 2) & (
            jnp.abs(gxs[:, None] - gy) <= 2
        )
        covered = covered | (keep & patch)
        return (covered, count + keep.astype(jnp.int32)), keep

    (_, count), keep = jax.lax.scan(
        step, (jnp.zeros((G, G), bool), jnp.int32(0)), jnp.arange(m)
    )
    return keep, count


def _radius_search(uv, score, ok, k, cols, rows, greedy, tolerance=0.1):
    """Binary search for the suppression radius whose greedy keep-count
    lands on k (within +tolerance), then materialize the final selection.
    Matches the reference algorithms' solution search (anms.h:39-120);
    count decreases monotonically with radius."""
    uv_s, ok_s, order = _sort_by_score(uv, score, ok)
    diag = (cols**2 + rows**2) ** 0.5
    lo0, hi0 = 1.0, float(diag)

    def body(carry, _):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        _, count = greedy(uv_s, ok_s, mid)
        # Too many kept -> radius too small -> move lo up.
        hi_target = jnp.int32(round(k * (1.0 + tolerance)))
        too_many = count > hi_target
        lo = jnp.where(too_many, mid, lo)
        hi = jnp.where(too_many, hi, mid)
        return (lo, hi), count

    (lo, hi), _ = jax.lax.scan(
        body, (jnp.float32(lo0), jnp.float32(hi0)), None,
        length=_SEARCH_ITERS,
    )
    # lo is the largest probed radius whose count was > k*(1+tol):
    # materialize at the conservative end (hi keeps count <= target).
    keep_s, _ = greedy(uv_s, ok_s, hi)
    # Unsort and cap at exactly k strongest of the kept set.
    keep = jnp.zeros_like(ok).at[order].set(keep_s)
    s = jnp.where(keep & ok, score, -jnp.inf)
    _, idx = jax.lax.top_k(s, k)
    final = jnp.zeros_like(ok).at[idx].set(True)
    return final & keep & ok


def sdc(uv, score, ok, k, cols, rows, tolerance=0.1):
    """AnmsAlgorithmType::SDC / KdTree / RangeTree — radius binary search
    with exact disk suppression (one program for the three reference
    variants; see module docstring)."""
    return _radius_search(
        uv, score, ok, k, cols, rows, _greedy_disk_count, tolerance
    )


kd_tree = sdc
range_tree = sdc


def ssc(uv, score, ok, k, cols, rows, tolerance=0.1):
    """AnmsAlgorithmType::Ssc — suppression via square covering (the
    reference default, FrontendParams.yaml non_max_suppression_type: 6
    maps to binning; SSC is type 5)."""
    greedy = partial(_greedy_ssc_count, cols=cols, rows=rows)
    return _radius_search(uv, score, ok, k, cols, rows, greedy, tolerance)


def suppress_non_max(
    uv: jax.Array,
    score: jax.Array,
    ok: jax.Array,
    k: int,
    anms_type: int,
    cols: int,
    rows: int,
    tolerance: float = 0.1,
) -> jax.Array:
    """Dispatch mirroring AdaptiveNonMaximumSuppression::suppressNonMax.
    `anms_type` is static (selected at trace time from config, like the
    reference's construction-time algorithm choice). Type 6 (binning) is
    handled upstream by corner_detection.binned_topk_select on the dense
    response image."""
    if anms_type == 0:
        return top_n(score, ok, k)
    if anms_type == 1:
        return brown_anms(uv, score, ok, k)
    if anms_type in (2, 3, 4):
        return sdc(uv, score, ok, k, cols, rows, tolerance)
    if anms_type == 5:
        return ssc(uv, score, ok, k, cols, rows, tolerance)
    raise ValueError(f"unknown ANMS algorithm type {anms_type}")
