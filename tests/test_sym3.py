"""Closed-form symmetric-3x3 primitives vs dense linear-algebra oracles.

The round-4 lane-major backend rewrite replaced batched LU / eigvalsh in
the smart-factor Schur elimination and triangulation with closed-form
component-plane math (`ops/triangulation.py::_sym3_inv_apply` /
`_sym3_min_eig`); these tests pin them against numpy double-precision
oracles across well- and ill-conditioned inputs (reference analogy: the
hand-unrolled 3x3 inverse in Tracker.cpp:497-542 plays the same role).
"""

import numpy as np
import pytest

from kimera_vio_tpu.ops.triangulation import _sym3_inv_apply, _sym3_min_eig


def _random_spd(rng, n, cond=1e3):
    """(n,3,3) SPD matrices with log-uniform eigenvalues up to `cond`."""
    out = np.empty((n, 3, 3))
    for i in range(n):
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        eigs = np.exp(rng.uniform(0, np.log(cond), size=3))
        out[i] = (q * eigs) @ q.T
    return out


def _comps(A):
    return A[:, 0, 0], A[:, 0, 1], A[:, 0, 2], A[:, 1, 1], A[:, 1, 2], A[:, 2, 2]


def test_sym3_inv_apply_matches_solve():
    rng = np.random.default_rng(0)
    A = _random_spd(rng, 200, cond=1e3)
    g = rng.standard_normal((200, 3))
    a, b, c, d, e, f = [x.astype(np.float32) for x in _comps(A)]
    x0, x1, x2 = _sym3_inv_apply(
        a, b, c, d, e, f, *(g.T.astype(np.float32))
    )
    x = np.stack([np.asarray(x0), np.asarray(x1), np.asarray(x2)], -1)
    ref = np.linalg.solve(A, g[..., None])[..., 0]
    # f32 with cond up to 1e3: relative error well under 1e-3.
    rel = np.abs(x - ref) / np.maximum(np.abs(ref), 1e-6)
    assert np.median(rel) < 1e-5
    assert rel.max() < 5e-3


def test_sym3_inv_apply_scale_invariance():
    """Trace normalization keeps huge/tiny scales finite in f32 (the
    1e-6-prior-only landmark case: A = 1e-6 I)."""
    for scale in (1e-6, 1.0, 1e6):
        A = (np.eye(3) * scale).astype(np.float32)
        x = _sym3_inv_apply(
            A[0, 0], A[0, 1], A[0, 2], A[1, 1], A[1, 2], A[2, 2],
            np.float32(scale), np.float32(0.0), np.float32(0.0),
        )
        np.testing.assert_allclose(np.asarray(x[0]), 1.0, rtol=1e-5)
        assert np.isfinite(np.asarray(x)).all()


def test_sym3_min_eig_matches_eigvalsh():
    rng = np.random.default_rng(1)
    A = _random_spd(rng, 200, cond=1e4)
    a, b, c, d, e, f = [x.astype(np.float32) for x in _comps(A)]
    lam = np.asarray(_sym3_min_eig(a, b, c, d, e, f))
    ref = np.linalg.eigvalsh(A)[:, 0]
    # f32 Cardano + clamped Newton polish: error is relative to the matrix
    # scale (trace), with a ~5e-4*tr worst case at near-double eigenvalues
    # (f32 cancellation no polish can fix). The rankTolerance gate this
    # feeds compares a count-normalized eigenvalue against 1e-5 — only
    # landmarks already inside the noise band of the gate can flip.
    tr = np.trace(A, axis1=1, axis2=2)
    err = np.abs(lam - ref)
    assert np.median(err / tr) < 1e-6
    assert np.all(err <= 5e-4 * tr + 1e-6)


def test_sym3_min_eig_isotropic_and_rank_deficient():
    # A = q*I: p == 0 branch.
    lam = np.asarray(
        _sym3_min_eig(*[np.float32(v) for v in (2.0, 0.0, 0.0, 2.0, 0.0, 2.0)])
    )
    np.testing.assert_allclose(lam, 2.0, rtol=1e-6)
    # Rank-2 projector (the single-ray triangulation case): min eig 0.
    d = np.array([0.6, 0.0, 0.8])
    P = np.eye(3) - np.outer(d, d)
    lam = np.asarray(
        _sym3_min_eig(
            *[np.float32(v) for v in (P[0, 0], P[0, 1], P[0, 2], P[1, 1], P[1, 2], P[2, 2])]
        )
    )
    assert abs(lam) < 1e-6


@pytest.mark.lane2
def test_triangulate_rays_oracle_parity():
    """triangulate_stereo_landmarks' closed-form normal-equation path
    agrees with the generic triangulate_rays oracle on a toy scene."""
    import jax.numpy as jnp

    from kimera_vio_tpu.ops.triangulation import (
        triangulate_rays,
        triangulate_stereo_landmarks,
    )

    rng = np.random.default_rng(2)
    K = 4
    fx = fy = 450.0
    cx, cy = 376.0, 240.0
    baseline = 0.11
    pts_w = rng.uniform([-1, -1, 3], [1, 1, 6], size=(8, 3))
    t = np.stack([np.array([0.3 * k, 0.0, 0.0]) for k in range(K)])
    R = np.tile(np.eye(3)[None], (K, 1, 1))
    obs = np.full((8, K, 3), np.nan, np.float64)
    for l in range(8):
        for k in range(K):
            pc = pts_w[l] - t[k]
            obs[l, k, 0] = fx * pc[0] / pc[2] + cx
            obs[l, k, 1] = fx * (pc[0] - baseline) / pc[2] + cx
            obs[l, k, 2] = fy * pc[1] / pc[2] + cy
    mask = np.ones((8, K), bool)
    p, valid, err = triangulate_stereo_landmarks(
        jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32),
        jnp.asarray(obs, jnp.float32), jnp.asarray(mask),
        fx=fx, fy=fy, cx=cx, cy=cy, baseline=baseline,
    )
    assert np.asarray(valid).all()
    np.testing.assert_allclose(np.asarray(p), pts_w, atol=2e-3)
    assert np.asarray(err).max() < 0.5

    # Cross-check the closed-form normal equations against the generic
    # ray least-squares oracle (left rays only, no polish).
    dirs = pts_w[:, None] - t[None]
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = np.broadcast_to(t[None], (8, K, 3))
    p_ref, ok_ref, _ = triangulate_rays(
        jnp.asarray(o, jnp.float32), jnp.asarray(dirs, jnp.float32),
        jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(p_ref), pts_w, atol=2e-3)
