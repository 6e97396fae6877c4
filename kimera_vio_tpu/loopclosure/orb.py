"""Oriented binary (ORB-class) descriptors + Hamming matching in JAX.

TPU-native stand-in for the cv::ORB extraction the reference LCD uses
(reference src/loopclosure/LoopClosureDetector.cpp:142-150): oriented BRIEF
over a smoothed patch — intensity-centroid orientation, a fixed 256-pair
comparison pattern rotated per keypoint, bits packed into 8x uint32.

This is the "deliberate substitution documented against
LoopClosureDetector.cpp:142-154" flagged in SURVEY.md §7: bit-exact OpenCV
ORB parity is impossible on TPU (OpenCV's learned pattern + pyramid
details), but the descriptor class is the same (256-bit oriented binary on
31x31 patches), so downstream BoW/matching semantics carry over. Matching
uses XOR + `lax.population_count` — an [N, M] integer kernel on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from kimera_vio_tpu.ops.corner_detection import _conv2d

PATCH = 31  # descriptor patch (cv::ORB patchSize)
HALF = PATCH // 2
N_BITS = 256
N_WORDS = N_BITS // 32


def _brief_pattern(seed: int = 11) -> np.ndarray:
    """(256, 4) sampling-pair coordinates in [-13, 13]^2 (Gaussian, like the
    BRIEF-32 construction ORB's learned pattern approximates)."""
    rng = np.random.default_rng(seed)
    pts = np.clip(rng.normal(0, PATCH / 5.0, (N_BITS, 4)), -HALF + 2, HALF - 2)
    return pts.astype(np.float32)


_PATTERN = _brief_pattern()


def _gaussian_blur(img: jax.Array) -> jax.Array:
    k = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0
    return _conv2d(_conv2d(img, k[:, None]), k[None, :])


def orb_descriptors(
    img: jax.Array,  # (H, W) float32
    uv: jax.Array,  # (N, 2) keypoints
    mask: jax.Array,  # (N,)
):
    """Returns (desc (N, 8) uint32, angles (N,), ok (N,))."""
    H, W = img.shape
    blurred = _gaussian_blur(img.astype(jnp.float32))
    pat = jnp.asarray(_PATTERN)

    # circular-ish mask for the orientation moments
    ys, xs = jnp.meshgrid(
        jnp.arange(-HALF, HALF + 1, dtype=jnp.float32),
        jnp.arange(-HALF, HALF + 1, dtype=jnp.float32),
        indexing="ij",
    )
    circ = (xs**2 + ys**2) <= HALF**2

    def one(center, ok):
        x0 = jnp.clip(center[0].astype(jnp.int32) - HALF, 0, W - PATCH - 1)
        y0 = jnp.clip(center[1].astype(jnp.int32) - HALF, 0, H - PATCH - 1)
        patch = jax.lax.dynamic_slice(blurred, (y0, x0), (PATCH, PATCH))
        # Intensity centroid orientation (Rosin moments).
        pm = patch * circ
        m00 = jnp.sum(pm)
        m10 = jnp.sum(pm * xs)
        m01 = jnp.sum(pm * ys)
        angle = jnp.arctan2(m01, m10)
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        # Rotate the pattern, sample with bilinear interp inside the patch.
        rot = jnp.stack(
            [
                pat[:, 0] * ca - pat[:, 1] * sa,
                pat[:, 0] * sa + pat[:, 1] * ca,
                pat[:, 2] * ca - pat[:, 3] * sa,
                pat[:, 2] * sa + pat[:, 3] * ca,
            ],
            axis=-1,
        )

        def sample(px, py):
            fx = jnp.clip(px + HALF, 0.0, PATCH - 1.001)
            fy = jnp.clip(py + HALF, 0.0, PATCH - 1.001)
            x0i = jnp.floor(fx).astype(jnp.int32)
            y0i = jnp.floor(fy).astype(jnp.int32)
            wx = fx - x0i
            wy = fy - y0i
            v00 = patch[y0i, x0i]
            v01 = patch[y0i, x0i + 1]
            v10 = patch[y0i + 1, x0i]
            v11 = patch[y0i + 1, x0i + 1]
            return (
                v00 * (1 - wx) * (1 - wy)
                + v01 * wx * (1 - wy)
                + v10 * (1 - wx) * wy
                + v11 * wx * wy
            )

        a = sample(rot[:, 0], rot[:, 1])
        b = sample(rot[:, 2], rot[:, 3])
        bits = (a < b).astype(jnp.uint32)  # (256,)
        words = bits.reshape(N_WORDS, 32)
        shifts = jnp.arange(32, dtype=jnp.uint32)
        packed = jnp.sum(words << shifts[None, :], axis=-1, dtype=jnp.uint32)
        return packed, angle

    desc, angles = jax.vmap(one)(uv, mask)
    inb = (
        (uv[:, 0] >= HALF)
        & (uv[:, 0] < W - HALF)
        & (uv[:, 1] >= HALF)
        & (uv[:, 1] < H - HALF)
    )
    return desc, angles, mask & inb


def hamming_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise Hamming distances between packed descriptors
    (N,8)x(M,8) uint32 -> (N,M) int32."""
    x = a[:, None, :] ^ b[None, :, :]
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def match_descriptors(
    desc_a: jax.Array,
    mask_a: jax.Array,
    desc_b: jax.Array,
    mask_b: jax.Array,
    *,
    lowe_ratio: float = 0.7,
    max_distance: int = 64,
):
    """Lowe-ratio nearest-neighbor matching (the reference's
    DescriptorMatcher step, LoopClosureDetector.cpp verifyAndRecoverPose).

    Returns (idx_b (N,), ok (N,)): for each masked descriptor in A, its
    best match in B passing the ratio + absolute-distance tests."""
    d = hamming_matrix(desc_a, desc_b)
    big = jnp.int32(512)
    d = jnp.where(mask_b[None, :], d, big)
    best = jnp.argmin(d, axis=1)
    take = lambda m, i: jnp.take_along_axis(m, i[:, None], axis=1)[:, 0]
    d1 = take(d, best)
    d_no_best = d.at[jnp.arange(d.shape[0]), best].set(big)
    d2 = jnp.min(d_no_best, axis=1)
    ok = (
        mask_a
        & (d1 <= max_distance)
        & (d1.astype(jnp.float32) < lowe_ratio * d2.astype(jnp.float32))
    )
    return best, ok
