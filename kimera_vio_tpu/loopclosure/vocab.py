"""Binary bag-of-words vocabulary as tensors (the DBoW2 replacement).

The reference loads a pre-trained DBoW2 ORB vocabulary tree
(vocabulary/ORBvoc.yml, loaded in LoopClosureDetector.cpp:37-75) and
transforms descriptors by descending it. Here the vocabulary IS a tensor
program (SURVEY.md §2.12 "DBoW2 -> vocabulary-tree transform as
gather/matmul ops"):

  * a flat codebook of `n_words` binary centroids (equivalent accuracy to a
    k^L tree at this scale, and a single Hamming-argmin matmul-style kernel
    instead of a pointer-chasing tree descent),
  * k-majority training (binary k-means) from descriptors of the mission
    itself or any image set — `train_vocabulary`,
  * tf-idf-weighted, L1-normalized BoW vectors,
  * DBoW2 L1 similarity score s(v, w) = 1 - 0.5*|v - w|_1 batched against
    the whole keyframe database in one op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from kimera_vio_tpu.loopclosure.orb import hamming_matrix


def _unpack_bits(desc: jax.Array) -> jax.Array:
    """(N, 8) uint32 -> (N, 256) float32 in {0, 1}."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., None] >> shifts) & jnp.uint32(1)
    return bits.reshape(desc.shape[0], -1).astype(jnp.float32)


def _pack_bits(bits: jax.Array) -> jax.Array:
    """(N, 256) {0,1} -> (N, 8) uint32."""
    b = bits.astype(jnp.uint32).reshape(bits.shape[0], -1, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def train_vocabulary(
    descs: jax.Array,  # (M, 8) uint32 training descriptors
    mask: jax.Array,
    n_words: int = 512,
    iters: int = 8,
    seed: int = 0,
):
    """k-majority clustering of binary descriptors. Returns the codebook
    (n_words, 8) uint32."""
    key = jax.random.PRNGKey(seed)
    M = descs.shape[0]
    p = mask.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1e-9)
    init_idx = jax.random.choice(key, M, shape=(n_words,), replace=True, p=p)
    centers = descs[init_idx]

    def step(centers, _):
        d = hamming_matrix(descs, centers)  # (M, n_words)
        d = jnp.where(mask[:, None], d, 1 << 20)
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, centers.shape[0]) * mask[:, None]
        counts = onehot.sum(0)  # (n_words,)
        bits = _unpack_bits(descs)  # (M, 256)
        sums = onehot.T @ bits  # (n_words, 256)
        maj = sums > 0.5 * jnp.maximum(counts[:, None], 1e-9)
        new_centers = _pack_bits(maj)
        # Keep old center for empty clusters.
        keep_old = (counts < 1)[:, None]
        return jnp.where(keep_old, centers, new_centers), None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    return centers


class BowVocabulary:
    """Codebook + idf weights + BoW transform/scoring."""

    def __init__(self, codebook: jax.Array, idf: jax.Array | None = None):
        self.codebook = codebook  # (W, 8) uint32
        self.n_words = codebook.shape[0]
        self.idf = (
            idf if idf is not None else jnp.ones(self.n_words, jnp.float32)
        )

    def transform(self, desc: jax.Array, mask: jax.Array) -> jax.Array:
        """Descriptors -> L1-normalized tf-idf BoW vector (W,)."""
        d = hamming_matrix(desc, self.codebook)  # (N, W)
        word = jnp.argmin(d, axis=1)
        tf = (
            jnp.zeros(self.n_words, jnp.float32)
            .at[word]
            .add(mask.astype(jnp.float32))
        )
        v = tf * self.idf
        return v / jnp.maximum(jnp.abs(v).sum(), 1e-9)

    @staticmethod
    def score(v: jax.Array, db: jax.Array) -> jax.Array:
        """DBoW2 L1 score of v (W,) against db (K, W): 1 - 0.5*|v-w|_1
        (both L1-normalized)."""
        return 1.0 - 0.5 * jnp.abs(v[None, :] - db).sum(-1)

    # ---- host (numpy) twins: the keyframe-rate BoW bookkeeping is tiny
    # (256 descriptors x 256 words), so on a remote-device platform the
    # dispatch round trips cost 100x the math — the LCD hot loop uses
    # these, keeping the device for the image-scale work. ----
    def transform_np(self, desc, mask) -> np.ndarray:
        desc = np.ascontiguousarray(np.asarray(desc), dtype=np.uint32)
        cb = np.ascontiguousarray(np.asarray(self.codebook), dtype=np.uint32)
        d = np.bitwise_count(
            np.bitwise_xor(desc[:, None, :], cb[None, :, :])
        ).sum(-1)
        word = d.argmin(1)
        tf = np.zeros(self.n_words, np.float32)
        np.add.at(tf, word, np.asarray(mask).astype(np.float32))
        v = tf * np.asarray(self.idf)
        return (v / max(float(np.abs(v).sum()), 1e-9)).astype(np.float32)

    @staticmethod
    def score_np(v, db) -> np.ndarray:
        return 1.0 - 0.5 * np.abs(np.asarray(v)[None, :] - np.asarray(db)).sum(-1)

    # ---- persistence (the role of the reference's ORBvoc.yml load,
    # LoopClosureDetector.cpp:37-75; npz instead of the 100MB yml) ----
    def save(self, path: str):
        import numpy as np

        np.savez(
            path,
            codebook=np.asarray(self.codebook),
            idf=np.asarray(self.idf),
        )

    @classmethod
    def load(cls, path: str) -> "BowVocabulary":
        import numpy as np

        d = np.load(path)
        return cls(jnp.asarray(d["codebook"]), jnp.asarray(d["idf"]))
