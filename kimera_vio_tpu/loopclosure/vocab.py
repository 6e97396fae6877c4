"""Binary bag-of-words vocabulary as tensors (the DBoW2 replacement).

The reference loads a pre-trained DBoW2 ORB vocabulary tree
(vocabulary/ORBvoc.yml, loaded in LoopClosureDetector.cpp:37-75) and
transforms descriptors by descending it. Here the vocabulary IS a tensor
program (SURVEY.md §2.12 "DBoW2 -> vocabulary-tree transform as
gather/matmul ops"):

  * `BowVocabulary`: a flat codebook of `n_words` binary centroids —
    a single Hamming-argmin matmul-style kernel (small vocabularies),
  * `HierarchicalBowVocabulary`: a complete k-ary tree of binary
    centroids (DBoW2's k^L structure; ORBvoc is k=10, L=6). The descent
    is a per-level batched gather + k-way Hamming argmin, so a 4096-leaf
    transform costs k*L = 32 centroid comparisons per descriptor instead
    of 4096,
  * k-majority training (binary k-means) — flat `train_vocabulary` (JAX)
    and recursive `train_hierarchical_vocabulary` (host, training-time
    only),
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


# ---------------------------------------------------------------------------
# Hierarchical (k^L) vocabulary — the DBoW2 tree structure
# ---------------------------------------------------------------------------


def _popcount_np(x: np.ndarray) -> np.ndarray:
    return np.bitwise_count(x)


def _hamming_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, 8) x (M, 8) uint32 -> (N, M) int popcount distances."""
    return _popcount_np(
        np.bitwise_xor(a[:, None, :], b[None, :, :])
    ).sum(-1)


def _kmajority_np(descs, k, iters, rng):
    """Host k-majority over (M, 8) uint32 rows; returns (k, 8) centers.

    Empty clusters keep their previous center (same policy as the JAX
    `train_vocabulary`)."""
    M = descs.shape[0]
    if M == 0:
        return np.zeros((k, 8), np.uint32)
    centers = descs[rng.choice(M, size=k, replace=M < k)]
    bits = np.unpackbits(
        descs.view(np.uint8), axis=1, bitorder="little"
    ).astype(np.float32)
    for _ in range(iters):
        assign = _hamming_np(descs, centers).argmin(1)
        counts = np.bincount(assign, minlength=k).astype(np.float32)
        sums = np.zeros((k, 256), np.float32)
        np.add.at(sums, assign, bits)
        maj = sums > 0.5 * np.maximum(counts[:, None], 1e-9)
        new = np.packbits(
            maj.astype(np.uint8), axis=1, bitorder="little"
        ).view(np.uint32)
        centers = np.where(counts[:, None] < 1, centers, new)
    return np.ascontiguousarray(centers, np.uint32)


def train_hierarchical_vocabulary(
    descs: np.ndarray,  # (M, 8) uint32 training descriptors
    mask: np.ndarray,
    k: int = 8,
    depth: int = 4,
    iters: int = 6,
    seed: int = 0,
) -> list[np.ndarray]:
    """Recursive k-majority over a complete k-ary tree (the DBoW2
    training scheme, hierarchical binary k-means). Returns per-level
    centroid arrays: levels[l] has shape (k**(l+1), 8) — the children of
    node n at level l are rows n*k .. n*k+k-1 of levels[l].

    Nodes that receive no descriptors inherit duplicated parent rows so
    the descent stays well-defined (ties resolve by argmin order)."""
    rng = np.random.default_rng(seed)
    descs = np.ascontiguousarray(
        np.asarray(descs, np.uint32)[np.asarray(mask, bool)]
    )
    levels: list[np.ndarray] = []
    # assign[i] = node index of descriptor i at the current level.
    assign = np.zeros(descs.shape[0], np.int64)
    n_nodes = 1
    for lvl in range(depth):
        centers = np.zeros((n_nodes * k, 8), np.uint32)
        new_assign = np.zeros_like(assign)
        for node in range(n_nodes):
            sel = assign == node
            sub = descs[sel]
            if sub.shape[0] == 0:
                # Propagate the parent centroid into every child slot.
                if lvl > 0:
                    centers[node * k : node * k + k] = levels[lvl - 1][node]
                continue
            c = _kmajority_np(sub, k, iters, rng)
            centers[node * k : node * k + k] = c
            new_assign[sel] = node * k + _hamming_np(sub, c).argmin(1)
        levels.append(centers)
        assign = new_assign
        n_nodes *= k
    return levels


class HierarchicalBowVocabulary:
    """DBoW2-structured k^L vocabulary tree. Same interface as
    `BowVocabulary` (n_words / transform / transform_np / score / save /
    load) so the LCD is agnostic to which it gets.

    The reference ships ORBvoc (k=10, L=6, ~1M leaves) trained on ~10k
    independent images; this environment has no such corpus, so packaged
    trees are trained on the available EuRoC-format frames — smaller but
    structurally identical (see scripts/build_vocab.py --tree)."""

    def __init__(self, levels, idf=None):
        self.levels = [
            np.ascontiguousarray(np.asarray(l), np.uint32) for l in levels
        ]
        self.k = int(self.levels[0].shape[0])
        self.depth = len(self.levels)
        self.n_words = int(self.levels[-1].shape[0])
        self.idf = (
            np.ones(self.n_words, np.float32)
            if idf is None
            else np.asarray(idf, np.float32)
        )
        self._levels_j = None  # lazy jnp copies for the device twin

    # ---- leaf assignment -------------------------------------------------
    def words_np(self, desc) -> np.ndarray:
        """(N, 8) uint32 -> (N,) leaf/word ids by tree descent."""
        desc = np.ascontiguousarray(np.asarray(desc), np.uint32)
        N = desc.shape[0]
        cur = np.zeros(N, np.int64)
        for centers in self.levels:
            cand = centers.reshape(-1, self.k, 8)[cur]  # (N, k, 8)
            d = _popcount_np(np.bitwise_xor(desc[:, None, :], cand)).sum(-1)
            cur = cur * self.k + d.argmin(1)
        return cur

    def transform_np(self, desc, mask) -> np.ndarray:
        word = self.words_np(desc)
        tf = np.zeros(self.n_words, np.float32)
        np.add.at(tf, word, np.asarray(mask).astype(np.float32))
        v = tf * self.idf
        return (v / max(float(np.abs(v).sum()), 1e-9)).astype(np.float32)

    # ---- device twin (used by jitted callers; math identical) ------------
    def transform(self, desc: jax.Array, mask: jax.Array) -> jax.Array:
        from kimera_vio_tpu.loopclosure.orb import hamming_matrix

        if self._levels_j is None:
            self._levels_j = [jnp.asarray(l) for l in self.levels]
            self._idf_j = jnp.asarray(self.idf)
        N = desc.shape[0]
        cur = jnp.zeros(N, jnp.int32)
        for centers in self._levels_j:
            cand = centers.reshape(-1, self.k, 8)[cur]  # (N, k, 8)
            d = jax.vmap(lambda q, c: hamming_matrix(q[None], c)[0])(
                desc, cand
            )
            cur = cur * self.k + jnp.argmin(d, axis=1).astype(jnp.int32)
        tf = (
            jnp.zeros(self.n_words, jnp.float32)
            .at[cur]
            .add(mask.astype(jnp.float32))
        )
        v = tf * self._idf_j
        return v / jnp.maximum(jnp.abs(v).sum(), 1e-9)

    score = staticmethod(BowVocabulary.score)
    score_np = staticmethod(BowVocabulary.score_np)

    # ---- persistence ------------------------------------------------------
    def save(self, path: str):
        arrays = {f"level_{i}": l for i, l in enumerate(self.levels)}
        np.savez_compressed(path, idf=self.idf, tree_k=self.k, **arrays)

    @classmethod
    def load(cls, path: str) -> "HierarchicalBowVocabulary":
        d = np.load(path)
        levels = [d[f"level_{i}"] for i in range(
            sum(1 for k in d.files if k.startswith("level_"))
        )]
        return cls(levels, d["idf"])


def load_vocabulary(path: str):
    """Open either vocabulary format (the ORBvoc.yml-load role)."""
    d = np.load(path)
    if any(k.startswith("level_") for k in d.files):
        return HierarchicalBowVocabulary.load(path)
    return BowVocabulary.load(path)


def compute_idf(per_frame_words: list[np.ndarray], n_words: int) -> np.ndarray:
    """DBoW2 tf-idf weighting: idf_i = log(N_frames / n_frames_containing_i)
    (TemplatedVocabulary::create weighting=TF_IDF)."""
    df = np.zeros(n_words, np.float64)
    for w in per_frame_words:
        df[np.unique(w)] += 1.0
    n = max(len(per_frame_words), 1)
    return np.where(
        df > 0, np.log(n / np.maximum(df, 1e-9)), 0.0
    ).astype(np.float32)
