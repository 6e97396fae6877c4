"""Hierarchical (k^L) vocabulary tree: training, descent, idf, and
format round-trip — the DBoW2 TemplatedVocabulary role
(reference loads ORBvoc.yml k=10/L=6 in LoopClosureDetector.cpp:37-75).
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from kimera_vio_tpu.loopclosure.vocab import (
    BowVocabulary,
    HierarchicalBowVocabulary,
    compute_idf,
    load_vocabulary,
    train_hierarchical_vocabulary,
)


def _random_descs(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def _clustered_descs(rng, n_clusters, per_cluster, flip_bits=8):
    """Descriptors in tight Hamming balls around random prototypes."""
    protos = _random_descs(rng, n_clusters)
    out = []
    labels = []
    for c in range(n_clusters):
        for _ in range(per_cluster):
            d = protos[c].copy()
            bits = rng.choice(256, size=flip_bits, replace=False)
            for b in bits:
                d[b // 32] ^= np.uint32(1 << (b % 32))
            out.append(d)
            labels.append(c)
    return protos, np.stack(out), np.asarray(labels)


def test_tree_shapes_and_descent():
    rng = np.random.default_rng(0)
    descs = _random_descs(rng, 2000)
    mask = np.ones(2000, bool)
    levels = train_hierarchical_vocabulary(descs, mask, k=4, depth=3, iters=4)
    assert [l.shape for l in levels] == [(4, 8), (16, 8), (64, 8)]
    vocab = HierarchicalBowVocabulary(levels)
    assert vocab.n_words == 64
    words = vocab.words_np(descs)
    assert words.shape == (2000,)
    assert (words >= 0).all() and (words < 64).all()
    # A healthy tree spreads random descriptors over many leaves.
    assert len(np.unique(words)) > 16


def test_tree_separates_clusters():
    """Descriptors from the same tight cluster map to the same leaf;
    different clusters land on (mostly) different leaves."""
    rng = np.random.default_rng(1)
    protos, descs, labels = _clustered_descs(rng, 32, 24, flip_bits=6)
    mask = np.ones(descs.shape[0], bool)
    levels = train_hierarchical_vocabulary(descs, mask, k=4, depth=3, iters=6)
    vocab = HierarchicalBowVocabulary(levels)
    words = vocab.words_np(descs)
    # Intra-cluster purity: the dominant leaf captures most of a cluster.
    purities = []
    for c in range(32):
        w = words[labels == c]
        purities.append(np.bincount(w).max() / w.size)
    assert np.mean(purities) > 0.85
    # Distinct clusters use a healthy number of distinct dominant leaves.
    dom = [np.bincount(words[labels == c]).argmax() for c in range(32)]
    assert len(set(dom)) >= 20


def test_transform_np_matches_jax():
    rng = np.random.default_rng(2)
    descs = _random_descs(rng, 512)
    mask = rng.random(512) < 0.9
    levels = train_hierarchical_vocabulary(
        descs, np.ones(512, bool), k=4, depth=3, iters=3
    )
    idf = rng.random(64).astype(np.float32) + 0.5
    vocab = HierarchicalBowVocabulary(levels, idf)
    v_np = vocab.transform_np(descs, mask)
    v_j = np.asarray(vocab.transform(jnp.asarray(descs), jnp.asarray(mask)))
    assert v_np.shape == (64,)
    np.testing.assert_allclose(v_np, v_j, atol=1e-6)
    assert abs(v_np.sum() - 1.0) < 1e-5


def test_save_load_roundtrip_and_format_dispatch(tmp_path):
    rng = np.random.default_rng(3)
    descs = _random_descs(rng, 300)
    levels = train_hierarchical_vocabulary(
        descs, np.ones(300, bool), k=4, depth=2, iters=3
    )
    vocab = HierarchicalBowVocabulary(levels, np.arange(16, dtype=np.float32))
    p = str(tmp_path / "tree.npz")
    vocab.save(p)
    back = load_vocabulary(p)
    assert isinstance(back, HierarchicalBowVocabulary)
    assert back.n_words == 16 and back.k == 4 and back.depth == 2
    for a, b in zip(vocab.levels, back.levels):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(vocab.idf, back.idf)
    # Flat format still dispatches to BowVocabulary.
    flat = BowVocabulary(jnp.asarray(descs[:16]))
    pf = str(tmp_path / "flat.npz")
    flat.save(pf)
    assert isinstance(load_vocabulary(pf), BowVocabulary)


def test_compute_idf():
    # word 0 in every frame -> idf 0; word 3 in one of four -> log 4.
    frames = [np.array([0, 3]), np.array([0]), np.array([0]), np.array([0])]
    idf = compute_idf(frames, 5)
    assert idf[0] == pytest.approx(0.0)
    assert idf[3] == pytest.approx(np.log(4.0), rel=1e-5)
    assert idf[4] == 0.0  # never seen


def test_packaged_tree_vocab_loads():
    """The shipped default vocabulary must load and transform."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "kimera_vio_tpu", "data", "bow_vocab_tree_4096.npz",
    )
    if not os.path.exists(path):
        pytest.skip("packaged tree vocab not built yet")
    vocab = load_vocabulary(path)
    assert isinstance(vocab, HierarchicalBowVocabulary)
    assert vocab.n_words == 4096
    rng = np.random.default_rng(4)
    v = vocab.transform_np(_random_descs(rng, 64), np.ones(64, bool))
    assert v.shape == (4096,) and np.isfinite(v).all()
