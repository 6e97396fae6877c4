#!/usr/bin/env python
"""Build a pretrained BoW codebook from a EuRoC-format dataset's images
(the role of shipping DBoW2's ORBvoc.yml: a sequence-independent
vocabulary; here trained with k-majority over ORB-class descriptors from
dataset frames and saved as a small npz)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", help="EuRoC mav0 folder")
    ap.add_argument("out", help="output npz path")
    ap.add_argument("--n-words", type=int, default=256)
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--max-frames", type=int, default=40)
    ap.add_argument("--features", type=int, default=256,
                    help="detector budget per frame")
    ap.add_argument("--max-desc", type=int, default=0,
                    help="subsample the training set to this many "
                    "descriptors (0 = keep all)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--use-right", action="store_true",
                    help="also harvest descriptors from cam1")
    ap.add_argument("--tree", action="store_true",
                    help="train a hierarchical k^L tree (DBoW2 ORBvoc "
                    "structure) instead of a flat codebook")
    ap.add_argument("--branching", type=int, default=8,
                    help="tree branching factor k")
    ap.add_argument("--depth", type=int, default=4,
                    help="tree depth L (n_words = k**L)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from kimera_vio_tpu.dataprovider.euroc import EurocDataProvider
    from kimera_vio_tpu.loopclosure import orb as orb_mod
    from kimera_vio_tpu.loopclosure.vocab import (
        BowVocabulary,
        HierarchicalBowVocabulary,
        compute_idf,
        train_hierarchical_vocabulary,
        train_vocabulary,
    )
    from kimera_vio_tpu.ops import corner_detection as det

    prov = EurocDataProvider(args.dataset)
    descs, masks = [], []
    packets = list(prov.frames())[:: args.stride][: args.max_frames]

    def harvest(img_np):
        img = jnp.asarray(img_np).astype(jnp.float32)
        uv, ok = det.detect_features(
            img, jnp.zeros((8, 2), jnp.float32), jnp.zeros(8, bool),
            args.features, min_distance=8.0, do_subpixel=False,
        )
        d, _, dok = orb_mod.orb_descriptors(img, uv, ok)
        descs.append(np.asarray(d))
        masks.append(np.asarray(dok))

    for p in packets:
        harvest(prov.load_image(p["left_path"]))
        if args.use_right and "right_path" in p:
            harvest(prov.load_image(p["right_path"]))
    all_d = np.concatenate(descs)
    all_m = np.concatenate(masks)
    if args.max_desc and all_m.sum() > args.max_desc:
        idx = np.flatnonzero(all_m)
        keep = np.random.default_rng(0).choice(
            idx, size=args.max_desc, replace=False
        )
        all_d, all_m = all_d[keep], all_m[keep]
    if args.tree:
        levels = train_hierarchical_vocabulary(
            all_d, all_m,
            k=args.branching, depth=args.depth, iters=args.iters,
        )
        vocab = HierarchicalBowVocabulary(levels)
        # tf-idf weights from the training frames (DBoW2 TF_IDF default).
        per_frame = [
            vocab.words_np(d[m]) for d, m in zip(descs, masks) if m.any()
        ]
        vocab.idf = compute_idf(per_frame, vocab.n_words)
        vocab.save(args.out)
        n_words = vocab.n_words
    else:
        cb = train_vocabulary(
            jnp.asarray(all_d),
            jnp.asarray(all_m),
            n_words=args.n_words,
            iters=args.iters,
        )
        BowVocabulary(cb).save(args.out)
        n_words = args.n_words
    print(f"saved {args.out}: {n_words} words from "
          f"{sum(m.sum() for m in masks)} descriptors / {len(packets)} frames")


if __name__ == "__main__":
    main()
