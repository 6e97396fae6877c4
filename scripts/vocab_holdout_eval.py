#!/usr/bin/env python
"""Held-out real-imagery vocabulary evaluation (round-4 verdict #10).

The packaged vocabularies are trained on MicroEuroc **cam0** frames
(scripts/build_vocab.py); this harness evaluates retrieval on **cam1**
— held-out imagery of the same scene from a different viewpoint — under
photometric (gamma / brightness / noise) and viewpoint (rotation +
scale warp) perturbations, the disturbance classes a revisit actually
presents (DBoW2's evaluation protocol class; the reference ships
ORBvoc pre-validated the same way upstream).

Protocol: every 5th cam1 frame is a database "place" (19 places);
every remaining frame, under each perturbation, queries the database
with the DBoW2 L1 score. A query is correct when the top-scoring place
is within +-3 frames of the query's true position in the sequence
(MicroEuroc moves gently, so neighbouring frames see the same scene
patch). Reported per vocabulary: top-1 accuracy per perturbation, and
the mean top1-top2 score margin (discriminativity).

Run: python scripts/vocab_holdout_eval.py [vocab.npz ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

MICRO = "/root/reference/tests/data/MicroEurocDataset/mav0/cam1/data"


def perturbations():
    import cv2

    def photometric(img, gamma, bright, noise_std, seed):
        x = (img.astype(np.float32) / 255.0) ** gamma * 255.0 + bright
        if noise_std:
            x = x + np.random.default_rng(seed).normal(
                0, noise_std, img.shape
            )
        return np.clip(x, 0, 255).astype(np.uint8)

    def viewpoint(img, angle_deg, scale):
        h, w = img.shape
        M = cv2.getRotationMatrix2D((w / 2, h / 2), angle_deg, scale)
        return cv2.warpAffine(
            img, M, (w, h), flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_REFLECT,
        )

    return {
        "gamma0.7": lambda im, k: photometric(im, 0.7, 0, 0, k),
        "gamma1.4+b20": lambda im, k: photometric(im, 1.4, 20, 0, k),
        "noise_s4": lambda im, k: photometric(im, 1.0, 0, 4.0, k),
        "rot4_s0.95": lambda im, k: viewpoint(im, 4.0, 0.95),
        "rot-6": lambda im, k: viewpoint(im, -6.0, 1.0),
    }


def main():
    import cv2

    from kimera_vio_tpu.loopclosure import orb as orb_mod
    from kimera_vio_tpu.loopclosure.vocab import load_vocabulary
    from kimera_vio_tpu.ops import corner_detection as det

    names = sorted(os.listdir(MICRO))
    frames = [
        cv2.imread(os.path.join(MICRO, n), cv2.IMREAD_GRAYSCALE)
        for n in names
    ]
    n = len(frames)
    place_ids = list(range(0, n, 5))

    detect = jax.jit(
        lambda im: det.detect_features(
            im, jnp.zeros((8, 2), jnp.float32), jnp.zeros(8, bool),
            256, min_distance=12.0, do_subpixel=False,
        )
    )
    orb = jax.jit(orb_mod.orb_descriptors)

    def extract(img):
        im = jnp.asarray(img, jnp.float32)
        uv, ok = detect(im)
        desc, _, dok = orb(im, uv, ok)
        return np.asarray(desc), np.asarray(dok)

    perts = perturbations()
    print(f"extracting: {n} frames x {1 + len(perts)} variants", flush=True)
    base_feats = [extract(f) for f in frames]
    pert_feats = {
        pn: [extract(fn(f, i)) for i, f in enumerate(frames)]
        for pn, fn in perts.items()
    }

    data = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "kimera_vio_tpu", "data",
    )
    vocabs = sys.argv[1:] or [
        "bow_vocab_256.npz", "bow_vocab_tree_4096.npz",
        "bow_vocab_tree_32768.npz",
    ]
    for vname in vocabs:
        vocab = load_vocabulary(os.path.join(data, vname))
        db = np.stack(
            [vocab.transform_np(*base_feats[i]) for i in place_ids]
        )
        accs, margins = {}, []
        for pn, feats in pert_feats.items():
            hits = tot = 0
            for qi in range(n):
                if qi in place_ids:
                    continue
                v = vocab.transform_np(*feats[qi])
                s = vocab.score_np(v, db)
                top = np.argsort(s)[::-1]
                best_place = place_ids[top[0]]
                margins.append(float(s[top[0]] - s[top[1]]))
                hits += abs(best_place - qi) <= 3
                tot += 1
            accs[pn] = hits / tot
        acc_str = " ".join(f"{k}={v:.3f}" for k, v in accs.items())
        print(
            f"{vname}: mean_acc={np.mean(list(accs.values())):.3f} "
            f"margin={np.mean(margins):.4f} | {acc_str}",
            flush=True,
        )


if __name__ == "__main__":
    main()
