"""LcdModule: wires the loop-closure detector onto a VIO pipeline run.

Mirrors the reference LcdModule (src/loopclosure/LcdModule.cpp:30-66):
keyframe-paced, consuming backend poses + frontend images. Like the
reference's LCD, feature extraction here is independent of the frontend's
tracks — ORB-class keypoints are re-detected per keyframe and sparse stereo
is rebuilt with the shared matcher (LoopClosureDetector.cpp:125-150).

The vocabulary: the reference loads a pretrained DBoW2 ORBvoc; this module
trains the binary codebook on the mission's first `vocab_train_kfs`
keyframes (k-majority, loopclosure/vocab.py) and then processes the
deferred keyframes — place recognition only activates after training,
which matches the practical behavior (no loops fire in the first seconds).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from kimera_vio_tpu.loopclosure import orb as orb_mod
from kimera_vio_tpu.loopclosure.frame_cache import FrameCache
from kimera_vio_tpu.loopclosure.lcd import LcdConfig, LoopClosureDetector
from kimera_vio_tpu.loopclosure.vocab import (
    BowVocabulary,
    load_vocabulary,
    train_vocabulary,
)
from kimera_vio_tpu.ops import corner_detection as det
from kimera_vio_tpu.ops.stereo_matching import match_stereo


class LcdModule:
    #: packaged pretrained vocabulary (scripts/build_vocab.py output) — the
    #: reference ships ORBvoc.yml the same way (LoopClosureDetector.cpp
    #: loadOrbVocabulary). Default is the hierarchical k^L tree (DBoW2
    #: structure, 4096 leaves); the flat 256-word codebook remains as a
    #: fallback artifact. A 32768-leaf tree (bow_vocab_tree_32768.npz) is
    #: also packaged for large real-world maps — measured slightly worse
    #: on the 300-kf synthetic harness (ROADMAP round 4), so not default.
    DEFAULT_VOCAB = "bow_vocab_tree_4096.npz"
    FALLBACK_VOCAB = "bow_vocab_256.npz"

    def __init__(
        self,
        stereo,
        cfg: LcdConfig | None = None,
        n_features: int = 256,
        vocab_train_kfs: int = 20,
        n_words: int = 256,
        cache_dir: str | None = None,
        vocab_path: str | None = "default",
        lcd_params=None,
    ):
        import os

        self.stereo = stereo
        if cfg is None and lcd_params is not None:
            cfg = LcdConfig.from_params(lcd_params)
        self.cfg = cfg or LcdConfig(n_features=n_features)
        # Feature budget / spacing come from LcdParams via LcdConfig
        # (reference drives cv::ORB nfeatures from the YAML the same way).
        n_features = self.cfg.n_features
        if vocab_path == "default":
            # Production default: the packaged sequence-independent
            # vocabulary, so place recognition is live from keyframe 0.
            data_dir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "data",
            )
            vocab_path = os.path.join(data_dir, self.DEFAULT_VOCAB)
            if not os.path.exists(vocab_path):
                vocab_path = os.path.join(data_dir, self.FALLBACK_VOCAB)
        if cache_dir is None:
            # Disk spill keeps verification working beyond the LRU RAM
            # bound on long missions (FrameCache.cpp:40-108).
            import tempfile

            cache_dir = tempfile.mkdtemp(prefix="kimera_lcd_cache_")
        self.n_features = n_features
        self.vocab_train_kfs = vocab_train_kfs
        self.n_words = n_words
        self._pending = []  # keyframes before vocabulary training
        self._train_desc = []
        self._train_mask = []
        self.lcd: LoopClosureDetector | None = None
        self.cache = FrameCache(cache_dir)
        if vocab_path and os.path.exists(vocab_path):
            # Pretrained codebook (the reference's ORBvoc.yml role): place
            # recognition is active from the first keyframe, and the
            # codebook is sequence-independent.
            self.lcd = LoopClosureDetector(
                load_vocabulary(vocab_path), self.cfg, self.stereo,
                cache=self.cache,
            )

        self._detect = jax.jit(
            lambda im: det.detect_features(
                im,
                jnp.zeros((8, 2), jnp.float32),
                jnp.zeros(8, bool),
                n_features,
                min_distance=self.cfg.min_distance,
                do_subpixel=False,
            )
        )
        self._orb = jax.jit(orb_mod.orb_descriptors)
        self._match_stereo = jax.jit(
            lambda l, r, u, v: match_stereo(
                l, r, u, v,
                fx=stereo.fx, baseline=stereo.baseline,
                templ_cols=31, templ_rows=11, max_disparity=128,
            )
        )

    # ------------------------------------------------------------------
    def _extract(self, left_rect, right_rect):
        uv, ok = self._detect(left_rect)
        desc, _, dok = self._orb(left_rect, uv, ok)
        uvr, depth, sok = self._match_stereo(left_rect, right_rect, uv, ok)
        uvd = jnp.stack([uv[:, 0], uvr[:, 0], uv[:, 1]], -1)
        pts3 = self.stereo.backproject_rect(uvd)
        versors = pts3 / jnp.maximum(
            jnp.linalg.norm(pts3, axis=-1, keepdims=True), 1e-9
        )
        return (
            np.asarray(uv), np.asarray(dok & sok), np.asarray(desc),
            np.asarray(versors), np.asarray(pts3),
        )

    # ------------------------------------------------------------------
    def add_keyframe_packed(
        self, uv, ok, desc, versors, pts3, pose_R, pose_t, stamp_ns
    ):
        """Keyframe whose LCD features were already extracted on device
        inside the pipeline's fused keyframe branch (StereoFrontend.
        _lcd_extract) — skips this module's own extraction dispatches."""
        return self._add(
            np.asarray(uv), np.asarray(ok), np.asarray(desc),
            np.asarray(versors), np.asarray(pts3),
            pose_R, pose_t, stamp_ns,
        )

    def add_keyframe(self, left_rect, right_rect, pose_R, pose_t, stamp_ns):
        """Returns a verified LoopResult or None."""
        uv, ok, desc, versors, pts3 = self._extract(
            jnp.asarray(left_rect), jnp.asarray(right_rect)
        )
        return self._add(
            uv, ok, desc, versors, pts3, pose_R, pose_t, stamp_ns
        )

    def _add(self, uv, ok, desc, versors, pts3, pose_R, pose_t, stamp_ns):
        payload = dict(
            uv=uv, ok=ok, desc=desc, versors=versors, pts3=pts3,
            pose_R=np.asarray(pose_R), pose_t=np.asarray(pose_t),
            stamp=np.int64(stamp_ns),
        )
        if self.lcd is None:
            self._pending.append(payload)
            self._train_desc.append(desc)
            self._train_mask.append(ok)
            if len(self._pending) >= self.vocab_train_kfs:
                self._finalize_vocab()
            return None
        return self._feed(payload)

    def _finalize_vocab(self):
        cb = train_vocabulary(
            jnp.asarray(np.concatenate(self._train_desc)),
            jnp.asarray(np.concatenate(self._train_mask)),
            n_words=self.n_words,
            iters=6,
        )
        self.lcd = LoopClosureDetector(
            BowVocabulary(cb), self.cfg, self.stereo, cache=self.cache
        )
        for p in self._pending:
            self._feed(p)
        self._pending.clear()
        self._train_desc.clear()
        self._train_mask.clear()

    def _feed(self, p):
        # numpy end-to-end: the keyframe-rate BoW path is host-side now.
        return self.lcd.add_keyframe(
            None, p["uv"], p["ok"], p["versors"], p["pts3"],
            p["pose_R"], p["pose_t"], int(p["stamp"]),
            desc_override=(p["desc"], p["ok"]),
        )

    # ------------------------------------------------------------------
    def finish(self):
        """Train the vocabulary even if short, then return the PGO result
        (optimized trajectory + detected loops)."""
        if self.lcd is None and self._pending:
            self._finalize_vocab()
        if self.lcd is None or self.lcd.n_kf < 2:
            return None
        rot, pos = self.lcd.optimize_graph()
        return {
            "rot": rot,
            "pos": pos,
            "stamps": list(self.lcd.kf_stamps),
            "loops": self.lcd.loops,
        }
