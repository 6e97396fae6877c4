"""Loop-closure detector: place recognition + geometric verification + PGO.

TPU-native rebuild of the reference LoopClosureDetector
(src/loopclosure/LoopClosureDetector.cpp:198-391):

per keyframe:
  1. ORB-class descriptors on the keyframe image (orb.py; reference :142-150),
  2. BoW transform + database query with NSS normalization against the
    previous keyframe's BoW (detectLoop :682-764: alpha threshold,
    min_nss_factor, recent-frames exclusion window),
  3. island grouping + temporal consistency (LcdThirdPartyWrapper.cpp:70-109),
  4. geometric verification: descriptor matching (Lowe ratio) + mono
     essential RANSAC; pose recovery by 3-pt Arun on stereo
     backprojections (+5-pt fallback) (verifyAndRecoverPose :766-...),
  5. loop factor -> PCM gating + pose-graph Gauss-Newton (pgo.py; the
     KimeraRPGO role, :1298).

The BoW database is a device-resident dense matrix (max_keyframes x
n_words); queries are one matmul-class op. Host keeps only the tiny island
bookkeeping.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from kimera_vio_tpu.common import geometry as geo
from kimera_vio_tpu.loopclosure import orb as orb_mod
from kimera_vio_tpu.loopclosure import pgo as pgo_mod
from kimera_vio_tpu.loopclosure.vocab import BowVocabulary
from kimera_vio_tpu.ops import ransac


@dataclass
class LcdConfig:
    alpha: float = 0.1  # BoW score threshold (x nss factor)
    min_nss_factor: float = 0.005
    recent_frames_window: int = 20
    max_db_results: int = 5
    min_temporal_matches: int = 3
    max_intraisland_gap: int = 3
    min_correspondences: int = 12
    lowe_ratio: float = 0.7
    ransac_threshold_mono: float = 1e-6
    arun_threshold_m: float = 0.15
    min_inliers: int = 10
    pcm_rot_threshold: float = 0.1
    pcm_trans_threshold: float = 0.5
    max_keyframes: int = 512
    n_features: int = 256


@dataclass
class LoopResult:
    query_id: int
    match_id: int
    R_match_query: np.ndarray
    t_match_query: np.ndarray
    n_inliers: int


class LoopClosureDetector:
    """Host orchestrator over jitted kernels; keyframe-paced like the
    reference LcdModule."""

    def __init__(
        self,
        vocab: BowVocabulary,
        cfg: LcdConfig = LcdConfig(),
        stereo=None,
        cache=None,
    ):
        from kimera_vio_tpu.loopclosure.frame_cache import FrameCache

        self.cfg = cfg
        self.vocab = vocab
        self.stereo = stereo
        W = vocab.n_words
        self.db = np.zeros((cfg.max_keyframes, W), np.float32)
        self.n_kf = 0
        # Keyframe payloads (descriptors, keypoints, 3D points) live in the
        # disk-backed LRU FrameCache — RAM stays bounded on long missions
        # (reference FrameCache.cpp:23,40-108). `_verify` fetches matches
        # back through `get()`.
        self.cache = cache if cache is not None else FrameCache(None)
        self.kf_pose: list = []  # odometry poses (R, t) world
        self.kf_stamps: list = []
        self.latest_bow = None
        self.loops: list[LoopResult] = []
        self._islands: list = []  # temporal-consistency state

        self._transform = jax.jit(self.vocab.transform)
        self._score = jax.jit(BowVocabulary.score)
        self._orb = jax.jit(orb_mod.orb_descriptors)
        self._match = jax.jit(
            lambda da, ma, db_, mb: orb_mod.match_descriptors(
                da, ma, db_, mb, lowe_ratio=cfg.lowe_ratio
            )
        )

    # ------------------------------------------------------------------
    def add_keyframe(
        self,
        img,
        uv,
        mask,
        versors,
        pts3d,
        pose_R,
        pose_t,
        stamp_ns: int,
        desc_override=None,
    ) -> LoopResult | None:
        """Process one keyframe; returns a verified loop or None.
        `desc_override=(desc, ok)` skips internal ORB extraction (used by
        LcdModule, which extracts once and caches)."""
        cfg = self.cfg
        if desc_override is not None:
            desc, ok = desc_override
        else:
            desc, angles, ok = self._orb(
                jnp.asarray(img), jnp.asarray(uv), jnp.asarray(mask)
            )
        bow = self._transform(desc, ok)
        kf_id = self.n_kf

        result = None
        if kf_id > cfg.recent_frames_window:
            scores = np.asarray(
                self._score(bow, jnp.asarray(self.db[: self.n_kf]))
            )
            # NSS normalization (detectLoop :708-719).
            nss = 1.0
            if self.latest_bow is not None:
                nss = float(
                    np.asarray(
                        self._score(bow, self.latest_bow[None])
                    )[0]
                )
            if nss >= cfg.min_nss_factor:
                scores_norm = scores / max(nss, 1e-9)
                # Exclude the recent window.
                scores_norm[max(0, kf_id - cfg.recent_frames_window):] = -1.0
                cand = np.argsort(scores_norm)[::-1][: cfg.max_db_results]
                cand = [c for c in cand if scores_norm[c] > cfg.alpha]
                if cand:
                    match_id = self._temporal_check(kf_id, cand)
                    if match_id is not None:
                        result = self._verify(kf_id, match_id, desc, ok, uv, versors, pts3d)
                        if result is not None:
                            self.loops.append(result)

        if kf_id >= len(self.db):
            # Grow the (tiny) BoW matrix geometrically; the heavy payloads
            # are bounded by the FrameCache.
            self.db = np.vstack([self.db, np.zeros_like(self.db)])
        self.db[kf_id] = np.asarray(bow)
        self.latest_bow = bow
        self.cache.add(
            kf_id,
            dict(
                desc=np.asarray(desc),
                ok=np.asarray(ok),
                uv=np.asarray(uv),
                versors=np.asarray(versors),
                pts3d=np.asarray(pts3d),
            ),
        )
        self.kf_pose.append((np.asarray(pose_R), np.asarray(pose_t)))
        self.kf_stamps.append(stamp_ns)
        self.n_kf += 1
        return result

    # ------------------------------------------------------------------
    def _temporal_check(self, kf_id, candidates) -> int | None:
        """Island grouping + temporal consistency (LcdThirdPartyWrapper):
        group candidate ids into islands (gap <= max_intraisland_gap), track
        whether consecutive queries hit nearby islands."""
        cfg = self.cfg
        cands = sorted(candidates)
        islands = []
        cur = [cands[0]]
        for c in cands[1:]:
            if c - cur[-1] <= cfg.max_intraisland_gap:
                cur.append(c)
            else:
                islands.append(cur)
                cur = [c]
        islands.append(cur)
        best_island = max(islands, key=len)
        rep = best_island[len(best_island) // 2]
        # Temporal consistency: previous queries must have hit islands
        # within the gap.
        self._islands.append((kf_id, rep))
        recent = [r for q, r in self._islands if kf_id - q <= cfg.min_temporal_matches]
        consistent = sum(
            1 for r in recent if abs(r - rep) <= 2 * cfg.max_intraisland_gap
        )
        if consistent >= cfg.min_temporal_matches:
            return rep
        return None

    # ------------------------------------------------------------------
    def _verify(self, kf_id, match_id, desc_q, ok_q, uv_q, versors_q, pts_q):
        """Descriptor matching + geometric verification + 3D-3D recovery."""
        cfg = self.cfg
        payload = self.cache.get(match_id)
        if payload is None:
            return None  # evicted without a disk dir (degraded mode)
        desc_m = jnp.asarray(payload["desc"])
        ok_m = payload["ok"]
        pts_m = payload["pts3d"]
        idx, mok = self._match(desc_q, ok_q, desc_m, jnp.asarray(ok_m))
        idx = np.asarray(idx)
        mok = np.asarray(mok)
        if mok.sum() < cfg.min_correspondences:
            return None
        # 3D-3D Arun RANSAC on stereo backprojections (PoseRecoveryType 3d3d).
        p_q = jnp.asarray(pts_q)
        p_m = jnp.asarray(np.asarray(pts_m)[idx])
        pair_ok = jnp.asarray(mok)
        key = jax.random.PRNGKey(match_id * 100003 + kf_id)
        R, t, inl, n_inl = ransac.ransac_3pt_arun(
            p_m, p_q, pair_ok, key, threshold=cfg.arun_threshold_m
        )
        n_inl = int(n_inl)
        if n_inl < cfg.min_inliers:
            return None
        return LoopResult(
            query_id=kf_id,
            match_id=match_id,
            R_match_query=np.asarray(R),
            t_match_query=np.asarray(t),
            n_inliers=n_inl,
        )

    # ------------------------------------------------------------------
    def optimize_graph(self):
        """Run PCM + pose-graph GN over odometry + verified loops; returns
        (rot (K,3,3), pos (K,3)) optimized world poses."""
        K = self.n_kf
        rot = jnp.asarray(np.stack([p[0] for p in self.kf_pose]))
        pos = jnp.asarray(np.stack([p[1] for p in self.kf_pose]))
        # Odometry edges from consecutive poses.
        ei = list(range(K - 1))
        ej = list(range(1, K))
        Rm, tm = [], []
        for i, j in zip(ei, ej):
            Ri, ti = self.kf_pose[i]
            Rj, tj = self.kf_pose[j]
            Rm.append(Ri.T @ Rj)
            tm.append(Ri.T @ (tj - ti))
        w = [1.0] * len(ei)
        # Loop edges (note LoopResult stores match->query i.e. i->j with
        # i = match_id, j = query_id).
        if self.loops:
            li = jnp.asarray([l.match_id for l in self.loops], jnp.int32)
            lj = jnp.asarray([l.query_id for l in self.loops], jnp.int32)
            lR = jnp.asarray(np.stack([l.R_match_query for l in self.loops]))
            lt = jnp.asarray(np.stack([l.t_match_query for l in self.loops]))
            keep = pgo_mod.pcm_consistency(
                rot, pos, li, lj, lR, lt,
                jnp.ones(len(self.loops), bool),
                rot_threshold=self.cfg.pcm_rot_threshold,
                trans_threshold=self.cfg.pcm_trans_threshold,
            )
            keep = np.asarray(keep)
            for k, l in enumerate(self.loops):
                if keep[k]:
                    ei.append(l.match_id)
                    ej.append(l.query_id)
                    Rm.append(l.R_match_query)
                    tm.append(l.t_match_query)
                    w.append(1.0)
        rot2, pos2, costs = pgo_mod.optimize_pose_graph(
            rot, pos,
            jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.asarray(np.stack(Rm), jnp.float32),
            jnp.asarray(np.stack(tm), jnp.float32),
            jnp.asarray(w, jnp.float32),
        )
        return np.asarray(rot2), np.asarray(pos2)
