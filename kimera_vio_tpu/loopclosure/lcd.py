"""Loop-closure detector: place recognition + geometric verification + PGO.

TPU-native rebuild of the reference LoopClosureDetector
(src/loopclosure/LoopClosureDetector.cpp:198-391):

per keyframe:
  1. ORB-class descriptors on the keyframe image (orb.py; reference :142-150),
  2. BoW transform + database query with NSS normalization against the
    previous keyframe's BoW (detectLoop :682-764: alpha threshold,
    min_nss_factor, recent-frames exclusion window),
  3. island grouping + temporal consistency (LcdThirdPartyWrapper.cpp:70-190:
     score-summed islands with min_matches_per_island, best-island
     selection, overlap/gap temporal constraint over consecutive queries),
  4. geometric verification: descriptor matching (Lowe ratio) + mono
     essential RANSAC (geometricVerificationCam2d2d :818-850); pose
     recovery per PoseRecoveryType (recoverPoseBody :851-980):
     k3d3d (Arun on stereo backprojections), kPnP (query bearings vs
     match 3D points), k5ptRotOnly (mono rotation, translation row
     zeroed in the loop-factor noise),
  5. loop factor -> PCM gating + optional GNC weighting + pose-graph
     Gauss-Newton (pgo.py; the KimeraRPGO role, :1298 + GNC config
     :173-182).

The BoW database is an INVERTED INDEX (word -> postings of (kf_id,
weight)), the same structure DBoW2's database uses (the behavioral
contract behind LoopClosureDetector.cpp:682-764): a query touches only
the words PRESENT in the query vector, so cost is O(nnz(query) x
postings/word) — sublinear in both vocabulary size and database size —
and memory is O(total nonzeros) = O(keyframes x features), independent
of n_words. An optional `retain_keyframes` bound evicts the oldest
keyframes from the index (the payload store is already disk-bounded by
FrameCache). Host keeps only the tiny island bookkeeping.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from kimera_vio_tpu.loopclosure import orb as orb_mod
from kimera_vio_tpu.loopclosure import pgo as pgo_mod
from kimera_vio_tpu.loopclosure.vocab import BowVocabulary
from kimera_vio_tpu.ops import ransac


@dataclass
class LcdConfig:
    # Place recognition (LoopClosureDetectorParams.h:40-66)
    use_nss: bool = True
    alpha: float = 0.1  # BoW score threshold (x nss factor)
    min_nss_factor: float = 0.005
    recent_frames_window: int = 20
    max_db_results: int = 5
    # Island grouping + temporal constraint (LcdThirdPartyWrapper.cpp)
    min_temporal_matches: int = 3
    max_intraisland_gap: int = 3
    min_matches_per_island: int = 1
    max_nrFrames_between_islands: int = 3
    max_nrFrames_between_queries: int = 2
    # Geometric verification + pose recovery
    min_correspondences: int = 12
    lowe_ratio: float = 0.7
    ransac_threshold_mono: float = 1e-6
    arun_threshold_m: float = 0.15
    pnp_threshold_px: float = 3.0
    min_inliers: int = 10
    pose_recovery_type: int = 0  # 0 k3d3d, 1 kPnP, 2 k5ptRotOnly
    max_pose_recovery_translation: float = 1e3
    between_rotation_precision: float = 10000.0
    # Nonlinear refinement of the recovered loop pose over the inlier
    # correspondences (reference refinePoses,
    # LoopClosureDetector.cpp:979; header default true).
    refine_pose: bool = True
    # PGO (KimeraRPGO: PCM + optional GNC)
    pcm_rot_threshold: float = 0.1
    pcm_trans_threshold: float = 0.5
    gnc_alpha: float = 0.0  # 0 disables GNC (LoopClosureDetector.cpp:173-182)
    max_keyframes: int = 512
    # Hard retention bound on the BoW index: keyframes older than the
    # newest `retain_keyframes` are evicted from place recognition
    # (their disk payloads stay in FrameCache). 0 = unbounded, the
    # reference DBoW2 database behavior.
    retain_keyframes: int = 0
    n_features: int = 256
    min_distance: float = 12.0  # grid-detector spacing for LCD features

    @classmethod
    def from_params(cls, p) -> "LcdConfig":
        """Build from a config.params.LcdParams (YAML tier)."""
        return cls(
            n_features=int(getattr(p, "nfeatures", 256) or 256),
            min_distance=float(getattr(p, "min_distance", 12.0)),
            use_nss=p.use_nss,
            alpha=p.alpha,
            min_nss_factor=p.min_nss_factor,
            recent_frames_window=p.recent_frames_window,
            max_db_results=p.max_db_results,
            min_temporal_matches=p.min_temporal_matches,
            max_intraisland_gap=p.max_intraisland_gap,
            min_matches_per_island=p.min_matches_per_island,
            max_nrFrames_between_islands=p.max_nrFrames_between_islands,
            max_nrFrames_between_queries=p.max_nrFrames_between_queries,
            min_correspondences=p.min_correspondences,
            refine_pose=p.refine_pose,
            lowe_ratio=p.lowe_ratio,
            ransac_threshold_mono=p.ransac_threshold_mono,
            arun_threshold_m=p.ransac_inlier_threshold_stereo,
            pose_recovery_type=p.pose_recovery_type,
            pcm_rot_threshold=p.pgo_rot_threshold,
            pcm_trans_threshold=p.pgo_trans_threshold,
            gnc_alpha=p.gnc_alpha,
        )


@dataclass
class LoopResult:
    query_id: int
    match_id: int
    R_match_query: np.ndarray
    t_match_query: np.ndarray
    n_inliers: int
    rot_only: bool = False  # k5ptRotOnly: translation rows carry ~no weight


@dataclass
class _Island:
    """MatchIsland (LcdThirdPartyWrapper.h): a contiguous-id candidate
    group with a summed score."""

    start: int
    end: int
    score: float
    best_id: int
    best_score: float


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
        # Inverted BoW index (DBoW2 InvertedFile role): per word, growing
        # lists of keyframe ids and weights. Memory = O(total nonzeros).
        self._post_ids: dict[int, list] = {}
        self._post_wts: dict[int, list] = {}
        self._min_kf = 0  # retention floor (retain_keyframes eviction)
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
        # Temporal-constraint state (LcdThirdPartyWrapper.cpp:70-109).
        self._temporal_entries = 0
        self._latest_island: _Island | None = None
        self._latest_query_id = 0

        self._transform = jax.jit(self.vocab.transform)
        self._score = jax.jit(BowVocabulary.score)
        self._orb = jax.jit(orb_mod.orb_descriptors)
        self._match = jax.jit(
            lambda da, ma, db_, mb: orb_mod.match_descriptors(
                da, ma, db_, mb, lowe_ratio=cfg.lowe_ratio
            )
        )
        # Loop-pose refinement kernels (refinePoses role,
        # LoopClosureDetector.cpp:979): robust 3D-3D IRLS for k3d3d,
        # reprojection GN for kPnP.
        self._refine_arun = jax.jit(
            lambda pm, pq, inl, R, t: ransac.refine_arun_huber(
                pm, pq, inl, R, t, huber_m=0.5 * cfg.arun_threshold_m
            )
        )
        focal = (
            float(np.asarray(stereo.fx)) if stereo is not None else 450.0
        )
        self._refine_pnp = jax.jit(
            lambda pm, vq, inl, R, t: ransac.refine_pnp_gn(
                pm, vq, inl, R, t,
                focal=focal, huber_px=cfg.pnp_threshold_px,
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
        # BoW transform + database scoring run on HOST numpy: at keyframe
        # rate the math is trivial (256x256 Hamming argmin + L1 scores)
        # and each device dispatch would pay 30-80 ms tunnel latency —
        # same division of labor as the reference's CPU LCD thread.
        bow = self.vocab.transform_np(desc, ok)
        kf_id = self.n_kf

        result = None
        max_match = kf_id - cfg.recent_frames_window
        if max_match > self._min_kf:
            scores = self._query_index(bow, max_match)
            # NSS normalization (detectLoop :708-719).
            nss = 1.0
            if cfg.use_nss and self.latest_bow is not None:
                nss = float(
                    BowVocabulary.score_np(bow, self.latest_bow[None])[0]
                )
            if not cfg.use_nss or nss >= cfg.min_nss_factor:
                # Candidates above alpha * nss (detectLoop :721-730),
                # strongest first, capped at max_db_results.
                order = np.argsort(scores)[::-1][: cfg.max_db_results]
                cand = [
                    (int(c), float(scores[c]))
                    for c in order
                    if scores[c] > cfg.alpha * max(nss, 1e-9)
                ]
                if cand:
                    match_id = cand[0][0]  # top scorer (detectLoop :738)
                    islands = self._compute_islands(cand)
                    if islands:
                        best = max(islands, key=lambda i: i.score)
                        if self._check_temporal(kf_id, best):
                            result = self._verify(
                                kf_id, match_id, desc, ok, uv, versors,
                                pts3d,
                            )
                            if result is not None:
                                self.loops.append(result)

        self._insert_index(kf_id, bow)
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
    def _query_index(self, bow: np.ndarray, max_match: int) -> np.ndarray:
        """L1 BoW scores of `bow` against keyframes [0, max_match) via the
        inverted index. Uses the common-words identity for L1-normalized
        vectors (DBoW2 L1_NORM scoring, the loop at detectLoop :682-764):

            1 - 0.5*|v - w|_1 = 0.5 * sum_{i in common}(v_i + w_i - |v_i - w_i|)

        so only the query's nonzero words are touched — cost
        O(nnz(query) x postings/word), sublinear in n_words and database
        size. Evicted keyframes (id < retention floor) score 0."""
        scores = np.zeros(max_match, np.float32)
        for w in np.flatnonzero(bow):
            ids = self._post_ids.get(int(w))
            if not ids:
                continue
            ids_a = np.asarray(ids, np.int64)
            wts_a = np.asarray(self._post_wts[int(w)], np.float32)
            sel = (ids_a < max_match) & (ids_a >= self._min_kf)
            if not sel.any():
                continue
            v = float(bow[w])
            # ids within one word's postings are unique (one entry per
            # keyframe), so fancy-index accumulation is safe.
            scores[ids_a[sel]] += v + wts_a[sel] - np.abs(v - wts_a[sel])
        return 0.5 * scores

    def _insert_index(self, kf_id: int, bow: np.ndarray):
        """Append this keyframe's nonzero words to the inverted file; when
        `retain_keyframes` bounds the database, advance the retention
        floor and amortize the physical prune (the payload store stays
        disk-bounded in FrameCache regardless)."""
        for w in np.flatnonzero(bow):
            self._post_ids.setdefault(int(w), []).append(kf_id)
            self._post_wts.setdefault(int(w), []).append(float(bow[w]))
        r = self.cfg.retain_keyframes
        if r > 0 and kf_id + 1 - r > self._min_kf:
            self._min_kf = kf_id + 1 - r
            if kf_id % 64 == 0:  # amortized physical prune
                for w in list(self._post_ids):
                    ids = self._post_ids[w]
                    wts = self._post_wts[w]
                    keep = [k for k, i in enumerate(ids) if i >= self._min_kf]
                    if len(keep) != len(ids):
                        self._post_ids[w] = [ids[k] for k in keep]
                        self._post_wts[w] = [wts[k] for k in keep]
                    if not self._post_ids[w]:
                        del self._post_ids[w], self._post_wts[w]

    # ------------------------------------------------------------------
    def _compute_islands(self, cand: list[tuple[int, float]]) -> list[_Island]:
        """Group candidates into contiguous-id islands
        (LcdThirdPartyWrapper::computeIslands, :109-185): gap <
        max_intraisland_gap, id-span >= min_matches_per_island; island
        score = sum of member scores."""
        cfg = self.cfg
        by_id = sorted(cand)
        islands: list[_Island] = []
        first = last = by_id[0][0]
        ssum = best_score = by_id[0][1]
        best_id = by_id[0][0]
        for cid, sc in by_id[1:]:
            if cid - last < cfg.max_intraisland_gap:
                last = cid
                ssum += sc
                if sc > best_score:
                    best_score, best_id = sc, cid
            else:
                if last - first + 1 >= cfg.min_matches_per_island:
                    islands.append(
                        _Island(first, last, ssum, best_id, best_score)
                    )
                first = last = cid
                ssum = best_score = sc
                best_id = cid
        if last - first + 1 >= cfg.min_matches_per_island:
            islands.append(_Island(first, last, ssum, best_id, best_score))
        return islands

    def _check_temporal(self, kf_id: int, island: _Island) -> bool:
        """checkTemporalConstraint (LcdThirdPartyWrapper.cpp:70-107):
        consecutive queries (within max_nrFrames_between_queries) must hit
        overlapping or nearby islands min_temporal_matches+ times."""
        cfg = self.cfg
        if (
            self._temporal_entries == 0
            or kf_id - self._latest_query_id > cfg.max_nrFrames_between_queries
        ):
            self._temporal_entries = 1
        else:
            a1, a2 = self._latest_island.start, self._latest_island.end
            b1, b2 = island.start, island.end
            overlap = (b1 <= a1 <= b2) or (a1 <= b1 <= a2)
            gap_small = False
            if not overlap:
                gap = max(a1 - b2, b1 - a2)
                gap_small = gap <= cfg.max_nrFrames_between_islands
            self._temporal_entries = (
                self._temporal_entries + 1 if (overlap or gap_small) else 1
            )
        self._latest_island = island
        self._latest_query_id = kf_id
        return self._temporal_entries > cfg.min_temporal_matches

    # ------------------------------------------------------------------
    def _verify(self, kf_id, match_id, desc_q, ok_q, uv_q, versors_q, pts_q):
        """Descriptor matching + 2d2d geometric verification + pose
        recovery per PoseRecoveryType (verifyAndRecoverPose :766-806 +
        recoverPoseBody :851-980)."""
        cfg = self.cfg
        payload = self.cache.get(match_id)
        if payload is None:
            return None  # evicted without a disk dir (degraded mode)
        desc_m = jnp.asarray(payload["desc"])
        ok_m = payload["ok"]
        pts_m = payload["pts3d"]
        versors_m = payload["versors"]
        idx, mok = self._match(desc_q, ok_q, desc_m, jnp.asarray(ok_m))
        idx = np.asarray(idx)
        mok = np.asarray(mok)
        if mok.sum() < cfg.min_correspondences:
            return None
        pair_ok = jnp.asarray(mok)
        key = jax.random.PRNGKey(match_id * 100003 + kf_id)
        # 2d2d essential-matrix verification on bearing versors
        # (geometricVerificationCam2d2d -> 5-pt Nister RANSAC role).
        v_q = jnp.asarray(versors_q)
        v_m = jnp.asarray(np.asarray(versors_m)[idx])
        R2, t2, inl2, n2 = ransac.ransac_5pt_mono(
            v_m, v_q, pair_ok, key, threshold=cfg.ransac_threshold_mono
        )
        if int(n2) < cfg.min_inliers:
            return None

        rot_only = False
        if cfg.pose_recovery_type == 2:  # k5ptRotOnly
            # Pass the 2d2d pose through; translation rows get ~zero
            # weight in the loop factor (recoverPoseBody :943-949 +
            # the rotation-only noise model :295-317).
            R, t, n_inl = np.asarray(R2), np.asarray(t2), int(n2)
            rot_only = True
        elif cfg.pose_recovery_type == 1:  # kPnP
            # Query bearings vs match-frame 3D points (in the match
            # camera frame): recovers camMatch_T_camQuery directly
            # (recoverPoseBody :907-941).
            p_m = jnp.asarray(np.asarray(pts_m)[idx])
            focal = (
                float(np.asarray(self.stereo.fx))
                if self.stereo is not None
                else 450.0
            )
            R_cw, t_cw, inl, n_inl = ransac.ransac_pnp(
                p_m, v_q, pair_ok, key,
                threshold=cfg.pnp_threshold_px, focal=focal,
            )
            if cfg.refine_pose:
                # Reprojection GN over the inliers (refinePoses role).
                R_cw, t_cw = self._refine_pnp(p_m, v_q, inl, R_cw, t_cw)
            # x_q = R_cw x_m + t_cw => T_match_query = inv([R_cw t_cw]).
            R = np.asarray(R_cw).T
            t = -R @ np.asarray(t_cw)
            n_inl = int(n_inl)
            if np.linalg.norm(t) > cfg.max_pose_recovery_translation:
                return None
        else:  # k3d3d (default)
            # 3D-3D Arun RANSAC on stereo backprojections.
            p_q = jnp.asarray(pts_q)
            p_m = jnp.asarray(np.asarray(pts_m)[idx])
            R3, t3, inl, n_inl = ransac.ransac_3pt_arun(
                p_m, p_q, pair_ok, key, threshold=cfg.arun_threshold_m
            )
            if cfg.refine_pose:
                # Robust 3D-3D IRLS over the inliers (the reference's
                # optional GTSAM 3D-3D refinement, refinePoses :979).
                R3, t3 = self._refine_arun(p_m, p_q, inl, R3, t3)
            R, t, n_inl = np.asarray(R3), np.asarray(t3), int(n_inl)
        if n_inl < cfg.min_inliers:
            return None
        return LoopResult(
            query_id=kf_id,
            match_id=match_id,
            R_match_query=np.asarray(R),
            t_match_query=np.asarray(t),
            n_inliers=n_inl,
            rot_only=rot_only,
        )

    # ------------------------------------------------------------------
    def optimize_graph(self):
        """Run PCM + optional GNC + pose-graph GN over odometry + verified
        loops; returns (rot (K,3,3), pos (K,3)) optimized world poses.

        GNC (gnc_alpha > 0): graduated non-convexity on the loop edges —
        TLS-style weights annealed over a few outer iterations
        (KimeraRPGO's GncOptimizer role, LoopClosureDetector.cpp:173-182).
        """
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
        n_odom = len(ei)
        # Loop edges (note LoopResult stores match->query i.e. i->j with
        # i = match_id, j = query_id).
        kept_loops: list[LoopResult] = []
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
                    # Rotation-only loops: the factor still needs a finite
                    # translation weight for the GN system; PGO downweights
                    # by 1e-3 (the reference zeroes the translation info).
                    w.append(1e-3 if l.rot_only else 1.0)
                    kept_loops.append(l)

        edges = (
            jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.asarray(np.stack(Rm), jnp.float32),
            jnp.asarray(np.stack(tm), jnp.float32),
        )
        w = np.asarray(w, np.float32)

        if self.cfg.gnc_alpha > 0.0 and kept_loops:
            rot2, pos2 = self._gnc_optimize(rot, pos, edges, w, n_odom)
        else:
            rot2, pos2, costs = pgo_mod.optimize_pose_graph(
                rot, pos, *edges, jnp.asarray(w)
            )
        return np.asarray(rot2), np.asarray(pos2)

    def _gnc_optimize(self, rot, pos, edges, w, n_odom):
        """Graduated non-convexity on loop-edge weights (GM-style
        surrogate): alternate solve <-> weight update while annealing mu
        downward, so the surrogate sharpens from near-least-squares to
        near-truncated. The inlier scale barc2 is a fraction of the PCM
        translation gate — a loop that passed PCM's coarse consistency
        but sits far outside the inlier noise level anneals to ~zero
        weight. Odometry edges stay at weight 1 (KimeraRPGO GncOptimizer
        with FixedOdometry semantics)."""
        ei, ej, Rm, tm = edges
        solve = jax.jit(pgo_mod.optimize_pose_graph)
        chi2 = jax.jit(pgo_mod.edge_chi2)
        barc2 = jnp.float32((0.2 * self.cfg.pcm_trans_threshold) ** 2)
        w0 = jnp.asarray(w)
        w_cur = w0
        rot2, pos2 = rot, pos
        # The tail of mu=1 rounds is a fixed-point cascade: as an outlier
        # edge loses weight the graph springs back to odometry, its
        # residual grows, and its weight drops further — converging to
        # rejection (same mechanism as KimeraRPGO's GNC inner loop).
        for mu in (16.0, 8.0, 4.0, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0):
            rot2, pos2, _ = solve(rot, pos, ei, ej, Rm, tm, w_cur)
            # Residual per edge at the current solution.
            r2 = chi2(rot2, pos2, ei, ej, Rm, tm)
            w_gnc = (mu * barc2 / (r2 + mu * barc2)) ** 2
            w_cur = w0.at[n_odom:].set(w0[n_odom:] * w_gnc[n_odom:])
        # Final solve at the annealed weights.
        rot2, pos2, _ = solve(rot, pos, ei, ej, Rm, tm, w_cur)
        self.gnc_weights = np.asarray(w_cur[n_odom:])
        return rot2, pos2
