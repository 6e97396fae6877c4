"""Plane identity across keyframes (reference Mesher::associatePlanes,
src/mesh/Mesher.cpp:1316-1420).

The reference keeps a persistent set of backend planes; each keyframe's
freshly segmented planes are associated to them by geometric proximity
(`Plane::geometricEqual`: normals within a tolerance — or 180 degrees
apart with the distance sign flipped — and distances within a tolerance).
Associated planes KEEP their identity (the regularity factors keep
refining the same state); unassociated segmentations become new planes.

Here the persistent planes live in fixed SLOTS of the P-slot
`PlaneStates` array the RegularVIO solver consumes, so association is a
host-side bookkeeping step and the solve stays statically shaped. After
each joint solve the refined normal/distance are written back
(`update_from_solver`) — re-anchor, don't re-create.
"""

from __future__ import annotations

import numpy as np


class PlaneTracker:
    def __init__(
        self,
        max_planes: int = 8,
        normal_tol_deg: float = 10.0,
        dist_tol: float = 0.20,
        max_age_kf: int = 10,
    ):
        self.P = max_planes
        self.cos_tol = float(np.cos(np.deg2rad(normal_tol_deg)))
        self.dist_tol = dist_tol
        self.max_age_kf = max_age_kf
        self.normals = np.zeros((max_planes, 3), np.float32)
        self.normals[:, 2] = 1.0
        self.ds = np.zeros(max_planes, np.float32)
        self.active = np.zeros(max_planes, bool)
        self.last_seen = np.full(max_planes, -1, np.int64)
        self.hits = np.zeros(max_planes, np.int64)
        # Monotonic ids: slot -> persistent plane id (survives slot reuse
        # checks in tests; a reused slot gets a fresh id).
        self.slot_pid = np.full(max_planes, -1, np.int64)
        self._next_pid = 0
        self._kf_index = 0

    # ------------------------------------------------------------------
    def associate(self, seg_normals, seg_ds):
        """One keyframe's segmented planes -> persistent slots.

        Returns (slot_of_seg (S,) int32, seen_this_kf (P,) bool). New
        segmentations claim evicted/free slots; when the table is full
        the weakest (fewest-hits) inactive candidate loses. -1 when no
        slot is available."""
        k = self._kf_index
        self._kf_index += 1
        seg_normals = np.asarray(seg_normals, np.float32)
        seg_ds = np.asarray(seg_ds, np.float32)
        S = len(seg_ds)
        slot_of_seg = np.full(S, -1, np.int32)
        seen = np.zeros(self.P, bool)

        # Age out stale planes first (horizon eviction: the reference
        # drops planes whose landmarks left the time horizon).
        stale = self.active & (k - self.last_seen > self.max_age_kf)
        self.active &= ~stale

        claimed: set[int] = set()
        for s in range(S):
            n, d = seg_normals[s], seg_ds[s]
            best, best_dot = -1, self.cos_tol
            for p in range(self.P):
                if not self.active[p] or p in claimed:
                    continue
                dot = float(n @ self.normals[p])
                dd = d - self.ds[p]
                if dot < 0:  # antiparallel: same plane, flipped normal
                    dot, dd = -dot, d + self.ds[p]
                if dot >= best_dot and abs(dd) <= self.dist_tol:
                    best, best_dot = p, dot
            if best >= 0:
                # Associated: identity persists; the SOLVER refines the
                # state (reference keeps symbol/normal/distance,
                # Mesher.cpp:1365-1379).
                claimed.add(best)
                slot_of_seg[s] = best
                seen[best] = True
                self.last_seen[best] = k
                self.hits[best] += 1
            else:
                free = np.flatnonzero(~self.active)
                if len(free) == 0:
                    continue  # table full: drop this segmentation
                p = int(free[0])
                self.normals[p] = n
                self.ds[p] = d
                self.active[p] = True
                self.last_seen[p] = k
                self.hits[p] = 1
                self.slot_pid[p] = self._next_pid
                self._next_pid += 1
                claimed.add(p)
                slot_of_seg[s] = p
                seen[p] = True
        return slot_of_seg, seen

    # ------------------------------------------------------------------
    def update_from_solver(self, normals, ds):
        """Write back solver-refined plane states for the active slots."""
        normals = np.asarray(normals, np.float32)
        ds = np.asarray(ds, np.float32)
        self.normals[self.active] = normals[self.active]
        self.ds[self.active] = ds[self.active]

    def parallel_pairs(self, angle_deg: float = 10.0, min_hits: int = 2):
        """Distinct co-tracked planes with near-parallel normals (or
        antiparallel) — candidates for ParallelPlaneRegularFactor
        (tangent-space variant; reference defines it in src/factors/)."""
        cos_tol = np.cos(np.deg2rad(angle_deg))
        act = np.flatnonzero(self.active & (self.hits >= min_hits))
        pairs = []
        for a in range(len(act)):
            for b in range(a + 1, len(act)):
                i, j = int(act[a]), int(act[b])
                if abs(float(self.normals[i] @ self.normals[j])) >= cos_tol:
                    pairs.append((i, j))
        return pairs
