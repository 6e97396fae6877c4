"""Robust SE(3) pose-graph optimization (the KimeraRPGO replacement).

Reference: the LCD hands loop factors to KimeraRPGO::RobustSolver
(LoopClosureDetector.cpp:173-182, 1298) — PCM (pairwise consistency
maximization) outlier rejection followed by Gauss-Newton over the full pose
graph. Here:

  * PCM: the pairwise consistency test between loop candidates is one
    batched [C, C] kernel (SURVEY.md §2.12: "PCM consistency check as
    batched pairwise test"); the max consistent clique is approximated
    greedily by degree (KimeraRPGO uses a max-clique heuristic too),
  * GN: batched edge residuals r = Log(T_meas^-1 T_i^-1 T_j) with autodiff
    Jacobians, dense normal equations over all 6K pose DoF, Cholesky solve,
    gauge fixed by a prior on node 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from kimera_vio_tpu.common import geometry as geo


def se3_edge_residual(Ri, ti, Rj, tj, R_meas, t_meas):
    """6-dim between-factor residual Log(T_meas^-1 (T_i^-1 T_j))."""
    R_ij = Ri.T @ Rj
    t_ij = (Ri.T @ (tj - ti)[..., None])[..., 0]
    dR = R_meas.T @ R_ij
    dt = (R_meas.T @ (t_ij - t_meas)[..., None])[..., 0]
    return jnp.concatenate([geo.so3_log(dR), dt], axis=-1)


def _edge_blocks(rot, pos, edges_i, edges_j, R_meas, t_meas, w):
    """Linearize all edges. Returns (Ji (E,6,6), Jj, r (E,6)) whitened by
    sqrt-weights w (E,)."""

    def one(i, j, Rm, tm, wk):
        def res(di, dj):
            Ri = rot[i] @ geo.so3_exp(di[0:3])
            Rj = rot[j] @ geo.so3_exp(dj[0:3])
            return se3_edge_residual(
                Ri, pos[i] + di[3:6], Rj, pos[j] + dj[3:6], Rm, tm
            )

        z = jnp.zeros(6, pos.dtype)
        r = res(z, z)
        Ji = jax.jacfwd(lambda d: res(d, z))(z)
        Jj = jax.jacfwd(lambda d: res(z, d))(z)
        return Ji * wk, Jj * wk, r * wk

    return jax.vmap(one)(edges_i, edges_j, R_meas, t_meas, w)


def optimize_pose_graph(
    rot: jax.Array,  # (K,3,3) initial poses
    pos: jax.Array,  # (K,3)
    edges_i: jax.Array,  # (E,) int32
    edges_j: jax.Array,
    R_meas: jax.Array,  # (E,3,3) measured relative poses (i -> j)
    t_meas: jax.Array,  # (E,3)
    edge_weight: jax.Array,  # (E,) 0 disables an edge
    *,
    iters: int = 10,
    anchor: int = 0,
):
    """Gauss-Newton over the full pose graph; node `anchor` held fixed."""
    K = rot.shape[0]
    D = K * 6

    def gn(state, _):
        rot, pos = state
        Ji, Jj, r = _edge_blocks(
            rot, pos, edges_i, edges_j, R_meas, t_meas,
            jnp.sqrt(jnp.maximum(edge_weight, 0.0)),
        )
        H = jnp.zeros((K, 6, K, 6), pos.dtype)
        g = jnp.zeros((K, 6), pos.dtype)
        H = H.at[edges_i, :, edges_i, :].add(jnp.einsum("eri,erj->eij", Ji, Ji))
        H = H.at[edges_j, :, edges_j, :].add(jnp.einsum("eri,erj->eij", Jj, Jj))
        Hij = jnp.einsum("eri,erj->eij", Ji, Jj)
        H = H.at[edges_i, :, edges_j, :].add(Hij)
        H = H.at[edges_j, :, edges_i, :].add(jnp.swapaxes(Hij, -1, -2))
        g = g.at[edges_i].add(jnp.einsum("eri,er->ei", Ji, r))
        g = g.at[edges_j].add(jnp.einsum("eri,er->ei", Jj, r))
        # Gauge: pin the anchor node.
        H = H.at[anchor, :, anchor, :].add(1e6 * jnp.eye(6, dtype=pos.dtype))
        Hf = H.reshape(D, D) + 1e-6 * jnp.eye(D, dtype=pos.dtype)
        gf = g.reshape(D)
        Lc = jnp.linalg.cholesky(Hf)
        delta = -jax.scipy.linalg.cho_solve((Lc, True), gf).reshape(K, 6)
        rot2 = rot @ geo.so3_exp(delta[:, 0:3])
        pos2 = pos + delta[:, 3:6]
        return (rot2, pos2), jnp.sum(r * r)

    (rot, pos), costs = jax.lax.scan(gn, (rot, pos), None, length=iters)
    return rot, pos, costs


def edge_chi2(rot, pos, edges_i, edges_j, R_meas, t_meas):
    """Unweighted squared residual norm per edge at the given poses —
    the chi2 driving the GNC TLS weight update (KimeraRPGO GncOptimizer
    inner loop)."""
    r = jax.vmap(
        lambda i, j, Rm, tm: se3_edge_residual(
            rot[i], pos[i], rot[j], pos[j], Rm, tm
        )
    )(edges_i, edges_j, R_meas, t_meas)
    return jnp.sum(r * r, axis=-1)


def pcm_consistency(
    odo_rot: jax.Array,  # (K,3,3) odometry chain poses (world)
    odo_pos: jax.Array,  # (K,3)
    loops_i: jax.Array,  # (C,) int32 loop endpoints
    loops_j: jax.Array,
    R_loop: jax.Array,  # (C,3,3) measured i->j relative poses
    t_loop: jax.Array,  # (C,3)
    mask: jax.Array,  # (C,)
    *,
    rot_threshold: float = 0.01,
    trans_threshold: float = 0.1,
):
    """Pairwise consistency maximization over loop candidates, batched.

    For loops a=(i,j) and b=(k,l): the cycle
    T_loop_a^-1 * odo(i->k) * T_loop_b * odo(l->j) must be ~identity.
    Returns the consistent-set mask (C,) via a greedy max-clique
    approximation on the [C, C] consistency matrix."""

    def pose_of(k):
        return odo_rot[k], odo_pos[k]

    def rel(ka, kb):
        Ra, ta = pose_of(ka)
        Rb, tb = pose_of(kb)
        return Ra.transpose(0, 2, 1) @ Rb, jnp.einsum(
            "cij,cj->ci", Ra.transpose(0, 2, 1), tb - ta
        )

    C = loops_i.shape[0]
    ii = jnp.broadcast_to(loops_i[:, None], (C, C)).reshape(-1)
    jj = jnp.broadcast_to(loops_j[:, None], (C, C)).reshape(-1)
    kk = jnp.broadcast_to(loops_i[None, :], (C, C)).reshape(-1)
    ll = jnp.broadcast_to(loops_j[None, :], (C, C)).reshape(-1)

    R_ik, t_ik = rel(ii, kk)
    R_lj, t_lj = rel(ll, jj)
    Ra = jnp.broadcast_to(R_loop[:, None], (C, C, 3, 3)).reshape(-1, 3, 3)
    ta = jnp.broadcast_to(t_loop[:, None], (C, C, 3)).reshape(-1, 3)
    Rb = jnp.broadcast_to(R_loop[None, :], (C, C, 3, 3)).reshape(-1, 3, 3)
    tb = jnp.broadcast_to(t_loop[None, :], (C, C, 3)).reshape(-1, 3)

    # cycle = Ta^-1 * (i->k) * Tb * (l->j)
    def compose(R1, t1, R2, t2):
        return R1 @ R2, jnp.einsum("cij,cj->ci", R1, t2) + t1

    Rc, tc = compose(R_ik, t_ik, Rb, tb)
    Rc, tc = compose(Rc, tc, R_lj, t_lj)
    RaT = Ra.transpose(0, 2, 1)
    Rcyc = RaT @ Rc
    tcyc = jnp.einsum("cij,cj->ci", RaT, tc - ta)
    rot_err = jnp.linalg.norm(geo.so3_log(Rcyc), axis=-1).reshape(C, C)
    trans_err = jnp.linalg.norm(tcyc, axis=-1).reshape(C, C)
    consistent = (rot_err < rot_threshold) & (trans_err < trans_threshold)
    consistent = consistent & mask[:, None] & mask[None, :]

    # Greedy clique: repeatedly keep the highest-degree candidate and drop
    # the candidates inconsistent with it.
    def body(state):
        active, clique = state
        deg = jnp.where(active, (consistent & active[None, :]).sum(-1), -1)
        best = jnp.argmax(deg)
        has = deg[best] >= 0
        clique = clique.at[best].set(has)
        keep = consistent[best] & active
        keep = keep.at[best].set(False)
        return keep, clique

    def cond(state):
        active, _ = state
        return active.any()

    active0 = mask
    clique0 = jnp.zeros_like(mask)
    _, clique = jax.lax.while_loop(cond, body, (active0, clique0))
    # A clique member must be consistent with every other member.
    ok = clique & (
        jnp.where(clique[None, :], consistent, True).all(-1) | (clique.sum() <= 1)
    )
    return ok
