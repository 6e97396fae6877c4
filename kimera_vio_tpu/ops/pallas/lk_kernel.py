"""Pallas TPU kernel: pyramidal Lucas-Kanade iteration loop in VMEM.

The XLA formulation of LK (ops/optical_flow.py) dispatches one device-wide
step per solver iteration: up to 30 iterations x 5 levels = 150 sequential
gather+reduce rounds over all keypoints (~36 ms measured for 256 keypoints
at 480x752). This kernel inverts the loop nesting — the grid runs over
keypoints and the WHOLE iteration loop of one level runs inside the kernel
on VMEM-resident patches:

  * 3 async DMAs per keypoint pull the template patch, its Scharr
    gradients, and a (SEARCH x SEARCH) current-image search window from HBM
    into VMEM scratch,
  * the 2x2 normal matrix is inverted once (scalar math),
  * the iteration loop samples the moving patch with a dynamic VMEM slice +
    4-tap scalar-weight bilinear blend, updates the flow, and early-exits
    per keypoint (each keypoint converges independently — the batched XLA
    version pays worst-case-of-the-batch),
  * out-of-search-window motion marks the keypoint failed, like the
    reference's border policy in cv::calcOpticalFlowPyrLK.

The public wrapper `klt_track_pallas` mirrors ops.optical_flow.klt_track's
semantics and is cross-checked against it in tests (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kimera_vio_tpu.ops import optical_flow as of


def _level_kernel(
    # scalar-prefetch: none; refs:
    pts_ref,  # (N, 2) float32 — prev positions at this level (VMEM)
    init_ref,  # (N, 2) float32 — current guesses (VMEM)
    valid_ref,  # (N, 1) int32 (VMEM)
    prev_hbm,  # (H, W) HBM
    ix_hbm,
    iy_hbm,
    cur_hbm,
    out_pts_ref,  # (N, 2)
    out_ok_ref,  # (N, 1) int32
    tmpl_s,  # (PAD, 128) VMEM scratch
    gx_s,
    gy_s,
    cur_s,  # (SEARCH_PAD, 128) VMEM scratch
    sem,  # DMA semaphores (4,)
    *,
    win: int,
    search: int,
    max_iter: int,
    eps: float,
    min_eig_thresh: float,
    H: int,
    W: int,
):
    i = pl.program_id(0)
    px = pts_ref[i, 0]
    py = pts_ref[i, 1]
    gx0 = init_ref[i, 0]
    gy0 = init_ref[i, 1]
    half = (win - 1) * 0.5

    # ---- template + gradient patches: integer-aligned (win+1)^2 ----
    tx = jnp.floor(px - half).astype(jnp.int32)
    ty = jnp.floor(py - half).astype(jnp.int32)
    fx = px - half - tx.astype(jnp.float32)
    fy = py - half - ty.astype(jnp.float32)
    txc = jnp.clip(tx, 0, W - win - 2)
    tyc = jnp.clip(ty, 0, H - win - 2)
    # If clamping moved the window, the fractional part is recomputed
    # against the clamped origin (matches dynamic_slice clamping upstream).
    fx = px - half - txc.astype(jnp.float32)
    fy = py - half - tyc.astype(jnp.float32)

    cp1 = pltpu.make_async_copy(
        prev_hbm.at[pl.ds(tyc, win + 2), pl.ds(txc, win + 2)],
        tmpl_s.at[pl.ds(0, win + 2), pl.ds(0, win + 2)],
        sem.at[0],
    )
    cp2 = pltpu.make_async_copy(
        ix_hbm.at[pl.ds(tyc, win + 2), pl.ds(txc, win + 2)],
        gx_s.at[pl.ds(0, win + 2), pl.ds(0, win + 2)],
        sem.at[1],
    )
    cp3 = pltpu.make_async_copy(
        iy_hbm.at[pl.ds(tyc, win + 2), pl.ds(txc, win + 2)],
        gy_s.at[pl.ds(0, win + 2), pl.ds(0, win + 2)],
        sem.at[2],
    )
    # ---- search window around the initial guess ----
    sh = search // 2
    sx = jnp.clip(jnp.floor(gx0).astype(jnp.int32) - sh, 0, W - search - 2)
    sy = jnp.clip(jnp.floor(gy0).astype(jnp.int32) - sh, 0, H - search - 2)
    cp4 = pltpu.make_async_copy(
        cur_hbm.at[pl.ds(sy, search + 2), pl.ds(sx, search + 2)],
        cur_s.at[pl.ds(0, search + 2), pl.ds(0, search + 2)],
        sem.at[3],
    )
    cp1.start()
    cp2.start()
    cp3.start()
    cp4.start()
    cp1.wait()
    cp2.wait()
    cp3.wait()
    cp4.wait()

    def blend(buf, fy_, fx_):
        """(win x win) bilinear sample of buf at fractional origin."""
        w00 = (1 - fx_) * (1 - fy_)
        w01 = fx_ * (1 - fy_)
        w10 = (1 - fx_) * fy_
        w11 = fx_ * fy_
        a = buf[pl.ds(0, win), pl.ds(0, win)]
        b = buf[pl.ds(0, win), pl.ds(1, win)]
        c = buf[pl.ds(1, win), pl.ds(0, win)]
        d = buf[pl.ds(1, win), pl.ds(1, win)]
        return w00 * a + w01 * b + w10 * c + w11 * d

    tmpl = blend(tmpl_s, fy, fx)
    gx = blend(gx_s, fy, fx)
    gy = blend(gy_s, fy, fx)

    gxx = jnp.sum(gx * gx)
    gxy = jnp.sum(gx * gy)
    gyy = jnp.sum(gy * gy)
    det = gxx * gyy - gxy * gxy
    half_tr = 0.5 * (gxx + gyy)
    min_eig = (half_tr - jnp.sqrt(jnp.maximum(half_tr**2 - det, 0.0))) / (
        win * win
    )
    good_g = (min_eig > min_eig_thresh) & (valid_ref[i, 0] > 0)
    safe_det = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    inv00 = gyy / safe_det
    inv01 = -gxy / safe_det
    inv11 = gxx / safe_det

    # ---- iteration loop (positions relative to the search buffer) ----
    def body(state):
        it, cx_, cy_, moving, inb = state
        ox = cx_ - half - sx.astype(jnp.float32)
        oy = cy_ - half - sy.astype(jnp.float32)
        oxi = jnp.floor(ox).astype(jnp.int32)
        oyi = jnp.floor(oy).astype(jnp.int32)
        in_bounds = (
            (oxi >= 0) & (oyi >= 0)
            & (oxi <= search + 1 - win - 1)
            & (oyi <= search + 1 - win - 1)
        )
        oxi_c = jnp.clip(oxi, 0, search + 1 - win)
        oyi_c = jnp.clip(oyi, 0, search + 1 - win)
        fxx = ox - oxi_c.astype(jnp.float32)
        fyy = oy - oyi_c.astype(jnp.float32)
        w00 = (1 - fxx) * (1 - fyy)
        w01 = fxx * (1 - fyy)
        w10 = (1 - fxx) * fyy
        w11 = fxx * fyy
        a = cur_s[pl.ds(oyi_c, win), pl.ds(oxi_c, win)]
        b = cur_s[pl.ds(oyi_c, win), pl.ds(oxi_c + 1, win)]
        c = cur_s[pl.ds(oyi_c + 1, win), pl.ds(oxi_c, win)]
        d = cur_s[pl.ds(oyi_c + 1, win), pl.ds(oxi_c + 1, win)]
        cur = w00 * a + w01 * b + w10 * c + w11 * d
        dI = cur - tmpl
        bx = jnp.sum(dI * gx)
        by = jnp.sum(dI * gy)
        dx = -(inv00 * bx + inv01 * by)
        dy = -(inv01 * bx + inv11 * by)
        step_ok = moving & good_g & in_bounds
        nx = jnp.where(step_ok, cx_ + dx, cx_)
        ny = jnp.where(step_ok, cy_ + dy, cy_)
        still = (dx * dx + dy * dy) >= eps * eps
        return it + 1, nx, ny, moving & still, inb & in_bounds

    def cond(state):
        it, _, _, moving, _ = state
        return (it < max_iter) & moving

    _, cx_, cy_, _, inb = jax.lax.while_loop(
        cond, body, (0, gx0, gy0, True, True)
    )
    out_pts_ref[i, 0] = cx_
    out_pts_ref[i, 1] = cy_
    ok = good_g & inb
    out_ok_ref[i, 0] = ok.astype(jnp.int32)


def _track_level_pallas(
    prev_img, prev_ix, prev_iy, cur_img, prev_pts, cur_pts, valid,
    *, win, search, max_iter, eps, min_eig_thresh, interpret=False,
):
    H, W = prev_img.shape
    N = prev_pts.shape[0]
    pad = max(win + 2, 8)
    spad = max(search + 2, 8)
    kern = functools.partial(
        _level_kernel,
        win=win,
        search=search,
        max_iter=max_iter,
        eps=eps,
        min_eig_thresh=min_eig_thresh,
        H=H,
        W=W,
    )
    out_pts, out_ok = pl.pallas_call(
        kern,
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pts (scalar reads)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # init
            pl.BlockSpec(memory_space=pltpu.SMEM),  # valid
            pl.BlockSpec(memory_space=pltpu.ANY),  # prev (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, 2), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((pad, 128), jnp.float32),
            pltpu.VMEM((pad, 128), jnp.float32),
            pltpu.VMEM((pad, 128), jnp.float32),
            pltpu.VMEM((spad, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(
        prev_pts.astype(jnp.float32),
        cur_pts.astype(jnp.float32),
        valid.astype(jnp.int32)[:, None],
        prev_img,
        prev_ix,
        prev_iy,
        cur_img,
    )
    return out_pts, out_ok[:, 0] > 0


def klt_track_pallas(
    prev_pyr,
    cur_pyr,
    prev_pts,
    init_pts,
    valid,
    *,
    win: int = 24,
    max_iter: int = 30,
    eps: float = 0.1,
    min_eig_thresh: float = 1e-4,
    prev_grads=None,
    search_margin: int = 12,
    interpret: bool = False,
):
    """Drop-in Pallas counterpart of ops.optical_flow.klt_track.

    `search_margin` bounds the per-level motion around the initial guess
    (the coarse-to-fine chain makes residual motion per level small); a
    keypoint pushing beyond the search window is marked failed.
    """
    n_levels = len(prev_pyr)
    scale_top = 2.0 ** (n_levels - 1)
    pts = init_pts / scale_top
    base = prev_pts / scale_top
    ok = valid
    if prev_grads is None:
        prev_grads = [of._grad(p) for p in prev_pyr]
    search = win + 2 * search_margin
    for lvl in range(n_levels - 1, -1, -1):
        if lvl != n_levels - 1:
            pts = pts * 2.0
            base = base * 2.0
        Hl, Wl = prev_pyr[lvl].shape
        if min(Hl, Wl) < search + 4:
            continue
        Ix, Iy = prev_grads[lvl]
        pts, ok_lvl = _track_level_pallas(
            prev_pyr[lvl], Ix, Iy, cur_pyr[lvl], base, pts, valid,
            win=win, search=search, max_iter=max_iter, eps=eps,
            min_eig_thresh=min_eig_thresh, interpret=interpret,
        )
        if lvl == 0:
            ok = ok & ok_lvl
    # Final bounds check at full resolution (same policy as the XLA path).
    H0, W0 = prev_pyr[0].shape
    half = win * 0.5
    inb = (
        (pts[:, 0] >= half)
        & (pts[:, 0] < W0 - half)
        & (pts[:, 1] >= half)
        & (pts[:, 1] < H0 - half)
    )
    return pts, ok & inb
