"""Pallas TPU kernel: pyramidal Lucas-Kanade iteration loop in VMEM.

The XLA formulation of LK (ops/optical_flow.py) dispatches one device-wide
step per solver iteration: up to 30 iterations x 5 levels = 150 sequential
gather+reduce rounds over all keypoints (~36 ms measured for 256 keypoints
at 480x752). This kernel inverts the loop nesting: per pyramid level, XLA
gathers each keypoint's template/gradient patches and a search window ONCE
(one vmapped dynamic-slice round instead of one per iteration), then the
whole iteration loop runs inside the kernel on VMEM-resident blocks.

Constraint discovered on this Mosaic toolchain: DMAs and vector loads with
DYNAMIC offsets do not compile (only static block pipelining does), while
`pltpu.roll` with a dynamic shift DOES. The moving-window sample is
therefore realigned each iteration with two dynamic rolls (sublane + lane)
followed by static slicing + the 4-tap scalar-weight bilinear blend. Each
keypoint's loop exits at ITS convergence (the batched XLA version pays the
worst case of the whole batch every iteration).

Cross-checked against ops.optical_flow.klt_track in tests (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kimera_vio_tpu.ops import optical_flow as of

_LANES = 128


def _gather_windows(img, centers, rows, cols_pow):
    """XLA-side: (N,rows,cols_pow) integer-aligned windows + origins.

    Origins are clamped so windows stay inside the image."""
    H, W = img.shape
    y0 = jnp.clip(
        jnp.floor(centers[:, 1]).astype(jnp.int32), 0, max(H - rows, 0)
    )
    x0 = jnp.clip(
        jnp.floor(centers[:, 0]).astype(jnp.int32), 0, max(W - cols_pow, 0)
    )

    def one(yy, xx):
        return jax.lax.dynamic_slice(img, (yy, xx), (rows, cols_pow))

    return jax.vmap(one)(y0, x0), x0, y0


def _level_kernel(
    scal_ref,  # (N, 8) SMEM: [px, py, gx0, gy0, sx, sy, tx, ty] per kp
    valid_ref,  # (N, 1) SMEM int32
    tmpl_ref,  # (B, TR, 128) VMEM block (this program's B templates)
    gx_ref,
    gy_ref,
    search_ref,  # (B, SR, 128) VMEM block
    out_ref,  # (B, 8, 128) VMEM block; per kp row 0 lanes [x, y, ok, ...]
    *,
    win: int,
    search_rows: int,
    max_iter: int,
    eps: float,
    min_eig_thresh: float,
    block: int,
):
    prog = pl.program_id(0)
    half = (win - 1) * 0.5

    def blend_static(buf2d, fy_, fx_):
        w00 = (1 - fx_) * (1 - fy_)
        w01 = fx_ * (1 - fy_)
        w10 = (1 - fx_) * fy_
        w11 = fx_ * fy_
        a = buf2d[0:win, 0:win]
        b = buf2d[0:win, 1 : win + 1]
        c = buf2d[1 : win + 1, 0:win]
        d = buf2d[1 : win + 1, 1 : win + 1]
        return w00 * a + w01 * b + w10 * c + w11 * d

    def one_kp(j):
        i = prog * block + j
        px = scal_ref[i, 0]
        py = scal_ref[i, 1]
        gx0 = scal_ref[i, 2]
        gy0 = scal_ref[i, 3]
        sx = scal_ref[i, 4]
        sy = scal_ref[i, 5]
        tx = scal_ref[i, 6]
        ty = scal_ref[i, 7]

        # Template / gradients: fractional offset relative to the gathered
        # integer-aligned window origin (tx, ty).
        ftx = px - half - tx
        fty = py - half - ty
        tmpl = blend_static(tmpl_ref[j], fty, ftx)
        gx = blend_static(gx_ref[j], fty, ftx)
        gy = blend_static(gy_ref[j], fty, ftx)

        gxx = jnp.sum(gx * gx)
        gxy = jnp.sum(gx * gy)
        gyy = jnp.sum(gy * gy)
        det = gxx * gyy - gxy * gxy
        half_tr = 0.5 * (gxx + gyy)
        min_eig = (half_tr - jnp.sqrt(jnp.maximum(half_tr**2 - det, 0.0))) / (
            win * win
        )
        # Border keypoints whose gathered window was clamped have fractional
        # offsets outside [0, 1): their static-slice blend would extrapolate.
        frac_ok = (ftx >= 0.0) & (ftx < 1.5) & (fty >= 0.0) & (fty < 1.5)
        good_g = (min_eig > min_eig_thresh) & (valid_ref[i, 0] > 0) & frac_ok
        safe_det = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
        inv00 = gyy / safe_det
        inv01 = -gxy / safe_det
        inv11 = gxx / safe_det

        S = search_ref[j]  # (SR, 128)

        def body(state):
            it, cx_, cy_, moving, inb = state
            ox = cx_ - half - sx
            oy = cy_ - half - sy
            oxi = jnp.floor(ox).astype(jnp.int32)
            oyi = jnp.floor(oy).astype(jnp.int32)
            in_bounds = (
                (oxi >= 0)
                & (oyi >= 0)
                & (oxi <= _LANES - win - 2)
                & (oyi <= search_rows - win - 2)
            )
            oxi_c = jnp.clip(oxi, 0, _LANES - win - 2)
            oyi_c = jnp.clip(oyi, 0, search_rows - win - 2)
            fxx = ox - oxi_c.astype(jnp.float32)
            fyy = oy - oyi_c.astype(jnp.float32)
            # Realign: dynamic sublane roll MIScompiles on this toolchain,
            # so the y-shift is a shift-matrix matmul on the MXU (out[r] =
            # S[r + oyi]); the x-shift uses the (verified) dynamic lane
            # roll.
            r_ids = jax.lax.broadcasted_iota(
                jnp.int32, (search_rows, search_rows), 0
            )
            c_ids = jax.lax.broadcasted_iota(
                jnp.int32, (search_rows, search_rows), 1
            )
            P = (c_ids == r_ids + oyi_c).astype(jnp.float32)
            aligned_y = jax.lax.dot_general(
                P, S, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            aligned = pltpu.roll(aligned_y, -oxi_c, 1)
            cur = blend_static(aligned, fyy, fxx)
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
        ok = (good_g & inb).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
        return (
            jnp.where(lane == 0, cx_, 0.0)
            + jnp.where(lane == 1, cy_, 0.0)
            + jnp.where(lane == 2, ok, 0.0)
        )

    out_ref[...] = jnp.stack([one_kp(j) for j in range(block)], axis=0)


def _track_level_pallas(
    prev_img,
    prev_ix,
    prev_iy,
    cur_img,
    prev_pts,
    cur_pts,
    valid,
    *,
    win,
    search_rows,
    max_iter,
    eps,
    min_eig_thresh,
    interpret=False,
):
    H, W = prev_img.shape
    N = prev_pts.shape[0]
    tr = ((win + 2 + 7) // 8) * 8  # template rows, padded to sublane tile
    sr = search_rows

    half = (win - 1) * 0.5
    tmpl_centers = prev_pts - half  # top-left corner target
    T, tx0, ty0 = _gather_windows(prev_img, tmpl_centers, tr, _LANES)
    GX, _, _ = _gather_windows(prev_ix, tmpl_centers, tr, _LANES)
    GY, _, _ = _gather_windows(prev_iy, tmpl_centers, tr, _LANES)
    # Search window: centered on the initial guess.
    s_centers = cur_pts - jnp.array(
        [_LANES / 2.0, sr / 2.0], cur_pts.dtype
    )
    S, sx0, sy0 = _gather_windows(cur_img, s_centers, sr, _LANES)

    scal = jnp.stack(
        [
            prev_pts[:, 0],
            prev_pts[:, 1],
            cur_pts[:, 0],
            cur_pts[:, 1],
            sx0.astype(jnp.float32),
            sy0.astype(jnp.float32),
            tx0.astype(jnp.float32),
            ty0.astype(jnp.float32),
        ],
        axis=-1,
    )

    # Block keypoints per grid program: the TPU grid runs sequentially, so
    # fewer programs with unrolled per-keypoint work pipeline far better.
    B = 8
    Np = ((N + B - 1) // B) * B
    if Np != N:
        padn = Np - N
        scal = jnp.pad(scal, ((0, padn), (0, 0)))
        valid = jnp.pad(valid, ((0, padn),))
        T = jnp.pad(T, ((0, padn), (0, 0), (0, 0)))
        GX = jnp.pad(GX, ((0, padn), (0, 0), (0, 0)))
        GY = jnp.pad(GY, ((0, padn), (0, 0), (0, 0)))
        S = jnp.pad(S, ((0, padn), (0, 0), (0, 0)))
    kern = functools.partial(
        _level_kernel,
        win=win,
        search_rows=sr,
        max_iter=max_iter,
        eps=eps,
        min_eig_thresh=min_eig_thresh,
        block=B,
    )
    out = pl.pallas_call(
        kern,
        grid=(Np // B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal (full)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # valid (full)
            pl.BlockSpec((B, tr, _LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((B, tr, _LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((B, tr, _LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((B, sr, _LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((B, 8, _LANES), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, 8, _LANES), jnp.float32),
        interpret=interpret,
    )(
        scal,
        valid.astype(jnp.int32)[:, None],
        T,
        GX,
        GY,
        S,
    )
    pts = out[:N, 0, 0:2]
    ok = out[:N, 0, 2] > 0.5
    return pts, ok


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
    search_rows: int = 56,
    interpret: bool = False,
):
    """Drop-in Pallas counterpart of ops.optical_flow.klt_track.

    The per-level search region is (search_rows x 128) pixels around the
    initial guess (the coarse-to-fine chain keeps residual motion per level
    small); a keypoint pushing beyond it is marked failed.
    """
    n_levels = len(prev_pyr)
    scale_top = 2.0 ** (n_levels - 1)
    pts = init_pts / scale_top
    base = prev_pts / scale_top
    ok = valid
    if prev_grads is None:
        prev_grads = [of._grad(p) for p in prev_pyr]
    for lvl in range(n_levels - 1, -1, -1):
        if lvl != n_levels - 1:
            pts = pts * 2.0
            base = base * 2.0
        Hl, Wl = prev_pyr[lvl].shape
        Ix, Iy = prev_grads[lvl]
        if Hl < search_rows + 4 or Wl < _LANES + 4:
            # Coarse levels too small for the kernel's fixed window: fall
            # back to the XLA tracker (they are tiny and cheap there).
            if min(Hl, Wl) >= win + 2:
                pts, _ = of._track_level(
                    prev_pyr[lvl], Ix, Iy, cur_pyr[lvl], base, pts, valid,
                    win, max_iter, eps, min_eig_thresh, False,
                )
            continue
        pts, ok_lvl = _track_level_pallas(
            prev_pyr[lvl],
            Ix,
            Iy,
            cur_pyr[lvl],
            base,
            pts,
            valid,
            win=win,
            search_rows=search_rows,
            max_iter=max_iter,
            eps=eps,
            min_eig_thresh=min_eig_thresh,
            interpret=interpret,
        )
        if lvl == 0:
            ok = ok & ok_lvl
    H0, W0 = prev_pyr[0].shape
    half = win * 0.5
    inb = (
        (pts[:, 0] >= half)
        & (pts[:, 0] < W0 - half)
        & (pts[:, 1] >= half)
        & (pts[:, 1] < H0 - half)
    )
    return pts, ok & inb
