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
    """XLA-side: (N,[C,]rows,cols_pow) integer-aligned windows + origins.

    `img` may be (H,W) or stacked (C,H,W) — a stacked gather moves C
    channels (image + gradients) in ONE vmapped dynamic_slice per keypoint,
    a third of the slice count of per-channel gathers (the dominant LK
    setup cost measured on TPU). Origins are clamped inside the image."""
    H, W = img.shape[-2], img.shape[-1]
    y0 = jnp.clip(
        jnp.floor(centers[:, 1]).astype(jnp.int32), 0, max(H - rows, 0)
    )
    x0 = jnp.clip(
        jnp.floor(centers[:, 0]).astype(jnp.int32), 0, max(W - cols_pow, 0)
    )

    if img.ndim == 3:
        C = img.shape[0]

        def one(yy, xx):
            return jax.lax.dynamic_slice(
                img, (0, yy, xx), (C, rows, cols_pow)
            )

    else:

        def one(yy, xx):
            return jax.lax.dynamic_slice(img, (yy, xx), (rows, cols_pow))

    return jax.vmap(one)(y0, x0), x0, y0


def _level_kernel(
    scal_ref,  # (N, 8) SMEM: [px, py, gx0, gy0, sx, sy, tx, ty] per kp
    valid_ref,  # (N, 1) SMEM int32
    tg_ref,  # (B, 3, TR, TC) VMEM: stacked [template, gx, gy] windows
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
    """Batched-iteration LK: ONE while_loop drives all `block` keypoints.

    The sequential budget per program is the MAX iteration count over the
    block (vs the SUM for per-keypoint loops — ~B-fold fewer sequential
    rounds). Per iteration the y-realignment AND the fractional-y bilinear
    tap of every keypoint fuse into a single block-diagonal shift/weight
    matrix multiplied on the MXU:

        rows(b,i) of P select (1-fy_b)*S[y0_b+i] + fy_b*S[y0_b+i+1]
        from the stacked searches S (B*SR, 128),

    leaving only the per-keypoint dynamic LANE roll (the one Mosaic
    primitive that is both correct and per-scalar here; dynamic sublane
    rolls miscompile on this toolchain) and a 2-tap x blend."""
    prog = pl.program_id(0)
    half = (win - 1) * 0.5
    B = block
    SR = search_rows
    WR = win + 2  # realigned rows needed per keypoint (win + 1 tap + pad)

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

    # ---- per-keypoint static prep (template blends, gains, validity).
    # All per-kp bookkeeping stays SCALAR (SMEM): Mosaic cannot hold (B,)
    # vectors ("layout_rank" check) nor gather from them by index.
    tmpls, gxs, gys = [], [], []
    good_g, inv00, inv01, inv11 = [], [], [], []
    sx, sy, gx0, gy0 = [], [], [], []
    for j in range(B):
        i = prog * B + j
        px = scal_ref[i, 0]
        py = scal_ref[i, 1]
        gx0.append(scal_ref[i, 2])
        gy0.append(scal_ref[i, 3])
        sx.append(scal_ref[i, 4])
        sy.append(scal_ref[i, 5])
        tx = scal_ref[i, 6]
        ty = scal_ref[i, 7]
        ftx = px - half - tx
        fty = py - half - ty
        tmpl = blend_static(tg_ref[j, 0], fty, ftx)
        gx = blend_static(tg_ref[j, 1], fty, ftx)
        gy = blend_static(tg_ref[j, 2], fty, ftx)
        tmpls.append(tmpl)
        gxs.append(gx)
        gys.append(gy)
        gxx = jnp.sum(gx * gx)
        gxy = jnp.sum(gx * gy)
        gyy = jnp.sum(gy * gy)
        det = gxx * gyy - gxy * gxy
        half_tr = 0.5 * (gxx + gyy)
        min_eig = (half_tr - jnp.sqrt(jnp.maximum(half_tr**2 - det, 0.0))) / (
            win * win
        )
        frac_ok = (ftx >= 0.0) & (ftx < 1.5) & (fty >= 0.0) & (fty < 1.5)
        good_g.append(
            (min_eig > min_eig_thresh) & (valid_ref[i, 0] > 0) & frac_ok
        )
        safe_det = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
        inv00.append(gyy / safe_det)
        inv01.append(-gxy / safe_det)
        inv11.append(gxx / safe_det)

    S_all = search_ref[...].reshape(B * SR, _LANES)

    # Static iota fields for the block-diagonal selector (built once).
    rr = jax.lax.broadcasted_iota(jnp.int32, (B * WR, B * SR), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (B * WR, B * SR), 1)
    b_of_r = rr // WR
    i_of_r = rr % WR
    same_blk = ((cc // SR) == b_of_r).astype(jnp.float32)
    src = cc - (b_of_r * SR + i_of_r)  # source-row offset per cell

    def body(state):
        it, cx_, cy_, moving, inb = state  # tuples of B scalars
        oxi_c, fxx, new_inb = [], [], []
        oyi_row = jnp.zeros_like(rr)
        fy_row = jnp.zeros(rr.shape, jnp.float32)
        for j in range(B):
            ox = cx_[j] - half - sx[j]
            oy = cy_[j] - half - sy[j]
            oxi = jnp.floor(ox).astype(jnp.int32)
            oyi = jnp.floor(oy).astype(jnp.int32)
            in_bounds = (
                (oxi >= 0)
                & (oyi >= 0)
                & (oxi <= _LANES - win - 2)
                & (oyi <= SR - win - 2)
            )
            oxc = jnp.clip(oxi, 0, _LANES - win - 2)
            oyc = jnp.clip(oyi, 0, SR - win - 2)
            oxi_c.append(oxc)
            fxx.append(ox - oxc.astype(jnp.float32))
            fy_j = oy - oyc.astype(jnp.float32)
            is_j = b_of_r == j
            oyi_row = jnp.where(is_j, oyc, oyi_row)
            fy_row = jnp.where(is_j, fy_j, fy_row)
            new_inb.append(inb[j] & in_bounds)

        P = same_blk * (
            (src == oyi_row).astype(jnp.float32) * (1.0 - fy_row)
            + (src == oyi_row + 1).astype(jnp.float32) * fy_row
        )
        # (B*WR, B*SR) @ (B*SR, 128) on the MXU: per-kp y-shift + y-lerp
        # for the whole block in one matmul.
        rows = jax.lax.dot_general(
            P, S_all, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B*WR, 128), y-interpolated

        ncx, ncy, nmv = [], [], []
        for j in range(B):
            slab = rows[j * WR : j * WR + win, :]
            slab = pltpu.roll(slab, -oxi_c[j], 1)
            cur = (1.0 - fxx[j]) * slab[:, 0:win] + fxx[j] * slab[:, 1 : win + 1]
            dI = cur - tmpls[j]
            bx = jnp.sum(dI * gxs[j])
            by = jnp.sum(dI * gys[j])
            dx = -(inv00[j] * bx + inv01[j] * by)
            dy = -(inv01[j] * bx + inv11[j] * by)
            step_ok = moving[j] & good_g[j] & new_inb[j]
            ncx.append(jnp.where(step_ok, cx_[j] + dx, cx_[j]))
            ncy.append(jnp.where(step_ok, cy_[j] + dy, cy_[j]))
            nmv.append(moving[j] & ((dx * dx + dy * dy) >= eps * eps))
        return it + 1, tuple(ncx), tuple(ncy), tuple(nmv), tuple(new_inb)

    def cond(state):
        it, _, _, moving, _ = state
        any_moving = moving[0]
        for j in range(1, B):
            any_moving = any_moving | moving[j]
        return (it < max_iter) & any_moving

    t_true = tuple(jnp.bool_(True) for _ in range(B))
    _, cx_, cy_, _, inb = jax.lax.while_loop(
        cond,
        body,
        (0, tuple(gx0), tuple(gy0), t_true, t_true),
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
    outs = []
    for j in range(B):
        ok = (good_g[j] & inb[j]).astype(jnp.float32)
        outs.append(
            jnp.where(lane == 0, cx_[j], 0.0)
            + jnp.where(lane == 1, cy_[j], 0.0)
            + jnp.where(lane == 2, ok, 0.0)
        )
    out_ref[...] = jnp.stack(outs, axis=0)


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
    # Template column width: narrow (multiple of 32) — the gather traffic,
    # not the kernel, dominates LK setup time.
    tc = ((win + 3 + 31) // 32) * 32
    tmpl_centers = prev_pts - half  # top-left corner target
    TG_img = jnp.stack([prev_img, prev_ix, prev_iy])  # (3,H,W)
    TG, tx0, ty0 = _gather_windows(TG_img, tmpl_centers, tr, tc)
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
        TG = jnp.pad(TG, ((0, padn), (0, 0), (0, 0), (0, 0)))
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
            pl.BlockSpec((B, 3, tr, tc), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((B, sr, _LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((B, 8, _LANES), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, 8, _LANES), jnp.float32),
        interpret=interpret,
    )(
        scal,
        valid.astype(jnp.int32)[:, None],
        TG,
        S,
    )
    pts = out[:N, 0, 0:2]
    ok = out[:N, 0, 2] > 0.5
    return pts, ok


def _level_kernel_vmem(
    scal_ref,  # (N, 4) SMEM: [px, py, cx0, cy0]
    valid_ref,  # (N, 1) SMEM int32
    prev3_ref,  # (3, H, Wp) VMEM: stacked [prev, gx, gy] full image
    cur_ref,  # (H, Wp) VMEM full current image
    out_ref,  # (B, 8, 128)
    *,
    win: int,
    search_rows: int,
    max_iter: int,
    eps: float,
    min_eig_thresh: float,
    block: int,
    height: int,
    width: int,  # logical width (<= Wp)
):
    """Whole-image-in-VMEM LK level: NO XLA-side window gathers.

    vmapped dynamic_slice gathers cost ~10 us per slice on this TPU backend
    (measured: 2.6 ms/level for 512 slices — the dominant LK cost), so this
    kernel keeps the full pyramid level resident in VMEM (fits: 480x752 f32
    x4 channels ~ 5.7 MB) and extracts every window with one-hot row-select
    matmuls on the MXU + a one-hot column-select matmul per keypoint:

      search rows:  P_s (B*SR, H) @ cur (H, Wp)      - one matmul/program
      x alignment:  slab (SR, Wp) @ Q_j (Wp, 128)    - one matmul/keypoint
      templates:    P_t (B*TR, H) @ prev_c (H, Wp)   - 3 matmuls/program

    The iteration loop is identical to `_level_kernel` (block-diagonal
    y-shift+lerp matmul, per-keypoint lane roll, 2-tap x blend)."""
    prog = pl.program_id(0)
    half = (win - 1) * 0.5
    B = block
    SR = search_rows
    WR = win + 2
    TR = ((win + 2 + 7) // 8) * 8
    H = height
    Wp = prev3_ref.shape[2]
    TC = ((win + 3 + 31) // 32) * 32

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

    # ---- per-kp scalar origins (computed in-kernel, SMEM scalars) ----
    px, py, cx0, cy0 = [], [], [], []
    tx0, ty0, sx0, sy0 = [], [], [], []
    for j in range(B):
        i = prog * B + j
        px_j = scal_ref[i, 0]
        py_j = scal_ref[i, 1]
        cx_j = scal_ref[i, 2]
        cy_j = scal_ref[i, 3]
        px.append(px_j)
        py.append(py_j)
        cx0.append(cx_j)
        cy0.append(cy_j)
        tx0.append(
            jnp.clip(
                jnp.floor(px_j - half).astype(jnp.int32), 0, max(width - TC, 0)
            )
        )
        ty0.append(
            jnp.clip(
                jnp.floor(py_j - half).astype(jnp.int32), 0, max(H - TR, 0)
            )
        )
        sx0.append(
            jnp.clip(
                jnp.floor(cx_j).astype(jnp.int32) - _LANES // 2,
                0,
                max(width - _LANES, 0),
            )
        )
        sy0.append(
            jnp.clip(
                jnp.floor(cy_j).astype(jnp.int32) - SR // 2, 0, max(H - SR, 0)
            )
        )

    # ---- window extraction: per-kp one-hot row/col-select matmuls --------
    # Images live in VMEM as bf16: uint8-sourced intensities (integers
    # <= 255) are EXACT in bf16; halving the image buffers is what makes the
    # whole level fit the 16 MB VMEM budget. Extraction runs PER KEYPOINT
    # (small (rows,H)@(H,Wp) + (rows,Wp)@(Wp,cols) matmuls) to keep the
    # compiler's scoped-VMEM stack small — a fused (B*SR, H) selector blew
    # the 16 MB limit. MXU matmuls need 16-multiple sublanes for bf16, so
    # selectors are f32 and only the image operand rides bf16 (DEFAULT
    # precision; f32 accumulation via preferred_element_type).
    SELR = ((SR + 15) // 16) * 16  # bf16 lhs sublanes must be 16-multiples
    rr_sel = jax.lax.broadcasted_iota(jnp.int32, (SELR, H), 0)
    cc_sel = jax.lax.broadcasted_iota(jnp.int32, (SELR, H), 1)
    cc_q = jax.lax.broadcasted_iota(jnp.int32, (Wp, _LANES), 0)
    mm_q = jax.lax.broadcasted_iota(jnp.int32, (Wp, _LANES), 1)
    dd = jax.lax.dot_general
    dn = (((1,), (0,)), ((), ()))
    kw = dict(
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    S_parts = []
    for j in range(B):
        P_sj = (cc_sel == sy0[j] + rr_sel).astype(jnp.bfloat16)  # (SELR, H)
        rows_j = dd(P_sj, cur_ref[...], dn, **kw)  # (SELR, Wp) f32
        Q = (cc_q == sx0[j] + mm_q).astype(jnp.float32)  # (Wp, 128)
        S_parts.append(
            dd(rows_j[0:SR, :], Q, dn, preferred_element_type=jnp.float32)
        )
    S_all = jnp.concatenate(S_parts, axis=0)  # (B*SR, 128)

    # ---- template/gradient extraction (same trick, TR rows, TC cols) ----
    rr_t = jax.lax.broadcasted_iota(jnp.int32, (TR, H), 0)
    cc_t = jax.lax.broadcasted_iota(jnp.int32, (TR, H), 1)
    cc_qt = jax.lax.broadcasted_iota(jnp.int32, (Wp, TC), 0)
    mm_qt = jax.lax.broadcasted_iota(jnp.int32, (Wp, TC), 1)
    tg = [[], [], []]  # tg[c][j] = (TR, TC)
    for j in range(B):
        P_tj = (cc_t == ty0[j] + rr_t).astype(jnp.bfloat16)  # (TR, H)
        Qt = (cc_qt == tx0[j] + mm_qt).astype(jnp.float32)  # (Wp, TC)
        for c in range(3):
            rows_c = dd(P_tj, prev3_ref[c], dn, **kw)  # (TR, Wp)
            tg[c].append(dd(rows_c, Qt, dn, preferred_element_type=jnp.float32))

    # ---- per-kp gains / validity ----
    tmpls, gxs, gys = [], [], []
    good_g, inv00, inv01, inv11 = [], [], [], []
    for j in range(B):
        ftx = px[j] - half - tx0[j].astype(jnp.float32)
        fty = py[j] - half - ty0[j].astype(jnp.float32)
        tmpl = blend_static(tg[0][j], fty, ftx)
        gx = blend_static(tg[1][j], fty, ftx)
        gy = blend_static(tg[2][j], fty, ftx)
        tmpls.append(tmpl)
        gxs.append(gx)
        gys.append(gy)
        gxx = jnp.sum(gx * gx)
        gxy = jnp.sum(gx * gy)
        gyy = jnp.sum(gy * gy)
        det = gxx * gyy - gxy * gxy
        half_tr = 0.5 * (gxx + gyy)
        min_eig = (half_tr - jnp.sqrt(jnp.maximum(half_tr**2 - det, 0.0))) / (
            win * win
        )
        frac_ok = (ftx >= 0.0) & (ftx < 1.5) & (fty >= 0.0) & (fty < 1.5)
        good_g.append(
            (min_eig > min_eig_thresh) & (valid_ref[prog * B + j, 0] > 0) & frac_ok
        )
        safe_det = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
        inv00.append(gyy / safe_det)
        inv01.append(-gxy / safe_det)
        inv11.append(gxx / safe_det)

    # ---- iteration loop (identical to _level_kernel) ----
    rr = jax.lax.broadcasted_iota(jnp.int32, (B * WR, B * SR), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (B * WR, B * SR), 1)
    b_of_rw = rr // WR
    i_of_rw = rr % WR
    same_blk = ((cc // SR) == b_of_rw).astype(jnp.float32)
    src = cc - (b_of_rw * SR + i_of_rw)
    sxf = [s.astype(jnp.float32) for s in sx0]
    syf = [s.astype(jnp.float32) for s in sy0]

    def body(state):
        it, cx_, cy_, moving, inb = state
        oxi_c, fxx, new_inb = [], [], []
        oyi_row = jnp.zeros_like(rr)
        fy_row = jnp.zeros(rr.shape, jnp.float32)
        for j in range(B):
            ox = cx_[j] - half - sxf[j]
            oy = cy_[j] - half - syf[j]
            oxi = jnp.floor(ox).astype(jnp.int32)
            oyi = jnp.floor(oy).astype(jnp.int32)
            in_bounds = (
                (oxi >= 0)
                & (oyi >= 0)
                & (oxi <= _LANES - win - 2)
                & (oyi <= SR - win - 2)
            )
            oxc = jnp.clip(oxi, 0, _LANES - win - 2)
            oyc = jnp.clip(oyi, 0, SR - win - 2)
            oxi_c.append(oxc)
            fxx.append(ox - oxc.astype(jnp.float32))
            fy_j = oy - oyc.astype(jnp.float32)
            is_j = b_of_rw == j
            oyi_row = jnp.where(is_j, oyc, oyi_row)
            fy_row = jnp.where(is_j, fy_j, fy_row)
            new_inb.append(inb[j] & in_bounds)

        P = same_blk * (
            (src == oyi_row).astype(jnp.float32) * (1.0 - fy_row)
            + (src == oyi_row + 1).astype(jnp.float32) * fy_row
        )
        rows = jax.lax.dot_general(
            P, S_all, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ncx, ncy, nmv = [], [], []
        for j in range(B):
            slab = rows[j * WR : j * WR + win, :]
            slab = pltpu.roll(slab, -oxi_c[j], 1)
            cur = (1.0 - fxx[j]) * slab[:, 0:win] + fxx[j] * slab[:, 1 : win + 1]
            dI = cur - tmpls[j]
            bx = jnp.sum(dI * gxs[j])
            by = jnp.sum(dI * gys[j])
            dx = -(inv00[j] * bx + inv01[j] * by)
            dy = -(inv01[j] * bx + inv11[j] * by)
            step_ok = moving[j] & good_g[j] & new_inb[j]
            ncx.append(jnp.where(step_ok, cx_[j] + dx, cx_[j]))
            ncy.append(jnp.where(step_ok, cy_[j] + dy, cy_[j]))
            nmv.append(moving[j] & ((dx * dx + dy * dy) >= eps * eps))
        return it + 1, tuple(ncx), tuple(ncy), tuple(nmv), tuple(new_inb)

    def cond(state):
        it, _, _, moving, _ = state
        any_moving = moving[0]
        for j in range(1, B):
            any_moving = any_moving | moving[j]
        return (it < max_iter) & any_moving

    t_true = tuple(jnp.bool_(True) for _ in range(B))
    _, cx_, cy_, _, inb = jax.lax.while_loop(
        cond, body, (0, tuple(cx0), tuple(cy0), t_true, t_true)
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
    outs = []
    for j in range(B):
        ok = (good_g[j] & inb[j]).astype(jnp.float32)
        outs.append(
            jnp.where(lane == 0, cx_[j], 0.0)
            + jnp.where(lane == 1, cy_[j], 0.0)
            + jnp.where(lane == 2, ok, 0.0)
        )
    out_ref[...] = jnp.stack(outs, axis=0)


def _track_level_pallas_vmem(
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
    """Whole-level-in-VMEM variant (no XLA gathers). Requires the level to
    fit VMEM (~4 channels * H * Wp * 4 bytes <= ~8 MB)."""
    H, W = prev_img.shape
    N = prev_pts.shape[0]
    Wp = ((W + 127) // 128) * 128
    Hp = ((H + 7) // 8) * 8
    if Wp != W or Hp != H:
        pad = ((0, Hp - H), (0, Wp - W))
        prev_img = jnp.pad(prev_img, pad, mode="edge")
        prev_ix = jnp.pad(prev_ix, pad, mode="edge")
        prev_iy = jnp.pad(prev_iy, pad, mode="edge")
        cur_img = jnp.pad(cur_img, pad, mode="edge")
    # bf16 residency: exact for uint8-sourced intensities, halves VMEM.
    prev3 = jnp.stack([prev_img, prev_ix, prev_iy]).astype(jnp.bfloat16)
    cur_img = cur_img.astype(jnp.bfloat16)

    scal = jnp.stack(
        [prev_pts[:, 0], prev_pts[:, 1], cur_pts[:, 0], cur_pts[:, 1]], axis=-1
    )
    B = 8
    Np = ((N + B - 1) // B) * B
    if Np != N:
        padn = Np - N
        scal = jnp.pad(scal, ((0, padn), (0, 0)))
        valid = jnp.pad(valid, ((0, padn),))
    kern = functools.partial(
        _level_kernel_vmem,
        win=win,
        search_rows=search_rows,
        max_iter=max_iter,
        eps=eps,
        min_eig_thresh=min_eig_thresh,
        block=B,
        height=Hp,
        width=W,
    )
    out = pl.pallas_call(
        kern,
        grid=(Np // B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, Hp, Wp), lambda i: (0, 0, 0)),
            pl.BlockSpec((Hp, Wp), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((B, 8, _LANES), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, 8, _LANES), jnp.float32),
        interpret=interpret,
    )(
        scal,
        valid.astype(jnp.int32)[:, None],
        prev3,
        cur_img,
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
    # VMEM budget for the whole-image path: 4 f32 channels + intermediates.
    VMEM_LIMIT_PX = 480 * 768 + 8
    for lvl in range(n_levels - 1, -1, -1):
        if lvl != n_levels - 1:
            pts = pts * 2.0
            base = base * 2.0
        Hl, Wl = prev_pyr[lvl].shape
        Ix, Iy = prev_grads[lvl]
        Wp = ((Wl + 127) // 128) * 128
        fits_vmem = ((Hl + 7) // 8 * 8) * Wp <= VMEM_LIMIT_PX
        if fits_vmem and Hl >= search_rows and min(Hl, Wl) >= win + 4:
            pts, ok_lvl = _track_level_pallas_vmem(
                prev_pyr[lvl], Ix, Iy, cur_pyr[lvl], base, pts, valid,
                win=win, search_rows=search_rows, max_iter=max_iter,
                eps=eps, min_eig_thresh=min_eig_thresh, interpret=interpret,
            )
        elif Hl < search_rows + 4 or Wl < _LANES + 4:
            # Coarse levels too small for the gather kernel's fixed window:
            # fall back to the XLA tracker (tiny and cheap there).
            if min(Hl, Wl) >= win + 2:
                pts, _ = of._track_level(
                    prev_pyr[lvl], Ix, Iy, cur_pyr[lvl], base, pts, valid,
                    win, max_iter, eps, min_eig_thresh, False,
                )
            continue
        else:
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
