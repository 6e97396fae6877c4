"""Lossless temporal-delta 4-bit frame codec for host->device staging.

The offline chunked pipeline is transfer-bound on this environment's
host->device tunnel (h2d weather observed 50 MB/s .. 1 GB/s, ROADMAP).
Consecutive video frames differ by only a few gray levels almost
everywhere (measured on MicroEuroc: ~99% of temporal deltas fit in
[-7, 7]), so the stager ships, per super-batch:

  base    frames[0]            uint8, raw
  packed  (F-1, S//2)          uint8, two 4-bit delta codes per byte
  esc_idx (E,)                 int32, flat indices of out-of-range deltas
  esc_val (E,)                 uint8, their wraparound (mod-256) deltas

and the device reconstructs exact uint8 frames with an unpack +
scatter + cumulative sum over time -- all HBM-bandwidth ops, orders of
magnitude faster than the tunnel.

All arithmetic is mod-256 (uint8 wraparound): the per-pixel delta is
d8 = (cur - prev) & 0xFF, and reconstruction is
frame[t] = (base + cumsum(d8)) & 0xFF, which is exact because uint8
addition is a group. Small deltas d in [-7, 7] are stored as nibble
code (d8 + 8) & 0xF in [1, 15]; nibble 0 marks an escape whose d8 is
shipped in the escape list. Keeping everything uint8 halves the host
encode's memory traffic vs an int16 formulation (the host has ONE core
here and the encode runs on the staging thread).

Wire size: S/2 + 5*E bytes per frame vs S raw -- ~1.7x fewer bytes on
EuRoC-like sequences.

Reference analogy: none -- the reference is a single-process CPU
pipeline and never ships images across a link; this is TPU-deployment
input plumbing (SURVEY.md section 2.2: the frontend-input queue becomes
the host->device transfer stream).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# Nibble 0 = escape marker; 1..15 encode deltas -7..7 as (d8 + 8) & 0xF.
_ESCAPE = 0


def _default_esc_cap(F: int, S: int) -> int:
    # 1/16 of pixels may escape before raw wins on bytes (each escape
    # costs 5 wire bytes vs the 0.5-byte nibble).
    return max(1024, (F - 1) * S // 16)


def _wire_pad(idx: np.ndarray, val: np.ndarray, n_esc: int, oob: int):
    """Right-size the escape wire buffer: round up to an 8K-entry
    multiple so the device decode sees only a handful of distinct
    shapes (each distinct length is a separate XLA specialization).
    Pad index = one past the end: dropped by the device scatter."""
    n_wire = 1024 if n_esc <= 1024 else -(-n_esc // 8192) * 8192
    pad = n_wire - n_esc
    if pad:
        idx = np.concatenate([idx, np.full(pad, oob, np.int32)])
        val = np.concatenate([val, np.zeros(pad, np.uint8)])
    return idx, val


def _encode_native(frames: np.ndarray, esc_cap: int):
    """Single-pass C++ encoder (native/delta4.cpp); None to fall back."""
    from kimera_vio_tpu import native

    lib = native.load("delta4")
    if lib is None:
        return None
    F = frames.shape[0]
    S = int(np.prod(frames.shape[1:]))
    flat = np.ascontiguousarray(frames).reshape(F, S)
    packed = np.empty((F - 1, S // 2), np.uint8)
    esc_idx = np.empty(esc_cap, np.int32)
    esc_val = np.empty(esc_cap, np.uint8)
    import ctypes as ct

    fn = lib.delta4_encode
    fn.restype = ct.c_longlong
    n_esc = fn(
        flat.ctypes.data_as(ct.POINTER(ct.c_uint8)),
        ct.c_longlong(F),
        ct.c_longlong(S),
        packed.ctypes.data_as(ct.POINTER(ct.c_uint8)),
        esc_idx.ctypes.data_as(ct.POINTER(ct.c_int32)),
        esc_val.ctypes.data_as(ct.POINTER(ct.c_uint8)),
        ct.c_longlong(esc_cap),
    )
    if n_esc < 0:
        return "overflow"
    idx, val = _wire_pad(
        esc_idx[:n_esc], esc_val[:n_esc], int(n_esc), (F - 1) * S
    )
    return {
        "base": frames[0],
        "packed": packed,
        "esc_idx": idx,
        "esc_val": val,
        "shape": tuple(frames.shape),
    }


def encode_delta4(frames: np.ndarray, esc_cap: int | None = None):
    """Encode a (F, ...) uint8 frame stack. Host-side.

    Uses the single-pass native encoder when available (the encode runs
    on the staging thread of a one-core host), else pure numpy.
    Returns a dict of wire arrays, or None when the codec does not
    apply (non-uint8, odd frame size, F < 2) or the escape list would
    exceed `esc_cap` (scene cut / noise burst) -- callers fall back to
    raw staging.
    """
    if frames.dtype != np.uint8 or frames.ndim < 2 or frames.shape[0] < 2:
        return None
    F = frames.shape[0]
    S = int(np.prod(frames.shape[1:]))
    if S % 2:
        return None
    if esc_cap is None:
        esc_cap = _default_esc_cap(F, S)
    if os.environ.get("KIMERA_DELTA4_NATIVE", "1") != "0":
        enc = _encode_native(frames, esc_cap)
        if enc == "overflow":
            return None
        if enc is not None:
            return enc
    flat = frames.reshape(F, S)
    d8 = flat[1:] - flat[:-1]  # uint8 wraparound: (cur - prev) mod 256
    e = d8 + np.uint8(8)  # in [1, 15] iff the true delta is in [-7, 7]
    esc = (e < 1) | (e > 15)
    n_esc = int(np.count_nonzero(esc))
    if n_esc > esc_cap:
        return None
    idx = np.flatnonzero(esc).astype(np.int32)
    val = d8.reshape(-1)[idx]
    idx, val = _wire_pad(idx, val, n_esc, (F - 1) * S)
    nib = np.where(esc, np.uint8(_ESCAPE), e & np.uint8(0xF))
    packed = nib[:, 0::2] | (nib[:, 1::2] << np.uint8(4))
    return {
        "base": frames[0],
        "packed": packed,
        "esc_idx": idx,
        "esc_val": val,
        "shape": tuple(frames.shape),
    }


@functools.partial(jax.jit, static_argnames=("shape",))
def decode_delta4(base, packed, esc_idx, esc_val, shape):
    """Reconstruct the exact (F, ...) uint8 frame stack on device."""
    F = shape[0]
    S = int(np.prod(shape[1:]))
    low = packed & 0xF
    high = packed >> 4
    nib = jnp.stack([low, high], axis=-1).reshape(F - 1, S)
    d8 = jnp.where(nib == _ESCAPE, jnp.uint8(0), nib - jnp.uint8(8))
    d8 = (
        d8.reshape(-1)
        .at[esc_idx]
        .set(esc_val, mode="drop")
        .reshape(F - 1, S)
    )
    # cumsum in int32, then the uint8 cast applies the mod-256 wraparound.
    cum = base.reshape(1, S).astype(jnp.int32) + jnp.cumsum(
        d8.astype(jnp.int32), axis=0
    )
    out = jnp.concatenate(
        [base.reshape(1, S).astype(jnp.int32), cum], axis=0
    )
    return out.astype(jnp.uint8).reshape(shape)


# ---------------------------------------------------------------------------
# delta4c: the delta4 codec on a CONSOLIDATED single-buffer wire.
#
# Two wire inefficiencies of delta4, measured on the axon tunnel:
#   1. every super-batch ships 5 separate transfers (base, packed,
#      esc_idx, esc_val, aux) and each h2d transfer pays ~28 ms fixed
#      latency regardless of size;
#   2. each escape costs 5 bytes (int32 flat index + uint8 value).
# delta4c packs everything into ONE uint8 buffer per super-batch and
# encodes escape positions as 2-byte GAP tokens (escapes are ~0.9% of
# pixels, mean gap ~100): token 0 means "advance 65535 positions, no
# escape" (a filler; real gaps are >= 1 so 0 is free), token g >= 1
# means "advance g, escape here". Decode recovers positions with one
# cumsum over the (small) token list + the same scatter as delta4 —
# no full-pixel-axis work is added (the delta3 lesson: 68M-element
# rank gathers are catastrophically slow on TPU).
#
# Buffer layout, all offsets static given (shape, n_tok, aux_shape):
#   [ base: S ][ packed: (F-1)*S/2 ][ tok_lo: E ][ tok_hi: E ]
#   [ val: E ][ aux byte-planes: 4 * A ][ pad to 64 KiB multiple ]
# aux (float32) rides the same buffer as 4 byte planes; the device
# rebuilds uint32 with shifts and bitcasts to float32 (exact).
# ---------------------------------------------------------------------------

_TOK_SPAN = 65535  # filler token advance (token value 0)


def _gap_tokens(esc_idx: np.ndarray, esc_val: np.ndarray):
    """Escape flat indices -> (uint16 gap tokens, aligned uint8 values).

    Token 0 = filler (+65535, no escape); token g in [1, 65535] = the
    gap to the next escape (positions are strictly increasing, so every
    real gap is >= 1). Fillers carry value 0 (dropped by the decoder)."""
    if len(esc_idx) == 0:
        return np.zeros(0, np.uint16), np.zeros(0, np.uint8)
    gaps = np.diff(esc_idx.astype(np.int64), prepend=-1)
    k = (gaps - 1) // _TOK_SPAN  # fillers needed before each real token
    pos = np.cumsum(k + 1) - 1  # position of each real token
    n_tok = int(pos[-1]) + 1
    toks = np.zeros(n_tok, np.uint16)
    toks[pos] = (gaps - k * _TOK_SPAN).astype(np.uint16)
    vals = np.zeros(n_tok, np.uint8)
    vals[pos] = esc_val
    return toks, vals


_PAD_TO = 65536  # total-buffer pad granularity (bounds specializations)


def _finish_delta4c(buf, S, P, toks, vals, n_tok, aux, shape):
    """Write tokens + aux byte-planes into `buf` after base/packed and
    return the wire dict. `buf` must already hold base at [0:S] and
    packed nibbles at [S:S+P]; toks/vals are the first n_tok entries of
    the scratch arrays."""
    E = 8192 if n_tok <= 8192 else -(-n_tok // 8192) * 8192
    A = aux.size
    total = S + P + 3 * E + 4 * A
    pad = (-total) % _PAD_TO
    assert total + pad <= buf.size
    o = S + P
    t = toks[:n_tok]
    buf[o : o + n_tok] = (t & 0xFF).astype(np.uint8)
    buf[o + n_tok : o + E] = 0
    o += E
    buf[o : o + n_tok] = (t >> 8).astype(np.uint8)
    buf[o + n_tok : o + E] = 0
    o += E
    buf[o : o + n_tok] = vals[:n_tok]
    buf[o + n_tok : o + E] = 0
    o += E
    planes = aux.reshape(-1).view(np.uint8).reshape(A, 4).T
    buf[o : o + 4 * A] = np.ascontiguousarray(planes).reshape(-1)
    o += 4 * A
    buf[o : o + pad] = 0
    return {
        "buf": buf[: total + pad],
        "shape": tuple(shape),
        "n_tok": E,
        "aux_shape": tuple(aux.shape),
    }


def _encode4c_native(planes, n_planes, shape, aux, tok_cap):
    """Fused single-pass C++ encoder (native/delta4c.cpp): reads the
    original image planes through a pointer table and writes base +
    packed nibbles directly into the wire buffer (no np.stack, no
    concat — the staging thread of a 1-core host is on the critical
    path). Returns the wire dict, "overflow", or None (no toolchain)."""
    from kimera_vio_tpu import native

    lib = native.load("delta4c")
    if lib is None:
        return None
    import ctypes as ct

    F = shape[0]
    S = int(np.prod(shape[1:]))
    plane_sz = S // n_planes
    if plane_sz % 2:
        return None
    P = (F - 1) * S // 2
    A = aux.size
    buf = np.empty(S + P + 3 * (-(-tok_cap // 8192) * 8192) + 4 * A + _PAD_TO, np.uint8)
    toks = np.empty(tok_cap, np.uint16)
    vals = np.empty(tok_cap, np.uint8)
    PTR = ct.POINTER(ct.c_uint8)
    ptrs = (PTR * len(planes))(
        *[p.ctypes.data_as(PTR) for p in planes]
    )
    fn = lib.delta4c_encode
    fn.restype = ct.c_longlong
    n_tok = fn(
        ptrs, ct.c_longlong(n_planes), ct.c_longlong(F),
        ct.c_longlong(plane_sz),
        buf.ctypes.data_as(PTR),
        buf[S:].ctypes.data_as(PTR),
        toks.ctypes.data_as(ct.POINTER(ct.c_uint16)),
        vals.ctypes.data_as(PTR),
        ct.c_longlong(tok_cap),
    )
    if n_tok < 0:
        return "overflow"
    return _finish_delta4c(buf, S, P, toks, vals, int(n_tok), aux, shape)


def encode_delta4c_planes(planes: list, n_planes: int, shape, aux):
    """Encode per-frame image planes (no pre-stacking) + the float32 aux
    block into ONE wire buffer. `planes` lists F * n_planes contiguous
    uint8 arrays; logical frame t = planes[t*n_planes : (t+1)*n_planes]
    back to back; `shape` is the decoded (F, ...) shape. Returns the
    wire dict or None (caller falls back to stacked / raw staging)."""
    F = shape[0]
    if F < 2:
        return None
    S = int(np.prod(shape[1:]))
    aux = np.ascontiguousarray(aux, np.float32)
    if any(p.dtype != np.uint8 or not p.flags.c_contiguous for p in planes):
        return None
    tok_cap = _default_esc_cap(F, S) + 1024
    if os.environ.get("KIMERA_DELTA4_NATIVE", "1") != "0":
        enc = _encode4c_native(planes, n_planes, shape, aux, tok_cap)
        if enc == "overflow":
            return None
        if enc is not None:
            return enc
    stacked = np.stack([p.reshape(-1) for p in planes]).reshape(
        F, n_planes * (planes[0].size)
    )
    return encode_delta4c(stacked.reshape(shape), aux)


def encode_delta4c(frames: np.ndarray, aux: np.ndarray,
                   esc_cap: int | None = None):
    """Encode frames + the float32 aux block into ONE uint8 wire buffer.

    Returns {buf, shape, n_tok, aux_shape} or None when delta4 does not
    apply (caller falls back to raw staging)."""
    aux = np.ascontiguousarray(aux, np.float32)
    if (
        frames.dtype == np.uint8
        and frames.ndim >= 2
        and frames.shape[0] >= 2
        and frames.flags.c_contiguous
        and os.environ.get("KIMERA_DELTA4_NATIVE", "1") != "0"
        and esc_cap is None
    ):
        F = frames.shape[0]
        S = int(np.prod(frames.shape[1:]))
        if S % 2 == 0:
            enc = _encode4c_native(
                list(frames.reshape(F, S)), 1, frames.shape, aux,
                _default_esc_cap(F, S) + 1024,
            )
            if enc == "overflow":
                return None
            if enc is not None:
                return enc
    enc = encode_delta4(frames, esc_cap)
    if enc is None:
        return None
    F = frames.shape[0]
    S = int(np.prod(frames.shape[1:]))
    # Recover the un-padded escape list (encode_delta4 pads with
    # index == (F-1)*S which _gap_tokens must not see).
    oob = (F - 1) * S
    idx = enc["esc_idx"]
    n_real = int(np.searchsorted(idx, oob))
    toks, vals = _gap_tokens(idx[:n_real], enc["esc_val"][:n_real])
    P = (F - 1) * S // 2
    A = aux.size
    buf = np.empty(
        S + P + 3 * max(-(-toks.size // 8192) * 8192, 8192) + 4 * A + _PAD_TO,
        np.uint8,
    )
    buf[:S] = enc["base"].reshape(-1)
    buf[S : S + P] = enc["packed"].reshape(-1)
    return _finish_delta4c(
        buf, S, P, toks, vals, toks.size, aux, frames.shape
    )


@functools.partial(
    jax.jit, static_argnames=("shape", "n_tok", "aux_shape")
)
def decode_delta4c(buf, shape, n_tok, aux_shape):
    """One wire buffer -> (exact uint8 frames, exact float32 aux)."""
    F = shape[0]
    S = int(np.prod(shape[1:]))
    E = n_tok
    P = (F - 1) * S // 2
    o = 0
    base = jax.lax.slice_in_dim(buf, o, o + S); o += S
    packed = jax.lax.slice_in_dim(buf, o, o + P); o += P
    tok_lo = jax.lax.slice_in_dim(buf, o, o + E); o += E
    tok_hi = jax.lax.slice_in_dim(buf, o, o + E); o += E
    vals = jax.lax.slice_in_dim(buf, o, o + E); o += E
    A = int(np.prod(aux_shape))
    planes = jax.lax.slice_in_dim(buf, o, o + 4 * A).reshape(4, A)
    # Escape positions from gap tokens: one small cumsum (E ~ 1e6 vs
    # the 68M pixel axis), fillers advance 65535 and scatter nothing.
    tok = tok_lo.astype(jnp.int32) | (tok_hi.astype(jnp.int32) << 8)
    adv = jnp.where(tok == 0, _TOK_SPAN, tok)
    pos = jnp.cumsum(adv) - 1
    idx = jnp.where(tok == 0, (F - 1) * S, pos)
    # Same reconstruction as decode_delta4 from here.
    low = packed & 0xF
    high = packed >> 4
    nib = jnp.stack([low, high], axis=-1).reshape(F - 1, S)
    d8 = jnp.where(nib == _ESCAPE, jnp.uint8(0), nib - jnp.uint8(8))
    d8 = d8.reshape(-1).at[idx].set(vals, mode="drop").reshape(F - 1, S)
    cum = base.reshape(1, S).astype(jnp.int32) + jnp.cumsum(
        d8.astype(jnp.int32), axis=0
    )
    out = jnp.concatenate(
        [base.reshape(1, S).astype(jnp.int32), cum], axis=0
    )
    frames = out.astype(jnp.uint8).reshape(shape)
    u32 = (
        planes[0].astype(jnp.uint32)
        | (planes[1].astype(jnp.uint32) << 8)
        | (planes[2].astype(jnp.uint32) << 16)
        | (planes[3].astype(jnp.uint32) << 24)
    )
    aux = jax.lax.bitcast_convert_type(u32, jnp.float32).reshape(aux_shape)
    return frames, aux


def wire_bytes(enc) -> int:
    """Bytes this encoding puts on the host->device link."""
    if "buf" in enc:
        return enc["buf"].nbytes
    if "t1" in enc:
        return (
            enc["base"].nbytes
            + enc["t1"].nbytes
            + enc["t2"].nbytes
            + enc["t3"].nbytes
        )
    return (
        enc["base"].nbytes
        + enc["packed"].nbytes
        + enc["esc_idx"].nbytes
        + enc["esc_val"].nbytes
    )


# ---------------------------------------------------------------------------
# delta3: 3-tier codec (3-bit -> 4-bit -> 8-bit) with IMPLICIT escape
# positions. Escapes cost 1 wire byte instead of delta4's 5 (int32 index
# + value); the device recovers positions with prefix sums. Measured on
# MicroEuroc (95 stereo pairs): 30.1 MB wire vs 39.6 MB delta4, 68.6 raw.
#
# Tier-1 codes: 0 = escape, 1..7 = delta in [-3, 3] (code = d + 4).
# PLANAR layout (TPU layout constraint — see native/delta3.cpp): with
# n_grp = ceil(N/8) 24-bit group words, pixel p's code sits in group
# p % n_grp at bit 3 * (p // n_grp); the wire ships the three BYTE
# PLANES of the group words back to back, so the device unpack is pure
# contiguous slices + shifts + concat (an interleaved layout needs an
# (N, 3) relayout that XLA tiles catastrophically on TPU).
# Tier-2 nibbles (2/byte, low first) for tier-1 escapes in scan order:
# 0 = escape, 1..7 = d in [4, 10] (code = d - 3), 8..15 = d in
# [-11, -4] (code = 4 - d). Tier 3: raw mod-256 deltas for tier-2
# escapes in scan order.
# ---------------------------------------------------------------------------

# Tier-2 code -> signed delta (index 0 is the escape marker, value unused).
_T2_LUT = np.array(
    [0, 4, 5, 6, 7, 8, 9, 10, -4, -5, -6, -7, -8, -9, -10, -11], np.int32
)


def _pad_bucket(arr: np.ndarray, bucket: int = 8192) -> np.ndarray:
    """Zero-pad to a bucket multiple so the device decode sees only a
    handful of distinct shapes (each is a separate XLA specialization)."""
    n = len(arr)
    n_wire = bucket if n <= bucket else -(-n // bucket) * bucket
    if n_wire == n:
        return arr
    out = np.zeros(n_wire, arr.dtype)
    out[:n] = arr
    return out


def _encode3_native(frames: np.ndarray, t2_cap_nib: int, t3_cap: int):
    from kimera_vio_tpu import native

    lib = native.load("delta3")
    if lib is None:
        return None
    import ctypes as ct

    F = frames.shape[0]
    S = int(np.prod(frames.shape[1:]))
    N = (F - 1) * S
    flat = np.ascontiguousarray(frames).reshape(F, S)
    t1 = np.empty(3 * (-(-N // 8)), np.uint8)
    t2 = np.empty(-(-t2_cap_nib // 2), np.uint8)
    t3 = np.empty(t3_cap, np.uint8)
    n_out = np.zeros(2, np.int64)
    fn = lib.delta3_encode
    fn.restype = ct.c_longlong
    rc = fn(
        flat.ctypes.data_as(ct.POINTER(ct.c_uint8)),
        ct.c_longlong(F),
        ct.c_longlong(S),
        t1.ctypes.data_as(ct.POINTER(ct.c_uint8)),
        t2.ctypes.data_as(ct.POINTER(ct.c_uint8)),
        ct.c_longlong(t2_cap_nib),
        t3.ctypes.data_as(ct.POINTER(ct.c_uint8)),
        ct.c_longlong(t3_cap),
        n_out.ctypes.data_as(ct.POINTER(ct.c_longlong)),
    )
    if rc < 0:
        return "overflow"
    n2, n3 = int(n_out[0]), int(n_out[1])
    return {
        "base": frames[0],
        "t1": t1,
        "t2": _pad_bucket(t2[: -(-n2 // 2)].copy()),
        "t3": _pad_bucket(t3[:n3].copy()),
        "shape": tuple(frames.shape),
    }


def encode_delta3(frames: np.ndarray):
    """Encode a (F, ...) uint8 frame stack with the 3-tier codec.

    Returns wire dict {base, t1, t2, t3, shape} or None when the codec
    does not apply (non-uint8, F < 2) or a tier overflows its capacity
    (scene cut / noise burst) — callers fall back to delta4 / raw.
    """
    if frames.dtype != np.uint8 or frames.ndim < 2 or frames.shape[0] < 2:
        return None
    F = frames.shape[0]
    S = int(np.prod(frames.shape[1:]))
    N = (F - 1) * S
    # Beyond ~1/3 of pixels escaping tier 1, raw staging wins on bytes.
    t2_cap_nib = max(4096, N // 3)
    t3_cap = max(2048, N // 12)
    if os.environ.get("KIMERA_DELTA3_NATIVE", "1") != "0":
        enc = _encode3_native(frames, t2_cap_nib, t3_cap)
        if enc == "overflow":
            return None
        if enc is not None:
            return enc
    # numpy fallback (same wire bytes, bit-identical)
    flat = frames.reshape(F, S)
    d8 = (flat[1:] - flat[:-1]).reshape(-1)  # uint8 wraparound
    ds = d8.astype(np.int16)
    ds[ds > 127] -= 256
    tier1 = (ds >= -3) & (ds <= 3)
    c1 = np.where(tier1, (ds + 4).astype(np.uint8), np.uint8(0))
    esc1 = ~tier1
    n2 = int(esc1.sum())
    if n2 > t2_cap_nib:
        return None
    ds_e = ds[esc1]
    pos = (ds_e >= 4) & (ds_e <= 10)
    neg = (ds_e >= -11) & (ds_e <= -4)
    c2 = np.zeros(n2, np.uint8)
    c2[pos] = (ds_e[pos] - 3).astype(np.uint8)
    c2[neg] = (4 - ds_e[neg]).astype(np.uint8)
    esc2 = ~(pos | neg)
    n3 = int(esc2.sum())
    if n3 > t3_cap:
        return None
    t3 = d8[esc1][esc2]
    # Pack tier 1 into planar group-word byte planes: pixel p -> group
    # p % n_grp, bit 3 * (p // n_grp).
    n_grp = -(-N // 8)
    cpad = np.zeros(n_grp * 8, np.uint32)
    cpad[:N] = c1
    w = np.zeros(n_grp, np.uint32)
    for i in range(8):
        w |= cpad[i * n_grp : (i + 1) * n_grp] << np.uint32(3 * i)
    t1 = np.concatenate(
        [
            (w & 0xFF).astype(np.uint8),
            ((w >> 8) & 0xFF).astype(np.uint8),
            ((w >> 16) & 0xFF).astype(np.uint8),
        ]
    )
    # Pack tier 2 nibbles (low first).
    n2b = -(-n2 // 2)
    npad = np.zeros(n2b * 2, np.uint8)
    npad[:n2] = c2
    t2 = npad[0::2] | (npad[1::2] << np.uint8(4))
    return {
        "base": frames[0],
        "t1": t1,
        "t2": _pad_bucket(t2),
        "t3": _pad_bucket(t3),
        "shape": tuple(frames.shape),
    }


@functools.partial(jax.jit, static_argnames=("shape",))
def decode_delta3(base, t1, t2, t3, shape):
    """Reconstruct the exact (F, ...) uint8 stack on device.

    Escape positions are implicit: prefix sums over the escape masks
    give each escape's payload rank — all HBM-bandwidth ops.
    """
    F = shape[0]
    S = int(np.prod(shape[1:]))
    N = (F - 1) * S
    n_grp = -(-N // 8)
    w = (
        t1[0:n_grp].astype(jnp.uint32)
        | (t1[n_grp : 2 * n_grp].astype(jnp.uint32) << 8)
        | (t1[2 * n_grp : 3 * n_grp].astype(jnp.uint32) << 16)
    )
    codes = jnp.concatenate([(w >> (3 * i)) & 7 for i in range(8)])[:N]
    esc1 = codes == 0
    rank1 = jnp.cumsum(esc1.astype(jnp.int32)) - 1
    byte2 = jnp.take(t2, jnp.maximum(rank1, 0) >> 1, mode="clip")
    nib = jnp.where((rank1 & 1) == 1, byte2 >> 4, byte2 & 0xF)
    d2 = jnp.asarray(_T2_LUT)[nib]
    esc2 = esc1 & (nib == 0)
    rank2 = jnp.cumsum(esc2.astype(jnp.int32)) - 1
    d3 = jnp.take(t3, jnp.maximum(rank2, 0), mode="clip").astype(jnp.int32)
    d = jnp.where(
        ~esc1, codes.astype(jnp.int32) - 4, jnp.where(~esc2, d2, d3)
    )
    cum = base.reshape(1, S).astype(jnp.int32) + jnp.cumsum(
        d.reshape(F - 1, S), axis=0
    )
    out = jnp.concatenate(
        [base.reshape(1, S).astype(jnp.int32), cum], axis=0
    )
    return out.astype(jnp.uint8).reshape(shape)
