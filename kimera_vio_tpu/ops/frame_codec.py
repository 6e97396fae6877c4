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


def wire_bytes(enc) -> int:
    """Bytes this encoding puts on the host->device link."""
    return (
        enc["base"].nbytes
        + enc["packed"].nbytes
        + enc["esc_idx"].nbytes
        + enc["esc_val"].nbytes
    )
