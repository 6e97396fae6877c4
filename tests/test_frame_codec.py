"""Round-trip tests for the temporal-delta staging codecs."""
import os

import numpy as np
import pytest

from kimera_vio_tpu.ops.frame_codec import (
    decode_delta3,
    decode_delta4,
    decode_delta4c,
    encode_delta3,
    encode_delta4,
    encode_delta4c,
    wire_bytes,
)

MICRO_EUROC = "/root/reference/tests/data/MicroEurocDataset/mav0/cam0/data"


def _roundtrip(frames, esc_cap=None):
    enc = encode_delta4(frames, esc_cap=esc_cap)
    assert enc is not None
    dec = np.asarray(
        decode_delta4(
            enc["base"], enc["packed"], enc["esc_idx"], enc["esc_val"],
            enc["shape"],
        )
    )
    np.testing.assert_array_equal(dec, frames)
    return enc


def test_roundtrip_smooth_video():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (2, 48, 64), np.int16)
    frames = [base]
    for _ in range(9):
        frames.append(
            np.clip(frames[-1] + rng.integers(-5, 6, base.shape), 0, 255)
        )
    stack = np.stack(frames).astype(np.uint8)
    enc = _roundtrip(stack)
    # Compresses: nibbles halve the non-base payload.
    assert wire_bytes(enc) < stack.nbytes * 0.75


def test_roundtrip_with_escapes():
    rng = np.random.default_rng(1)
    stack = np.stack(
        [np.full((32, 32), 100, np.uint8) for _ in range(6)]
    )
    # Inject large jumps (outside [-7, 7]) at scattered pixels.
    for t in range(1, 6):
        ii = rng.integers(0, 32, 20)
        jj = rng.integers(0, 32, 20)
        stack[t:, ii, jj] = rng.integers(0, 256, 20, np.uint8)[None, :]
    _roundtrip(stack)


def test_escape_overflow_returns_none():
    rng = np.random.default_rng(2)
    # Pure noise: nearly every delta escapes -> codec declines.
    stack = rng.integers(0, 256, (4, 64, 64), np.uint8)
    assert encode_delta4(stack, esc_cap=16) is None


def test_non_uint8_declines():
    assert encode_delta4(np.zeros((4, 8, 8), np.float32)) is None
    assert encode_delta4(np.zeros((1, 8, 8), np.uint8)) is None


def test_native_encoder_matches_numpy(monkeypatch):
    """The C++ single-pass encoder (native/delta4.cpp) is bit-identical
    to the numpy reference implementation, escapes included."""
    from kimera_vio_tpu import native
    from kimera_vio_tpu.ops import frame_codec as fc

    if native.load("delta4") is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (2, 40, 50), np.int16)
    frames = [base]
    for _ in range(7):
        step = rng.integers(-6, 7, base.shape)
        # Sprinkle out-of-range jumps to exercise the escape path.
        jump = rng.random(base.shape) < 0.01
        step = np.where(jump, rng.integers(-200, 200, base.shape), step)
        frames.append(np.clip(frames[-1] + step, 0, 255))
    stack = np.stack(frames).astype(np.uint8)
    monkeypatch.setenv("KIMERA_DELTA4_NATIVE", "0")
    enc_np = fc.encode_delta4(stack)
    monkeypatch.setenv("KIMERA_DELTA4_NATIVE", "1")
    enc_cc = fc.encode_delta4(stack)
    for k in ("base", "packed", "esc_idx", "esc_val"):
        np.testing.assert_array_equal(enc_np[k], enc_cc[k])
    assert enc_np["shape"] == enc_cc["shape"]
    _roundtrip(stack)


# --------------------------------------------------------------------------
# delta3 (3-tier, implicit escape positions)
# --------------------------------------------------------------------------


def _roundtrip3(frames):
    enc = encode_delta3(frames)
    assert enc is not None
    dec = np.asarray(
        decode_delta3(
            enc["base"], enc["t1"], enc["t2"], enc["t3"], enc["shape"]
        )
    )
    np.testing.assert_array_equal(dec, frames)
    return enc


def _three_tier_stack(shape=(2, 41, 53), n=10, seed=0):
    """Synthetic video exercising all three tiers (odd sizes exercise
    the tier-1 group padding)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, shape, np.int16)
    frames = [base]
    for _ in range(n - 1):
        step = rng.integers(-3, 4, shape)
        j1 = rng.random(shape) < 0.08
        step = np.where(j1, rng.integers(-11, 12, shape), step)
        j2 = rng.random(shape) < 0.01
        step = np.where(j2, rng.integers(-200, 201, shape), step)
        frames.append(np.clip(frames[-1] + step, 0, 255))
    return np.stack(frames).astype(np.uint8)


def test_delta3_roundtrip_all_tiers():
    stack = _three_tier_stack()
    enc = _roundtrip3(stack)
    # 3-bit tier-1 beats delta4's nibbles on smooth content.
    assert wire_bytes(enc) < stack.nbytes


def test_delta3_native_matches_numpy(monkeypatch):
    from kimera_vio_tpu import native
    from kimera_vio_tpu.ops import frame_codec as fc

    if native.load("delta3") is None:
        pytest.skip("no native toolchain")
    stack = _three_tier_stack(seed=3)
    monkeypatch.setenv("KIMERA_DELTA3_NATIVE", "0")
    enc_np = fc.encode_delta3(stack)
    monkeypatch.setenv("KIMERA_DELTA3_NATIVE", "1")
    enc_cc = fc.encode_delta3(stack)
    for k in ("base", "t1", "t2", "t3"):
        np.testing.assert_array_equal(enc_np[k], enc_cc[k], err_msg=k)
    assert enc_np["shape"] == enc_cc["shape"]


def test_delta3_noise_declines():
    rng = np.random.default_rng(2)
    stack = rng.integers(0, 256, (4, 64, 64), np.uint8)
    assert encode_delta3(stack) is None
    assert encode_delta3(np.zeros((4, 8, 8), np.float32)) is None
    assert encode_delta3(np.zeros((1, 8, 8), np.uint8)) is None


@pytest.mark.skipif(
    not os.path.isdir(MICRO_EUROC), reason="MicroEuroc not present"
)
def test_delta3_micro_euroc_beats_delta4():
    import cv2

    names = sorted(os.listdir(MICRO_EUROC))[:12]
    stack = np.stack(
        [
            cv2.imread(os.path.join(MICRO_EUROC, n), cv2.IMREAD_GRAYSCALE)
            for n in names
        ]
    )
    enc3 = _roundtrip3(stack)
    enc4 = encode_delta4(stack)
    assert wire_bytes(enc3) < wire_bytes(enc4)
    # ~0.45x raw on real EuRoC frames.
    assert wire_bytes(enc3) < stack.nbytes * 0.55


@pytest.mark.skipif(
    not os.path.isdir(MICRO_EUROC), reason="MicroEuroc not present"
)
def test_roundtrip_micro_euroc_frames():
    import cv2

    names = sorted(os.listdir(MICRO_EUROC))[:12]
    stack = np.stack(
        [
            cv2.imread(os.path.join(MICRO_EUROC, n), cv2.IMREAD_GRAYSCALE)
            for n in names
        ]
    )
    enc = _roundtrip(stack)
    # The whole point: real EuRoC frames are delta-compressible ~1.7x+.
    assert wire_bytes(enc) < stack.nbytes * 0.62


# ---------------------------------------------------------------------------
# delta4c: consolidated single-buffer wire (gap-token escapes + aux planes)
# ---------------------------------------------------------------------------


def _roundtrip4c(frames, aux):
    enc = encode_delta4c(frames, aux)
    assert enc is not None
    f, a = decode_delta4c(
        enc["buf"], enc["shape"], enc["n_tok"], enc["aux_shape"]
    )
    np.testing.assert_array_equal(np.asarray(f), frames)
    np.testing.assert_array_equal(np.asarray(a), aux)
    return enc


def test_delta4c_roundtrip_video_and_aux():
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (2, 48, 64), np.int16)
    frames = [base]
    for _ in range(9):
        d = rng.integers(-5, 6, base.shape)
        jump = rng.random(base.shape) < 0.01
        d[jump] = rng.integers(-120, 121, int(jump.sum()))
        frames.append((frames[-1] + d) % 256)
    stack = np.stack(frames).astype(np.uint8)
    aux = rng.standard_normal((10, 81)).astype(np.float32)
    aux[0, :4] = [np.inf, -np.inf, 0.0, -0.0]  # aux bytes are exact
    _roundtrip4c(stack, aux)


def test_delta4c_gap_token_fillers():
    """Escape gaps beyond 65535 force filler tokens (token 0 = +65535)."""
    F, S = 2, 200_000
    frames = np.full((F, S), 100, np.uint8)
    # Escapes at the two ends and nowhere between: gap ~ 3 fillers' span.
    frames[1, 0] = 0
    frames[1, S - 1] = 255
    aux = np.zeros((F, 3), np.float32)
    enc = _roundtrip4c(frames.reshape(F, 400, 500), aux)
    # Exactly one buffer on the wire.
    assert set(enc) == {"buf", "shape", "n_tok", "aux_shape"}


@pytest.mark.skipif(
    not os.path.isdir(MICRO_EUROC), reason="MicroEuroc not present"
)
def test_delta4c_beats_delta4_on_wire_bytes():
    """3 bytes/escape (gap tokens) beats delta4's 5 bytes/escape on real
    frames — measured at super-batch-like payload so the 64 KiB buffer
    pad is noise (MicroEuroc, 24 frames: ~8.7 MB raw)."""
    import cv2

    names = sorted(os.listdir(MICRO_EUROC))[:24]
    stack = np.stack(
        [
            cv2.imread(os.path.join(MICRO_EUROC, n), cv2.IMREAD_GRAYSCALE)
            for n in names
        ]
    )
    aux = np.zeros((24, 81), np.float32)
    e4c = _roundtrip4c(stack, aux)
    e4 = encode_delta4(stack)
    assert wire_bytes(e4c) < wire_bytes(e4) + aux.nbytes


def test_delta4c_native_matches_numpy(monkeypatch):
    """The fused C++ encoder (native/delta4c.cpp: plane pointer table ->
    wire buffer in one pass) is bit-identical to the numpy path,
    gap-token stream included."""
    from kimera_vio_tpu import native
    from kimera_vio_tpu.ops import frame_codec as fc

    if native.load("delta4c") is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (2, 40, 50), np.int16)
    frames = [base]
    for _ in range(7):
        step = rng.integers(-6, 7, base.shape)
        jump = rng.random(base.shape) < 0.01
        step = np.where(jump, rng.integers(-200, 200, base.shape), step)
        frames.append(np.clip(frames[-1] + step, 0, 255))
    stack = np.ascontiguousarray(np.stack(frames).astype(np.uint8))
    aux = rng.standard_normal((8, 33)).astype(np.float32)
    monkeypatch.setenv("KIMERA_DELTA4_NATIVE", "0")
    enc_np = fc.encode_delta4c(stack, aux)
    monkeypatch.setenv("KIMERA_DELTA4_NATIVE", "1")
    enc_cc = fc.encode_delta4c(stack, aux)
    assert enc_np["n_tok"] == enc_cc["n_tok"]
    np.testing.assert_array_equal(enc_np["buf"], enc_cc["buf"])
    # Planes API (the stager's path: per-frame left/right, no stacking).
    planes = [p for fr in stack for p in (fr[0], fr[1])]
    enc_pl = fc.encode_delta4c_planes(planes, 2, stack.shape, aux)
    np.testing.assert_array_equal(enc_pl["buf"], enc_cc["buf"])
    # And it still roundtrips exactly.
    f, a = fc.decode_delta4c(
        enc_pl["buf"], enc_pl["shape"], enc_pl["n_tok"], enc_pl["aux_shape"]
    )
    np.testing.assert_array_equal(np.asarray(f), stack)
    np.testing.assert_array_equal(np.asarray(a), aux)
