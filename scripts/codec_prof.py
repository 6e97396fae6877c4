#!/usr/bin/env python
"""On-chip decode profiling for the staging codecs (round-5).

Times decode_delta4 / decode_delta4c / decode_delta3 on a realistic
MicroEuroc super-batch payload, on the real device. Each rep decodes a
DIFFERENT payload (a few bytes perturbed) and blocks, so identical-input
dedup/caching cannot fake the number; dispatch overhead (~1-5 ms) is
negligible against decode times in the tens of ms and above.

Decides whether delta3's 21%-fewer wire bytes can be bought back with a
fast decode (its round-4 e2e measurement was 18-22 fps vs delta4's 68 —
this isolates how much of that is the decode itself).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

from kimera_vio_tpu.ops.frame_codec import (
    decode_delta3,
    decode_delta4,
    decode_delta4c,
    encode_delta3,
    encode_delta4,
    encode_delta4c,
    wire_bytes,
)

MICRO = "/root/reference/tests/data/MicroEurocDataset/mav0"


def load_stack(n=64):
    import cv2
    import glob

    def cam(c):
        fs = sorted(glob.glob(os.path.join(MICRO, c, "data", "*.png")))[:n]
        return np.stack([cv2.imread(f, cv2.IMREAD_GRAYSCALE) for f in fs])

    return np.stack([cam("cam0"), cam("cam1")], axis=1)  # (F,2,H,W)


def bench(name, fn, payloads, reps=6):
    # compile + warm
    jax.block_until_ready(fn(*payloads[0]))
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*payloads[i % len(payloads)])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:8.1f} ms/decode", flush=True)
    return dt


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    imgs = load_stack(64)
    aux = np.zeros((64, 129), np.float32)
    variants = []
    for v in range(4):
        im = imgs.copy()
        im[1 :: 7, :, v, v] ^= np.uint8(v + 1)  # perturb a few pixels
        variants.append(im)

    # ---- delta4 (separate arrays) ----
    p4 = []
    for im in variants:
        e = encode_delta4(im)
        p4.append(
            (
                jnp.asarray(e["base"]), jnp.asarray(e["packed"]),
                jnp.asarray(e["esc_idx"]), jnp.asarray(e["esc_val"]),
            )
        )
        shape4 = e["shape"]
    print(f"delta4 wire: {wire_bytes(e)/1e6:.1f} MB")
    jax.block_until_ready(p4)
    bench(
        "decode_delta4", lambda *a: decode_delta4(*a, shape=shape4), p4
    )

    # ---- delta4c (single buffer) ----
    p4c, meta = [], None
    for im in variants:
        e = encode_delta4c(im, aux)
        p4c.append((jnp.asarray(e["buf"]),))
        meta = (e["shape"], e["n_tok"], e["aux_shape"])
    print(f"delta4c wire: {wire_bytes(e)/1e6:.1f} MB  n_tok={e['n_tok']}")
    jax.block_until_ready(p4c)
    bench(
        "decode_delta4c",
        lambda b: decode_delta4c(b, *meta),
        p4c,
    )

    # ---- delta3 ----
    p3 = []
    for im in variants:
        e = encode_delta3(im)
        p3.append(
            (
                jnp.asarray(e["base"]), jnp.asarray(e["t1"]),
                jnp.asarray(e["t2"]), jnp.asarray(e["t3"]),
            )
        )
        shape3 = e["shape"]
    print(f"delta3 wire: {wire_bytes(e)/1e6:.1f} MB")
    jax.block_until_ready(p3)
    bench(
        "decode_delta3", lambda *a: decode_delta3(*a, shape=shape3), p3
    )


if __name__ == "__main__":
    main()
