#!/usr/bin/env python
"""Compare sparse stereo-match correlation formulations on the TPU.

Variants:
  current    grouped conv (feature_group_count=N) for corr and s2
  cumsum_s2  grouped conv for corr, cumsum box-sum for s2
  im2col     window materialization + batched matvec einsum for corr,
             cumsum box-sum for s2 (f32 HIGHEST / bf16 inputs)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scanbench import scanbench  # noqa: E402

N, H, W = 256, 480, 752
TR, TC, NDISP = 11, 101, 129
STRIPE = TC + NDISP - 1


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    T = jnp.asarray(rng.rand(N, TR, TC).astype(np.float32) * 255.0)
    S = jnp.asarray(rng.rand(N, TR, STRIPE).astype(np.float32) * 255.0)
    return T, S


def gconv(x, k):
    return jax.lax.conv_general_dilated(
        x[None], k[:, None], window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=N,
    )[0]


def ssd_current(T, S):
    corr = gconv(S, T)[:, 0]  # (N, NDISP)
    s2 = gconv(S * S, jnp.ones_like(T))[:, 0]
    t2 = jnp.sum(T * T, axis=(-2, -1))[:, None]
    return t2 - 2.0 * corr + s2


def s2_cumsum(S):
    col = jnp.sum(S * S, axis=1)  # (N, STRIPE)
    cs = jnp.concatenate([jnp.zeros((N, 1), col.dtype), jnp.cumsum(col, -1)], -1)
    return cs[:, TC:] - cs[:, :-TC]  # wrong length guard below


def ssd_cumsum_s2(T, S):
    corr = gconv(S, T)[:, 0]
    s2 = s2_cumsum(S)[:, :NDISP]
    t2 = jnp.sum(T * T, axis=(-2, -1))[:, None]
    return t2 - 2.0 * corr + s2


def windows(S, dtype):
    # (N, NDISP, TR*TC): windows[n,d,:] = S[n,:,d:d+TC].ravel()
    idx = jnp.arange(NDISP)[:, None] + jnp.arange(TC)[None, :]  # (NDISP,TC)
    w = S[:, :, idx]  # (N, TR, NDISP, TC)
    return jnp.transpose(w, (0, 2, 1, 3)).reshape(N, NDISP, TR * TC).astype(dtype)


def ssd_im2col(T, S, dtype, precision):
    w = windows(S, dtype)
    t = T.reshape(N, TR * TC).astype(dtype)
    corr = jnp.einsum("ndc,nc->nd", w, t, precision=precision,
                      preferred_element_type=jnp.float32)
    s2 = s2_cumsum(S)[:, :NDISP]
    t2 = jnp.sum(T * T, axis=(-2, -1))[:, None]
    return t2 - 2.0 * corr + s2


def main():
    T, S = make_inputs()
    print(f"device: {jax.devices()[0]}  N={N} TR={TR} TC={TC} NDISP={NDISP}", flush=True)
    ref = np.asarray(ssd_current(T, S))
    for name, fn in [
        ("current (2x grouped conv)", ssd_current),
        ("cumsum s2", ssd_cumsum_s2),
        ("im2col f32 HIGHEST", lambda T, S: ssd_im2col(T, S, jnp.float32, jax.lax.Precision.HIGHEST)),
        ("im2col f32 DEFAULT", lambda T, S: ssd_im2col(T, S, jnp.float32, jax.lax.Precision.DEFAULT)),
        ("im2col bf16", lambda T, S: ssd_im2col(T, S, jnp.bfloat16, jax.lax.Precision.DEFAULT)),
    ]:
        out = np.asarray(fn(T, S))
        err = np.abs(out - ref).max()
        argmax_mismatch = (out.argmin(1) != ref.argmin(1)).mean()
        scanbench(name, fn, (T, S), reps=16)
        print(f"    max|d ssd|={err:.3e}  argmin mismatch={argmax_mismatch:.4f}", flush=True)


if __name__ == "__main__":
    main()


def extraction_probe():
    import numpy as np
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(480, 752).astype(np.float32) * 255.0)
    xi = jnp.asarray(rng.randint(60, 700, size=N).astype(np.int32))
    yi = jnp.asarray(rng.randint(10, 470, size=N).astype(np.int32))

    def extract_slices(img):
        tx0 = jnp.clip(xi - 50, 0, 752 - TC)
        ty0 = jnp.clip(yi - 5, 0, 480 - TR)
        sx0 = jnp.clip(tx0 - (NDISP - 1), 0, 752 - STRIPE)
        T = jax.vmap(lambda x0, y0: jax.lax.dynamic_slice(img, (y0, x0), (TR, TC)))(tx0, ty0)
        S = jax.vmap(lambda x0, y0: jax.lax.dynamic_slice(img, (y0, x0), (TR, STRIPE)))(sx0, ty0)
        return T, S

    def extract_rowgather(img):
        ty0 = jnp.clip(yi - 5, 0, 480 - TR)
        rows = img[ty0[:, None] + jnp.arange(TR)[None, :]]  # (N,TR,W) row gather
        tx0 = jnp.clip(xi - 50, 0, 752 - TC)
        sx0 = jnp.clip(tx0 - (NDISP - 1), 0, 752 - STRIPE)
        cT = tx0[:, None] + jnp.arange(TC)[None, :]
        cS = sx0[:, None] + jnp.arange(STRIPE)[None, :]
        T = jnp.take_along_axis(rows, cT[:, None, :].repeat(TR, 1), axis=2)
        S = jnp.take_along_axis(rows, cS[:, None, :].repeat(TR, 1), axis=2)
        return T, S

    scanbench("extract: vmap dynamic_slice", extract_slices, (img,), reps=16)
    scanbench("extract: row gather + take", extract_rowgather, (img,), reps=16)
    a = extract_slices(img); b = extract_rowgather(img)
    print("    equal:", bool(jnp.all(a[0] == b[0]) & jnp.all(a[1] == b[1])), flush=True)


extraction_probe()
