#!/usr/bin/env python
"""Microbenchmark polyphase-STFT building blocks on the real chip.

The polyphase key-STFT plan: per hop-block DFT (shared across the R=16
overlapping frames) via one [*, hop] @ [hop, 6K] matmul, then a per-bin
R-tap complex FIR combine (exact (n-1)-Hann via the 3-term cosine
modulation identity). This times the candidate stages standalone at
production shapes and the current direct fused-basis matmul they must beat.

Usage: [B=8] [REPS=3] python scripts/bench_polyphase.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

SR = 44100


def main() -> int:
    from stratum_dsp_tpu import compile_cache

    compile_cache.enable()

    import jax
    import jax.numpy as jnp

    from _axon_bench import Bench

    b = int(os.environ.get("B", "8"))
    reps = int(os.environ.get("REPS", "3"))
    T = 180 * SR
    N, H, K = 8192, 512, 930
    R = N // H
    J = (T - N) // H + 1 + (R - 1)  # blocks
    F = J - (R - 1)

    key = jax.random.PRNGKey(0)
    bench = Bench()

    import time

    def timeit_fetch(label, fn, *args, perturb=(0,)):
        fn_j = jax.jit(fn)
        r = fn_j(*args)
        float(np.asarray(r))
        times = []
        for _ in range(reps):
            a = list(args)
            for i in perturb:
                a[i] = bench.fresh(a[i])
            t0 = time.time()
            r = fn_j(*a)
            float(np.asarray(r))
            times.append(time.time() - t0)
        med = float(np.median(times))
        print(f"{label:32s} {med*1e3:8.1f} ms  (all: {[round(t*1e3,1) for t in times]})", flush=True)
        return med

    only = os.environ.get("STAGE", "")

    def maybe(label, fn, *args):
        if only and only not in label:
            return
        print(f"... warming {label}", flush=True)
        timeit_fetch(label, fn, *args)

    # ---- stage 1: block matmul [B*J, H] @ [H, 6K] ---------------------------
    x = jax.random.normal(key, (b, J, H), jnp.float32)
    basis6 = jax.random.normal(key, (H, 6 * K), jnp.float32)

    def block_matmul_bf16(x, basis):
        y = jnp.matmul(
            x.astype(jnp.bfloat16), basis.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        y = y.astype(jnp.float32)
        return jnp.sum(y * y)  # nonlinear: stops XLA folding sum into the dot

    maybe("stage1 block matmul (bf16)", block_matmul_bf16, x, basis6)

    # ---- stage 2 candidates over blocks [B, J, 6K] --------------------------
    blocks = jax.random.normal(key, (b, J, 6 * K), jnp.float32)
    w_shift = jax.random.normal(key, (R, 6, K, 2), jnp.float32)

    def combine_shifts(blk, w):
        # chunked like production (scan over frame chunks)
        C = 968  # F = 15488 = 16 * 968
        blk = blk.astype(jnp.bfloat16).reshape(b, J, 6, K)

        def body(carry, i):
            seg0 = jax.lax.dynamic_slice_in_dim(blk, i * C, C + R, axis=1)
            seg0 = seg0.astype(jnp.float32)
            out = jnp.zeros((b, C, K, 2), jnp.float32)
            for m in range(R):
                out = out + jnp.einsum(
                    "bfgk,gkc->bfkc",
                    jax.lax.dynamic_slice_in_dim(seg0, m, C, axis=1), w[m]
                )
            return carry + jnp.sum(out * out), 0

        s, _ = jax.lax.scan(body, 0.0, jnp.arange(F // C))
        return s

    maybe("stage2 16-shift einsum", combine_shifts, blocks, w_shift)

    # ---- stage 2 via Pallas: per-tile static-slice MAC, magnitude fused ----
    from jax.experimental import pallas as pl

    KP = 1024  # K padded to lane alignment; 6*KP = 6144
    FT = 256
    nt = F // FT
    jpad = (nt + 1) * FT
    blocks_p = jax.random.normal(key, (b, jpad, 6 * KP), jnp.float32)
    wre = jax.random.normal(key, (R, 6 * KP), jnp.float32)
    wim = jax.random.normal(key, (R, 6 * KP), jnp.float32)

    from jax.experimental.pallas import tpu as pltpu

    def combine_kernel(b1_ref, b2_ref, wre_ref, wim_ref, out_ref):
        t_cat = jnp.concatenate([b1_ref[0], b2_ref[0][:R]], axis=0)  # bf16
        accre = jnp.zeros((FT, KP), jnp.float32)
        accim = jnp.zeros((FT, KP), jnp.float32)
        for m in range(R):
            seg = jax.lax.slice_in_dim(t_cat, m, m + FT, axis=0)
            for g in range(6):
                sl = jax.lax.slice_in_dim(seg, g * KP, (g + 1) * KP, axis=1).astype(jnp.float32)
                accre = accre + sl * wre_ref[m, g * KP:(g + 1) * KP][None, :]
                accim = accim + sl * wim_ref[m, g * KP:(g + 1) * KP][None, :]
        out_ref[0] = jnp.sqrt(accre * accre + accim * accim)

    def combine_pallas(blk, wre, wim):
        blk = blk.astype(jnp.bfloat16)
        out = pl.pallas_call(
            combine_kernel,
            grid=(b, nt),
            in_specs=[
                pl.BlockSpec((1, FT, 6 * KP), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, FT, 6 * KP), lambda i, j: (i, j + 1, 0)),
                pl.BlockSpec((R, 6 * KP), lambda i, j: (0, 0)),
                pl.BlockSpec((R, 6 * KP), lambda i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, FT, KP), lambda i, j: (i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((b, nt * FT, KP), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(blk, blk, wre, wim)
        return jnp.sum(out * out)

    maybe("stage2 pallas combine", combine_pallas, blocks_p, wre, wim)

    # ---- reference: direct fused-basis matmul over all frames, chunked -----
    samples = jax.random.normal(key, (b, T), jnp.float32)
    fused = jax.random.normal(key, (N, 2 * K), jnp.float32).astype(jnp.bfloat16)

    def direct_all(s, fb):
        C = 968
        from stratum_dsp_tpu.ops.stft import extract_frames

        def body(carry, i):
            region = jax.lax.dynamic_slice(
                s, (0, i * C * H), (b, (C - 1) * H + N))
            fr = extract_frames(region, C, N, H)
            ri = jnp.matmul(fr.astype(jnp.bfloat16), fb, preferred_element_type=jnp.float32)
            mag = jnp.sqrt(ri[..., :K] ** 2 + ri[..., K:] ** 2)
            return carry + jnp.sum(mag * mag), 0

        out, _ = jax.lax.scan(body, 0.0, jnp.arange(F // C))
        return out

    maybe("direct matmul (chunked)", direct_all, samples, fused)
    return 0


if __name__ == "__main__":
    sys.exit(main())
