"""Pallas TPU kernel for stage 2 of the polyphase key STFT.

``ops/stft.py:polyphase_chunk_magnitudes`` computes the 8192/512 key STFT as
(1) one per-hop-block DFT matmul, then (2) per-block twiddle, a width-R box
sum along frames, and a periodic-Hann 3-bin mix with the untwiddle folded in.
Stage 2 as XLA ops materializes three chunk-sized HBM streams (the twiddled
blocks C, the box sums S — re-read at three bin offsets by the mix — plus
reshape copies): ~2 GB per 3-minute batch against ~0.3 GB of irreducible
input/output traffic, and profiling shows the key STFT is the largest single
item of the key path (~20 ms net of ~30).

This kernel fuses all of stage 2: each grid cell reads one FT-frame tile of
the block DFTs ``bd`` (plus its R-row halo), applies the twiddle (a constant
[FT+R, 2*KP] table — chunk starts are R-aligned so the j%R class pattern is
identical for every tile), box-sums via one in-kernel banded MXU matmul,
applies the 3-bin mix with per-frame phases (also a constant table), and
writes only the final magnitudes.

Mosaic notes (learned on ops/novelty_pallas.py): sublane concatenation and
lane rolls lower fine; narrow lane concatenation and Precision.HIGH do not.
The k-1 / k+1 mix neighbors use circular lane rolls with the k=0 conjugate
fix applied by lane mask; the wrapped top lane only pollutes lane KP-1,
which is >= keep_bins and sliced off.

Numerics match the XLA path: bd arrives f32, C is cast bf16 before the box
sum (the XLA path stores C bf16 — same rounding point), the box-sum matmul
accumulates f32, S stays f32 IN VMEM. With ``out_bf16`` (the bf16 pipeline
default since round 5) the OUTPUT magnitudes round to bf16 — the same
rounding point the XLA fallback applies to S — halving every downstream
read of the spec stream; decision parity pinned by the forced-polyphase CPU
test and the battery key families (round-5 A/B: identical accuracy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FT = 256  # frames per grid cell


@functools.lru_cache(maxsize=8)
def _twiddle_tables(r: int, kp: int, rows: int):
    """Constant [rows, 2*kp] twiddle e^{-2pi i k t/R} for row class t = j%R
    (valid for R-aligned tile starts), packed [cos | cos] x [sin | sin] so
    one elementwise complex multiply covers the re|im lane halves."""
    t = np.arange(rows)[:, None] % r
    k = np.arange(kp)[None, :] % r
    ang = 2.0 * np.pi * ((t * k) % r) / r
    c = np.cos(ang).astype(np.float32)
    s = (-np.sin(ang)).astype(np.float32)
    return np.concatenate([c, c], 1), np.concatenate([s, s], 1)


@functools.lru_cache(maxsize=8)
def _box_weights(r: int):
    """[FT, FT+R] banded 0/1 box-sum weights W[f, e] = 1 iff f <= e < f+R,
    stored bf16 (the contraction runs bf16 x bf16 -> f32, matching the XLA
    path's bf16 C operand)."""
    f = np.arange(FT)[:, None]
    e = np.arange(FT + r)[None, :]
    return ((e >= f) & (e < f + r)).astype(np.float32)


def _make_kernel(r: int, kp: int):
    rows = FT + r

    def kernel(bd_ref, halo_ref, w_ref, twc_ref, tws_ref, out_ref):
        # bd_ref [1, FT, 2KP]; halo_ref [1, 1, R, 2KP] = the R rows after
        # the tile (box windows cross the tile edge forward).
        bd = jnp.concatenate([bd_ref[0], halo_ref[0, 0]], axis=0)  # [rows, 2KP]
        bre_in = bd[:, :kp]
        bim_in = bd[:, kp:]

        # twiddle C = e^{-2pi i k j/R} * Bd (constant tables; one complex
        # multiply over the packed halves)
        twc = twc_ref[:, :]
        tws = tws_ref[:, :]
        cre = bre_in * twc[:, :kp] - bim_in * tws[:, :kp]
        cim = bre_in * tws[:, :kp] + bim_in * twc[:, :kp]
        c = jnp.concatenate([cre, cim], axis=1).astype(jnp.bfloat16)

        # width-R box sum along frames: one banded MXU matmul per tile
        s = jnp.dot(
            w_ref[:, :].astype(jnp.bfloat16), c,
            preferred_element_type=jnp.float32,
        )  # [FT, 2KP] f32
        sre = s[:, :kp]
        sim = s[:, kp:]

        # periodic-Hann 3-bin mix, untwiddle folded into per-frame phases
        # (stft.py polyphase header); S[-1] = conj S[1] via the lane-0 fix
        lane = jax.lax.broadcasted_iota(jnp.int32, (FT, kp), 1)
        # per-frame mix phases, iota-built (captured jnp constants are not
        # allowed in pallas kernels; FT % R == 0 makes f%R tile-invariant)
        row = jax.lax.broadcasted_iota(jnp.int32, (FT, 1), 0)
        phi = (row % r).astype(jnp.float32) * (2.0 * np.pi / r)
        cphi = jnp.cos(phi)
        sphi = jnp.sin(phi)
        sre_m = jnp.roll(sre, 1, axis=1)   # lane k-1
        sim_m = jnp.roll(sim, 1, axis=1)
        sre_p = jnp.roll(sre, -1, axis=1)  # lane k+1
        sim_p = jnp.roll(sim, -1, axis=1)
        m1re = jnp.where(lane == 0, sre_p, sre_m)
        m1im = jnp.where(lane == 0, -sim_p, sim_m)
        wre = 0.5 * sre - 0.25 * ((m1re + sre_p) * cphi + (m1im - sim_p) * sphi)
        wim = 0.5 * sim - 0.25 * ((m1im + sim_p) * cphi + (sre_p - m1re) * sphi)
        out_ref[0] = jnp.sqrt(wre * wre + wim * wim).astype(out_ref.dtype)

    return kernel


def polyphase_stage2(
    bd: jax.Array, r: int, ext: int, keep_bins: int, interpret: bool = False,
    out_bf16: bool = False,
) -> jax.Array:
    """Fused twiddle + box-sum + Hann-mix + magnitude.

    bd [B, EBP, 2*KP] f32 per-block DFTs (EBP a multiple of R covering at
    least ext + R blocks, R-aligned chunk start); returns magnitudes
    [B, ext, keep_bins] f32.
    """
    b, ebp, kp2 = bd.shape
    kp = kp2 // 2
    extp = -(-ext // FT) * FT
    n_tiles = extp // FT
    need = extp + r
    if need > ebp:
        bd = jnp.pad(bd, ((0, 0), (0, need - ebp), (0, 0)))
    # forward halo rows per tile: bd[(i+1)*FT : (i+1)*FT + R]
    halos = jnp.stack(
        [bd[:, (i + 1) * FT : (i + 1) * FT + r] for i in range(n_tiles)],
        axis=1,
    )  # [B, n_tiles, R, 2KP]

    twc, tws = _twiddle_tables(r, kp, FT + r)
    w = _box_weights(r)

    out = pl.pallas_call(
        _make_kernel(r, kp),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, FT, kp2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r, kp2), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FT, FT + r), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FT + r, kp2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FT + r, kp2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, FT, kp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, extp, kp), jnp.bfloat16 if out_bf16 else jnp.float32
        ),
        interpret=interpret,
    )(
        bd[:, :extp], halos,
        jnp.asarray(w), jnp.asarray(twc), jnp.asarray(tws),
    )
    return out[:, :ext, :keep_bins]
