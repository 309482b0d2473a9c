"""Batched, chunked STFT frontend.

TPU-native replacement for the reference's ``compute_stft``
(``chroma/extractor.rs:301-359``): Hann window with ``(n-1)`` denominator,
forward rFFT, magnitude of the first ``frame_size/2 + 1`` bins, frame count
``(len - frame_size)/hop + 1``.

Design notes (TPU-first):

* Tracks are batched ``[B, T]`` with per-track ``lengths``; all shapes static.
* A full 3-minute spectrogram (15k x 1025..4097 f32) does not need to live in
  HBM: downstream consumers are per-frame *reductions* (novelty curves, band
  energies, chroma). We therefore scan over **frame chunks**: each scan step
  materializes only ``[B, chunk, K]`` magnitudes, applies a caller-provided
  reducer, and emits small per-frame features. This keeps HBM traffic at the
  streaming minimum and lets XLA pipeline FFT + reduction.
* Frame extraction uses the ``frame_size % hop == 0`` layout trick: reshape
  the sample region into hop-sized blocks and concatenate ``frame//hop``
  *statically shifted* block slices — zero gathers, pure reshapes.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def num_frames(n_samples: int, frame_size: int, hop: int) -> int:
    """Frame count for a signal of length n (extractor.rs:314)."""
    if n_samples < frame_size:
        return 0
    return (n_samples - frame_size) // hop + 1


def hann_window(frame_size: int, dtype=jnp.float32) -> jax.Array:
    """Hann window with the reference's (n-1) denominator (extractor.rs:318-323)."""
    i = np.arange(frame_size, dtype=np.float64)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * i / (frame_size - 1)))
    return jnp.asarray(w, dtype=dtype)


def extract_frames(region: jax.Array, n_frames: int, frame_size: int, hop: int) -> jax.Array:
    """Extract overlapping frames from ``region [B, L]`` where
    ``L >= (n_frames-1)*hop + frame_size``. Returns ``[B, n_frames, frame_size]``.

    Fast path requires ``frame_size % hop == 0`` (true for every config the
    pipeline uses: 2048/512, 2048/256, 2048/1024, 8192/512).
    """
    b = region.shape[0]
    if frame_size % hop == 0:
        k = frame_size // hop
        n_blocks = n_frames + k - 1
        need = n_blocks * hop
        region = region[:, :need]
        blocks = region.reshape(b, n_blocks, hop)
        parts = [blocks[:, j : j + n_frames, :] for j in range(k)]
        return jnp.concatenate(parts, axis=-1)
    # general gather fallback
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_size)[None, :]
    return region[:, idx]


DFT_MATMUL_MAX = 8192  # use the MXU DFT up to this frame size (covers the key STFT)


def dft_basis(n: int):
    """Real-DFT cos/sin bases [n, n//2+1], computed on device from iota so the
    134 MB-class matrices never become HLO constants (the axon remote-compile
    path rejects large literals). Angles use an exact int32 (t*k mod n) to
    avoid f32 mantissa overflow at large products."""
    k_bins = n // 2 + 1
    t = jax.lax.broadcasted_iota(jnp.int32, (n, k_bins), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (n, k_bins), 1)
    phase = ((t * k) % n).astype(jnp.float32) * (2.0 * np.pi / n)
    return jnp.cos(phase), jnp.sin(phase)


def fused_windowed_basis(n: int, window: jax.Array, keep_bins=None, bf16=False) -> jax.Array:
    """Single ``[n, 2*K]`` DFT projection with the analysis window folded in:
    ``frames @ fused`` yields ``[re | im]`` in one MXU matmul. Folding the
    window into the basis removes the per-chunk elementwise windowing pass
    over the ``[B, C, n]`` frames buffer, and fusing cos|sin halves the
    number of frame reads vs two separate matmuls.

    With ``bf16`` the basis is stored bf16; ``stft_magnitude_chunk`` then
    feeds the MXU bf16 inputs with f32 accumulation (~4x the f32 rate on
    v5e). The basis dtype is the single switch downstream keys off."""
    cb, sb = dft_basis(n)
    if keep_bins is not None:
        cb, sb = cb[:, :keep_bins], sb[:, :keep_bins]
    fused = jnp.concatenate([cb, sb], axis=1) * window[:, None]
    return fused.astype(jnp.bfloat16) if bf16 else fused


_CT_INNER = 128  # inner radix of the factored DFT (one MXU tile)


@functools.lru_cache(maxsize=16)
def _ct_factored_mats(n: int):
    """Small host-side matrices for the two-stage Cooley-Tukey real-DFT
    magnitude. With N = N1*128, n = n1 + N1*n2 and k = q*128 + k2:

        X[q*128+k2] = sum_n1 W_N1^{q n1} * W_N^{n1 k2} *
                        sum_n2 x[n1 + N1 n2] W_128^{n2 k2}

    Each stage is a batched matmul over a <=128-wide contraction — ~15x
    fewer FLOPs than the one-stage [N, N/2+1] DFT at N=8192 — and every
    matrix is MXU-tile-sized.
    """
    n2 = _CT_INNER
    n1 = n // n2
    q_max = n1 // 2 + 1  # q*128 + k2 <= n/2 needs q <= n1/2

    k2 = np.arange(n2)
    ang2 = 2.0 * np.pi * np.outer(k2, np.arange(n2)) / n2
    c2, s2 = np.cos(ang2), np.sin(ang2)  # [k2, n2]

    nn1 = np.arange(n1)
    angt = 2.0 * np.pi * np.outer(k2, nn1) / n
    tre, tim = np.cos(angt), -np.sin(angt)  # twiddle e^{-2pi i k2 n1 / N}

    ang1 = 2.0 * np.pi * np.outer(np.arange(q_max), nn1) / n1
    c1, s1 = np.cos(ang1), np.sin(ang1)  # [q, n1]

    # cache NUMPY (converting to jnp here would leak tracers when first
    # called under a jit trace); the ~64 KB matrices become cheap constants
    f32 = lambda a: np.asarray(a, np.float32)
    return f32(c2), f32(s2), f32(tre), f32(tim), f32(c1), f32(s1), n1, n2, q_max


def rfft_magnitude_factored(x: jax.Array) -> jax.Array:
    """|rfft(x)| via the two-stage matmul factorization; x [..., N] with
    N divisible by 128 and N/128 <= 128."""
    n = x.shape[-1]
    c2, s2, tre, tim, c1, s1, n1, n2, q_max = _ct_factored_mats(n)
    xr = x.reshape(x.shape[:-1] + (n2, n1))  # [..., n2, n1]
    # inner DFT over n2 (e^{-i theta}: G = x*cos - i x*sin)
    gre = jnp.einsum("...ni,kn->...ki", xr, c2, preferred_element_type=jnp.float32)
    gim = -jnp.einsum("...ni,kn->...ki", xr, s2, preferred_element_type=jnp.float32)
    # twiddle multiply (elementwise over [k2, n1])
    g2re = gre * tre - gim * tim
    g2im = gre * tim + gim * tre
    # outer DFT over n1: X = sum (g2re + i g2im)(cos - i sin)
    xre = jnp.einsum("...ki,qi->...qk", g2re, c1, preferred_element_type=jnp.float32) + \
        jnp.einsum("...ki,qi->...qk", g2im, s1, preferred_element_type=jnp.float32)
    xim = jnp.einsum("...ki,qi->...qk", g2im, c1, preferred_element_type=jnp.float32) - \
        jnp.einsum("...ki,qi->...qk", g2re, s1, preferred_element_type=jnp.float32)
    mag = jnp.sqrt(xre * xre + xim * xim)  # [..., q_max, n2]
    flat = mag.reshape(mag.shape[:-2] + (q_max * n2,))
    return flat[..., : n // 2 + 1].astype(jnp.float32)


def stft_magnitude_chunk(
    frames: jax.Array, window: jax.Array, basis=None, keep_bins=None
) -> jax.Array:
    """Windowed rFFT magnitude for a chunk of frames [B, C, F] -> [B, C, F//2+1].

    For frame sizes up to DFT_MATMUL_MAX the rFFT runs as MXU matmuls: the
    one-stage [N, N/2+1] cos/sin pair (XLA's TPU FFT lowering measured
    ~0.4% of peak at N=8192; the dense DFT matmul wins by a wide margin).
    """
    n = frames.shape[-1]
    # NOTE: the factored form measured SLOWER end-to-end than the one-stage
    # DFT despite ~15x fewer FLOPs — its six small einsums force layout
    # transposes of the [B, C, 128, N/128] intermediates, while the single
    # [*, N] @ [N, N/2+1] matmul runs near MXU peak. Kept for reference and
    # possible Pallas fusion; not on the default path.
    if n <= DFT_MATMUL_MAX:
        if basis is not None and not isinstance(basis, tuple):
            # fused [n, 2K] windowed basis (see fused_windowed_basis):
            # ONE matmul, no separate windowing pass; a bf16 basis selects
            # the bf16-input / f32-accumulate MXU path
            ri = jnp.matmul(
                frames.astype(basis.dtype), basis,
                preferred_element_type=jnp.float32,
            )
            k = basis.shape[-1] // 2
            re, im = ri[..., :k], ri[..., k:]
            # Magnitudes are ALWAYS f32, bf16 basis or not: emitting bf16
            # here was measured to break the pinned bf16 rounding contract
            # (test_stft.py::test_bf16_stft_error_bound — 2.1% per-frame
            # energy error vs the 1% bound — and ::test_bf16_pipeline_parity).
            return jnp.sqrt(re * re + im * im).astype(jnp.float32)
        cb, sb = dft_basis(n) if basis is None else basis
        if keep_bins is not None:
            cb, sb = cb[:, :keep_bins], sb[:, :keep_bins]
        x = frames * window
        re = jnp.matmul(x, cb, preferred_element_type=jnp.float32)
        im = jnp.matmul(x, sb, preferred_element_type=jnp.float32)
        return jnp.sqrt(re * re + im * im).astype(jnp.float32)
    spec = jnp.fft.rfft(frames * window, axis=-1)
    if keep_bins is not None:
        spec = spec[..., :keep_bins]
    return jnp.abs(spec).astype(jnp.float32)


# --------------------------------------------------------------------------
# Polyphase shared-block STFT (the bf16 TPU fast path for high-overlap STFTs)
# --------------------------------------------------------------------------
#
# At frame/hop ratios R >= 8 (the 8192/512 key STFT and the 2048/256
# multi-res pass) consecutive frames share all but one hop-block of samples.
# Computing the DFT of each hop-block ONCE and combining R of them cuts the
# MXU work ~R x vs the direct [frame, 2K] fused-basis matmul:
#
#   X_f[k] = sum_m e^{-2pi i k m/R} * Bd[f+m, k]
#   Bd[j, k] = sum_s x[j*hop + s] * e^{-2pi i k s/N}   (one [hop, 2K] matmul)
#
# The tap phases are pure frame-offset phases, so with the per-block twiddle
# C[j, k] = e^{-2pi i k j/R} Bd[j, k] the combine collapses to
#
#   X_f[k] = e^{+2pi i k f/R} * S_f[k],   S_f[k] = sum_{j=f}^{f+R-1} C[j, k]
#
# i.e. a width-R BOX SUM along frames — which runs as a banded 0/1 matmul on
# the MXU (the same pattern as chroma.extractor.windowed_time_mean; a
# frame-axis cumsum costs O(log T) HBM passes and measured far slower).
#
# Windowing uses the *periodic* Hann identity: with w[n] = 0.5 - 0.5
# cos(2pi n/N) the windowed spectrum is exactly 0.5 X[k] - 0.25 X[k-1]
# - 0.25 X[k+1] (X[-1] = conj X[1] for real input). The reference's
# symmetric (n-1) Hann differs from the periodic one by O(1/N) per window
# sample — far below the bf16 fast path's existing ~0.4% rounding contract
# (test_stft.py pins decision parity) — so the polyphase path is enabled
# only when ``bf16`` is on; the f32 parity path keeps the direct
# symmetric-Hann DFT. The untwiddle phase e^{+2pi i k f/R} is folded into
# the 3-bin mix, where the magnitude kills the k-dependent outer factor and
# leaves only per-frame scalars e^{-+2pi i f/R} on the k-+1 terms:
#
#   |Xw[f,k]| = |0.5 S[k] - 0.25 (e^{-i phi} S[k-1] + e^{+i phi} S[k+1])|,
#   phi = 2pi f / R,  S[-1] = conj S[1].

POLY_FT = 128  # frames per box-sum tile (band waste = (FT+R)/R per matmul)


def _poly_block_basis(n: int, hop: int, kp: int, bf16: bool) -> jax.Array:
    """[hop, 2*KP] unwindowed DFT basis on the N-point grid restricted to a
    hop-block's support (device iota build, exact int phase)."""
    s = jax.lax.broadcasted_iota(jnp.int32, (hop, kp), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (hop, kp), 1)
    phase = ((s * k) % n).astype(jnp.float32) * (2.0 * np.pi / n)
    basis = jnp.concatenate([jnp.cos(phase), -jnp.sin(phase)], axis=1)
    return basis.astype(jnp.bfloat16) if bf16 else basis


def _poly_twiddle_table(r: int, kp: int) -> tuple:
    """Constant ``[r, kp]`` twiddle e^{-2pi i k t/R} for block class t = j%R
    (valid because chunk starts are aligned to R). Broadcast-multiplied over
    ``[B, eb/R, R, kp]`` — no per-chunk trig, no gather."""
    t = jax.lax.broadcasted_iota(jnp.int32, (r, kp), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (r, kp), 1)
    ang = ((t * (k % r)) % r).astype(jnp.float32) * (2.0 * np.pi / r)
    return jnp.cos(ang), -jnp.sin(ang)


def poly_num_blocks(ext: int, frame_size: int, hop: int) -> int:
    """Blocks a polyphase chunk of ``ext`` frames consumes (callers must pad
    samples so block ``start + poly_num_blocks`` is sliceable). Rounded up to
    a multiple of R for the class-grouped stage-1 reshape."""
    r = frame_size // hop
    return -(-(ext + r) // r) * r


def polyphase_chunk_magnitudes(
    samples: jax.Array,
    start: jax.Array,
    ext: int,
    frame_size: int,
    hop: int,
    keep_bins: int,
    bf16: bool = True,
) -> jax.Array:
    """Periodic-Hann STFT magnitudes for frames ``[start, start+ext)`` of
    ``samples [B, T]`` via the polyphase shared-block path; returns
    ``[B, ext, keep_bins]``.

    ``start`` MUST be a multiple of R = frame_size//hop (callers align the
    chunk grid; this makes every block's twiddle class and every frame's mix
    phase a compile-time constant). ``samples`` must be zero-padded so sample
    ``(start + poly_num_blocks(ext)) * hop`` is in range."""
    b = samples.shape[0]
    r = frame_size // hop
    kp = -(-(keep_bins + 1) // 128) * 128  # bin keep_bins feeds the k+1 mix
    ebp = poly_num_blocks(ext, frame_size, hop)

    # stage 1: per-block DFT, ONE well-shaped MXU matmul (fragmenting it by
    # twiddle class starved the MXU: ~eb/R rows per class)
    region = jax.lax.dynamic_slice(samples, (0, start * hop), (b, ebp * hop))
    blocks = region.reshape(b, ebp, hop)
    basis = _poly_block_basis(frame_size, hop, kp, bf16)
    if bf16:
        blocks = blocks.astype(jnp.bfloat16)
    bd = jnp.matmul(blocks, basis, preferred_element_type=jnp.float32)

    # Fused stage 2 (Pallas): twiddle + box sum + Hann mix + magnitude in one
    # VMEM pass per frame tile — C and S never spill to HBM (~2 GB/batch of
    # intermediate streams in the XLA formulation below). A/B:
    # STRATUM_NO_PALLAS_POLY2=1 disables, _FORCE enables off-TPU (interpret).
    import os as _os

    if not _os.environ.get("STRATUM_NO_PALLAS_POLY2") and (
        jax.default_backend() == "tpu"
        or _os.environ.get("STRATUM_FORCE_PALLAS_POLY2")
    ):
        from .polyphase_pallas import polyphase_stage2

        # store bd bf16 between the stages: halves the largest HBM stream of
        # the key STFT ([B, ebp, 2*KP] f32 ~ 2.3 GB/3-min batch). Rounding
        # point moves one multiply earlier than the XLA path's bf16 C — same
        # contract; the kernel's twiddle multiply upcasts back to f32.
        # bf16 magnitudes out of the kernel: halves the conditioning/HPCP
        # read traffic downstream and matches the XLA fallback's own bf16-S
        # rounding point. Decision-neutral on every battery key family
        # (round-5 A/B); ~11 ms/batch off the isolated key path at B=40.
        return polyphase_stage2(
            bd.astype(jnp.bfloat16) if bf16 else bd, r, ext, keep_bins,
            interpret=jax.default_backend() != "tpu",
            out_bf16=bf16,
        )

    # per-block twiddle C = e^{-2pi i k j/R} * Bd. start % R == 0 makes the
    # class pattern j % R static: one broadcast multiply by a constant
    # [R, kp] table (no trig, no gather — XLA folds the table).
    twre, twim = _poly_twiddle_table(r, kp)
    bre = bd[..., :kp].reshape(b, ebp // r, r, kp)
    bim = bd[..., kp:].reshape(b, ebp // r, r, kp)
    c = jnp.concatenate(
        [bre * twre - bim * twim, bre * twim + bim * twre], axis=-1
    ).reshape(b, ebp, 2 * kp)
    eb = ebp
    if bf16:
        c = c.astype(jnp.bfloat16)  # halves box-sum HBM reads; f32 accumulate

    # width-R box sum along frames as banded MXU matmuls over FT-frame tiles:
    # S[f] = W1 @ cur_tile + W2 @ next_tile (the band crosses one tile edge)
    ft = POLY_FT
    nt = -(-ext // ft)
    pad_rows = nt * ft + ft - eb
    cpad = jnp.pad(c, ((0, 0), (0, pad_rows), (0, 0)))
    cur = cpad[:, : nt * ft].reshape(b, nt, ft, 2 * kp)
    nxt = cpad[:, ft : (nt + 1) * ft].reshape(b, nt, ft, 2 * kp)
    f_i = jax.lax.broadcasted_iota(jnp.int32, (ft, ft), 0)
    e_i = jax.lax.broadcasted_iota(jnp.int32, (ft, ft), 1)
    w1 = ((e_i >= f_i) & (e_i < f_i + r)).astype(c.dtype)
    w2 = (e_i + ft < f_i + r).astype(c.dtype)
    s = jnp.einsum(
        "fe,bjek->bjfk", w1, cur, preferred_element_type=jnp.float32
    ) + jnp.einsum(
        "fe,bjek->bjfk", w2, nxt, preferred_element_type=jnp.float32
    )
    if bf16:
        # The mix below re-reads s at three bin offsets; storing it bf16
        # (f32 accumulation happened inside the einsums) halves the largest
        # HBM stream of the polyphase path. Rounding is ~2^-9 of local |S|;
        # where the 3-bin mix cancels (sidelobes), the RELATIVE error of the
        # mixed output can be much larger than 2^-9 — acceptable only
        # because downstream consumers (harmonic mask, HPCP) are driven by
        # spectral peaks, where the mix does not cancel. Decision parity is
        # pinned by the forced-polyphase CPU test and re-checked on real
        # TPU by bench.py's bpm_family/key assertions.
        s = s.astype(jnp.bfloat16)
    s = s.reshape(b, nt * ft, 2 * kp)[:, :ext]
    sre, sim = s[..., :kp], s[..., kp:]

    # periodic-Hann 3-bin mix with the untwiddle folded in (see header);
    # S[-1] = conj S[1]; the top kp-keep_bins >= 1 spare bins absorb k+1.
    # start % R == 0, so the frame phase is the compile-time arange pattern.
    phi = ((jnp.arange(ext) % r).astype(jnp.float32) * (2.0 * np.pi / r))[
        None, :, None
    ]
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    m1re = jnp.concatenate([sre[..., 1:2], sre[..., :-1]], axis=-1)
    m1im = jnp.concatenate([-sim[..., 1:2], sim[..., :-1]], axis=-1)
    p1re = jnp.concatenate([sre[..., 1:], sre[..., -1:]], axis=-1)
    p1im = jnp.concatenate([sim[..., 1:], sim[..., -1:]], axis=-1)
    wre = 0.5 * sre - 0.25 * (
        (m1re + p1re) * cphi + (m1im - p1im) * sphi
    )
    wim = 0.5 * sim - 0.25 * (
        (m1im + p1im) * cphi + (p1re - m1re) * sphi
    )
    mag = jnp.sqrt(wre * wre + wim * wim)
    return mag[..., :keep_bins]


def use_polyphase(frame_size: int, hop: int, bf16: bool, keep_bins=None) -> bool:
    """The polyphase path pays off when >=8 frames share each block; it is
    part of the bf16 fast-path contract (periodic vs symmetric Hann).
    ``STRATUM_NO_POLYPHASE=1`` disables it; ``STRATUM_FORCE_POLYPHASE=1``
    enables it off-TPU (parity tests)."""
    import os

    if os.environ.get("STRATUM_NO_POLYPHASE"):
        return False
    if not bf16 or frame_size % hop or hop % 128 or (frame_size // hop) < 16:
        # R=8 (the 2048/256 multi-res pass) measured a net LOSS end-to-end
        # BOTH with the XLA stage 2 (twiddle/mix VPU work outweighs the 8x
        # MXU saving) AND with the fused Pallas stage-2 kernel (70.8 vs
        # 72.5 tracks/s: the box-sum matmul's useful band fraction halves
        # and kp padding is 1152 vs 1025). Only the very-high-overlap key
        # STFT (8192/512, R=16) wins.
        return False
    kb = frame_size // 2 + 1 if keep_bins is None else keep_bins
    if -(-(kb + 1) // 128) * 128 > frame_size:
        return False
    if os.environ.get("STRATUM_FORCE_POLYPHASE"):
        return True
    return jax.default_backend() == "tpu"


def stft_reduce(
    samples: jax.Array,
    lengths: jax.Array,
    frame_size: int,
    hop: int,
    reducer: Callable,
    carry_init: Callable,
    chunk_frames: int = 256,
    halo: int = 0,
    keep_bins=None,
    bf16: bool = False,
):
    """Scan the batched STFT in frame chunks and reduce each chunk.

    Args:
      samples: ``[B, T]`` padded sample batch (padding must be zeros).
      lengths: ``[B]`` int32 valid sample counts.
      frame_size, hop: STFT params.
      reducer: ``(spec, frame_idx, frame_valid, carry) -> (outs, carry)`` where
        ``spec`` is ``[B, C + halo_frames, K]`` magnitudes covering frames
        ``[chunk_start - halo, chunk_start + C + halo)`` clamped to the global
        frame range (out-of-range frames are zero and marked invalid),
        ``frame_idx [C+2*halo]`` global frame indices, ``frame_valid
        [B, C+2*halo]`` validity (in-range AND within the track's frame
        count). ``outs`` must be a pytree of arrays with leading dims
        ``[B, C, ...]`` describing the *central* C frames.
      carry_init: ``(B,) -> carry`` pytree initializer.
      chunk_frames: frames per scan step.
      halo: context frames needed on each side (e.g. 0 for per-frame
        features with a carried previous frame; ``margin`` for centered
        time-smoothing).

    Returns:
      (outs, n_frames_total, frame_counts) where ``outs`` has leading dims
      ``[B, n_frames_padded, ...]`` (n_frames_padded = n_chunks*chunk_frames,
      >= n_frames_total) and ``frame_counts [B]`` is each track's valid frame
      count.
    """
    b, t = samples.shape
    nf = num_frames(t, frame_size, hop)
    if nf <= 0:
        # shorter than one frame: run a single all-invalid frame so callers
        # degrade gracefully (the reference returns an empty spectrogram and
        # downstream stages fall back to defaults, e.g. lib.rs:985-1009)
        nf = 1

    kbins = keep_bins if keep_bins is not None else frame_size // 2 + 1
    poly = use_polyphase(frame_size, hop, bf16, kbins)
    r = frame_size // hop
    if poly:
        # Align the chunk grid so every chunk's first frame is a multiple of
        # R: round chunk_frames up to a multiple of R and left-pad the
        # samples by halo*hop so the first chunk needs no clamping. Chunk c
        # then covers padded frames [c*chunk_frames, ...), all = 0 mod R, and
        # the polyphase twiddle classes / mix phases are compile-time
        # constants.
        chunk_frames = -(-chunk_frames // r) * r
    n_chunks = -(-nf // chunk_frames)
    nf_padded = n_chunks * chunk_frames

    # Per-track frame counts from per-track lengths.
    frame_counts = jnp.where(
        lengths >= frame_size, (lengths - frame_size) // hop + 1, 0
    ).astype(jnp.int32)

    ext = chunk_frames + 2 * halo

    # Pad samples so every chunk (+halo) can slice a full region.
    if poly:
        lpad = halo * hop
        need = ((n_chunks - 1) * chunk_frames + poly_num_blocks(ext, frame_size, hop) + 1) * hop
        samples = jnp.pad(
            samples, ((0, 0), (lpad, max(need - (t + lpad), 0)))
        )
    else:
        # Left-pad by halo*hop (like the polyphase branch) so chunk slices
        # never clamp: the old max(first_frame, 0) clamp MISALIGNED the
        # whole first chunk by `halo` frames whenever halo > 0 — its
        # central region carried frames [halo, C+halo) labeled as
        # [0, C), shifting every downstream key feature by halo frames and
        # dropping the last halo frames of the track (round-5 find; the
        # polyphase path was always correct, which is why the bug only
        # showed on the f32 direct-DFT path).
        lpad = halo * hop
        need = (nf_padded + 2 * halo - 1) * hop + frame_size
        samples = jnp.pad(
            samples, ((0, 0), (lpad, max(need - (t + lpad), 0)))
        )

    if poly:
        window = basis = None
    else:
        window = hann_window(frame_size, samples.dtype)
        basis = (
            fused_windowed_basis(frame_size, window, keep_bins, bf16)
            if frame_size <= DFT_MATMUL_MAX
            else None
        )

    def body(carry, chunk_idx):
        first_frame = chunk_idx * chunk_frames - halo  # may be negative
        if poly:
            # Left-padded sample space: padded frame index = true index +
            # halo, so chunk c starts at padded frame c*chunk_frames (= 0 mod
            # R). Out-of-range frames read zeros and are masked below.
            spec = polyphase_chunk_magnitudes(
                samples, chunk_idx * chunk_frames, ext, frame_size, hop, kbins
            )
            fidx = first_frame + jnp.arange(ext)
            fvalid = (fidx[None, :] >= 0) & (
                fidx[None, :] < frame_counts[:, None]
            )
        else:
            # Left-padded sample space: padded frame index = true index +
            # halo, so chunk c's extended region starts at padded frame
            # c*chunk_frames; frames before the track start read zeros and
            # are masked below.
            region = jax.lax.dynamic_slice(
                samples, (0, chunk_idx * chunk_frames * hop),
                (b, (ext - 1) * hop + frame_size),
            )
            # (casting the region bf16 BEFORE extraction was measured flat —
            # XLA already fuses the matmul-input cast into the frame concat)
            frames = extract_frames(region, ext, frame_size, hop)
            spec = stft_magnitude_chunk(frames, window, basis, keep_bins)
            fidx = first_frame + jnp.arange(ext)
            fvalid = (fidx[None, :] >= 0) & (
                fidx[None, :] < frame_counts[:, None]
            )
        spec = jnp.where(fvalid[:, :, None], spec, 0.0)
        outs, carry = reducer(spec, fidx, fvalid, carry)
        return carry, outs

    carry0 = carry_init(b)
    _, outs = jax.lax.scan(body, carry0, jnp.arange(n_chunks))

    def fix(x):
        # [n_chunks, B, C, ...] -> [B, n_chunks*C, ...]
        x = jnp.moveaxis(x, 0, 1)
        return x.reshape((b, nf_padded) + x.shape[3:])

    outs = jax.tree_util.tree_map(fix, outs)
    return outs, nf_padded, frame_counts


def mel_filterbank_matrix(
    sample_rate: int, n_bins: int, n_mels: int, fmin_hz: float, fmax_hz: float
) -> np.ndarray:
    """HTK-mel triangular filterbank as a dense ``[n_bins, n_mels]`` matrix.

    Mirrors the reference's integer-bin triangle construction
    (``novelty.rs:78-172``): mel points are converted to *rounded bin indices*
    made strictly increasing, and the rising/falling slopes are computed in
    bin space with zero weight at the triangle feet. Applied to log1p
    magnitudes via one MXU matmul.
    """
    if sample_rate <= 0 or n_bins < 2:
        raise ValueError("invalid mel filterbank params")
    n_mels = max(n_mels, 4)
    nyquist = sample_rate * 0.5
    fmin = min(max(fmin_hz, 0.0), max(nyquist, 1.0))
    fmax = fmax_hz if (np.isfinite(fmax_hz) and fmax_hz > 0.0) else nyquist
    fmax = float(np.clip(fmax, fmin + 1.0, nyquist))

    fft_size = (n_bins - 1) * 2
    freq_res = sample_rate / fft_size

    def mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def inv_mel(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    mel_min, mel_max = mel(fmin), mel(fmax)
    step = (mel_max - mel_min) / (n_mels + 1)
    hz_points = inv_mel(mel_min + step * np.arange(n_mels + 2))
    bin_points = np.clip(np.round(hz_points / freq_res).astype(np.int64), 0, n_bins - 1)
    for i in range(1, len(bin_points)):
        if bin_points[i] <= bin_points[i - 1]:
            bin_points[i] = min(bin_points[i - 1] + 1, n_bins - 1)

    w = np.zeros((n_bins, n_mels), dtype=np.float32)
    for m in range(n_mels):
        left, center, right = bin_points[m], bin_points[m + 1], bin_points[m + 2]
        if not (left < center < right):
            continue
        for bb in range(left, center + 1):
            ww = 0.0 if bb == left else (bb - left) / (center - left)
            if ww > 0:
                w[bb, m] += ww
        for bb in range(center, right + 1):
            ww = 0.0 if bb == right else (right - bb) / (right - center)
            if ww > 0:
                w[bb, m] += ww
    return w


@functools.lru_cache(maxsize=64)
def hz_to_bin(freq_hz: float, freq_resolution: float, n_bins: int) -> int:
    """Rounded, clamped Hz->bin conversion (tempogram.rs:279-289)."""
    if not np.isfinite(freq_hz) or freq_hz <= 0.0 or freq_resolution <= 0.0:
        return 0
    return int(np.clip(round(freq_hz / freq_resolution), 0, max(n_bins - 1, 0)))
