"""Fused Pallas TPU kernel for the BPM novelty reducer (OPT-IN).

STATUS: measured SLOWER than the XLA reducer end-to-end on v5e (68.3 vs
70.3 tracks/s/chip, 16-rep streams — BENCH_NOTES.md round 3): XLA already
fuses this chain tightly, and the pallas_call boundary (forced spec
materialization) plus HIGHEST-precision 128-column packed matmuls outweigh
the saved intermediate HBM streams. Disabled by default; enable with
STRATUM_FORCE_PALLAS_NOVELTY=1. Kept because the isolated-stage picture
(wins at hop 512) suggests the balance may flip on other TPU generations,
and as a worked example of the fused-reducer pattern.

The streamed BPM frontend (``features/period/novelty.py:make_bpm_reducer``,
mirroring ``novelty.rs``) turns each STFT chunk ``[B, C, K]`` into tiny
per-frame features: SuperFlux band sums (stride 1 and 2), band energies/HFC,
log-mel frames, and the onset spectral flux. As XLA ops this chain
materializes several full-chunk intermediates in HBM per scan step (log1p of
the extended chunk, the +-``sf_k`` frequency max filter via ``reduce_window``,
the rectified difference squares, the squared magnitudes, the per-frame
normalized copies for onset flux) — ~6 extra [C, K]-sized HBM streams per
pass, twice per track (hop-512 base + hop-256 multi-res).

This kernel computes ALL reducer outputs in one VMEM pass per frame tile:
each tile is read from HBM once (with its 2-frame halo prebuilt by the XLA
caller); log1p, the shifted-max frequency filter, both stride diffs, and the
per-frame row maxima live only in VMEM; the band/mel reductions run as MXU
matmuls against packed ``[KP, 128]`` projections whose column ranges separate
the outputs.

Output packing (one ``[B, C, 128]`` array; see ``unpack_features``):

  cols [0, nb)          sqrt band SuperFlux sums, stride 1
  cols [nb, 2nb)        sqrt band SuperFlux sums, stride 2
  cols [2nb, 4nb)       (energy, hfc) interleaved per band
  cols [4nb, 4nb+nm)    log-mel frames
  col  [4nb+nm]         onset spectral flux

Numerics: lanes ``K..KP`` are zero-padded and every magnitude is >= 0, so

* a CIRCULAR lane roll reproduces the reference's edge-CLAMPED frequency max
  filter exactly (wrapped-in values are zero-padding lanes, and max with 0
  never changes a max over non-negative data — novelty.rs:364-374);
* the band-clamped edge pools run full-width on band-masked copies (zeros
  outside the band) instead of narrow lane slices, which Mosaic cannot
  concatenate — identical windows, identical values;
* projection rows beyond K are zero, so the packed matmuls are exact.

Matmuls run at HIGHEST precision to match the XLA path's einsums.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPSILON = 1e-10
TILE = 256  # frames per grid cell
PCOLS = 128  # packed output columns


def _roll_max(x: jax.Array, radius: int) -> jax.Array:
    """Sliding max over [lane-radius, lane+radius] via circular rolls —
    exact edge clamping for non-negative data with zero-padded tail lanes
    (see module docstring)."""
    out = x
    for s in range(1, radius + 1):
        out = jnp.maximum(
            out, jnp.maximum(jnp.roll(x, -s, axis=1), jnp.roll(x, s, axis=1))
        )
    return out


def _build_projections(
    sf_mask: np.ndarray, ew: np.ndarray, mel_w, kp: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Zero-pad the XLA reducer's projection matrices to [kp, PCOLS] with
    disjoint column ranges so the matmul results accumulate into one packed
    buffer."""
    k, nb = sf_mask.shape
    nm = 0 if mel_w is None else mel_w.shape[1]
    assert 4 * nb + nm + 1 <= PCOLS, "packed feature columns exceed 128"

    def pad(m, col0):
        out = np.zeros((kp, PCOLS), np.float32)
        out[: m.shape[0], col0 : col0 + m.shape[1]] = m
        return out

    p_sf1 = pad(sf_mask, 0)
    p_sf2 = pad(sf_mask, nb)
    p_eh = pad(ew, 2 * nb)
    p_mel = (
        pad(mel_w, 4 * nb) if mel_w is not None
        else np.zeros((kp, PCOLS), np.float32)
    )
    return p_sf1, p_sf2, p_eh, p_mel


def _make_kernel(nb: int, nm: int, sf_k: int, edge_bands, emit_stride2: bool,
                 emit_onset: bool, use_mel: bool, kp: int):
    """Kernel body with all configuration static. ``edge_bands`` is a tuple
    of (band_col, start, end) for bands needing clamped edge pools."""
    onset_col = 4 * nb + nm

    def kernel(spec_ref, halo_ref, p1_ref, p2_ref, p3_ref, p4_ref, out_ref):
        # spec_ref [1, TILE, KP]; halo_ref [1, 1, 2, KP] = the two frames
        # preceding the tile. Sublane concat builds the extended tile in
        # VMEM (Mosaic supports sublane concatenation; the lane-axis one it
        # rejects is avoided via jnp.roll — see _roll_max).
        spec = spec_ref[0]
        x_ext = jnp.concatenate([halo_ref[0, 0], spec], axis=0)
        log_ext = jnp.log1p(jnp.maximum(x_ext, 0.0))
        log_cur = log_ext[2:, :]
        log_prev = log_ext[1:-1, :]
        log_prev2 = log_ext[:-2, :]

        # frequency max filter of every prev frame once; stride-1 uses rows
        # 1..T+1, stride-2 rows 0..T (same sharing as the XLA reducer)
        pm_ext = _roll_max(log_ext[:-1, :], sf_k)
        d1 = jnp.maximum(log_cur - pm_ext[1:, :], 0.0)
        d1 = d1 * d1
        if emit_stride2:
            d2 = jnp.maximum(log_cur - pm_ext[:-1, :], 0.0)
            d2 = d2 * d2
        x2 = spec * spec

        # Pallas dots support only DEFAULT/HIGHEST; HIGHEST matches the XLA
        # einsums' f32 products (the parity tests pin <1e-5 relative)
        hiprec = jax.lax.Precision.HIGHEST
        acc = jnp.dot(d1, p1_ref[:, :], precision=hiprec,
                      preferred_element_type=jnp.float32)
        if emit_stride2:
            acc = acc + jnp.dot(d2, p2_ref[:, :], precision=hiprec,
                                preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(x2, p3_ref[:, :], precision=hiprec,
                            preferred_element_type=jnp.float32)
        if use_mel:
            acc = acc + jnp.dot(log_cur, p4_ref[:, :], precision=hiprec,
                                preferred_element_type=jnp.float32)

        # band-clamped SuperFlux edge pools, full-width with band masks
        # (novelty.py:_band_sf_sums edge runs; window equality argued in the
        # module docstring)
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, PCOLS), 1)
        k_lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, kp), 1)
        for band_col, s, e in edge_bands:
            band_m = (k_lane >= s) & (k_lane < e)
            if e - s <= 2 * sf_k:
                edge_m = band_m
            else:
                edge_m = band_m & (
                    (k_lane < s + sf_k) | (k_lane >= e - sf_k)
                )
            pmb1 = _roll_max(jnp.where(band_m, log_prev, 0.0), sf_k)
            dd1 = jnp.maximum(log_cur - pmb1, 0.0)
            extra1 = jnp.sum(jnp.where(edge_m, dd1 * dd1, 0.0), axis=1)
            acc = acc + jnp.where(out_lane == band_col, extra1[:, None], 0.0)
            if emit_stride2:
                pmb2 = _roll_max(jnp.where(band_m, log_prev2, 0.0), sf_k)
                dd2 = jnp.maximum(log_cur - pmb2, 0.0)
                extra2 = jnp.sum(jnp.where(edge_m, dd2 * dd2, 0.0), axis=1)
                acc = acc + jnp.where(
                    out_lane == nb + band_col, extra2[:, None], 0.0
                )

        # SuperFlux columns get the final sqrt; others stay raw sums
        acc = jnp.where(out_lane < 2 * nb, jnp.sqrt(jnp.maximum(acc, 0.0)), acc)

        if emit_onset:
            # per-frame max-normalized HWR L2 flux (spectral_flux.rs:116-157)
            ext_max = jnp.max(x_ext, axis=1, keepdims=True)  # [TILE+2, 1]
            cur_max = ext_max[2:, :]
            prev_max = ext_max[1:-1, :]
            cur_n = jnp.where(
                cur_max > EPSILON, spec / jnp.maximum(cur_max, EPSILON), 0.0
            )
            prev_n = jnp.where(
                prev_max > EPSILON,
                x_ext[1:-1, :] / jnp.maximum(prev_max, EPSILON),
                0.0,
            )
            d = jnp.maximum(cur_n - prev_n, 0.0)
            osf = jnp.sqrt(jnp.sum(d * d, axis=1))
            acc = jnp.where(out_lane == onset_col, osf[:, None], acc)

        out_ref[0] = acc

    return kernel


def fused_novelty_features(
    spec: jax.Array,
    prev2: jax.Array,
    sf_mask: np.ndarray,
    ew: np.ndarray,
    mel_w,
    *,
    sf_k: int,
    edge_bands: tuple,
    emit_stride2: bool,
    emit_onset: bool,
    use_mel: bool,
    interpret: bool = False,
) -> jax.Array:
    """Packed per-frame features [B, C, PCOLS] for one STFT chunk.

    spec [B, C, K] f32 magnitudes (invalid frames zeroed); prev2 [B, 2, K]
    the two preceding frames; sf_mask [K, nb] / ew [K, 2nb] / mel_w [K, nm]
    are the XLA reducer's NUMPY projection constants. ``edge_bands`` is a
    tuple of (band_column, start_bin, end_bin) for the bands whose SuperFlux
    needs clamped edge pools. Call under jit (the pipeline always does).
    """
    b, c, k = spec.shape
    nb = sf_mask.shape[1]
    nm = 0 if mel_w is None else np.asarray(mel_w).shape[1]
    kp = -(-k // 128) * 128
    cp = -(-c // TILE) * TILE
    n_tiles = cp // TILE

    p1, p2, p3, p4 = _build_projections(
        np.asarray(sf_mask), np.asarray(ew),
        None if mel_w is None else np.asarray(mel_w), kp,
    )

    spec_p = jnp.pad(spec, ((0, 0), (0, cp - c), (0, kp - k)))
    prev2_p = jnp.pad(prev2, ((0, 0), (0, 0), (0, kp - k)))
    ext = jnp.concatenate([prev2_p, spec_p], axis=1)  # [B, cp+2, KP]
    # only the 2 halo rows per tile are copied (the tile body reads spec_p
    # directly — no duplicated full-chunk stream)
    halos = jnp.stack(
        [ext[:, i * TILE : i * TILE + 2] for i in range(n_tiles)], axis=1
    )  # [B, n_tiles, 2, KP]

    kern = _make_kernel(nb, nm, sf_k, edge_bands, emit_stride2, emit_onset,
                        use_mel, kp)
    out = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE, kp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, kp), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, PCOLS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, PCOLS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, PCOLS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, PCOLS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, PCOLS), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cp, PCOLS), jnp.float32),
        interpret=interpret,
    )(
        spec_p, halos,
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(p3), jnp.asarray(p4),
    )
    return out[:, :c]


def unpack_features(packed: jax.Array, nb: int, nm: int, emit_stride2: bool,
                    emit_onset: bool, use_mel: bool) -> dict:
    """Split the packed [B, C, PCOLS] kernel output into the reducer's
    output dict (same keys as make_bpm_reducer's XLA path)."""
    outs = {
        "superflux": packed[..., 0:nb],
        "energy": packed[..., 2 * nb : 4 * nb : 2],
        "hfc": packed[..., 2 * nb + 1 : 4 * nb : 2],
    }
    if emit_stride2:
        outs["superflux2"] = packed[..., nb : 2 * nb]
    if use_mel:
        outs["mel"] = packed[..., 4 * nb : 4 * nb + nm]
    if emit_onset:
        outs["onset_sflux"] = packed[..., 4 * nb + nm]
    return outs
