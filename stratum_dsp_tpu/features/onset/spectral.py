"""Spectral-flux and HFC onset detection from streamed per-frame features.

The BPM reducer (``features/period/novelty.py``) already emits the per-frame
curves these detectors need — ``onset_sflux`` (per-frame-max-normalized HWR L2
spectral flux, spectral_flux.rs:116-157) and full-band HFC (hfc.rs:127-136) —
so onset detection is pure curve post-processing: percentile threshold
(sorted[floor(n*pct)]) + local-max peak pick + frame->sample conversion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import masked
from .peaks import peak_mask_1d, peaks_to_positions


def flux_onsets_from_curve(
    flux: jax.Array,
    n_valid: jax.Array,
    threshold_percentile: float,
    hop: int,
    lengths: jax.Array,
    max_onsets: int,
):
    """Onsets from a flux curve [B, N] where flux[i] = transition i -> i+1.

    Returns (positions [B, K] int32 samples, valid [B, K]). Peak at flux index
    i marks frame i+1; sample position = (i+1)*hop filtered to < length
    (lib.rs:181-186 ``to_samples``).
    """
    n = flux.shape[-1]
    fvalid = masked.length_mask(n_valid, n)
    flux = jnp.where(fvalid, flux, 0.0)
    thr = masked.masked_percentile_value(flux, fvalid, threshold_percentile)
    # rows with zero valid entries must yield nothing
    thr = jnp.where(n_valid > 0, thr, jnp.inf)
    peaks = peak_mask_1d(flux, fvalid, thr)
    onset_samples = (jnp.arange(n, dtype=jnp.int32) + 1) * hop
    peaks = peaks & (onset_samples[None, :] < lengths[:, None])
    pos, valid = peaks_to_positions(peaks, onset_samples, max_onsets)
    return jnp.where(valid, pos, 0), valid


def hfc_flux(hfc_values: jax.Array, n_frames: jax.Array) -> tuple[jax.Array, jax.Array]:
    """HWR first difference of per-frame HFC (hfc.rs:148-157).

    ``hfc_values`` is [B, F]; returns (flux [B, F-1], n_valid [B]).
    """
    flux = jnp.maximum(hfc_values[:, 1:] - hfc_values[:, :-1], 0.0)
    return flux, jnp.maximum(n_frames - 1, 0)
