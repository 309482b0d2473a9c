"""Tempogram BPM estimator: dual-method fusion + metrical-level selection.

Mirror of reference ``features/period/tempogram.rs:255-775``:

1. Per novelty variant (full band, low/mid/high bands, log-mel), compute the
   FFT tempogram and the autocorrelation tempogram.
2. Seed candidates from the top-8 entries of each method/variant plus the
   primary picks, fold by the metrical factors {1, 1/2, 2, 1/3, 3, 2/3, 3/2},
   dedup within 0.75 BPM.
3. Score each candidate: 0.55*autocorr_norm + 0.45*fft_norm (normalized
   nearest-neighbor lookups, weighted across scoring variants), multi-band
   consensus bonus, mild range priors (>180: x0.80, <60: x0.90).
4. Tempo-octave fold-down gate for >180 BPM winners unless the high tempo is
   >2x stronger in BOTH methods.
5. Confidence = score separation of the deduped top two; method agreement =
   count of methods whose primary pick is within 2 BPM.

Everything is fixed-capacity tensor math over the batch: candidate slots are
masked instead of Vec-resized, and the single sequential piece (the greedy
0.75-BPM dedup) is a tiny lax.scan.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...config import AnalysisConfig
from ...ops import masked
from . import tempogram_autocorr as tac
from . import tempogram_fft as tft

EPSILON = 1e-10
FOLD_FACTORS = (1.0, 0.5, 2.0, 1.0 / 3.0, 3.0, 2.0 / 3.0, 1.5)
PREFERRED_MIN = 60.0
PREFERRED_MAX = 180.0
SEEDS_PER_METHOD = 8
DEDUP_TOL = 0.75


@dataclass
class TempogramVariant:
    """One novelty representation's pair of tempograms."""

    name: str
    weight: float
    fft_power: jax.Array  # [B, NB] in-range power bins
    fft_bpms: np.ndarray  # [NB]
    ac_strength: jax.Array  # [B, n_bpm]
    ac_grid: np.ndarray  # [n_bpm]
    max_fft: jax.Array  # [B]
    max_ac: jax.Array  # [B]


def compute_variants(
    curves: Dict[str, jax.Array],
    nov_mask: jax.Array,
    n_valid: jax.Array,
    frame_rate: float,
    cfg: AnalysisConfig,
    fft_size: int,
) -> List[TempogramVariant]:
    """Run both tempograms for every novelty variant present in ``curves``."""
    weights = {
        "full": cfg.tempogram_band_w_full if cfg.enable_tempogram_band_fusion else 1.0,
        "low": cfg.tempogram_band_w_low,
        "mid": cfg.tempogram_band_w_mid,
        "high": cfg.tempogram_band_w_high,
        "mel": cfg.tempogram_mel_weight,
    }
    variants = []
    for name in ("full", "low", "mid", "high", "mel"):
        if name not in curves:
            continue
        w = weights[name]
        if name != "full" and not (np.isfinite(w) and w > 0.0):
            continue
        nov = curves[name]
        power, bpms = tft.fft_tempogram_power(
            nov, nov_mask, n_valid, frame_rate, cfg.min_bpm, cfg.max_bpm, fft_size
        )
        strength, grid = tac.autocorr_tempogram(
            nov, nov_mask, n_valid, frame_rate, cfg.min_bpm, cfg.max_bpm, cfg.bpm_resolution
        )
        variants.append(
            TempogramVariant(
                name=name,
                weight=w,
                fft_power=power,
                fft_bpms=bpms,
                ac_strength=strength,
                ac_grid=grid,
                max_fft=jnp.maximum(jnp.max(power, axis=-1), 1e-12),
                max_ac=jnp.maximum(jnp.max(strength, axis=-1), 1e-12),
            )
        )
    return variants


def estimate_bpm_tempogram(
    variants: List[TempogramVariant],
    cfg: AnalysisConfig,
    frame_rate: float,
    fft_size: int,
    top_n: int,
) -> Dict[str, jax.Array]:
    """Score candidates and select the BPM. Returns a dict of arrays:

    bpm [B], confidence [B], method_agreement [B],
    cand_bpm/score/fft_norm/ac_norm/valid/selected [B, top_n] (score-ordered),
    fft_primary_bpm [B], ac_primary_bpm [B].
    """
    assert variants, "need at least the full-band variant"
    full = variants[0]
    assert full.name == "full"
    b = full.fft_power.shape[0]
    min_bpm, max_bpm = cfg.min_bpm, cfg.max_bpm
    res = cfg.bpm_resolution

    use_aux = (
        cfg.enable_tempogram_band_fusion
        or cfg.enable_tempogram_mel_novelty
        or cfg.tempogram_band_consensus_bonus > 0.0
    )
    seed_only = cfg.tempogram_band_seed_only
    score_variants = [full] if (seed_only or not use_aux) else variants

    # --- primaries (tempogram.rs:339-340, 501-506) ---
    fft_primary_idx = jnp.argmax(full.fft_power, axis=-1)
    fft_primary_bpm = jnp.asarray(full.fft_bpms)[fft_primary_idx]
    ac_primary_idx = jnp.argmax(full.ac_strength, axis=-1)
    ac_primary_bpm = jnp.asarray(full.ac_grid)[ac_primary_idx]

    # --- seed candidates (tempogram.rs:537-556) ---
    # FFT seeds are restricted to local maxima: with the zero-padded fine BPM
    # grid (tempogram_fft.padded_fft_size) the raw top-8 bins would all sit on
    # one peak's lobe and dedup into a single candidate, losing the seed
    # diversity the reference gets for free from its coarse grid.
    seeds = []
    for v in variants:
        p = v.fft_power
        left = jnp.concatenate([p[:, :1], p[:, :-1]], axis=-1)
        right = jnp.concatenate([p[:, 1:], p[:, -1:]], axis=-1)
        peaks = jnp.where((p >= left) & (p >= right), p, 0.0)
        fvals, fidx = jax.lax.top_k(peaks, min(SEEDS_PER_METHOD, p.shape[-1]))
        seeds.append(jnp.asarray(v.fft_bpms)[fidx])
        avals, aidx = jax.lax.top_k(v.ac_strength, min(SEEDS_PER_METHOD, v.ac_strength.shape[-1]))
        seeds.append(jnp.asarray(v.ac_grid)[aidx])
    seeds.append(fft_primary_bpm[:, None])
    seeds.append(ac_primary_bpm[:, None])
    seed_bpms = jnp.concatenate(seeds, axis=-1)  # [B, S]

    # fold by metrical factors and range-filter
    cands = (seed_bpms[:, :, None] * jnp.asarray(FOLD_FACTORS)).reshape(b, -1)
    cvalid = (cands >= min_bpm) & (cands <= max_bpm) & jnp.isfinite(cands)

    # sort ascending, dedup within 0.75 BPM (tempogram.rs:561-570)
    sort_key = jnp.where(cvalid, cands, jnp.inf)
    order = jnp.argsort(sort_key, axis=-1)
    cands = jnp.take_along_axis(cands, order, axis=-1)
    cvalid = jnp.take_along_axis(cvalid, order, axis=-1)
    keep = masked.greedy_dedup_sorted(cands, cvalid, DEDUP_TOL)
    cvalid = cvalid & keep

    # --- score (tempogram.rs:586-653) ---
    w_sum = max(sum(max(v.weight, 0.0) for v in score_variants), 1e-6)
    fft_acc = jnp.zeros_like(cands)
    ac_acc = jnp.zeros_like(cands)
    ac_tol = max(res, 0.5)
    for v in score_variants:
        if v.weight <= 0.0:
            continue
        fv = tft.fft_lookup_nearest(v.fft_power, v.fft_bpms, cands, DEDUP_TOL, frame_rate, fft_size)
        av = tac.ac_lookup_nearest(v.ac_strength, v.ac_grid, cands, ac_tol)
        fft_acc = fft_acc + v.weight * jnp.clip(fv / v.max_fft[:, None], 0.0, 1.0)
        ac_acc = ac_acc + v.weight * jnp.clip(av / v.max_ac[:, None], 0.0, 1.0)
    fft_norm = jnp.clip(fft_acc / w_sum, 0.0, 1.0)
    ac_norm = jnp.clip(ac_acc / w_sum, 0.0, 1.0)
    score = 0.55 * ac_norm + 0.45 * fft_norm

    # band-consensus bonus (tempogram.rs:615-638)
    consensus_bonus = max(cfg.tempogram_band_consensus_bonus, 0.0)
    if consensus_bonus > 0.0 and (cfg.enable_tempogram_band_fusion or cfg.enable_tempogram_mel_novelty):
        support_threshold = float(np.clip(cfg.tempogram_band_support_threshold, 0.0, 1.0))
        support_bands = jnp.zeros_like(cands, dtype=jnp.int32)
        for v in variants:
            if v.name == "full":
                continue
            sf = jnp.clip(
                tft.fft_lookup_nearest(v.fft_power, v.fft_bpms, cands, DEDUP_TOL, frame_rate, fft_size)
                / v.max_fft[:, None],
                0.0,
                1.0,
            )
            sa = jnp.clip(
                tac.ac_lookup_nearest(v.ac_strength, v.ac_grid, cands, ac_tol)
                / v.max_ac[:, None],
                0.0,
                1.0,
            )
            support_bands = support_bands + (jnp.maximum(sf, sa) >= support_threshold)
        boost = jnp.where(
            support_bands >= 2,
            1.0 + consensus_bonus * (support_bands.astype(jnp.float32) - 1.0),
            1.0,
        )
        score = score * boost

    # mild range priors (tempogram.rs:641-645)
    score = jnp.where(cands > PREFERRED_MAX, score * 0.80, score)
    score = jnp.where(cands < PREFERRED_MIN, score * 0.90, score)

    masked_score = jnp.where(cvalid, score, -jnp.inf)
    srt = jnp.argsort(-masked_score, axis=-1)
    best_idx = srt[:, 0]
    second_idx = srt[:, 1]
    take = lambda arr, idx: jnp.take_along_axis(arr, idx[:, None], axis=-1)[:, 0]
    best_bpm = take(cands, best_idx)
    best_score = take(score, best_idx)
    best_fft = take(fft_norm, best_idx)
    best_ac = take(ac_norm, best_idx)
    second_score = jnp.where(
        jnp.take_along_axis(cvalid, second_idx[:, None], axis=-1)[:, 0],
        take(score, second_idx),
        0.0,
    )

    # --- tempo-octave fold-down gate (tempogram.rs:669-699) ---
    folded = best_bpm / 2.0
    within = cvalid & (jnp.abs(cands - folded[:, None]) < DEDUP_TOL)
    fold_exists = jnp.any(within, axis=-1)
    fold_scores = jnp.where(within, score, -jnp.inf)
    fold_idx = jnp.argmax(fold_scores, axis=-1)
    f_bpm = take(cands, fold_idx)
    f_score = take(score, fold_idx)
    f_fft = take(fft_norm, fold_idx)
    f_ac = take(ac_norm, fold_idx)
    eps = 1e-6
    ac_ratio = (best_ac + eps) / (f_ac + eps)
    fft_ratio = (best_fft + eps) / (f_fft + eps)
    do_fold = (
        (best_bpm > PREFERRED_MAX)
        & (folded >= min_bpm)
        & (folded <= max_bpm)
        & fold_exists
        & ~((ac_ratio > 2.0) & (fft_ratio > 2.0))
    )
    final_bpm = jnp.where(do_fold, f_bpm, best_bpm)
    final_score = jnp.where(do_fold, f_score, best_score)
    final_fft = jnp.where(do_fold, f_fft, best_fft)
    final_ac = jnp.where(do_fold, f_ac, best_ac)

    confidence = jnp.where(
        final_score > 1e-12,
        jnp.clip((final_score - second_score) / jnp.maximum(final_score, 1e-12), 0.0, 1.0),
        0.0,
    )

    agreement = (
        ((fft_primary_bpm > 0.0) & (jnp.abs(fft_primary_bpm - final_bpm) < 2.0)).astype(jnp.int32)
        + ((ac_primary_bpm > 0.0) & (jnp.abs(ac_primary_bpm - final_bpm) < 2.0)).astype(jnp.int32)
    )

    # --- score-ordered candidate list for diagnostics / multi-res ---
    k = min(top_n, cands.shape[-1])
    cand_bpm = jnp.take_along_axis(cands, srt[:, :k], axis=-1)
    cand_score = jnp.take_along_axis(score, srt[:, :k], axis=-1)
    cand_fft = jnp.take_along_axis(fft_norm, srt[:, :k], axis=-1)
    cand_ac = jnp.take_along_axis(ac_norm, srt[:, :k], axis=-1)
    cand_valid = jnp.take_along_axis(cvalid, srt[:, :k], axis=-1)

    return {
        "bpm": final_bpm,
        "confidence": confidence,
        "method_agreement": agreement,
        "score": final_score,
        "fft_norm": final_fft,
        "ac_norm": final_ac,
        "fft_primary_bpm": fft_primary_bpm,
        "ac_primary_bpm": ac_primary_bpm,
        "cand_bpm": cand_bpm,
        "cand_score": cand_score,
        "cand_fft": cand_fft,
        "cand_ac": cand_ac,
        "cand_valid": cand_valid,
        "cand_selected": cand_valid & (jnp.abs(cand_bpm - final_bpm[:, None]) < DEDUP_TOL),
    }


def cand_lookup_nearest(
    cand_bpm: jax.Array, cand_score: jax.Array, cand_valid: jax.Array, query: jax.Array, tol: float
) -> jax.Array:
    """lookup_nearest over a candidate list (multi_resolution.rs:282-293):
    score of the nearest candidate within ``tol`` of the query, else 0.

    cand_* are [B, S]; query is [B, ...]; result matches query's shape.
    """
    q = query.reshape(query.shape[0], -1)  # [B, Q]
    d = jnp.abs(cand_bpm[:, None, :] - q[:, :, None])  # [B, Q, S]
    d = jnp.where(cand_valid[:, None, :], d, jnp.inf)
    nearest = jnp.argmin(d, axis=-1)
    dmin = jnp.take_along_axis(d, nearest[..., None], axis=-1)[..., 0]
    vals = jnp.take_along_axis(
        jnp.broadcast_to(cand_score[:, None, :], d.shape), nearest[..., None], axis=-1
    )[..., 0]
    out = jnp.where(dmin <= tol, vals, 0.0)
    return out.reshape(query.shape)
