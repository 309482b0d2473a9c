"""Tempo-variation detection + Bayesian segment refinement (batched).

Mirrors reference ``beat_tracking/tempo_variation.rs`` and ``bayesian.rs``:

* Overlapping segments of clamp(total/4, 4..8) s with 50% hop over the beat
  list; per-segment beat-interval CV; variable iff CV > 0.15
  (tempo_variation.rs:47-52, 135-201).
* For variable segments, a sequential Bayesian tracker proposes BPMs
  ±5 @ 0.5 around its running estimate (clamped 60..180), scores each by the
  mean Gaussian log-likelihood (σ=50 ms) of segment-onset alignment to the
  candidate's beat grid anchored at the segment's first onset, and applies a
  change-magnitude confidence penalty (bayesian.rs:104-178, 183-254).
* Variable segments are re-tracked (HMM emissions at the refined BPM over the
  segment onsets); constant segments keep their original beats; the union —
  overlap duplicates included, exactly like the reference's extend+sort
  (mod.rs:163-219) — replaces the beat list when any segment was variable.

Fixed capacities: MAX_SEGMENTS segment slots, ``seg_beat_cap`` re-tracked
beats per segment. The whole thing is a ``lax.scan`` over segment slots with
the Bayesian BPM as the carried state.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .hmm import (
    BeatTensor,
    EMISSION_SIGMA,
    EMISSION_THRESHOLD,
    TIMING_TOLERANCE_S,
    nearest_onset_distance,
)

EPSILON = 1e-10
BIG = 1e9
MIN_SEGMENT_DURATION_S = 2.0
TEMPO_VARIATION_THRESHOLD = 0.15
PRIOR_SIGMA = 2.0
LIKELIHOOD_SIGMA = 0.05
N_CANDIDATES = 21  # ±5 BPM @ 0.5 steps
MAX_SEGMENTS = 48
SEG_ONSET_CAP = 512  # onsets per 4-8 s segment (64/s headroom; energy-flux
# dedup bounds the true rate at ~hop/2 spacing, consensus far lower)


def compact_sorted(times: jax.Array, valid: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Push invalid entries to the end (as BIG); values stay time-sorted.
    Returns (times, n_valid)."""
    t = jnp.sort(jnp.where(valid, times, BIG), axis=-1)
    return t, jnp.sum(valid, axis=-1)


def interval_stats_prefix(times: jax.Array, n: jax.Array):
    """Prefix sums over consecutive diffs for O(1) per-segment stats.
    Returns (csum_d, csum_d2) with leading zero, diffs beyond n-1 zeroed."""
    mb = times.shape[-1]
    d = times[:, 1:] - times[:, :-1]
    dmask = jnp.arange(mb - 1)[None, :] < (n - 1)[:, None]
    d = jnp.where(dmask, d, 0.0)
    z = jnp.zeros_like(d[:, :1])
    return (
        jnp.concatenate([z, jnp.cumsum(d, axis=-1)], axis=-1),
        jnp.concatenate([z, jnp.cumsum(d * d, axis=-1)], axis=-1),
    )


def refine_beats(
    beats: BeatTensor,
    nominal_bpm: jax.Array,
    bpm_confidence: jax.Array,
    onset_times: jax.Array,
    onset_valid: jax.Array,
    seg_beat_cap: int = 64,
    max_segments: int = MAX_SEGMENTS,
):
    """Full variation-detect + refine pass.

    Returns (final BeatTensor [B, MB + MAX_SEGMENTS*seg_beat_cap],
    has_variation [B] bool).
    """
    b, mb = beats.times.shape
    bt, n_beats = compact_sorted(beats.times, beats.valid)
    bconf = jnp.take_along_axis(
        jnp.where(beats.valid, beats.confidence, 0.0),
        jnp.argsort(jnp.where(beats.valid, beats.times, BIG), axis=-1),
        axis=-1,
    )
    ot, n_onsets = compact_sorted(onset_times, onset_valid)

    t0 = jnp.where(n_beats > 0, bt[:, 0], 0.0)
    tlast = jnp.take_along_axis(bt, jnp.maximum(n_beats - 1, 0)[:, None], axis=-1)[:, 0]
    tlast = jnp.where(n_beats > 0, tlast, 0.0)
    total = tlast - t0

    # early-return paths (tempo_variation.rs:96-131): <4 beats or <2 s total
    segmentable = (n_beats >= 4) & (total >= MIN_SEGMENT_DURATION_S)
    seg_dur = jnp.clip(total / 4.0, 4.0, 8.0)
    hop = seg_dur * 0.5

    csum_d, csum_d2 = interval_stats_prefix(bt, n_beats)

    # ---- carry-independent per-segment quantities, vectorized over S ----
    # (only the Bayesian BPM update is sequential; hoisting everything else
    # out of the scan cuts XLA compile time by an order of magnitude)
    S = max_segments
    K = ot.shape[-1]
    s_arr = jnp.arange(S, dtype=jnp.float32)
    start = t0[:, None] + s_arr[None, :] * hop[:, None]  # [B, S]
    end = jnp.minimum(start + seg_dur[:, None], tlast[:, None])
    exists = segmentable[:, None] & (start < tlast[:, None])

    ss = jax.vmap(jnp.searchsorted, (0, 0, None))
    i0 = ss(bt, start, "left")
    i1 = jnp.minimum(ss(bt, end, "right"), n_beats[:, None])
    cnt = i1 - i0
    n_int = jnp.maximum(cnt - 1, 0)
    hi_idx = jnp.maximum(i1 - 1, 0)
    ssum = jnp.take_along_axis(csum_d, hi_idx, axis=-1) - jnp.take_along_axis(csum_d, i0, axis=-1)
    ssum2 = jnp.take_along_axis(csum_d2, hi_idx, axis=-1) - jnp.take_along_axis(csum_d2, i0, axis=-1)
    nf = jnp.maximum(n_int, 1).astype(jnp.float32)
    mean = ssum / nf
    var = jnp.maximum(ssum2 / nf - mean * mean, 0.0)
    cv = jnp.where(mean > EPSILON, jnp.sqrt(var) / mean, 0.0)
    seg_ok = exists & (cnt >= 3) & (n_int > 0)
    is_var_all = seg_ok & (cv > TEMPO_VARIATION_THRESHOLD)  # [B, S]

    j0 = ss(ot, start, "left")
    j1 = jnp.minimum(ss(ot, end, "right"), n_onsets[:, None])
    has_onsets_all = (j1 - j0) >= 1
    # compact each segment's onsets to a fixed small window so the scan body
    # works on [B, SEG_ONSET_CAP] instead of the full onset capacity
    cap_idx = j0[..., None] + jnp.arange(SEG_ONSET_CAP)[None, None, :]  # [B,S,cap]
    seg_ovalid_all = cap_idx < j1[..., None]
    seg_ot_all = jnp.take_along_axis(
        ot[:, None, :].repeat(S, axis=1), jnp.minimum(cap_idx, K - 1), axis=-1
    )  # [B, S, cap]
    seg_first_onset_all = jnp.take_along_axis(ot, jnp.minimum(j0, K - 1), axis=-1)
    seg_last_onset_all = jnp.take_along_axis(ot, jnp.maximum(j1 - 1, 0), axis=-1)

    # constant-segment beats: earliest seg_beat_cap original beats per segment
    beat_idx = jnp.arange(mb)
    in_seg_all = (beat_idx[None, None, :] >= i0[..., None]) & (
        beat_idx[None, None, :] < i1[..., None]
    )  # [B, S, mb]
    key_all = jnp.where(in_seg_all, bt[:, None, :], BIG)
    if mb < seg_beat_cap:
        pad_w = ((0, 0), (0, 0), (0, seg_beat_cap - mb))
        key_all = jnp.pad(key_all, pad_w, constant_values=BIG)
        bt_b = jnp.pad(bt, ((0, 0), (0, seg_beat_cap - mb)))
        bconf_b = jnp.pad(bconf, ((0, 0), (0, seg_beat_cap - mb)))
        in_seg_p = jnp.pad(in_seg_all, pad_w)
    else:
        bt_b, bconf_b, in_seg_p = bt, bconf, in_seg_all
    order_c = jnp.argsort(key_all, axis=-1)[..., :seg_beat_cap]  # [B, S, cap]
    times_c_all = jnp.take_along_axis(bt_b[:, None, :], order_c, axis=-1)
    conf_c_all = jnp.take_along_axis(bconf_b[:, None, :], order_c, axis=-1)
    valid_c_all = jnp.take_along_axis(in_seg_p, order_c, axis=-1)
    times_c_all = jnp.where(valid_c_all, times_c_all, 0.0)

    fidx = jnp.arange(seg_beat_cap, dtype=jnp.float32)

    def bayes_step(carry, s):
        # Only the Bayesian BPM chain is sequential (candidates window around
        # the running estimate, bayesian.rs:183-195); everything downstream of
        # the refined BPM is re-tracked vectorized over segments AFTER the
        # scan. Keeping the scan body to the [B, C, cap] likelihood only makes
        # each of the S steps ~tiny instead of carrying the [B, cap, slots]
        # claim masks through the loop.
        cur_bpm, _cur_conf = carry
        is_var = is_var_all[:, s]
        has_onsets = has_onsets_all[:, s]
        seg_ot = seg_ot_all[:, s]  # [B, cap]
        omask = seg_ovalid_all[:, s]
        seg_first_onset = seg_first_onset_all[:, s]

        min_c = jnp.maximum(cur_bpm - 5.0, 60.0)
        max_c = jnp.minimum(cur_bpm + 5.0, 180.0)
        cand = min_c[:, None] + 0.5 * jnp.arange(N_CANDIDATES, dtype=jnp.float32)[None, :]
        cand_ok = cand <= max_c[:, None] + 1e-6

        interval = 60.0 / jnp.maximum(cand, EPSILON)  # [B, C]
        rel = seg_ot[:, None, :] - seg_first_onset[:, None, None]  # [B, 1, cap]
        bi = jnp.round(rel / interval[:, :, None])
        d = jnp.abs(rel - bi * interval[:, :, None])  # [B, C, K]
        logp = -(d * d) / (2.0 * LIKELIHOOD_SIGMA * LIKELIHOOD_SIGMA)
        cnt_o = jnp.maximum(jnp.sum(omask, axis=-1), 1).astype(jnp.float32)
        avg_logp = jnp.sum(jnp.where(omask[:, None, :], logp, 0.0), axis=-1) / cnt_o[:, None]
        lik = jnp.where(cand_ok, jnp.exp(avg_logp), -1.0)  # [B, C]
        best_c = jnp.argmax(lik, axis=-1)
        best_lik = jnp.take_along_axis(lik, best_c[:, None], axis=-1)[:, 0]
        best_bpm = jnp.take_along_axis(cand, best_c[:, None], axis=-1)[:, 0]
        take = best_lik > 0.0
        best_bpm = jnp.where(take, best_bpm, cur_bpm)
        best_lik = jnp.maximum(best_lik, 0.0)

        change = jnp.abs(best_bpm - cur_bpm)
        penalty = jnp.where(change < 1.0, 1.0, jnp.where(change < 3.0, 0.8, 0.5))
        new_conf = jnp.minimum(best_lik * penalty, 1.0)

        do_update = is_var & has_onsets
        cur_bpm = jnp.where(do_update, best_bpm, cur_bpm)
        # single stacked output (separate outputs fission the scan into one
        # cloned loop per output)
        return (cur_bpm, new_conf), jnp.stack([cur_bpm, new_conf], axis=-1)

    init = (nominal_bpm, bpm_confidence)
    has_variation = jnp.any(is_var_all, axis=-1)  # [B]

    # The reference only runs Bayesian refinement when variation was detected
    # (mod.rs:162-219). Variation detection is fully hoisted above, so the
    # whole refine path sits behind a batch-level lax.cond: for the common
    # all-constant-tempo batch it costs nothing at runtime.
    def run_refine(_):
        (_, _), out = jax.lax.scan(bayes_step, init, jnp.arange(max_segments))
        seg_bpm = jnp.moveaxis(out[..., 0], 0, 1)  # [B, S] refined BPM chain

        # ---- variable-segment re-tracking, vectorized over ALL segments ----
        seg_interval = 60.0 / jnp.maximum(seg_bpm, EPSILON)  # [B, S]
        times_v = (
            seg_first_onset_all[..., None]
            + fidx[None, None, :] * seg_interval[..., None]
        )  # [B, S, cap_b]
        nfr = jnp.ceil(
            jnp.maximum(seg_last_onset_all - seg_first_onset_all, 0.0) / seg_interval
        ).astype(jnp.int32) + 1
        nfr = jnp.minimum(nfr, seg_beat_cap)
        fvalid = fidx[None, None, :] < nfr[..., None]

        # nearest segment onset per grid slot, onset-centric: each onset
        # claims its floor/ceil grid slots (exact for any distance < one
        # beat interval; larger distances give emission ~0 either way).
        rel_o = seg_ot_all - seg_first_onset_all[..., None]  # [B, S, cap]
        bi_f = jnp.floor(rel_o / seg_interval[..., None])
        d_f = jnp.abs(rel_o - bi_f * seg_interval[..., None])
        d_c = jnp.abs((bi_f + 1.0) * seg_interval[..., None] - rel_o)
        slots = jnp.arange(seg_beat_cap, dtype=jnp.float32)

        def claim_min(bi, dd):
            m = (bi[..., None] == slots) & seg_ovalid_all[..., None]
            return jnp.min(jnp.where(m, dd[..., None], BIG), axis=2)  # [B,S,slots]

        dist = jnp.minimum(claim_min(bi_f, d_f), claim_min(bi_f + 1.0, d_c))
        em = jnp.exp(-(dist * dist) / (2.0 * EMISSION_SIGMA * EMISSION_SIGMA))
        is_beat_v = fvalid & (em > EMISSION_THRESHOLD) & has_onsets_all[..., None]
        align = jnp.where(dist < TIMING_TOLERANCE_S, 1.0 - dist / TIMING_TOLERANCE_S, 0.0)
        conf_v = jnp.minimum(0.7 * em + 0.3 * align, 1.0)

        use_var = is_var_all[..., None]  # [B, S, 1]
        seg_times = jnp.where(use_var, jnp.where(is_beat_v, times_v, 0.0), times_c_all)
        seg_conf = jnp.where(
            use_var, jnp.where(is_beat_v, conf_v, 0.0),
            jnp.where(valid_c_all, conf_c_all, 0.0),
        )
        seg_valid = jnp.where(use_var, is_beat_v, valid_c_all) & seg_ok[..., None]
        return jnp.concatenate(
            [seg_times, seg_conf, seg_valid.astype(jnp.float32)], axis=-1
        )  # [B, S, 3*cap_b]

    def skip_refine(_):
        return jnp.zeros((b, max_segments, 3 * seg_beat_cap), jnp.float32)

    packed = jax.lax.cond(jnp.any(has_variation), run_refine, skip_refine, 0)
    st = packed[..., :seg_beat_cap]
    sc = packed[..., seg_beat_cap : 2 * seg_beat_cap]
    sv = packed[..., 2 * seg_beat_cap :] > 0.5

    # [B, S, C] -> [B, S*C]
    def flat(x):
        return x.reshape(b, -1)

    seg_times, seg_conf, seg_valid = flat(st), flat(sc), flat(sv)

    # replacement only when variation was detected AND the merged list is
    # non-empty (mod.rs:210-218)
    merged_nonempty = jnp.any(seg_valid, axis=-1)
    use_refined = has_variation & merged_nonempty

    cap = max(seg_times.shape[-1], mb)
    spad = cap - seg_times.shape[-1]
    seg_times = jnp.pad(seg_times, ((0, 0), (0, spad)))
    seg_conf = jnp.pad(seg_conf, ((0, 0), (0, spad)))
    seg_valid = jnp.pad(seg_valid, ((0, 0), (0, spad)))
    pad = cap - mb
    orig_times = jnp.pad(jnp.where(beats.valid, beats.times, 0.0), ((0, 0), (0, pad)))
    orig_conf = jnp.pad(jnp.where(beats.valid, beats.confidence, 0.0), ((0, 0), (0, pad)))
    orig_valid = jnp.pad(beats.valid, ((0, 0), (0, pad)))

    times = jnp.where(use_refined[:, None], seg_times, orig_times)
    conf = jnp.where(use_refined[:, None], seg_conf, orig_conf)
    valid = jnp.where(use_refined[:, None], seg_valid, orig_valid)

    # time-sort (duplicates preserved, like the reference's extend+sort)
    order = jnp.argsort(jnp.where(valid, times, BIG), axis=-1)
    final = BeatTensor(
        times=jnp.where(jnp.take_along_axis(valid, order, axis=-1),
                        jnp.take_along_axis(times, order, axis=-1), 0.0),
        confidence=jnp.take_along_axis(conf, order, axis=-1),
        valid=jnp.take_along_axis(valid, order, axis=-1),
    )
    return final, has_variation
