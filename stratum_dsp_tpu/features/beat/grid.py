"""Beat-grid assembly: HMM track -> variation refine -> time signature ->
downbeats -> stability.

Mirror of reference ``beat_tracking/mod.rs:108-485`` (``generate_beat_grid``).
All stages batched over fixed-capacity beat tensors.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import hmm, time_signature as ts
from .variation import BIG, compact_sorted, refine_beats

EPSILON = 1e-10


class BeatGridTensor(NamedTuple):
    """Device-side beat grid for a batch."""

    beat_times: jax.Array  # [B, N] seconds, compacted ascending
    beat_valid: jax.Array  # [B, N]
    downbeat_times: jax.Array  # [B, N]
    downbeat_valid: jax.Array  # [B, N]
    stability: jax.Array  # [B]
    time_signature: jax.Array  # [B] int32 (0=4/4, 1=3/4, 2=6/8)
    time_signature_confidence: jax.Array  # [B]
    has_tempo_variation: jax.Array  # [B] bool
    ok: jax.Array  # [B] bool — False mirrors the reference's error returns


def detect_downbeats(
    times: jax.Array, n_beats: jax.Array, bpm: jax.Array, sig_index: jax.Array
):
    """Greedy downbeat marking (mod.rs:363-404): first beat is a downbeat;
    each later beat is one if within ±10% of one bar after the last downbeat.
    ``times`` compacted ascending. Returns a boolean mask over slots."""
    beats_per_bar = jnp.asarray(ts.BEATS_PER_BAR)[sig_index]
    bar = (60.0 / jnp.maximum(bpm, EPSILON)) * beats_per_bar
    tol = bar * 0.1
    mb = times.shape[-1]
    slot_valid = jnp.arange(mb)[None, :] < n_beats[:, None]

    if jax.default_backend() == "tpu":
        from ...ops.downbeats_pallas import downbeat_mask

        return downbeat_mask(times, n_beats, bar)

    def step(carry, inp):
        last_db, any_db = carry
        t, ok = inp
        first = ok & ~any_db
        hit = ok & any_db & (jnp.abs(t - (last_db + bar)) <= tol)
        is_db = first | hit
        last_db = jnp.where(is_db, t, last_db)
        any_db = any_db | is_db
        return (last_db, any_db), is_db

    init = (jnp.zeros_like(bpm), jnp.zeros_like(bpm, dtype=bool))
    _, db = jax.lax.scan(
        step, init, (jnp.moveaxis(times, 1, 0), jnp.moveaxis(slot_valid, 1, 0)),
        unroll=16,
    )
    return jnp.moveaxis(db, 0, 1)


def grid_stability(times: jax.Array, n_beats: jax.Array):
    """1/(1+CV) over positive beat intervals (mod.rs:425-485); < 2 beats -> 0."""
    v, m = ts.positive_intervals(times, n_beats)
    mf = jnp.maximum(m, 1).astype(jnp.float32)
    imask = jnp.arange(v.shape[-1])[None, :] < m[:, None]
    mean = jnp.sum(jnp.where(imask, v, 0.0), axis=-1) / mf
    var = jnp.sum(jnp.where(imask, (v - mean[:, None]) ** 2, 0.0), axis=-1) / mf
    cv = jnp.sqrt(var) / jnp.maximum(mean, EPSILON)
    stab = 1.0 / (1.0 + cv)
    return jnp.where((n_beats >= 2) & (m >= 1) & (mean > 1e-10), stab, 0.0)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def generate_beat_grid(
    bpm: jax.Array,
    bpm_confidence: jax.Array,
    onset_times: jax.Array,
    onset_valid: jax.Array,
    max_beats: int = 1024,
    seg_beat_cap: int = 64,
    max_segments: int = 48,
) -> BeatGridTensor:
    """Full grid generation for a batch (mod.rs:108-250).

    ``onset_times [B, K]`` seconds, sorted among valid entries. The segment
    capacity bounds cover a 3-min track: 48 half-overlapped 4-8 s segments
    and 64 beats per 8 s segment (>= 300 BPM headroom).
    """
    n_onsets = jnp.sum(onset_valid, axis=-1)
    ok = (bpm > 0.0) & (bpm <= 300.0) & (n_onsets >= 1)

    beats, _states = hmm.track_beats(bpm, onset_times, onset_valid, max_beats)
    any_beats = jnp.any(beats.valid, axis=-1)
    ok = ok & any_beats

    refined, has_variation = refine_beats(
        beats, bpm, bpm_confidence, onset_times, onset_valid, seg_beat_cap, max_segments
    )

    btimes, n_beats = compact_sorted(refined.times, refined.valid)
    slot_valid = jnp.arange(btimes.shape[-1])[None, :] < n_beats[:, None]
    btimes = jnp.where(slot_valid, btimes, 0.0)

    sig, sig_conf = ts.detect_time_signature(btimes, slot_valid, n_beats)
    db_mask = detect_downbeats(btimes, n_beats, bpm, sig)
    stability = grid_stability(btimes, n_beats)

    # compact downbeats to a prefix
    db_key = jnp.where(db_mask, btimes, BIG)
    db_sorted = jnp.sort(db_key, axis=-1)
    db_valid = db_sorted < BIG * 0.5
    db_times = jnp.where(db_valid, db_sorted, 0.0)

    return BeatGridTensor(
        beat_times=jnp.where(ok[:, None], btimes, 0.0),
        beat_valid=slot_valid & ok[:, None],
        downbeat_times=jnp.where(ok[:, None], db_times, 0.0),
        downbeat_valid=db_valid & ok[:, None],
        stability=jnp.where(ok, stability, 0.0),
        time_signature=sig,
        time_signature_confidence=sig_conf,
        has_tempo_variation=has_variation & ok,
        ok=ok,
    )
