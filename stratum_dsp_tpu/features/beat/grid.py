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


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def search_phase_anchor(
    bpm: jax.Array,
    onset_times: jax.Array,
    onset_valid: jax.Array,
    novelty: jax.Array,
    novelty_n: jax.Array,
    frame_rate: float,
    max_beats: int,
    n_offsets: int = 32,
) -> jax.Array:
    """Novelty-optimized beat-grid phase anchor ([B] seconds).

    The reference anchors the grid at the FIRST detected onset
    (hmm.rs:241-249), which phase-locks to the offbeat whenever the first
    onset is not on-beat — measured on the synthetic battery: a track-
    opening kick at t=0 has no preceding baseline frame for the flux
    derivative, so the first *detected* onset is an offbeat eighth hat and
    every downstream beat inherits its phase. This search instead scores
    ``n_offsets`` candidate phases across one beat interval around the
    first onset by the mean novelty at their grid positions (accented
    on-beat events carry more spectral flux than offbeat hats — the same
    signal the multi-res beat-contrast alignment uses,
    multi_resolution.rs:580-678) and returns the best, with an epsilon
    preference for the reference's own anchor on flat ties.
    """
    b = bpm.shape[0]
    safe_bpm = jnp.where(bpm > EPSILON, bpm, 120.0)
    interval = 60.0 / safe_bpm  # [B]
    start = jnp.min(jnp.where(onset_valid, onset_times, 1e9), axis=-1)
    start = jnp.where(jnp.any(onset_valid, axis=-1), start, 0.0)

    offs = (jnp.arange(n_offsets, dtype=jnp.float32) / n_offsets - 0.5)  # [P]
    anchors = start[:, None] + offs[None, :] * interval[:, None]  # [B, P]
    # sample every 4th beat: phase scoring is statistical (>=110 samples on
    # a 3-min track), and the [B, P, K] gather is the stage's whole cost
    # (measured 10.7 -> ~3 ms/batch at stride 4, identical battery grids)
    k = jnp.arange(max_beats // 4, dtype=jnp.float32) * 4.0  # [MB/4]
    grid = anchors[:, :, None] + k[None, None, :] * interval[:, None, None]
    fidx = jnp.round(grid * frame_rate).astype(jnp.int32)  # [B, P, MB]
    in_range = (fidx >= 0) & (fidx < novelty_n[:, None, None])
    # 3-tap max over {f-1, f, f+1}: a novelty peak is 1-2 frames wide, so a
    # single rounded-frame sample can fall one frame off the peak and read
    # ~0 — the offset-grid quantization (interval / n_offsets ~ 16-20 ms)
    # plus frame rounding (~11.6 ms at hop 512) exceeds the peak width
    nmax = jnp.maximum(
        novelty,
        jnp.maximum(
            jnp.concatenate([novelty[:, 1:], novelty[:, :1] * 0.0], axis=-1),
            jnp.concatenate([novelty[:, :1] * 0.0, novelty[:, :-1]], axis=-1),
        ),
    )
    fidx = jnp.clip(fidx, 0, novelty.shape[-1] - 1)
    vals = jnp.take_along_axis(
        nmax[:, None, :], jnp.reshape(fidx, (b, -1))[:, None, :], axis=-1
    ).reshape(b, n_offsets, max_beats // 4)
    vals = jnp.where(in_range, vals, 0.0)
    score = jnp.sum(vals, axis=-1) / jnp.maximum(
        jnp.sum(in_range, axis=-1).astype(jnp.float32), 1.0
    )  # [B, P]
    # flat-tie preference for the reference anchor (offset 0): a relative
    # epsilon bonus keeps parity when the novelty cannot separate phases
    ref_j = n_offsets // 2  # offs[P/2] == 0.0
    score = score.at[:, ref_j].mul(1.0 + 1e-4)
    best = jnp.argmax(score, axis=-1)  # [B]
    anchor = jnp.take_along_axis(anchors, best[:, None], axis=-1)[:, 0]
    # snap to the nearest detected onset when one sits within a quarter
    # interval: onset positions (~hop precision) are sharper than the
    # offset grid (interval / n_offsets) + novelty frame quantization, and
    # the reference's grid is onset-anchored by construction
    k_on = onset_times.shape[-1]
    o_sorted = jnp.where(onset_valid, onset_times, 1e9)
    n_on = jnp.sum(onset_valid, axis=-1)

    def nearest(a, o, nv):
        i = jnp.searchsorted(o, a)
        lo = jnp.clip(i - 1, 0, k_on - 1)
        hi = jnp.clip(i, 0, k_on - 1)
        d_lo = jnp.where(i > 0, jnp.abs(a - o[lo]), 1e9)
        d_hi = jnp.where(i < nv, jnp.abs(a - o[hi]), 1e9)
        t = jnp.where(d_lo <= d_hi, o[lo], o[hi])
        return t, jnp.minimum(d_lo, d_hi)

    snap_t, snap_d = jax.vmap(nearest)(anchor, o_sorted, n_on)
    return jnp.where(snap_d < interval * 0.25, snap_t, anchor)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def generate_beat_grid(
    bpm: jax.Array,
    bpm_confidence: jax.Array,
    onset_times: jax.Array,
    onset_valid: jax.Array,
    max_beats: int = 1024,
    seg_beat_cap: int = 64,
    max_segments: int = 48,
    anchor: jax.Array | None = None,
) -> BeatGridTensor:
    """Full grid generation for a batch (mod.rs:108-250).

    ``onset_times [B, K]`` seconds, sorted among valid entries. The segment
    capacity bounds cover a 3-min track: 48 half-overlapped 4-8 s segments
    and 64 beats per 8 s segment (>= 300 BPM headroom).
    """
    n_onsets = jnp.sum(onset_valid, axis=-1)
    ok = (bpm > 0.0) & (bpm <= 300.0) & (n_onsets >= 1)

    beats, _states = hmm.track_beats(
        bpm, onset_times, onset_valid, max_beats, anchor
    )
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
