"""Shared peak-picking primitives on masked batched curves.

Implements the reference's onset peak-pick semantics (energy_flux.rs:170-221,
spectral_flux.rs:180-215, hfc.rs:175-210): interior local maxima
(``x[i] > x[i-1]`` and ``x[i] >= x[i+1]``) above a threshold, plus the
first-element (``x[0] >= x[1]``) and last-element (``x[n-1] > x[n-2]``)
edge cases — all as one vectorized mask computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INT_BIG = jnp.iinfo(jnp.int32).max


def peak_mask_1d(x: jax.Array, valid: jax.Array, threshold: jax.Array) -> jax.Array:
    """Boolean peak mask over the last axis.

    ``x`` is ``[..., N]`` (padding entries arbitrary), ``valid`` marks the
    first ``n`` live entries per row, ``threshold`` broadcasts against
    ``x[..., 0]``. Matches the reference's three-case peak pick; rows with
    fewer than 2 valid entries yield no peaks (energy_flux.rs:198-221 requires
    ``len > 1`` for the edge cases and interior peaks need 3 entries).
    """
    n = x.shape[-1]
    thr = jnp.asarray(threshold)[..., None]
    n_valid = jnp.sum(valid, axis=-1)[..., None]
    idx = jnp.arange(n)

    # neighbors (clamped shifts; validity handled by the case masks below)
    prev = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    nxt = jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)

    interior = (idx >= 1) & (idx < n_valid - 1) & (x > thr) & (x > prev) & (x >= nxt)
    first = (idx == 0) & (n_valid > 1) & (x > thr) & (x >= nxt)
    last = (idx == n_valid - 1) & (n_valid > 1) & (x > thr) & (x > prev)
    return (interior | first | last) & valid


def peaks_to_positions(
    peak: jax.Array, positions: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Convert a peak mask ``[B, N]`` + per-peak positions ``[N] or [B, N]``
    into a sorted fixed-capacity list ``(pos [B, k] int32, valid [B, k])``.

    Keeps the K earliest peaks (the reference keeps all; K bounds capacity).
    """
    pos = jnp.broadcast_to(jnp.asarray(positions, jnp.int32), peak.shape)
    key = jnp.where(peak, pos, INT_BIG)
    s = jnp.sort(key, axis=-1)[..., :k]
    if s.shape[-1] < k:  # capacity exceeds available slots: pad
        pad = [(0, 0)] * (s.ndim - 1) + [(0, k - s.shape[-1])]
        s = jnp.pad(s, pad, constant_values=INT_BIG)
    return jnp.where(s == INT_BIG, 0, s), s != INT_BIG


def dedup_min_distance(pos: jax.Array, valid: jax.Array, min_dist: int) -> jax.Array:
    """Greedy min-distance dedup over a sorted onset list: keep entry i iff
    ``pos[i] >= last_kept + min_dist`` (energy_flux.rs:228-243). Returns the
    new valid mask."""

    def step(last_kept, inp):
        p, ok = inp
        keep = ok & (p >= last_kept + min_dist)
        new_last = jnp.where(keep, p, last_kept)
        return new_last, keep

    init = jnp.full(pos.shape[:-1], -(2**30), dtype=pos.dtype)
    pt = jnp.moveaxis(pos, -1, 0)
    vt = jnp.moveaxis(valid, -1, 0)
    _, keeps = jax.lax.scan(step, init, (pt, vt), unroll=16)
    return jnp.moveaxis(keeps, 0, -1)
