"""Generic peak picking (reference ``period/peak_picking.rs:39-120``).

Like the reference's ``find_peaks`` (only pub-re-exported, never called by
the pipeline — ``period/mod.rs:54``), this is a standalone API-parity
utility. Semantics matched exactly:

* interior peaks are STRICT local maxima (x[i] > both neighbors);
* the first/last elements count as peaks when they exceed their single
  neighbor (peak_picking.rs:87-100);
* ``threshold`` in (0, 1) is relative to the signal max (when max > 0),
  otherwise absolute (peak_picking.rs:57-66);
* ``min_distance`` dedup keeps peaks by DESCENDING VALUE — a lower peak
  within min_distance of any kept peak is dropped regardless of order
  along the axis (peak_picking.rs:102-120).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import masked

EPSILON = 1e-10


def find_peaks(
    x: jax.Array,
    valid: jax.Array,
    threshold: float = 0.0,
    min_distance: int = 1,
):
    """Boolean peak mask over the last axis, reference semantics."""
    n = x.shape[-1]
    xm = jnp.where(valid, x, -jnp.inf)
    n_valid = jnp.sum(valid, axis=-1)[..., None]
    idx = jnp.arange(n)

    mx = masked.masked_max(x, valid)[..., None]
    relative = 0.0 < threshold < 1.0
    thr = jnp.where(
        relative & (mx > 0.0), mx * threshold, jnp.full_like(mx, threshold)
    )

    prev = jnp.concatenate([jnp.full_like(xm[..., :1], -jnp.inf), xm[..., :-1]], axis=-1)
    nxt = jnp.concatenate([xm[..., 1:], jnp.full_like(xm[..., :1], -jnp.inf)], axis=-1)
    interior = (idx >= 1) & (idx < n_valid - 1)
    first = idx == 0
    last = idx == n_valid - 1
    peaks = valid & (
        (interior & (xm > prev) & (xm > nxt))
        | (first & (n_valid >= 2) & (xm > nxt))
        | (last & (n_valid >= 2) & (xm > prev))
    )
    peaks = peaks & (xm >= thr) & (n_valid >= 3) & (mx >= EPSILON)

    if min_distance <= 0:
        return peaks

    # value-descending greedy dedup (peak_picking.rs:102-120): visit peaks
    # from highest value; keep unless within min_distance of any kept peak.
    # Exact-value ties follow the reference's STABLE sort over its insertion
    # order — interior peaks (ascending index), then index 0, then the last
    # index (edge peaks are pushed after the interior loop,
    # peak_picking.rs:87-100) — encoded as a secondary lexsort rank.
    visit_rank = jnp.where(
        idx == 0, n, jnp.where(idx == n_valid - 1, n + 1, idx)
    )
    order = jnp.lexsort(
        (jnp.broadcast_to(visit_rank, xm.shape), jnp.where(peaks, -xm, jnp.inf)),
        axis=-1,
    )  # [..., n]

    def step(kept, j):
        i = jnp.take_along_axis(order, j[None].reshape((1,) * (kept.ndim - 1) + (1,)), axis=-1)[..., 0]
        is_peak = jnp.take_along_axis(peaks, i[..., None], axis=-1)[..., 0]
        near = jnp.any(kept & (jnp.abs(idx - i[..., None]) < min_distance), axis=-1)
        keep = is_peak & ~near
        kept = kept | (keep[..., None] & (idx == i[..., None]))
        return kept, None

    kept0 = jnp.zeros_like(peaks)
    kept, _ = jax.lax.scan(step, kept0, jnp.arange(n))
    return kept
