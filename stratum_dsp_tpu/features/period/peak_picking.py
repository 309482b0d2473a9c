"""Generic peak-picking utility (mirror of reference
``features/period/peak_picking.rs``): local maxima above relative/absolute
thresholds with minimum-distance enforcement, batched with masks.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...ops import masked


def find_peaks(
    x: jax.Array,
    valid: jax.Array,
    min_relative_height: float = 0.0,
    min_absolute_height: float = 0.0,
    min_distance: int = 1,
):
    """Boolean peak mask over the last axis (peak_picking.rs:39-100).

    A peak is a strict local maximum (x[i] > x[i-1] and x[i] > x[i+1])
    passing both thresholds; when two surviving peaks are closer than
    ``min_distance`` the earlier, higher one wins (greedy left-to-right with
    keep-higher semantics via a scan).
    """
    n = x.shape[-1]
    prev = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    nxt = jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)
    idx = jnp.arange(n)
    n_valid = jnp.sum(valid, axis=-1)[..., None]
    interior = (idx >= 1) & (idx < n_valid - 1)
    mx = masked.masked_max(x, valid)[..., None]
    peaks = (
        interior
        & valid
        & (x > prev)
        & (x > nxt)
        & (x >= mx * min_relative_height)
        & (x >= min_absolute_height)
    )
    if min_distance <= 1:
        return peaks

    def step(carry, inp):
        last_pos, last_val = carry
        p, v, i = inp
        far = (i - last_pos) >= min_distance
        keep = p & (far | (v > last_val))
        last_pos = jnp.where(keep, i, last_pos)
        last_val = jnp.where(keep, v, jnp.where(far, -jnp.inf, last_val))
        return (last_pos, last_val), keep

    b_shape = x.shape[:-1]
    init = (
        jnp.full(b_shape, -(10**9)),
        jnp.full(b_shape, -jnp.inf),
    )
    pt = jnp.moveaxis(peaks, -1, 0)
    vt = jnp.moveaxis(x, -1, 0)
    _, keeps = jax.lax.scan(step, init, (pt, vt, jnp.arange(n)))
    return jnp.moveaxis(keeps, 0, -1) & peaks
