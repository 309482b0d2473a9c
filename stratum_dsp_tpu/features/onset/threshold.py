"""Adaptive median + MAD threshold utility.

Mirror of reference ``onset/threshold.rs`` — documented there as NOT wired
into the pipeline (threshold.rs:6-7); provided for API parity and tooling.
The reference computes ONE global threshold over the whole value array:
threshold = median(values) + k * median(|values - median|), with even-length
medians averaging the two middle elements (threshold.rs:30-72). A windowed
per-position variant is kept as an extension under its own name.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import masked


def _masked_median(x: jax.Array, valid: jax.Array) -> jax.Array:
    """Median over valid entries of the last axis, averaging the middle two
    for even counts (threshold.rs sort-based median)."""
    n = x.shape[-1]
    big = jnp.asarray(jnp.inf, x.dtype)
    s = jnp.sort(jnp.where(valid, x, big), axis=-1)
    cnt = jnp.sum(valid, axis=-1)
    hi = jnp.maximum(cnt // 2, 0)
    lo = jnp.maximum((cnt - 1) // 2, 0)
    take = lambda i: jnp.take_along_axis(s, jnp.minimum(i, n - 1)[..., None], axis=-1)[..., 0]
    return 0.5 * (take(lo) + take(hi))


def adaptive_threshold_median_mad(
    x: jax.Array, valid: jax.Array, k: float = 1.5
) -> jax.Array:
    """Global median + k * MAD over the valid entries (threshold.rs:30-72).

    Returns a scalar per leading batch element."""
    med = _masked_median(x, valid)
    mad = _masked_median(jnp.abs(x - med[..., None]), valid)
    return med + k * mad


def adaptive_threshold_median_mad_windowed(
    x: jax.Array, window: int, k: float = 1.5
) -> jax.Array:
    """Per-position windowed variant (extension beyond the reference)."""
    half = max(window, 1) // 2
    med = masked.median_filter_1d_select_nth(x, half)
    mad = masked.median_filter_1d_select_nth(jnp.abs(x - med), half)
    return med + k * mad
