"""Adaptive median + MAD threshold utility.

Mirror of reference ``onset/threshold.rs`` — documented there as NOT wired
into the pipeline (threshold.rs:6-7); provided for API parity and tooling.
threshold[i] = median(window) + k * MAD(window) over a centered window.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import masked


def adaptive_threshold_median_mad(
    x: jax.Array, window: int, k: float = 1.5
) -> jax.Array:
    """Per-position adaptive threshold on the last axis."""
    half = max(window, 1) // 2
    med = masked.median_filter_1d_select_nth(x, half)
    mad = masked.median_filter_1d_select_nth(jnp.abs(x - med), half)
    return med + k * mad
