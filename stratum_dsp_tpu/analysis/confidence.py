"""Comprehensive confidence scoring (batched).

Mirror of reference ``analysis/confidence.rs:121-296``: overall =
0.4·BPM + 0.3·key + 0.3·grid when both BPM and key succeeded, single-source
0.6× penalties otherwise; key confidence is clarity-adjusted
(0.6 / 0.85 / 1.0) and warning-penalized (0.7×); flag thresholds
MultimodalBpm < 0.3, WeakTonality < 0.2, TempoVariation grid < 0.3.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def compute_confidence(
    bpm: jax.Array,
    bpm_confidence: jax.Array,
    key_confidence: jax.Array,
    key_clarity: jax.Array,
    grid_stability: jax.Array,
    bpm_warning: jax.Array,
    key_warning: jax.Array,
) -> Dict[str, jax.Array]:
    """All inputs [B]; warnings are booleans mirroring the reference's
    substring checks over ``confidence_warnings`` (confidence.rs:247-296)."""
    bpm_conf = jnp.where(bpm > 0.0, jnp.clip(bpm_confidence, 0.0, 1.0), 0.0)
    bpm_conf = jnp.where(bpm_warning, bpm_conf * 0.7, bpm_conf)

    base_key = jnp.clip(key_confidence, 0.0, 1.0)
    clarity_adj = jnp.where(
        key_clarity < 0.2, 0.6, jnp.where(key_clarity < 0.5, 0.85, 1.0)
    )
    key_conf = jnp.where(
        key_confidence > 0.0,
        base_key * clarity_adj * jnp.where(key_warning, 0.7, 1.0),
        0.0,
    )

    grid = jnp.clip(grid_stability, 0.0, 1.0)

    both = (bpm_conf > 0.0) & (key_conf > 0.0)
    overall = jnp.where(
        both,
        jnp.clip(bpm_conf * 0.4 + key_conf * 0.3 + grid * 0.3, 0.0, 1.0),
        jnp.where(
            bpm_conf > 0.0, bpm_conf * 0.6, jnp.where(key_conf > 0.0, key_conf * 0.6, 0.0)
        ),
    )

    return {
        "bpm_confidence": bpm_conf,
        "key_confidence": key_conf,
        "grid_stability": grid,
        "overall_confidence": overall,
        "flag_multimodal_bpm": bpm_conf < 0.3,
        "flag_weak_tonality": key_conf < 0.2,
        "flag_tempo_variation": grid < 0.3,
    }
