"""Branch-complete unit tests for confidence scoring (confidence.rs:121-296):
weighted overall, single-source 0.6x penalties, clarity tiers at the 0.2/0.5
edges, warning penalties, and the three flag thresholds."""

import numpy as np
import jax.numpy as jnp

from stratum_dsp_tpu.analysis.confidence import compute_confidence


def run(bpm, bc, kc, clarity, grid, bw=False, kw=False):
    out = compute_confidence(
        jnp.asarray([bpm], jnp.float32), jnp.asarray([bc], jnp.float32),
        jnp.asarray([kc], jnp.float32), jnp.asarray([clarity], jnp.float32),
        jnp.asarray([grid], jnp.float32),
        jnp.asarray([bw]), jnp.asarray([kw]),
    )
    return {k: float(np.asarray(v[0])) for k, v in out.items()}


def test_weighted_overall():
    r = run(128.0, 0.8, 0.6, 0.7, 0.9)
    assert abs(r["overall_confidence"] - (0.8 * 0.4 + 0.6 * 0.3 + 0.9 * 0.3)) < 1e-6
    assert abs(r["key_confidence"] - 0.6) < 1e-6  # clarity >= 0.5: no penalty


def test_single_source_penalties():
    assert abs(run(128.0, 0.8, 0.0, 0.9, 0.9)["overall_confidence"] - 0.8 * 0.6) < 1e-6
    assert abs(run(0.0, 0.0, 0.6, 0.9, 0.9)["overall_confidence"] - 0.6 * 0.6) < 1e-6
    assert run(0.0, 0.0, 0.0, 0.0, 0.9)["overall_confidence"] == 0.0


def test_clarity_tiers():
    # < 0.2 -> 0.6x; [0.2, 0.5) -> 0.85x; >= 0.5 -> 1.0 (confidence.rs:273-285)
    assert abs(run(120.0, 0.5, 0.8, 0.19, 0.5)["key_confidence"] - 0.8 * 0.6) < 1e-6
    assert abs(run(120.0, 0.5, 0.8, 0.2, 0.5)["key_confidence"] - 0.8 * 0.85) < 1e-6
    assert abs(run(120.0, 0.5, 0.8, 0.49, 0.5)["key_confidence"] - 0.8 * 0.85) < 1e-6
    assert abs(run(120.0, 0.5, 0.8, 0.5, 0.5)["key_confidence"] - 0.8) < 1e-6


def test_warning_penalties():
    assert abs(run(120.0, 0.8, 0.6, 0.9, 0.5, bw=True)["bpm_confidence"] - 0.56) < 1e-6
    assert abs(run(120.0, 0.8, 0.6, 0.9, 0.5, kw=True)["key_confidence"] - 0.42) < 1e-6


def test_flag_thresholds():
    r = run(120.0, 0.29, 0.19, 0.9, 0.29)
    assert r["flag_multimodal_bpm"] and r["flag_weak_tonality"] and r["flag_tempo_variation"]
    r = run(120.0, 0.31, 0.3, 0.9, 0.31)
    assert not r["flag_multimodal_bpm"] and not r["flag_weak_tonality"]
    assert not r["flag_tempo_variation"]


def test_zero_bpm_means_failed():
    assert run(0.0, 0.9, 0.0, 0.0, 0.5)["bpm_confidence"] == 0.0
