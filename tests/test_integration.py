"""End-to-end pipeline integration tests.

Mirror of reference ``tests/integration_tests.rs``: full ``analyze_batch`` on
the synthetic fixture set (120/128 BPM kicks, C-major scale, silence
sandwich) with the reference's assertions — BPM ±2, beat interval sanity,
trimmed duration, key = C major, silent-input failure.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from stratum_dsp_tpu.analysis import PipelineCaps, analyze_batch, decode_results
from stratum_dsp_tpu.config import AnalysisConfig
from stratum_dsp_tpu.result import Key
from stratum_dsp_tpu.testing import (
    SAMPLE_RATE,
    c_major_scale,
    kick_pattern,
    pad_batch,
    silence_sandwich,
)

CFG = AnalysisConfig()
CAPS = PipelineCaps(max_onsets=256, max_beats=256, seg_beat_cap=32, max_segments=12)


@pytest.fixture(scope="module")
def fixture_results():
    tracks = [
        kick_pattern(120.0, 8.0),
        kick_pattern(128.0, 7.5),
        c_major_scale(),
        silence_sandwich(5.0, 5.0),
    ]
    samples, lengths = pad_batch(tracks)
    out = analyze_batch(samples, lengths, CFG, SAMPLE_RATE, CAPS)
    return decode_results(out, SAMPLE_RATE)


def test_120bpm_fixture(fixture_results):
    # Reference-strict asserts (integration_tests.rs:47-118), with the
    # interval check applied to EVERY interval, not just beats[1]-beats[0].
    r = fixture_results[0]
    assert 7.0 < r.metadata.duration_seconds < 9.0
    assert abs(r.bpm - 120.0) < 2.0, r.bpm
    # a pure kick train is metrically ambiguous (60/120/240 all score
    # equally), so the reference's separation-based confidence is near 0
    assert r.bpm_confidence > 0.0
    beats = r.beat_grid.beats
    assert len(beats) >= 4
    assert 0.0 <= r.grid_stability <= 1.0
    intervals = np.diff(beats)
    assert np.all(np.abs(intervals - 0.5) < 0.1), intervals
    downbeats = r.beat_grid.downbeats
    if len(downbeats) >= 2:
        assert 1.0 <= downbeats[1] - downbeats[0] <= 4.0


def test_128bpm_fixture(fixture_results):
    r = fixture_results[1]
    assert 7.0 < r.metadata.duration_seconds < 8.0
    assert abs(r.bpm - 128.0) <= 2.0, r.bpm
    assert r.bpm_confidence > 0.0
    beats = r.beat_grid.beats
    assert len(beats) >= 4
    intervals = np.diff(beats)
    assert np.all(np.abs(intervals - 60.0 / 128.0) < 0.1), intervals


def test_cmajor_scale_key(fixture_results):
    r = fixture_results[2]
    assert r.key.name() == "C", r.key.name()


def test_silence_sandwich_trimmed(fixture_results):
    r = fixture_results[3]
    # trimmed to ~5 s of tone (integration_tests.rs trimmed duration)
    assert abs(r.metadata.duration_seconds - 5.0) < 0.3


def test_all_silent_fails():
    samples = np.zeros((1, 3 * SAMPLE_RATE), np.float32)
    out = analyze_batch(samples, np.asarray([3 * SAMPLE_RATE]), CFG, SAMPLE_RATE, CAPS)
    assert not bool(out["ok"][0])
    assert float(out["bpm"][0]) == 0.0


def test_camelot_roundtrip():
    # result.rs:346-369 invariant over all 24 keys
    for idx in range(24):
        k = Key.from_index(idx)
        assert Key.from_numerical(k.numerical()) == k


def test_methods_used_reflects_pipeline_booleans(fixture_results):
    """methods_used is populated from the per-track decision booleans (the
    reference only hardcodes three entries, lib.rs:1605-1609; ours keeps
    those and appends the paths that actually ran) and round-trips through
    to_dict()."""
    for r in fixture_results[:3]:  # skip the all-silent-trim edge track
        m = r.metadata
        assert m.methods_used[0] == "energy_flux"
        assert "chroma_extraction" in m.methods_used
        assert "key_detection" in m.methods_used
        # exactly one BPM source is claimed, and escalation entries mirror
        # the booleans
        assert ("tempogram" in m.methods_used) != (
            "legacy_autocorr_comb" in m.methods_used
        ) or r.bpm == 0.0
        assert ("multi_resolution" in m.methods_used) == bool(
            m.tempogram_multi_res_used
        )
        assert ("percussive_fallback" in m.methods_used) == bool(
            m.tempogram_percussive_used
        )
        assert r.to_dict()["methods_used"] == m.methods_used


def test_escalation_subbatch_invariance():
    """Per-track results must not depend on batch composition.

    The pipeline gathers ambiguous tracks into a fixed-capacity sub-batch
    before the hop-256 multi-res pass (lax.switch tiers B/4, B/2, full).
    Multi-res is per-track independent, so a track analyzed in a batch of 4
    (where only 2 escalate and the B/2=2 tier runs) must get bit-identical
    BPM to the same track analyzed alone (b=1 has no tiers: full path).
    """
    bpms = [75.0, 120.0, 128.0, 172.0]  # 75/172 hit the trap zones
    tracks = [kick_pattern(x, 8.0) for x in bpms]
    samples, lengths = pad_batch(tracks)
    out = analyze_batch(samples, lengths, CFG, SAMPLE_RATE, CAPS)
    trig = np.asarray(out["multi_res_triggered"])
    assert trig[0] and trig[3], trig  # trap-zone tracks escalate
    assert not trig[1] and not trig[2], trig
    batch_bpm = np.asarray(out["bpm"])
    for i in (0, 1, 3):
        o1 = analyze_batch(
            samples[i : i + 1], lengths[i : i + 1], CFG, SAMPLE_RATE, CAPS
        )
        assert float(o1["bpm"][0]) == pytest.approx(batch_bpm[i], abs=1e-4)
