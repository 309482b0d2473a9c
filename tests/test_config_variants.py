"""Compile/behavior smoke tests for the opt-in config paths (all off in the
reference's tuned defaults): log-frequency chroma, tuning compensation,
HPSS-median key mask, beat-synchronous chroma, ensemble/median/multi-scale
detectors, mode heuristic, percussive fallback, HPSS onsets, bpm fusion."""

import numpy as np
import jax.numpy as jnp
import pytest

from stratum_dsp_tpu.analysis import PipelineCaps, analyze_batch
from stratum_dsp_tpu.config import AnalysisConfig
from stratum_dsp_tpu.features.key import detect_key_batch
from stratum_dsp_tpu.result import Key
from stratum_dsp_tpu.testing import SAMPLE_RATE, c_major_scale, kick_pattern, pad_batch

CAPS = PipelineCaps(max_onsets=128, max_beats=128, seg_beat_cap=16, max_segments=6)


def scale_batch():
    samples, lengths = pad_batch([c_major_scale()])
    return jnp.asarray(samples), jnp.asarray(lengths)


@pytest.mark.parametrize(
    "overrides, expected",
    [
        # exact C major, matching the reference's integration bar for the
        # scale fixture (integration_tests.rs:47-275)
        ({"enable_key_log_frequency": True, "enable_key_hpcp": False}, "C"),
        ({"enable_key_tuning_compensation": True}, "C"),
        ({"enable_key_hpss_harmonic": True, "enable_key_harmonic_mask": False}, "C"),
        ({"enable_key_ensemble": True}, "C"),
        ({"enable_key_median": True, "enable_key_segment_voting": False,
          "key_median_segment_length_frames": 120,
          "key_median_segment_hop_frames": 30}, "C"),
        ({"enable_key_mode_heuristic": True,
          "key_mode_flip_min_score_ratio": 0.6}, "C"),
        ({"enable_key_hpcp_whitening": True}, "C"),
        ({"enable_key_hpcp": False}, "C"),
        # the bare ascending scale is tonally thin (no tonic emphasis, no
        # cadence); these variants sit on knife edges — pinned exactly as
        # characterization so any drift is visible. Round-5 re-derivation:
        # fixing the halo misalignment in the f32 stft_reduce path (the
        # first chunk's conditioning context was shifted by `halo` frames
        # and the last `halo` frames of every track were dropped) moved
        # multi_scale (was Am) and bass_blend (was G) onto the float64 port
        # chain's answers (C) on BOTH the f32 and bf16 paths; repo == port
        # is asserted per variant by test_key_chain_characterization.py, so
        # these values are port-backed, not just historical.
        ({"enable_key_multi_scale": True, "key_multi_scale_lengths": (60, 120)}, "C"),
        ({"enable_key_hpcp_bass_blend": True}, "C"),
        ({"enable_key_edge_trim": True}, "G"),
    ],
)
def test_key_config_variants_exact(overrides, expected):
    s, l = scale_batch()
    cfg = AnalysisConfig(**overrides)
    res = detect_key_batch(s, l, cfg, SAMPLE_RATE)
    key = Key.from_index(int(res.key_idx[0]))
    assert key.name() == expected, key.name()


@pytest.mark.parametrize(
    "overrides",
    [
        {"enable_tempogram_percussive_fallback": True},
        {"enable_hpss_onsets": True},
        {"enable_bpm_fusion": True},
        {"force_legacy_bpm": True},
        {"enable_key_beat_synchronous": True},
        {"enable_onset_consensus": False},
        {"enable_normalization": False, "enable_silence_trimming": False},
    ],
)
def test_pipeline_config_variants(overrides):
    samples, lengths = pad_batch([kick_pattern(120.0, 4.0)])
    cfg = AnalysisConfig(**overrides)
    out = analyze_batch(samples, lengths, cfg, SAMPLE_RATE, CAPS)
    assert bool(out["ok"][0])
    got = float(out["bpm"][0])
    # exact +-2 BPM for every variant (reference integration bar); no
    # metrical-family tolerance
    assert abs(got - 120.0) <= 2.0, got
