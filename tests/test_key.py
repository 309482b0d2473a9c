"""Key path: templates, scoring, detectors, end-to-end C-major fixture."""

import numpy as np
import jax.numpy as jnp

from stratum_dsp_tpu.config import AnalysisConfig, TemplateSet
from stratum_dsp_tpu.features.key import (
    detect_key_batch,
    detect_key_weighted,
    key_templates,
)
from stratum_dsp_tpu.features.key import scoring
from stratum_dsp_tpu.result import Key
from stratum_dsp_tpu.testing import SAMPLE_RATE, c_major_scale, pad_batch

CFG = AnalysisConfig()


def test_templates_shape_and_norm():
    for ts in TemplateSet:
        t = key_templates(ts)
        assert t.shape == (24, 12)
        np.testing.assert_allclose(np.linalg.norm(t, axis=1), 1.0, atol=1e-6)
    # rotation: G major template is C major rolled by 7
    t = key_templates(TemplateSet.KRUMHANSL_KESSLER)
    np.testing.assert_allclose(t[7], np.roll(t[0], 7), atol=1e-7)
    # minor row 12+9 = A minor: relative minor shares profile shape with C rotated
    np.testing.assert_allclose(t[12 + 9], np.roll(t[12], 9), atol=1e-7)


def synth_chroma(pitch_classes, n_frames=200, strength=1.0):
    ch = np.zeros((1, n_frames, 12), np.float32)
    for pc, w in pitch_classes:
        ch[:, :, pc] = w * strength
    n = np.linalg.norm(ch, axis=-1, keepdims=True)
    ch = ch / np.maximum(n, 1e-9)
    return jnp.asarray(ch)


def test_detect_c_major_triad():
    # C-E-G triad with tonic emphasis
    ch = synth_chroma([(0, 1.0), (4, 0.8), (7, 0.9)])
    mask = jnp.ones(ch.shape[:2], jnp.float32)
    res = detect_key_weighted(ch, None, mask, CFG)
    key = Key.from_index(int(res.key_idx[0]))
    assert key.name() == "C"
    # NOTE: single-call confidence is 0 by construction — the reference's
    # per-mode normalization ties the two mode maxima at exactly 1.2
    # (detector.rs:160-243); discrimination comes from segment voting.
    assert float(res.confidence[0]) >= 0.0
    assert float(res.clarity[0]) > 0.2


def test_detect_a_minor():
    # A-C-E triad (A minor) with strong minor third
    ch = synth_chroma([(9, 1.0), (0, 0.9), (4, 0.85)])
    mask = jnp.ones(ch.shape[:2], jnp.float32)
    res = detect_key_weighted(ch, None, mask, CFG)
    key = Key.from_index(int(res.key_idx[0]))
    # template matching may pick C major (relative) or A minor; both share
    # the pitch set — accept either but require the tonic in {A, C}
    assert key.name() in ("Am", "C")


def test_mode_heuristic_flip():
    # C minor spelled out: C, Eb, G plus minor 6th/7th cues
    ch = synth_chroma([(0, 1.0), (3, 0.9), (7, 0.9), (8, 0.4), (10, 0.4)])
    mask = jnp.ones(ch.shape[:2], jnp.float32)
    cfg = CFG.replace(enable_key_mode_heuristic=True, key_mode_flip_min_score_ratio=0.6)
    res = detect_key_weighted(ch, None, mask, cfg)
    key = Key.from_index(int(res.key_idx[0]))
    assert not key.is_major or key.tonic != 0  # must not report C major


def test_clarity_ordering():
    sharp = scoring.key_clarity(jnp.asarray([[1.0] + [0.1] * 23]))
    flat = scoring.key_clarity(jnp.asarray([[1.0] + [0.95] * 23]))
    assert float(sharp[0]) > float(flat[0])


def test_cmajor_scale_fixture_end_to_end():
    track = c_major_scale()
    samples, lengths = pad_batch([track])
    res = detect_key_batch(jnp.asarray(samples), jnp.asarray(lengths), CFG, SAMPLE_RATE)
    key = Key.from_index(int(res.key_idx[0]))
    assert key.name() == "C", f"got {key.name()}"
    # < 12 s of audio -> fewer frames than one segment-voting window -> the
    # full-track fallback, whose confidence is 0 by the tie construction
    assert float(res.confidence[0]) >= 0.0


def test_short_track_default_key():
    samples = np.zeros((1, 4096), np.float32)
    res = detect_key_batch(jnp.asarray(samples), jnp.asarray([1000]), CFG, SAMPLE_RATE)
    assert int(res.key_idx[0]) == 0
    assert float(res.confidence[0]) == 0.0
