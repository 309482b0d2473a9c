"""End-to-end BPM slice: novelty -> dual tempogram -> candidate selection."""

import numpy as np
import jax.numpy as jnp
import pytest

from stratum_dsp_tpu.config import AnalysisConfig
from stratum_dsp_tpu.features.period import novelty as nov
from stratum_dsp_tpu.features.period import tempogram as tg
from stratum_dsp_tpu.features.period import tempogram_fft as tft
from stratum_dsp_tpu.features.period import tempogram_autocorr as tac
from stratum_dsp_tpu.ops import masked
from stratum_dsp_tpu.testing import SAMPLE_RATE, kick_pattern, pad_batch

CFG = AnalysisConfig()


def estimate_batch_bpm(tracks, cfg=CFG):
    samples, lengths = pad_batch(tracks)
    feats, frame_counts, _ = nov.compute_bpm_spectral_features(
        jnp.asarray(samples), jnp.asarray(lengths), cfg, SAMPLE_RATE, cfg.frame_size, cfg.hop_size
    )
    curves, nov_mask, n_valid = nov.assemble_novelty_curves(feats, frame_counts, cfg)
    frame_rate = SAMPLE_RATE / cfg.hop_size
    fft_size = tft.padded_fft_size(curves["full"].shape[-1], frame_rate)
    variants = tg.compute_variants(curves, nov_mask, n_valid, frame_rate, cfg, fft_size)
    return tg.estimate_bpm_tempogram(variants, cfg, frame_rate, fft_size, top_n=10)


def test_impulse_train_tempograms():
    """Impulse-train novelty at a known period: both tempogram methods must
    put their primary pick at the seeded BPM (tempogram_fft.rs:243-271,
    tempogram_autocorr.rs:229-258)."""
    frame_rate = SAMPLE_RATE / 512.0  # ~86.13
    target_bpm = 120.0
    period = frame_rate * 60.0 / target_bpm  # ~43 frames
    n = 2048
    x = np.zeros((1, n), np.float32)
    for i in range(int(n / period)):
        x[0, int(round(i * period))] = 1.0
    mask = jnp.ones((1, n), bool)
    n_valid = jnp.asarray([n])

    power, bpms = tft.fft_tempogram_power(
        jnp.asarray(x), mask, n_valid, frame_rate, 40.0, 240.0, tft.next_pow2(n)
    )
    best_fft = bpms[int(np.argmax(np.asarray(power)[0]))]
    # a perfect impulse train puts equal power on every harmonic line
    # (120/240/... BPM); which wins is float noise — accept the family
    ratio_fft = best_fft / target_bpm
    assert min(abs(ratio_fft - r) for r in (0.5, 1.0, 2.0)) < 0.05

    strength, grid = tac.autocorr_tempogram(
        jnp.asarray(x), mask, n_valid, frame_rate, 40.0, 240.0, 1.0
    )
    best_ac = grid[int(np.argmax(np.asarray(strength)[0]))]
    # autocorr peaks at the fundamental or a metrical multiple
    ratio = best_ac / target_bpm
    assert min(abs(ratio - r) for r in (0.5, 1.0, 2.0)) < 0.05


def test_autocorr_matches_direct_loop():
    """FFT-ACF reformulation == the reference's direct O(N*n_bpm) loop."""
    rng = np.random.default_rng(5)
    n, n_valid_i = 300, 257
    x = np.abs(rng.standard_normal(n)).astype(np.float32)
    x[n_valid_i:] = 0.0
    frame_rate = 86.1328125
    mask = jnp.asarray(np.arange(n) < n_valid_i)[None]
    strength, grid = tac.autocorr_tempogram(
        jnp.asarray(x[None]), mask, jnp.asarray([n_valid_i]), frame_rate, 40.0, 240.0, 1.0
    )
    got = np.asarray(strength)[0]
    for bi, bpm in enumerate(grid):
        lag = int(frame_rate / (bpm / 60.0))
        if lag >= n_valid_i:
            ref = 0.0
        else:
            cnt = n_valid_i - lag
            ref = float(np.dot(x[:cnt], x[lag : lag + cnt]) / cnt)
        np.testing.assert_allclose(got[bi], ref, rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("bpm", [120.0, 128.0])
def test_kick_fixture_bpm(bpm):
    track = kick_pattern(bpm, 8.0)
    res = estimate_batch_bpm([track])
    got = float(res["bpm"][0])
    assert abs(got - bpm) <= 2.05, f"expected {bpm}, got {got}"
    assert float(res["confidence"][0]) > 0.0


def test_batch_of_mixed_bpms():
    tracks = [kick_pattern(100.0, 10.0), kick_pattern(140.0, 8.0), kick_pattern(174.0, 8.0)]
    res = estimate_batch_bpm(tracks)
    got = np.asarray(res["bpm"])
    for g, want in zip(got, [100.0, 140.0, 174.0]):
        # accept metrical-family answers for the extreme tempi
        ratios = [g / want, want / g]
        ok = any(abs(r - f) < 0.05 for r in ratios for f in (1.0, 2.0, 0.5, 1.5, 3.0))
        assert abs(g - want) < 2.5 or ok, (g, want)


def test_fold_down_gate():
    """A 120 BPM kick should not be reported above 180 even if a harmonic
    wins locally (tempogram.rs:669-699)."""
    res = estimate_batch_bpm([kick_pattern(120.0, 12.0)])
    assert float(res["bpm"][0]) <= 180.0
