"""Preprocessing: normalization (peak/RMS/LUFS) and silence trim."""

import numpy as np
import jax.numpy as jnp

from stratum_dsp_tpu.config import NormalizationMethod
from stratum_dsp_tpu.preprocessing import normalization as norm
from stratum_dsp_tpu.preprocessing import silence
from stratum_dsp_tpu.testing import SAMPLE_RATE, pad_batch, silence_sandwich


def sine(freq, dur, amp=0.5, sr=SAMPLE_RATE):
    t = np.arange(int(dur * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_peak_normalization():
    x = sine(440.0, 1.0, amp=0.25)
    samples, lengths = pad_batch([x])
    out, meta = norm.normalize(
        jnp.asarray(samples), jnp.asarray(lengths), NormalizationMethod.PEAK, SAMPLE_RATE
    )
    peak = float(jnp.max(jnp.abs(out)))
    # target peak = -1 dBFS ~= 0.891
    assert abs(peak - 10 ** (-1 / 20)) < 1e-3
    # never amplifies above unity peak
    x2 = sine(440.0, 1.0, amp=0.95)
    out2, _ = norm.normalize(
        jnp.asarray(pad_batch([x2])[0]),
        jnp.asarray([len(x2)]),
        NormalizationMethod.PEAK,
        SAMPLE_RATE,
    )
    assert float(jnp.max(jnp.abs(out2))) <= 1.0 + 1e-5


def test_silent_track_unchanged():
    x = np.zeros(SAMPLE_RATE, np.float32)
    samples, lengths = pad_batch([x])
    for m in NormalizationMethod:
        out, meta = norm.normalize(jnp.asarray(samples), jnp.asarray(lengths), m, SAMPLE_RATE)
        assert float(jnp.max(jnp.abs(out))) == 0.0


def test_kweighting_fir_matches_iir_scan():
    """The truncated-FIR reformulation must match the sequential biquad."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal(8000).astype(np.float64)
    b0, b1, b2, a1, a2 = norm.k_weighting_coeffs(44100.0)
    # direct-form II transposed, as the reference (normalization.rs:160-175)
    y = np.zeros_like(x)
    s1 = s2 = 0.0
    for i, xi in enumerate(x):
        yi = b0 * xi + s1
        s1 = b1 * xi + s2 - a1 * yi
        s2 = b2 * xi - a2 * yi
        y[i] = yi
    got = np.asarray(
        norm.k_weighting_filter(jnp.asarray(x[None].astype(np.float32)), 44100.0)
    )[0]
    np.testing.assert_allclose(got, y, rtol=5e-4, atol=5e-5)


def test_lufs_sine_value():
    """A full-scale 997 Hz sine should measure ~ -3.01 LUFS + K-weighting gain
    (BS.1770 anchor: 0 dBFS 997 Hz sine = -3.01 LUFS before the +0 dB
    high-shelf; the reference implements only the high-pass stage so the value
    lands near -3.2)."""
    x = sine(997.0, 2.0, amp=1.0)
    lufs = float(
        norm.calculate_lufs(
            jnp.asarray(pad_batch([x])[0]), jnp.asarray([len(x)]), SAMPLE_RATE
        )[0]
    )
    # The reference builds its "K-weighting" as a HIGH-PASS at the BS.1770
    # stage-1 shelf frequency (normalization.rs:131-158), so a 997 Hz tone
    # sits ~9 dB below true BS.1770 loudness; we mirror that filter exactly.
    assert -14.0 < lufs < -10.0


def test_loudness_normalization_hits_target():
    x = sine(440.0, 2.0, amp=0.05)
    out, meta = norm.normalize(
        jnp.asarray(pad_batch([x])[0]),
        jnp.asarray([len(x)]),
        NormalizationMethod.LOUDNESS,
        SAMPLE_RATE,
        target_loudness_lufs=-14.0,
    )
    after = float(
        norm.calculate_lufs(out, jnp.asarray([len(x)]), SAMPLE_RATE)[0]
    )
    # clip-protection may cap the gain; otherwise we land on target
    peak = float(jnp.max(jnp.abs(out)))
    assert (abs(after + 14.0) < 0.5) or (abs(peak - 10 ** (-1 / 20)) < 1e-3)


def test_silence_trim_sandwich():
    x = silence_sandwich(5.0, 5.0)
    samples, lengths = pad_batch([x])
    trimmed, new_lengths, info = silence.detect_and_trim(
        jnp.asarray(samples), jnp.asarray(lengths), SAMPLE_RATE, threshold_db=-40.0
    )
    dur = float(new_lengths[0]) / SAMPLE_RATE
    assert abs(dur - 5.0) < 0.2
    # trimmed signal starts near the tone onset
    start = int(info["trim_start"][0])
    assert abs(start - 5 * SAMPLE_RATE) < 4096
    # content preserved
    got = np.asarray(trimmed[0, : int(new_lengths[0])])
    ref = x[start : start + int(new_lengths[0])]
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_silence_trim_all_silent():
    x = np.zeros(3 * SAMPLE_RATE, np.float32)
    samples, lengths = pad_batch([x])
    _, new_lengths, info = silence.detect_and_trim(
        jnp.asarray(samples), jnp.asarray(lengths), SAMPLE_RATE
    )
    assert int(new_lengths[0]) == 0
    assert bool(info["all_silent"][0])


def test_no_trim_for_loud_track():
    x = sine(220.0, 2.0, amp=0.8)
    samples, lengths = pad_batch([x])
    trimmed, new_lengths, info = silence.detect_and_trim(
        jnp.asarray(samples), jnp.asarray(lengths), SAMPLE_RATE
    )
    assert int(info["trim_start"][0]) == 0
    assert int(new_lengths[0]) == len(x)


def test_silence_trim_parity_vs_numpy_port():
    """detect_and_trim vs the literal silence.rs port on edge-case fixtures:
    short interior gaps (< 500 ms, must NOT create regions), leading-only,
    trailing-only, both, and a sub-threshold quiet lead-in."""
    from stratum_dsp_tpu.preprocessing.silence import detect_and_trim
    from stratum_dsp_tpu.testing import numpy_ref as ref

    sr = SAMPLE_RATE
    rng = np.random.default_rng(5)

    def tone(sec, amp=0.5):
        t = np.arange(int(sec * sr)) / sr
        return (amp * np.sin(2 * np.pi * 440 * t)).astype(np.float32)

    sil = lambda sec: np.zeros(int(sec * sr), np.float32)
    cases = {
        "lead": np.concatenate([sil(2.0), tone(5.0)]),
        "trail": np.concatenate([tone(5.0), sil(2.0)]),
        "both": np.concatenate([sil(1.5), tone(4.0), sil(1.0)]),
        "short_gap": np.concatenate([tone(2.0), sil(0.3), tone(2.0)]),
        "long_gap": np.concatenate([tone(2.0), sil(1.0), tone(2.0)]),
        "quiet_lead": np.concatenate([tone(2.0, amp=0.005), tone(4.0)]),
    }
    for name, x in cases.items():
        samples, lengths = pad_batch([x])
        out, new_len, info = detect_and_trim(
            jnp.asarray(samples), jnp.asarray(lengths), sr, -40.0,
            frame_size=2048,
        )
        ts, te, _regions = ref.detect_and_trim_np(x, sr, -40.0, 2048)
        want_len = te - ts
        assert int(new_len[0]) == want_len, (name, int(new_len[0]), want_len)
        got = np.asarray(out[0, : int(new_len[0])])
        np.testing.assert_allclose(got, x[ts:te], atol=1e-7, err_msg=name)
