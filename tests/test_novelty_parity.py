"""Novelty-curve parity vs direct numpy ports of the reference algorithms
(novelty.rs): SuperFlux, energy flux, HFC, and the combined conditioning."""

import numpy as np
import jax.numpy as jnp

from stratum_dsp_tpu.config import AnalysisConfig
from stratum_dsp_tpu.features.period import novelty as nov
from stratum_dsp_tpu.ops import masked
from stratum_dsp_tpu.testing import SAMPLE_RATE, kick_pattern, pad_batch

# Parity vs the f64 numpy ports pins the f32 algorithm (bf16 STFT has its
# own end-to-end decision-parity contract in test_stft.py).
CFG = AnalysisConfig(stft_bf16=False)


def np_superflux(spec, max_filter_bins):
    """novelty.rs:336-388: log1p magnitudes, prev-frame frequency max filter,
    HWR L2 over bins, normalized by max."""
    log_spec = np.log1p(np.maximum(spec, 0.0))
    f, k = spec.shape
    out = np.zeros(f - 1)
    r = max(max_filter_bins, 1)
    for i in range(1, f):
        prev = log_spec[i - 1]
        acc = 0.0
        for b in range(k):
            lo, hi = max(b - r, 0), min(b + r + 1, k)
            d = log_spec[i, b] - prev[lo:hi].max()
            if d > 0:
                acc += d * d
        out[i - 1] = np.sqrt(acc)
    mx = out.max()
    return out / mx if mx > 1e-10 else out


def np_condition(curve, local_mean_window, smooth_window):
    """novelty.rs:865-986 conditioning: local-mean subtract + HWR, moving
    average, renormalize."""
    x = curve.copy()
    mx = x.max()
    if mx > 1e-10:
        x = x / mx
    n = len(x)
    if local_mean_window > 1:
        half = local_mean_window // 2
        y = np.empty_like(x)
        for i in range(n):
            lo, hi = max(i - half, 0), min(i + half + 1, n)
            y[i] = max(x[i] - x[lo:hi].mean(), 0.0)
        x = y
    if smooth_window > 1:
        half = smooth_window // 2
        y = np.empty_like(x)
        for i in range(n):
            lo, hi = max(i - half, 0), min(i + half + 1, n)
            y[i] = x[lo:hi].mean()
        x = y
    mx = x.max()
    return x / mx if mx > 1e-10 else x


def _spec_for(track):
    i = np.arange(CFG.frame_size)
    w = 0.5 * (1 - np.cos(2 * np.pi * i / (CFG.frame_size - 1)))
    nf = (len(track) - CFG.frame_size) // CFG.hop_size + 1
    frames = np.stack(
        [track[j * CFG.hop_size : j * CFG.hop_size + CFG.frame_size] * w for j in range(nf)]
    )
    return np.abs(np.fft.rfft(frames, axis=-1)).astype(np.float32)


def test_superflux_parity():
    track = kick_pattern(120.0, 2.0)
    spec = _spec_for(track)
    ref = np_superflux(spec.astype(np.float64), CFG.tempogram_superflux_max_filter_bins)

    samples, lengths = pad_batch([track])
    feats, fc, _ = nov.compute_bpm_spectral_features(
        jnp.asarray(samples), jnp.asarray(lengths), CFG, SAMPLE_RATE, CFG.frame_size, CFG.hop_size
    )
    n_valid = int(fc[0]) - 1
    got = np.asarray(feats["superflux"][0, 1 : 1 + n_valid, 0])
    mx = got.max()
    got = got / mx if mx > 1e-10 else got
    assert n_valid == len(ref)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_combined_conditioning_parity(rng):
    n = 400
    curve = np.abs(rng.standard_normal(n)).astype(np.float32)
    ref = np_condition(
        curve.astype(np.float64),
        CFG.tempogram_novelty_local_mean_window,
        CFG.tempogram_novelty_smooth_window,
    )
    mask = jnp.ones((1, n), bool)
    got = np.asarray(
        nov.combined_novelty_with_params(
            jnp.asarray(curve[None]),
            jnp.zeros((1, n)),
            jnp.zeros((1, n)),
            mask,
            1.0, 0.0, 0.0,
            CFG.tempogram_novelty_local_mean_window,
            CFG.tempogram_novelty_smooth_window,
        )
    )[0]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
