"""Independent numpy reference implementations for golden-artifact parity.

Double-precision, loop/ndarray ports of the reference algorithms, written
directly from the Rust sources (citations inline) with NO dependency on the
JAX package code. ``scripts/generate_goldens.py`` evaluates these on the
synthetic fixtures and checks the arrays into ``tests/goldens/*.npz``;
``tests/test_goldens.py`` then compares the JAX pipeline against the stored
artifacts under SNR bounds — so a shared misreading of the Rust cannot pass
both sides silently once the artifact is pinned.
"""

from __future__ import annotations

import numpy as np

A4_FREQ = 440.0
SEMITONE_OFFSET = 57.0
CHROMA_FMIN_HZ = 100.0
CHROMA_FMAX_HZ = 5000.0
EPSILON = 1e-10


def stft_magnitude(track: np.ndarray, frame_size: int, hop: int) -> np.ndarray:
    """Hann((n-1) denominator) windowed rFFT magnitude, frames of
    (len-frame)/hop+1 (extractor.rs:301-359)."""
    i = np.arange(frame_size)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * i / (frame_size - 1)))
    nf = (len(track) - frame_size) // hop + 1
    if nf <= 0:
        return np.zeros((0, frame_size // 2 + 1))
    frames = np.stack(
        [track[j * hop : j * hop + frame_size] * w for j in range(nf)]
    )
    return np.abs(np.fft.rfft(frames, axis=-1))


def superflux(spec: np.ndarray, max_filter_bins: int) -> np.ndarray:
    """Log1p + prev-frame frequency max filter + HWR L2, normalized by max
    (novelty.rs:336-388). spec [F, K] -> novelty [F-1]."""
    log_spec = np.log1p(np.maximum(spec, 0.0))
    f, k = spec.shape
    r = max(max_filter_bins, 1)
    out = np.zeros(max(f - 1, 0))
    for i in range(1, f):
        prev = log_spec[i - 1]
        acc = 0.0
        for b in range(k):
            lo, hi = max(b - r, 0), min(b + r + 1, k)
            d = log_spec[i, b] - prev[lo:hi].max()
            if d > 0:
                acc += d * d
        out[i - 1] = np.sqrt(acc)
    mx = out.max() if out.size else 0.0
    return out / mx if mx > EPSILON else out


def hwr_diff_curve(values: np.ndarray) -> np.ndarray:
    """Half-wave-rectified first difference, normalized by max
    (novelty.rs:517-544 energy / 744-767 HFC)."""
    d = np.maximum(values[1:] - values[:-1], 0.0)
    mx = d.max() if d.size else 0.0
    return d / mx if mx > EPSILON else d


def band_energy(spec: np.ndarray) -> np.ndarray:
    """Per-frame sum |X|^2 (novelty.rs:477-545)."""
    return np.sum(spec * spec, axis=-1)


def band_hfc(spec: np.ndarray) -> np.ndarray:
    """Per-frame sum k*|X|^2 (novelty.rs:687-768)."""
    k = np.arange(spec.shape[-1])
    return np.sum(spec * spec * k, axis=-1)


def condition(curve: np.ndarray, local_mean_window: int, smooth_window: int) -> np.ndarray:
    """normalize -> local-mean subtract + HWR -> moving average -> normalize
    (novelty.rs:865-986)."""
    x = curve.astype(np.float64).copy()
    mx = x.max() if x.size else 0.0
    if mx > EPSILON:
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
    mx = x.max() if x.size else 0.0
    return x / mx if mx > EPSILON else x


def combined_novelty(
    spectral: np.ndarray,
    energy: np.ndarray,
    hfc: np.ndarray,
    w_spectral: float,
    w_energy: float,
    w_hfc: float,
    local_mean_window: int,
    smooth_window: int,
) -> np.ndarray:
    """Weighted combination + conditioning (novelty.rs:874-932)."""
    ws, we, wh = max(w_spectral, 0.0), max(w_energy, 0.0), max(w_hfc, 0.0)
    wsum = max(ws + we + wh, EPSILON)
    combined = (spectral * ws + energy * we + hfc * wh) / wsum
    return condition(combined, local_mean_window, smooth_window)


def fft_tempogram_power(
    novelty: np.ndarray,
    frame_rate: float,
    min_bpm: float,
    max_bpm: float,
    fft_size: int,
):
    """DC-remove + Hann + zero-padded power spectrum over in-range BPM bins
    (tempogram_fft.rs:78-236). Returns (power [NB], bpms [NB])."""
    n = len(novelty)
    x = novelty.astype(np.float64) - novelty.mean()
    if n > 1:
        i = np.arange(n)
        x = x * (0.5 * (1.0 - np.cos(2.0 * np.pi * i / (n - 1))))
    spec = np.fft.rfft(x, n=fft_size)
    power = (spec.real**2 + spec.imag**2)
    freq_res = frame_rate / fft_size
    bpms = np.arange(len(power)) * freq_res * 60.0
    sel = (bpms >= min_bpm) & (bpms <= max_bpm)
    return power[sel], bpms[sel]


def autocorr_tempogram(
    novelty: np.ndarray,
    frame_rate: float,
    min_bpm: float,
    max_bpm: float,
    resolution: float,
):
    """Direct O(N*n_bpm) mean-product autocorrelation
    (tempogram_autocorr.rs:79-178). Returns (strength [n_bpm], grid [n_bpm])."""
    n = len(novelty)
    x = novelty.astype(np.float64)
    grid = np.arange(min_bpm, max_bpm + 1e-9, resolution)
    out = np.zeros(len(grid))
    for gi, bpm in enumerate(grid):
        lag = int(frame_rate / (bpm / 60.0))
        if lag < 1 or lag >= n:
            continue
        cnt = n - lag
        out[gi] = float(np.dot(x[:cnt], x[lag : lag + cnt]) / cnt)
    return out, grid


def frame_to_chroma(
    magnitude_frame: np.ndarray,
    sample_rate: int,
    fft_size: int,
    soft_mapping: bool = True,
    soft_mapping_sigma: float = 0.5,
    tuning_offset_semitones: float = 0.0,
) -> np.ndarray:
    """Band-limited (100-5000 Hz) 0.6-power chroma projection with circular
    Gaussian soft mapping, L2-normalized (extractor.rs:393-487)."""
    chroma = np.zeros(12)
    freq_res = sample_rate / fft_size
    fmax = min(CHROMA_FMAX_HZ, sample_rate / 2.0)
    for bin_idx, magnitude in enumerate(magnitude_frame):
        freq = bin_idx * freq_res
        if freq < CHROMA_FMIN_HZ:
            continue
        if freq > fmax or freq >= sample_rate / 2.0:
            break
        semitone = 12.0 * np.log2(freq / A4_FREQ) + SEMITONE_OFFSET - tuning_offset_semitones
        contrib = max(magnitude, 0.0) ** 0.6
        if soft_mapping:
            semitone_pc = semitone % 12.0
            primary = int(round(semitone_pc)) % 12
            sigma = max(soft_mapping_sigma, 1e-6)
            for off in (-1, 0, 1):
                target = (primary + off) % 12
                dist = abs(semitone_pc - target)
                dist = min(dist, 12.0 - dist)
                chroma[target] += contrib * np.exp(-dist * dist / (2.0 * sigma * sigma))
        else:
            chroma[int(round(semitone)) % 12] += contrib
    norm = np.sqrt(np.sum(chroma**2))
    if norm > EPSILON:
        chroma = chroma / norm
    return chroma


def mean_chroma(
    spec: np.ndarray, sample_rate: int, fft_size: int, sigma: float = 0.5
) -> np.ndarray:
    """Mean of per-frame soft chroma over all frames (used as a compact,
    noise-robust golden for the chroma projection path)."""
    if len(spec) == 0:
        return np.zeros(12)
    acc = np.zeros(12)
    for frame in spec:
        acc += frame_to_chroma(frame, sample_rate, fft_size, True, sigma)
    return acc / len(spec)
