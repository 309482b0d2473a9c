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


# ---------------------------------------------------------------------------
# key detector chain (ports of templates.rs / detector.rs, float64)
# ---------------------------------------------------------------------------

# Krumhansl-Kessler 1982 C-major/C-minor profiles (templates.rs:71-78) and
# Temperley 1999 profiles (templates.rs:149-170), as published.
KK_C_MAJOR = (6.35, 2.23, 3.48, 2.33, 4.38, 4.09, 2.52, 5.19, 2.39, 3.66, 2.29, 2.88)
KK_C_MINOR = (6.33, 2.68, 3.52, 5.38, 2.60, 3.53, 2.54, 4.75, 3.98, 2.69, 3.34, 3.17)
TP_C_MAJOR = (5.0, 2.0, 3.5, 2.0, 4.5, 4.0, 2.0, 4.5, 2.0, 3.5, 1.5, 4.0)
TP_C_MINOR = (5.0, 2.0, 3.5, 5.0, 2.0, 3.5, 2.0, 4.5, 3.5, 2.0, 4.0, 3.5)

CIRCLE_OF_FIFTHS = (0, 7, 2, 9, 4, 11, 6, 1, 8, 3, 10, 5)


def key_templates_np(template_set: str = "kk") -> np.ndarray:
    """[24, 12] rotated + L2-normalized templates, majors then minors
    (templates.rs:110-143)."""
    base_maj, base_min = (
        (KK_C_MAJOR, KK_C_MINOR) if template_set == "kk" else (TP_C_MAJOR, TP_C_MINOR)
    )
    out = np.zeros((24, 12))
    for key_idx in range(12):
        for s in range(12):
            out[key_idx, s] = base_maj[(s + 12 - key_idx) % 12]
            out[12 + key_idx, s] = base_min[(s + 12 - key_idx) % 12]
    norms = np.sqrt(np.sum(out**2, axis=1, keepdims=True))
    return out / np.maximum(norms, 1e-12)


def key_scores_refined(
    chroma: np.ndarray, weights: np.ndarray | None, templates: np.ndarray
) -> np.ndarray:
    """Weighted sum-of-dots scores, per-mode max normalization, and the
    circle-of-fifths neighbor bonus (detector.rs:114-243). Returns [24]."""
    w = np.ones(len(chroma)) if weights is None else np.asarray(weights, np.float64)
    scores = (w[:, None] * np.asarray(chroma, np.float64)).sum(0) @ templates.T  # [24]

    max_major = scores[:12].max(initial=0.0)
    max_minor = scores[12:].max(initial=0.0)
    if max_major > 1e-9 and max_minor > 1e-9:
        scores = np.concatenate([scores[:12] / max_major, scores[12:] / max_minor])

    pos = {tonic: p for p, tonic in enumerate(CIRCLE_OF_FIFTHS)}
    refined = scores.copy()
    for mode in (0, 1):
        mode_scores = scores[mode * 12 : mode * 12 + 12]
        ref_tonic = int(np.argmax(mode_scores))
        ref_score = mode_scores[ref_tonic]
        if ref_score <= 1e-9:
            continue
        for tonic in range(12):
            d = abs(pos[tonic] - pos[ref_tonic])
            d = min(d, 12 - d)
            if d <= 2:
                refined[mode * 12 + tonic] += ref_score * 0.20 * (1.0 - d * 0.5)
    return refined


def best_key_np(scores: np.ndarray) -> int:
    """Reference tie-break: stable descending sort over a majors-then-minors
    table (detector.rs:244-246) == first argmax."""
    return int(np.argmax(scores >= scores.max()))


def mode_heuristic_np(
    scores: np.ndarray,
    avg_chroma: np.ndarray,
    wsum: float,
    third_ratio_margin: float,
    flip_min_score_ratio: float,
    enable_minor_harmonic_bonus: bool,
    minor_leading_tone_bonus_weight: float,
):
    """Minor leading-tone bonus + gated parallel-mode flip
    (detector.rs:326-518). Returns (key_idx, scores')."""
    scores = np.asarray(scores, np.float64).copy()
    flip_ratio = float(np.clip(flip_min_score_ratio, 0.0, 1.0))
    if wsum <= 1e-9:
        return best_key_np(scores), scores
    avg = np.asarray(avg_chroma, np.float64)
    s = avg.sum()
    if s > 1e-9:
        avg = avg / s

    if enable_minor_harmonic_bonus and minor_leading_tone_bonus_weight > 0.0:
        w = max(minor_leading_tone_bonus_weight, 0.0)
        for tonic in range(12):
            lt, b7 = (tonic + 11) % 12, (tonic + 10) % 12
            scores[12 + tonic] += wsum * w * (avg[lt] - avg[b7])

    best = best_key_np(scores)
    tonic, best_is_major = best % 12, best < 12
    margin = max(third_ratio_margin, 0.0)

    minor_score = major_score = 0.0
    for off_min, off_maj, wdeg in ((3, 4, 2.0), (8, 9, 1.0), (10, 11, 1.0)):
        lo, hi = avg[(tonic + off_min) % 12], avg[(tonic + off_maj) % 12]
        d = abs(lo - hi)
        if lo > hi * (1.0 + margin):
            minor_score += d * wdeg
        elif hi > lo * (1.0 + margin):
            major_score += d * wdeg
    total = minor_score + major_score
    minor_pref = total > 1e-9 and minor_score > major_score * (1.0 + margin * 0.5)
    major_pref = total > 1e-9 and major_score > minor_score * (1.0 + margin * 0.5)

    chosen = best
    if flip_ratio > 0.0:
        maj_s, min_s = scores[tonic], scores[12 + tonic]
        if best_is_major and minor_pref and maj_s > 0.0 and min_s >= maj_s * flip_ratio:
            chosen = 12 + tonic
        elif not best_is_major and major_pref and min_s > 0.0 and maj_s >= min_s * flip_ratio:
            chosen = tonic
    return chosen, scores


def ensemble_scores_np(
    chroma: np.ndarray, weights: np.ndarray | None, kk_weight: float, tp_weight: float
) -> np.ndarray:
    """KK + Temperley refined-score blend (detector.rs:881-976)."""
    total = kk_weight + tp_weight
    kk_n = kk_weight / total if total > 1e-9 else 0.5
    tp_n = tp_weight / total if total > 1e-9 else 0.5
    kk = key_scores_refined(chroma, weights, key_templates_np("kk"))
    tp = key_scores_refined(chroma, weights, key_templates_np("temperley"))
    return kk_n * kk + tp_n * tp


# ---------------------------------------------------------------------------
# HPSS (port of onset/hpss.rs:71-243, float64)
# ---------------------------------------------------------------------------

def _median_filter_np(x: np.ndarray, margin: int, axis: int) -> np.ndarray:
    """Truncated-window median along ``axis`` (hpss.rs:178-243): window
    [i-margin, i+margin] clipped to bounds; even windows average the two
    middle values."""
    out = np.empty_like(x)
    n = x.shape[axis]
    xs = np.moveaxis(x, axis, 0)
    os = np.moveaxis(out, axis, 0)
    for i in range(n):
        lo, hi = max(i - margin, 0), min(i + margin + 1, n)
        os[i] = np.median(xs[lo:hi], axis=0)
    return out


def hpss_decompose_np(
    spec: np.ndarray, margin: int, iterations: int = 10
) -> tuple[np.ndarray, np.ndarray]:
    """Iterative median-filter HPSS with soft-mask reconstruction and the
    1e-6 convergence early-out (hpss.rs:71-175). ``spec`` is [frames, bins]."""
    x = np.asarray(spec, np.float64)
    h = x.copy()
    p = x.copy()
    for it in range(iterations):
        h_prev, p_prev = h, p
        h = _median_filter_np(h, margin, axis=0)  # horizontal: across time
        p = _median_filter_np(p, margin, axis=1)  # vertical: across frequency
        total = h + p
        ratio_ok = total > 1e-10
        h = np.where(ratio_ok, x * h / np.where(ratio_ok, total, 1.0), x * 0.5)
        p = np.where(ratio_ok, x * p / np.where(ratio_ok, total, 1.0), x * 0.5)
        if it > 0:
            change = max(np.abs(h - h_prev).max(), np.abs(p - p_prev).max())
            if change < 1e-6:
                break
    return h, p


# ---------------------------------------------------------------------------
# tempogram candidate machinery (port of tempogram.rs:465-718, float64)
# ---------------------------------------------------------------------------

FOLD_FACTORS = (1.0, 0.5, 2.0, 1.0 / 3.0, 3.0, 2.0 / 3.0, 3.0 / 2.0)
DEDUP_TOL = 0.75
PREFERRED_MIN, PREFERRED_MAX = 60.0, 180.0


def _lookup_nearest_np(values: np.ndarray, grid: np.ndarray, bpm: float, tol: float) -> float:
    """Value of the grid entry nearest ``bpm`` within ``tol``
    (tempogram.rs lookup_nearest: nearest, NOT max-over-window)."""
    d = np.abs(grid - bpm)
    i = int(np.argmin(d))
    return float(values[i]) if d[i] <= tol else 0.0


def tempogram_estimate_np(
    variants,
    min_bpm: float,
    max_bpm: float,
    bpm_resolution: float,
    seed_only: bool = True,
    consensus_bonus: float = 0.0,
    support_threshold: float = 0.25,
    seeds_per_method: int = 8,
):
    """Candidate seeding -> metrical folding -> dedup -> dual-method scoring
    -> consensus bonus -> range priors -> octave fold-down gate
    (tempogram.rs:465-718).

    ``variants``: list of dicts ``{name, w, fft_power, fft_bpms, ac_strength,
    ac_grid}`` (full first). One deliberate adaptation, mirrored from the
    JAX implementation with the same rationale (tempogram.py seed comment):
    FFT seeds are taken from LOCAL MAXIMA of the power grid before top-8 —
    on the zero-padded fine grid the raw top-8 bins would all sit on one
    peak's lobe; the reference's coarse grid gets seed diversity for free.

    Returns dict(bpm, confidence, method_agreement, scored) where ``scored``
    is the score-descending [(bpm, score, fft_norm, ac_norm)] list.
    """
    full = variants[0]
    assert full["name"] == "full"

    fft_primary = float(full["fft_bpms"][int(np.argmax(full["fft_power"]))])
    ac_primary = float(full["ac_grid"][int(np.argmax(full["ac_strength"]))])

    # --- seeds: top-8 local-maxima FFT bins + top-8 AC bins per variant ---
    seeds = []
    for v in variants:
        p = np.asarray(v["fft_power"], np.float64)
        left = np.concatenate([p[:1], p[:-1]])
        right = np.concatenate([p[1:], p[-1:]])
        peaks = np.where((p >= left) & (p >= right), p, 0.0)
        top = np.argsort(-peaks, kind="stable")[:seeds_per_method]
        seeds.extend(np.asarray(v["fft_bpms"])[top].tolist())
        a = np.asarray(v["ac_strength"], np.float64)
        top = np.argsort(-a, kind="stable")[:seeds_per_method]
        seeds.extend(np.asarray(v["ac_grid"])[top].tolist())
    seeds.append(fft_primary)
    seeds.append(ac_primary)

    # --- fold + range filter + sorted 0.75-BPM dedup (rs:552-570) ---
    cands = []
    for s in seeds:
        for f in FOLD_FACTORS:
            b = s * f
            if np.isfinite(b) and min_bpm <= b <= max_bpm:
                cands.append(b)
    cands.sort()
    uniq = []
    for b in cands:
        if uniq and (b - uniq[-1]) < DEDUP_TOL:
            continue
        uniq.append(b)

    # --- scoring (rs:586-653) ---
    score_variants = [v for v in variants if v["name"] == "full"] if seed_only else variants
    w_sum = max(sum(max(v["w"], 0.0) for v in score_variants), 1e-6)
    ac_tol = max(bpm_resolution, 0.5)
    scored = []
    for b in uniq:
        fft_acc = ac_acc = 0.0
        for v in score_variants:
            if v["w"] <= 0.0:
                continue
            fv = _lookup_nearest_np(v["fft_power"], v["fft_bpms"], b, DEDUP_TOL)
            av = _lookup_nearest_np(v["ac_strength"], v["ac_grid"], b, ac_tol)
            fft_acc += v["w"] * np.clip(fv / max(np.max(v["fft_power"]), 1e-12), 0.0, 1.0)
            ac_acc += v["w"] * np.clip(av / max(np.max(v["ac_strength"]), 1e-12), 0.0, 1.0)
        fft_norm = np.clip(fft_acc / w_sum, 0.0, 1.0)
        ac_norm = np.clip(ac_acc / w_sum, 0.0, 1.0)
        s = 0.55 * ac_norm + 0.45 * fft_norm

        if consensus_bonus > 0.0:
            support = 0
            for v in variants:
                if v["name"] == "full":
                    continue
                sf = np.clip(
                    _lookup_nearest_np(v["fft_power"], v["fft_bpms"], b, DEDUP_TOL)
                    / max(np.max(v["fft_power"]), 1e-12), 0.0, 1.0)
                sa = np.clip(
                    _lookup_nearest_np(v["ac_strength"], v["ac_grid"], b, ac_tol)
                    / max(np.max(v["ac_strength"]), 1e-12), 0.0, 1.0)
                if max(sf, sa) >= support_threshold:
                    support += 1
            if support >= 2:
                s *= 1.0 + consensus_bonus * (support - 1)

        if b > PREFERRED_MAX:
            s *= 0.80
        elif b < PREFERRED_MIN:
            s *= 0.90
        scored.append((b, s, fft_norm, ac_norm))

    scored.sort(key=lambda c: -c[1])
    best = scored[0]
    second_score = scored[1][1] if len(scored) > 1 else 0.0

    # --- tempo-octave fold-down gate (rs:669-699) ---
    if best[0] > PREFERRED_MAX:
        folded = best[0] / 2.0
        if min_bpm <= folded <= max_bpm:
            near = [c for c in scored if abs(c[0] - folded) < DEDUP_TOL]
            if near:
                fc = max(near, key=lambda c: c[1])
                eps = 1e-6
                ac_ratio = (best[3] + eps) / (fc[3] + eps)
                fft_ratio = (best[2] + eps) / (fc[2] + eps)
                if not (ac_ratio > 2.0 and fft_ratio > 2.0):
                    best = fc

    confidence = (
        np.clip((best[1] - second_score) / best[1], 0.0, 1.0) if best[1] > 1e-12 else 0.0
    )
    agreement = int(fft_primary > 0.0 and abs(fft_primary - best[0]) < 2.0) + int(
        ac_primary > 0.0 and abs(ac_primary - best[0]) < 2.0
    )
    return {
        "bpm": best[0],
        "confidence": confidence,
        "method_agreement": agreement,
        "scored": scored,
    }


# ---------------------------------------------------------------------------
# HMM beat tracker (port of beat_tracking/hmm.rs:121-441, float64)
# ---------------------------------------------------------------------------

HMM_NUM_STATES = 5
HMM_TIMING_TOL_S = 0.05
HMM_EMISSION_SIGMA = HMM_TIMING_TOL_S / 2.0


def hmm_track_beats_np(onsets: np.ndarray, bpm_estimate: float):
    """Viterbi beat tracking: 5 tempo states, 0.7/0.15 transitions, Gaussian
    emissions on distance-to-nearest-onset, beats where emission > 0.1 with
    confidence 0.7*emission + 0.3*alignment (hmm.rs:150-441).

    Returns (beat_times, confidences, states) as float64 arrays. Note the
    reference's emissions are state-INDEPENDENT (expected beat time is the
    frame time for every state, hmm.rs:264-268), so the state sequence only
    reports tempo drift; it does not move the beats.
    """
    onsets = np.asarray(onsets, np.float64)
    if len(onsets) == 0 or bpm_estimate <= 0:
        return np.zeros(0), np.zeros(0), np.zeros(0, np.int64)

    trans = np.zeros((HMM_NUM_STATES, HMM_NUM_STATES))
    for i in range(HMM_NUM_STATES):
        for j in range(HMM_NUM_STATES):
            d = abs(i - j)
            trans[i, j] = 0.7 if d == 0 else (0.15 if d == 1 else 0.0)
    trans /= trans.sum(axis=1, keepdims=True)

    start, end = onsets[0], onsets[-1]
    beat_interval = 60.0 / bpm_estimate
    num_frames = int(np.ceil((end - start) / beat_interval)) + 1

    frame_times = start + np.arange(num_frames) * beat_interval
    dist = np.abs(frame_times[:, None] - onsets[None, :]).min(axis=1)
    em = np.exp(-(dist**2) / (2.0 * HMM_EMISSION_SIGMA**2))  # [T]

    # Viterbi forward (multiplicative, first-max-wins ties like the Rust's
    # `prob > best_prob`)
    vit = np.zeros((num_frames, HMM_NUM_STATES))
    bp = np.zeros((num_frames, HMM_NUM_STATES), np.int64)
    vit[0] = em[0] / HMM_NUM_STATES
    for t in range(1, num_frames):
        scores = vit[t - 1][:, None] * trans  # [prev, s]
        bp[t] = np.argmax(scores, axis=0)  # first max wins
        vit[t] = scores.max(axis=0) * em[t]

    path = np.zeros(num_frames, np.int64)
    path[-1] = int(np.argmax(vit[-1]))
    for t in range(num_frames - 2, -1, -1):
        path[t] = bp[t + 1][path[t + 1]]

    is_beat = em > 0.1
    align = np.where(dist < HMM_TIMING_TOL_S, 1.0 - dist / HMM_TIMING_TOL_S, 0.0)
    conf = np.minimum(0.7 * em + 0.3 * align, 1.0)
    return frame_times[is_beat], conf[is_beat], path


# ---------------------------------------------------------------------------
# multi-resolution fusion (port of multi_resolution.rs:205-867, float64)
# ---------------------------------------------------------------------------

def beat_contrast_np(novelty: np.ndarray, sr: int, hop: int, bpm: float) -> float:
    """Phase-optimized beat-contrast alignment (multi_resolution.rs:580-678)."""
    novelty = np.asarray(novelty, np.float64)
    n = len(novelty)
    if n < 16 or not np.isfinite(bpm) or bpm <= 0:
        return 0.0
    fpb = 60.0 * sr / (bpm * hop)
    if not np.isfinite(fpb) or fpb < 3.0:
        return 0.0
    period = int(round(fpb))
    if not (3 <= period <= 512):
        return 0.0
    w = 2
    total = max(novelty.sum(), 1e-6)
    best = -1e9
    for phase in range(period):
        bs = bn = hs = hn = ts = tn = 0.0
        i = phase
        while i < n:
            bs += novelty[max(i - w, 0):min(i + w + 1, n)].max()
            bn += 1
            if period >= 6:
                j = i + period // 2
                if j < n:
                    hs += novelty[max(j - w, 0):min(j + w + 1, n)].max()
                    hn += 1
            if period >= 9:
                for frac in (1, 2):
                    j = i + (period * frac) // 3
                    if j < n:
                        ts += novelty[max(j - w, 0):min(j + w + 1, n)].max()
                        tn += 1
            i += period
        bm = bs / bn if bn else 0.0
        hm = hs / hn if hn else 0.0
        tm = ts / tn if tn else 0.0
        contrast = bm - 0.6 * hm - 0.4 * tm
        best = max(best, float(np.clip(contrast / max(total / n, 1e-6), -10, 10)))
    return best


def _cand_lookup_np(cands, bpm, tol):
    """Nearest candidate's score within tol (multi_resolution.rs:282-293)."""
    best_d, best_s = np.inf, 0.0
    for cb, cs in cands:
        d = abs(cb - bpm)
        if d <= tol and d < best_d:
            best_d, best_s = d, cs
    return best_s


def multires_fuse_np(
    c256, c512_top, c1024, novelty_512, sr: int,
    min_bpm: float, max_bpm: float, tol: float,
    w512: float, w256: float, w1024: float,
    dt512: float, margin_threshold: float, use_human_prior: bool,
):
    """Hypothesis fusion H(T)/H(2T)/H(T/2) with structural discounts,
    support-ratio guardrails, margin-gated switching, dedup, post-hoc
    fold-down/up, and the triplet-family beat-contrast search
    (multi_resolution.rs:276-867). Candidate lists are [(bpm, score)].

    One note pinned here: on the margin-gated fallback to T the reference
    assigns the PRE-prior ``h_t`` as the score (rs:503-508 uses the local
    variable, not the prior-scaled list entry); for T outside 60-180 that
    differs from re-applying the prior.
    """
    def prior(b, s):
        if b > 210.0:
            return s * 0.80
        if b > 180.0:
            return s * 0.90
        if b < 60.0:
            return s * 0.92
        return s

    hyps = []
    for t_bpm, _ts in c512_top:
        if not (np.isfinite(t_bpm) and t_bpm > 0):
            continue
        s_t = [_cand_lookup_np(c, t_bpm, tol) for c in (c512_top, c256, c1024)]
        s_2t = [_cand_lookup_np(c, t_bpm * 2, tol) for c in (c512_top, c256, c1024)]
        s_h = [_cand_lookup_np(c, t_bpm * 0.5, tol) for c in (c512_top, c256, c1024)]

        h_t = w512 * s_t[0] + w256 * s_t[1] + w1024 * s_t[2]
        h_2t = (w512 * (dt512 * s_t[0] + (1 - dt512) * s_2t[0])
                + w256 * s_2t[1] + w1024 * s_2t[2])
        h_half = (w512 * (dt512 * s_t[0] + (1 - dt512) * s_h[0])
                  + w256 * s_h[1] + w1024 * s_h[2])
        if s_t[2] > s_h[2] * 1.02:
            h_half *= 0.90
        if s_t[2] > s_2t[2] * 1.02:
            h_2t *= 0.90
        eps = 1e-6
        r2t = (s_2t[1] + eps) / (s_t[1] + eps)
        if r2t < 1.10:
            h_2t *= 0.75
        if r2t < 1.00:
            h_2t *= 0.75
        rh = (s_h[2] + eps) / (s_t[2] + eps)
        if rh < 1.10:
            h_half *= 0.75
        if rh < 1.00:
            h_half *= 0.75

        local = [(b, s) for b, s in
                 ((t_bpm, h_t), (t_bpm * 2, h_2t), (t_bpm * 0.5, h_half))
                 if min_bpm <= b <= max_bpm]
        local = [(b, prior(b, s)) for b, s in local]
        local.sort(key=lambda x: -x[1])
        if not local:
            continue
        best_b, best_s = local[0]
        second_s = local[1][1] if len(local) > 1 else 0.0
        margin = best_s - second_s
        chosen_b, chosen_s = best_b, best_s
        if abs(chosen_b - t_bpm) > 1e-3 and margin < margin_threshold:
            chosen_b, chosen_s = t_bpm, h_t  # RAW h_t (rs:503-508)
        if (margin < margin_threshold and use_human_prior
                and 70.0 <= chosen_b <= 180.0 and margin < 0.05):
            chosen_s += 0.05
        hyps.append((chosen_b, chosen_s))

    if not hyps:
        return None
    hyps.sort(key=lambda x: -x[1])
    unique = []
    for b, s in hyps:
        if any(abs(b - ub) < 0.75 for ub, _ in unique):
            continue
        unique.append((b, s))
        if len(unique) >= 8:
            break
    best_b, best_s = unique[0]

    def total_support(bpm):
        vals = [_cand_lookup_np(c, bpm, tol) for c in (c256, c512_top, c1024)]
        return sum(vals), sum(v > 0 for v in vals)

    # fold-down
    if best_b >= 170.0:
        half = best_b * 0.5
        if 70.0 <= half <= 120.0:
            sb, _ab = total_support(best_b)
            sh_, ah = total_support(half)
            if ah >= 3 and sh_ > 0 and sb > 0 and sh_ / sb >= 0.45:
                best_b, best_s = half, sh_
    # fold-up
    if best_b <= 80.0:
        dbl = best_b * 2.0
        if 70.0 <= dbl <= 180.0:
            sb, _ = total_support(best_b)
            sd, ad = total_support(dbl)
            if ad >= 2 and sd > 0 and sb > 0 and sd / sb >= 0.55:
                best_b, best_s = dbl, sd

    # triplet-family search
    if 70.0 <= best_b <= 180.0 and len(novelty_512) > 0:
        fams = []
        for f in (1.0, 1.5, 2.0 / 3.0, 2.0 / 3.0, 4.0 / 3.0, 0.75):
            b = best_b * f
            if not (np.isfinite(b) and min_bpm <= b <= max_bpm and 70.0 <= b <= 180.0):
                continue
            s, a = total_support(b)
            if a < 2 or s <= 0:
                continue
            fams.append((b, s, beat_contrast_np(novelty_512, sr, 512, b)))
        if len(fams) >= 2:
            best_support = max(max(f[1] for f in fams), 1e-6)
            max_alt = max((f[1] / best_support for f in fams
                           if abs(f[0] - best_b) > 0.75), default=0.0)
            if max_alt >= 0.45:
                chosen = max(fams, key=lambda f: f[2] + 0.35 * min(max(f[1] / best_support, 0.0), 1.0))
                cur_align = beat_contrast_np(novelty_512, sr, 512, best_b)
                if abs(chosen[0] - best_b) > 0.75 and chosen[2] >= cur_align + 0.40:
                    best_b, best_s = chosen[0], chosen[1]

    second = unique[1][1] if len(unique) > 1 else 0.0
    conf = (max(best_s - second, 0.0) / best_s) if best_s > 1e-6 else 0.0
    conf = float(np.clip(conf, 0.0, 1.0))
    _, agree = total_support(best_b)
    return {"bpm": best_b, "confidence": conf, "method_agreement": agree}


# ---------------------------------------------------------------------------
# legacy candidate merge (port of candidate_filter.rs:40-440, float64)
# ---------------------------------------------------------------------------

def merge_bpm_candidates_np(autocorr, comb, octave_tolerance_cents: float = 50.0):
    """Octave correction against comb top-3, top-10+reasonable limiting,
    +-2 BPM running-mean grouping, agreement boost (avg+max)/2*1.2,
    disagreement penalty, consensus boosts (1.5/1.3/1.4), 2x safety boost,
    and the effective-confidence sort (candidate_filter.rs:40-440).

    ``autocorr``/``comb``: [(bpm, confidence)] sorted by confidence desc.
    Returns [(bpm, confidence, method_agreement)] best-first.
    """
    if not autocorr and not comb:
        return []
    tol_ratio = 2.0 ** (octave_tolerance_cents / 1200.0)

    ac = [list(c) for c in autocorr]
    comb_top3 = comb[:3]
    for cand in ac:  # 2x errors (rs:160-185)
        for cb, _cc in comb_top3:
            ratio_to_target = (cand[0] / cb) / 2.0
            if abs(ratio_to_target - 1.0) < (tol_ratio - 1.0):
                if (60.0 <= cb <= 180.0) or cand[0] > 200.0 or cand[0] < 30.0:
                    cand[0] = cb
                    break
    for cand in ac:  # 0.5x errors (rs:188-210)
        for cb, _cc in comb_top3:
            ratio_to_target = (cb / cand[0]) / 2.0
            if abs(ratio_to_target - 1.0) < (tol_ratio - 1.0) and 60.0 <= cb <= 180.0:
                cand[0] = cb
                break

    disagreement = False
    if ac and comb:
        d = abs(ac[0][0] - comb[0][0])
        disagreement = 10.0 < d < 50.0

    ac_lim = [tuple(c) for c in ac[:10]]
    for c in ac:  # re-add reasonable-range candidates (rs:247-262)
        if 60.0 <= c[0] <= 180.0 and not any(abs(g[0] - c[0]) < 1.0 for g in ac_lim):
            ac_lim.append(tuple(c))
    comb_lim = [tuple(c) for c in comb[:10]]

    groups = []  # [mean_bpm, total_conf, count, max_conf]
    for b, c in list(ac_lim) + list(comb_lim):
        for g in groups:
            if abs(b - g[0]) <= 2.0:
                g[0] = (g[0] * g[2] + b) / (g[2] + 1)
                g[1] += c
                g[2] += 1
                g[3] = max(g[3], c)
                break
        else:
            groups.append([b, c, 1, c])

    estimates = []
    for bpm, total, count, mx in groups:
        if count >= 2:
            conf = min((total / count + mx) / 2.0 * 1.2, 1.0)
        else:
            conf = min(total, 1.0)
        if disagreement and count == 1:
            conf *= 0.7
        estimates.append([bpm, conf, count])

    ac5, cb5 = ac_lim[:5], comb_lim[:5]
    for e in estimates:  # consensus boosts (rs:50-113)
        ad = any(abs(a[0] - e[0]) < 2.5 for a in ac5)
        cd = any(abs(c[0] - e[0]) < 2.5 for c in cb5)

        def harm(lst):
            out = False
            for b, _ in lst:
                r = max(b / e[0], e[0] / b)
                out |= abs(r - 2.0) < 0.1 or abs(r - 1.5) < 0.1 or abs(r - 0.75) < 0.1
            return out

        if ad and cd:
            e[1] *= 1.5
        elif (ad and harm(cb5)) or (cd and harm(ac5)):
            e[1] *= 1.3
        if cd and 60.0 <= e[0] <= 180.0:
            e[1] *= 1.4

    if not any(60.0 <= e[0] <= 180.0 for e in estimates[:5]):
        for e in estimates:
            if 60.0 <= e[0] <= 180.0:
                e[1] *= 2.0  # safety boost (rs:355-381)
                break

    import functools

    def cmp(a, b):
        a_in = 60.0 <= a[0] <= 180.0
        b_in = 60.0 <= b[0] <= 180.0
        ae = a[1] if a_in else a[1] * 0.5
        be = b[1] if b_in else b[1] * 0.5
        if abs(ae - be) < 0.5:
            if a_in and not b_in:
                return -1
            if b_in and not a_in:
                return 1
        if be > ae:
            return 1
        if ae > be:
            return -1
        return -1 if a[2] > b[2] else (1 if b[2] > a[2] else 0)

    estimates.sort(key=functools.cmp_to_key(cmp))
    return [(e[0], e[1], e[2]) for e in estimates]


def legacy_merge_top_np(
    autocorr, comb, octave_tolerance_cents: float = 50.0,
    guardrail_muls=None, preferred_range=(60.0, 180.0),
):
    """merge_bpm_candidates + the module-level selection (mod.rs:296-339):
    optional guardrail multipliers with re-sort, then promotion of the first
    merged estimate matching autocorr's top preferred-range candidate.

    ``guardrail_muls``: None, or (ranges, muls) as
    ((pmin, pmax, smin, smax), (mul_pref, mul_soft, mul_extreme)).
    Returns (bpm, confidence, method_agreement) of the selected estimate,
    or None.
    """
    merged = merge_bpm_candidates_np(autocorr, comb, octave_tolerance_cents)
    if not merged:
        return None
    merged = [list(e) for e in merged]
    if guardrail_muls is not None:
        (pmin, pmax, smin, smax), (m_pref, m_soft, m_ext) = guardrail_muls
        for e in merged:
            if pmin <= e[0] <= pmax:
                e[1] *= m_pref
            elif smin <= e[0] <= smax:
                e[1] *= m_soft
            else:
                e[1] *= m_ext
        merged.sort(key=lambda e: -e[1])
        preferred_range = (pmin, pmax)

    ac_top_pref = next(
        (b for b, _c in autocorr if preferred_range[0] <= b <= preferred_range[1]), None
    )
    if ac_top_pref is not None:
        for i, e in enumerate(merged):
            if abs(e[0] - ac_top_pref) < 2.0:
                merged.insert(0, merged.pop(i))
                break
    return tuple(merged[0])


# ---------------------------------------------------------------------------
# onset consensus voting (port of onset/consensus.rs:111-287, exact ints)
# ---------------------------------------------------------------------------

def vote_onsets_np(method_onsets, weights, tolerance_ms: int, sample_rate: int):
    """Greedy tolerance clustering + weighted voting, ported loop-for-loop:
    sorted merge, join the first cluster with ANY member within tolerance,
    integer-floor cluster centers, per-ONSET weight sums (a method firing
    twice inside one cluster contributes its weight twice before the clamp),
    confidence-descending output.

    ``method_onsets``: list of 4 sample-position lists. Returns
    [(center_sample, confidence, voted_by)] sorted confidence-desc.
    """
    tol = int(tolerance_ms / 1000.0 * sample_rate)
    all_onsets = []
    for m, onsets in enumerate(method_onsets):
        for s in onsets:
            all_onsets.append((int(s), m, weights[m]))
    if not all_onsets:
        return []
    all_onsets.sort(key=lambda o: o[0])

    clusters = []
    for o in all_onsets:
        for cl in clusters:
            if any(abs(o[0] - e[0]) <= tol for e in cl):
                cl.append(o)
                break
        else:
            clusters.append([o])

    max_weight = sum(weights)
    out = []
    for cl in clusters:
        center = sum(e[0] for e in cl) // len(cl)  # integer floor division
        total_w = sum(e[2] for e in cl)
        voted_by = len({e[1] for e in cl})
        conf = min(max(total_w / max_weight, 0.0), 1.0) if max_weight > 0 else 0.0
        out.append((center, conf, voted_by))
    out.sort(key=lambda c: -c[1])
    return out


# ---------------------------------------------------------------------------
# comb filterbank scoring (port of comb_filter.rs:150-400, beat-centric)
# ---------------------------------------------------------------------------

def comb_score_np(onsets, sample_rate: int, bpm: float, tolerance: float) -> float:
    """Literal beat-centric score (comb_filter.rs:342-397): for each expected
    beat on the grid anchored at sample 0, check whether the NEAREST onset is
    within tolerance*period; normalize by the expected-beat count."""
    if len(onsets) == 0:
        return 0.0
    onsets = np.asarray(sorted(onsets), np.float64)
    period = 60.0 * sample_rate / bpm
    tol = period * tolerance
    last = onsets[-1]
    num_beats = int(np.ceil(last / period)) + 1
    aligned = 0
    for k in range(num_beats):
        expected = k * period
        d = np.abs(onsets - expected).min()
        if d <= tol:
            aligned += 1
    return aligned / num_beats if num_beats > 0 else 0.0


def comb_confidences_np(onsets, sample_rate: int, grid) -> np.ndarray:
    """Adaptive-tolerance scores over the grid, normalized by the max
    (comb_filter.rs:150-180): tolerance = clamp(0.1 * 120/bpm, 0.05, 0.15)."""
    scores = np.array([
        comb_score_np(
            onsets, sample_rate, b,
            float(np.clip(0.10 * (120.0 / b), 0.05, 0.15)),
        )
        for b in grid
    ])
    mx = scores.max()
    return scores / mx if mx > 1e-10 else scores


# ---------------------------------------------------------------------------
# beat-grid aggregation (ports of beat_tracking/{mod,time_signature}.rs)
# ---------------------------------------------------------------------------

def detect_downbeats_np(beats, bpm_estimate: float, beats_per_bar: int):
    """Sequential downbeat chain (mod.rs:363-404): first beat is a downbeat;
    each later beat is one iff within +-10% of a bar interval AFTER the last
    ACCEPTED downbeat (the chain resets on acceptance)."""
    beats = list(beats)
    if not beats or bpm_estimate <= 0:
        return []
    bar = (60.0 / bpm_estimate) * beats_per_bar
    tol = bar * 0.1
    down = [beats[0]]
    for t in beats[1:]:
        if abs(t - (down[-1] + bar)) <= tol:
            down.append(t)
    return down


def grid_stability_np(beat_times) -> float:
    """1 / (1 + CV of positive beat intervals) (mod.rs:425-485)."""
    bt = np.asarray(beat_times, np.float64)
    if len(bt) < 2:
        return 0.0
    iv = np.diff(bt)
    iv = iv[iv > 0]
    if len(iv) == 0:
        return 0.0
    mean = iv.mean()
    if mean <= 1e-10:
        return 0.0
    cv = np.sqrt(((iv - mean) ** 2).mean()) / mean
    return float(1.0 / (1.0 + cv))


def detect_time_signature_np(beats):
    """Hypothesis scoring at lags {4, 3, 6}: 0.7 * interval-autocorrelation
    similarity + 0.3 * consistency 1/(1+CV) (time_signature.rs:90-199);
    < 8 beats -> (4, 0.5). Returns (beats_per_bar, confidence)."""
    beats = np.asarray(beats, np.float64)
    if len(beats) < 8:
        return 4, 0.5
    iv = np.diff(beats)
    iv = iv[iv > 0]
    if len(iv) == 0:
        return 4, 0.5
    mean = iv.mean()
    cv = np.sqrt(((iv - mean) ** 2).mean()) / mean if mean > 1e-10 else 1.0
    consistency = 1.0 / (1.0 + cv)

    def score(lag):
        if len(iv) < lag:
            return 0.0
        sims = [1.0 / (1.0 + abs(iv[i] - iv[i + lag]) / mean)
                for i in range(len(iv) - lag)]
        if not sims:
            return 0.0
        return min(sum(sims) / len(sims) * 0.7 + consistency * 0.3, 1.0)

    scores = [(4, score(4)), (3, score(3)), (6, score(6))]
    best = max(scores, key=lambda s: s[1])
    return best[0], float(np.clip(best[1], 0.0, 1.0))


def detect_tempo_variations_np(beats, nominal_bpm: float):
    """Segment-CV variation detection (tempo_variation.rs:96-231): segments
    of clamp(total/4, 4..8) s at 50% hop over the beat list; a segment with
    >= 3 beats is variable iff its interval CV > 0.15. Returns
    (segments [(start, end, bpm, confidence, is_variable)], has_variation)."""
    beats = np.asarray(beats, np.float64)
    if len(beats) < 4:
        seg = (beats[0] if len(beats) else 0.0,
               beats[-1] if len(beats) else 0.0, nominal_bpm, 0.5, False)
        return [seg], False
    total = beats[-1] - beats[0]
    if total < 2.0:
        return [(beats[0], beats[-1], nominal_bpm, 0.8, False)], False

    seg_dur = float(np.clip(total / 4.0, 4.0, 8.0))
    hop = seg_dur * 0.5
    segments = []
    start = beats[0]
    while start < beats[-1]:
        end = min(start + seg_dur, beats[-1])
        sb = beats[(beats >= start) & (beats <= end)]
        if len(sb) >= 3:
            iv = np.diff(sb)
            iv = iv[iv > 0]
            if len(iv):
                mean = iv.mean()
                cv = (np.sqrt(((iv - mean) ** 2).mean()) / mean) if mean > 1e-10 else 0.0
                bpm = 60.0 / mean if mean > 1e-10 else nominal_bpm
                conf = max(1.0 - min(cv / 0.3, 1.0), 0.0)
                segments.append((start, end, bpm, conf, cv > 0.15))
        start += seg_dur - hop
    if not segments:
        segments = [(beats[0], beats[-1], nominal_bpm, 0.8, False)]
    return segments, any(s[4] for s in segments)


# ---------------------------------------------------------------------------
# spectral-flux / HFC onset detectors (ports of onset/{spectral_flux,hfc}.rs)
# ---------------------------------------------------------------------------

def _flux_peak_pick_np(flux, threshold_percentile: float):
    """Percentile threshold sorted[floor(n*pct)] + local-max peak pick with
    the reference's edge handling (spectral_flux.rs:165-216): interior peaks
    are flux > prev and >= next; first entry counts if >= its neighbor; last
    if > its neighbor. Onset frame = flux index + 1."""
    flux = np.asarray(flux, np.float64)
    if len(flux) == 0:
        return []
    s = np.sort(flux)
    idx = min(int(len(s) * threshold_percentile), len(s) - 1)
    thr = s[idx]
    onsets = []
    for i in range(1, len(flux) - 1):
        if flux[i] > thr and flux[i] > flux[i - 1] and flux[i] >= flux[i + 1]:
            onsets.append(i + 1)
    if len(flux) > 1 and flux[0] > thr and flux[0] >= flux[1]:
        onsets.append(1)
    last = len(flux) - 1
    if len(flux) > 1 and flux[last] > thr and flux[last] > flux[last - 1]:
        onsets.append(len(flux))
    return sorted(set(onsets))


def spectral_flux_onsets_np(spec, threshold_percentile: float):
    """Per-frame max-normalize -> HWR L2 flux -> threshold + peak pick
    (spectral_flux.rs:69-221). Returns onset FRAME indices."""
    spec = np.asarray(spec, np.float64)
    if len(spec) < 2:
        return []
    mx = spec.max(axis=1, keepdims=True)
    norm = np.where(mx > 1e-10, spec / np.where(mx > 1e-10, mx, 1.0), 0.0)
    d = np.maximum(norm[1:] - norm[:-1], 0.0)
    flux = np.sqrt((d * d).sum(axis=1))
    return _flux_peak_pick_np(flux, threshold_percentile)


def hfc_onsets_np(spec, threshold_percentile: float):
    """HFC[n] = sum_k k*|X|^2 -> HWR flux -> threshold + peak pick
    (hfc.rs:57-220). Returns onset FRAME indices."""
    spec = np.asarray(spec, np.float64)
    if len(spec) < 2:
        return []
    k = np.arange(spec.shape[1])
    hfc = (k[None, :] * spec * spec).sum(axis=1)
    flux = np.maximum(hfc[1:] - hfc[:-1], 0.0)
    return _flux_peak_pick_np(flux, threshold_percentile)


# ---------------------------------------------------------------------------
# silence detection/trim (port of preprocessing/silence.rs:102-279, float64)
# ---------------------------------------------------------------------------

def detect_and_trim_np(samples, sample_rate: int, threshold_db: float,
                       frame_size: int, min_duration_ms: int = 500):
    """50%-overlap frame RMS -> threshold -> region building with the
    reference's keep rules (interior runs must last >= min_duration; leading/
    trailing runs always count) -> leading/trailing trim. Returns
    (trim_start, trim_end, regions)."""
    x = np.asarray(samples, np.float64)
    n = len(x)
    if n == 0:
        return 0, 0, []
    thr = 10.0 ** (threshold_db / 20.0)
    hop = frame_size // 2
    num_frames = (n - frame_size) // hop + 1 if n >= frame_size else 1
    starts, silent = [], []
    for i in range(num_frames):
        s = i * hop
        e = min(s + frame_size, n)
        rms = np.sqrt((x[s:e] ** 2).sum() / (e - s)) if e > s else 0.0
        starts.append(s)
        silent.append(rms <= thr)

    min_frames = -(-int(min_duration_ms / 1000.0 * sample_rate) // hop)
    regions = []
    in_sil, sil_start = False, 0
    for i, is_sil in enumerate(silent):
        if is_sil and not in_sil:
            in_sil, sil_start = True, i
        elif not is_sil and in_sil:
            in_sil = False
            if (i - sil_start) >= min_frames or sil_start == 0 or i == num_frames:
                end_sample = starts[i] if i < len(starts) else n
                regions.append((starts[sil_start], end_sample))
    if in_sil and ((num_frames - sil_start) >= min_frames or sil_start == 0):
        regions.append((starts[sil_start], n))

    trim_start = regions[0][1] if regions and regions[0][0] == 0 else 0
    trim_end = regions[-1][0] if regions and regions[-1][1] == n else n
    trim_start = min(trim_start, trim_end)
    trim_end = max(trim_end, trim_start)
    return trim_start, trim_end, regions


def tuning_offset_np(spec, sample_rate: int, fft_size: int, fmin: float,
                     fmax: float, frame_step: int, peak_rel_threshold: float) -> float:
    """Weighted circular mean of semitone residuals (extractor.rs:66-170):
    every ``frame_step``-th frame, bins >= peak*thr in [fmin, fmax] vote with
    weight sqrt(mag) at angle 2*pi*residual; |resultant|/sum_w < 0.05 -> 0."""
    spec = np.asarray(spec, np.float64)
    if len(spec) == 0:
        return 0.0
    freq_res = sample_rate / fft_size
    fmin = max(fmin, 20.0)
    fmax = float(np.clip(fmax, fmin + 1.0, sample_rate / 2))
    step = max(frame_step, 1)
    thr = float(np.clip(peak_rel_threshold, 0.0, 1.0))
    s_sin = s_cos = s_w = 0.0
    freqs = np.arange(spec.shape[1]) * freq_res
    band = (freqs >= fmin) & (freqs <= fmax)
    for t in range(0, len(spec), step):
        frame = spec[t]
        peak = frame[band].max() if band.any() else 0.0
        if peak <= 1e-12:
            continue
        sel = band & (frame >= peak * thr)
        for b in np.nonzero(sel)[0]:
            semitone = 12.0 * np.log2(freqs[b] / A4_FREQ) + SEMITONE_OFFSET
            residual = semitone - np.round(semitone)
            w = np.sqrt(max(frame[b], 0.0))
            if w <= 0.0:
                continue
            ang = 2.0 * np.pi * residual
            s_sin += w * np.sin(ang)
            s_cos += w * np.cos(ang)
            s_w += w
    if s_w <= 1e-6:
        return 0.0
    r = np.hypot(s_sin, s_cos) / s_w
    if r < 0.05:
        return 0.0
    return float(np.arctan2(s_sin, s_cos) / (2.0 * np.pi))


def frame_to_hpcp_np(frame, sample_rate: int, fft_size: int, sigma: float,
                     tuning_offset: float, peaks_per_frame: int,
                     num_harmonics: int, harmonic_decay: float,
                     mag_power: float, fmin: float = CHROMA_FMIN_HZ,
                     fmax: float = CHROMA_FMAX_HZ) -> np.ndarray:
    """HPCP via top-K in-band local maxima + harmonic summation with
    decay^(h-1)/h weights and +-1-class Gaussian soft mapping
    (extractor.rs:582-680). Peak condition: > prev and >= next."""
    frame = np.asarray(frame, np.float64)
    freq_res = sample_rate / fft_size
    peaks = []
    for b in range(1, len(frame) - 1):
        f = b * freq_res
        if f < fmin:
            continue
        if f > fmax:
            break
        if frame[b] <= frame[b - 1] or frame[b] < frame[b + 1]:
            continue
        peaks.append((b, frame[b]))
    pc = np.zeros(12)
    if not peaks:
        return pc
    peaks.sort(key=lambda p: -p[1])
    peaks = peaks[: max(min(peaks_per_frame, len(peaks)), 1)]

    sigma = max(sigma, 1e-6)
    hmax = max(num_harmonics, 1)
    decay = float(np.clip(harmonic_decay, 0.0, 1.0))
    p = float(np.clip(mag_power, 0.05, 1.0))
    for b, _v in peaks:
        f0 = b * freq_res
        if f0 <= 0.0:
            continue
        w0 = max(frame[b], 0.0) ** p
        if w0 <= 0.0:
            continue
        for h in range(1, hmax + 1):
            fh = f0 * h
            if fh > fmax:
                break
            if fh < fmin:
                continue
            semitone = 12.0 * np.log2(fh / A4_FREQ) + SEMITONE_OFFSET - tuning_offset
            st_pc = semitone % 12.0
            primary = int(round(st_pc)) % 12
            hw = (decay ** (h - 1)) / h
            contrib = w0 * hw
            for off in (-1, 0, 1):
                target = (primary + off) % 12
                dist = abs(st_pc - target)
                dist = min(dist, 12.0 - dist)
                pc[target] += contrib * np.exp(-dist * dist / (2.0 * sigma * sigma))
    norm = np.sqrt((pc**2).sum())
    return pc / norm if norm > EPSILON else pc


def harmonic_time_mask_np(spec, smooth_margin: int, mask_power: float) -> np.ndarray:
    """Time-smoothed soft harmonic mask (extractor.rs:1246-1349):
    H = boxcar time mean, P = max(0, X - H), out = X * H^p/(H^p + P^p)."""
    x = np.maximum(np.asarray(spec, np.float64), 0.0)
    n = len(x)
    h = np.empty_like(x)
    for t in range(n):
        lo, hi = max(t - smooth_margin, 0), min(t + smooth_margin + 1, n)
        h[t] = x[lo:hi].mean(axis=0)
    p = max(mask_power, 1.0)
    r = np.maximum(x - h, 0.0)
    hp, rp = h**p, r**p
    return x * (hp / (hp + rp + 1e-12))


def bayesian_update_np(onsets, current_bpm: float,
                       likelihood_sigma: float = 0.05):
    """One Bayesian tempo update (bayesian.rs:104-254): candidates
    [max(cur-5, 60), min(cur+5, 180)] @ 0.5; likelihood = exp(mean of
    -d^2/2sigma^2) on alignment to the candidate grid anchored at the first
    onset; first-max tie; confidence = likelihood * change penalty
    (1.0 / 0.8 / 0.5 at |change| < 1 / < 3 / >=3)."""
    onsets = np.asarray(onsets, np.float64)
    if len(onsets) == 0:
        return current_bpm, 0.0
    lo = max(current_bpm - 5.0, 60.0)
    hi = min(current_bpm + 5.0, 180.0)
    best_bpm, best_lik = current_bpm, 0.0
    bpm = lo
    while bpm <= hi + 1e-9:
        interval = 60.0 / bpm
        rel = onsets - onsets[0]
        bi = np.round(rel / interval)
        d = np.abs(rel - bi * interval)
        lik = np.exp(np.mean(-(d * d) / (2.0 * likelihood_sigma**2)))
        if lik > best_lik:
            best_lik, best_bpm = lik, bpm
        bpm += 0.5
    change = abs(best_bpm - current_bpm)
    penalty = 1.0 if change < 1.0 else (0.8 if change < 3.0 else 0.5)
    return best_bpm, min(best_lik * penalty, 1.0)


def detect_key_multi_scale_np(chroma, weights, templates, lengths, hop: int,
                              min_clarity: float, scale_weights=None):
    """Clarity x scale-weight accumulation of refined score tables across
    scales (detector.rs:546-700). Returns (key_idx, confidence, scores[24])
    or None when no segment clears the clarity gate (caller falls back)."""
    chroma = np.asarray(chroma, np.float64)
    n = len(chroma)
    acc = np.zeros(24)
    total_w = 0.0
    used = 0
    for si, seg_len in enumerate(lengths):
        if seg_len == 0 or seg_len > n:
            continue
        sw = scale_weights[si] if scale_weights else 1.0
        if sw <= 0:
            continue
        start = 0
        while start + seg_len <= n:
            seg = chroma[start:start + seg_len]
            wseg = weights[start:start + seg_len] if weights is not None else None
            scores = key_scores_refined(seg, wseg, templates)
            clarity = _key_clarity_np(scores)
            if clarity >= min_clarity:
                used += 1
                cw = clarity * sw
                total_w += cw
                acc += scores * cw
            start += max(hop, 1)
    if used == 0 or total_w <= 1e-12:
        return None
    acc /= total_w
    best = best_key_np(acc)
    order = np.argsort(-acc, kind="stable")
    second = acc[order[1]] if len(order) > 1 else 0.0
    conf = float(np.clip((acc[best] - second) / acc[best], 0, 1)) if acc[best] > 0 else 0.0
    return best, conf, acc


def _key_clarity_np(scores) -> float:
    """(best - mean) / (best - min), clamped (key_clarity.rs:51-93)."""
    s = np.asarray(scores, np.float64)
    best, mean, lo = s.max(), s.mean(), s.min()
    rng = best - lo
    return float(np.clip((best - mean) / rng, 0, 1)) if rng > 1e-10 else 0.0


def detect_key_median_np(chroma, weights, templates, seg_len: int, hop: int,
                         min_segments: int):
    """Most-common segment key (confidence tie-break), confidence from
    confidence-weighted aggregate scores (detector.rs:721-863). Returns
    (key_idx, confidence) or None when < min_segments (caller falls back)."""
    chroma = np.asarray(chroma, np.float64)
    n = len(chroma)
    seg_len = max(min(seg_len, n), 120)
    hop = max(hop, 1)
    seg_results = []
    start = 0
    while start + seg_len <= n:
        seg = chroma[start:start + seg_len]
        wseg = weights[start:start + seg_len] if weights is not None else None
        scores = key_scores_refined(seg, wseg, templates)
        k = best_key_np(scores)
        order = np.argsort(-scores, kind="stable")
        second = scores[order[1]] if len(order) > 1 else 0.0
        conf = float(np.clip((scores[k] - second) / scores[k], 0, 1)) if scores[k] > 0 else 0.0
        seg_results.append((k, conf, scores))
        start += hop
    if len(seg_results) < max(min_segments, 1):
        return None
    counts = {}
    for k, c, _ in seg_results:
        cnt, tot = counts.get(k, (0, 0.0))
        counts[k] = (cnt + 1, tot + c)
    median_key = max(counts, key=lambda k: (counts[k][0], counts[k][1], -k))
    agg = np.zeros(24)
    tw = sum(c for _, c, _ in seg_results)
    if tw > 0:
        for _, c, s in seg_results:
            agg += s * c
        agg /= tw
    order = np.argsort(-agg, kind="stable")
    second = next((agg[i] for i in order if i != median_key), 0.0)
    ms = agg[median_key]
    conf = float(np.clip((ms - second) / ms, 0, 1)) if ms > 0 else 0.0
    return median_key, conf


def spectral_whiten_np(frame, smooth_bins: int) -> np.ndarray:
    """Per-frame moving-average whitening: mag / (local mean + eps), clipped
    at 20 (extractor.rs:556-580); window forced odd, truncated at edges."""
    x = np.maximum(np.asarray(frame, np.float64), 0.0)
    n = len(x)
    win = max(smooth_bins, 3) | 1
    half = win // 2
    out = np.empty(n)
    for i in range(n):
        lo, hi = max(i - half, 0), min(i + half, n - 1)
        mean = x[lo:hi + 1].sum() / max(hi + 1 - lo, 1)
        out[i] = min(x[i] / (mean + 1e-12), 20.0)
    return out


def log_frequency_frame_np(frame, sample_rate: int, fft_size: int,
                           fmin: float, fmax: float) -> np.ndarray:
    """Linear -> semitone-bin conversion with linear interpolation
    (extractor.rs:701-807)."""
    frame = np.asarray(frame, np.float64)
    freq_res = sample_rate / fft_size
    nyquist = sample_rate / 2
    fmin = max(fmin, 20.0)
    fmax = min(fmax, nyquist - 1.0)
    s_min = 12.0 * np.log2(fmin / A4_FREQ) + SEMITONE_OFFSET
    s_max = 12.0 * np.log2(fmax / A4_FREQ) + SEMITONE_OFFSET
    bin_min = int(np.floor(s_min))
    n_out = int(np.ceil(s_max)) - bin_min + 1
    out = np.zeros(n_out)
    for b, mag in enumerate(frame):
        if mag <= 0.0:
            continue
        freq = b * freq_res
        if freq < fmin or freq >= fmax or freq >= nyquist:
            continue
        pos = 12.0 * np.log2(freq / A4_FREQ) + SEMITONE_OFFSET - bin_min
        lo = int(np.floor(pos))
        hi = min(int(np.ceil(pos)), n_out - 1)
        if 0 <= lo < n_out:
            w_hi = pos - lo
            out[lo] += mag * (1.0 - w_hi)
            if hi != lo:
                out[hi] += mag * w_hi
    return out


def find_peaks_np(signal, threshold: float, min_distance: int):
    """Literal port of peak_picking.rs:39-120. Returns [(idx, value)] in the
    post-dedup order (value-descending when min_distance > 0)."""
    signal = np.asarray(signal, np.float64)
    if len(signal) < 3:
        return []
    mx = max(signal.max(initial=0.0), 0.0)
    thr = mx * threshold if (0.0 < threshold < 1.0 and mx > 0.0) else threshold
    if mx < 1e-10:
        return []
    peaks = []
    for i in range(1, len(signal) - 1):
        if signal[i] > signal[i - 1] and signal[i] > signal[i + 1] and signal[i] >= thr:
            peaks.append((i, signal[i]))
    if len(signal) >= 2:
        if signal[0] > signal[1] and signal[0] >= thr:
            peaks.append((0, signal[0]))
        last = len(signal) - 1
        if signal[last] > signal[last - 1] and signal[last] >= thr:
            peaks.append((last, signal[last]))
    if min_distance > 0 and len(peaks) > 1:
        peaks.sort(key=lambda p: -p[1])
        kept = []
        for i, v in peaks:
            if not any(abs(i - j) < min_distance for j, _ in kept):
                kept.append((i, v))
        peaks = kept
    return peaks


def adaptive_threshold_median_mad_np(values, k: float) -> float:
    """Global median + k*MAD with even-length middle averaging
    (threshold.rs:30-72)."""
    s = np.sort(np.asarray(values, np.float64))
    n = len(s)
    med = (s[n // 2 - 1] + s[n // 2]) * 0.5 if n % 2 == 0 else s[n // 2]
    d = np.sort(np.abs(np.asarray(values, np.float64) - med))
    mad = (d[n // 2 - 1] + d[n // 2]) * 0.5 if n % 2 == 0 else d[n // 2]
    return float(med + k * mad)


def smooth_chroma_median_np(chroma, window: int = 5) -> np.ndarray:
    """Per-pitch-class temporal median, edge windows clamped, upper median
    for even-length edge windows (smoothing.rs:37-94)."""
    chroma = np.asarray(chroma, np.float64)
    n = len(chroma)
    if n == 0 or window <= 1:
        return chroma
    if window % 2 == 0:
        window += 1
    half = window // 2
    out = np.empty_like(chroma)
    for t in range(n):
        lo, hi = max(t - half, 0), min(t + half + 1, n)
        w = np.sort(chroma[lo:hi], axis=0)
        out[t] = w[len(w) // 2]
    return out


def key_frame_weights_np(chroma, energies, min_tonalness: float,
                         tonalness_power: float, energy_power: float):
    """Per-frame tonalness^tp * (e/median)^ep weights with the reference's
    sorted[len/2] median and the <10-usable-frames fallback to None
    (lib.rs:1236-1287)."""
    chroma = np.asarray(chroma, np.float64)
    energies = np.asarray(energies, np.float64)
    med = max(np.sort(energies)[len(energies) // 2], 1e-12)
    weights = []
    for ch, e in zip(chroma, energies):
        s = ch.sum()
        if s <= 1e-12:
            tonal = 0.0
        else:
            p = ch / s
            ent = -(p[p > 1e-12] * np.log(p[p > 1e-12])).sum()
            tonal = float(np.clip(1.0 - ent / np.log(12.0), 0.0, 1.0))
        if tonal < min_tonalness:
            tonal = 0.0
        e_norm = max(e / med, 0.0)
        weights.append(max(tonal ** max(tonalness_power, 0.0)
                           * e_norm ** max(energy_power, 0.0), 0.0))
    w = np.asarray(weights)
    if w.sum() <= 1e-12 or (w > 0).sum() < 10:
        return None
    return w


def detect_key_segment_voting_np(chroma, weights, templates, seg_len: int,
                                 hop: int, min_clarity: float):
    """Clarity-weighted segment score accumulation (lib.rs:1332-1436).
    Returns the winning key index 0-23 (argmax of the accumulated table;
    the reference's stable majors-then-minors sort == first argmax), or the
    whole-track detection when no segment clears the clarity gate or the
    track is shorter than one segment."""
    chroma = np.asarray(chroma, np.float64)
    n = len(chroma)
    if not (n >= max(seg_len, 1) and seg_len >= 120 and hop >= 1):
        return best_key_np(key_scores_refined(chroma, weights, templates))
    seg_len = min(seg_len, n)
    hop = max(min(hop, seg_len), 1)
    acc = np.zeros(24)
    used = 0
    start = 0
    while start + seg_len <= n:
        seg = chroma[start:start + seg_len]
        wseg = weights[start:start + seg_len] if weights is not None else None
        scores = key_scores_refined(seg, wseg, templates)
        clarity = _key_clarity_np(scores)
        if clarity >= np.clip(min_clarity, 0.0, 1.0):
            used += 1
            acc += scores * clarity
        start += hop
    if used == 0:
        return best_key_np(key_scores_refined(chroma, weights, templates))
    return best_key_np(acc)


def key_chain_np(
    samples,
    sample_rate: int,
    *,
    frame_size: int = 8192,
    hop: int = 512,
    smooth_margin: int = 12,
    mask_power: float = 2.0,
    sigma: float = 0.5,
    tuning_offset: float = 0.0,
    peaks_per_frame: int = 24,
    num_harmonics: int = 4,
    harmonic_decay: float = 0.60,
    mag_power: float = 0.50,
    bass_blend: bool = False,
    bass_fmin: float = 55.0,
    bass_fmax: float = 300.0,
    bass_weight: float = 0.35,
    min_tonalness: float = 0.0,
    tonalness_power: float = 2.0,
    energy_power: float = 0.50,
    edge_trim_fraction: float = 0.0,
    detector: str = "segment_voting",
    seg_len: int = 1024,
    seg_hop: int = 512,
    seg_min_clarity: float = 0.20,
    multi_scale_lengths=(120, 360, 720),
    multi_scale_hop: int = 60,
    multi_scale_min_clarity: float = 0.20,
    template_set: str = "kk",
) -> int:
    """Float64 whole-track key chain, a literal composition of the existing
    reference ports: key STFT (8192/512, Hann n-1) -> harmonic time mask ->
    HPCP (optional bass blend) -> median smoothing -> optional edge trim ->
    tonalness/energy frame weights -> segment-voting (or multi-scale)
    detection. This is the cross-check for the repo's characterization keys
    (round-4 verdict missing item 4): a pinned variant key is only a
    'reference-faithful' claim if this port reproduces it on the same
    samples (lib.rs:961-1559 end to end)."""
    spec = stft_magnitude(np.asarray(samples, np.float64), frame_size, hop)
    cond = harmonic_time_mask_np(spec, smooth_margin, mask_power)
    chroma = []
    energies = []
    for frame in cond:
        full = frame_to_hpcp_np(frame, sample_rate, frame_size, sigma,
                                tuning_offset, peaks_per_frame, num_harmonics,
                                harmonic_decay, mag_power)
        if bass_blend:
            bass = frame_to_hpcp_np(
                frame, sample_rate, frame_size, sigma, tuning_offset,
                int(np.clip(peaks_per_frame, 1, 12)), num_harmonics,
                harmonic_decay, mag_power, fmin=bass_fmin, fmax=bass_fmax)
            w = float(np.clip(bass_weight, 0.0, 1.0))
            mix = (1.0 - w) * full + w * bass
            norm = np.sqrt((mix ** 2).sum())
            full = mix / norm if norm > EPSILON else mix
        chroma.append(full)
        energies.append(float((frame ** 2).sum()))
    chroma = np.asarray(chroma)
    energies = np.asarray(energies)
    if len(chroma) > 5:
        chroma = smooth_chroma_median_np(chroma, 5)
    if edge_trim_fraction > 0.0 and len(chroma) >= 200:
        frac = float(np.clip(edge_trim_fraction, 0.0, 0.49))
        n = len(chroma)
        start = int(round(n * frac))
        end = int(round(n * (1.0 - frac)))
        if end > start + 50 and end <= n:
            chroma = chroma[start:end]
            energies = energies[start:end]
    weights = key_frame_weights_np(chroma, energies, min_tonalness,
                                   tonalness_power, energy_power)
    templates = key_templates_np(template_set)
    if detector == "multi_scale":
        res = detect_key_multi_scale_np(
            chroma, weights, templates, list(multi_scale_lengths),
            multi_scale_hop, multi_scale_min_clarity)
        if res is not None:
            return int(res[0])
        return best_key_np(key_scores_refined(chroma, weights, templates))
    return detect_key_segment_voting_np(
        chroma, weights, templates, seg_len, seg_hop, seg_min_clarity)
