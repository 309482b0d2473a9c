#!/usr/bin/env python
"""Generate golden parity artifacts into tests/goldens/*.npz.

Evaluates the independent numpy reference ports (testing/numpy_ref.py, pure
numpy, double precision) on the deterministic synthetic fixtures and stores
per-stage arrays. tests/test_goldens.py compares the JAX pipeline against
these pinned artifacts under SNR bounds.

Regenerate only when the reference algorithms themselves change:
    python scripts/generate_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from stratum_dsp_tpu.testing import SAMPLE_RATE, c_major_scale, kick_pattern
from stratum_dsp_tpu.testing import numpy_ref as ref

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens")

FRAME_SIZE = 2048
HOP = 512
# default conditioning params (config.rs defaults mirrored in config.py)
SF_MAX_FILTER = 4
W_SPECTRAL, W_ENERGY, W_HFC = 0.3, 0.35, 0.35
LOCAL_MEAN_WINDOW, SMOOTH_WINDOW = 16, 5
MIN_BPM, MAX_BPM, RESOLUTION = 40.0, 240.0, 1.0


def fixture_tracks():
    return {
        "kick120": kick_pattern(120.0, 8.0).astype(np.float64),
        "kick128": kick_pattern(128.0, 7.5).astype(np.float64),
        "cmajor": c_major_scale().astype(np.float64),
    }


def main() -> int:
    # keep artifacts deterministic: numpy ops only, fixed fixture params
    from stratum_dsp_tpu.config import AnalysisConfig

    cfg = AnalysisConfig()
    assert cfg.frame_size == FRAME_SIZE and cfg.hop_size == HOP
    assert cfg.tempogram_superflux_max_filter_bins == SF_MAX_FILTER
    assert cfg.tempogram_novelty_w_spectral == W_SPECTRAL
    assert cfg.tempogram_novelty_w_energy == W_ENERGY
    assert cfg.tempogram_novelty_w_hfc == W_HFC
    assert cfg.tempogram_novelty_local_mean_window == LOCAL_MEAN_WINDOW
    assert cfg.tempogram_novelty_smooth_window == SMOOTH_WINDOW
    assert cfg.min_bpm == MIN_BPM and cfg.max_bpm == MAX_BPM
    assert cfg.bpm_resolution == RESOLUTION

    os.makedirs(OUT_DIR, exist_ok=True)
    frame_rate = SAMPLE_RATE / HOP
    for name, track in fixture_tracks().items():
        spec = ref.stft_magnitude(track, FRAME_SIZE, HOP)
        sf = ref.superflux(spec, SF_MAX_FILTER)
        en = ref.hwr_diff_curve(ref.band_energy(spec))
        hf = ref.hwr_diff_curve(ref.band_hfc(spec))
        novelty = ref.combined_novelty(
            sf, en, hf, W_SPECTRAL, W_ENERGY, W_HFC, LOCAL_MEAN_WINDOW, SMOOTH_WINDOW
        )
        fft_size = 1
        while fft_size < max(len(novelty), int(np.ceil(frame_rate * 60.0 / 0.7))):
            fft_size *= 2
        fft_power, fft_bpms = ref.fft_tempogram_power(
            novelty, frame_rate, MIN_BPM, MAX_BPM, fft_size
        )
        ac_strength, ac_grid = ref.autocorr_tempogram(
            novelty, frame_rate, MIN_BPM, MAX_BPM, RESOLUTION
        )
        chroma = ref.mean_chroma(spec[:64], SAMPLE_RATE, FRAME_SIZE)
        path = os.path.join(OUT_DIR, f"{name}.npz")
        np.savez_compressed(
            path,
            spec_head=spec[:8].astype(np.float32),  # first 8 frames, full bins
            novelty=novelty.astype(np.float32),
            fft_power=fft_power.astype(np.float32),
            fft_bpms=fft_bpms.astype(np.float32),
            ac_strength=ac_strength.astype(np.float32),
            ac_grid=ac_grid.astype(np.float32),
            mean_chroma=chroma.astype(np.float32),
            frame_rate=np.float64(frame_rate),
            fft_size=np.int64(fft_size),
        )
        print(f"wrote {path}: novelty[{len(novelty)}], fft[{len(fft_power)}], "
              f"ac[{len(ac_strength)}]")

    # --- detector-chain artifact: mode heuristic / ensemble / HPSS ---
    # (the 3 most-used opt-in paths; VERDICT r3 item 4). Inputs are seeded
    # random so the logic is exercised away from the clean-fixture manifold.
    rng = np.random.default_rng(20260820)
    chroma = np.abs(rng.standard_normal((64, 12))) ** 2
    chroma /= np.linalg.norm(chroma, axis=1, keepdims=True)
    weights = rng.random(64)

    kk_refined = ref.key_scores_refined(chroma, weights, ref.key_templates_np("kk"))
    tp_refined = ref.key_scores_refined(chroma, weights, ref.key_templates_np("temperley"))
    avg = (chroma * weights[:, None]).sum(0)
    heur_key, heur_scores = ref.mode_heuristic_np(
        kk_refined, avg, weights.sum(),
        third_ratio_margin=0.05, flip_min_score_ratio=0.6,
        enable_minor_harmonic_bonus=True, minor_leading_tone_bonus_weight=0.3,
    )
    ens = ref.ensemble_scores_np(chroma, weights, 0.5, 0.5)

    hpss_spec = np.abs(rng.standard_normal((48, 40))) ** 2
    # structure: a few harmonic rows + percussive columns so masks separate
    hpss_spec[:, 7] += 4.0
    hpss_spec[13, :] += 4.0
    h, p = ref.hpss_decompose_np(hpss_spec, margin=cfg.hpss_margin, iterations=10)

    path = os.path.join(OUT_DIR, "detector.npz")
    np.savez_compressed(
        path,
        chroma=chroma.astype(np.float32),
        weights=weights.astype(np.float32),
        kk_refined=kk_refined.astype(np.float32),
        tp_refined=tp_refined.astype(np.float32),
        heur_key=np.int64(heur_key),
        heur_scores=heur_scores.astype(np.float32),
        ensemble=ens.astype(np.float32),
        hpss_spec=hpss_spec.astype(np.float32),
        hpss_h=h.astype(np.float32),
        hpss_p=p.astype(np.float32),
        hpss_margin=np.int64(cfg.hpss_margin),
    )
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
