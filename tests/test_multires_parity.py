"""Multi-resolution fusion parity: the JAX hypothesis machinery
(H(T)/H(2T)/H(T/2) weights, structural discounts, support-ratio guardrails,
margin-gated switching, dedup, post-hoc fold-down/up, triplet-family beat
contrast — multi_resolution.rs:276-867) against the independent float64 port
``testing.numpy_ref.multires_fuse_np``.

The numpy side consumes the SAME per-hop candidate lists the JAX fusion
uses (hop_candidates is deterministic for identical inputs), so mismatches
isolate fusion-logic deviations rather than STFT/novelty numerics.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from stratum_dsp_tpu.config import AnalysisConfig
from stratum_dsp_tpu.features.period import multi_resolution as mr
from stratum_dsp_tpu.testing import numpy_ref as ref
from stratum_dsp_tpu.testing.battery import drum_track

SR = 44100

CASES = [
    # (name, synth kwargs) — tempos hitting each fusion branch
    ("mid_140", dict(bpm=140.0, hats="offbeat")),
    ("folddown_200", dict(bpm=200.0, hats="eighths")),
    ("foldup_75", dict(bpm=75.0, pattern="plain")),
    ("frac_113_6", dict(bpm=113.6, hats="offbeat")),
]


@pytest.fixture(scope="module")
def cfg():
    return AnalysisConfig()


def _cand_list(c, i=0):
    bpms = np.asarray(c["cand_bpm"][i], np.float64)
    scores = np.asarray(c["cand_score"][i], np.float64)
    valid = np.asarray(c["cand_valid"][i])
    return [(b, s) for b, s, v in zip(bpms, scores, valid) if v]


@pytest.mark.parametrize("name,kw", CASES)
def test_multires_fusion_parity(name, kw, cfg):
    x = drum_track(f"mrp_{name}", duration_s=20.0, **kw)
    samples = jnp.asarray(x[None])
    lengths = jnp.asarray([len(x)], jnp.int32)

    got = mr.multi_resolution_estimate(samples, lengths, cfg, SR)
    assert bool(got["ok"][0])

    top_k = max(cfg.tempogram_multi_res_top_k, 1)
    aux_k = int(np.clip(top_k * 4, 25, 200))
    c256, _, _, _ = mr.hop_candidates(samples, lengths, cfg, SR, 256, aux_k)
    c512, nov512, _m, nval512 = mr.hop_candidates(samples, lengths, cfg, SR, 512, top_k)
    c1024, _, _, _ = mr.hop_candidates(samples, lengths, cfg, SR, 1024, aux_k)

    want = ref.multires_fuse_np(
        _cand_list(c256), _cand_list(c512), _cand_list(c1024),
        np.asarray(nov512[0, : int(nval512[0])], np.float64), SR,
        cfg.min_bpm, cfg.max_bpm, max(2.0, cfg.bpm_resolution),
        cfg.tempogram_multi_res_w512, cfg.tempogram_multi_res_w256,
        cfg.tempogram_multi_res_w1024,
        cfg.tempogram_multi_res_double_time_512_factor,
        cfg.tempogram_multi_res_margin_threshold,
        cfg.tempogram_multi_res_use_human_prior,
    )
    assert want is not None

    got_bpm = float(got["bpm"][0])
    assert abs(got_bpm - want["bpm"]) < 0.1, (name, got_bpm, want["bpm"])
    assert int(got["method_agreement"][0]) == want["method_agreement"], name
    assert abs(float(got["confidence"][0]) - want["confidence"]) < 0.02, (
        name, float(got["confidence"][0]), want["confidence"])


def test_fractional_beat_contrast_rescues_float_period():
    """The float-period comb (config ``beat_contrast_fractional``, default
    OFF) must score a fractional-period tempo ABOVE its 2/3-family member on
    an impulse train at that exact period, where the reference's
    integer-frame comb loses it to rounding drift
    (multi_resolution.rs:580-604; battery case frac_113.6 -> 75.7).
    Also pins the consistency (std) penalty: the comb must NOT promote the
    4/3 member of a true tempo (its alternating hit/miss beats escape the
    half/third penalties)."""
    import jax.numpy as jnp

    from stratum_dsp_tpu.features.period.multi_resolution import beat_contrast_score

    sr, hop = 44100, 512
    true_bpm = 113.6
    fpb = 60.0 * sr / (true_bpm * hop)  # 45.48 frames: fractional period
    n = 2048
    novelty = np.zeros((1, n), np.float32)
    for k in range(int(n / fpb)):
        novelty[0, int(round(k * fpb))] = 1.0
    nv = jnp.asarray([n], jnp.int32)
    cands = jnp.asarray(
        [[true_bpm, true_bpm * 2 / 3, true_bpm * 4 / 3]], jnp.float32
    )
    s_int = np.asarray(
        beat_contrast_score(jnp.asarray(novelty), nv, cands, sr, hop)
    )[0]
    s_frac = np.asarray(
        beat_contrast_score(
            jnp.asarray(novelty), nv, cands, sr, hop, fractional=True
        )
    )[0]
    # integer comb: drift destroys the true tempo's contrast vs its 2/3
    assert s_int[0] < s_int[1] + 0.40, s_int
    # fractional comb: the true tempo wins decisively over 2/3 AND 4/3
    assert s_frac[0] > s_frac[1] + 0.40, s_frac
    assert s_frac[0] > s_frac[2] + 0.40, s_frac
