"""Legacy BPM path: FFT-ACF candidates, comb filterbank, merge."""

import numpy as np
import jax.numpy as jnp

from stratum_dsp_tpu.config import AnalysisConfig
from stratum_dsp_tpu.features.period import legacy

SR = 44100
CFG = AnalysisConfig()


def onset_tensor_samples(lists, k=128):
    b = len(lists)
    p = np.zeros((b, k), np.int32)
    v = np.zeros((b, k), bool)
    for i, lst in enumerate(lists):
        p[i, : len(lst)] = lst
        v[i, : len(lst)] = True
    return jnp.asarray(p), jnp.asarray(v)


def grid_onsets(bpm, duration_s, sr=SR, jitter=0):
    period = 60.0 / bpm * sr
    rng = np.random.default_rng(0)
    out = []
    t = 0.0
    while t < duration_s * sr:
        out.append(int(t) + (int(rng.integers(-jitter, jitter + 1)) if jitter else 0))
        t += period
    return [max(o, 0) for o in out]


def test_autocorr_finds_fundamental():
    onsets = grid_onsets(120.0, 20.0)
    pos, valid = onset_tensor_samples([onsets])
    t_padded = 20 * SR
    ac = legacy.autocorr_candidates(pos, valid, t_padded, SR, 512, 40.0, 240.0)
    bpms = np.asarray(ac.bpm[0])[np.asarray(ac.valid[0])]
    assert len(bpms) > 0
    # top candidate should be 120 or a metrical relative
    top = bpms[0]
    assert any(abs(top / 120.0 - r) < 0.06 for r in (1.0, 0.5, 2.0)), top


def test_comb_scores_correct_bpm_highest():
    onsets = grid_onsets(128.0, 20.0)
    pos, valid = onset_tensor_samples([onsets])
    comb = legacy.comb_candidates(pos, valid, 20 * SR, SR, 40.0, 240.0, 1.0)
    bpms = np.asarray(comb.bpm[0])[np.asarray(comb.valid[0])]
    confs = np.asarray(comb.confidence[0])[np.asarray(comb.valid[0])]
    assert confs[0] == 1.0
    # every metrical divisor of 128 aligns perfectly; winner must divide 128
    assert any(abs(bpms[0] - v) < 1.5 for v in (128.0, 64.0)), bpms[:5]


def test_estimate_bpm_legacy_end_to_end():
    tracks = [grid_onsets(120.0, 25.0), grid_onsets(95.0, 25.0)]
    pos, valid = onset_tensor_samples(tracks)
    out = legacy.estimate_bpm_legacy(pos, valid, 25 * SR, SR, CFG)
    assert bool(out["ok"][0]) and bool(out["ok"][1])
    for i, want in enumerate([120.0, 95.0]):
        got = float(out["bpm"][i])
        ratio = max(got / want, want / got)
        assert min(abs(ratio - r) for r in (1.0, 2.0)) < 0.05, (got, want)
        assert float(out["confidence"][i]) > 0.0


def test_too_few_onsets():
    pos, valid = onset_tensor_samples([[1000]])
    out = legacy.estimate_bpm_legacy(pos, valid, 5 * SR, SR, CFG)
    assert not bool(out["ok"][0])


def test_guardrails_cap_extreme():
    # all onsets at 30 BPM (outside soft range 60-210 lower bound)
    onsets = grid_onsets(30.0, 30.0)
    pos, valid = onset_tensor_samples([onsets])
    out = legacy.estimate_bpm_legacy(pos, valid, 30 * SR, SR, CFG)
    # the 30 BPM fundamental would be outside min_bpm=40 anyway; the estimate
    # lands on a metrical relative; just assert confidence is finite and bounded
    assert 0.0 <= float(out["confidence"][0]) <= 2.0


import pytest

# ---------------------------------------------------------------------------
# merge parity vs the independent numpy port (candidate_filter.rs:40-440 +
# mod.rs:296-339)
# ---------------------------------------------------------------------------

def _clist(pairs, width=12):
    import jax.numpy as jnp
    import numpy as np
    from stratum_dsp_tpu.features.period.legacy import CandidateList

    bpm = np.zeros((1, width), np.float32)
    conf = np.zeros((1, width), np.float32)
    valid = np.zeros((1, width), bool)
    for i, (b, c) in enumerate(pairs):
        bpm[0, i], conf[0, i], valid[0, i] = b, c, True
    return CandidateList(jnp.asarray(bpm), jnp.asarray(conf), jnp.asarray(valid))


MERGE_CASES = [
    # (name, autocorr [(bpm, conf)...], comb [(bpm, conf)...], guardrails)
    ("agree_128", [(128.0, 0.9), (64.0, 0.5)], [(127.5, 0.8), (255.0, 0.4)], False),
    ("octave_2x", [(240.0, 0.9), (80.0, 0.3)], [(120.0, 0.8), (90.0, 0.5)], False),
    ("octave_half", [(60.0, 0.9)], [(120.0, 0.85), (80.0, 0.2)], False),
    ("disagree", [(100.0, 0.9)], [(130.0, 0.85)], False),
    ("safety_boost", [(220.0, 0.9), (230.0, 0.8), (210.0, 0.7), (225.0, 0.6),
                      (235.0, 0.55), (140.0, 0.1)], [(215.0, 0.9)], False),
    ("promote_ac", [(95.0, 0.4), (40.0, 0.9)], [(190.0, 0.9)], False),
    ("guardrails", [(200.0, 0.9), (100.0, 0.6)], [(201.0, 0.8)], True),
]


@pytest.mark.parametrize("name,ac,cb,use_guard", MERGE_CASES)
def test_merge_parity_vs_numpy_port(name, ac, cb, use_guard):
    import numpy as np
    from stratum_dsp_tpu.config import AnalysisConfig
    from stratum_dsp_tpu.features.period.legacy import merge_bpm_candidates, _sane_guardrails
    from stratum_dsp_tpu.testing import numpy_ref as ref

    cfg = AnalysisConfig()
    got = merge_bpm_candidates(_clist(ac), _clist(cb), cfg, use_guard)
    assert bool(got["ok"][0])

    guard = None
    if use_guard:
        guard = (_sane_guardrails(cfg),
                 (cfg.legacy_bpm_conf_mul_preferred, cfg.legacy_bpm_conf_mul_soft,
                  cfg.legacy_bpm_conf_mul_extreme))
    want = ref.legacy_merge_top_np(ac, cb, 50.0, guardrail_muls=guard)
    assert want is not None

    assert abs(float(got["bpm"][0]) - want[0]) < 0.01, (name, float(got["bpm"][0]), want[0])
    assert abs(float(got["confidence"][0]) - want[1]) < 1e-4, (
        name, float(got["confidence"][0]), want[1])
    assert int(got["method_agreement"][0]) == want[2], name


def test_comb_onset_centric_equivalence():
    """The repo's onset-centric distinct-claim counting is provably equal to
    the reference's beat-centric nearest-onset scoring (legacy.py comment);
    pin it numerically against the literal beat-centric port across the
    whole grid for jittered, dropout-laden, and syncopated onset patterns."""
    from stratum_dsp_tpu.features.period.legacy import comb_candidates, comb_bpm_grid
    from stratum_dsp_tpu.testing import numpy_ref as ref

    sr = 44100
    rng = np.random.default_rng(11)
    patterns = {
        "clean_128": (np.arange(0, 15.0, 60 / 128) * sr).astype(int),
        "jitter_97": ((np.arange(0, 15.0, 60 / 97) + rng.uniform(-0.02, 0.02, 25)) * sr).astype(int),
        "dropout_140": np.delete((np.arange(0, 15.0, 60 / 140) * sr).astype(int), [3, 4, 11, 20]),
        "offbeat_80": ((np.sort(np.concatenate([
            np.arange(0, 15.0, 60 / 80), np.arange(0, 15.0, 60 / 80) + 0.375]))) * sr).astype(int),
    }
    grid = comb_bpm_grid(CFG.min_bpm, CFG.max_bpm, CFG.bpm_resolution)

    for name, onsets in patterns.items():
        onsets = np.unique(onsets)
        k = 64
        p = np.zeros((1, k), np.int32)
        v = np.zeros((1, k), bool)
        p[0, : len(onsets)] = onsets
        v[0, : len(onsets)] = True
        got = comb_candidates(
            jnp.asarray(p), jnp.asarray(v), int(16 * sr), sr,
            CFG.min_bpm, CFG.max_bpm, CFG.bpm_resolution,
        )
        want_conf = ref.comb_confidences_np(onsets, sr, grid)

        # rebuild the repo's (bpm -> conf) map from its sorted output
        got_map = {}
        for b, c, val in zip(np.asarray(got.bpm[0]), np.asarray(got.confidence[0]),
                             np.asarray(got.valid[0])):
            if val:
                got_map[round(float(b), 3)] = float(c)
        for b, wc in zip(grid, want_conf):
            gb = round(float(b), 3)
            if wc >= 0.1:
                assert gb in got_map, (name, gb, wc)
                assert abs(got_map[gb] - wc) < 5e-3, (name, gb, got_map[gb], wc)
            elif gb in got_map:
                assert got_map[gb] < 0.12, (name, gb, got_map[gb])
