"""Onset detectors + consensus voting."""

import numpy as np
import jax.numpy as jnp

from stratum_dsp_tpu.features.onset import (
    consensus_onsets,
    detect_energy_flux_onsets,
    flux_onsets_from_curve,
    hpss_decompose,
    vote_onsets,
)
from stratum_dsp_tpu.features.onset.peaks import peak_mask_1d
from stratum_dsp_tpu.testing import SAMPLE_RATE, kick_pattern, pad_batch

FRAME, HOP = 2048, 512


def ref_peak_pick(flux, threshold):
    """The reference's 3-case peak pick (energy_flux.rs:170-221)."""
    out = []
    n = len(flux)
    for i in range(1, n - 1):
        if flux[i] > threshold and flux[i] > flux[i - 1] and flux[i] >= flux[i + 1]:
            out.append(i)
    if n > 1 and flux[0] > threshold and flux[0] >= flux[1]:
        out.append(0)
    if n > 1 and flux[n - 1] > threshold and flux[n - 1] > flux[n - 2]:
        out.append(n - 1)
    return sorted(out)


def test_peak_mask_matches_reference(rng):
    n, n_valid = 64, 50
    flux = np.abs(rng.standard_normal(n)).astype(np.float32)
    valid = np.arange(n) < n_valid
    thr = 0.5
    ref = ref_peak_pick(flux[:n_valid], thr)
    got = np.flatnonzero(
        np.asarray(peak_mask_1d(jnp.asarray(flux), jnp.asarray(valid), jnp.float32(thr)))
    ).tolist()
    assert got == ref


def ref_energy_flux_onsets(samples, frame_size, hop, threshold_db):
    """Direct port of the reference algorithm for golden comparison."""
    n = (len(samples) - frame_size) // hop + 1
    if n < 2:
        return []
    e = np.array(
        [
            np.sqrt(np.mean(samples[i * hop : min(i * hop + frame_size, len(samples))] ** 2))
            for i in range(n)
        ]
    )
    flux = np.maximum(e[1:] - e[:-1], 0.0)
    mx = flux.max()
    if mx <= 1e-10:
        return []
    thr = mx * 10 ** (threshold_db / 20)
    onsets = [(i + 1) * hop for i in ref_peak_pick(flux, thr) if (i + 1) * hop < len(samples)]
    dedup = []
    for o in sorted(onsets):
        if not dedup or o >= dedup[-1] + hop // 2:
            dedup.append(o)
    return dedup


def test_energy_flux_matches_reference():
    tracks = [kick_pattern(120.0, 4.0), kick_pattern(95.0, 5.0)]
    samples, lengths = pad_batch(tracks)
    pos, valid = detect_energy_flux_onsets(
        jnp.asarray(samples), jnp.asarray(lengths), FRAME, HOP, -20.0, 256
    )
    for b, trk in enumerate(tracks):
        ref = ref_energy_flux_onsets(trk.astype(np.float64), FRAME, HOP, -20.0)
        got = np.asarray(pos[b])[np.asarray(valid[b])].tolist()
        assert got == ref, (got, ref)


def test_energy_flux_kick_count():
    # 120 BPM x 4 s = 8 beats
    pos, valid = detect_energy_flux_onsets(
        jnp.asarray(pad_batch([kick_pattern(120.0, 4.0)])[0]),
        jnp.asarray([int(4.0 * SAMPLE_RATE)]),
        FRAME,
        HOP,
        -20.0,
        128,
    )
    n = int(valid.sum())
    assert 6 <= n <= 10, n


def test_flux_onsets_percentile():
    # flat baseline: plateau fails the strict local-max and >threshold
    # tests, so exactly the spikes are detected
    n = 120
    curve = np.full(n, 0.01, np.float32)
    spikes = [10, 40, 80]
    for s in spikes:
        curve[s] = 5.0
    pos, valid = flux_onsets_from_curve(
        jnp.asarray(curve[None]),
        jnp.asarray([n]),
        0.9,
        HOP,
        jnp.asarray([10**7]),
        32,
    )
    got = np.asarray(pos[0])[np.asarray(valid[0])].tolist()
    assert got == [(s + 1) * HOP for s in spikes]


def test_vote_onsets_clustering():
    # methods agree on ~1000 and ~5000; one method alone at 40000
    def mk(lst, k=8):
        p = np.zeros((1, k), np.int32)
        v = np.zeros((1, k), bool)
        p[0, : len(lst)] = lst
        v[0, : len(lst)] = True
        return jnp.asarray(p), jnp.asarray(v)

    m0 = mk([1000, 5000])
    m1 = mk([1050, 5100])
    m2 = mk([980, 40000])
    m3 = mk([])
    vote = vote_onsets(
        [m0[0], m1[0], m2[0], m3[0]],
        [m0[1], m1[1], m2[1], m3[1]],
        [0.25, 0.25, 0.25, 0.25],
        50,
        SAMPLE_RATE,
    )
    centers = np.asarray(vote["centers"][0])[np.asarray(vote["valid"][0])]
    voted = np.asarray(vote["voted_by"][0])[np.asarray(vote["valid"][0])]
    conf = np.asarray(vote["confidence"][0])[np.asarray(vote["valid"][0])]
    assert len(centers) == 3
    np.testing.assert_array_equal(centers, [(1000 + 1050 + 980) // 3, (5000 + 5100) // 2, 40000])
    np.testing.assert_array_equal(voted, [3, 2, 1])
    np.testing.assert_allclose(conf, [0.75, 0.5, 0.25])

    # >=2 policy keeps only the two agreed clusters
    pos, valid = consensus_onsets(vote, 16)
    got = np.asarray(pos[0])[np.asarray(valid[0])]
    np.testing.assert_array_equal(got, [1010, 5050])


def test_hpss_reconstruction():
    """H + P == |X| after soft masking (hpss.rs test invariant:394-411)."""
    rng = np.random.default_rng(2)
    spec = np.abs(rng.standard_normal((2, 40, 32))).astype(np.float32)
    frame_counts = jnp.asarray([40, 30])
    h, p = hpss_decompose(jnp.asarray(spec), frame_counts, margin=3, iterations=3)
    np.testing.assert_allclose(np.asarray(h + p), spec, rtol=1e-4, atol=1e-5)
    # harmonic of a pure horizontal line stays dominant
    line = np.zeros((1, 40, 32), np.float32)
    line[0, :, 10] = 1.0
    h2, p2 = hpss_decompose(jnp.asarray(line), jnp.asarray([40]), margin=3, iterations=3)
    assert float(jnp.sum(h2)) > float(jnp.sum(p2))


def test_consensus_parity_vs_numpy_port():
    """vote_onsets vs the loop-for-loop port of consensus.rs:111-287,
    including the knife edges: a method firing TWICE inside one cluster
    (per-onset weight summation), integer-floor centers, and chained
    clusters spanning > tolerance end-to-end."""
    from stratum_dsp_tpu.features.onset.consensus import vote_onsets, consensus_onsets
    from stratum_dsp_tpu.testing import numpy_ref as ref

    sr = 44100
    tol_ms = 50
    weights = [0.3, 0.25, 0.25, 0.2]
    # tol = 2205 samples. Cluster A chains 1000-5200 (>tol span);
    # method 0 fires twice in cluster A; cluster B isolated; C pair.
    m0 = [1000, 3000, 40000]
    m1 = [1500, 40500]
    m2 = [5200, 90000]
    m3 = [39900]

    want = ref.vote_onsets_np([m0, m1, m2, m3], weights, tol_ms, sr)

    def pad(lst, k=8):
        p = np.zeros((1, k), np.int32)
        v = np.zeros((1, k), bool)
        p[0, : len(lst)] = lst
        v[0, : len(lst)] = True
        return jnp.asarray(p), jnp.asarray(v)

    ps, vs = zip(*[pad(m) for m in (m0, m1, m2, m3)])
    vote = vote_onsets(list(ps), list(vs), weights, tol_ms, sr)
    c_pos, c_valid = consensus_onsets(vote, 16)

    got_time_order = [
        (int(c), round(float(cf), 6), int(vb))
        for c, cf, vb, v in zip(
            np.asarray(vote["centers"][0]), np.asarray(vote["confidence"][0]),
            np.asarray(vote["voted_by"][0]), np.asarray(vote["valid"][0]))
        if v
    ]
    # compare as sets ordered by time (the repo emits time-ordered clusters;
    # the reference sorts confidence-desc — same multiset)
    assert sorted(got_time_order) == sorted(want), (got_time_order, want)
    # consensus_onsets applies the orchestrator policy (lib.rs:259-285):
    # clusters with >=2 votes if any exist, else all; time-sorted dedup
    strong = sorted({c for c, _, vb in want if vb >= 2})
    expect = strong if strong else sorted({c for c, _, _ in want})
    got_pos = [int(p) for p, v in zip(np.asarray(c_pos[0]), np.asarray(c_valid[0])) if v]
    assert got_pos == expect, (got_pos, expect)


def test_spectral_and_hfc_onsets_parity_vs_numpy_ports():
    """The streamed onset_sflux/hfc features + flux_onsets_from_curve must
    reproduce the literal ports of spectral_flux.rs / hfc.rs end-to-end
    (frame indices exact) on a kick fixture."""
    from stratum_dsp_tpu.config import AnalysisConfig
    from stratum_dsp_tpu.features.period import novelty as nov
    from stratum_dsp_tpu.features.onset.spectral import flux_onsets_from_curve, hfc_flux
    from stratum_dsp_tpu.testing import numpy_ref as ref

    cfg = AnalysisConfig(stft_bf16=False)
    trk = kick_pattern(115.0, 6.0)
    samples, lengths = pad_batch([trk])
    feats, fc, _ = nov.compute_bpm_spectral_features(
        jnp.asarray(samples), jnp.asarray(lengths), cfg, SAMPLE_RATE, FRAME, HOP
    )
    pct = cfg.onset_threshold_percentile

    # reference side from the same fixture via the independent STFT port
    spec = ref.stft_magnitude(trk.astype(np.float64), FRAME, HOP)

    # spectral flux
    sflux = feats["onset_sflux"][:, 1:]
    s_pos, s_valid = flux_onsets_from_curve(
        sflux, jnp.maximum(fc - 1, 0), pct, HOP, jnp.asarray(lengths), 64
    )
    got_s = (np.asarray(s_pos[0])[np.asarray(s_valid[0])] // HOP).tolist()
    want_s = ref.spectral_flux_onsets_np(spec, pct)
    assert got_s == want_s, (got_s, want_s)

    # HFC
    hf, h_n = hfc_flux(feats["hfc"][:, :, 0], fc)
    h_pos, h_valid = flux_onsets_from_curve(
        hf, h_n, pct, HOP, jnp.asarray(lengths), 64
    )
    got_h = (np.asarray(h_pos[0])[np.asarray(h_valid[0])] // HOP).tolist()
    want_h = ref.hfc_onsets_np(spec, pct)
    assert got_h == want_h, (got_h, want_h)
