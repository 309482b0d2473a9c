"""Beat tracking: HMM, variation refine, time signature, grid assembly."""

import numpy as np
import jax.numpy as jnp

from stratum_dsp_tpu.features.beat import generate_beat_grid, track_beats
from stratum_dsp_tpu.features.beat.grid import grid_stability
from stratum_dsp_tpu.features.beat.time_signature import detect_time_signature
from stratum_dsp_tpu.features.beat.variation import compact_sorted


def onset_tensor(lists, k=64):
    b = len(lists)
    t = np.zeros((b, k), np.float32)
    v = np.zeros((b, k), bool)
    for i, lst in enumerate(lists):
        t[i, : len(lst)] = lst
        v[i, : len(lst)] = True
    return jnp.asarray(t), jnp.asarray(v)


def test_hmm_tracks_regular_beats():
    # onsets exactly on a 120 BPM grid
    onsets = [i * 0.5 for i in range(16)]
    ot, ov = onset_tensor([onsets])
    beats, _ = track_beats(jnp.asarray([120.0]), ot, ov, max_beats=64)
    times = np.asarray(beats.times[0])[np.asarray(beats.valid[0])]
    assert len(times) == 16
    np.testing.assert_allclose(times, onsets, atol=1e-5)
    conf = np.asarray(beats.confidence[0])[np.asarray(beats.valid[0])]
    assert (conf > 0.9).all()


def test_hmm_skips_unsupported_frames():
    # a gap in onsets -> emission < 0.1 -> frames dropped
    onsets = [0.0, 0.5, 1.0, 3.0, 3.5, 4.0]
    ot, ov = onset_tensor([onsets])
    beats, _ = track_beats(jnp.asarray([120.0]), ot, ov, max_beats=32)
    times = np.asarray(beats.times[0])[np.asarray(beats.valid[0])]
    # beats in the 1.5-2.5s dead zone must be absent
    assert not ((times > 1.2) & (times < 2.8)).any()
    assert (np.abs(times[:, None] - np.asarray(onsets)[None, :]).min(axis=1) < 0.08).all()


def test_generate_beat_grid_120bpm():
    onsets = [i * 0.5 for i in range(24)]
    ot, ov = onset_tensor([onsets])
    grid = generate_beat_grid(jnp.asarray([120.0]), jnp.asarray([0.9]), ot, ov, max_beats=64, seg_beat_cap=32, max_segments=8)
    assert bool(grid.ok[0])
    times = np.asarray(grid.beat_times[0])[np.asarray(grid.beat_valid[0])]
    assert len(times) == 24
    ivals = np.diff(times)
    np.testing.assert_allclose(ivals, 0.5, atol=0.05)
    # stability ~ 1 for a perfect grid
    assert float(grid.stability[0]) > 0.95
    # 4/4 expected, downbeats every 4 beats starting at beat 0
    assert int(grid.time_signature[0]) == 0
    db = np.asarray(grid.downbeat_times[0])[np.asarray(grid.downbeat_valid[0])]
    assert len(db) == 6
    np.testing.assert_allclose(np.diff(db), 2.0, atol=0.1)
    assert not bool(grid.has_tempo_variation[0])


def test_grid_empty_onsets_fails_gracefully():
    ot, ov = onset_tensor([[]])
    grid = generate_beat_grid(jnp.asarray([120.0]), jnp.asarray([0.5]), ot, ov, max_beats=16, seg_beat_cap=16, max_segments=4)
    assert not bool(grid.ok[0])
    assert float(grid.stability[0]) == 0.0
    assert not np.asarray(grid.beat_valid[0]).any()


def test_variable_tempo_flagged():
    """refine_beats flags segments whose beat-interval CV exceeds 0.15
    (tempo_variation.rs:47-52). Feed a beat list with alternating 0.40/0.70 s
    intervals (CV ~ 0.27) directly — the HMM's fixed nominal grid would
    never emit such beats on its own (its emission gate drops off-grid
    frames, matching the reference)."""
    from stratum_dsp_tpu.features.beat.hmm import BeatTensor
    from stratum_dsp_tpu.features.beat.variation import refine_beats

    times = [0.0]
    for i in range(40):
        times.append(times[-1] + (0.4 if i % 2 == 0 else 0.7))
    n = len(times)
    bt = np.zeros((1, 64), np.float32)
    bt[0, :n] = times
    bv = np.zeros((1, 64), bool)
    bv[0, :n] = True
    beats = BeatTensor(
        times=jnp.asarray(bt), confidence=jnp.asarray(bt * 0 + 0.9), valid=jnp.asarray(bv)
    )
    ot, ov = onset_tensor([times], k=64)
    _, has_var = refine_beats(
        beats, jnp.asarray([110.0]), jnp.asarray([0.5]), ot, ov,
        seg_beat_cap=32, max_segments=12,
    )
    assert bool(has_var[0])


def test_stability_jittered_vs_clean(rng):
    clean = np.arange(20) * 0.5
    jit = clean + rng.normal(0, 0.04, 20)
    jit.sort()
    tc, nc = compact_sorted(jnp.asarray(clean[None].astype(np.float32)), jnp.ones((1, 20), bool))
    tj, nj = compact_sorted(jnp.asarray(jit[None].astype(np.float32)), jnp.ones((1, 20), bool))
    sc = float(grid_stability(tc, nc)[0])
    sj = float(grid_stability(tj, nj)[0])
    assert sc > sj


def test_time_signature_waltz():
    # 3/4: long-short-short interval pattern repeating every 3 beats
    pattern = [0.6, 0.5, 0.5]
    times = [0.0]
    for i in range(30):
        times.append(times[-1] + pattern[i % 3])
    arr = jnp.asarray(np.asarray(times, np.float32)[None])
    n = jnp.asarray([len(times)])
    sig, conf = detect_time_signature(arr, None, n)
    # a perfect period-3 pattern scores lag 3 and lag 6 identically; the
    # reference's max_by keeps the LAST maximal hypothesis (6/8) — accept
    # either compound-meter answer but never 4/4
    assert int(sig[0]) in (1, 2)
    assert float(conf[0]) > 0.3


def test_time_signature_few_beats_defaults_44():
    arr = jnp.asarray(np.asarray([0.0, 0.5, 1.0], np.float32)[None])
    sig, conf = detect_time_signature(arr, None, jnp.asarray([3]))
    assert int(sig[0]) == 0
    assert float(conf[0]) == 0.5


def test_hmm_parity_vs_numpy_port():
    """JAX track_beats vs the independent float64 port of hmm.rs (beat
    times, confidences, and the Viterbi state path)."""
    import numpy as np
    import jax.numpy as jnp

    from stratum_dsp_tpu.features.beat.hmm import track_beats
    from stratum_dsp_tpu.testing import numpy_ref as ref

    rng = np.random.default_rng(7)
    bpm = 123.0
    interval = 60.0 / bpm
    # jittered onsets with dropouts: exercises emission gaps + state drift
    onsets = np.arange(0.0, 20.0, interval) + rng.uniform(-0.02, 0.02, size=41)
    onsets = np.delete(onsets, [7, 8, 23])
    onsets = np.sort(onsets)

    k = len(onsets)
    ot = jnp.asarray(onsets[None, :], jnp.float32)
    ov = jnp.ones((1, k), bool)
    beats, states = track_beats(jnp.asarray([bpm], jnp.float32), ot, ov, max_beats=64)

    want_t, want_c, want_path = ref.hmm_track_beats_np(onsets, bpm)

    got_t = np.asarray(beats.times[0])[np.asarray(beats.valid[0])]
    got_c = np.asarray(beats.confidence[0])[np.asarray(beats.valid[0])]
    assert len(got_t) == len(want_t), (len(got_t), len(want_t))
    np.testing.assert_allclose(got_t, want_t, atol=1e-4)
    np.testing.assert_allclose(got_c, want_c, atol=1e-4)
    got_path = np.asarray(states[0])[: len(want_path)]
    np.testing.assert_array_equal(got_path, want_path)


def test_grid_aggregation_parity_vs_numpy_ports():
    """detect_downbeats / grid_stability / detect_time_signature vs the
    float64 ports of mod.rs:363-485 + time_signature.rs:90-175, on a
    jittered grid whose downbeat chain includes accept/reject resets."""
    import numpy as np
    import jax.numpy as jnp

    from stratum_dsp_tpu.features.beat import grid as g
    from stratum_dsp_tpu.features.beat import time_signature as ts
    from stratum_dsp_tpu.testing import numpy_ref as ref

    rng = np.random.default_rng(3)
    bpm = 132.0
    beats = np.arange(0.0, 25.0, 60.0 / bpm) + rng.uniform(-0.03, 0.03, 55)
    beats = np.sort(beats)
    k = 64
    bt = np.zeros((1, k), np.float32)
    bv = np.zeros((1, k), bool)
    bt[0, : len(beats)] = beats
    bv[0, : len(beats)] = True
    n = jnp.asarray([len(beats)], jnp.int32)

    sig, conf = ts.detect_time_signature(jnp.asarray(bt), jnp.asarray(bv), n)
    want_sig, want_conf = ref.detect_time_signature_np(beats)
    # repo encodes the enum index {0: 4/4, 1: 3/4, 2: 6/8}
    assert {0: 4, 1: 3, 2: 6}[int(sig[0])] == want_sig
    assert abs(float(conf[0]) - want_conf) < 1e-3

    sig_index = {4: 0, 3: 1, 6: 2}[want_sig]
    down_mask = g.detect_downbeats(
        jnp.asarray(bt), n, jnp.asarray([bpm], jnp.float32),
        jnp.asarray([sig_index], jnp.int32),
    )
    got_down = bt[0][np.asarray(down_mask[0]) & bv[0]]
    want_down = ref.detect_downbeats_np(beats, bpm, want_sig)
    np.testing.assert_allclose(got_down, want_down, atol=1e-5)
    assert len(want_down) >= 3  # the chain actually fired

    stab = g.grid_stability(jnp.asarray(bt), n)
    assert abs(float(stab[0]) - ref.grid_stability_np(beats)) < 1e-4


def test_tempo_variation_flag_parity_fuzz():
    """has_variation parity vs the tempo_variation.rs port across 24 fuzzed
    beat lists spanning steady, jittered (below/above the 0.15-CV edge),
    jumpy, and ramped grids."""
    import numpy as np
    import jax.numpy as jnp

    from stratum_dsp_tpu.features.beat.variation import refine_beats
    from stratum_dsp_tpu.features.beat.hmm import BeatTensor
    from stratum_dsp_tpu.testing import numpy_ref as ref

    rng = np.random.default_rng(17)
    cases = []
    for jit in (0.0, 0.02, 0.05, 0.08, 0.12, 0.2):
        base = np.arange(0.0, 22.0, 0.5)
        cases.append(np.sort(base + rng.uniform(-jit, jit, len(base))))
    for jump in (0.55, 0.7, 0.9):
        a = np.arange(0.0, 10.0, 0.5)
        b = np.arange(10.0, 22.0, jump)
        cases.append(np.concatenate([a, b]))
    t = np.cumsum(np.linspace(0.42, 0.58, 44))
    cases.append(t)
    for _ in range(14):
        n = rng.integers(12, 48)
        iv = rng.uniform(0.3, 0.8) + rng.normal(0, rng.uniform(0, 0.12), n)
        cases.append(np.cumsum(np.abs(iv) + 0.05))

    mism = []
    for i, beats in enumerate(cases):
        k = 96
        bt = np.zeros((1, k), np.float32)
        bv = np.zeros((1, k), bool)
        bt[0, : len(beats)] = beats
        bv[0, : len(beats)] = True
        tens = BeatTensor(
            times=jnp.asarray(bt), confidence=jnp.asarray(bv, jnp.float32),
            valid=jnp.asarray(bv),
        )
        nominal = 60.0 / float(np.median(np.diff(beats)))
        ot = jnp.asarray(bt)  # onsets = beats (alignment not under test)
        _, has_var = refine_beats(
            tens, jnp.asarray([nominal], jnp.float32),
            jnp.asarray([0.5], jnp.float32), ot, jnp.asarray(bv),
            seg_beat_cap=16, max_segments=8,
        )
        _, want = ref.detect_tempo_variations_np(beats.astype(np.float32), nominal)
        if bool(has_var[0]) != want:
            mism.append((i, bool(has_var[0]), want))
    assert not mism, mism


def test_bayesian_refine_bpm_parity():
    """A variable segment whose onsets run at 124 BPM under a 120 nominal:
    the refined segment's re-tracked beat interval must match the Bayesian
    port's chosen BPM (bayesian.rs:104-254)."""
    import numpy as np
    import jax.numpy as jnp

    from stratum_dsp_tpu.features.beat.variation import refine_beats
    from stratum_dsp_tpu.features.beat.hmm import BeatTensor
    from stratum_dsp_tpu.testing import numpy_ref as ref

    rng = np.random.default_rng(9)
    # first 10 s steady 120-BPM beats; second 10 s wildly jittered (variable)
    a = np.arange(0.0, 10.0, 0.5)
    b = 10.0 + np.cumsum(rng.uniform(0.3, 0.75, 18))
    beats = np.concatenate([a, b])
    # onsets: clean 124-BPM grid across the second half
    onsets = np.concatenate([a, np.arange(10.0, 20.0, 60.0 / 124.0)])

    k = 96
    def pack(x):
        arr = np.zeros((1, k), np.float32)
        v = np.zeros((1, k), bool)
        arr[0, : len(x)] = x
        v[0, : len(x)] = True
        return jnp.asarray(arr), jnp.asarray(v)

    bt, bv = pack(beats)
    ot, ov = pack(onsets)
    tens = BeatTensor(times=bt, confidence=jnp.asarray(bv, jnp.float32), valid=bv)
    out, has_var = refine_beats(
        tens, jnp.asarray([120.0], jnp.float32), jnp.asarray([0.5], jnp.float32),
        ot, ov, seg_beat_cap=32, max_segments=8,
    )
    assert bool(has_var[0])

    # port: walk the same segment chain (detect segments, update on variable)
    segs, _ = ref.detect_tempo_variations_np(beats, 120.0)
    cur = 120.0
    for (s, e, _bpm, _c, is_var) in segs:
        if is_var:
            seg_onsets = onsets[(onsets >= s) & (onsets <= e)][:32]
            if len(seg_onsets):
                cur, _ = ref.bayesian_update_np(seg_onsets, cur)
    want_interval = 60.0 / cur
    assert abs(cur - 124.0) <= 1.0, cur  # the port detects ~124

    # The union keeps overlap duplicates (constant-judged overlapping
    # segments contribute their original beats too, mirroring the
    # reference's extend+sort), so interval statistics are mixed; instead
    # assert the re-tracked 60/cur grid is PRESENT: >= 80% of the 124-BPM
    # onset grid in the variable region has a beat within 25 ms.
    t_new = np.asarray(out.times[0])[np.asarray(out.valid[0])]
    grid = onsets[(onsets > 11.0) & (onsets < 19.0)]
    hits = sum(np.min(np.abs(t_new - g)) < 0.025 for g in grid)
    assert hits >= 0.8 * len(grid), (hits, len(grid), want_interval)
