"""API-parity utilities (both unwired in the reference too): find_peaks
(peak_picking.rs:39-120) and the global median+MAD threshold
(threshold.rs:30-72), fuzzed against literal ports."""

import numpy as np
import jax.numpy as jnp

from stratum_dsp_tpu.features.period.peak_picking import find_peaks
from stratum_dsp_tpu.features.onset.threshold import adaptive_threshold_median_mad
from stratum_dsp_tpu.testing import numpy_ref as ref


def test_find_peaks_parity_fuzz():
    rng = np.random.default_rng(13)
    for trial in range(20):
        n = int(rng.integers(3, 48))
        x = rng.random(n).astype(np.float32)
        thr = float(rng.choice([0.0, 0.3, 0.5, 0.9, 0.2]))
        dist = int(rng.integers(0, 5))
        want = sorted(i for i, _ in ref.find_peaks_np(x, thr, dist))
        got_mask = np.asarray(find_peaks(
            jnp.asarray(x[None]), jnp.ones((1, n), bool), thr, dist
        )[0])
        got = sorted(np.nonzero(got_mask)[0].tolist())
        assert got == want, (trial, n, thr, dist, got, want, x.tolist())


def test_find_peaks_edges_and_value_dedup():
    # edge peaks + the value-descending min_distance rule: the HIGHER of two
    # close peaks survives even when it comes later along the axis
    x = np.array([5.0, 1.0, 2.0, 0.5, 3.0, 9.0, 0.1, 0.2, 8.0], np.float32)
    got = np.nonzero(np.asarray(find_peaks(
        jnp.asarray(x[None]), jnp.ones((1, 9), bool), 0.0, 3
    )[0]))[0].tolist()
    want = sorted(i for i, _ in ref.find_peaks_np(x, 0.0, 3))
    assert sorted(got) == want
    assert 5 in got and 8 in got  # 9.0 and the trailing edge peak 8.0
    assert 4 not in got           # 3.0 is within 3 of the higher 9.0


def test_find_peaks_exact_tie_visit_order():
    # EXACT value tie between an edge peak and a nearby interior peak: the
    # reference's stable value sort visits interior peaks (pushed first,
    # ascending index) before edge peaks (pushed after the interior loop,
    # peak_picking.rs:87-100), so the interior peak wins the dedup slot even
    # though the edge peak has the lower index.
    x = np.array([7.0, 1.0, 7.0, 1.0, 0.5], np.float32)  # ties at idx 0 and 2
    want = sorted(i for i, _ in ref.find_peaks_np(x, 0.0, 3))
    got = sorted(np.nonzero(np.asarray(find_peaks(
        jnp.asarray(x[None]), jnp.ones((1, 5), bool), 0.0, 3
    )[0]))[0].tolist())
    assert want == [2], want  # sanity: the port keeps the interior peak
    assert got == want


def test_threshold_median_mad_parity():
    rng = np.random.default_rng(7)
    for n in (5, 6, 33, 64):
        v = rng.random(n).astype(np.float32) * 3.0
        got = float(adaptive_threshold_median_mad(
            jnp.asarray(v[None]), jnp.ones((1, n), bool), 1.5
        )[0])
        want = ref.adaptive_threshold_median_mad_np(v, 1.5)
        assert abs(got - want) < 1e-5, (n, got, want)
