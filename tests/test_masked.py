"""Masked-op helpers vs naive numpy loops."""

import numpy as np
import jax.numpy as jnp

from stratum_dsp_tpu.ops import masked


def test_moving_average_matches_reference_semantics(rng):
    # reference smooth_moving_average_in_place (novelty.rs:970-986)
    n, n_valid, w = 50, 37, 5
    x = rng.standard_normal(n).astype(np.float32)
    mask = np.arange(n) < n_valid
    ref = x.copy()
    half = w // 2
    for i in range(n_valid):
        lo = max(i - half, 0)
        hi = min(i + half + 1, n_valid)
        ref[i] = x[lo:hi].mean()
    got = np.asarray(masked.moving_average(jnp.asarray(x), jnp.asarray(mask), w))
    np.testing.assert_allclose(got[:n_valid], ref[:n_valid], rtol=1e-5, atol=1e-6)


def test_local_mean_subtract(rng):
    n, n_valid, w = 64, 50, 16
    x = np.abs(rng.standard_normal(n)).astype(np.float32)
    mask = np.arange(n) < n_valid
    half = w // 2
    ref = x.copy()
    for i in range(n_valid):
        lo = max(i - half, 0)
        hi = min(i + half + 1, n_valid)
        ref[i] = max(x[i] - x[lo:hi].mean(), 0.0)
    got = np.asarray(masked.local_mean_subtract(jnp.asarray(x), jnp.asarray(mask), w))
    np.testing.assert_allclose(got[:n_valid], ref[:n_valid], rtol=1e-5, atol=1e-6)


def test_max_pool_1d(rng):
    x = rng.standard_normal((3, 20)).astype(np.float32)
    r = 2
    got = np.asarray(masked.max_pool_1d(jnp.asarray(x), r))
    for i in range(20):
        lo, hi = max(i - r, 0), min(i + r + 1, 20)
        np.testing.assert_allclose(got[:, i], x[:, lo:hi].max(axis=-1))


def test_masked_percentile_matches_reference(rng):
    # spectral_flux.rs:163-170: sorted[floor(n*pct)] clamped
    n, n_valid = 40, 33
    x = rng.standard_normal(n).astype(np.float32)
    mask = np.arange(n) < n_valid
    for pct in [0.0, 0.5, 0.8, 0.99, 1.0]:
        s = np.sort(x[:n_valid])
        ref = s[min(int(n_valid * pct), n_valid - 1)]
        got = float(masked.masked_percentile_value(jnp.asarray(x), jnp.asarray(mask), pct))
        assert got == ref


def test_masked_median(rng):
    n, n_valid = 31, 20
    x = rng.standard_normal(n).astype(np.float32)
    mask = np.arange(n) < n_valid
    ref = np.sort(x[:n_valid])[n_valid // 2]
    got = float(masked.masked_median(jnp.asarray(x), jnp.asarray(mask)))
    assert got == ref


def test_median_filter_1d(rng):
    x = rng.standard_normal(25).astype(np.float32)
    half = 3
    got = np.asarray(masked.median_filter_1d(jnp.asarray(x), half))
    for i in range(25):
        lo, hi = max(i - half, 0), min(i + half + 1, 25)
        w = np.sort(x[lo:hi])
        c = len(w)
        ref = w[c // 2] if c % 2 else 0.5 * (w[c // 2 - 1] + w[c // 2])
        np.testing.assert_allclose(got[i], ref, rtol=1e-6)


def test_greedy_dedup_sorted():
    vals = jnp.asarray([[1.0, 1.3, 2.5, 2.9, 3.6, 100.0]])
    valid = jnp.asarray([[True, True, True, True, True, False]])
    keep = np.asarray(masked.greedy_dedup_sorted(vals, valid, 0.75))
    # 1.0 kept; 1.3 dropped (<0.75 away); 2.5 kept; 2.9 dropped; 3.6 kept
    np.testing.assert_array_equal(keep[0], [True, False, True, False, True, False])


def test_distance_to_nearest_true():
    mask = jnp.asarray([[False, False, True, False, False, False, True, False]])
    d = np.asarray(masked.distance_to_nearest_true(mask))
    np.testing.assert_allclose(d[0], [2, 1, 0, 1, 2, 1, 0, 1])
