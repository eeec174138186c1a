"""Parity tests: peak detection vs the peakutils oracle (base.py:314)."""

import numpy as np
import pytest

import jax.numpy as jnp

from respmon_tpu.ops import peaks
from tests.golden import reference_numpy as golden


def _run_masked(y, count, min_dist, n=128, thres=0.3, max_peaks=64):
    y_padded = np.zeros(n)
    y_padded[n - count:] = y
    y_padded[: n - count] = 1e6  # garbage must not leak into detection
    idx, mask = peaks.peak_indexes_masked(
        jnp.asarray(y_padded), jnp.asarray(count), min_dist, thres=thres,
        max_peaks=max_peaks)
    got = np.asarray(idx)[np.asarray(mask)] - (n - count)
    return got


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("min_dist", [1, 2, 5, 10])
def test_random_signals_match_oracle(seed, min_dist):
    rng = np.random.default_rng(seed)
    y = rng.standard_normal(128)
    want = golden.peakutils_indexes(y, min_dist=min_dist)
    got = _run_masked(y, 128, min_dist)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("count", [13, 21, 40, 77, 128])
def test_masked_counts_match_oracle(count):
    rng = np.random.default_rng(count)
    t = np.arange(count) / 10.0
    y = np.sin(2 * np.pi * 0.3 * t) + 0.05 * rng.standard_normal(count)
    want = golden.peakutils_indexes(y, min_dist=10)
    got = _run_masked(y, count, 10)
    np.testing.assert_array_equal(got, want)


def test_plateau_handling_matches_oracle():
    y = np.array([0., 1., 1., 1., 0., 2., 2., 0., 3., 0., 0., 5., 5., 5., 5.,
                  0.])
    for md in (1, 2, 3):
        want = golden.peakutils_indexes(y, min_dist=md)
        got = _run_masked(y, len(y), md, n=32)
        np.testing.assert_array_equal(got, want)


def test_flat_signal_no_peaks():
    y = np.ones(64)
    got = _run_masked(y, 64, 5)
    assert got.size == 0
    assert golden.peakutils_indexes(y, min_dist=5).size == 0


def test_tie_breaking_matches_oracle():
    # Two equal-height peaks within min_dist: peakutils keeps the later one.
    y = np.array([0., 5., 0., 0., 5., 0., 0., 0.])
    want = golden.peakutils_indexes(y, min_dist=4)
    got = _run_masked(y, len(y), 4, n=16)
    np.testing.assert_array_equal(got, want)


def test_threshold_is_relative():
    y = np.array([10., 11., 10., 10., 20., 10., 10., 12., 10.])
    want = golden.peakutils_indexes(y, min_dist=1)
    got = _run_masked(y, len(y), 1, n=16)
    np.testing.assert_array_equal(got, want)


def test_vendored_peakutils_matches_rederivation():
    # Two independent implementations of the same semantics: the vendored
    # actual peakutils sources (tests/golden/vendor, what the golden
    # pipeline runs) and the from-scratch re-derivation must agree.
    cases = [np.array([0., 1., 1., 1., 0., 2., 2., 0., 3., 0., 0., 5., 5.,
                       5., 5., 0.]),
             np.ones(64),
             np.array([0., 5., 0., 0., 5., 0., 0., 0.]),
             np.array([10., 11., 10., 10., 20., 10., 10., 12., 10.])]
    for seed in range(12):
        rng = np.random.default_rng(seed)
        cases.append(rng.standard_normal(128))
    for y in cases:
        for md in (1, 2, 4, 10):
            np.testing.assert_array_equal(
                golden.vendored_peakutils.indexes(y.astype(float),
                                                  min_dist=md),
                golden.rederived_indexes(y, min_dist=md),
                err_msg=f"min_dist={md}")


def test_vendored_gaussian_fit_matches_rederivation():
    t = np.linspace(0.0, 6.0, 24)
    rng = np.random.default_rng(5)
    for ampl, c, dev in [(1.0, 2.0, 0.5), (2.5, 1.0, 3.0), (0.3, 4.0, 0.7)]:
        y = golden.rederived_gaussian(t, ampl, c, dev) \
            + 0.01 * rng.standard_normal(t.size)
        want = golden.rederived_gaussian_fit(t, y, center_only=False)
        got = golden.vendored_peakutils.gaussian_fit(t, y, center_only=False)
        np.testing.assert_allclose(got, want, rtol=1e-10)


def test_breathing_like_signal():
    rng = np.random.default_rng(99)
    fps, bpm = 10.0, 18.0
    t = np.arange(128) / fps
    y = np.sin(2 * np.pi * (bpm / 60.0) * t) + 0.02 * rng.standard_normal(128)
    md = int(np.floor(fps / 1.0))
    want = golden.peakutils_indexes(y, min_dist=md)
    got = _run_masked(y, 128, md)
    np.testing.assert_array_equal(got, want)
    # sanity: ~18/60*12.8s ≈ 3-4 peaks
    assert 2 <= got.size <= 5
