"""Parity tests: JAX IIR filtering vs scipy (reference transforms.py:38-79)."""

import numpy as np
import pytest
import scipy.signal as sps

import jax.numpy as jnp

from respmon_tpu.ops import filters


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(1234)


def test_lfilter_matches_scipy_1d(rng):
    x = rng.standard_normal(200)
    coeffs = filters.design_butter_lowpass(0.5, 10.0, order=3)
    got = np.asarray(filters.lfilter(coeffs, jnp.asarray(x)))
    want = sps.lfilter(np.asarray(coeffs.b), np.asarray(coeffs.a), x)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_lfilter_matches_scipy_bandpass_order6(rng):
    # The IIR temporal bandpass alternative (reference transforms.py:72-79).
    x = rng.standard_normal((128, 7))
    coeffs = filters.design_butter_bandpass(0.1, 1.0, 10.0, order=6)
    got = np.asarray(filters.lfilter(coeffs, jnp.asarray(x)))
    want = sps.lfilter(np.asarray(coeffs.b), np.asarray(coeffs.a), x, axis=0)
    # The order-6 narrowband filter has poles at radius ~0.986; ULP-level
    # FMA-vs-non-FMA rounding differences amplify through the recurrence, so
    # compare relative to signal scale rather than elementwise.
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-3 * scale)


def test_lfilter_with_zi_matches_scipy(rng):
    x = rng.standard_normal(64)
    coeffs = filters.design_butter_lowpass(1.2, 30.0, order=4)
    zi = np.asarray(coeffs.zi) * x[0]
    got = np.asarray(filters.lfilter(coeffs, jnp.asarray(x),
                                     zi=jnp.asarray(zi)))
    want, _ = sps.lfilter(np.asarray(coeffs.b), np.asarray(coeffs.a), x, zi=zi)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_filtfilt_full_matches_scipy(rng):
    x = rng.standard_normal(128)
    coeffs = filters.design_butter_lowpass(0.5, 10.0, order=3)
    got = np.asarray(filters.filtfilt(coeffs, jnp.asarray(x)))
    want = sps.filtfilt(np.asarray(coeffs.b), np.asarray(coeffs.a), x)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("count", [13, 14, 20, 37, 64, 100, 127, 128])
def test_filtfilt_masked_matches_scipy_all_counts(rng, count):
    # The monitor filters a growing deque (13..128 samples) each frame
    # (reference base.py:342, 489); the masked kernel must match scipy's
    # filtfilt on the unpadded signal for every length.
    n = 128
    x = rng.standard_normal(count)
    x_padded = np.zeros(n)
    x_padded[n - count:] = x
    x_padded[: n - count] = rng.standard_normal(n - count) * 100  # garbage
    coeffs = filters.design_butter_lowpass(0.5, 10.0, order=3)
    got = np.asarray(filters.filtfilt_masked(
        coeffs, jnp.asarray(x_padded), jnp.asarray(count)))[n - count:]
    want = sps.filtfilt(np.asarray(coeffs.b), np.asarray(coeffs.a), x)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_filtfilt_masked_reference_callsite_params(rng):
    # Exact reference call: butter_lowpass_filter(data, freq_max*0.5, fps,
    # order=3) with fps=10, freq_max=1.0 (base.py:342).
    count = 50
    n = 128
    t = np.arange(count) / 10.0
    x = np.sin(2 * np.pi * 0.3 * t) + 0.1 * rng.standard_normal(count)
    x_padded = np.zeros(n)
    x_padded[n - count:] = x
    coeffs = filters.design_butter_lowpass(0.5, 10.0, order=3)
    got = np.asarray(filters.filtfilt_masked(
        coeffs, jnp.asarray(x_padded), jnp.asarray(count)))[n - count:]
    b, a = sps.butter(3, 0.5 / 5.0, btype="low")
    want = sps.filtfilt(b, a, x)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_filtfilt_float32_tolerance(rng):
    # Device dtype sanity: float32 path stays within BPM-relevant tolerance.
    x = rng.standard_normal(128).astype(np.float32)
    coeffs = filters.design_butter_lowpass(0.5, 10.0, order=3)
    got = np.asarray(filters.filtfilt(coeffs, jnp.asarray(x)))
    want = sps.filtfilt(np.asarray(coeffs.b), np.asarray(coeffs.a),
                        x.astype(np.float64))
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_lfilter_assoc_matches_sequential(rng):
    x = rng.standard_normal(152)
    coeffs = filters.design_butter_lowpass(0.5, 10.0, order=3)
    zi = np.asarray(coeffs.zi) * x[0]
    seq = np.asarray(filters.lfilter(coeffs, jnp.asarray(x),
                                     zi=jnp.asarray(zi)))
    par = np.asarray(filters.lfilter_assoc(coeffs, jnp.asarray(x),
                                           zi=jnp.asarray(zi)))
    np.testing.assert_allclose(par, seq, rtol=1e-10, atol=1e-12)


def test_filtfilt_masked_associative_matches_scipy(rng):
    import scipy.signal as sps

    n, count = 128, 50
    x = rng.standard_normal(count)
    xp = np.zeros(n)
    xp[n - count:] = x
    coeffs = filters.design_butter_lowpass(0.5, 10.0, order=3)
    for assoc in (True, False):
        got = np.asarray(filters.filtfilt_masked(
            coeffs, jnp.asarray(xp), jnp.asarray(count),
            associative=assoc))[n - count:]
        want = sps.filtfilt(np.asarray(coeffs.b), np.asarray(coeffs.a), x)
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)
