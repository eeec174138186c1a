"""Parity tests: packed-rfft temporal bandpass vs scipy.fftpack composition
(reference transforms.py:82-102)."""

import numpy as np
import pytest
import scipy.fftpack

import jax.numpy as jnp

from respmon_tpu.ops import fft_bandpass
from tests.golden import reference_numpy as golden


@pytest.mark.parametrize("n", [128, 64, 100, 101])
def test_mask_matches_reference_slicing(n):
    fps, fmin, fmax = 10.0, 0.1, 1.0
    mask = np.asarray(fft_bandpass.packed_bandpass_mask(n, fps, fmin, fmax))
    freqs = scipy.fftpack.fftfreq(n, d=1.0 / fps)
    bl = int(np.abs(freqs - fmin).argmin())
    bh = int(np.abs(freqs - fmax).argmin())
    want = np.ones(n)
    want[bh:-bh] = 0
    if bl != 0:
        want[:bl] = 0
        want[-bl:] = 0
    np.testing.assert_array_equal(mask, want)


@pytest.mark.parametrize("n", [128, 64, 101])
@pytest.mark.parametrize("fps", [10.0, 5.01, 7.68])
def test_operator_matches_fftpack_chain(n, fps):
    rng = np.random.default_rng(int(fps * 100) + n)
    data = rng.random((n, 6, 5))
    want = golden.temporal_bandpass_fft(data, fps, 0.1, 1.0, 500.0)
    got = np.asarray(fft_bandpass.temporal_bandpass_fft(
        jnp.asarray(data), fps, 0.1, 1.0, 500.0))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-8)


def test_operator_is_linear_map_of_identity():
    # The (T,T) operator columns must equal the chain applied to unit pulses.
    n = 32
    fps = 10.0
    op = fft_bandpass.packed_bandpass_operator(n, fps, 0.1, 1.0, 500.0)
    eye = np.eye(n)
    want = np.stack([
        golden.temporal_bandpass_fft(eye[:, i][:, None, None], fps, 0.1, 1.0,
                                     500.0)[:, 0, 0]
        for i in range(n)], axis=1)
    np.testing.assert_allclose(op, want, rtol=1e-9, atol=1e-9)


def test_float32_device_dtype_tolerance():
    n = 128
    rng = np.random.default_rng(0)
    data = rng.random((n, 8, 8)).astype(np.float32)
    want = golden.temporal_bandpass_fft(data.astype(np.float64), 10.0,
                                        0.1, 1.0, 500.0)
    got = np.asarray(fft_bandpass.temporal_bandpass_fft(
        jnp.asarray(data), 10.0, 0.1, 1.0, 500.0))
    assert got.dtype == np.float32
    # f32 matmul over 128 taps with amplification 500: error scales with the
    # output magnitude.
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4 * scale)


def test_iir_variant_matches_reference_chain():
    # transforms.py:72-79: order-6 butter bandpass lfilter x amplification
    # (transfer-function form, float64 parity path).
    import scipy.signal as sps

    rng = np.random.default_rng(3)
    data = rng.random((128, 4, 3))
    b, a = sps.butter(6, [0.1 / 5.0, 1.0 / 5.0], btype="band")
    want = sps.lfilter(b, a, data, axis=0) * 50.0
    got = np.asarray(fft_bandpass.temporal_bandpass_iir(
        jnp.asarray(data), 10.0, 0.1, 1.0, 50.0, sos=False))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-3 * scale)


def test_iir_sos_matches_scipy_and_survives_float32():
    import scipy.signal as sps

    rng = np.random.default_rng(4)
    data = rng.random((256, 4))
    sos = sps.butter(6, [0.1 / 5.0, 1.0 / 5.0], btype="band", output="sos")
    want = sps.sosfilt(sos, data, axis=0) * 50.0
    got = np.asarray(fft_bandpass.temporal_bandpass_iir(
        jnp.asarray(data), 10.0, 0.1, 1.0, 50.0, sos=True))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)

    # float32: the TF form overflows to inf here; SOS must stay finite and
    # close to the float64 result.
    got32 = np.asarray(fft_bandpass.temporal_bandpass_iir(
        jnp.asarray(data.astype(np.float32)), 10.0, 0.1, 1.0, 50.0,
        sos=True))
    assert np.isfinite(got32).all()
    scale = np.abs(want).max()
    np.testing.assert_allclose(got32, want, rtol=0, atol=1e-3 * scale)
