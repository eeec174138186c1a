"""Tests for auxiliary components: diagnostics (C14), wavelets (C15),
Benchmarker (C11), bbox reduction (C12), dtype converters (C10)."""

import numpy as np
import pytest

import jax.numpy as jnp

from respmon_tpu.ops import dtype as dtype_ops
from respmon_tpu.ops import wavelets
from respmon_tpu.utils import diagnostics
from respmon_tpu.utils.bbox import reduce_bounding_box
from respmon_tpu.utils.bench import Benchmarker


def test_freq_from_fft_recovers_tone():
    fs = 10.0
    t = np.arange(256) / fs
    sig = np.sin(2 * np.pi * 0.31 * t)
    got = float(diagnostics.freq_from_fft(jnp.asarray(sig), fs))
    assert abs(got - 0.31) < 0.005


def test_parabolic_matches_quadratic_vertex():
    # f(x) = -(x-3.4)^2 + 7 sampled at integers peaks at 3.4.
    xs = np.arange(8).astype(float)
    f = -(xs - 3.4) ** 2 + 7
    xv, yv = diagnostics.parabolic(jnp.asarray(f), jnp.asarray(3))
    np.testing.assert_allclose(float(xv), 3.4, atol=1e-9)
    np.testing.assert_allclose(float(yv), 7.0, atol=1e-9)


def test_show_frequencies_headless_data():
    vid = np.random.default_rng(0).random((32, 8, 8))
    averages, freqs, mags = diagnostics.show_frequencies(vid, 10.0,
                                                         show=False)
    assert len(averages) == 30  # first/last frames skipped (tools.py:12)
    assert averages.min() == 0.0
    assert len(freqs) == len(mags)


def test_wavelet_perfect_reconstruction():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(128))
    a, d = wavelets.dwt_db4(x)
    rec = wavelets.idwt_db4(a, d, 128)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x),
                               rtol=1e-9, atol=1e-9)


def test_wavelet_filter_smooths():
    fs = 50.0
    t = np.arange(256) / fs
    clean = np.sin(2 * np.pi * 0.5 * t)
    noisy = clean + 0.3 * np.random.default_rng(2).standard_normal(256)
    sm = np.asarray(wavelets.wavelet_filter(jnp.asarray(noisy),
                                            iterations=3))
    assert sm.shape == noisy.shape
    # Smoothing must reduce high-frequency energy.
    hf = lambda s: np.abs(np.diff(s, 2)).mean()
    assert hf(sm) < 0.3 * hf(noisy)
    # And still correlate strongly with the underlying slow wave.
    assert np.corrcoef(sm[16:-16], clean[16:-16])[0, 1] > 0.95


def test_benchmarker_report_format():
    b = Benchmarker()
    b.add_tag("Frame Capture")
    b.tick_start("Frame Capture")
    b.tick_end("Frame Capture")
    rep = b.get_report()
    assert rep.startswith("Tag, Average Time (seconds), Iterations")
    assert "Frame Capture" in rep
    assert b.has_tag("Frame Capture") and not b.has_tag("nope")


def test_reduce_bounding_box_noop_and_shrink():
    assert reduce_bounding_box(5, 6, 10, 20, np.inf) == (5, 6, 10, 20)
    x, y, w, h = reduce_bounding_box(0, 0, 100, 100, 2500)
    assert (w * h) <= 2500 * 1.05
    # Shrinks about the center preserving aspect.
    assert (x, y) == (25, 25) and w == h == 50


def test_float_to_uint8_wraps_not_clips():
    # The reference's converter wraps mod 256 (transforms.py:26-29).
    vals = jnp.asarray([0.0, 0.5, 1.0, 1.5, -0.5])
    out = np.asarray(dtype_ops.float_to_uint8(vals))
    assert out[0] == 0 and out[1] == 127 and out[2] == 255
    assert out[3] == (int(np.trunc(1.5 * 255)) % 256)
    assert out[4] == (int(np.trunc(-0.5 * 255)) % 256)


def test_bgr_to_gray_matches_cv2():
    # Bit-exact: the device helper uses cv2's fixed-point BT.601 formula
    # (same integer arithmetic as native/resp_native.cpp).
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    got = np.asarray(dtype_ops.bgr_to_gray(jnp.asarray(frame)))
    want = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    np.testing.assert_array_equal(got, want)
