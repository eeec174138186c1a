"""FFT diagnostics (reference C14: tools.py:7-45, transforms.py:105-118,
prototypes/parabolic.py).

``show_frequencies`` plots a video's pixel-sum time series and spectrum (a
debug aid off the main path); ``freq_from_fft`` estimates a dominant
frequency via a Blackman-Harris-windowed FFT with parabolic inter-sample
peak interpolation (the approach the reference prototyped in
temporal_analysis.py and abandoned for peak-to-peak intervals, README-
documented).  The estimators run in JAX; plotting is host-side matplotlib,
gated."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def parabolic(f: jnp.ndarray, x: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                       jnp.ndarray]:
    """Quadratic interpolation of the extremum around index x of f
    (prototypes/parabolic.py semantics): returns (x_vertex, y_vertex)."""
    f = jnp.asarray(f)
    xm = f[x - 1]
    x0 = f[x]
    xp = f[x + 1]
    xv = x + 0.5 * (xm - xp) / (xm - 2.0 * x0 + xp)
    yv = x0 - 0.25 * (xm - xp) * (xv - x)
    return xv, yv


def _blackmanharris(n: int) -> np.ndarray:
    """4-term Blackman-Harris window (scipy.signal.blackmanharris)."""
    a = (0.35875, 0.48829, 0.14128, 0.01168)
    k = np.arange(n)
    return (a[0] - a[1] * np.cos(2 * np.pi * k / (n - 1))
            + a[2] * np.cos(4 * np.pi * k / (n - 1))
            - a[3] * np.cos(6 * np.pi * k / (n - 1)))


def freq_from_fft(sig: jnp.ndarray, fs: float) -> jnp.ndarray:
    """Dominant frequency via windowed FFT + parabolic peak interpolation
    (reference transforms.py:105-118)."""
    n = sig.shape[0]
    windowed = sig * jnp.asarray(_blackmanharris(n), sig.dtype)
    spectrum = jnp.abs(jnp.fft.rfft(windowed))
    i = jnp.argmax(spectrum)
    i = jnp.clip(i, 1, spectrum.shape[0] - 2)  # guard the edges
    true_i, _ = parabolic(jnp.log(spectrum + 1e-30), i)
    return fs * true_i / n


def pixel_sum_series(vid: jnp.ndarray, bounds=None) -> jnp.ndarray:
    """Per-frame pixel sums over frames 1..T-2 (tools.py:10-16 semantics:
    the first and last frames are skipped), optionally cropped to
    ``bounds = (x0, x1, y0, y1)``."""
    if bounds is not None:
        x0, x1, y0, y1 = bounds
        vid = vid[:, y0:y1, x0:x1]
    sums = jnp.sum(vid, axis=tuple(range(1, vid.ndim)))
    sums = sums[1:-1]
    return sums - jnp.min(sums)


def show_frequencies(vid_data, fps: float, bounds=None, show: bool = True):
    """Plot pixel-average series + positive-frequency spectrum
    (tools.py:7-45).  Returns (averages, freqs, magnitudes) so headless
    callers can use the data without matplotlib."""
    averages = np.asarray(pixel_sum_series(jnp.asarray(vid_data), bounds))
    n = len(averages)
    freqs = np.fft.fftfreq(n, d=1.0 / fps)
    mags = np.abs(np.fft.fft(averages))
    order = np.argsort(freqs)
    freqs_sorted = freqs[order]
    mags_sorted = mags[order]
    pos = freqs_sorted[int(len(freqs_sorted) / 2.0 + 1.0):]
    pos_m = mags_sorted[int(len(mags_sorted) / 2.0 + 1.0):]

    if show:
        try:
            import matplotlib.pyplot as plt
        except ImportError:  # pragma: no cover
            return averages, pos, pos_m
        plt.figure(figsize=(20, 10))
        plt.subplots_adjust(hspace=0.7)
        plt.subplot(2, 1, 1)
        plt.title("Pixel Average")
        plt.xlabel("Time")
        plt.ylabel("Brightness")
        plt.plot(averages)
        plt.subplot(2, 1, 2)
        plt.title("FFT")
        plt.xlabel("Freq (Hz)")
        plt.plot(pos, pos_m)
        plt.show()
    return averages, pos, pos_m
