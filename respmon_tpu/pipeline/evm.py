"""Eulerian video magnification calibration — one fused device program.

Replaces the reference's calibration stack (transforms.py:144-198 +
base.py:547-601), which is its compute bottleneck (SURVEY.md §3.3): 128
frames x 9-level OpenCV pyramid + per-pixel scipy FFTs + per-frame collapse.
Here the whole chain — Laplacian video pyramid, per-level packed-rfft
temporal bandpass (as MXU matmuls), bandpassed-pyramid collapse, suppress-top
windowing, heatmap reduction, threshold, and largest-component bbox — traces
into a single ``jax.jit`` program over the on-device (T, H, W) buffer.

The bandpassed pyramid skips the top ``skip_levels_at_top`` levels and the
bottom (Gaussian) level (transforms.py:156-160); skipped levels contribute
zeros to the collapse, so the collapse starts from the deepest *filtered*
level and pyr-ups through the zero levels — mathematically identical to the
reference's zero-filled collapse but without touching full-res zero arrays.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from respmon_tpu.config import CalibrationConfig
from respmon_tpu.ops import ccl
from respmon_tpu.ops.dtype import float_to_uint8
from respmon_tpu.ops.fft_bandpass import temporal_bandpass_fft
from respmon_tpu.ops.pyramid import (laplacian_pyramid, pyr_up,
                                     pyramid_shapes)


class EVMResult(NamedTuple):
    masked: jnp.ndarray   # (T, H, W) suppress-top-masked bandpassed video
    raw: jnp.ndarray      # (T, H, W) raw collapsed bandpassed video


class LocateResult(NamedTuple):
    found: jnp.ndarray      # bool — False mirrors locate() returning None
    x: jnp.ndarray          # int32 bbox (cv2 convention)
    y: jnp.ndarray
    w: jnp.ndarray
    h: jnp.ndarray
    heatmap_u8: jnp.ndarray  # (H, W) uint8 normalized average frame
    thresh: jnp.ndarray      # (H, W) uint8 binary threshold image
    raw_heat_u8: jnp.ndarray  # (H, W) uint8 of the unmasked heatmap


def _band_laplacian_levels(vid: jnp.ndarray, cfg: CalibrationConfig):
    """Laplacian levels [skip_top, levels-2] of the video.

    On TPU backends this runs the fused Pallas kernel (the whole per-frame
    pyramid stays in VMEM; ~2x the XLA formulation, bit-identical — see
    ops/pyramid_pallas.py); the XLA path serves CPU/interpret contexts.
    """
    first = cfg.skip_levels_at_top
    last = cfg.pyramid_levels - 2
    # The fused kernel keeps a frame plus its full Gaussian pyramid
    # (~4/3 of the frame) x2 pipeline buffers in VMEM; guard against
    # footprints that exceed the ~16 MB budget (e.g. 1080p frames).
    h, w = vid.shape[-2:]
    vmem_bytes = int(h * w * vid.dtype.itemsize * (4.0 / 3.0) * 2.2)
    # Mosaic kernels are TPU-only ('axon' is a tunneled TPU plugin); GPU and
    # other backends take the XLA path.
    if jax.default_backend() in ("tpu", "axon") \
            and vmem_bytes < 14 * 1024 * 1024:
        from respmon_tpu.ops.pyramid_pallas import laplacian_band_levels

        levels = laplacian_band_levels(vid, cfg.pyramid_levels, first)
        return dict(zip(range(first, last + 1), levels))
    lap = laplacian_pyramid(vid, cfg.pyramid_levels)
    return {i: lap[i] for i in range(first, last + 1)}


def eulerian_magnification_bandpass(vid: jnp.ndarray, fps: float,
                                    cfg: CalibrationConfig) -> EVMResult:
    """transforms.py:144-198 as one traced computation.

    vid: (T, H, W) float frames in [0, 1].
    """
    t_len, h, w = vid.shape
    levels = cfg.pyramid_levels
    shapes = pyramid_shapes(h, w, levels)

    band_lap = _band_laplacian_levels(vid, cfg)

    # Bandpass the kept levels (skip top `skip_levels_at_top` and bottom 1)
    # with the configured temporal filter (transforms.py:146).
    assert cfg.temporal_filter in ("fft", "iir"), \
        f"temporal_filter must be 'fft' or 'iir', got {cfg.temporal_filter!r}"
    if cfg.temporal_filter == "fft":
        filt = lambda lvl: temporal_bandpass_fft(
            lvl, fps, cfg.freq_min, cfg.freq_max, cfg.amplification)
    else:
        from respmon_tpu.ops.fft_bandpass import temporal_bandpass_iir

        filt = lambda lvl: temporal_bandpass_iir(
            lvl, fps, cfg.freq_min, cfg.freq_max, cfg.amplification)
    last = levels - 2  # inclusive; level levels-1 is the Gaussian top
    band = {i: filt(lvl) for i, lvl in band_lap.items()}

    # Collapse the (implicitly zero-padded) bandpassed pyramid: start at the
    # deepest filtered level and pyrUp-add up through level 0 (zero levels
    # just pass the upsampled image through).
    img = jnp.zeros((t_len,) + shapes[last + 1], vid.dtype)
    for lvl in range(last, -1, -1):
        img = pyr_up(img, shapes[lvl])
        if lvl in band:
            img = img + band[lvl]
    raw = img

    # Suppress-top windowing (transforms.py:184-192): values within
    # `temporal_threshold` of the global max (proportionally) -> global min.
    lo = jnp.min(raw)
    hi = jnp.max(raw)
    top = hi - (hi - lo) * cfg.temporal_threshold
    masked = jnp.where(raw >= top, lo, raw)
    return EVMResult(masked=masked, raw=raw)


@partial(jax.jit, static_argnames=("fps", "cfg"))
def locate(vid: jnp.ndarray, fps: float, cfg: CalibrationConfig) \
        -> LocateResult:
    """base.py:547-601 on device: EVM heatmap -> normalize -> threshold ->
    largest 8-connected region -> bounding box.

    Returns found=False when the threshold image has no foreground (the
    reference's `len(contours) <= 0 -> None` retry path, base.py:569-570).
    """
    evm = eulerian_magnification_bandpass(vid, fps, cfg)

    avg = jnp.mean(evm.masked, axis=0)
    avg_norm = (avg - jnp.min(avg)) / (jnp.max(avg) - jnp.min(avg))
    heat_u8 = float_to_uint8(avg_norm)

    threshold = jnp.round(cfg.threshold * 255.0).astype(jnp.int32)
    fg = heat_u8.astype(jnp.int32) > threshold   # cv2.THRESH_BINARY strict >
    thresh_img = jnp.where(fg, jnp.uint8(255), jnp.uint8(0))

    box = ccl.largest_component_bbox(fg)

    raw_avg = jnp.mean(evm.raw, axis=0)
    raw_norm = (raw_avg - jnp.min(raw_avg)) / \
        (jnp.max(raw_avg) - jnp.min(raw_avg))
    raw_u8 = float_to_uint8(raw_norm)

    return LocateResult(found=box.found, x=box.x, y=box.y, w=box.w, h=box.h,
                        heatmap_u8=heat_u8, thresh=thresh_img,
                        raw_heat_u8=raw_u8)
