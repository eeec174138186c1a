"""Streaming (incremental) EVM calibrator.

The reference prototyped a sliding-window EVM that re-filters a rolling
pyramid buffer every frame instead of batch-calibrating once per 128 frames
(prototypes/locating.py:94-147 — flagged in SURVEY.md §2.0b as the precedent
for a streaming TPU calibrator).  Production only ships the batch variant;
here streaming is a first-class mode:

TPU-native design: per-level rolling (T, h_i, w_i) device buffers updated
with a roll+write (no host copies); each ``update`` runs the temporal
bandpass as the precomputed (T, T) matmul over the kept levels, collapses,
and reduces the heatmap — all one jitted program per frame.  Because the
bandpass operator is a fixed matrix, re-filtering the full window costs one
small matmul per level per frame; the localizer can therefore track a
*moving* subject continuously instead of freezing the ROI at calibration
time.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from respmon_tpu.config import CalibrationConfig
from respmon_tpu.ops import ccl
from respmon_tpu.ops.dtype import float_to_uint8, uint8_to_float
from respmon_tpu.ops.fft_bandpass import temporal_bandpass_fft
from respmon_tpu.ops.pyramid import (laplacian_pyramid, pyr_up,
                                     pyramid_shapes)


class StreamingState(NamedTuple):
    levels: Tuple[jnp.ndarray, ...]   # per-kept-level (T, h_i, w_i) rings
    count: jnp.ndarray                # frames absorbed (saturates at T)


class StreamingLocate(NamedTuple):
    ready: jnp.ndarray
    found: jnp.ndarray
    x: jnp.ndarray
    y: jnp.ndarray
    w: jnp.ndarray
    h: jnp.ndarray
    heatmap_u8: jnp.ndarray


def _kept_levels(cfg: CalibrationConfig):
    return list(range(cfg.skip_levels_at_top, cfg.pyramid_levels - 1))


def init_streaming_state(h: int, w: int, cfg: CalibrationConfig,
                         dtype=jnp.float32) -> StreamingState:
    shapes = pyramid_shapes(h, w, cfg.pyramid_levels)
    levels = tuple(
        jnp.zeros((cfg.buffer_length,) + shapes[i], dtype)
        for i in _kept_levels(cfg))
    return StreamingState(levels=levels, count=jnp.asarray(0, jnp.int32))


@partial(jax.jit, static_argnames=("cfg",))
def init_streaming_from_buffer(buffer: jnp.ndarray,
                               cfg: CalibrationConfig) -> StreamingState:
    """Warm-start the streaming rings from a full (T, H, W) calibration
    buffer in ONE batched program (vmapped pyramids), so a monitor that
    just batch-calibrated can enter streaming mode with a ready window
    instead of waiting ``buffer_length`` frames.

    ``buffer`` must hold at least ``cfg.buffer_length`` frames; the last
    ``buffer_length`` fill the rings (newest last, matching
    ``streaming_update``'s roll+write order)."""
    t = cfg.buffer_length
    buf = buffer[-t:]
    if buf.dtype == jnp.uint8:   # camera-native ingest (ops/dtype contract)
        buf = uint8_to_float(buf)
    lap = jax.vmap(
        lambda f: laplacian_pyramid(f, cfg.pyramid_levels))(buf)
    levels = tuple(lap[i] for i in _kept_levels(cfg))
    return StreamingState(levels=levels, count=jnp.asarray(t, jnp.int32))


@partial(jax.jit, static_argnames=("cfg",))
def streaming_absorb(state: StreamingState, frame: jnp.ndarray,
                     cfg: CalibrationConfig) -> StreamingState:
    """Absorb one frame into the rolling pyramid rings WITHOUT localizing —
    the cheap per-frame half of ``streaming_update``.  The monitor's
    streaming-ROI mode absorbs every frame (the bandpass assumes a
    contiguous fps-rate window) but only pays the localize half every
    ``streaming_interval`` frames."""
    kept = _kept_levels(cfg)
    if frame.dtype == jnp.uint8:  # camera-native ingest (ops/dtype contract)
        frame = uint8_to_float(frame)
    lap = laplacian_pyramid(frame, cfg.pyramid_levels)
    new_levels = []
    for ring, lvl in zip(state.levels, kept):
        rolled = jnp.roll(ring, -1, axis=0)
        new_levels.append(rolled.at[-1].set(lap[lvl]))
    return StreamingState(
        levels=tuple(new_levels),
        count=jnp.minimum(state.count + 1, cfg.buffer_length))


@partial(jax.jit, static_argnames=("fps", "cfg"))
def streaming_update(state: StreamingState, frame: jnp.ndarray, fps: float,
                     cfg: CalibrationConfig) \
        -> Tuple[StreamingState, StreamingLocate]:
    """Absorb one frame and localize over the current window.

    ``ready`` is False until the ring holds ``buffer_length`` frames
    (matching the prototype, which waits for a full deque before filtering,
    locating.py:117-143).
    """
    if frame.dtype == jnp.uint8:  # camera-native ingest (ops/dtype contract)
        frame = uint8_to_float(frame)
    h0, w0 = frame.shape
    shapes = pyramid_shapes(h0, w0, cfg.pyramid_levels)
    kept = _kept_levels(cfg)

    new_state = streaming_absorb(state, frame, cfg)
    new_levels = new_state.levels

    # Bandpass + collapse over the window (zero levels skipped implicitly).
    band = {lvl: temporal_bandpass_fft(ring, fps, cfg.freq_min,
                                       cfg.freq_max, cfg.amplification)
            for ring, lvl in zip(new_levels, kept)}
    last = cfg.pyramid_levels - 2
    img = jnp.zeros((cfg.buffer_length,) + shapes[last + 1], frame.dtype)
    for lvl in range(last, -1, -1):
        img = pyr_up(img, shapes[lvl])
        if lvl in band:
            img = img + band[lvl]

    lo = jnp.min(img)
    hi = jnp.max(img)
    top = hi - (hi - lo) * cfg.temporal_threshold
    masked = jnp.where(img >= top, lo, img)

    avg = jnp.mean(masked, axis=0)
    norm = (avg - jnp.min(avg)) / (jnp.max(avg) - jnp.min(avg))
    heat = float_to_uint8(norm)
    fg = heat.astype(jnp.int32) > jnp.round(cfg.threshold * 255.0) \
        .astype(jnp.int32)
    box = ccl.largest_component_bbox(fg)

    ready = new_state.count >= cfg.buffer_length
    return new_state, StreamingLocate(
        ready=ready, found=box.found & ready, x=box.x, y=box.y,
        w=box.w, h=box.h, heatmap_u8=heat)
