"""Whole-clip fast path: the entire measure loop as one ``lax.scan``.

The reference processes clips frame-by-frame in Python at 5-10 fps
(SURVEY.md §6).  Here a full clip runs in two device calls:

  1. ``evm.locate`` on the calibration buffer (one fused program), then
  2. ``measure_clip``: ``lax.scan`` of the motion step over all remaining
     frames, optionally fusing a per-frame BPM estimate (the reference runs
     its full filter+peak-fit ``measure()`` every frame, base.py:489-491) —
     yielding the per-frame sample trace, BPM trace, and final state.

This is the benchmark path (BASELINE.md: >=100x real-time at 640x480) and
the template the multi-stream vmapped pipeline (parallel/streams.py) maps
over.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from respmon_tpu.config import MonitorConfig
from respmon_tpu.ops import filters
from respmon_tpu.pipeline import bpm as bpm_mod
from respmon_tpu.pipeline import evm, motion


class ClipMeasureResult(NamedTuple):
    samples: jnp.ndarray    # (T,) per-frame motion values
    t: jnp.ndarray          # (T,) time axis
    bpm: jnp.ndarray        # (T,) BPM trace (valid where has_bpm)
    has_bpm: jnp.ndarray    # (T,) bool
    error: jnp.ndarray      # (T,) bool — per-frame error flag
    final_state: motion.MeasureState


@partial(jax.jit, static_argnames=("spec", "coeffs", "min_dist", "cfg",
                                   "estimate_every_frame"))
def measure_clip(frames: jnp.ndarray, roi: jnp.ndarray,
                 spec: motion.MeasureSpec,
                 coeffs: filters.FilterCoeffs, min_dist: int,
                 cfg,  # MeasureConfig (hashable)
                 estimate_every_frame: bool = True) -> ClipMeasureResult:
    """Scan the measure step (+ optional per-frame BPM) over (T, H, W)."""
    state0 = motion.init_state(spec, (0, 0, 0, 0), dtype=frames.dtype)
    state0 = state0._replace(roi=roi.astype(jnp.int32))

    def body(state, frame):
        state, sample = motion.measure_step(state, frame, spec)
        if estimate_every_frame:
            res = bpm_mod.estimate_bpm(state.data, state.t, state.count,
                                       coeffs, min_dist, cfg)
            ran = state.count > cfg.initialization_length
            out = (sample, state.t[-1], res.bpm, res.has_bpm & ran,
                   state.error)
        else:
            z = jnp.asarray(0.0, frames.dtype)
            out = (sample, state.t[-1], z, jnp.asarray(False), state.error)
        return state, out

    final, (samples, t, bpm, has, err) = jax.lax.scan(body, state0, frames)
    return ClipMeasureResult(samples=samples, t=t, bpm=bpm, has_bpm=has,
                             error=err, final_state=final)


class ClipRunResult(NamedTuple):
    found: bool
    roi: Optional[Tuple[int, int, int, int]]
    measure: Optional[ClipMeasureResult]
    final_bpm: Optional[float]


def process_clip(frames: np.ndarray, fps: float, cfg: MonitorConfig,
                 dtype=jnp.float32,
                 estimate_every_frame: bool = True) -> ClipRunResult:
    """Calibrate on the first buffer_length frames, then scan-measure the
    rest.  Two device dispatches total (the ROI's bucketed crop shape is a
    static compile parameter, so locate's result crosses the host once)."""
    cal_len = cfg.calibration.buffer_length
    assert frames.shape[0] > cal_len + 1, "clip shorter than calibration"
    cal = jnp.asarray(frames[:cal_len], dtype)

    loc = evm.locate(cal, float(fps), cfg.calibration)
    if not bool(loc.found):
        return ClipRunResult(found=False, roi=None, measure=None,
                             final_bpm=None)
    x, y, w, h = int(loc.x), int(loc.y), int(loc.w), int(loc.h)

    from respmon_tpu.utils.bbox import reduce_bounding_box

    x, y, w, h = reduce_bounding_box(
        x, y, w, h, cfg.calibration.maximum_bounding_box_area)

    spec = motion.MeasureSpec.for_roi(cfg, frames.shape[1], frames.shape[2],
                                      w, h, float(fps))
    coeffs = filters.design_butter_lowpass(
        cfg.calibration.freq_max * 0.5, float(fps),
        cfg.measure.filter_order)
    min_dist = max(int(np.floor(fps / cfg.calibration.freq_max)), 1)

    # The frame right after the buffer is dropped by the reference loop (it
    # arrives during the locate iteration, base.py:427-463).
    rest = jnp.asarray(frames[cal_len + 1:], dtype)
    res = measure_clip(rest, jnp.asarray([x, y, w, h]), spec, coeffs,
                       min_dist, cfg.measure,
                       estimate_every_frame=estimate_every_frame)

    has = np.asarray(res.has_bpm)
    final_bpm = float(np.asarray(res.bpm)[has][-1]) if has.any() else None
    return ClipRunResult(found=True, roi=(x, y, w, h), measure=res,
                         final_bpm=final_bpm)
