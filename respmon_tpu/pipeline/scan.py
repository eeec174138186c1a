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


def bpm_trace(samples: jnp.ndarray, fps: float,
              coeffs: filters.FilterCoeffs, min_dist: int, cfg):
    """Per-frame BPM trace for a whole clip, computed in one batch.

    The reference re-runs its full ``measure()`` on the growing buffer every
    frame (base.py:489-491) — sequential, quadratic-ish work.  Each frame's
    estimate depends only on its sample-window prefix, not on any carried
    state, so all T estimates vectorize: build the (T, N) matrix of
    right-aligned ring windows and ``vmap`` the BPM stage over rows.  On
    TPU this replaces T sequential trust-region LM solves with one batched
    solve whose while_loop runs to the slowest lane — orders of magnitude
    less sequential depth, bit-identical per-frame results.
    """
    t_len = samples.shape[0]
    n = cfg.buffer_length
    j = jnp.arange(n)[None, :]
    src = jnp.arange(t_len)[:, None] - (n - 1) + j
    wins = samples[jnp.clip(src, 0, t_len - 1)]
    ts = src.astype(samples.dtype) / fps          # == the monitor's t axis
    counts = jnp.minimum(jnp.arange(t_len) + 1, n)

    def one(w, tw, c):
        r = bpm_mod.estimate_bpm(w, tw, c, coeffs, min_dist, cfg)
        return r.bpm, r.has_bpm

    bpm, has = jax.vmap(one)(wins, ts, counts)
    has = has & (counts > cfg.initialization_length)
    return bpm, has


@partial(jax.jit, static_argnames=("spec", "coeffs", "min_dist", "cfg",
                                   "estimate_every_frame"))
def measure_clip(frames: jnp.ndarray, roi: jnp.ndarray,
                 spec: motion.MeasureSpec,
                 coeffs: filters.FilterCoeffs, min_dist: int,
                 cfg,  # MeasureConfig (hashable)
                 estimate_every_frame: bool = True) -> ClipMeasureResult:
    """Scan the motion step over (T, H, W), then batch-compute the
    per-frame BPM trace (see ``bpm_trace``)."""
    state0 = motion.init_state(spec, (0, 0, 0, 0), dtype=frames.dtype)
    state0 = state0._replace(roi=roi.astype(jnp.int32))

    def body(state, frame):
        state, sample = motion.measure_step(state, frame, spec)
        return state, (sample, state.t[-1], state.error)

    final, (samples, t, err) = jax.lax.scan(body, state0, frames)

    if estimate_every_frame:
        bpm, has = bpm_trace(samples, spec.fps, coeffs, min_dist, cfg)
    else:
        bpm = jnp.zeros_like(samples)
        has = jnp.zeros(samples.shape, bool)
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
    assert frames.shape[0] > cal_len + 2, "clip shorter than calibration"
    # Frame 0 is consumed by the monitor's 'initialize' state before
    # buffering begins (base.py:423-425), so calibration covers frames
    # 1..cal_len.
    cal = jnp.asarray(frames[1:cal_len + 1], dtype)

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
    rest = jnp.asarray(frames[cal_len + 2:], dtype)
    res = measure_clip(rest, jnp.asarray([x, y, w, h]), spec, coeffs,
                       min_dist, cfg.measure,
                       estimate_every_frame=estimate_every_frame)

    has = np.asarray(res.has_bpm)
    final_bpm = float(np.asarray(res.bpm)[has][-1]) if has.any() else None
    return ClipRunResult(found=True, roi=(x, y, w, h), measure=res,
                         final_bpm=final_bpm)
