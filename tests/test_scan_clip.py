"""Whole-clip fast-path tests: the batched BPM trace must equal the
sequential per-frame estimation, and process_clip must match the streaming
monitor (BASELINE.md configs 1-4 equivalence)."""

import numpy as np
import pytest

import jax.numpy as jnp

from respmon_tpu.config import CalibrationConfig, MeasureConfig, MonitorConfig
from respmon_tpu.io.capture import ArrayCapture
from respmon_tpu.io.synthetic import breathing_clip, motion_trace
from respmon_tpu.ops import filters
from respmon_tpu.pipeline import bpm as bpm_mod
from respmon_tpu.pipeline import scan
from respmon_tpu.runtime import RespiratoryMonitor

FPS = 10.0
CAL = CalibrationConfig(buffer_length=64, pyramid_levels=6,
                        skip_levels_at_top=2)


def test_bpm_trace_equals_sequential_estimates():
    cfg = MeasureConfig()
    coeffs = filters.design_butter_lowpass(0.5, FPS, cfg.filter_order)
    _, y = motion_trace(num_samples=150, fps=FPS, bpm=18.0, noise=0.02)
    y = jnp.asarray(y, jnp.float32)

    got_bpm, got_has = scan.bpm_trace(y, FPS, coeffs, 10, cfg)

    n = cfg.buffer_length
    for k in [13, 20, 64, 127, 149]:
        count = min(k + 1, n)
        w = np.zeros(n, np.float32)
        t = np.zeros(n, np.float32)
        w[n - count:] = np.asarray(y)[k + 1 - count:k + 1]
        t[n - count:] = np.arange(k + 1 - count, k + 1) / FPS
        r = bpm_mod.estimate_bpm_jit(jnp.asarray(w), jnp.asarray(t),
                                     jnp.asarray(count), coeffs, 10, cfg)
        want_has = bool(r.has_bpm) and count > cfg.initialization_length
        assert bool(got_has[k]) == want_has, f"frame {k}"
        if want_has:
            np.testing.assert_allclose(float(got_bpm[k]), float(r.bpm),
                                       rtol=1e-5, err_msg=f"frame {k}")


def test_process_clip_matches_monitor_bpm():
    clip = breathing_clip(num_frames=64 + 1 + 80, height=120, width=160,
                          fps=FPS, bpm=18.0, patch_center=(60, 80),
                          patch_size=(30, 40), amplitude=0.12)
    cfg = MonitorConfig(calibration=CAL)
    res = scan.process_clip(clip, FPS, cfg)
    assert res.found
    assert res.final_bpm is not None

    mon = RespiratoryMonitor(
        capture_target="clipcmp", save_all_data=False, visualize=None,
        motion_extraction_method="average", config=cfg,
        capture=ArrayCapture(clip, fps=FPS), auto_run=False, sync_fps=False)
    mon.run()
    assert (mon.x, mon.y, mon.w, mon.h) == res.roi
    np.testing.assert_allclose(res.final_bpm, mon.freq[-1], atol=1e-4)
    # Same number of produced estimates.
    assert int(np.asarray(res.measure.has_bpm).sum()) == len(mon.freq)


def test_process_clip_flow_mode():
    clip = breathing_clip(num_frames=64 + 1 + 90, height=120, width=160,
                          fps=FPS, bpm=18.0, patch_center=(60, 80),
                          patch_size=(30, 40), amplitude=0.12, motion_px=2.0)
    cfg = MonitorConfig(motion_extraction_method="flow", calibration=CAL)
    res = scan.process_clip(clip, FPS, cfg)
    assert res.found and res.final_bpm is not None
    assert abs(res.final_bpm - 18.0) <= 1.0


def test_process_clip_not_found():
    vid = np.full((40, 48, 64), 0.5, np.float32)
    cfg = MonitorConfig(calibration=CalibrationConfig(
        buffer_length=32, pyramid_levels=4, skip_levels_at_top=1))
    res = scan.process_clip(vid, FPS, cfg)
    assert not res.found and res.final_bpm is None


def test_process_clip_auto_recovers_and_matches_monitor():
    # Mid-clip dropout (scene goes black, then a new subject appears): the
    # auto-resume fast path must recalibrate from the loss point exactly
    # like the streaming monitor's error→recalibrate cycle
    # (base.py:496-533) and produce the same post-recovery BPMs.
    good1 = breathing_clip(num_frames=64 + 2 + 40, height=120, width=160,
                           fps=FPS, bpm=18.0, patch_center=(60, 80),
                           patch_size=(30, 40), amplitude=0.12,
                           motion_px=2.0)
    black = np.zeros((20, 120, 160), np.float32)
    good2 = breathing_clip(num_frames=64 + 2 + 60, height=120, width=160,
                           fps=FPS, bpm=24.0, patch_center=(60, 80),
                           patch_size=(30, 40), amplitude=0.12,
                           motion_px=2.0, seed=5)
    frames = np.concatenate([good1, black, good2])
    cfg = MonitorConfig(motion_extraction_method="flow", calibration=CAL)

    res = scan.process_clip_auto(frames, FPS, cfg, error_reset_delay=0.0)
    assert res.recoveries >= 1
    assert len(res.episodes) >= 2
    assert res.episodes[0].result.error_frame is not None
    last = res.episodes[-1].result
    assert last.found and last.error_frame is None
    assert res.final_bpm is not None

    mon = RespiratoryMonitor(
        capture_target="autocmp", save_all_data=False, visualize=None,
        motion_extraction_method="flow", config=cfg,
        error_reset_delay=0.0,
        capture=ArrayCapture(frames, fps=FPS), auto_run=False,
        sync_fps=False)
    mon.run()
    assert mon.error_message is not None, "monitor never hit the error"
    assert len(mon.freq) > 0, "monitor produced no post-recovery BPMs"
    # reset() clears freq, so mon.freq holds only post-recovery estimates;
    # they must match the auto path's final episode.
    np.testing.assert_allclose(res.final_bpm, mon.freq[-1], atol=1e-4)
    assert int(np.asarray(last.measure.has_bpm).sum()) == len(mon.freq)


def test_process_clip_reports_error_frame():
    # Tracking loss mid-clip: the clip path surfaces where the streaming
    # monitor would have entered its error state.
    good = breathing_clip(num_frames=64 + 2 + 40, height=120, width=160,
                          fps=FPS, bpm=18.0, patch_center=(60, 80),
                          patch_size=(30, 40), amplitude=0.12, motion_px=2.0)
    black = np.zeros((20, 120, 160), np.float32)
    frames = np.concatenate([good, black])
    cfg = MonitorConfig(motion_extraction_method="flow", calibration=CAL)
    res = scan.process_clip(frames, FPS, cfg)
    assert res.found
    assert res.error_frame is not None
    # The loss happens once the black frames reach measurement (40 good
    # measured frames precede them).
    assert 35 <= res.error_frame <= 45
    # Samples after the loss are NaN (single-episode semantics).
    samples = np.asarray(res.measure.samples)
    assert np.isnan(samples[res.error_frame:]).all()
