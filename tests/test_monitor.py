"""Integration tests: the full RespiratoryMonitor state machine on synthetic
known-BPM clips (reference base.py:409-513 behavior; BASELINE.md config 1/2/4).
"""

import math

import numpy as np
import pytest

from respmon_tpu.config import CalibrationConfig, MonitorConfig
from respmon_tpu.io.capture import ArrayCapture
from respmon_tpu.io.synthetic import breathing_clip
from respmon_tpu.runtime import RespiratoryMonitor

FPS = 10.0
BPM_TRUE = 18.0
H, W = 120, 160

SMALL_CAL = CalibrationConfig(buffer_length=64, pyramid_levels=6,
                              skip_levels_at_top=2)


def _clip(num_frames, motion_px=0.0, seed=0):
    return breathing_clip(num_frames=num_frames, height=H, width=W, fps=FPS,
                          bpm=BPM_TRUE, patch_center=(60, 80),
                          patch_size=(30, 40), amplitude=0.12,
                          motion_px=motion_px, seed=seed)


def _monitor(frames, method="average", **kw):
    cfg = MonitorConfig(calibration=SMALL_CAL)
    return RespiratoryMonitor(
        capture_target="synthetic", save_all_data=False, visualize=None,
        motion_extraction_method=method, config=cfg,
        capture=ArrayCapture(frames, fps=FPS), auto_run=False,
        sync_fps=False, **kw)


@pytest.fixture(scope="module")
def average_run():
    mon = _monitor(_clip(64 + 1 + 80), method="average")
    mon.run()
    return mon


def test_average_mode_reaches_measure_state(average_run):
    assert average_run.state == "measure"
    assert average_run.x is not None
    # ROI covers the breathing patch center (60, 80).
    assert average_run.x <= 80 <= average_run.x + average_run.w
    assert average_run.y <= 60 <= average_run.y + average_run.h


def test_average_mode_bpm_within_half(average_run):
    assert len(average_run.freq) > 0, "no BPM estimates produced"
    assert abs(average_run.freq[-1] - BPM_TRUE) <= 0.5


def test_observable_buffers_mirror_reference_api(average_run):
    mon = average_run
    assert len(mon.data) == len(mon.t)
    assert len(mon.filtered_data) == len(mon.data)
    assert mon.peak_minimum_sample_distance == int(np.floor(FPS / 1.0))
    for tag in ("Measurement Loop", "Frame Capture",
                "Calibration Measurement"):
        assert mon.benchmarker.has_tag(tag)
    assert mon.t[0] == 0.0
    np.testing.assert_allclose(np.diff(np.asarray(mon.t)), 1.0 / FPS)


def test_flow_mode_tracks_and_estimates():
    mon = _monitor(_clip(64 + 1 + 90, motion_px=2.0), method="flow")
    mon.run()
    assert mon.state == "measure"
    assert len(mon.freq) > 0
    # Flow + PCA BPM should land near truth (±1 BPM on synthetic motion).
    assert abs(mon.freq[-1] - BPM_TRUE) <= 1.0


def test_flow_keypoint_overlay_drawn():
    # C9 UI parity: flow mode draws the tracked points as white circles on
    # the displayed crop (reference base.py:272-277) and the headless UI
    # records the point set, which must equal the device state's valid
    # points.
    cv2 = pytest.importorskip("cv2")
    mon = _monitor(_clip(64 + 1 + 30, motion_px=2.0), method="flow")
    mon.run()
    assert mon.state == "measure"
    state = mon._measure_state
    dev_pts = np.asarray(state.pts)[np.asarray(state.pts_valid)]
    assert len(dev_pts) > 0
    ui_pts = np.asarray(mon.ui.keypoints).reshape(-1, 2)
    np.testing.assert_allclose(ui_pts, dev_pts)

    df = mon.display_frame
    for a, b in ui_pts:
        x, y = int(round(float(a))), int(round(float(b)))
        if 0 <= y < df.shape[0] and 0 <= x < df.shape[1]:
            assert df[y, x] == 255, f"no overlay at point ({x}, {y})"
    # Bit-parity with the literal reference drawing loop.
    base = np.clip(np.trunc(mon.cropped_image * 255.0), 0, 255) \
        .astype(np.uint8)
    mask = np.zeros_like(base)
    disp = base.copy()
    for new in mon.ui.keypoints:
        a, b = new.ravel()
        mask = cv2.circle(mask, (int(round(float(a))),
                                 int(round(float(b)))), 2,
                          (255, 255, 255), -1)
        disp = cv2.add(disp, mask)
    np.testing.assert_array_equal(df, disp)


def test_skip_calibration_pins_roi():
    frames = _clip(40)
    mon = _monitor(frames, method="average")
    mon.fps = FPS
    mon.skip_calibration(60, 45, 40, 30)
    assert mon.state == "measure"
    mon.run()
    assert (mon.x, mon.y, mon.w, mon.h) == (60, 45, 40, 30)
    assert len(mon.data) == 40


def test_flow_error_recovery_cycle():
    # Trackable frames, then black frames: the gradient matrix goes
    # singular, every point drops status, the sample goes NaN, the monitor
    # enters the error state, and (with zero reset delay) resets back to
    # calibration with cleared buffers (base.py:496-533).
    good = _clip(64 + 1 + 30, motion_px=2.0)
    black = np.zeros((40, H, W), dtype=np.float32)
    frames = np.concatenate([good, black])
    mon = _monitor(frames, method="flow", error_reset_delay=0.0)
    mon.run()
    assert mon.error_message is not None, "error never triggered"
    # After the reset, buffers were cleared and recalibration began.
    assert mon.state in ("calibration", "error", "measure")
    assert mon.calibration_buffer_idx <= mon.calibration_buffer_target_length


def test_constructor_asserts_match_reference():
    with pytest.raises(AssertionError):
        _monitor(_clip(4), method="nonsense")
    with pytest.raises(AssertionError):
        RespiratoryMonitor(fps_limit=-1, visualize=None,
                           capture=ArrayCapture(_clip(4), fps=FPS),
                           auto_run=False)
