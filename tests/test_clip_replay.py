"""Recorded-clip replay tests (reference test strategy, SURVEY.md §4 item 1:
the commented main.py clip matrix was its de-facto integration suite).

A real AVI is encoded and decoded through OpenCV so the full capture path
(codec round trip included) feeds the monitor, in both motion modes, and
the streaming monitor is cross-checked against the whole-clip fast path on
identical decoded frames."""

import numpy as np
import pytest

from respmon_tpu.config import CalibrationConfig, MonitorConfig
from respmon_tpu.io.capture import OpenCVCapture
from respmon_tpu.io.synthetic import breathing_clip
from respmon_tpu.pipeline import scan
from respmon_tpu.runtime import RespiratoryMonitor

cv2 = pytest.importorskip("cv2")

FPS = 10.0
BPM_TRUE = 18.0
CAL = CalibrationConfig(buffer_length=64, pyramid_levels=6,
                        skip_levels_at_top=2)


@pytest.fixture(scope="module")
def clip_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("clips") / "breathing.avi")
    clip = breathing_clip(num_frames=64 + 2 + 110, height=120, width=160,
                          fps=FPS, bpm=BPM_TRUE, patch_center=(60, 80),
                          patch_size=(30, 40), amplitude=0.12, motion_px=2.0)
    u8 = np.clip(clip * 255, 0, 255).astype(np.uint8)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), FPS,
                         (160, 120))
    assert vw.isOpened()
    for f in u8:
        vw.write(cv2.cvtColor(f, cv2.COLOR_GRAY2BGR))
    vw.release()
    return path


@pytest.mark.parametrize("method", ["average", "flow"])
def test_replay_through_codec_yields_bpm(clip_path, method):
    mon = RespiratoryMonitor(
        capture_target=clip_path, save_all_data=False, visualize=None,
        motion_extraction_method=method,
        config=MonitorConfig(calibration=CAL),
        capture=OpenCVCapture(clip_path), auto_run=False, sync_fps=False)
    mon.run()
    assert mon.state == "measure"
    assert len(mon.freq) > 0, f"{method}: no BPM produced"
    assert abs(mon.freq[-1] - BPM_TRUE) <= 1.0


def test_monitor_matches_fast_path_on_decoded_frames(clip_path):
    cap = OpenCVCapture(clip_path)
    frames = []
    while True:
        f = cap.next_frame()
        if f is None:
            break
        frames.append(f)
    cap.release()
    frames = np.stack(frames).astype(np.float32)

    cfg = MonitorConfig(calibration=CAL)
    res = scan.process_clip(frames, FPS, cfg)
    assert res.found

    mon = RespiratoryMonitor(
        capture_target="cmp", save_all_data=False, visualize=None,
        motion_extraction_method="average", config=cfg,
        capture=__import__("respmon_tpu.io.capture",
                           fromlist=["ArrayCapture"]).ArrayCapture(
            frames, fps=FPS),
        auto_run=False, sync_fps=False)
    mon.run()
    assert (mon.x, mon.y, mon.w, mon.h) == res.roi
    np.testing.assert_allclose(res.final_bpm, mon.freq[-1], atol=1e-4)
