"""Feeder <-> monitor integration: the double-buffered host->HBM feed
(SURVEY.md §7.6) replaces the reference's blocking per-frame read
(reference base.py:416-421).  Asserts (a) the capture thread keeps
decoding while the consumer stalls (capture/compute overlap), (b) the
monitor still reaches correct BPMs through the ring, and (c) dropped
frames are surfaced on the monitor."""

import time

import numpy as np

from respmon_tpu.config import CalibrationConfig, MonitorConfig
from respmon_tpu.io.capture import ArrayCapture
from respmon_tpu.io.synthetic import breathing_clip
from respmon_tpu.runtime import RespiratoryMonitor

FPS = 10.0
BPM_TRUE = 18.0
H, W = 120, 160

SMALL_CAL = CalibrationConfig(buffer_length=64, pyramid_levels=6,
                              skip_levels_at_top=2)


def _clip(num_frames):
    return breathing_clip(num_frames=num_frames, height=H, width=W, fps=FPS,
                          bpm=BPM_TRUE, patch_center=(60, 80),
                          patch_size=(30, 40), amplitude=0.12)


def _monitor(frames, **kw):
    cfg = MonitorConfig(calibration=SMALL_CAL)
    return RespiratoryMonitor(
        capture_target="synthetic", save_all_data=False, visualize=None,
        config=cfg, capture=ArrayCapture(frames, fps=FPS), auto_run=False,
        sync_fps=False, **kw)


def test_capture_overlaps_stalled_consumer_and_bpm_survives():
    # FIFO replay is lossless: the decode thread prefetches ahead of the
    # stalled consumer up to the ring capacity (capture/compute overlap),
    # then applies backpressure — it never overwrites an unread frame, so
    # end-to-end results match the direct-capture path's semantics.
    mon = _monitor(_clip(64 + 1 + 80), use_feeder=True, feeder_latest=False,
                   feeder_capacity=16)
    assert mon.step()  # first step starts the feeder thread

    time.sleep(0.45)  # stand-in for a slow device step: no step() calls
    after = mon._feeder.frames_captured
    assert after >= mon.feeder_capacity, \
        "capture thread did not prefetch while the consumer stalled"
    assert after <= mon.feeder_capacity + 2, \
        "lossless producer ran past the ring capacity"

    mon.run()  # drain the rest of the clip through the ring
    assert mon.state == "measure"
    assert mon.frames_dropped == 0
    assert len(mon.freq) > 0, "no BPM estimates produced through the feeder"
    assert abs(mon.freq[-1] - BPM_TRUE) <= 0.5


def test_dropped_frames_surface_on_monitor():
    # Tiny ring + freshest-frame pops + a stalled consumer: the paced
    # producer overwrites unread slots and the monitor reports it.
    mon = _monitor(_clip(40), use_feeder=True, feeder_latest=True,
                   feeder_capacity=2)
    assert mon.step()  # start feeder
    time.sleep(1.2)    # producer pushes ~12 frames into a 2-slot ring
    while mon.step():
        pass
    assert mon.frames_dropped > 0, "overwritten frames were not surfaced"
    mon.stop_feeder()


def test_feeder_defaults():
    # Injected array captures default to the direct synchronous path.
    mon = _monitor(_clip(4))
    assert mon.use_feeder is False
    mon.cap.release()
