"""Monitor checkpoint / resume.

The reference's closest analogs are session recording and the
``skip_calibration`` ROI pin (SURVEY.md §5 "Checkpoint / resume").  Here the
full monitor state — ROI, fps, signal ring buffers, frequency history, and
the device-side measure state pytree (flow points, motion ring, crop state)
— serializes to a single ``.npz``, enabling true suspend/resume: a resumed
monitor continues measuring without recalibration and with its signal
history intact.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from respmon_tpu.pipeline import motion


_STATE_FIELDS = motion.MeasureState._fields


def save_checkpoint(path: str, monitor) -> None:
    """Serialize a RespiratoryMonitor mid-measurement."""
    blobs = {
        "fps": np.asarray(monitor.fps),
        "roi": np.asarray([monitor.x or 0, monitor.y or 0,
                           monitor.w or 0, monitor.h or 0]),
        "state_name": np.asarray(monitor.state),
        "data": np.asarray(monitor.data, dtype=np.float64),
        "t": np.asarray(monitor.t, dtype=np.float64),
        "freq": np.asarray(monitor.freq, dtype=np.float64),
        "peak_min_dist": np.asarray(monitor.peak_minimum_sample_distance),
    }
    if monitor._measure_state is not None:
        for name in _STATE_FIELDS:
            blobs[f"ms_{name}"] = np.asarray(
                getattr(monitor._measure_state, name))
    np.savez(path, **blobs)


def load_checkpoint(path: str, monitor) -> None:
    """Restore a monitor saved with ``save_checkpoint``.

    The monitor must wrap a compatible capture (same frame size); it resumes
    in the saved state with buffers and device state intact.
    """
    import jax.numpy as jnp

    z = np.load(path, allow_pickle=False)
    monitor.fps = float(z["fps"])
    x, y, w, h = (int(v) for v in z["roi"])
    state_name = str(z["state_name"])

    monitor.data.clear()
    monitor.data.extend(z["data"].tolist())
    monitor.t.clear()
    monitor.t.extend(z["t"].tolist())
    monitor.freq.clear()
    monitor.freq.extend(z["freq"].tolist())
    monitor.peak_minimum_sample_distance = int(z["peak_min_dist"])

    if state_name == "measure" and w > 0 and h > 0:
        monitor.x, monitor.y, monitor.w, monitor.h = x, y, w, h
        monitor._setup_measurement()
        if "ms_data" in z:
            fields = {name: jnp.asarray(z[f"ms_{name}"])
                      for name in _STATE_FIELDS}
            monitor._measure_state = motion.MeasureState(**fields)
        monitor.state = "measure"
    else:
        monitor.state = state_name if state_name in (
            "initialize", "calibration") else "initialize"


def checkpoint_roundtrip_equal(a: Optional[motion.MeasureState],
                               b: Optional[motion.MeasureState]) -> bool:
    """Utility for tests: deep equality of two measure states."""
    if a is None or b is None:
        return a is b
    for name in _STATE_FIELDS:
        if not np.array_equal(np.asarray(getattr(a, name)),
                              np.asarray(getattr(b, name)), equal_nan=True):
            return False
    return True


def save_fleet_checkpoint(path: str, fleet) -> None:
    """Serialize a ``MultiStreamMonitor`` mid-monitoring: the batched
    device state pytree plus the static measurement geometry needed to
    rebuild the compiled step on restore (fleet analog of
    ``save_checkpoint``; per-stream signal history rides inside the
    batched rings)."""
    assert fleet.states is not None, "calibrate() before checkpointing"
    blobs = {
        "fps": np.asarray(fleet.fps),
        "frame_hw": np.asarray(fleet.frame_hw),
        "crop_hw": np.asarray([fleet.spec.crop_h, fleet.spec.crop_w]),
        "method": np.asarray(fleet.spec.method),
        "lk_sample": np.asarray(fleet.spec.lk_sample),
        "needs_init": np.asarray(fleet._needs_init),
    }
    for name in _STATE_FIELDS:
        blobs[f"ms_{name}"] = np.asarray(getattr(fleet.states, name))
    np.savez(path, **blobs)


def load_fleet_checkpoint(path: str, fleet) -> None:
    """Restore a ``MultiStreamMonitor`` saved with
    ``save_fleet_checkpoint``.  The monitor must be constructed with the
    same config/mesh/frame size; it resumes stepping with every stream's
    tracking points, motion rings, and signal history intact."""
    import dataclasses

    import jax.numpy as jnp

    from respmon_tpu.parallel.streams import shard_streams

    z = np.load(path, allow_pickle=False)
    assert tuple(int(v) for v in z["frame_hw"]) == tuple(fleet.frame_hw), \
        "checkpoint frame size does not match this monitor"
    # One shared derivation for fps and its dependent parameters (lowpass
    # design, peak min-distance) — see MultiStreamMonitor._set_fps.
    fleet._set_fps(float(z["fps"]))
    crop_h, crop_w = (int(v) for v in z["crop_hw"])
    base = motion.MeasureSpec.for_roi(
        fleet.cfg, fleet.frame_hw[0], fleet.frame_hw[1], 1, 1, fleet.fps)
    fleet.spec = dataclasses.replace(
        base, crop_h=crop_h, crop_w=crop_w, method=str(z["method"]),
        lk_sample=str(z["lk_sample"]))
    fields = {name: jnp.asarray(z[f"ms_{name}"]) for name in _STATE_FIELDS}
    fleet.states = motion.MeasureState(**fields)
    fleet._needs_init = bool(z["needs_init"])
    if fleet.mesh is not None:
        fleet.states = shard_streams(fleet.states, fleet.mesh)
