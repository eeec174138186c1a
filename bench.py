"""Benchmark: EVM calibration + flow measurement throughput on one chip.

Mirrors BASELINE.json's headline metric ("fps/chip for EVM calibration +
flow measurement (640x480)"): a synthetic 640x480 clip is calibrated (128
frames through the fused EVM locate program) and then measured frame-by-
frame via the whole-clip lax.scan fast path in flow mode with per-frame BPM
estimation (the reference runs its full measure() every frame).  The value
is end-to-end frames/second; vs_baseline divides by the reference's best
observed effective fps (7.68 on the author's desktop — BASELINE.md, the
reference caps itself at fps_limit=10 and was "too computationally
expensive" for real-time full-frame EVM).

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_BEST_FPS = 7.68  # BASELINE.md: best observed session fps


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from respmon_tpu.config import MonitorConfig
    from respmon_tpu.io.synthetic import breathing_clip
    from respmon_tpu.pipeline import evm, motion, scan
    from respmon_tpu.ops import filters

    log(f"devices: {jax.devices()}")
    # Warm up the device->host transfer path: on tunneled deployments the
    # FIRST readback pays a one-time setup cost (~minutes); do it before
    # any timed region.
    t0 = time.time()
    _ = float(jnp.asarray(1.0) + 1.0)
    log(f"transfer warmup: {time.time()-t0:.1f}s")

    fps_video = 10.0
    cfg = MonitorConfig(motion_extraction_method="flow")

    cal_len = cfg.calibration.buffer_length  # 128
    measure_len = 128
    total = cal_len + 1 + measure_len

    log("generating synthetic 640x480 clip...")
    clip = breathing_clip(num_frames=total, height=480, width=640,
                          fps=fps_video, bpm=18.0, patch_center=(240, 320),
                          patch_size=(80, 100), amplitude=0.12,
                          motion_px=2.0)
    cal = jnp.asarray(clip[:cal_len], jnp.float32)
    rest = jnp.asarray(clip[cal_len + 1:], jnp.float32)

    # --- compile (excluded from timing)
    log("compiling locate...")
    t0 = time.time()
    loc = evm.locate(cal, fps_video, cfg.calibration)
    jax.block_until_ready(loc.found)
    log(f"locate compile+first run: {time.time()-t0:.1f}s")
    assert bool(loc.found)
    x, y, w, h = int(loc.x), int(loc.y), int(loc.w), int(loc.h)
    log(f"roi: {(x, y, w, h)}")

    spec = motion.MeasureSpec.for_roi(cfg, 480, 640, w, h, fps_video)
    coeffs = filters.design_butter_lowpass(0.5, fps_video,
                                           cfg.measure.filter_order)
    roi = jnp.asarray([x, y, w, h])
    log("compiling measure scan...")
    t0 = time.time()
    res = scan.measure_clip(rest, roi, spec, coeffs, 10, cfg.measure)
    jax.block_until_ready(res.samples)
    log(f"measure compile+first run: {time.time()-t0:.1f}s")
    has = np.asarray(res.has_bpm)
    if has.any():
        log(f"final BPM: {float(np.asarray(res.bpm)[has][-1]):.2f} "
            f"(true 18.0)")

    # --- timed runs
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        loc = evm.locate(cal, fps_video, cfg.calibration)
        jax.block_until_ready(loc.found)
    t_cal = (time.time() - t0) / iters

    t0 = time.time()
    for _ in range(iters):
        res = scan.measure_clip(rest, roi, spec, coeffs, 10, cfg.measure)
        jax.block_until_ready(res.samples)
    t_meas = (time.time() - t0) / iters

    frames = cal_len + measure_len
    wall = t_cal + t_meas
    fps_chip = frames / wall
    realtime_x = (total / fps_video) / wall

    log(f"calibration: {t_cal*1e3:.1f} ms for {cal_len} frames")
    log(f"measurement: {t_meas*1e3:.1f} ms for {measure_len} frames "
        f"(flow + per-frame BPM)")
    log(f"end-to-end: {fps_chip:.0f} fps/chip, {realtime_x:.0f}x real-time")

    print(json.dumps({
        "metric": "evm_calibration_plus_flow_measurement_640x480",
        "value": round(fps_chip, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps_chip / REFERENCE_BEST_FPS, 1),
    }))


if __name__ == "__main__":
    main()
