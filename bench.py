"""Benchmark: EVM calibration + flow measurement throughput on one chip.

Default mode mirrors BASELINE.json's headline metric ("fps/chip for EVM
calibration + flow measurement (640x480)"): a synthetic 640x480 clip is
calibrated (128 frames through the fused EVM locate program) and then
measured frame-by-frame via the whole-clip lax.scan fast path in flow mode
with per-frame BPM estimation (the reference runs its full measure() every
frame).  The value is end-to-end frames/second; vs_baseline divides by the
reference's best observed effective fps (7.68 on the author's desktop —
BASELINE.md; the reference caps itself at fps_limit=10 and was "too
computationally expensive" for real-time full-frame EVM).

Two timings are reported: device-resident (buffers staged in HBM before the
timed loops — kernel throughput) and with-upload (every iteration re-uploads
the calibration and measurement buffers from host numpy — the end-to-end
cost a cold client pays).  The JSON line carries both; ``value`` is the
device-resident number (headline continuity with round 1),
``value_with_upload`` includes H2D.

``--multistream`` instead benchmarks BASELINE.md config 5 — 64 concurrent
1080p streams in lockstep on one chip (states built from per-stream ROIs,
frames device-resident) plus the single-stream 1080p recalibration unit
(which exercises the tiled Pallas pyramid path).  It prints its own single
JSON line.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

REFERENCE_BEST_FPS = 7.68  # BASELINE.md: best observed session fps


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _timed(fn, iters):
    """Average seconds/call over ``iters`` calls of ``fn(i)``.

    Two tunnel-deployment rules (BENCHMARKS.md methodology): ``fn`` must do
    DISTINCT work per ``i`` (the dispatch layer memoizes identical calls)
    and must RETURN a (small) device array depending on that work — the
    loop ends with a host fetch of the last result because
    ``block_until_ready`` acknowledges dispatch, not completion, through
    the tunnel."""
    t0 = time.time()
    last = None
    for i in range(iters):
        last = fn(i)
    np.asarray(last)  # flush: forces the dependent chain to finish
    return (time.time() - t0) / iters


def main_headline():
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
    cal_np = np.ascontiguousarray(clip[:cal_len], np.float32)
    rest_np = np.ascontiguousarray(clip[cal_len + 1:], np.float32)
    cal = jnp.asarray(cal_np)
    rest = jnp.asarray(rest_np)

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
        tail = np.asarray(res.bpm)[has][-10:]
        log(f"BPM tail median: {float(np.median(tail)):.2f} "
            f"(last {float(tail[-1]):.2f}; true 18.0 — the synthetic clip "
            f"admits a spurious early peak the reference chain also keeps, "
            f"see tests/golden parity)")

    # --- timed: device-resident (kernel throughput).  Each iteration works
    # on a perturbed copy staged in HBM (distinct dispatches; see _timed).
    iters = 5
    cal_v = [cal + jnp.float32(i * 1e-6) for i in range(iters)]
    rest_v = [rest + jnp.float32(i * 1e-6) for i in range(iters)]
    np.asarray(cal_v[-1][0, 0, 0]), np.asarray(rest_v[-1][0, 0, 0])

    t_cal = _timed(lambda i: evm.locate(
        cal_v[i], fps_video, cfg.calibration).heatmap_u8, iters)
    t_meas = _timed(lambda i: scan.measure_clip(
        rest_v[i], roi, spec, coeffs, 10, cfg.measure).samples, iters)

    # --- timed: with host->device upload each iteration (cold-client
    # end-to-end; surfaces the H2D cost the feeder hides in production).
    # Warmup/probe use the two EXTRA trailing variants so the timed
    # iterations [0, iters) never repeat an already-memoized dispatch.
    cal_np_v = [cal_np + np.float32(i * 1e-6) for i in range(iters + 2)]
    rest_np_v = [rest_np + np.float32(i * 1e-6) for i in range(iters + 2)]

    def run_cal_up(i):
        dev = jax.device_put(cal_np_v[i])
        return evm.locate(dev, fps_video, cfg.calibration).heatmap_u8

    def run_meas_up(i):
        dev = jax.device_put(rest_np_v[i])
        return scan.measure_clip(dev, roi, spec, coeffs, 10,
                                 cfg.measure).samples

    np.asarray(run_cal_up(iters))   # reshard/transfer compile, excluded
    np.asarray(run_meas_up(iters))  # rest-shaped transfer compile likewise
    up_probe0 = time.time()
    np.asarray(run_cal_up(iters + 1))
    up_probe = time.time() - up_probe0
    up_iters = iters if up_probe < 1.0 else 2
    t_cal_up = _timed(run_cal_up, up_iters)
    t_meas_up = _timed(run_meas_up, up_iters)

    frames = cal_len + measure_len
    wall = t_cal + t_meas
    wall_up = t_cal_up + t_meas_up
    fps_chip = frames / wall
    fps_chip_up = frames / wall_up
    realtime_x = (total / fps_video) / wall

    log(f"calibration: {t_cal*1e3:.1f} ms for {cal_len} frames "
        f"({t_cal_up*1e3:.1f} ms incl. upload)")
    log(f"measurement: {t_meas*1e3:.1f} ms for {measure_len} frames "
        f"({t_meas_up*1e3:.1f} ms incl. upload)")
    log(f"end-to-end: {fps_chip:.0f} fps/chip device-resident "
        f"({realtime_x:.0f}x real-time); {fps_chip_up:.0f} fps/chip "
        f"incl. H2D upload")

    print(json.dumps({
        "metric": "evm_calibration_plus_flow_measurement_640x480",
        "value": round(fps_chip, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps_chip / REFERENCE_BEST_FPS, 1),
        "value_with_upload": round(fps_chip_up, 1),
    }))


def main_multistream(streams: int = 64):
    """BASELINE.md config 5: 64-stream 1080p lockstep monitoring."""
    import jax
    import jax.numpy as jnp

    from respmon_tpu.config import MonitorConfig
    from respmon_tpu.io.synthetic import breathing_clip
    from respmon_tpu.parallel import streams as fleet
    from respmon_tpu.pipeline import evm, motion

    log(f"devices: {jax.devices()}")
    t0 = time.time()
    _ = float(jnp.asarray(1.0) + 1.0)
    log(f"transfer warmup: {time.time()-t0:.1f}s")

    fps_video = 10.0
    H, W = 1080, 1920
    cfg = MonitorConfig(motion_extraction_method="flow")

    # --- single-stream 1080p recalibration unit (tiled Pallas pyramid path)
    log("generating 1080p calibration buffer...")
    cal = breathing_clip(num_frames=cfg.calibration.buffer_length, height=H,
                         width=W, fps=fps_video, bpm=18.0,
                         patch_center=(540, 960), patch_size=(180, 220),
                         amplitude=0.12, motion_px=3.0)
    cal_dev = jnp.asarray(cal, jnp.float32)
    del cal
    log("compiling 1080p locate...")
    t0 = time.time()
    loc = evm.locate(cal_dev, fps_video, cfg.calibration)
    jax.block_until_ready(loc.found)
    log(f"1080p locate compile+first run: {time.time()-t0:.1f}s")
    assert bool(loc.found)
    x, y, w, h = int(loc.x), int(loc.y), int(loc.w), int(loc.h)
    log(f"1080p roi: {(x, y, w, h)}")
    # Perturb in-call so each timed dispatch is distinct (see _timed); one
    # fused jitted dispatch per iteration (the add + locate chain as two
    # dispatches measures tunnel queueing, not the kernel).
    @jax.jit
    def _locate_heat(v, e):
        return evm.locate(v + e, fps_video, cfg.calibration).heatmap_u8

    np.asarray(_locate_heat(cal_dev, jnp.float32(0.0)))
    t_cal = _timed(lambda i: _locate_heat(
        cal_dev, jnp.float32(1e-6 * (i + 1))), 3)
    log(f"1080p recalibration unit: {t_cal*1e3:.1f} ms "
        f"({cfg.calibration.buffer_length / fps_video / t_cal:.0f}x "
        f"real-time)")
    del cal_dev

    # --- 64-stream lockstep step (per-stream states, shared compiled step)
    log(f"building {streams}-stream fleet state...")
    mon = fleet.MultiStreamMonitor(cfg, mesh=None, frame_hw=(H, W),
                                   fps=fps_video)
    boxes = np.tile(np.asarray([[x, y, w, h]], np.int32), (streams, 1))
    spec = motion.MeasureSpec.for_roi(cfg, H, W, w, h, fps_video)
    import dataclasses as _dc
    mon.spec = _dc.replace(spec, lk_sample=fleet.fleet_lk_sample(
        cfg, spec.crop_h, spec.crop_w, streams))
    log(f"crop bucket {mon.spec.crop_h}x{mon.spec.crop_w}, "
        f"lk_sample={mon.spec.lk_sample}")
    mon.states = fleet.init_stream_states(mon.spec, boxes)

    # Three device-resident frame batches with real ±1 px inter-frame
    # shifts: the timed steps then do genuine LK tracking work (constant
    # frames would converge in one Newton iteration and flatter the step).
    rng = np.random.default_rng(0)
    frames_np = rng.random((streams, H, W), np.float32) * 0.2 + 0.4
    frames_v = [jnp.asarray(np.roll(frames_np, s, axis=2))
                for s in (0, 1, 2)]
    np.asarray(frames_v[-1][0, 0, :4])

    log("compiling fleet step (init + steady-state programs)...")
    t0 = time.time()
    r = mon.step(frames_v[0])   # corner-detection step (init program)
    np.asarray(r.samples)
    r = mon.step(frames_v[1])   # steady-state program
    np.asarray(r.samples)
    log(f"fleet step compile+first runs: {time.time()-t0:.1f}s")

    def run_step(i):
        return mon.step(frames_v[i % 3]).samples

    # Warm so tracking state reaches steady shape.
    for i in range(3):
        np.asarray(run_step(i))
    t_step = _timed(run_step, 10)
    sfps = streams / t_step
    margin = (1.0 / fps_video) / t_step
    log(f"{streams}-stream 1080p lockstep step: {t_step*1e3:.1f} ms "
        f"-> {sfps:.0f} stream-frames/sec/chip, {margin:.1f}x real-time "
        f"margin at {fps_video:.0f} fps")

    # K-frame lockstep batches (step_many): fixed dispatch/gather latency
    # amortizes over K; costs K frames of result latency.  K=4 with two
    # resident batch variants keeps the staged frames at ~4 GB HBM.
    K = 4
    batch_v = [jnp.stack([frames_v[(i + k) % 3] for k in range(K)])
               for i in range(2)]
    np.asarray(batch_v[-1][0, 0, 0, :4])
    log(f"compiling {K}-frame step_many...")
    t0 = time.time()
    np.asarray(mon.step_many(batch_v[0]).samples)
    log(f"step_many compile+first run: {time.time()-t0:.1f}s")
    t_batch = _timed(lambda i: mon.step_many(batch_v[i % 2]).samples, 6)
    sfps_b = streams * K / t_batch
    margin_b = (K / fps_video) / t_batch
    log(f"{streams}-stream {K}-frame batch: {t_batch*1e3:.1f} ms "
        f"({t_batch/K*1e3:.1f} ms/frame) -> {sfps_b:.0f} "
        f"stream-frames/sec/chip, {margin_b:.1f}x real-time margin")

    print(json.dumps({
        "metric": f"multistream_{streams}x1080p_flow_monitoring",
        "value": round(sfps_b, 1),
        "unit": "stream-frames/sec/chip",
        "vs_baseline": round(sfps_b / REFERENCE_BEST_FPS, 1),
        "step_ms": round(t_step * 1e3, 2),
        "realtime_margin_at_10fps": round(margin, 2),
        f"batch{K}_ms_per_frame": round(t_batch / K * 1e3, 2),
        f"batch{K}_realtime_margin": round(margin_b, 2),
        "recalibration_1080p_ms": round(t_cal * 1e3, 1),
    }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--multistream", action="store_true",
                   help="benchmark 64-stream 1080p lockstep monitoring "
                        "(BASELINE.md config 5) instead of the headline")
    p.add_argument("--streams", type=int, default=64)
    args = p.parse_args()
    if args.multistream:
        main_multistream(args.streams)
    else:
        main_headline()


if __name__ == "__main__":
    main()
