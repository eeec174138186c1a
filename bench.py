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


def _enable_compile_cache():
    """Persistent XLA compilation cache: re-runs of any bench mode (and the
    recovery soak's per-ROI-bucket measure programs) skip the 10-80 s
    compiles when the same program was built by ANY previous process.
    Verified effective through the axon tunnel (79.4 s -> 16.0 s on a
    cold second process).  Best-effort: older jaxlibs without the knobs
    just run uncached."""
    import os

    import jax

    try:
        cache_dir = os.environ.get(
            "RESPMON_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover
        log(f"compilation cache unavailable: {e!r}")


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


def main_headline(include_fleet: bool = True):
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
    u8_widen_exact = _check_u8_widen()
    gf_parity = _check_gaussfit_parity()

    fps_video = 10.0
    cfg = MonitorConfig(motion_extraction_method="flow")

    cal_len = cfg.calibration.buffer_length  # 128
    measure_len = 128
    total = cal_len + 1 + measure_len

    log("generating synthetic 640x480 clip...")
    # texture_motion: the patch texture genuinely translates with breathing
    # (corners physically move), giving flow a strong non-decaying signal —
    # envelope-only translation produced a ~20x-diluted apparent-motion
    # signal whose startup transient admitted a spurious peak (round 2's
    # 23.76-vs-18.0 headline gap; VERDICT r2 #1).
    clip = breathing_clip(num_frames=total, height=480, width=640,
                          fps=fps_video, bpm=18.0, patch_center=(240, 320),
                          patch_size=(80, 100), amplitude=0.12,
                          motion_px=2.0, texture_motion=True)
    # Production frames are camera-native uint8: quantize the synthetic
    # clip once and derive BOTH ingests from the same bytes — u8 for the
    # upload path (4x less H2D), and the host-converted f32 equivalent
    # (io/capture.py chain) for the device-resident staging and oracle.
    clip_u8 = np.clip(np.round(clip * 255.0), 0, 255).astype(np.uint8)
    clip = (clip_u8.astype(np.float64) * (1.0 / 255.0)).astype(np.float32)
    cal_np = np.ascontiguousarray(clip[:cal_len], np.float32)
    rest_np = np.ascontiguousarray(clip[cal_len + 1:], np.float32)
    cal_u8 = np.ascontiguousarray(clip_u8[:cal_len])
    rest_u8 = np.ascontiguousarray(clip_u8[cal_len + 1:])
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
    bpm_tail_median = bpm_oracle_delta = None
    if has.any():
        tail = np.asarray(res.bpm)[has][-10:]
        bpm_tail_median = float(np.median(tail))
        # End-to-end credibility check (VERDICT r2 #1): run the device's
        # own sample trace through the golden reference chain
        # (scipy filtfilt + peakutils + curve_fit) window by window and
        # compare the BPM tails.
        try:
            import sys as _sys
            if "/root/repo" not in _sys.path:
                _sys.path.insert(0, "/root/repo")
            from tests.golden import reference_numpy as golden

            samples_np = np.asarray(res.samples)
            t_np = np.asarray(res.t)
            n_ring = cfg.measure.buffer_length
            total_t = len(samples_np)
            oracle_tail = []
            for i in range(total_t - 10, total_t):
                lo = max(0, i + 1 - n_ring)
                ob, _, _, _ = golden.measure_bpm(
                    samples_np[lo:i + 1], t_np[lo:i + 1], fps_video)
                oracle_tail.append(ob if ob is not None else np.nan)
            oracle_med = float(np.nanmedian(np.asarray(oracle_tail)))
            bpm_oracle_delta = abs(bpm_tail_median - oracle_med)
            log(f"BPM tail median: {bpm_tail_median:.2f} (true 18.0); "
                f"golden-oracle tail median on the same trace: "
                f"{oracle_med:.2f}; |device - oracle| = "
                f"{bpm_oracle_delta:.3f}")
        except Exception as e:  # oracle needs scipy; never sink the bench
            log(f"BPM tail median: {bpm_tail_median:.2f} (true 18.0); "
                f"oracle cross-check unavailable: {e!r}")

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
    # Frames ship CAMERA-NATIVE uint8 (4x less H2D than the f32
    # convention) and widen on device, bit-equal to the host conversion
    # chain (ops/dtype.uint8_to_float; tests/test_u8_ingest.py).
    # Warmup/probe use the two EXTRA trailing variants so the timed
    # iterations [0, iters) never repeat an already-memoized dispatch;
    # each variant flips one low bit INSIDE the located ROI so the fetched
    # result genuinely depends on the per-iteration variation (a flip the
    # crop discards would leave the fetch variation-independent and at the
    # mercy of the tunnel's memoization keying).
    def _u8_variants(base, n, at):
        ay, ax = at
        out = []
        for i in range(n):
            v = base.copy()
            v[0, ay, ax + i] ^= 1
            out.append(v)
        return out

    cy, cx = y + h // 2, x + w // 2
    cal_u8_v = _u8_variants(cal_u8, iters + 2, (cy, cx))
    rest_u8_v = _u8_variants(rest_u8, iters + 2, (cy, cx))

    upload_ingest = "uint8"

    def run_cal_up(i):
        dev = jax.device_put(cal_u8_v[i])
        return evm.locate(dev, fps_video, cfg.calibration).heatmap_u8

    def run_meas_up(i):
        dev = jax.device_put(rest_u8_v[i])
        return scan.measure_clip(dev, roi, spec, coeffs, 10,
                                 cfg.measure).samples

    try:
        np.asarray(run_cal_up(iters))   # reshard/transfer compile, excluded
        np.asarray(run_meas_up(iters))  # rest-shaped transfer compile too
    except Exception as e:
        # The headline must never sink on the u8 ingest path — fall back to
        # the f32 upload convention and say so in the JSON.
        log(f"u8 upload path failed ({e!r}); falling back to f32 uploads")
        upload_ingest = "float32"
        # i+1: variant 0 must NOT be bitwise-equal to the compile-phase
        # locate(cal)/measure_clip(rest) dispatches, which the tunnel
        # would memoize (CLAUDE.md timing rules).
        cal_f_v = [cal_np + np.float32((i + 1) * 1e-6)
                   for i in range(iters + 2)]
        rest_f_v = [rest_np + np.float32((i + 1) * 1e-6)
                    for i in range(iters + 2)]

        def run_cal_up(i):  # noqa: F811 — deliberate fallback rebind
            dev = jax.device_put(cal_f_v[i])
            return evm.locate(dev, fps_video, cfg.calibration).heatmap_u8

        def run_meas_up(i):  # noqa: F811
            dev = jax.device_put(rest_f_v[i])
            return scan.measure_clip(dev, roi, spec, coeffs, 10,
                                     cfg.measure).samples

        np.asarray(run_cal_up(iters))
        np.asarray(run_meas_up(iters))
    up_probe0 = time.time()
    np.asarray(run_cal_up(iters + 1))
    up_probe = time.time() - up_probe0
    up_iters = iters if up_probe < 1.0 else 2
    t_cal_up = _timed(run_cal_up, up_iters)
    t_meas_up = _timed(run_meas_up, up_iters)

    # --- H2D/compute overlap (VERDICT r4 #2): double-buffered prefetch —
    # issue device_put of buffer k+1, THEN dispatch compute on buffer k.
    # Through an async dispatch layer upload(k+1) rides behind compute(k);
    # overlap efficiency = how much of min(upload, compute) was hidden.
    overlap = None
    try:
        up_only_iters = max(up_iters, 2)
        # Disjoint byte-variant families per timed role: the tunnel layer
        # memoizes identical dispatches (CLAUDE.md timing rules), and the
        # (cy, cx) family was already dispatched through locate above — a
        # repeat would return instantly and fake the overlap numbers.
        up_only_v = _u8_variants(cal_u8, up_only_iters + 1, (cy + 2, cx))
        ovl_v = _u8_variants(cal_u8, up_iters + 2, (cy + 1, cx))

        def run_upload_only(i):
            dev = jax.device_put(up_only_v[i])
            # cheap dependent fetchable: one corner byte (forces the
            # transfer without meaningful compute)
            return dev[0, 0, :2]

        np.asarray(run_upload_only(up_only_iters))  # transfer-path warm
        t_up_only = _timed(run_upload_only, up_only_iters)

        if upload_ingest != "uint8":
            raise RuntimeError("u8 locate path unavailable (fallback mode)")
        # True double buffering: compute consumes the buffer prefetched on
        # the PREVIOUS iteration while the next upload rides behind it.
        roll = {"cur": jax.device_put(ovl_v[0])}
        np.asarray(roll["cur"][0, 0, 0])

        def run_overlapped(i):
            nxt = jax.device_put(ovl_v[i + 1])
            out = evm.locate(roll["cur"], fps_video,
                             cfg.calibration).heatmap_u8
            roll["cur"] = nxt
            return out

        t_ovl = _timed(run_overlapped, up_iters)
        hidden = (t_up_only + t_cal) - t_ovl
        denom = min(t_up_only, t_cal)
        eff = hidden / denom if denom > 0 else 0.0
        mb = cal_u8.nbytes / 1e6
        overlap = {
            "upload_only_ms": round(t_up_only * 1e3, 1),
            "compute_only_ms": round(t_cal * 1e3, 1),
            "overlapped_ms": round(t_ovl * 1e3, 1),
            "overlap_efficiency": round(eff, 3),
            "h2d_MBps": round(mb / t_up_only, 1),
            # On-prem ceiling: the same u8 buffer over PCIe gen4/5-class
            # links (>= 16 GB/s) uploads in ~2.5 ms — upload-inclusive
            # throughput is then compute-bound, not link-bound; the
            # tunnel's ~40 MB/s is this deployment's artifact.
            "pcie16GBps_upload_ms": round(mb / 16e3 * 1e3, 2),
        }
        log(f"H2D overlap: upload-only {t_up_only*1e3:.1f} ms, compute "
            f"{t_cal*1e3:.1f} ms, overlapped {t_ovl*1e3:.1f} ms "
            f"(efficiency {eff:.0%}, {mb/t_up_only:.0f} MB/s)")
        del roll
    except Exception as e:  # never sink the headline
        log(f"overlap segment failed: {e!r}")

    # --- BASELINE config 3: 5-level pyramid + temporal-FFT localization
    # over a 300-frame buffer (VERDICT r4 #7).  skip_levels_at_top=2 keeps
    # the same kept-level count (2) as the proportional scaling of the
    # 9-level/skip-4 default to a 5-level pyramid.
    config3 = None
    try:
        import dataclasses

        cfg3 = dataclasses.replace(cfg.calibration, buffer_length=300,
                                   pyramid_levels=5, skip_levels_at_top=2)
        clip3 = breathing_clip(num_frames=300, height=480, width=640,
                               fps=fps_video, bpm=18.0,
                               patch_center=(240, 320),
                               patch_size=(80, 100), amplitude=0.12,
                               motion_px=2.0, texture_motion=True)
        c3 = jnp.asarray(np.ascontiguousarray(clip3, np.float32))
        t0 = time.time()
        r3 = evm.locate(c3, fps_video, cfg3)
        jax.block_until_ready(r3.found)
        log(f"config3 locate compile+first: {time.time()-t0:.1f}s "
            f"(found={bool(r3.found)})")
        c3v = [c3 + jnp.float32((i + 1) * 1e-6) for i in range(iters)]
        np.asarray(c3v[-1][0, 0, 0])
        t_c3 = _timed(lambda i: evm.locate(
            c3v[i], fps_video, cfg3).heatmap_u8, iters)
        config3 = {
            "config3_locate_ms": round(t_c3 * 1e3, 1),
            "config3_geometry": "300f x 480x640, 5-level pyramid, skip 2",
            "config3_found": bool(r3.found),
            "config3_realtime_x": round((300 / fps_video) / t_c3, 1),
        }
        log(f"config3 (300-frame 5-level locate): {t_c3*1e3:.1f} ms "
            f"({config3['config3_realtime_x']}x real-time)")
        del c3, c3v
    except Exception as e:  # never sink the headline
        log(f"config3 segment failed: {e!r}")

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

    out = {
        "metric": "evm_calibration_plus_flow_measurement_640x480",
        "value": round(fps_chip, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps_chip / REFERENCE_BEST_FPS, 1),
        "value_with_upload": round(fps_chip_up, 1),
        "upload_ingest": upload_ingest,
        "u8_widen_exact_on_device": u8_widen_exact,
        # Upload-inclusive throughput if the same u8 buffers rode a
        # >=16 GB/s PCIe-class link instead of the ~40 MB/s tunnel.
        "value_with_upload_pcie16GBps_estimate": round(
            frames / (wall + (cal_u8.nbytes + rest_u8.nbytes) / 16e9), 1),
    }
    if overlap is not None:
        out["h2d_overlap"] = overlap
    if config3 is not None:
        out.update(config3)
    if gf_parity is not None:
        ar, an, nr, nn = gf_parity
        out["gaussfit_device_agreement_realistic"] = round(ar, 4)
        out["gaussfit_device_agreement_noise"] = round(an, 4)
    if bpm_tail_median is not None:
        out["bpm_tail_median"] = round(bpm_tail_median, 3)
        out["bpm_true"] = 18.0
    if bpm_oracle_delta is not None:
        out["bpm_oracle_delta"] = round(bpm_oracle_delta, 4)

    # Free the headline's staged buffers, then append the compact fleet
    # metric (VERDICT r3 #2) — never sink the headline on it.
    if include_fleet:
        del cal_v, rest_v, cal, rest
        try:
            fl = _fleet_segment()
            if fl:
                out.update(fl)
        except Exception as e:  # pragma: no cover
            log(f"fleet segment failed: {e!r}")
    print(json.dumps(out))


def _check_u8_widen():
    """On-device u8→f32 widen bit-parity vs the host reference chain over
    all 256 bytes.  CPU tests prove this exhaustively on the CPU backend;
    this check reruns it on the REAL backend (TPU lowering of f32 divide
    is backend-specific — CLAUDE.md: verify device-vs-oracle on TPU)."""
    import jax
    import jax.numpy as jnp

    from respmon_tpu.ops.dtype import uint8_to_float

    b = np.arange(256, dtype=np.uint8)
    want = (b.astype(np.float64) * (1.0 / 255.0)).astype(np.float32)
    try:
        got = np.asarray(jax.jit(uint8_to_float)(jnp.asarray(b)))
    except Exception as e:  # never sink a bench on the parity probe
        log(f"device u8 widen check unavailable: {e!r}")
        return None
    ok = bool(np.array_equal(got.view(np.uint32), want.view(np.uint32)))
    log(f"device u8 widen bit-parity vs host chain: "
        f"{'EXACT (256/256)' if ok else 'MISMATCH'}")
    if not ok:
        bad = np.nonzero(got.view(np.uint32) != want.view(np.uint32))[0]
        log(f"  differing bytes: {bad[:12].tolist()} "
            f"({bad.size}/256 total)")
    return ok


def _fleet_segment(streams: int = 16, H: int = 720, W: int = 1280,
                   box=(560, 300, 160, 130), fps_video: float = 10.0):
    """Compact fleet metric for the DEFAULT bench JSON (VERDICT r3 #2: the
    64x1080p fleet numbers existed only builder-reported; this puts a
    bounded-compile lockstep fleet step into the driver-captured artifact).

    16 streams x 720p, fixed per-stream ROIs (no locate — the throughput
    of the lockstep measure step does not depend on how the box was
    found), device-resident u8 frames with real ±1 px inter-frame shifts,
    FULL 128-sample signal rings (honest BPM/LM load per the round-3
    finding), pipelined dispatch with a deferred fetch — the same
    methodology as ``--multistream``.  Returns the JSON keys or None."""
    import jax
    import jax.numpy as jnp

    from respmon_tpu.config import MonitorConfig
    from respmon_tpu.parallel import streams as fleet
    from respmon_tpu.pipeline import motion

    cfg = MonitorConfig(motion_extraction_method="flow")
    x, y, w, h = box
    mon = fleet.MultiStreamMonitor(cfg, mesh=None, frame_hw=(H, W),
                                   fps=fps_video)
    boxes = np.tile(np.asarray([[x, y, w, h]], np.int32), (streams, 1))
    spec = motion.MeasureSpec.for_roi(cfg, H, W, w, h, fps_video)
    import dataclasses as _dc
    mon.spec = _dc.replace(
        spec, lk_sample=fleet.fleet_lk_sample(cfg, spec.crop_h,
                                              spec.crop_w, streams),
        lk_prev_sample=fleet.fleet_lk_prev_sample(cfg))
    mon.states = fleet.init_stream_states(mon.spec, boxes)
    log(f"fleet segment: {streams}x{H}p, crop bucket "
        f"{mon.spec.crop_h}x{mon.spec.crop_w}, "
        f"lk_sample={mon.spec.lk_sample}")

    rng = np.random.default_rng(0)
    frames_np = np.trunc(
        (rng.random((streams, H, W), np.float32) * 0.2 + 0.4) * 255.0
    ).astype(np.uint8)
    frames_v = [jnp.asarray(np.roll(frames_np, s, axis=2))
                for s in (0, 1, 2)]
    np.asarray(frames_v[-1][0, 0, :4])

    log("compiling fleet step (init + steady-state)...")
    t0 = time.time()
    np.asarray(mon.step(frames_v[0]).samples)
    np.asarray(mon.step(frames_v[1]).samples)
    log(f"fleet step compile+first runs: {time.time()-t0:.1f}s")

    def run_step(i):
        return mon.step(frames_v[i % 3]).samples

    for i in range(3):
        np.asarray(run_step(i))
    n_ring = cfg.measure.buffer_length
    t_axis = np.arange(n_ring, dtype=np.float32) / fps_video
    phases = rng.uniform(0, 2 * np.pi, streams).astype(np.float32)
    ring = 0.15 * np.sin(2 * np.pi * 0.3 * t_axis[None, :]
                         + phases[:, None]) \
        + 0.01 * rng.standard_normal((streams, n_ring)).astype(np.float32)
    mon.states = mon.states._replace(
        data=jnp.asarray(ring, jnp.float32),
        t=jnp.broadcast_to(jnp.asarray(t_axis), (streams, n_ring)),
        count=jnp.full((streams,), n_ring, jnp.int32),
        motion_count=jnp.full((streams,), n_ring, jnp.int32))
    np.asarray(run_step(0))   # compiles the LK-cache rebuild variant
    np.asarray(run_step(1))   # settle onto the cached steady-state program
    t_step = _timed(run_step, 8)
    sfps = streams / t_step
    margin = (1.0 / fps_video) / t_step
    log(f"fleet segment: {t_step*1e3:.1f} ms/step -> {sfps:.0f} "
        f"stream-frames/sec/chip, {margin:.1f}x margin at 10 fps")
    return {
        "fleet_streams": streams,
        "fleet_geometry": f"{H}x{W}",
        "fleet_step_ms": round(t_step * 1e3, 2),
        "fleet_sfps": round(sfps, 1),
        "fleet_realtime_margin_at_10fps": round(margin, 2),
    }


def _check_gaussfit_parity(n_windows: int = 120):
    """Accept/reject agreement of the DEVICE LM gaussian fit vs the scipy
    curve_fit oracle at bench geometry (VERDICT r3 #5: the CPU f64 suite
    provably cannot catch f32/TPU-path decision flips — round 3's bf16
    precision flip was TPU-only-visible).  Windows mirror the reference
    call site (base.py:319-337): ~2 s at fps 10 around a candidate peak.

    Returns (agreement_realistic, agreement_noise, n_real, n_noise) or None
    if the oracle is unavailable.  Pure-noise windows are reported
    separately: their decisions are near-arbitrary (tiny numeric
    differences legitimately flip scipy itself) and are excluded from the
    realistic envelope, matching tests/test_gaussfit.py."""
    import jax
    import jax.numpy as jnp

    from respmon_tpu.ops import gaussfit

    try:
        from scipy.optimize import curve_fit
    except Exception as e:  # pragma: no cover
        log(f"gaussfit device check unavailable (scipy): {e!r}")
        return None

    rng = np.random.default_rng(2024)
    fps = 10.0
    pad = 32
    wins = []
    kinds = []
    for trial in range(n_windows):
        n = int(rng.integers(4, 21))
        t0 = rng.uniform(0, 12)
        t = t0 + np.arange(n) / fps
        kind = trial % 3
        if kind == 0:    # genuine peak (sigma swept across the cutoff)
            sig = rng.uniform(0.1, 1.2)
            c = t0 + n / (2 * fps)
            y = rng.uniform(0.2, 3) * np.exp(-((t - c) ** 2)
                                             / (2 * sig ** 2)) \
                + rng.normal(0, 0.05, n)
        elif kind == 1:  # oscillation fragment (filtered-signal look)
            y = np.sin(2 * np.pi * rng.uniform(0.2, 0.45) * t) \
                + rng.normal(0, 0.1, n)
        else:            # pure noise
            y = rng.normal(0, 1, n)
        wins.append((t, y))
        kinds.append(kind)

    T = np.zeros((n_windows, pad), np.float32)
    Y = np.zeros((n_windows, pad), np.float32)
    M = np.zeros((n_windows, pad), bool)
    for i, (t, y) in enumerate(wins):
        T[i, :len(t)] = t
        Y[i, :len(y)] = y
        M[i, :len(t)] = True
    res = jax.jit(gaussfit.gaussian_fit_batch)(
        jnp.asarray(T), jnp.asarray(Y), jnp.asarray(M))
    got_dev = np.asarray(res.dev)
    got_conv = np.asarray(res.converged)

    def gauss(x, a, c, s):
        return a * np.exp(-((x - c) ** 2) / (2 * s ** 2))

    agree = [0, 0]
    total = [0, 0]
    for i, (t, y) in enumerate(wins):
        try:
            p, _ = curve_fit(gauss, t, y,
                             p0=[y.max(), t[0], (t[1] - t[0]) * 5])
            want = p[2] < 10.0
        except (RuntimeError, TypeError):
            want = False
        got = bool(got_conv[i]) and float(got_dev[i]) < 10.0
        b = 1 if kinds[i] == 2 else 0
        total[b] += 1
        agree[b] += int(got == want)
    ar = agree[0] / max(total[0], 1)
    an = agree[1] / max(total[1], 1)
    log(f"device gaussfit accept/reject vs scipy: realistic "
        f"{agree[0]}/{total[0]} ({ar:.1%}), pure-noise {agree[1]}/"
        f"{total[1]} ({an:.1%})")
    return ar, an, total[0], total[1]


def corpus_traces(n_traces: int, length: int = 192):
    """Synthetic motion-trace corpus across BPM/noise/fps/fault regimes
    (VERDICT r4 #3).  Returns a list of dicts with float64 ``y``/``t``."""
    kinds = ("clean", "drift", "spike", "step")
    bpms = (8.0, 12.0, 16.0, 18.0, 22.0, 26.0, 30.0)
    noises = (0.02, 0.05, 0.1, 0.2, 0.4)
    fpss = (5.01, 7.68, 10.0)
    out = []
    i = 0
    while len(out) < n_traces:
        bpm = bpms[i % len(bpms)]
        noise = noises[(i // len(bpms)) % len(noises)]
        fps = fpss[(i // (len(bpms) * len(noises))) % len(fpss)]
        kind = kinds[i % len(kinds)]
        rng = np.random.default_rng(1000 + i)
        t = np.arange(length) / fps
        f = bpm / 60.0
        if kind == "step":        # rate change mid-trace (subject settles)
            f2 = f * rng.uniform(0.6, 1.5)
            phase = np.where(t < t[length // 2],
                             2 * np.pi * f * t,
                             2 * np.pi * f * t[length // 2]
                             + 2 * np.pi * f2 * (t - t[length // 2]))
            y = np.sin(phase)
        else:
            y = np.sin(2 * np.pi * f * t)
        if kind == "drift":       # amplitude decay (weakening signal)
            y = y * np.linspace(1.0, 0.25, length)
        if kind == "spike":       # transient occlusion-like bursts
            for s in rng.integers(20, length - 4, size=3):
                y[s:s + 3] += rng.uniform(2.0, 5.0)
        y = y + noise * rng.standard_normal(length)
        out.append({"y": y, "t": t, "fps": fps, "bpm": bpm,
                    "noise": noise, "kind": kind})
        i += 1
    return out


def main_bpm_corpus(n_traces: int = 120, out_path: str = None):
    """End-to-end BPM decision-envelope corpus (VERDICT r4 #3): run the
    device f32 estimator over every sliding ring window of every trace and
    compare against the scipy-f64 golden chain (filtfilt + peakutils +
    curve_fit) window by window.  Reports the |ΔBPM| distribution over
    steps where BOTH chains produce a BPM, plus has-BPM agreement."""
    import jax
    import jax.numpy as jnp

    import sys as _sys
    if "/root/repo" not in _sys.path:
        _sys.path.insert(0, "/root/repo")
    from tests.golden import reference_numpy as golden

    from respmon_tpu.config import MeasureConfig
    from respmon_tpu.ops import filters
    from respmon_tpu.pipeline import bpm as bpm_mod

    cfg = MeasureConfig()
    n_ring = cfg.buffer_length
    traces = corpus_traces(n_traces)
    log(f"bpm corpus: {len(traces)} traces x "
        f"{len(traces[0]['y']) - cfg.initialization_length} steps")

    fns = {}

    def device_fn(fps):
        if fps not in fns:
            coeffs = filters.design_butter_lowpass(0.5, fps,
                                                   cfg.filter_order)
            min_dist = max(int(np.floor(fps / 1.0)), 1)
            fns[fps] = jax.jit(jax.vmap(
                lambda d, tt, c: bpm_mod.estimate_bpm(
                    d, tt, c, coeffs, min_dist, cfg))), min_dist
        return fns[fps]

    deltas = []
    per_trace = []
    n_steps = n_both = n_mismatch = 0
    by_kind = {}
    t_dev = t_orc = 0.0
    for ti, tr in enumerate(traces):
        y, t, fps = tr["y"], tr["t"], tr["fps"]
        length = len(y)
        steps = list(range(cfg.initialization_length + 1, length + 1))
        k = len(steps)
        D = np.zeros((k, n_ring), np.float32)
        T = np.zeros((k, n_ring), np.float32)
        C = np.zeros((k,), np.int32)
        for j, c in enumerate(steps):
            m = min(c, n_ring)
            D[j, n_ring - m:] = y[c - m:c]
            T[j, n_ring - m:] = t[c - m:c]
            C[j] = m
        fn, min_dist = device_fn(fps)
        t0 = time.time()
        res = fn(jnp.asarray(D), jnp.asarray(T), jnp.asarray(C))
        dev_has = np.asarray(res.has_bpm)
        dev_bpm = np.asarray(res.bpm)
        t_dev += time.time() - t0

        t0 = time.time()
        tr_deltas = []
        for j, c in enumerate(steps):
            m = min(c, n_ring)
            ob, _, _, _ = golden.measure_bpm(y[c - m:c], t[c - m:c], fps)
            orc_has = ob is not None
            n_steps += 1
            if orc_has != bool(dev_has[j]):
                n_mismatch += 1
            elif orc_has:
                n_both += 1
                d = abs(float(dev_bpm[j]) - ob)
                tr_deltas.append(d)
                deltas.append(d)
                by_kind.setdefault(tr["kind"], []).append(d)
        t_orc += time.time() - t0
        per_trace.append(max(tr_deltas) if tr_deltas else 0.0)
        if (ti + 1) % 20 == 0:
            log(f"  {ti + 1}/{len(traces)} traces "
                f"(dev {t_dev:.1f}s oracle {t_orc:.1f}s)")

    deltas = np.asarray(deltas)
    per_trace = np.asarray(per_trace)
    stats = {
        "metric": "bpm_corpus_max_abs_delta_vs_scipy_f64",
        "value": round(float(deltas.max()) if deltas.size else 0.0, 4),
        "unit": "bpm",
        "vs_baseline": 0.5,   # BASELINE bar: +-0.5 BPM
        "n_traces": len(traces),
        "n_steps": n_steps,
        "n_both_have_bpm": n_both,
        "has_bpm_mismatch_rate": round(n_mismatch / max(n_steps, 1), 5),
        "delta_p50": round(float(np.percentile(deltas, 50)), 5),
        "delta_p99": round(float(np.percentile(deltas, 99)), 5),
        "delta_p999": round(float(np.percentile(deltas, 99.9)), 5),
        "traces_within_half_bpm": int((per_trace <= 0.5).sum()),
        "per_kind_max": {kk: round(float(np.max(v)), 4)
                         for kk, v in sorted(by_kind.items())},
        "per_kind_p99": {kk: round(float(np.percentile(v, 99)), 4)
                         for kk, v in sorted(by_kind.items())},
    }
    log(json.dumps(stats, indent=2))
    if out_path:
        with open(out_path, "w") as f:
            f.write(json.dumps(stats) + "\n")
    print(json.dumps(stats))
    return stats


def _warmup():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    t0 = time.time()
    _ = float(jnp.asarray(1.0) + 1.0)
    log(f"transfer warmup: {time.time()-t0:.1f}s")
    _check_u8_widen()


def main_multistream(streams: int = 64, fleet_refine: bool = False):
    """BASELINE.md config 5: 64-stream 1080p lockstep monitoring.

    ``fleet_refine`` opts the fleet into the accuracy tier
    (MonitorConfig.fleet_f64_refine: the emulated-f64 wild-fit refinement
    runs inside the lockstep step) to price that tier at fleet scale."""
    import jax
    import jax.numpy as jnp

    from respmon_tpu.config import MonitorConfig
    from respmon_tpu.io.synthetic import breathing_clip
    from respmon_tpu.parallel import streams as fleet
    from respmon_tpu.pipeline import evm, motion

    _warmup()

    fps_video = 10.0
    H, W = 1080, 1920
    cfg = MonitorConfig(motion_extraction_method="flow",
                        fleet_f64_refine=fleet_refine)

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
    mon.spec = _dc.replace(
        spec, lk_sample=fleet.fleet_lk_sample(cfg, spec.crop_h,
                                              spec.crop_w, streams),
        lk_prev_sample=fleet.fleet_lk_prev_sample(cfg))
    log(f"crop bucket {mon.spec.crop_h}x{mon.spec.crop_w}, "
        f"lk_sample={mon.spec.lk_sample}")
    mon.states = fleet.init_stream_states(mon.spec, boxes)

    # Three device-resident frame batches with real ±1 px inter-frame
    # shifts: the timed steps then do genuine LK tracking work (constant
    # frames would converge in one Newton iteration and flatter the step).
    # Staged as camera-native uint8 (the production ingest; crops widen to
    # the exact u8 lattice on device) — 4x less HBM than f32 staging,
    # which is what lets 256-stream fleets hold 3 frame variants.
    rng = np.random.default_rng(0)
    frames_np = np.trunc(
        (rng.random((streams, H, W), np.float32) * 0.2 + 0.4) * 255.0
    ).astype(np.uint8)
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
    # Install FULL signal rings before timing: a deployed fleet runs with
    # 128-sample rings and 3-4 peak candidates per stream feeding the LM
    # fit every step; timing right after warmup (3-sample rings) would
    # under-load the BPM stage (round-2 bench did; ~4 ms flattering).
    n_ring = cfg.measure.buffer_length
    t_axis = np.arange(n_ring, dtype=np.float32) / fps_video
    phases = rng.uniform(0, 2 * np.pi, streams).astype(np.float32)
    ring = 0.15 * np.sin(2 * np.pi * 0.3 * t_axis[None, :]
                         + phases[:, None]) \
        + 0.01 * rng.standard_normal((streams, n_ring)).astype(np.float32)
    mon.states = mon.states._replace(
        data=jnp.asarray(ring, jnp.float32),
        t=jnp.broadcast_to(jnp.asarray(t_axis), (streams, n_ring)),
        count=jnp.full((streams,), n_ring, jnp.int32),
        motion_count=jnp.full((streams,), n_ring, jnp.int32))
    np.asarray(run_step(0))   # compiles the LK-cache rebuild variant
    np.asarray(run_step(1))   # settle onto the cached steady-state program
    # _timed fetches only the LAST result: consecutive steps chain on the
    # device state, so dispatch i+1 overlaps execution i — the production
    # consumption mode (results are device arrays; fetch asynchronously).
    t_step = _timed(run_step, 10)
    sfps = streams / t_step
    margin = (1.0 / fps_video) / t_step
    log(f"{streams}-stream 1080p lockstep step (pipelined): "
        f"{t_step*1e3:.1f} ms -> {sfps:.0f} stream-frames/sec/chip, "
        f"{margin:.1f}x real-time margin at {fps_video:.0f} fps")
    # Synchronous per-step host fetch for contrast: on this tunnel a
    # blocking readback adds ~26 ms/step.
    t0 = time.time()
    for i in range(6):
        np.asarray(run_step(i + 1))
    t_step_sync = (time.time() - t0) / 6
    log(f"  (fetch-every-step: {t_step_sync*1e3:.1f} ms/step)")

    # --- fleet streaming-ROI overhead (VERDICT r4 #4): the same fleet
    # with rolling pyramid rings — each step pays one batched absorb
    # dispatch, plus the COARSE localize (collapse stopped at the kept
    # levels) every streaming_interval steps and the drift check/re-lock.
    extra = {}
    try:
        interval = cfg.streaming_interval
        cfg_s = _dc.replace(cfg, streaming_roi=True)
        mon_s = fleet.MultiStreamMonitor(cfg_s, mesh=None,
                                         frame_hw=(H, W), fps=fps_video)
        mon_s.spec = mon.spec
        mon_s.states = fleet.init_stream_states(mon_s.spec, boxes)
        mon_s.states = mon_s.states._replace(
            data=jnp.asarray(ring, jnp.float32),
            t=jnp.broadcast_to(jnp.asarray(t_axis), (streams, n_ring)),
            count=jnp.full((streams,), n_ring, jnp.int32),
            motion_count=jnp.full((streams,), n_ring, jnp.int32))
        mon_s._rois = boxes.copy()
        mon_s._streaming = fleet.init_fleet_streaming(
            (H, W), cfg.calibration, streams)
        log("compiling fleet streaming step (absorb + coarse update)...")
        t0 = time.time()
        for i in range(interval + 2):   # covers absorb AND update programs
            r = mon_s.step(frames_v[i % 3])
        np.asarray(r.samples)
        log(f"fleet streaming warm/compile: {time.time()-t0:.1f}s")

        def run_step_s(i):
            return mon_s.step(frames_v[i % 3]).samples

        t_step_s = _timed(run_step_s, 2 * interval)
        over_ms = (t_step_s - t_step) * 1e3
        log(f"fleet streaming-ROI overhead: step {t_step_s*1e3:.1f} ms vs "
            f"{t_step*1e3:.1f} base -> +{over_ms:.2f} ms/step amortized "
            f"({over_ms/streams*1e3:.1f} us/stream-frame, interval "
            f"{interval})")
        extra = {
            "streaming_step_ms": round(t_step_s * 1e3, 2),
            "streaming_overhead_ms_per_step": round(over_ms, 2),
            "streaming_overhead_ms_per_stream_frame": round(
                over_ms / streams, 4),
            "streaming_interval": interval,
        }
        del mon_s
    except Exception as e:  # never sink the fleet bench on the new segment
        log(f"fleet streaming segment failed: {e!r}")

    # K-frame lockstep batches (step_many) — DIAGNOSTIC: measured ~10%
    # slower per frame than chained single steps on this deployment (the
    # scan's per-iteration slice of the staged (K,S,H,W) batch plus its
    # scheduling beats the dispatch it saves), so the chained step above is
    # the headline; kept here so the comparison stays reproducible.
    K = 4
    batch_bytes = 2 * K * streams * H * W * frames_v[0].dtype.itemsize
    if batch_bytes > (6 << 30):
        # Two staged (K, S, H, W) variants would crowd HBM next to the
        # step's own patch workspace — skip the diagnostic at this scale.
        log(f"skipping step_many diagnostic: {K}-frame batches for "
            f"{streams} streams need {batch_bytes/2**30:.1f} GB staged")
        print(json.dumps({
            "metric": f"multistream_{streams}x1080p_flow_monitoring"
                  + ("_f64refine" if fleet_refine else ""),
            "value": round(sfps, 1),
            "unit": "stream-frames/sec/chip",
            "vs_baseline": round(sfps / REFERENCE_BEST_FPS, 1),
            "step_ms": round(t_step * 1e3, 2),
            "step_ms_sync_fetch": round(t_step_sync * 1e3, 2),
            "realtime_margin_at_10fps": round(margin, 2),
            "recalibration_1080p_ms": round(t_cal * 1e3, 1),
            **extra,
        }))
        return
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
        "metric": f"multistream_{streams}x1080p_flow_monitoring"
                  + ("_f64refine" if fleet_refine else ""),
        "value": round(sfps, 1),
        "unit": "stream-frames/sec/chip",
        "vs_baseline": round(sfps / REFERENCE_BEST_FPS, 1),
        "step_ms": round(t_step * 1e3, 2),
        "step_ms_sync_fetch": round(t_step_sync * 1e3, 2),
        "realtime_margin_at_10fps": round(margin, 2),
        f"batch{K}_ms_per_frame": round(t_batch / K * 1e3, 2),
        f"batch{K}_realtime_margin": round(margin_b, 2),
        "recalibration_1080p_ms": round(t_cal * 1e3, 1),
        **extra,
    }))


def main_fleet_breakdown(streams: int = 64):
    """Stage-level breakdown of the 64x1080p fleet step (VERDICT r2 #2).

    Each stage runs as its own jitted program timed CHAINED-PIPELINED
    (call i+1's input depends on call i's device result; one fetch at the
    end) — the fleet's production consumption mode, which amortizes the
    tunnel's unstable per-call overhead instead of subtracting it.  Two
    rejected methodologies, both measured: in-jit rep differencing (XLA
    hoists every rep-invariant subcomputation out of the rep loop —
    understates ~2x) and single-dispatch floor subtraction (the per-call
    overhead is bimodal ~13-30 ms, producing supersets that time BELOW
    their components).  States carry REALISTIC full signal rings
    (3-sample rings under-load the BPM stage)."""
    import jax
    import jax.numpy as jnp

    from respmon_tpu.config import MonitorConfig
    from respmon_tpu.io.synthetic import breathing_clip
    from respmon_tpu.ops import gaussfit, filters, peaks as peaks_mod
    from respmon_tpu.parallel import streams as fleet
    from respmon_tpu.pipeline import bpm as bpm_mod
    from respmon_tpu.pipeline import evm, motion

    _warmup()
    fps_video = 10.0
    H, W = 1080, 1920
    cfg = MonitorConfig(motion_extraction_method="flow")
    # Decompose the PRODUCTION fleet step: the fleet BPM tier runs without
    # the f64 wild-fit refinement (MonitorConfig.fleet_f64_refine, default
    # off — MultiStreamMonitor applies the same replace), so the stages
    # here correspond to the program mon.step actually dispatches.  With
    # the refinement left on, the estimator stage alone measured 253 ms at
    # this fixture (persistent suspect lanes × the emulated-f64 loop).
    import dataclasses as _dc2
    mcfg = cfg.measure
    if not cfg.fleet_f64_refine and mcfg.f64_refine:
        mcfg = _dc2.replace(mcfg, f64_refine=False)

    log("1080p locate for the fleet ROI...")
    cal = breathing_clip(num_frames=cfg.calibration.buffer_length, height=H,
                         width=W, fps=fps_video, bpm=18.0,
                         patch_center=(540, 960), patch_size=(180, 220),
                         amplitude=0.12, motion_px=3.0)
    loc = evm.locate(jnp.asarray(cal, jnp.float32), fps_video,
                     cfg.calibration)
    assert bool(loc.found)
    x, y, w, h = int(loc.x), int(loc.y), int(loc.w), int(loc.h)
    del cal
    log(f"roi: {(x, y, w, h)}")

    mon = fleet.MultiStreamMonitor(cfg, mesh=None, frame_hw=(H, W),
                                   fps=fps_video)
    boxes = np.tile(np.asarray([[x, y, w, h]], np.int32), (streams, 1))
    spec = motion.MeasureSpec.for_roi(cfg, H, W, w, h, fps_video)
    import dataclasses as _dc
    spec = _dc.replace(
        spec, lk_sample=fleet.fleet_lk_sample(cfg, spec.crop_h,
                                              spec.crop_w, streams),
        lk_prev_sample=fleet.fleet_lk_prev_sample(cfg))
    mon.spec = spec
    mon.states = fleet.init_stream_states(spec, boxes)
    log(f"crop bucket {spec.crop_h}x{spec.crop_w}, "
        f"lk_sample={spec.lk_sample}")

    rng = np.random.default_rng(0)
    frames_np = rng.random((streams, H, W), np.float32) * 0.2 + 0.4
    frames_v = [jnp.asarray(np.roll(frames_np, s, axis=2))
                for s in (0, 1, 2)]
    np.asarray(frames_v[-1][0, 0, :4])
    for i in range(3):   # corner-detect + settle tracking
        np.asarray(mon.step(frames_v[i % 3]).samples)

    # Install realistic steady-state rings: full count, per-stream phase-
    # shifted breathing traces (3-4 peak candidates + LM fits per stream).
    n_ring = mcfg.buffer_length
    t_axis = np.arange(n_ring, dtype=np.float32) / fps_video
    ph = rng.uniform(0, 2 * np.pi, streams).astype(np.float32)
    ring = 0.15 * np.sin(2 * np.pi * 0.3 * t_axis[None, :] + ph[:, None]) \
        + 0.01 * rng.standard_normal((streams, n_ring)).astype(np.float32)
    motion_ring = np.stack(
        [0.02 * np.ones((streams, n_ring), np.float32),
         ring.astype(np.float32)], axis=-1)
    states = mon.states._replace(
        data=jnp.asarray(ring, jnp.float32),
        t=jnp.broadcast_to(jnp.asarray(t_axis), (streams, n_ring)),
        count=jnp.full((streams,), n_ring, jnp.int32),
        motion_xy=jnp.asarray(motion_ring, jnp.float32),
        motion_count=jnp.full((streams,), n_ring, jnp.int32))
    mon.states = states
    coeffs, min_dist = mon.coeffs, mon.min_dist

    stage_ms = {}

    def time_stage(name, body, payload, calls=8, windows=4):
        """Min-of-windows chained-pipelined per-call ms of ``jit(body)`` —
        the SAME consumption mode the fleet bench times (mon.step chains on
        device state, fetch deferred).  Each call's eps input depends on
        the previous call's device result, so calls serialize on device
        while dispatches pipeline; one host fetch per window.  The MINIMUM
        over ``windows`` repetitions rejects the tunnel's intermittent
        ~100-250 ms hiccups, which otherwise pollute whole windows and make
        superset programs time below their own components (both
        single-dispatch floor subtraction and single-window chaining were
        measured internally inconsistent here; in-jit rep differencing
        understates ~2x via XLA hoisting of rep-invariant work).  The
        distinct eps chain also defeats the tunnel's dispatch memoization.
        Every state tensor a body consumes rides in ``payload`` as a
        RUNTIME argument — closing over device arrays bakes them into the
        program as constants and lets XLA fold state-dependent work
        (measured: the full fused step timed 17.8 ms with captured states
        vs ~38 ms with state arguments — prev-pyramid builds and
        constant-point window gathers folded away).  Scalar-returning
        bodies still let XLA drop state-output writes — the "+ state
        materialization" / "outputs floor" stages price those."""
        fn = jax.jit(body)

        def scalar(out):
            return out[0] if isinstance(out, tuple) else out

        np.asarray(scalar(fn(jnp.float32(0.0), payload)))  # compile
        np.asarray(scalar(fn(jnp.float32(1e-6), payload)))  # settle
        best = float("inf")
        k = 0
        for _ in range(windows):
            eps = jnp.float32(2e-6 + 1e-9 * k)
            t0 = time.time()
            for _ in range(calls):
                k += 1
                o = scalar(fn(eps, payload))
                eps = o * jnp.float32(1e-30) + jnp.float32(1e-6 * (k + 3))
            np.asarray(eps)
            best = min(best, (time.time() - t0) / calls * 1e3)
        stage_ms[name] = best
        log(f"  {name:36s} {best:7.2f} ms")
        return best

    log(f"--- per-stage chained-pipelined device times ({streams} streams) "
        f"---")

    time_stage("floor (trivial program)",
               lambda eps, x: jnp.sum(x + eps), jnp.zeros((8,)))

    rois = states.roi
    pts, pts_valid = states.pts, states.pts_valid
    prev_crop = states.prev_crop

    def crop_body(eps, p):
        fr, rois_ = p
        def one(f, roi):
            c, m, _ = motion._crop_and_mask(f + eps, roi, spec)
            return jnp.sum(motion._to_u8_scale(jnp.where(m, c, 0.0)))
        return jnp.sum(jax.vmap(one)(fr, rois_))
    time_stage("crop+u8 (from 1080p frames)", crop_body, (frames_v[0], rois))

    # Crops as standalone inputs for the build/track stages.
    @jax.jit
    def make_crops(fr):
        def one(f, roi):
            c, m, _ = motion._crop_and_mask(f, roi, spec)
            return motion._to_u8_scale(jnp.where(m, c, 0.0))
        return jax.vmap(one)(fr, rois)

    crops_a = make_crops(frames_v[1])
    crops_b = make_crops(frames_v[2])
    np.asarray(crops_b[0, 0, :4])

    from respmon_tpu.ops import lk as lk_mod
    win = spec.lk.win_size[0]
    max_level = spec.lk.max_level

    def prev_build_body(eps, crops):
        def one(c):
            ins = lk_mod.precompute_frame_inputs(c + eps, win, max_level,
                                                 with_patches=False)
            return sum(jnp.sum(s) for s in ins.stacks)
        return jnp.sum(jax.vmap(one)(crops))
    time_stage("prev stacks (pyr+Scharr+pad)", prev_build_body, crops_a)

    # The next-frame build depends on the sampling mode: onehot/slices only
    # need the padded pyramid; patches modes also build im2col matrices.
    with_patches = spec.lk_sample in ("patches", "patches16")

    def next_build_body(eps, crops):
        def one(c):
            ins = lk_mod.precompute_frame_inputs(
                c + eps, win, max_level, with_stacks=False,
                with_patches=with_patches, with_images=not with_patches,
                patch_dtype=(jnp.bfloat16 if spec.lk_sample == "patches16"
                             else None))
            arrs = ins.patches if with_patches else ins.images
            return sum(jnp.sum(p.astype(jnp.float32)) for p in arrs)
        return jnp.sum(jax.vmap(one)(crops))
    next_build_name = f"next build ({spec.lk_sample})"
    time_stage(next_build_name, next_build_body, crops_a)

    def lk_body(eps, p):
        crops, pc_, pts_, valid_ = p
        def one(pc, c, p_, v):
            fr = lk_mod.calc_optical_flow_pyr_lk(
                pc, c + eps, p_, v, win=win, max_level=max_level,
                max_iters=spec.lk.max_iters, eps=spec.lk.epsilon,
                sample=spec.lk_sample)
            return jnp.sum(fr.pts) + jnp.sum(fr.status)
        return jnp.sum(jax.vmap(one)(pc_, crops, pts_, valid_))
    time_stage("LK full (builds + Newton)", lk_body,
               (crops_b, prev_crop, pts, pts_valid))

    def step_body(eps, p):
        fr, st_ = p
        def one(st, f):
            st2, sample = motion.measure_step(st, f + eps, spec,
                                              initialized_hint=True)
            return sample + jnp.sum(st2.pts)
        return jnp.sum(jax.vmap(one)(st_, fr))
    time_stage("measure_step (crop+LK+PCA+rings)", step_body,
               (frames_v[1], states))

    data, t_st, count = states.data, states.t, states.count

    def filt_body(eps, p):
        d, count_ = p
        def one(di, ci):
            return jnp.sum(filters.filtfilt_masked(coeffs, di + eps, ci))
        return jnp.sum(jax.vmap(one)(d, count_))
    time_stage("filtfilt (masked Hillis-Steele)", filt_body, (data, count))

    @jax.jit
    def make_filtered(d):
        return jax.vmap(lambda di, ci: filters.filtfilt_masked(
            coeffs, di, ci))(d, count)

    filtered = make_filtered(data)
    np.asarray(filtered[0, :4])

    def peaks_body(eps, p):
        f, count_ = p
        def one(fi, ci):
            idx, mask = peaks_mod.peak_indexes_masked(
                fi + eps, ci, min_dist, thres=mcfg.peak_threshold,
                max_peaks=mcfg.max_peaks)
            return jnp.sum(idx) + jnp.sum(mask)
        return jnp.sum(jax.vmap(one)(f, count_))
    time_stage("peak candidates", peaks_body, (filtered, count))

    # Gaussian-fit stage on the real candidate windows of these rings.
    @jax.jit
    def make_windows(f, d_t):
        def one(fi, ti, ci):
            n = fi.shape[0]
            width = max(min_dist, 1)
            cand_idx, cand_mask = peaks_mod.peak_indexes_masked(
                fi, ci, min_dist, thres=mcfg.peak_threshold,
                max_peaks=mcfg.max_peaks)
            start = n - ci
            i_loc = cand_idx - start
            w1 = jnp.where(i_loc - width < 0, i_loc, width)
            w2 = jnp.where(i_loc + w1 > ci, ci - i_loc, w1)
            offs = jnp.arange(2 * width)
            gidx = cand_idx[:, None] - w2[:, None] + offs[None, :]
            gclip = jnp.clip(gidx, 0, n - 1)
            wt = ti[gclip]
            wy = fi[gclip]
            wm = cand_mask[:, None] & (offs[None, :] < 2 * w2[:, None]) \
                & (gidx >= 0) & (gidx < n)
            return wt, wy, wm
        return jax.vmap(one)(f, d_t, count)

    win_t, win_y, win_m = make_windows(filtered, t_st)
    np.asarray(win_m[0, 0, :4])
    n_cand = int(np.asarray(win_m.any(axis=2).sum()))
    log(f"  (candidate windows in flight: {n_cand} across {streams} "
        f"streams)")

    def fit_body(eps, p):
        wy, wt_, wm_ = p
        def one(wt, w_y, wm):
            r = gaussfit.gaussian_fit_batch(wt, w_y + eps, wm)
            return jnp.sum(r.dev) + jnp.sum(r.converged)
        return jnp.sum(jax.vmap(one)(wt_, wy, wm_))
    time_stage("gaussian LM fit (batched)", fit_body, (win_y, win_t, win_m))

    def bpm_body(eps, p):
        d, t_, count_ = p
        def one(di, ti, ci):
            r = bpm_mod.estimate_bpm(di + eps, ti, ci, coeffs, min_dist,
                                     mcfg)
            return r.bpm + jnp.sum(r.filtered)
        return jnp.sum(jax.vmap(one)(d, t_, count_))
    time_stage("estimate_bpm full", bpm_body, (data, t_st, count))

    def full_body(eps, p):
        fr, st_ = p
        def one(st, f):
            st2, sample = motion.measure_step(st, f + eps, spec,
                                              initialized_hint=True)
            r = bpm_mod.estimate_bpm(st2.data, st2.t, st2.count, coeffs,
                                     min_dist, mcfg)
            return sample + r.bpm
        return jnp.sum(jax.vmap(one)(st_, fr))
    full_ms = time_stage("FULL fused step (full rings)", full_body,
                         (frames_v[1], states))

    # Same program but RETURNING the full new state: XLA must materialize
    # every state output (prev_crop, pts, rings, ...) to HBM, as the real
    # fleet step does — the delta vs the scalar-returning stage is the
    # state write-out + copy cost the stage bodies above get DCE'd.
    def full_state_body(eps, p):
        fr, st_ = p
        def one(st, f):
            st2, sample = motion.measure_step(st, f + eps, spec,
                                              initialized_hint=True)
            r = bpm_mod.estimate_bpm(st2.data, st2.t, st2.count, coeffs,
                                     min_dist, mcfg)
            return sample + r.bpm, st2
        s, st2 = jax.vmap(one)(st_, fr)
        return jnp.sum(s), st2
    time_stage("FULL + state materialization", full_state_body,
               (frames_v[1], states))

    # Pure output-buffer cost: a near-trivial program returning the same
    # state-shaped pytree (every leaf runtime-dependent so nothing folds
    # or aliases).  If this is large, the FULL-vs-state gap is per-output
    # tunnel handle overhead, not device compute — a deployment floor a
    # direct-attached TPU would not pay.
    def outputs_floor_body(eps, p):
        fr, st_ = p
        small = eps > jnp.float32(2.0)   # runtime-False for our eps

        def pert(x):
            if jnp.issubdtype(x.dtype, jnp.floating):
                return x + eps.astype(x.dtype)
            if x.dtype == jnp.bool_:
                return x & ~small
            return x + small.astype(x.dtype)
        st2 = jax.tree_util.tree_map(pert, st_)
        return jnp.sum(fr[0, 0, :4] + eps), st2
    time_stage("outputs floor (state-shaped)", outputs_floor_body,
               (frames_v[1], states))

    # The shipped fleet-bench conditions (nearly-empty rings) for contrast.
    empty = mon.states._replace(
        data=jnp.zeros_like(data), count=jnp.full((streams,), 3, jnp.int32),
        motion_count=jnp.full((streams,), 3, jnp.int32))

    def full_empty_body(eps, p):
        fr, st_ = p
        def one(st, f):
            st2, sample = motion.measure_step(st, f + eps, spec,
                                              initialized_hint=True)
            r = bpm_mod.estimate_bpm(st2.data, st2.t, st2.count, coeffs,
                                     min_dist, mcfg)
            return sample + r.bpm
        return jnp.sum(jax.vmap(one)(st_, fr))
    time_stage("FULL fused step (3-sample rings)", full_empty_body,
               (frames_v[1], empty))

    # The production dispatch path (MultiStreamMonitor.step through the
    # host wrapper, state pytree round-trip included), steady-state rings.
    # step() DONATES its input state, so hand it fresh copies — the
    # original `states` leaves ride as runtime payload args in the stages
    # above and must stay alive (donation would invalidate their buffers).
    def states_copy():
        return jax.tree_util.tree_map(jnp.copy, states)

    mon.states = states_copy()
    np.asarray(mon.step(frames_v[0]).samples)   # shape-settle
    mon.states = states_copy()
    # Untimed settle step: after the reset, the first dispatch would carry
    # the SAME (program, state, frame) values as the shape-settle above —
    # which the tunnel memoizes; one chained step makes every timed
    # dispatch's state argument unique.
    np.asarray(mon.step(frames_v[1]).samples)
    t0 = time.time()
    last = None
    for i in range(10):
        last = mon.step(frames_v[(i + 2) % 3]).samples
    np.asarray(last)
    prod_ms = (time.time() - t0) / 10 * 1e3
    stage_ms["mon.step production (incl dispatch)"] = prod_ms
    log(f"  {'mon.step production (incl dispatch)':36s} {prod_ms:7.2f} ms")

    # Same production dispatch with CAMERA-NATIVE u8 frame batches (the
    # deployment ingest: 4x smaller staged frames, u8-lattice crops).  The
    # stage bodies above keep f32 frames because their eps-perturbation
    # chain needs float inputs; this times the whole-step effect instead.
    frames_u8_v = [jnp.asarray(np.trunc(np.roll(frames_np, s, axis=2)
                                        * 255.0).astype(np.uint8))
                   for s in (0, 1, 2)]
    np.asarray(frames_u8_v[-1][0, 0, :4])
    mon.states = states_copy()
    np.asarray(mon.step(frames_u8_v[0]).samples)   # u8 rebuild-variant compile
    np.asarray(mon.step(frames_u8_v[1]).samples)   # u8 cached-variant compile
    mon.states = states_copy()
    np.asarray(mon.step(frames_u8_v[2]).samples)   # rebuild (cache dropped)
    np.asarray(mon.step(frames_u8_v[0]).samples)   # settle onto cached program
    t0 = time.time()
    for i in range(10):
        last = mon.step(frames_u8_v[(i + 2) % 3]).samples
    np.asarray(last)
    prod_u8_ms = (time.time() - t0) / 10 * 1e3
    stage_ms["mon.step production (u8 ingest)"] = prod_u8_ms
    log(f"  {'mon.step production (u8 ingest)':36s} {prod_u8_ms:7.2f} ms")

    derived = {
        "newton_loop_ms": stage_ms["LK full (builds + Newton)"]
        - stage_ms["prev stacks (pyr+Scharr+pad)"]
        - stage_ms[next_build_name],
        "flow_update_rings_ms":
            stage_ms["measure_step (crop+LK+PCA+rings)"]
            - stage_ms["LK full (builds + Newton)"]
            - stage_ms["crop+u8 (from 1080p frames)"],
        "bpm_stage_in_situ_ms": stage_ms["FULL fused step (full rings)"]
            - stage_ms["measure_step (crop+LK+PCA+rings)"],
        "fit_load_in_situ_ms": stage_ms["FULL fused step (full rings)"]
            - stage_ms["FULL fused step (3-sample rings)"],
        "state_writeout_ms": stage_ms["FULL + state materialization"]
            - stage_ms["FULL fused step (full rings)"],
        "state_io_floor_ms":
            stage_ms["outputs floor (state-shaped)"]
            - stage_ms["floor (trivial program)"],
        "host_wrapper_dispatch_ms":
            stage_ms["mon.step production (incl dispatch)"]
            - stage_ms["FULL + state materialization"],
    }
    for k, v in derived.items():
        log(f"  {k:36s} {v:7.2f} ms (derived)")

    print(json.dumps({
        "metric": f"fleet_step_breakdown_{streams}x1080p",
        "value": round(full_ms, 2),
        "unit": "ms/step device (chained-pipelined)",
        "vs_baseline": 0,
        "production_step_ms": round(prod_ms, 2),
        "stages_ms": {k: round(v, 2) for k, v in stage_ms.items()},
        "derived_ms": {k: round(v, 2) for k, v in derived.items()},
    }))


def main_live(measure_frames: int = 256, capture_ms: float = 15.0):
    """End-to-end LIVE-path throughput (VERDICT r2 #3): synthetic frames
    stream through the lossless FrameFeeder -> device_put -> fused
    measure+BPM step with a per-frame host fetch (the monitor's exact
    loop), vs the same loop reading the capture synchronously.

    ``capture_ms`` simulates per-frame decode cost (in-memory arrays decode
    for free, which would make capture/compute overlap unmeasurable; real
    cameras/files pay 10-30 ms).  Also reports a uint8-upload variant: the
    H2D payload drops 4x by shipping camera-native uint8 and converting on
    device (what a production deployment should do on a thin host link)."""
    import jax
    import jax.numpy as jnp

    from respmon_tpu.config import MonitorConfig
    from respmon_tpu.io.capture import ArrayCapture
    from respmon_tpu.io.synthetic import breathing_clip
    from respmon_tpu.ops import filters
    from respmon_tpu.pipeline import evm, motion
    from respmon_tpu.pipeline import bpm as bpm_mod
    from respmon_tpu.runtime.feeder import FrameFeeder
    from respmon_tpu.runtime.monitor import _measure_and_estimate

    _warmup()
    fps_video = 10.0
    cfg = MonitorConfig(motion_extraction_method="flow")
    cal_len = cfg.calibration.buffer_length
    total = cal_len + 1 + measure_frames
    log("generating clip...")
    clip = breathing_clip(num_frames=total, height=480, width=640,
                          fps=fps_video, bpm=18.0, patch_center=(240, 320),
                          patch_size=(80, 100), amplitude=0.12,
                          motion_px=2.0, texture_motion=True)
    loc = evm.locate(jnp.asarray(clip[:cal_len]), fps_video,
                     cfg.calibration)
    assert bool(loc.found)
    x, y, w, h = int(loc.x), int(loc.y), int(loc.w), int(loc.h)
    log(f"roi {(x, y, w, h)}")
    spec = motion.MeasureSpec.for_roi(cfg, 480, 640, w, h, fps_video)
    coeffs = filters.design_butter_lowpass(0.5, fps_video,
                                           cfg.measure.filter_order)
    rest = np.ascontiguousarray(clip[cal_len + 1:], np.float32)
    rest_u8 = np.clip(rest * 255.0, 0, 255).astype(np.uint8)

    def fresh_state():
        return motion.init_state(spec, (x, y, w, h))

    # Compile both step variants once.
    st = fresh_state()
    st, s, _ = _measure_and_estimate(st, jax.device_put(rest[0]), spec,
                                     coeffs, 10, cfg.measure)
    float(s)

    @jax.jit
    def step_u8(state, frame_u8):
        # measure_step ingests camera-native u8 directly (crops the u8
        # frame, widens to the exact [0,255] lattice on device).
        new_state, sample = motion.measure_step(state, frame_u8, spec)
        res = bpm_mod.estimate_bpm(new_state.data, new_state.t,
                                   new_state.count, coeffs, 10, cfg.measure)
        return new_state, sample, res

    st = fresh_state()
    st, s, _ = step_u8(st, jax.device_put(rest_u8[0]))
    float(s)

    class SlowSource:
        """ArrayCapture + simulated per-frame decode cost."""

        def __init__(self, frames, delay_s):
            self._src = ArrayCapture(frames, fps=fps_video)
            self._delay = delay_s
            self.fps = self._src.fps
            self.width = self._src.width
            self.height = self._src.height

        def next_frame(self):
            f = self._src.next_frame()
            if f is not None and self._delay:
                time.sleep(self._delay)
            return f

        def is_open(self):
            return self._src.is_open()

        def release(self):
            self._src.release()

    delay = capture_ms * 1e-3

    def run_sync(frames, step):
        src = SlowSource(frames, delay)
        state = fresh_state()
        n = 0
        t0 = time.time()
        while True:
            f = src.next_frame()
            if f is None:
                break
            state, sample, res = step(state, jax.device_put(f), spec,
                                      coeffs, 10, cfg.measure) \
                if step is _measure_and_estimate \
                else step(state, jax.device_put(f))
            float(sample)       # the monitor's per-frame host mirror
            n += 1
        return n / (time.time() - t0)

    def run_live(frames, step):
        feeder = FrameFeeder(SlowSource(frames, delay), capacity=4,
                             lossless=True, dtype=frames.dtype).start()
        state = fresh_state()
        n = 0
        t0 = time.time()
        while True:
            f, _seq = feeder.next_frame(latest=False)
            if f is None:
                break
            state, sample, res = step(state, jax.device_put(f), spec,
                                      coeffs, 10, cfg.measure) \
                if step is _measure_and_estimate \
                else step(state, jax.device_put(f))
            float(sample)
            n += 1
        dropped = feeder.dropped
        feeder.stop()
        return n / (time.time() - t0), dropped

    log(f"timing sync loop (f32 upload, {capture_ms:.0f} ms simulated "
        f"decode)...")
    fps_sync = run_sync(rest, _measure_and_estimate)
    log(f"sync f32: {fps_sync:.1f} fps")
    fps_live, dropped = run_live(rest, _measure_and_estimate)
    log(f"live f32 (feeder overlap): {fps_live:.1f} fps, dropped={dropped}")
    fps_sync_u8 = run_sync(rest_u8, step_u8)
    log(f"sync u8 upload: {fps_sync_u8:.1f} fps")
    fps_live_u8, dropped_u8 = run_live(rest_u8, step_u8)
    log(f"live u8 (feeder overlap): {fps_live_u8:.1f} fps, "
        f"dropped={dropped_u8}")

    overlap = fps_live / fps_sync
    print(json.dumps({
        "metric": "live_path_sustained_640x480",
        "value": round(fps_live, 1),
        "unit": "frames/sec (feeder + upload + fused step + host fetch)",
        "vs_baseline": round(fps_live / REFERENCE_BEST_FPS, 1),
        "sync_fps": round(fps_sync, 1),
        "overlap_gain": round(overlap, 2),
        "dropped": dropped,
        "u8_upload_live_fps": round(fps_live_u8, 1),
        "u8_upload_sync_fps": round(fps_sync_u8, 1),
        "simulated_capture_ms": capture_ms,
    }))


def main_fleet_live(streams: int = 16, measure_frames: int = 64,
                    capture_ms: float = 15.0, height: int = 1080,
                    width: int = 1920):
    """Sustained PRODUCTION fleet loop (the multi-stream analog of
    ``--live``): S synthetic u8 sources with simulated per-frame decode
    cost -> FleetFeeder (per-stream C++ rings, live freshest-wins, one
    assembled (S, H, W) u8 batch per tick) -> fused device_put ->
    MultiStreamMonitor.step.  Reports sustained stream-frames/sec, batch
    staleness rate, and per-stream drop totals.

    ``--height/--width`` shrink the fixture for CPU smoke runs; the TPU
    figure uses the default 1080p."""
    import jax
    import jax.numpy as jnp

    from respmon_tpu.config import MonitorConfig
    from respmon_tpu.io.synthetic import breathing_clip
    from respmon_tpu.parallel import streams as fleet
    from respmon_tpu.pipeline import evm, motion
    from respmon_tpu.runtime.fleet_feeder import FleetFeeder

    _warmup()
    fps_video = 10.0
    H, W = height, width
    cfg = MonitorConfig(motion_extraction_method="flow")

    log(f"1080p-class locate for the fleet ROI ({H}x{W})...")
    cal = breathing_clip(num_frames=cfg.calibration.buffer_length, height=H,
                         width=W, fps=fps_video, bpm=18.0,
                         patch_center=(H // 2, W // 2),
                         patch_size=(H // 6, W // 9), amplitude=0.12,
                         motion_px=3.0)
    cal_u8 = np.clip(np.round(cal * 255.0), 0, 255).astype(np.uint8)
    del cal
    loc = evm.locate(jnp.asarray(cal_u8), fps_video, cfg.calibration)
    assert bool(loc.found)
    x, y, w, h = int(loc.x), int(loc.y), int(loc.w), int(loc.h)
    log(f"roi: {(x, y, w, h)}")

    mon = fleet.MultiStreamMonitor(cfg, mesh=None, frame_hw=(H, W),
                                   fps=fps_video)
    boxes = np.tile(np.asarray([[x, y, w, h]], np.int32), (streams, 1))
    spec = motion.MeasureSpec.for_roi(cfg, H, W, w, h, fps_video)
    import dataclasses as _dc
    mon.spec = _dc.replace(
        spec, lk_sample=fleet.fleet_lk_sample(cfg, spec.crop_h,
                                              spec.crop_w, streams),
        lk_prev_sample=fleet.fleet_lk_prev_sample(cfg))
    mon.states = fleet.init_stream_states(mon.spec, boxes)
    log(f"crop bucket {mon.spec.crop_h}x{mon.spec.crop_w}, "
        f"lk_sample={mon.spec.lk_sample}")

    # Per-stream u8 source clips: the calibration frame translates ±1 px
    # per frame (real tracking work), per-stream phase offsets.
    t_total = min(measure_frames, 16)   # cycled; small host footprint
    log(f"staging {streams} x {t_total} synthetic {H}x{W} u8 frames...")
    base = cal_u8[-1]

    def stream_frames(s):
        out = np.empty((t_total, H, W), np.uint8)
        for i in range(t_total):
            out[i] = np.roll(base, (s + i) % 3 - 1, axis=1)
        return out

    class CyclingSlowSource:
        """Loops a small frame set forever with simulated decode cost, so
        the sources cannot exhaust while the fleet step compiles."""

        def __init__(self, frames, delay_s):
            self._frames, self._delay, self._i = frames, delay_s, 0
            self.fps = fps_video
            self.height, self.width = frames.shape[1:]

        def next_frame(self):
            f = self._frames[self._i % self._frames.shape[0]]
            self._i += 1
            if self._delay:
                time.sleep(self._delay)
            return f

        def is_open(self):
            return True

        def release(self):
            pass

    # Compile BOTH fleet-step programs from staged batches BEFORE starting
    # the feeder: compile takes minutes on a cold client, and the timing
    # window must not start with a compile stall.
    log("compiling fleet step (staged warmup batches)...")
    warm0 = np.stack([np.roll(base, s % 3 - 1, axis=1)
                      for s in range(streams)])
    warm1 = np.stack([np.roll(base, (s + 1) % 3 - 1, axis=1)
                      for s in range(streams)])
    np.asarray(mon.step(jnp.asarray(warm0)).samples)   # init program
    np.asarray(mon.step(jnp.asarray(warm1)).samples)   # steady-state

    feeder = FleetFeeder(
        [CyclingSlowSource(stream_frames(s), capture_ms * 1e-3)
         for s in range(streams)],
        capacity=4, lossless=False, dtype=np.uint8).start()

    ticks = 0
    stale_rows = 0
    t0 = time.time()
    last = None
    for _ in range(measure_frames):
        b = feeder.next_batch(timeout=30.0)
        if b is None:
            break
        last = mon.step(jnp.asarray(b.frames)).samples
        ticks += 1
        stale_rows += int(b.stale.sum())
    if last is not None:
        np.asarray(last)
    wall = time.time() - t0
    feeder.stop()

    # Headline counts FRESH rows only: a live tick proceeds once ANY
    # stream has a new frame, so stale repeated rows are not ingest
    # throughput (the tick rate is reported separately).
    fresh_rows = ticks * streams - stale_rows
    sfps = fresh_rows / wall if wall > 0 else float("nan")
    tick_rate = ticks / wall if wall > 0 else float("nan")
    stale_rate = stale_rows / max(ticks * streams, 1)
    dropped = feeder.dropped
    log(f"fleet-live: {ticks} lockstep ticks ({tick_rate:.1f}/s) in "
        f"{wall:.2f}s -> {sfps:.0f} FRESH stream-frames/sec sustained; "
        f"stale rate {stale_rate:.2%}; dropped/stream min={dropped.min()} "
        f"max={dropped.max()}")
    print(json.dumps({
        "metric": f"fleet_live_{streams}x{H}p_sustained",
        "value": round(sfps, 1),
        "unit": "fresh stream-frames/sec (feeder + u8 upload + fused step)",
        "vs_baseline": round(sfps / REFERENCE_BEST_FPS, 1),
        "ticks": ticks,
        "tick_rate_hz": round(tick_rate, 2),
        "stale_rate": round(stale_rate, 4),
        "dropped_total": int(dropped.sum()),
        "simulated_capture_ms": capture_ms,
    }))


def main_recovery(cycles: int = 3, error_reset_delay: float = 0.5,
                  height: int = 480, width: int = 640,
                  smoke: bool = False, streaming_roi: bool = False):
    """Error-recovery soak ON DEVICE (VERDICT r3 #6): drive the full
    RespiratoryMonitor state machine — calibrate → measure → blackout fault
    → NaN detection → error → reset → recalibrate — ``cycles`` times on the
    real backend, and report recovery latency.

    The CPU suite exercises this loop under the conftest
    (tests/test_streaming_checkpoint_faults.py, tests/test_monitor.py), but
    the repo's own history says jit/TPU-only semantics bugs exist (the u8
    widen, the bf16 gaussfit flips) — this soak is the driver-visible
    evidence the recovery subsystem works compiled on TPU.

    Method: an adaptive capture serves phase-continuous breathing frames
    (bpm 18.75 → an exactly 32-frame period at fps 10, so the pool cycles
    without a phase jump, reference fixture otherwise identical to the
    headline clip) and switches to blackout frames once the monitor has
    produced 8 BPM samples in the cycle; blackout kills the LK texture →
    NaN sample → ``detect_errors`` → error state (base.py:543-545
    semantics).  Good frames resume immediately so the post-reset
    recalibration sees a live subject.  Recovery latency = wall time from
    the error transition to the first BPM estimate of the next cycle
    (includes the ``error_reset_delay`` wait, the 128-frame recalibration
    + fused locate, measurement restart, and the >12-sample BPM warmup).
    """
    import jax.numpy as jnp

    from respmon_tpu.config import MonitorConfig
    from respmon_tpu.io.synthetic import breathing_clip
    from respmon_tpu.runtime.monitor import RespiratoryMonitor

    _warmup()
    fps_video, true_bpm = 10.0, 18.75      # 32-frame period at 10 fps
    log("generating phase-periodic frame pool...")
    pool = breathing_clip(num_frames=320, height=height, width=width,
                          fps=fps_video, bpm=true_bpm,
                          patch_center=(height // 2, width // 2),
                          patch_size=(min(80, height // 3),
                                      min(100, width // 3)),
                          amplitude=0.12, motion_px=2.0,
                          texture_motion=True)
    black = np.zeros_like(pool[0])

    class AdaptiveSource:
        """Serves good breathing frames or blackouts, driver-controlled.

        Frames are RATE-LIMITED to the video fps: a camera delivers 10
        frames per second, so recovery phases that consume frames (the
        cold path's 128-frame buffer refill, the warm path's localize
        retries) cost real wall time here exactly as deployed.  A
        free-running source (r4's soak) made the cold refill nearly free
        and measured only dispatch/fetch latency."""

        def __init__(self):
            self.fps = fps_video
            self.height, self.width = pool.shape[1:]
            self.mode = "good"
            self.idx = 0          # advances only on good frames: phase
            self.open = True      # stays continuous across blackouts
            self._last = 0.0

        def next_frame(self):
            if not self.open:
                return None
            wait = self._last + 1.0 / self.fps - time.time()
            if wait > 0:
                time.sleep(wait)
            self._last = time.time()
            if self.mode == "black":
                return black
            f = pool[self.idx % len(pool)]
            self.idx += 1
            return f

        def is_open(self):
            return self.open

        def release(self):
            self.open = False

    src = AdaptiveSource()
    if smoke:   # CPU-affordable geometry for logic smoke tests
        from respmon_tpu.config import CalibrationConfig
        cfg = MonitorConfig(
            motion_extraction_method="flow",
            calibration=CalibrationConfig(buffer_length=64,
                                          pyramid_levels=5,
                                          skip_levels_at_top=2))
    else:
        cfg = MonitorConfig(motion_extraction_method="flow")
    if streaming_roi:
        # Warm-recovery variant (VERDICT r4 #5): the rolling pyramid rings
        # stay warm through the error state, so the post-reset calibration
        # localizes from the rings instead of refilling buffer_length
        # fresh frames (runtime/monitor._warm_calibration_step).
        import dataclasses
        cfg = dataclasses.replace(cfg, streaming_roi=True)
    mon = RespiratoryMonitor(
        capture_target="recovery-soak", capture=src, config=cfg,
        motion_extraction_method="flow", visualize=None,
        save_all_data=False, auto_run=False, sync_fps=False,
        error_reset_delay=error_reset_delay, use_feeder=False)
    mon.fps = fps_video

    transitions = []
    latencies, compute_latencies, bpm_tails = [], [], []
    last_state = mon.state
    t_err = None
    bpm_count_at_reset = 0
    t_start = time.time()
    log(f"soaking {cycles} fault/recovery cycles "
        f"(error_reset_delay={error_reset_delay}s)...")
    while len(latencies) < cycles and time.time() - t_start < 1800:
        assert mon.step(), "capture closed unexpectedly"
        if mon.state != last_state:
            now = time.time()
            log(f"  -> {mon.state} (prev phase "
                f"{now - getattr(main_recovery, '_tt', now):.2f}s)")
            main_recovery._tt = now
            transitions.append(mon.state)
            if mon.state == "error":
                t_err = time.time()
                bpm_tails.append(float(np.median(list(mon.freq)[-8:]))
                                 if mon.freq else float("nan"))
                src.mode = "good"   # recalibration needs a live subject
                log(f"cycle {len(latencies)}: error detected "
                    f"({mon.error_message!r}), pre-fault BPM tail "
                    f"{bpm_tails[-1]:.2f}")
            last_state = mon.state
        if mon.state == "measure" and t_err is not None \
                and len(mon.freq) > 0:
            lat = time.time() - t_err
            latencies.append(lat)
            compute_latencies.append(lat - error_reset_delay)
            log(f"cycle {len(latencies) - 1}: recovered in {lat:.2f}s "
                f"(compute {lat - error_reset_delay:.2f}s), "
                f"BPM {mon.freq[-1]:.2f}")
            t_err = None
        if mon.state == "measure" and t_err is None \
                and len(mon.freq) >= 8 and src.mode == "good":
            src.mode = "black"      # inject the next fault

    assert len(latencies) == cycles, \
        f"only {len(latencies)}/{cycles} recoveries in 30 min"
    # State-sequence parity: each cycle must be error → (initialize is
    # internal to reset()) → calibration → measure, matching the CPU-path
    # recovery tests and base.py:496-500.
    want = ["error", "calibration", "measure"] * cycles
    got = [s for s in transitions if s in ("error", "calibration",
                                           "measure")]
    # The run starts mid-calibration: drop the leading calibration→measure
    # pair of cycle 0 before comparing.
    while got and got[0] != "error":
        got.pop(0)
    assert got[:len(want)] == want, f"state sequence {got} != {want}"
    tails = [b for b in bpm_tails if b == b]
    print(json.dumps({
        "metric": f"error_recovery_soak_{width}x{height}"
                  + ("_warm_streaming" if streaming_roi else ""),
        "streaming_roi": streaming_roi,
        "relocks": mon.relocks,
        "value": round(float(np.mean(latencies)), 2),
        "unit": "s mean recovery latency (error->first BPM)",
        "vs_baseline": round(
            (error_reset_delay
             + (cfg.calibration.buffer_length + 13) / fps_video)
            / float(np.mean(latencies)), 1),
        "cycles": cycles,
        "max_latency_s": round(float(np.max(latencies)), 2),
        "compute_latency_s": round(float(np.mean(compute_latencies)), 2),
        "error_reset_delay_s": error_reset_delay,
        "pre_fault_bpm_tail_median": round(float(np.median(tails)), 2)
        if tails else None,
        "bpm_true": true_bpm,
        "state_sequence_ok": True,
    }))


def main_streaming(reps_absorb: int = 32, reps_update: int = 6):
    """Device cost of the streaming (incremental) EVM calibrator
    (VERDICT r3 #4): ms/frame for ``streaming_absorb`` (the every-frame
    rolling-pyramid half) and ms for ``streaming_update`` (the full
    re-localize, paid every ``streaming_interval`` frames), at 640x480 and
    1080p.  Timed as in-jit scans over per-iteration-distinct frames with
    a dependent host fetch (BENCHMARKS.md methodology), so the numbers are
    device compute, not the tunnel's ~26 ms dispatch floor; the amortized
    per-frame figure at the default interval is what the monitor's
    streaming-ROI mode adds to its measure step."""
    import jax
    import jax.numpy as jnp

    from respmon_tpu.config import MonitorConfig
    from respmon_tpu.io.synthetic import breathing_clip
    from respmon_tpu.pipeline import streaming

    _warmup()
    cfg = MonitorConfig()
    cal = cfg.calibration
    interval = cfg.streaming_interval
    fps_video = 10.0
    out = {"metric": "streaming_calibrator_device_costs",
           "unit": "ms (device, in-jit scan amortized)",
           "interval": interval}

    for name, (h, w) in [("640x480", (480, 640)),
                         ("1080p", (1080, 1920))]:
        log(f"--- {name} ---")
        total = cal.buffer_length + max(reps_absorb, reps_update)
        clip = breathing_clip(num_frames=total, height=h, width=w,
                              fps=fps_video, bpm=18.0,
                              patch_center=(h // 2, w // 2),
                              patch_size=(h // 6, w // 6), amplitude=0.12,
                              motion_px=2.0, texture_motion=True,
                              drift_px=(10.0, 16.0))
        buf = jnp.asarray(clip[:cal.buffer_length])
        rest = jnp.asarray(clip[cal.buffer_length:])
        state = streaming.init_streaming_from_buffer(buf, cal)
        jax.block_until_ready(state.count)

        @jax.jit
        def absorb_k(st, frames, eps):
            def body(s, f):
                s2 = streaming.streaming_absorb(s, f + eps, cal)
                return s2, s2.levels[-1][-1, 0, 0]
            st2, probes = jax.lax.scan(body, st, frames)
            return st2, jnp.sum(probes)

        @jax.jit
        def update_k(st, frames, eps):
            def body(s, f):
                s2, res = streaming.streaming_update(s, f + eps, fps_video,
                                                     cal)
                return s2, (res.found, res.x, res.y)
            st2, (found, xs, ys) = jax.lax.scan(body, st, frames)
            return st2, jnp.sum(xs) + jnp.sum(ys) + jnp.sum(found)

        @jax.jit
        def update_coarse_k(st, frames, eps):
            def body(s, f):
                s2, res = streaming.streaming_update(s, f + eps, fps_video,
                                                     cal, coarse=True)
                return s2, (res.found, res.x, res.y)
            st2, (found, xs, ys) = jax.lax.scan(body, st, frames)
            return st2, jnp.sum(xs) + jnp.sum(ys) + jnp.sum(found)

        # compile (excluded)
        zero = jnp.float32(0.0)
        _, probe = absorb_k(state, rest[:reps_absorb], zero)
        float(probe)
        _, probe = update_k(state, rest[:reps_update], zero)
        float(probe)
        _, probe = update_coarse_k(state, rest[:reps_update], zero)
        float(probe)

        def run_absorb(i):
            _, probe = absorb_k(state, rest[:reps_absorb],
                                jnp.float32((i + 1) * 1e-6))
            return probe

        def run_update(i):
            _, probe = update_k(state, rest[:reps_update],
                                jnp.float32((i + 1) * 1e-6))
            return probe

        def run_update_coarse(i):
            _, probe = update_coarse_k(state, rest[:reps_update],
                                       jnp.float32((i + 1) * 1e-6))
            return probe

        absorb_ms = _timed(run_absorb, 3) / reps_absorb * 1e3
        update_ms = _timed(run_update, 3) / reps_update * 1e3
        coarse_ms = _timed(run_update_coarse, 3) / reps_update * 1e3
        amort_ms = ((interval - 1) * absorb_ms + update_ms) / interval
        amort_c = ((interval - 1) * absorb_ms + coarse_ms) / interval
        log(f"{name}: absorb {absorb_ms:.2f} ms/frame, update "
            f"{update_ms:.1f} ms (coarse {coarse_ms:.2f} ms), amortized "
            f"{amort_ms:.2f} ms/frame (coarse {amort_c:.2f}) "
            f"at interval {interval} "
            f"({1e3 / (amort_ms * fps_video):.0f}x real-time at "
            f"{fps_video:.0f} fps)")
        key = name.replace("x", "_")
        out[f"absorb_ms_{key}"] = round(absorb_ms, 2)
        out[f"update_ms_{key}"] = round(update_ms, 1)
        out[f"update_coarse_ms_{key}"] = round(coarse_ms, 2)
        out[f"amortized_ms_per_frame_{key}"] = round(amort_ms, 2)
        out[f"amortized_coarse_ms_per_frame_{key}"] = round(amort_c, 2)
        out[f"realtime_x_{key}"] = round(1e3 / (amort_ms * fps_video), 1)
        del clip, buf, rest, state

    out["value"] = out["amortized_ms_per_frame_640_480"]
    out["vs_baseline"] = out["realtime_x_640_480"]
    print(json.dumps(out))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--multistream", action="store_true",
                   help="benchmark 64-stream 1080p lockstep monitoring "
                        "(BASELINE.md config 5) instead of the headline")
    p.add_argument("--streams", type=int, default=None,
                   help="fleet size (default: 64 for --multistream/"
                        "--breakdown, 16 for --fleet-live)")
    p.add_argument("--breakdown", action="store_true",
                   help="per-stage breakdown of the fleet step")
    p.add_argument("--live", action="store_true",
                   help="sustained live-path throughput through the "
                        "FrameFeeder (lossless), incl. uint8-upload mode")
    p.add_argument("--fleet-live", action="store_true",
                   help="sustained PRODUCTION fleet loop: FleetFeeder "
                        "(u8 rings) -> fused upload -> lockstep step")
    p.add_argument("--frames", type=int, default=256,
                   help="--live/--fleet-live: number of measured frames")
    p.add_argument("--capture-ms", type=float, default=15.0,
                   help="--live/--fleet-live: simulated per-frame decode "
                        "cost")
    p.add_argument("--height", type=int, default=1080,
                   help="--fleet-live: frame height (shrink for CPU smoke)")
    p.add_argument("--width", type=int, default=1920,
                   help="--fleet-live: frame width")
    p.add_argument("--no-fleet", action="store_true",
                   help="headline: skip the compact 16x720p fleet segment")
    p.add_argument("--streaming", action="store_true",
                   help="device cost of the streaming EVM calibrator "
                        "(absorb/update ms at 640x480 and 1080p)")
    p.add_argument("--recovery", action="store_true",
                   help="soak the calibrate->measure->error->recalibrate "
                        "loop on device with blackout fault injection")
    p.add_argument("--cycles", type=int, default=3,
                   help="--recovery: number of fault/recovery cycles")
    p.add_argument("--warm", action="store_true",
                   help="--recovery: streaming-ring warm recovery variant "
                        "(config.streaming_roi on; rings survive the error "
                        "state so recalibration skips the buffer refill)")
    p.add_argument("--fleet-refine", action="store_true",
                   help="--multistream: run the fleet in the ACCURACY tier "
                        "(fleet_f64_refine on — emulated-f64 wild-fit "
                        "refinement inside the lockstep step)")
    p.add_argument("--bpm-corpus", action="store_true",
                   help="end-to-end BPM decision envelope: device f32 "
                        "estimator vs the scipy-f64 golden chain over a "
                        "synthetic trace corpus")
    p.add_argument("--traces", type=int, default=120,
                   help="--bpm-corpus: number of corpus traces")
    p.add_argument("--out", type=str, default=None,
                   help="--bpm-corpus: also write the JSON artifact here")
    args = p.parse_args()
    _enable_compile_cache()
    if args.bpm_corpus:
        main_bpm_corpus(n_traces=args.traces, out_path=args.out)
    elif args.recovery:
        main_recovery(cycles=args.cycles, streaming_roi=args.warm)
    elif args.streaming:
        main_streaming()
    elif args.breakdown:
        main_fleet_breakdown(args.streams or 64)
    elif args.fleet_live:
        main_fleet_live(streams=args.streams or 16,
                        measure_frames=args.frames,
                        capture_ms=args.capture_ms, height=args.height,
                        width=args.width)
    elif args.live:
        main_live(args.frames, args.capture_ms)
    elif args.multistream:
        main_multistream(args.streams or 64, fleet_refine=args.fleet_refine)
    else:
        main_headline(include_fleet=not args.no_fleet)


if __name__ == "__main__":
    main()
