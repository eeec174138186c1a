"""Multi-kennel fleet monitoring on a device mesh (BASELINE.md config 5).

Runs S synthetic streams with different breathing rates through the
sharded MultiStreamMonitor and prints per-stream BPMs.  On a multi-chip
mesh the stream axis shards across chips with zero collectives."""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--frames", type=int, default=120)
    args = ap.parse_args()

    import jax

    from respmon_tpu.config import CalibrationConfig, MonitorConfig
    from respmon_tpu.io.synthetic import breathing_clip
    from respmon_tpu.parallel.mesh import make_mesh
    from respmon_tpu.parallel.streams import MultiStreamMonitor

    fps = 10.0
    s = args.streams
    ndev = len(jax.devices())
    mesh = make_mesh(axis_sizes=(ndev,), axis_names=("streams",)) \
        if ndev > 1 and s % ndev == 0 else None
    print(f"devices: {ndev}, mesh: {'sharded' if mesh else 'single'}")

    cfg = MonitorConfig(calibration=CalibrationConfig(
        buffer_length=64, pyramid_levels=4, skip_levels_at_top=1))
    # NB: short demo buffers narrow the packed-rfft passband (same math as
    # the reference); 64 frames localizes 12-24 BPM reliably, the production
    # 128-frame buffer covers the full 6-60 BPM band.
    bpms = [12.0 + 3.0 * (i % 5) for i in range(s)]
    clips = np.stack([
        breathing_clip(num_frames=args.frames, height=60, width=80, fps=fps,
                       bpm=bpms[i], patch_center=(30, 40),
                       patch_size=(16, 20), amplitude=0.25, noise=0.002,
                       seed=i)
        for i in range(s)])

    mon = MultiStreamMonitor(cfg, mesh, (60, 80), fps)
    cal_len = cfg.calibration.buffer_length
    loc = mon.calibrate(clips[:, :cal_len])
    print("calibrated:", np.asarray(loc.found).tolist())

    last = np.full(s, np.nan)
    for f in range(cal_len + 1, args.frames):
        res = mon.step(clips[:, f])
        has = np.asarray(res.has_bpm)
        last[has] = np.asarray(res.bpm)[has]

    for i in range(s):
        print(f"stream {i}: true {bpms[i]:5.1f} BPM -> measured "
              f"{last[i]:5.1f}")


if __name__ == "__main__":
    main()
