"""Offline peak/BPM pipeline on a recorded motion trace (reference
prototypes/signal_measurement.py analog): loads a ``<target>.npy`` written
by the monitor's session recorder and re-runs the estimation stage."""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace", nargs="?",
                    help="(t, motion) .npy from a session "
                         "(default: synthetic 18 BPM)")
    ap.add_argument("--fps", type=float, default=10.0)
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from respmon_tpu.config import MeasureConfig
    from respmon_tpu.io.synthetic import motion_trace
    from respmon_tpu.ops import filters
    from respmon_tpu.pipeline import bpm as bpm_mod

    if args.trace:
        data = np.load(args.trace)
        t, y = data[:, 0], data[:, 1]
        fps = args.fps
    else:
        fps = args.fps
        t, y = motion_trace(num_samples=128, fps=fps, bpm=18.0)

    n = 128
    count = min(len(y), n)
    yp = np.zeros(n)
    tp = np.zeros(n)
    yp[n - count:] = y[-count:]
    tp[n - count:] = t[-count:]

    cfg = MeasureConfig()
    coeffs = filters.design_butter_lowpass(0.5, fps, cfg.filter_order)
    res = bpm_mod.estimate_bpm_jit(jnp.asarray(yp), jnp.asarray(tp),
                                   jnp.asarray(count), coeffs,
                                   int(np.floor(fps)), cfg)
    print(f"samples: {count}")
    print(f"accepted peaks: {int(res.peak_count)}")
    print(f"BPM: {float(res.bpm) if bool(res.has_bpm) else None}")

    if args.plot:
        import matplotlib.pyplot as plt

        filt = np.asarray(res.filtered)[n - count:]
        plt.plot(tp[n - count:], yp[n - count:], label="raw")
        plt.plot(tp[n - count:], filt, label="filtered")
        acc = np.asarray(res.accept_mask)
        idxs = np.asarray(res.cand_idx)[acc]
        plt.scatter(tp[idxs], np.asarray(res.filtered)[idxs], c="r",
                    label="peaks")
        plt.legend()
        plt.show()


if __name__ == "__main__":
    main()
