"""Butterworth design/response exploration (reference prototypes/filter.py
analog): prints filter coefficients and -3 dB points for the pipeline's
lowpass/bandpass designs and applies them to a trace."""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fps", type=float, default=10.0)
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp
    import scipy.signal as sps

    from respmon_tpu.io.synthetic import motion_trace
    from respmon_tpu.ops import filters

    fps = args.fps
    designs = {
        "lowpass o3 @ 0.5 Hz (BPM path)":
            filters.design_butter_lowpass(0.5, fps, 3),
        "bandpass o6 0.1-1.0 Hz (EVM IIR alt, SOS)":
            filters.design_butter_bandpass_sos(0.1, 1.0, fps, 6),
    }
    t, y = motion_trace(num_samples=256, fps=fps, bpm=18.0, noise=0.3)
    for name, c in designs.items():
        if isinstance(c, filters.SOSCoeffs):
            sos = np.asarray(c.sections)
            w, h = sps.sosfreqz(sos, fs=fps)
            out = np.asarray(filters.sosfilt(c, jnp.asarray(y)))
            order = 2 * len(c.sections)
        else:
            w, h = sps.freqz(np.asarray(c.b), np.asarray(c.a), fs=fps)
            out = np.asarray(filters.lfilter(c, jnp.asarray(y)))
            order = c.order
        mag = 20 * np.log10(np.maximum(np.abs(h), 1e-12))
        f3 = w[np.argmin(np.abs(mag + 3.0))]
        print(f"{name}: order={order}, approx -3dB @ {f3:.3f} Hz, "
              f"out std={out.std():.3f} (in {y.std():.3f})")
        if args.plot:
            import matplotlib.pyplot as plt

            plt.plot(w, mag, label=name)
    if args.plot:
        import matplotlib.pyplot as plt

        plt.ylim(-60, 3)
        plt.legend()
        plt.xlabel("Hz")
        plt.ylabel("dB")
        plt.show()


if __name__ == "__main__":
    main()
