"""Windowed-FFT BPM estimation on a fixed ROI (reference
prototypes/temporal_analysis.py analog — the approach the reference
abandoned for peak-to-peak intervals; here it works as a cross-check)."""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bpm", type=float, default=18.0)
    ap.add_argument("--frames", type=int, default=256)
    args = ap.parse_args()

    import jax.numpy as jnp

    from respmon_tpu.io.synthetic import breathing_clip
    from respmon_tpu.utils.diagnostics import freq_from_fft, pixel_sum_series

    fps = 10.0
    clip = breathing_clip(num_frames=args.frames, height=60, width=80,
                          fps=fps, bpm=args.bpm, patch_center=(30, 40),
                          patch_size=(16, 20), amplitude=0.2)
    # Fixed ROI over the patch:
    series = pixel_sum_series(jnp.asarray(clip), bounds=(30, 50, 22, 38))
    f = float(freq_from_fft(series - jnp.mean(series), fps))
    print(f"dominant frequency: {f:.4f} Hz -> {f*60:.2f} BPM "
          f"(true {args.bpm})")


if __name__ == "__main__":
    main()
