"""db4 wavelet decomposition / smoothing (reference prototypes/wavelets.py +
transforms.py:121-141 analog), on the JAX implementation."""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=4)
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from respmon_tpu.io.synthetic import motion_trace
    from respmon_tpu.ops import wavelets

    t, y = motion_trace(num_samples=256, fps=10.0, bpm=18.0, noise=0.3)
    ca, cd = wavelets.wavelet_decompose(jnp.asarray(y), args.iterations)
    for lvl, (a, d) in enumerate(zip(ca, cd)):
        print(f"level {lvl + 1}: approx len {a.shape[0]} "
              f"(energy {float(jnp.sum(a ** 2)):.1f}), detail len "
              f"{d.shape[0]} (energy {float(jnp.sum(d ** 2)):.2f})")
    sm = wavelets.wavelet_filter(jnp.asarray(y), iterations=args.iterations)
    print(f"smoothed: corr with noisy input "
          f"{np.corrcoef(np.asarray(sm), y)[0, 1]:.3f}")

    if args.plot:
        import matplotlib.pyplot as plt

        plt.plot(t, y, alpha=0.4, label="raw")
        plt.plot(t, np.asarray(sm), label="db4 smoothed")
        plt.legend()
        plt.show()


if __name__ == "__main__":
    main()
