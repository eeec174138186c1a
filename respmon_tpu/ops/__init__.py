"""Device-side kernels (pure JAX / Pallas) for the respiration pipeline."""
