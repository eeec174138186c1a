"""Test configuration: run JAX on CPU with 8 virtual devices and x64 enabled.

Multi-chip sharding tests use the standard JAX trick of faking devices via
``--xla_force_host_platform_device_count`` (SURVEY.md §4).  x64 lets parity
tests compare bit-closely against scipy/cv2 float64 oracles; device code is
dtype-polymorphic so the same kernels run float32 on real TPUs.

Note: this environment's sitecustomize registers a TPU-tunnel PJRT backend
("axon") at interpreter start and pins ``JAX_PLATFORMS=axon``, so the env
var must be overridden via ``jax.config`` *after* import — and XLA_FLAGS
must be set before the first backend-client creation.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", \
    "tests must run on the virtual CPU mesh, not the TPU tunnel"
