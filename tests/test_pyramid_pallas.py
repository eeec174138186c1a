"""Parity tests for the fused Pallas pyramid kernel (interpret mode on CPU;
the same kernel compiles on TPU where it was verified bit-exact vs XLA)."""

import numpy as np
import pytest

import jax.numpy as jnp

from respmon_tpu.ops import pyramid
from respmon_tpu.ops.pyramid_pallas import (laplacian_band_levels,
                                            laplacian_band_levels_mm)


@pytest.mark.parametrize("shape,levels,skip", [
    ((3, 120, 160), 6, 2),
    ((2, 480, 640), 9, 4),   # production geometry (odd tiny levels)
    ((2, 60, 80), 4, 1),
])
def test_band_levels_match_xla(shape, levels, skip):
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.random(shape), jnp.float32)
    got = laplacian_band_levels(vid, levels, skip, interpret=True)
    lap = pyramid.laplacian_pyramid(vid, levels)
    kept = list(range(skip, levels - 1))
    assert len(got) == len(kept)
    for slot, lvl in enumerate(kept):
        np.testing.assert_allclose(np.asarray(got[slot]),
                                   np.asarray(lap[lvl]),
                                   rtol=0, atol=1e-6)


def test_matmul_variant_matches_xla():
    rng = np.random.default_rng(1)
    vid = jnp.asarray(rng.random((2, 120, 160)), jnp.float32)
    got = laplacian_band_levels_mm(vid, 6, 2, interpret=True)
    lap = pyramid.laplacian_pyramid(vid, 6)
    for slot, lvl in enumerate(range(2, 5)):
        np.testing.assert_allclose(np.asarray(got[slot]),
                                   np.asarray(lap[lvl]),
                                   rtol=0, atol=1e-5)
