"""Parity tests for the fused Pallas pyramid kernel (interpret mode on CPU;
the same kernel compiles on TPU where it was verified bit-exact vs XLA)."""

import numpy as np
import pytest

import jax.numpy as jnp

from respmon_tpu.ops import pyramid
from respmon_tpu.ops.pyramid_pallas import (gauss_level_tiled,
                                            laplacian_band_levels,
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


@pytest.mark.parametrize("shape,s1,nt", [
    ((2, 135, 192), 1, 2),   # odd H (mid-pyramid odd sizes)
    ((2, 135, 192), 2, 2),
    ((2, 135, 192), 2, 4),   # minimum strip width (wt == 4*2^s1)
    ((3, 67, 256), 1, 4),
    ((2, 68, 240), 2, 3),    # nt that is not a power of two
])
def test_gauss_level_tiled_bit_exact(shape, s1, nt):
    # The W-strip tiled stage-1 kernel computes the same stencils in the
    # same order as the XLA Gaussian pyramid (edge strips own the true
    # reflect-101 border; halos absorb strip-edge contamination); tolerance
    # covers jit-vs-eager FMA fusion (1 ULP), as in the fused-kernel tests.
    rng = np.random.default_rng(2)
    vid = jnp.asarray(rng.random(shape), jnp.float32)
    got = gauss_level_tiled(vid, s1, nt, interpret=True)
    want = pyramid.gaussian_pyramid(vid, s1 + 1)[s1]
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)


def test_two_stage_composition_matches_xla():
    # gauss_level_tiled + fused band kernel == whole-video XLA Laplacian
    # levels (the 1080p production path in miniature).
    rng = np.random.default_rng(3)
    vid = jnp.asarray(rng.random((2, 135, 192)), jnp.float32)
    levels, skip, s1, nt = 7, 3, 2, 2
    g = gauss_level_tiled(vid, s1, nt, interpret=True)
    got = laplacian_band_levels(g, levels - s1, skip - s1, interpret=True)
    lap = pyramid.laplacian_pyramid(vid, levels)
    kept = list(range(skip, levels - 1))
    assert len(got) == len(kept)
    for slot, lvl in enumerate(kept):
        np.testing.assert_allclose(np.asarray(got[slot]),
                                   np.asarray(lap[lvl]), rtol=0, atol=1e-6)


def test_tiled_plan_geometry():
    from respmon_tpu.pipeline.evm import (_FUSED_VMEM_BUDGET,
                                          _fused_footprint_bytes, _tiled_plan)

    # 1080p f32 exceeds the single-kernel budget and splits as (s1=1, nt=2).
    assert _fused_footprint_bytes(1080, 1920, 4) >= _FUSED_VMEM_BUDGET
    assert _tiled_plan(1080, 1920, 4, skip_top=4) == (1, 2)
    # 4K needs a deeper stage 1 and more strips.
    plan4k = _tiled_plan(2160, 3840, 4, skip_top=4)
    assert plan4k is not None
    s1, nt = plan4k
    assert _fused_footprint_bytes(*pyramid.pyramid_shapes(
        2160, 3840, s1 + 1)[s1], 4) < _FUSED_VMEM_BUDGET
    # A prime width can't split: the caller falls back to XLA.
    assert _tiled_plan(1080, 1913, 4, skip_top=4) is None


def test_matmul_variant_matches_xla():
    rng = np.random.default_rng(1)
    vid = jnp.asarray(rng.random((2, 120, 160)), jnp.float32)
    got = laplacian_band_levels_mm(vid, 6, 2, interpret=True)
    lap = pyramid.laplacian_pyramid(vid, 6)
    for slot, lvl in enumerate(range(2, 5)):
        np.testing.assert_allclose(np.asarray(got[slot]),
                                   np.asarray(lap[lvl]),
                                   rtol=0, atol=1e-5)
