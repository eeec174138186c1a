"""Parity tests: pyramid ops vs cv2 (reference pyramid.py:9-69)."""

import numpy as np
import pytest

import jax.numpy as jnp

from respmon_tpu.ops import pyramid
from tests.golden import reference_numpy as golden


cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("shape", [(480, 640), (15, 20), (8, 10), (5, 7),
                                   (2, 3), (64, 64)])
def test_pyr_down_matches_cv2(rng, shape):
    img = rng.random(shape)
    got = np.asarray(pyramid.pyr_down(jnp.asarray(img)))
    want = cv2.pyrDown(img)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("src,dst", [
    ((240, 320), (480, 640)),
    ((8, 10), (15, 20)),     # odd dst (reference's tiny levels)
    ((4, 5), (8, 10)),
    ((2, 3), (4, 5)),
    ((3, 3), (5, 5)),
])
def test_pyr_up_matches_cv2(rng, src, dst):
    img = rng.random(src)
    got = np.asarray(pyramid.pyr_up(jnp.asarray(img), dst))
    want = cv2.pyrUp(img, dstsize=(dst[1], dst[0]))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_laplacian_pyramid_matches_reference(rng):
    img = rng.random((120, 160))
    got = pyramid.laplacian_pyramid(jnp.asarray(img), 5)
    want = golden.laplacian_pyramid(img, 5)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-11, atol=1e-11)


def test_video_pyramid_batches_over_time(rng):
    vid = rng.random((4, 60, 80))
    got = pyramid.laplacian_pyramid(jnp.asarray(vid), 4)
    want = golden.laplacian_video_pyramid(vid, 4)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-11, atol=1e-11)


def test_collapse_matches_reference(rng):
    vid = rng.random((3, 48, 64))
    lap = pyramid.laplacian_pyramid(jnp.asarray(vid), 4)
    got = np.asarray(pyramid.collapse_laplacian_pyramid(lap))
    want = golden.collapse_laplacian_video_pyramid(
        [np.asarray(l) for l in lap])
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)
    # A Laplacian collapse reconstructs the original video.
    np.testing.assert_allclose(got, vid, rtol=1e-9, atol=1e-10)


def test_nine_level_shapes_640x480():
    # The production configuration (reference base.py:548-551): 9 levels on
    # 480x640 reaches a 2x3 top.
    shapes = pyramid.pyramid_shapes(480, 640, 9)
    assert shapes[0] == (480, 640)
    assert shapes[-1] == (2, 3)
    vid = np.zeros((2, 480, 640))
    lap = pyramid.laplacian_pyramid(jnp.asarray(vid), 9)
    assert [l.shape[-2:] for l in lap] == shapes
