"""Parity tests: largest-component bbox vs cv2 contours (base.py:566-575)."""

import numpy as np
import pytest

import jax.numpy as jnp

from respmon_tpu.ops import ccl

cv2 = pytest.importorskip("cv2")


def _cv2_bbox(binary_u8):
    found = cv2.findContours(binary_u8, cv2.RETR_EXTERNAL,
                             cv2.CHAIN_APPROX_SIMPLE)
    contours = found[0] if len(found) == 2 else found[1]
    if len(contours) == 0:
        return None
    c = max(contours, key=cv2.contourArea)
    return cv2.boundingRect(c)


def _blobby_image(rng, h=60, w=80, nblobs=4):
    img = np.zeros((h, w), np.uint8)
    for _ in range(nblobs):
        cy, cx = rng.integers(5, h - 5), rng.integers(5, w - 5)
        ry, rx = rng.integers(2, 12), rng.integers(2, 12)
        yy, xx = np.mgrid[0:h, 0:w]
        img |= ((((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) <= 1.0) \
            .astype(np.uint8)
    return img * 255


@pytest.mark.parametrize("seed", range(12))
def test_blobby_images_match_cv2(seed):
    rng = np.random.default_rng(seed)
    img = _blobby_image(rng)
    want = _cv2_bbox(img)
    got = ccl.largest_component_bbox(jnp.asarray(img > 0))
    assert bool(got.found) == (want is not None)
    if want is not None:
        assert (int(got.x), int(got.y), int(got.w), int(got.h)) == want


def test_empty_image():
    got = ccl.largest_component_bbox(jnp.zeros((16, 16), bool))
    assert not bool(got.found)


def test_full_image():
    got = ccl.largest_component_bbox(jnp.ones((8, 12), bool))
    assert bool(got.found)
    assert (int(got.x), int(got.y), int(got.w), int(got.h)) == (0, 0, 12, 8)


def test_diagonal_connectivity_is_8():
    # Two pixels touching only diagonally must be one component
    # (findContours treats white regions as 8-connected).
    img = np.zeros((6, 6), bool)
    img[1, 1] = True
    img[2, 2] = True
    img[4, 4] = True
    lab = np.asarray(ccl.label_components(jnp.asarray(img)))
    assert lab[1, 1] == lab[2, 2]
    assert lab[4, 4] != lab[1, 1]


def test_single_pixel_components():
    img = np.zeros((10, 10), bool)
    img[2, 3] = True
    got = ccl.largest_component_bbox(jnp.asarray(img))
    assert bool(got.found)
    assert (int(got.x), int(got.y), int(got.w), int(got.h)) == (3, 2, 1, 1)


@pytest.mark.parametrize("seed", range(6))
def test_random_noise_matches_cv2_bbox(seed):
    # Dense random noise: many components of odd shapes; verify the selected
    # component's bbox matches cv2's pick (Pick-estimate area ranking).
    rng = np.random.default_rng(100 + seed)
    img = (rng.random((40, 50)) < 0.35).astype(np.uint8) * 255
    # Dilate once so components are blob-like (as EVM heatmaps are).
    img = cv2.dilate(img, np.ones((3, 3), np.uint8))
    want = _cv2_bbox(img)
    got = ccl.largest_component_bbox(jnp.asarray(img > 0))
    if want is not None:
        assert (int(got.x), int(got.y), int(got.w), int(got.h)) == want
