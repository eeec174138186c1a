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
    # component's bbox matches cv2's pick (exact contourArea ranking).
    rng = np.random.default_rng(100 + seed)
    img = (rng.random((40, 50)) < 0.35).astype(np.uint8) * 255
    # Dilate once so components are blob-like (as EVM heatmaps are).
    img = cv2.dilate(img, np.ones((3, 3), np.uint8))
    want = _cv2_bbox(img)
    got = ccl.largest_component_bbox(jnp.asarray(img > 0))
    if want is not None:
        assert (int(got.x), int(got.y), int(got.w), int(got.h)) == want


def _cv2_max_area(binary_u8):
    found = cv2.findContours(binary_u8, cv2.RETR_EXTERNAL,
                             cv2.CHAIN_APPROX_SIMPLE)
    contours = found[0] if len(found) == 2 else found[1]
    return max((cv2.contourArea(c) for c in contours), default=None)


# --- adversarial ranking: cases where pixel-count (and the round-1 Pick
# --- estimate) disagree with cv2.contourArea.

def test_thin_l_loses_to_compact_blob():
    # A 1-px-thick L has ~40 pixels but cv2.contourArea ~0 (the contour
    # traces out-and-back, enclosing nothing); a 4x4 blob (16 px, area 9)
    # must win.  Pixel-count and Pick (N - B/2 - 1 = 18.5) both pick the L.
    img = np.zeros((40, 50), np.uint8)
    img[5, 5:30] = 255       # horizontal arm, 25 px
    img[5:20, 5] = 255       # vertical arm, 15 px
    img[30:34, 40:44] = 255  # compact 4x4 blob
    want = _cv2_bbox(img)
    assert want == (40, 30, 4, 4), "cv2 did not pick the blob (fixture bug)"
    got = ccl.largest_component_bbox(jnp.asarray(img > 0))
    assert (int(got.x), int(got.y), int(got.w), int(got.h)) == want
    np.testing.assert_allclose(float(got.area), _cv2_max_area(img))


def test_donut_beats_smaller_solid_blob():
    # RETR_EXTERNAL's outer contour includes the hole: a thin ring with a
    # big hole has small pixel count but large contourArea.  Pixel-count
    # ranking picks the solid blob; cv2 (and we) pick the ring.
    img = np.zeros((40, 60), np.uint8)
    img[5:25, 5:25] = 255    # ring: 20x20 outer ...
    img[8:22, 8:22] = 0      # ... with a 14x14 hole (204 px, area ~361)
    img[10:26, 35:51] = 255  # solid 16x16 blob (256 px, area 225)
    want = _cv2_bbox(img)
    assert want == (5, 5, 20, 20), "cv2 did not pick the ring (fixture bug)"
    got = ccl.largest_component_bbox(jnp.asarray(img > 0))
    assert (int(got.x), int(got.y), int(got.w), int(got.h)) == want
    np.testing.assert_allclose(float(got.area), _cv2_max_area(img))


def test_diagonal_staircase_loses_to_blob():
    # An 8-connected diagonal staircase: many pixels, ~zero enclosed area.
    img = np.zeros((40, 50), np.uint8)
    for i in range(30):
        img[i, i] = 255
    img[33:38, 10:15] = 255  # 5x5 blob, area 16
    want = _cv2_bbox(img)
    assert want == (10, 33, 5, 5), "cv2 did not pick the blob (fixture bug)"
    got = ccl.largest_component_bbox(jnp.asarray(img > 0))
    assert (int(got.x), int(got.y), int(got.w), int(got.h)) == want


def test_component_nested_in_hole_is_invisible():
    # RETR_EXTERNAL: a blob inside another component's hole is not a
    # candidate, and the enclosing ring's area includes the hole.
    img = np.zeros((30, 30), np.uint8)
    img[2:28, 2:28] = 255
    img[5:25, 5:25] = 0      # hole
    img[10:20, 10:20] = 255  # nested blob inside the hole
    want = _cv2_bbox(img)
    assert want == (2, 2, 26, 26)
    got = ccl.largest_component_bbox(jnp.asarray(img > 0))
    assert (int(got.x), int(got.y), int(got.w), int(got.h)) == want
    np.testing.assert_allclose(float(got.area), _cv2_max_area(img))


@pytest.mark.parametrize("seed", range(8))
def test_raw_noise_exact_area_ranking_matches_cv2(seed):
    # UN-dilated sparse noise: full of thin/degenerate shapes, the regime
    # where the round-1 Pick estimate diverged.  Compare the winner whenever
    # cv2's maximum is unique (max() tie-breaks by findContours order, which
    # is not worth reproducing).
    rng = np.random.default_rng(200 + seed)
    img = (rng.random((36, 44)) < 0.25).astype(np.uint8) * 255
    found = cv2.findContours(img, cv2.RETR_EXTERNAL,
                             cv2.CHAIN_APPROX_SIMPLE)
    contours = found[0] if len(found) == 2 else found[1]
    areas = sorted((cv2.contourArea(c) for c in contours), reverse=True)
    if len(areas) >= 2 and areas[0] == areas[1]:
        pytest.skip("tied maximum — ranking ambiguous in cv2 itself")
    want = _cv2_bbox(img)
    got = ccl.largest_component_bbox(jnp.asarray(img > 0))
    assert (int(got.x), int(got.y), int(got.w), int(got.h)) == want
    np.testing.assert_allclose(float(got.area), areas[0])
