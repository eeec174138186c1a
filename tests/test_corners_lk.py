"""Parity tests: Shi-Tomasi corners + pyramidal LK vs cv2
(reference base.py:91-98, 365-372)."""

import numpy as np
import pytest

import jax.numpy as jnp

from respmon_tpu.ops import corners as corners_mod
from respmon_tpu.ops import lk as lk_mod

cv2 = pytest.importorskip("cv2")

LK_KW = dict(winSize=(15, 15), maxLevel=2,
             criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT,
                       10, 0.03))
GF_KW = dict(maxCorners=100, qualityLevel=0.3, minDistance=7, blockSize=7)


def _texture(seed, h=64, w=80):
    rng = np.random.default_rng(seed)
    img = rng.random((h, w)) * 0.3 + 0.3
    yy, xx = np.mgrid[0:h, 0:w]
    img += 0.2 * np.sin(xx / 3.0) * np.cos(yy / 4.0)
    return np.clip(img * 255, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("seed", range(5))
def test_corner_sets_match_cv2(seed):
    u8 = _texture(seed)
    want = cv2.goodFeaturesToTrack(u8, **GF_KW)
    want_set = set() if want is None else \
        {(int(p[0][0]), int(p[0][1])) for p in want}
    got = corners_mod.good_features_to_track(jnp.asarray(u8, jnp.float32))
    got_set = {(int(x), int(y))
               for x, y in np.asarray(got.pts)[np.asarray(got.valid)]}
    assert got_set == want_set


@pytest.mark.parametrize("offset", [(0, 0), (5, 3), (13, 9), (0, 17),
                                    (24, 0)])
def test_masked_roi_corners_match_cv2_on_subimage(offset):
    # The production path (pipeline/motion.py) detects corners inside a
    # bucketed window where the real ROI sits at an offset and out-of-ROI
    # pixels are zeroed.  cv2 runs on the exact cropped subimage
    # (reference base.py:365-366), so the detected set must equal cv2's,
    # shifted by the ROI offset.
    dy, dx = offset
    crop_h, crop_w = 64, 80
    roi_h, roi_w = 40, 48
    assert dy + roi_h <= crop_h and dx + roi_w <= crop_w
    u8 = _texture(7, h=crop_h, w=crop_w)

    sub = u8[dy:dy + roi_h, dx:dx + roi_w]
    want = cv2.goodFeaturesToTrack(sub, **GF_KW)
    want_set = set() if want is None else \
        {(int(p[0][0]) + dx, int(p[0][1]) + dy) for p in want}
    assert want_set, "fixture produced no corners — test is vacuous"

    rows = np.arange(crop_h)[:, None]
    cols = np.arange(crop_w)[None, :]
    mask = ((rows >= dy) & (rows < dy + roi_h) &
            (cols >= dx) & (cols < dx + roi_w))
    window = np.where(mask, u8.astype(np.float32), 0.0)  # production zeroing
    got = corners_mod.good_features_to_track(
        jnp.asarray(window), roi_mask=jnp.asarray(mask))
    got_set = {(int(x), int(y))
               for x, y in np.asarray(got.pts)[np.asarray(got.valid)]}
    assert got_set == want_set


def test_corner_empty_on_flat_image():
    got = corners_mod.good_features_to_track(
        jnp.full((32, 32), 128.0, jnp.float32))
    assert int(got.count) == 0


@pytest.mark.parametrize("shift", [(0.6, -0.4), (2.3, 1.7), (-3.1, 0.9)])
def test_lk_matches_cv2_on_subpixel_shifts(shift):
    from scipy.ndimage import gaussian_filter, shift as ndshift

    rng = np.random.default_rng(1)
    h, w = 64, 80
    base = gaussian_filter(rng.random((h + 16, w + 16)) * 0.5 + 0.25, 1.0)
    img0 = base[8:8 + h, 8:8 + w]
    img1 = ndshift(base, shift, order=3)[8:8 + h, 8:8 + w]
    u0 = np.clip(img0 * 255, 0, 255).astype(np.uint8)
    u1 = np.clip(img1 * 255, 0, 255).astype(np.uint8)

    p0 = cv2.goodFeaturesToTrack(u0, **GF_KW)
    assert p0 is not None and len(p0) > 5
    p1, st, _ = cv2.calcOpticalFlowPyrLK(u0, u1, p0, None, **LK_KW)

    fr = lk_mod.calc_optical_flow_pyr_lk(
        jnp.asarray(u0, jnp.float32), jnp.asarray(u1, jnp.float32),
        jnp.asarray(p0[:, 0, :]), jnp.ones((len(p0),), bool))

    st_cv = st[:, 0] == 1
    st_j = np.asarray(fr.status)
    # Status agreement on all points.
    assert (st_cv == st_j).mean() >= 0.95
    both = st_cv & st_j
    diff = np.abs(np.asarray(fr.pts) - p1[:, 0, :])
    # Interior points track cv2 tightly; near-border points may deviate
    # sub-pixel because cv2 pads its pyramid levels slightly differently.
    margin = 10
    interior = (p0[:, 0, 0] >= margin) & (p0[:, 0, 0] < w - margin) & \
               (p0[:, 0, 1] >= margin) & (p0[:, 0, 1] < h - margin)
    if (both & interior).any():
        assert diff[both & interior].max() < 0.25, \
            f"interior deviation {diff[both & interior].max()}"
    assert diff[both].max() < 1.5, f"border deviation {diff[both].max()}"
    # Displacement direction must match ground truth.
    mean_flow = (np.asarray(fr.pts) - p0[:, 0, :])[both].mean(0)
    np.testing.assert_allclose(mean_flow, [shift[1], shift[0]], atol=0.2)


def test_lk_lost_points_get_status_zero():
    # Tracking into an uncorrelated random frame loses most points.
    rng = np.random.default_rng(3)
    u0 = _texture(0)
    u1 = (rng.random(u0.shape) * 255).astype(np.uint8)
    p0 = cv2.goodFeaturesToTrack(u0, **GF_KW)
    fr = lk_mod.calc_optical_flow_pyr_lk(
        jnp.asarray(u0, jnp.float32), jnp.asarray(u1, jnp.float32),
        jnp.asarray(p0[:, 0, :]), jnp.ones((len(p0),), bool))
    # cv2 also mostly fails here; just require the status channel works both
    # ways rather than a specific count.
    assert np.asarray(fr.status).dtype == bool


def test_lk_invalid_inputs_stay_invalid():
    u0 = _texture(0)
    pts = jnp.zeros((10, 2), jnp.float32)
    valid = jnp.zeros((10,), bool)
    fr = lk_mod.calc_optical_flow_pyr_lk(
        jnp.asarray(u0, jnp.float32), jnp.asarray(u0, jnp.float32),
        pts, valid)
    assert not bool(np.asarray(fr.status).any())


@pytest.mark.parametrize("sample", ["patches", "patches16", "onehot"])
def test_lk_sampling_modes_agree(sample):
    # "slices" (the live default) is bit-identical to "patches" (same
    # pixels, same FP order) and to "onehot" (one-hot MXU extraction at
    # Precision.HIGHEST returns the exact pixels, then the same bilinear
    # order); "patches16" stores the im2col matrix in bf16 (level-0
    # uint8-scale pixels are exact; downsampled levels round) so tracked
    # points agree to well under the cv2-parity tolerance.
    from scipy.ndimage import gaussian_filter, shift as ndshift

    rng = np.random.default_rng(7)
    h, w = 64, 80
    base = gaussian_filter(rng.random((h + 16, w + 16)) * 0.5 + 0.25, 1.0)
    img0 = base[8:8 + h, 8:8 + w]
    img1 = ndshift(base, (0.7, -1.3), order=3)[8:8 + h, 8:8 + w]
    u0 = jnp.asarray(np.clip(img0 * 255, 0, 255).astype(np.uint8),
                     jnp.float32)
    u1 = jnp.asarray(np.clip(img1 * 255, 0, 255).astype(np.uint8),
                     jnp.float32)
    p0 = cv2.goodFeaturesToTrack(np.asarray(u0, np.uint8), **GF_KW)
    pts = jnp.asarray(p0[:, 0, :])
    valid = jnp.ones((len(p0),), bool)

    ref = lk_mod.calc_optical_flow_pyr_lk(u0, u1, pts, valid,
                                          sample="slices")
    got = lk_mod.calc_optical_flow_pyr_lk(u0, u1, pts, valid, sample=sample)
    np.testing.assert_array_equal(np.asarray(ref.status),
                                  np.asarray(got.status))
    d = np.abs(np.asarray(ref.pts) - np.asarray(got.pts))
    both = np.asarray(ref.status)
    if sample in ("patches", "onehot"):
        assert d[both].max() == 0.0, f"{sample} must be bit-identical"
    else:
        assert d[both].max() < 0.05, f"patches16 deviation {d[both].max()}"
