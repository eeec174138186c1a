"""End-to-end calibration parity: fused device locate vs the cv2/scipy
oracle (reference transforms.py:144-198 + base.py:547-601)."""

import numpy as np
import pytest

import jax.numpy as jnp

from respmon_tpu.config import CalibrationConfig
from respmon_tpu.io.synthetic import breathing_clip
from respmon_tpu.pipeline import evm
from tests.golden import reference_numpy as golden


@pytest.fixture(scope="module")
def clip():
    return breathing_clip(num_frames=64, height=120, width=160, fps=10.0,
                          bpm=18.0, patch_center=(60, 80),
                          patch_size=(30, 40), amplitude=0.12,
                          dtype=np.float64)


CFG = CalibrationConfig(pyramid_levels=6, skip_levels_at_top=2,
                        buffer_length=64)


def test_evm_bandpass_matches_oracle(clip):
    got = evm.eulerian_magnification_bandpass(jnp.asarray(clip), 10.0, CFG)
    want_masked, want_raw = golden.eulerian_magnification_bandpass(
        clip, 10.0, CFG.freq_min, CFG.freq_max, CFG.amplification,
        pyramid_levels=CFG.pyramid_levels,
        skip_levels_at_top=CFG.skip_levels_at_top,
        threshold=CFG.temporal_threshold)
    scale = np.abs(want_raw).max()
    np.testing.assert_allclose(np.asarray(got.raw), want_raw,
                               rtol=0, atol=1e-9 * scale)
    np.testing.assert_allclose(np.asarray(got.masked), want_masked,
                               rtol=0, atol=1e-9 * scale)


def test_locate_bbox_matches_oracle(clip):
    res = evm.locate(jnp.asarray(clip), 10.0, CFG)
    want = golden.locate(clip, 10.0,
                         pyramid_levels=CFG.pyramid_levels,
                         skip_levels_at_top=CFG.skip_levels_at_top)
    assert bool(res.found)
    assert want is not None
    assert (int(res.x), int(res.y), int(res.w), int(res.h)) == tuple(want)


def test_locate_bbox_covers_patch(clip):
    res = evm.locate(jnp.asarray(clip), 10.0, CFG)
    # The breathing patch is centered at (60, 80); the detected ROI must
    # contain its center.
    assert int(res.x) <= 80 <= int(res.x) + int(res.w)
    assert int(res.y) <= 60 <= int(res.y) + int(res.h)


def test_locate_not_found_on_constant_video():
    vid = np.full((32, 48, 64), 0.5)
    # A constant video has zero bandpass energy everywhere; after min-max
    # normalization the heatmap is degenerate (NaN -> comparisons false),
    # which must surface as found=False (the reference's None/retry path).
    cfg = CalibrationConfig(pyramid_levels=4, skip_levels_at_top=1,
                            buffer_length=32)
    res = evm.locate(jnp.asarray(vid), 10.0, cfg)
    assert not bool(res.found)


def test_locate_float32_same_bbox(clip):
    res64 = evm.locate(jnp.asarray(clip), 10.0, CFG)
    res32 = evm.locate(jnp.asarray(clip.astype(np.float32)), 10.0, CFG)
    assert (int(res32.x), int(res32.y), int(res32.w), int(res32.h)) == \
        (int(res64.x), int(res64.y), int(res64.w), int(res64.h))


def test_locate_verbose_matches_and_logs(caplog):
    # The per-stage timed variant (reference transforms.py verbose=True)
    # produces the same LocateResult and logs each stage's dt.
    import logging

    import numpy as np

    from respmon_tpu.io.synthetic import breathing_clip

    vid = jnp.asarray(breathing_clip(
        num_frames=32, height=60, width=80, fps=10.0, bpm=18.0,
        patch_center=(30, 40), patch_size=(16, 20), amplitude=0.12),
        jnp.float32)
    cfg = CalibrationConfig(pyramid_levels=5, skip_levels_at_top=2,
                            buffer_length=32)
    with caplog.at_level(logging.INFO, logger="respmon_tpu.pipeline.evm"):
        got = evm.locate_verbose(vid, 10.0, cfg)
    want = evm.locate(vid, 10.0, cfg)
    assert bool(got.found) == bool(want.found)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)
    text = caplog.text
    for name in ("create_laplacian_video_pyramid",
                 "temporal_bandpass_filter",
                 "collapse_laplacian_video_pyramid", "Frame Average"):
        assert name in text, f"missing stage log: {name}"
