"""Shi-Tomasi corner detection (cv2.goodFeaturesToTrack semantics).

The reference seeds its optical-flow tracker with
``cv2.goodFeaturesToTrack(img, maxCorners=100, qualityLevel=0.3,
minDistance=7, blockSize=7)`` (base.py:91-94, 365-366).  OpenCV's algorithm:

  1. ``cornerMinEigenVal``: Sobel-3 gradients (BORDER_REFLECT_101), per-pixel
     2x2 structure tensor summed over a blockSize box (unnormalized), then
     the min eigenvalue ``(a+c) - sqrt((a-c)^2 + b^2)`` with a=0.5*Sxx,
     b=Sxy, c=0.5*Syy.  (OpenCV folds a constant 1/(2^(ksize-1)*block*255)
     into the gradients; selection below is scale-invariant so we omit it.)
  2. Threshold at ``qualityLevel * max(eig)`` (strictly-greater survives).
  3. 3x3 dilation non-max suppression (plateau ties all survive), excluding
     the 1-pixel image border.
  4. Process candidates by descending response; keep one if no kept corner
     lies strictly within ``minDistance`` (Euclidean); stop at maxCorners.

TPU-native design: the response map is a fused stencil (separable Sobel + box
sum); the greedy selection is a bounded ``fori_loop`` of argmax+mask rounds
into a fixed (max_corners, 2) masked point buffer — static shapes end to end.
Tie-breaking inside a round picks the smallest flat index (cv2's unstable
sort leaves tie order unspecified).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from respmon_tpu.ops.pyramid import _reflect_pad


class CornerSet(NamedTuple):
    pts: jnp.ndarray    # (max_corners, 2) float32, (x, y)
    valid: jnp.ndarray  # (max_corners,) bool
    count: jnp.ndarray  # int32


def _conv1d(x: jnp.ndarray, axis: int, taps) -> jnp.ndarray:
    """Small odd-length 1D stencil along ``axis`` with REFLECT_101 border."""
    r = len(taps) // 2
    xp = _reflect_pad(x, axis, r)
    n = x.shape[axis]
    acc = None
    for k, w in enumerate(taps):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(k, k + n)
        term = xp[tuple(sl)] * w
        acc = term if acc is None else acc + term
    return acc


def _box_sum(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Unnormalized box filter (cv2.boxFilter normalize=False), reflect-101."""
    ones = (1.0,) * size
    return _conv1d(_conv1d(x, x.ndim - 2, ones), x.ndim - 1, ones)


def min_eigenval_map(img: jnp.ndarray, block_size: int = 7) -> jnp.ndarray:
    """cv2.cornerMinEigenVal response map (unscaled)."""
    ix = _conv1d(_conv1d(img, img.ndim - 1, (-1.0, 0.0, 1.0)),
                 img.ndim - 2, (1.0, 2.0, 1.0))
    iy = _conv1d(_conv1d(img, img.ndim - 2, (-1.0, 0.0, 1.0)),
                 img.ndim - 1, (1.0, 2.0, 1.0))
    sxx = _box_sum(ix * ix, block_size)
    syy = _box_sum(iy * iy, block_size)
    sxy = _box_sum(ix * iy, block_size)
    a = 0.5 * sxx
    c = 0.5 * syy
    return (a + c) - jnp.sqrt((a - c) * (a - c) + sxy * sxy)


def _dilate3(x: jnp.ndarray) -> jnp.ndarray:
    h, w = x.shape[-2:]
    p = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)],
                constant_values=-jnp.inf)
    stack = [p[..., i:i + h, j:j + w] for i in range(3) for j in range(3)]
    return jnp.max(jnp.stack(stack), axis=0)


@partial(jax.jit, static_argnames=("max_corners", "quality_level",
                                   "min_distance", "block_size"))
def good_features_to_track(img: jnp.ndarray, max_corners: int = 100,
                           quality_level: float = 0.3,
                           min_distance: float = 7.0,
                           block_size: int = 7,
                           roi_mask: jnp.ndarray | None = None) -> CornerSet:
    """Masked fixed-size corner set on a single (H, W) float image.

    ``roi_mask`` optionally restricts detection (for bucketed ROI crops where
    only ``[0:h, 0:w]`` of a padded window is real).
    """
    h, w = img.shape
    eig = min_eigenval_map(img, block_size)
    if roi_mask is not None:
        eig = jnp.where(roi_mask, eig, -jnp.inf)

    interior = jnp.zeros((h, w), bool).at[1:h - 1, 1:w - 1].set(True)
    if roi_mask is not None:
        # cv2 operates on the cropped image, so its border exclusion applies
        # to the ROI extent, not the padded buffer; approximate by also
        # excluding pixels whose 3x3 neighborhood leaves the mask.
        interior = interior & roi_mask

    maxval = jnp.max(jnp.where(jnp.isfinite(eig), eig, -jnp.inf))
    thresh = quality_level * maxval
    cand = (eig > thresh) & (eig == _dilate3(eig)) & interior

    ridx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    flat_idx = ridx * w + cidx
    neg = jnp.asarray(-jnp.inf, eig.dtype)
    score = jnp.where(cand, eig, neg)

    def body(i, carry):
        score, pts, valid = carry
        best = jnp.max(score)
        has = best > neg
        # Tie-break: smallest flat index among maxima.
        pick = jnp.min(jnp.where(score == best, flat_idx, h * w))
        py = pick // w
        px = pick % w
        # Suppress strictly-closer-than-min_distance candidates (cv2 uses
        # dx*dx + dy*dy < minDistance^2).
        d2 = ((ridx - py).astype(eig.dtype) ** 2 +
              (cidx - px).astype(eig.dtype) ** 2)
        score = jnp.where(has & (d2 < min_distance * min_distance), neg, score)
        pts = pts.at[i].set(jnp.where(
            has, jnp.stack([px, py]).astype(jnp.float32), pts[i]))
        valid = valid.at[i].set(has)
        return score, pts, valid

    pts0 = jnp.zeros((max_corners, 2), jnp.float32)
    valid0 = jnp.zeros((max_corners,), bool)
    _, pts, valid = jax.lax.fori_loop(0, max_corners, body,
                                      (score, pts0, valid0))
    return CornerSet(pts=pts, valid=valid,
                     count=jnp.sum(valid).astype(jnp.int32))
