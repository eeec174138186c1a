"""Pyramidal Lucas-Kanade sparse optical flow (cv2.calcOpticalFlowPyrLK
semantics).

The reference tracks Shi-Tomasi corners with ``cv2.calcOpticalFlowPyrLK(prev,
next, pts, None, winSize=(15,15), maxLevel=2, criteria=(EPS|COUNT, 10, 0.03))``
(base.py:96-98, 371-372).  OpenCV's algorithm, reproduced:

  - 3-level image pyramids (pyrDown), Scharr derivatives of the prev level
    (smooth [3,10,3], diff [-1,0,1]; replicate border), derivative samples
    outside the image read as zero (cv2 pads derivatives BORDER_CONSTANT).
  - Per point, coarse-to-fine: at each level gather the 15x15 window around
    the point by bilinear interpolation (reflect-101 image border), form the
    2x2 normal matrix G from the prev window gradients, then Newton-iterate
    ``nextPt += -G^{-1} sum((J-I) * grad)`` up to 10 times or until
    ``||delta||^2 <= 0.03^2`` (cv2 squares epsilon), with cv2's oscillation
    damper (averaging back half a step when successive deltas cancel).
  - Status drops to 0 at level 0 when the window leaves the image, when
    ``det(G) < FLT_EPSILON``, or when the normalized min eigenvalue of G is
    below ``minEigThreshold=1e-4`` (cv2 units: gradients are Scharr x32 and
    accumulators scaled 2^-20, i.e. true-gradient G / 1024, then / winArea).

TPU-native design: fixed-iteration ``fori_loop`` per level with masked
convergence flags, vmapped over a fixed-size masked point set; all gathers are
flat ``jnp.take`` of static-shape window index grids.  Images are expected on
the uint8 [0,255] value scale (the reference converts crops with
float_to_uint8 before LK, base.py:364-371), which the minEig threshold
depends on.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from respmon_tpu.ops.pyramid import pyr_down


class FlowResult(NamedTuple):
    pts: jnp.ndarray     # (N, 2) float32 tracked positions (x, y)
    status: jnp.ndarray  # (N,) bool


def _scharr_derivs(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """True-gradient Scharr derivatives (cv2 calcScharrDeriv / 32),
    replicate border."""
    p = jnp.pad(img, 1, mode="edge")
    h, w = img.shape
    sm = (3.0 / 16.0, 10.0 / 16.0, 3.0 / 16.0)
    df = (-0.5, 0.0, 0.5)

    def conv(a, taps_y, taps_x):
        acc = None
        for i, wy in enumerate(taps_y):
            for j, wx in enumerate(taps_x):
                c = wy * wx
                if c == 0.0:
                    continue
                term = a[i:i + h, j:j + w] * c
                acc = term if acc is None else acc + term
        return acc

    dx = conv(p, sm, df)
    dy = conv(p, df, sm)
    return dx, dy


def _bilinear_window(img: jnp.ndarray, base_y, base_x, fy, fx, win: int,
                     border: str) -> jnp.ndarray:
    """Gather a (win x win) bilinear-interpolated window whose top-left
    integer corner is (base_y, base_x) with fractional offsets (fy, fx).

    border: 'reflect101' for image samples, 'zero' for derivative samples.
    """
    h, w = img.shape
    oy = jnp.arange(win + 1)
    ox = jnp.arange(win + 1)
    ys = base_y + oy                       # (win+1,)
    xs = base_x + ox

    if border == "reflect101":
        def r101(i, n):
            if n == 1:
                return jnp.zeros_like(i)
            period = 2 * (n - 1)
            m = jnp.mod(i, period)
            return jnp.where(m < n, m, period - m)
        ysm = r101(ys, h)
        xsm = r101(xs, w)
        grid = img[ysm[:, None], xsm[None, :]]
    else:
        ysc = jnp.clip(ys, 0, h - 1)
        xsc = jnp.clip(xs, 0, w - 1)
        inside = ((ys >= 0) & (ys < h))[:, None] & \
                 ((xs >= 0) & (xs < w))[None, :]
        grid = jnp.where(inside, img[ysc[:, None], xsc[None, :]], 0.0)

    w00 = (1.0 - fy) * (1.0 - fx)
    w01 = (1.0 - fy) * fx
    w10 = fy * (1.0 - fx)
    w11 = fy * fx
    return (grid[:-1, :-1] * w00 + grid[:-1, 1:] * w01 +
            grid[1:, :-1] * w10 + grid[1:, 1:] * w11)


def _track_point_level(prev_img, next_img, dxm, dym, prev_pt, next_pt,
                       status, level, win, max_iters, eps2, min_eig_thresh):
    """One pyramid level of LK for a single point."""
    h, w = prev_img.shape
    half = (win - 1) * 0.5
    dtype = prev_img.dtype

    ip = jnp.floor(prev_pt - half)
    fy = (prev_pt[1] - half) - ip[1]
    fx = (prev_pt[0] - half) - ip[0]
    by = ip[1].astype(jnp.int32)
    bx = ip[0].astype(jnp.int32)

    # cv2 bound check on the prev window (lost only if wildly outside).
    out_prev = (bx < -win) | (bx >= w) | (by < -win) | (by >= h)

    iw = _bilinear_window(prev_img, by, bx, fy, fx, win, "reflect101")
    ixw = _bilinear_window(dxm, by, bx, fy, fx, win, "zero")
    iyw = _bilinear_window(dym, by, bx, fy, fx, win, "zero")

    a11 = jnp.sum(ixw * ixw)
    a12 = jnp.sum(ixw * iyw)
    a22 = jnp.sum(iyw * iyw)
    # cv2-scale checks: accumulators correspond to (32 g)^2 / 2^20 = g^2/1024.
    sa11, sa12, sa22 = a11 / 1024.0, a12 / 1024.0, a22 / 1024.0
    det_s = sa11 * sa22 - sa12 * sa12
    min_eig = (sa22 + sa11 - jnp.sqrt((sa11 - sa22) ** 2 + 4.0 * sa12 ** 2)) \
        / (2.0 * win * win)
    bad_g = (min_eig < min_eig_thresh) | (det_s < 1.19209290e-07)

    det = a11 * a22 - a12 * a12
    inv_det = jnp.where(jnp.abs(det) > 0, 1.0 / det, 0.0)

    def iter_body(j, carry):
        pt, prev_delta, done, lost = carry
        jp = jnp.floor(pt - half)
        jfy = (pt[1] - half) - jp[1]
        jfx = (pt[0] - half) - jp[0]
        jby = jp[1].astype(jnp.int32)
        jbx = jp[0].astype(jnp.int32)
        out_next = (jbx < -win) | (jbx >= w) | (jby < -win) | (jby >= h)

        jw = _bilinear_window(next_img, jby, jbx, jfy, jfx, win, "reflect101")
        diff = jw - iw
        b1 = jnp.sum(diff * ixw)
        b2 = jnp.sum(diff * iyw)
        # delta = -G^{-1} b  (cv2's closed form).
        dxs = (a12 * b2 - a22 * b1) * inv_det
        dys = (a12 * b1 - a11 * b2) * inv_det
        delta = jnp.stack([dxs, dys]).astype(dtype)

        new_pt = pt + delta
        small = jnp.sum(delta * delta) <= eps2
        # cv2 oscillation damper: successive deltas cancel -> back half step.
        osc = (j > 0) & (jnp.abs(delta[0] + prev_delta[0]) < 0.01) & \
              (jnp.abs(delta[1] + prev_delta[1]) < 0.01)
        new_pt = jnp.where(osc, new_pt - delta * 0.5, new_pt)

        active = ~(done | lost)
        pt = jnp.where(active & ~out_next, new_pt, pt)
        done = done | small | osc | out_next
        lost = lost | (active & out_next)
        return pt, delta, done, lost

    init = (next_pt, jnp.zeros(2, dtype), jnp.asarray(False),
            jnp.asarray(False))
    skip = out_prev | bad_g
    pt_fin, _, _, lost = jax.lax.cond(
        skip,
        lambda i: (i[0], i[1], jnp.asarray(True), jnp.asarray(False)),
        lambda i: jax.lax.fori_loop(0, max_iters, iter_body, i),
        init)

    # Status drops only at level 0 (cv2 `if level == 0` convention).
    is_level0 = level == 0
    new_status = status & ~(is_level0 & (out_prev | bad_g | lost))
    return pt_fin, new_status


@partial(jax.jit, static_argnames=("win", "max_level", "max_iters", "eps",
                                   "min_eig_thresh"))
def calc_optical_flow_pyr_lk(prev_img: jnp.ndarray, next_img: jnp.ndarray,
                             pts: jnp.ndarray, valid: jnp.ndarray,
                             win: int = 15, max_level: int = 2,
                             max_iters: int = 10, eps: float = 0.03,
                             min_eig_thresh: float = 1e-4) -> FlowResult:
    """Track masked points from prev_img to next_img ((H, W), [0,255] scale).

    Returns tracked positions and per-point status; invalid inputs stay
    invalid.  Mirrors the reference call site base.py:371-372.
    """
    dtype = prev_img.dtype
    eps2 = jnp.asarray(min(max(eps, 0.0), 10.0) ** 2, dtype)

    prev_pyr = [prev_img]
    next_pyr = [next_img]
    for _ in range(max_level):
        prev_pyr.append(pyr_down(prev_pyr[-1]))
        next_pyr.append(pyr_down(next_pyr[-1]))
    derivs = [_scharr_derivs(p) for p in prev_pyr]

    def track_one(pt0, v):
        # Seeded so the loop's leading *2 yields pt0 / 2^max_level at the top
        # level (cv2's nextPt init when no initial-flow flag is set).
        next_pt = pt0 / (2.0 ** (max_level + 1))
        status = v

        for level in range(max_level, -1, -1):
            prev_pt = pt0 / (2.0 ** level)
            next_pt = next_pt * 2.0
            dxm, dym = derivs[level]
            next_pt, status = _track_point_level(
                prev_pyr[level], next_pyr[level], dxm, dym,
                prev_pt, next_pt, status, level, win, max_iters, eps2,
                min_eig_thresh)
        return next_pt, status & v

    new_pts, status = jax.vmap(track_one)(pts.astype(dtype), valid)
    return FlowResult(pts=new_pts.astype(jnp.float32), status=status)
