"""On-device connected-component labeling and largest-region bounding box.

Replaces the reference's ROI extraction (base.py:566-575): binary threshold →
``cv2.findContours(RETR_EXTERNAL)`` → ``max(contours, key=contourArea)`` →
``cv2.boundingRect``.  Only the largest component's bounding box is ever used,
so exact contour topology is unnecessary (SURVEY.md §2.1).

TPU-native design: iterative min-label propagation over the 8-neighborhood
(findContours extracts 8-connected white regions) accelerated with pointer
jumping — each pixel holds the smallest flat index reachable in its component;
a ``while_loop`` runs neighbor-min + label-gather rounds to a fixed point in
O(log diameter) rounds.  Component areas come from a one-hot segment-sum and
the bbox from masked row/column reductions.

Area semantics: ``cv2.contourArea`` is the *polygon* area of the outer
boundary (Pick's theorem: pixels - boundary/2 - 1 for simple shapes), not the
pixel count.  We select the largest component by a Pick-style estimate
``N - B/2 - 1`` (B = component pixels with a non-component 8-neighbor or on
the image border) which matches cv2's ranking on blob-like heatmaps; ties and
degenerate thin-structure orderings can differ (documented divergence).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class BBoxResult(NamedTuple):
    x: jnp.ndarray        # int32
    y: jnp.ndarray        # int32
    w: jnp.ndarray        # int32
    h: jnp.ndarray        # int32
    found: jnp.ndarray    # bool
    area: jnp.ndarray     # float — cv2-style polygon-area estimate


def _neighbor_min(lab: jnp.ndarray, big: int) -> jnp.ndarray:
    """Min label over the 8-neighborhood (out-of-image = big)."""
    h, w = lab.shape
    p = jnp.pad(lab, 1, constant_values=big)
    stack = jnp.stack([
        p[0:h, 0:w], p[0:h, 1:w + 1], p[0:h, 2:w + 2],
        p[1:h + 1, 0:w], p[1:h + 1, 2:w + 2],
        p[2:h + 2, 0:w], p[2:h + 2, 1:w + 1], p[2:h + 2, 2:w + 2],
    ])
    return jnp.minimum(lab, jnp.min(stack, axis=0))


def _segmented_min_scan(lab: jnp.ndarray, fg: jnp.ndarray, axis: int,
                        big: int) -> jnp.ndarray:
    """Min-propagate labels along ``axis`` within contiguous foreground
    runs, both directions, via ``lax.associative_scan`` — a whole run
    equalizes in O(log n) parallel steps with zero gathers (TPU gathers on
    megapixel images are the CCL bottleneck otherwise)."""
    boundary = ~fg

    def combine(a, b):
        m1, b1 = a
        m2, b2 = b
        return jnp.where(b2, m2, jnp.minimum(m1, m2)), b1 | b2

    fwd, _ = jax.lax.associative_scan(combine, (lab, boundary), axis=axis)
    bwd, _ = jax.lax.associative_scan(combine, (lab, boundary), axis=axis,
                                      reverse=True)
    out = jnp.minimum(fwd, bwd)
    return jnp.where(fg, out, big)


@jax.jit
def label_components(fg: jnp.ndarray) -> jnp.ndarray:
    """8-connected component labels: each foreground pixel gets the smallest
    flat index in its component; background gets H*W.  fg is (H, W) bool.

    Fixed-point of sweeps, each: 8-neighborhood min (shift-based) then
    segmented min-scans along rows and columns.  The scans propagate labels
    across entire runs at once, so convergence takes a handful of sweeps on
    real masks (vs O(image diameter) for pure neighbor propagation, or
    megapixel gathers for pointer jumping)."""
    h, w = fg.shape
    big = h * w
    idx = jnp.arange(big, dtype=jnp.int32).reshape(h, w)
    lab = jnp.where(fg, idx, big)

    def body(state):
        lab, _ = state
        new = _neighbor_min(lab, big)
        new = jnp.where(fg, new, big)
        new = _segmented_min_scan(new, fg, 1, big)
        new = _segmented_min_scan(new, fg, 0, big)
        return new, jnp.any(new != lab)

    def cond(state):
        return state[1]

    lab, _ = jax.lax.while_loop(cond, body, (lab, jnp.asarray(True)))
    return lab


@jax.jit
def largest_component_bbox(fg: jnp.ndarray) -> BBoxResult:
    """Bounding box (x, y, w, h) of the largest 8-connected component of a
    binary image, cv2-convention (x: column, y: row, inclusive extent)."""
    h, w = fg.shape
    big = h * w
    lab = label_components(fg)
    flat = lab.reshape(-1)

    ones = fg.reshape(-1).astype(jnp.float32)
    counts = jax.ops.segment_sum(ones, flat, num_segments=big + 1)

    # Boundary pixels: any 8-neighbor outside the component (or image edge).
    pfg = jnp.pad(fg, 1, constant_values=False)
    nb_all_fg = jnp.stack([
        pfg[0:h, 0:w], pfg[0:h, 1:w + 1], pfg[0:h, 2:w + 2],
        pfg[1:h + 1, 0:w], pfg[1:h + 1, 2:w + 2],
        pfg[2:h + 2, 0:w], pfg[2:h + 2, 1:w + 1], pfg[2:h + 2, 2:w + 2],
    ]).all(axis=0)
    boundary = fg & ~nb_all_fg
    bcounts = jax.ops.segment_sum(boundary.reshape(-1).astype(jnp.float32),
                                  flat, num_segments=big + 1)

    # cv2.contourArea ranking estimate (Pick): N - B/2 - 1.
    areas = counts - 0.5 * bcounts - 1.0
    areas = areas.at[big].set(-jnp.inf)          # background
    areas = jnp.where(counts > 0, areas, -jnp.inf)
    best = jnp.argmax(areas)

    sel = (lab == best) & fg
    rows = jnp.any(sel, axis=1)
    cols = jnp.any(sel, axis=0)
    ridx = jnp.arange(h)
    cidx = jnp.arange(w)
    y0 = jnp.min(jnp.where(rows, ridx, h))
    y1 = jnp.max(jnp.where(rows, ridx, -1))
    x0 = jnp.min(jnp.where(cols, cidx, w))
    x1 = jnp.max(jnp.where(cols, cidx, -1))

    found = jnp.any(fg)
    return BBoxResult(
        x=x0.astype(jnp.int32), y=y0.astype(jnp.int32),
        w=(x1 - x0 + 1).astype(jnp.int32), h=(y1 - y0 + 1).astype(jnp.int32),
        found=found, area=areas[best])
