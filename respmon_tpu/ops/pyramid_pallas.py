"""Fused Pallas kernel: per-frame Laplacian pyramid levels in one VMEM pass.

The EVM calibration needs only Laplacian levels [skip_top, levels-2] of each
frame (the bandpassed band, transforms.py:156-160) — but the XLA formulation
materializes every Gaussian stage to HBM: ~20 full-buffer round trips for a
(128, 480, 640) calibration (~74 ms measured, vs <1 ms of unavoidable HBM
traffic).  This kernel reads each frame into VMEM ONCE, runs the whole
pyrDown chain and the kept-level pyrUp/subtracts on-chip (a frame plus its
full Gaussian pyramid is ~1.6 MB — far under the ~16 MB VMEM), and writes
only the tiny kept levels back.

Mosaic lowering constraints shape the implementation: strided slices and
lane-axis interleaves lower to unsupported gathers, so every stride-2
select / 2x interleave runs on the sublane axis (via reshape) with
transposes bracketing the W-axis passes; borders use concatenated slices
(no `rev`, no gathers).  Numerics are identical to ops.pyramid (same 5-tap
kernels, same reflect-101 / pyrUp border rules), verified by parity tests in
interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from respmon_tpu.ops.pyramid import pyramid_shapes

_K5 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def _pad2_rows(x: jnp.ndarray) -> jnp.ndarray:
    """REFLECT_101 pad of 2 on axis 0 via concatenated slices."""
    n = x.shape[0]
    if n >= 3:
        front = jnp.concatenate([x[2:3], x[1:2]], axis=0)
        back = jnp.concatenate([x[n - 2:n - 1], x[n - 3:n - 2]], axis=0)
    elif n == 2:  # reflect101 period 2 -> rows (0, 1 | 0, 1)
        front = x[0:2]
        back = x[0:2]
    else:  # n == 1: every reflected index is 0
        front = jnp.concatenate([x[0:1], x[0:1]], axis=0)
        back = front
    return jnp.concatenate([front, x, back], axis=0)


def _down_rows(x: jnp.ndarray) -> jnp.ndarray:
    """5-tap blur + stride-2 subsample along axis 0 (even positions picked
    by a sublane reshape — Mosaic has no strided slice)."""
    n = x.shape[0]
    out = (n + 1) // 2
    xp = _pad2_rows(x)
    y = None
    for k, w in enumerate(_K5):
        term = xp[k:k + n] * w
        y = term if y is None else y + term
    if n % 2 == 1:
        y = jnp.concatenate([y, y[n - 1:n]], axis=0)
    return y[: 2 * out].reshape((out, 2) + x.shape[1:])[:, 0]


def _up_rows(x: jnp.ndarray, dst: int) -> jnp.ndarray:
    """cv2.pyrUp single-axis upsample on axis 0 (front reflect101, back
    replicate; interleave via sublane stack+reshape)."""
    n = x.shape[0]
    front = x[1:2] if n > 1 else x[0:1]
    back = x[n - 1:n]
    xp = jnp.concatenate([front, x, back], axis=0)
    even = (xp[0:n] + 6.0 * xp[1:n + 1] + xp[2:n + 2]) * (1.0 / 8.0)
    odd = (xp[1:n + 1] + xp[2:n + 2]) * 0.5
    inter = jnp.stack([even, odd], axis=1)
    inter = inter.reshape((2 * n,) + x.shape[1:])
    return inter[:dst]


def _down2d(x: jnp.ndarray) -> jnp.ndarray:
    y = _down_rows(x)
    return _down_rows(y.T).T


def _up2d(x: jnp.ndarray, dst_hw) -> jnp.ndarray:
    y = _up_rows(x, dst_hw[0])
    return _up_rows(y.T, dst_hw[1]).T


def _make_kernel(shapes, kept: Sequence[int], levels: int):
    def kernel(in_ref, *out_refs):
        gauss = [in_ref[0]]
        for _ in range(1, levels):
            gauss.append(_down2d(gauss[-1]))
        for slot, lvl in enumerate(kept):
            up = _up2d(gauss[lvl + 1], shapes[lvl])
            out_refs[slot][0] = gauss[lvl] - up

    return kernel


# ---------------------------------------------------------------------------
# Matmul formulation: each axis pass as a small band-matrix product.
#
# Vector-unit stride/interleave shuffles (and especially transposes) dominate
# the elementwise kernel above; on TPU the MXU moves data faster than the
# VPU can shuffle it.  pyrDown along H is the linear map D_h (h2 x h) and
# along W the map D_w (w2 x w); pyrUp likewise U_h/U_w — so one level is
# just D_h @ g @ D_w^T.  The matrices are built on host by pushing identity
# through the *same* numpy semantics, so the linear maps are exact.
# ---------------------------------------------------------------------------

def _np_down_matrix(n: int) -> "np.ndarray":
    import numpy as np

    out = (n + 1) // 2
    period = 2 * (n - 1) if n > 1 else 1

    def r101(i):
        m = i % period
        return m if m < n else period - m

    D = np.zeros((out, n), np.float32)
    for i in range(out):
        for k, w in enumerate(_K5):
            D[i, r101(2 * i + k - 2)] += w
    return D


def _np_up_matrix(n: int, dst: int) -> "np.ndarray":
    import numpy as np

    U = np.zeros((dst, n), np.float32)
    front = 1 if n > 1 else 0   # s[-1] -> s[1] (reflect101)
    back = n - 1                # s[n] -> s[n-1] (replicate)

    def src(i):
        if i < 0:
            return front
        if i >= n:
            return back
        return i

    for i in range(dst):
        if i % 2 == 0:
            s = i // 2
            U[i, src(s - 1)] += 1.0 / 8.0
            U[i, src(s)] += 6.0 / 8.0
            U[i, src(s + 1)] += 1.0 / 8.0
        else:
            s = i // 2
            U[i, src(s)] += 0.5
            U[i, src(s + 1)] += 0.5
    return U


def _make_matmul_kernel(shapes, kept: Sequence[int], levels: int):
    def kernel(*refs):
        # refs layout: [frame, Dh_1..Dh_{L-1}, Dw_1.., Uh_k.., Uw_k..,
        #               out_k...]
        n_down = levels - 1
        n_kept = len(kept)
        in_ref = refs[0]
        dh = refs[1:1 + n_down]
        dw = refs[1 + n_down:1 + 2 * n_down]
        uh = refs[1 + 2 * n_down:1 + 2 * n_down + n_kept]
        uw = refs[1 + 2 * n_down + n_kept:1 + 2 * n_down + 2 * n_kept]
        outs = refs[1 + 2 * n_down + 2 * n_kept:]

        # W matrices arrive pre-transposed; full f32 precision (the TPU
        # default matmul precision is bf16, which costs ~5e-3 absolute).
        dot = partial(jnp.dot, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        g = in_ref[0]
        gauss = [g]
        for i in range(n_down):
            gauss.append(dot(dot(dh[i][:], gauss[-1]), dw[i][:]))
        for slot, lvl in enumerate(kept):
            up = dot(dot(uh[slot][:], gauss[lvl + 1]), uw[slot][:])
            outs[slot][0] = gauss[lvl] - up

    return kernel


@partial(jax.jit, static_argnames=("levels", "skip_top", "interpret"))
def laplacian_band_levels_mm(vid: jnp.ndarray, levels: int, skip_top: int,
                             interpret: bool = False):
    """Matmul-formulation fused pyramid kernel (see above)."""
    import numpy as np

    t_len, h, w = vid.shape
    shapes = pyramid_shapes(h, w, levels)
    kept = list(range(skip_top, levels - 1))

    dh = [jnp.asarray(_np_down_matrix(shapes[i][0]))
          for i in range(levels - 1)]
    dw = [jnp.asarray(_np_down_matrix(shapes[i][1]).T)
          for i in range(levels - 1)]
    uh = [jnp.asarray(_np_up_matrix(shapes[lvl + 1][0], shapes[lvl][0]))
          for lvl in kept]
    uw = [jnp.asarray(_np_up_matrix(shapes[lvl + 1][1], shapes[lvl][1]).T)
          for lvl in kept]

    kernel = _make_matmul_kernel(shapes, kept, levels)
    out_shapes = [jax.ShapeDtypeStruct((t_len,) + shapes[lvl], vid.dtype)
                  for lvl in kept]
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((1, h, w), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [full() for _ in range(2 * (levels - 1) + 2 * len(kept))]
    out_specs = [
        pl.BlockSpec((1,) + shapes[lvl], lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM)
        for lvl in kept
    ]
    return pl.pallas_call(
        kernel,
        grid=(t_len,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(vid, *dh, *dw, *uh, *uw)


# ---------------------------------------------------------------------------
# Tiled first stage for frames too large for one VMEM-resident pyramid
# (e.g. 1080p: an 8.3 MB f32 frame x2 pipeline buffers exceeds VMEM).
#
# The first ``s1`` Gaussian levels are computed per W-strip with a halo of
# hp = 2*2^s1 full-res columns (the 5-tap stencil chain reaches at most
# 2^(s1+1)-2 columns); the small gauss[s1] video then feeds the ordinary
# fused kernel for the remaining levels.  Bit-exactness: interior strips see
# only true pixels in identical stencil order; the FIRST/LAST strips start/
# end at the true image edge, so the kernel's own reflect-101 *is* the true
# border rule (same values, same summation order as the whole-frame kernel).
# Strip-edge contamination (the kernel reflecting where the image continues)
# touches <= 2 columns per level per side and every contaminated column
# falls outside the statically-kept slice (margins 0/2/4 for first/middle/
# last strips; the halo leaves exactly 2 spare columns each side at level
# s1).
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("s1", "nt", "interpret"))
def gauss_level_tiled(vid: jnp.ndarray, s1: int, nt: int,
                      interpret: bool = False) -> jnp.ndarray:
    """Gaussian pyramid level ``s1`` of a (T, H, W) video, computed by a
    Pallas kernel gridded over ``nt`` W-strips: same stencils in the same
    order as ``gaussian_pyramid(vid, s1+1)[s1]`` (differences only from
    backend FMA fusion, <= 1 ULP).

    Requires W % nt == 0 and (W // nt) % 2^s1 == 0 and W//nt >= 4*2^s1.
    """
    t_len, h, w = vid.shape
    stride = 1 << s1
    hp = 2 * stride
    assert nt >= 2 and w % nt == 0, (w, nt)
    wt = w // nt
    assert wt % stride == 0 and wt >= 2 * hp, (wt, stride, hp)
    ws = wt + 2 * hp

    starts = [0] + [i * wt - hp for i in range(1, nt - 1)] + [w - ws]
    strips = jnp.stack([vid[:, :, s:s + ws] for s in starts], axis=1)

    shapes = pyramid_shapes(h, ws, s1 + 1)
    hs, wss = shapes[s1]
    wts = wt // stride

    def kernel(in_ref, out_ref):
        g = in_ref[0, 0]
        for _ in range(s1):
            g = _down2d(g)
        out_ref[0, 0] = g

    out = pl.pallas_call(
        kernel,
        grid=(t_len, nt),
        in_specs=[pl.BlockSpec((1, 1, h, ws), lambda t, i: (t, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, hs, wss), lambda t, i: (t, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, nt, hs, wss), vid.dtype),
        interpret=interpret,
    )(strips)

    # Static per-strip valid slices (kernel-edge reflection contaminates
    # <= 2 columns each side; edge strips own their true border).
    parts = [out[:, 0, :, 0:wts]]
    parts += [out[:, i, :, 2:2 + wts] for i in range(1, nt - 1)]
    parts.append(out[:, nt - 1, :, wss - wts:wss])
    return jnp.concatenate(parts, axis=-1)


@partial(jax.jit, static_argnames=("levels", "skip_top", "interpret"))
def laplacian_band_levels(vid: jnp.ndarray, levels: int, skip_top: int,
                          interpret: bool = False) -> Tuple[jnp.ndarray,
                                                            ...]:
    """Laplacian levels [skip_top, levels-2] of a (T, H, W) video, one fused
    Pallas program per frame (grid over T)."""
    t_len, h, w = vid.shape
    shapes = pyramid_shapes(h, w, levels)
    kept = list(range(skip_top, levels - 1))

    kernel = _make_kernel(shapes, kept, levels)
    out_shapes = [jax.ShapeDtypeStruct((t_len,) + shapes[lvl], vid.dtype)
                  for lvl in kept]
    in_specs = [pl.BlockSpec((1, h, w), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM)]
    out_specs = [
        pl.BlockSpec((1,) + shapes[lvl],
                     lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
        for lvl in kept
    ]
    return pl.pallas_call(
        kernel,
        grid=(t_len,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(vid)
