"""Spatial tensor parallelism: width-sharded pyramid ops with halo exchange.

For single very large frames (e.g. 4K monitoring) the frame's W axis can be
sharded across ICI neighbors (SURVEY.md §2.2 "TP" row).  The 5-tap pyrDown
stencil then needs a 2-pixel halo from each neighbor: implemented with
``shard_map`` + ``lax.ppermute`` ring exchanges (XLA lowers these onto ICI),
with global REFLECT_101 semantics reconstructed at the outer edges so the
sharded result is bit-identical to the single-device kernel.

Constraints: the local width per shard must be even and >= 4 so output
phases align across shards (global output 2j maps to local output j).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from respmon_tpu.ops.pyramid import _K5, _down_axis


def _local_down_w(xp: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 5-tap conv along the last axis of an already-halo-padded
    block (width Wl + 4) producing Wl // 2 outputs."""
    wl = xp.shape[-1] - 4
    out_n = wl // 2
    acc = None
    for k, w in enumerate(_K5):
        term = xp[..., k:k + 2 * out_n:2] * w
        acc = term if acc is None else acc + term
    return acc


@lru_cache(maxsize=64)
def _make_pyr_down_w_sharded(mesh: Mesh, axis: str, ndim: int,
                             n_shards: int):
    """Build (once per (mesh, axis, ndim)) the jitted shard_map pyrDown —
    cached so repeat calls reuse the compiled program instead of re-tracing
    a fresh closure every invocation."""
    in_spec = P(*([None] * (ndim - 1) + [axis]))
    out_spec = in_spec

    def local(xl):
        idx = jax.lax.axis_index(axis)
        n = n_shards
        # Ring halo exchange: each shard sends its boundary columns.
        send_right = [(i, (i + 1) % n) for i in range(n)]
        send_left = [(i, (i - 1) % n) for i in range(n)]
        left_halo = jax.lax.ppermute(xl[..., -2:], axis, send_right)
        right_halo = jax.lax.ppermute(xl[..., :2], axis, send_left)
        # Global REFLECT_101 at the outer image edges (cols 2,1 and
        # W-3, W-2 in local coordinates).
        left_reflect = xl[..., 2:0:-1]
        right_reflect = xl[..., -2:-4:-1]
        left = jnp.where(idx == 0, left_reflect, left_halo)
        right = jnp.where(idx == n - 1, right_reflect, right_halo)
        xp = jnp.concatenate([left, xl, right], axis=-1)
        # Rows are unsharded: plain reflect-101 row pass first.
        rows_done = _down_axis(xp, ndim - 2)
        return _local_down_w(rows_done)

    return jax.jit(
        jax.shard_map(local, mesh=mesh, in_specs=(in_spec,),
                      out_specs=out_spec))


def pyr_down_w_sharded(x: jnp.ndarray, mesh: Mesh,
                       axis: str = "space") -> jnp.ndarray:
    """cv2-exact pyrDown of (..., H, W) with W sharded over ``mesh[axis]``.

    Requires W % (2 * mesh.shape[axis]) == 0.
    """
    n_shards = mesh.shape[axis]
    w = x.shape[-1]
    assert w % (2 * n_shards) == 0, \
        f"width {w} must be divisible by 2*{n_shards}"
    fn = _make_pyr_down_w_sharded(mesh, axis, x.ndim, n_shards)
    x = jax.device_put(
        x, NamedSharding(mesh, P(*([None] * (x.ndim - 1) + [axis]))))
    return fn(x)
