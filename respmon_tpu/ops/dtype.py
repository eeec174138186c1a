"""dtype conversion helpers matching the reference's converters.

The reference converters (transforms.py:16-35) have one load-bearing quirk:
``float_to_uint8`` writes ``img * 255`` into a uint8 ndarray, which in numpy
truncates toward zero and wraps modulo 256 instead of clipping.  Downstream
code relies on this (e.g. normalized heatmaps hit exactly 255 at the max).
We reproduce the wrap semantics explicitly.
"""

from __future__ import annotations

import jax.numpy as jnp


def uint8_to_float(img: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 [0,255] -> float [0,1] (reference transforms.py:20-23)."""
    return img.astype(dtype) * (1.0 / 255.0)


def float_to_uint8(img: jnp.ndarray) -> jnp.ndarray:
    """float [0,1] -> uint8, with numpy-style trunc-and-wrap out-of-range
    semantics (reference transforms.py:26-29 stores into a uint8 ndarray,
    which wraps mod 256 rather than saturating)."""
    scaled = jnp.trunc(img.astype(jnp.float32) * 255.0)
    wrapped = jnp.mod(scaled.astype(jnp.int32), 256)
    return wrapped.astype(jnp.uint8)


def float_to_int8(img: jnp.ndarray) -> jnp.ndarray:
    """Reference transforms.py:32-35 — note it also stores into *uint8*."""
    scaled = jnp.trunc(img.astype(jnp.float32) * 255.0) - 127.0
    wrapped = jnp.mod(scaled.astype(jnp.int32), 256)
    return wrapped.astype(jnp.uint8)


def normalize(data: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalize (reference ``nomrmalize`` [sic], transforms.py:16-17)."""
    lo = jnp.min(data)
    hi = jnp.max(data)
    return (data - lo) / (hi - lo)


def bgr_to_gray(frame: jnp.ndarray) -> jnp.ndarray:
    """BGR uint8 HxWx3 -> grayscale, cv2.cvtColor COLOR_BGR2GRAY semantics
    (reference base.py:230): y = 0.114 B + 0.587 G + 0.299 R, rounded."""
    weights = jnp.asarray([0.114, 0.587, 0.299], dtype=jnp.float32)
    y = jnp.tensordot(frame.astype(jnp.float32), weights, axes=([-1], [0]))
    return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)
