"""Mask pipeline: binarize, border-zero, 3x3 erosion.

TPU-native equivalent of the reference mask kernels
(``setMaskBoundaryToConstant`` seamlessClone_imp.cpp:967-976, ``myErode``
seamlessClone_imp.cpp:892-925 applied 3x at :1060-1062). The bounding-box
kernel (``calBoundingBox`` :927-963) has no device equivalent here: the mask
arrives from the host, so the bbox is computed host-side (NumPy) before
tracing — eliminating the reference's device->host sync at imp.cpp:1012
entirely instead of porting it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def binarize_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """uint8 mask -> {0,255} uint8 (nonzero -> 255)."""
    return jnp.where(mask != 0, jnp.uint8(255), jnp.uint8(0))


def erode3x3(mask: jnp.ndarray, iterations: int = 3) -> jnp.ndarray:
    """Binary 3x3 erosion with ZERO border, ``iterations`` times.

    The zero border erodes the mask inward from the bbox edge, matching the
    reference ``myErode`` (border forced 0) and OpenCV's erode-on-view
    semantics — required for bit-closeness (see core/reference.py).

    Implemented as a min reduce_window over an explicitly zero-padded mask;
    XLA lowers this to a vectorized stencil.
    """
    m = mask
    for _ in range(iterations):
        p = jnp.pad(m, 1, mode="constant", constant_values=0)
        m = jax.lax.reduce_window(
            p,
            jnp.uint8(255),
            jax.lax.min,
            window_dimensions=(3, 3),
            window_strides=(1, 1),
            padding="VALID",
        )
    return m
