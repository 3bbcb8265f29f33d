"""Post-processing: clamp, truncate-cast, insert solved interior into the ROI.

TPU-native equivalent of the reference's fused ``post_processing`` kernel
(seamlessClone-CUDA/seamlessClone_imp.cpp:2078-2103). Truncation (not
rounding) after clamping to [0, 255] matches OpenCV's ``Cloning::solve``
cast semantics, which the bit-closeness target requires.
"""

from __future__ import annotations

import jax.numpy as jnp


def postprocess_roi(u: jnp.ndarray, dest_roi_u8: jnp.ndarray) -> jnp.ndarray:
    """Insert solved interior into the destination ROI.

    u: (C, H-2, W-2) float32 solution. dest_roi_u8: (C, H, W) uint8.
    Returns (C, H, W) uint8 blended ROI.
    """
    interior = jnp.clip(u, 0.0, 255.0).astype(jnp.uint8)  # f32->u8 truncates
    return dest_roi_u8.at[:, 1:-1, 1:-1].set(interior)
