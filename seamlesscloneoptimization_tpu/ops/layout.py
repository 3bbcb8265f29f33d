"""Layout conversion: interleaved HWC uint8 <-> planar CHW float32.

TPU-native replacement for the reference's RGBI->RGBP kernel
(``Mat2SCImage_kernel``, seamlessClone-CUDA/seamlessClone_imp.cpp:361-402),
whose planar-layout lesson (PDF §2.2.2: 29.4ms -> 0.95ms) carries over: all
internal compute is planar f32, channels as a leading batch dimension so the
per-channel Poisson solves batch cleanly onto the MXU.

Under XLA this is a fused transpose+convert; no hand-written kernel needed
(the fusion IS the optimization the reference hand-built).
"""

from __future__ import annotations

import jax.numpy as jnp


def interleaved_to_planar(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) uint8 -> (C, H, W) float32."""
    return jnp.transpose(img, (2, 0, 1)).astype(jnp.float32)


def planar_to_interleaved(img: jnp.ndarray) -> jnp.ndarray:
    """(C, H, W) -> (H, W, C), dtype preserved."""
    return jnp.transpose(img, (1, 2, 0))
