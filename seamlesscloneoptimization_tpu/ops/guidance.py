"""Guidance gradient field for Poisson image editing (planar CHW f32).

TPU-native equivalent of the fused pre-processing gradient kernel
(``pre_process_kernel_gradient``, seamlessClone-CUDA/seamlessClone_imp.cpp:
1920-1964): forward-difference gradients of destination ROI and patch,
blended per pixel by the eroded mask. All three clone modes are implemented
(the reference has NORMAL only at seamlessClone_imp.cu:301; MIXED and
MONOCHROME follow OpenCV 3.4.5's definitions).

Everything here is elementwise/shift arithmetic that XLA fuses into a single
VPU stencil pass over the ROI.
"""

from __future__ import annotations

import jax.numpy as jnp

NORMAL_CLONE = 1
MIXED_CLONE = 2
MONOCHROME_TRANSFER = 3


def gradient_x(img: jnp.ndarray) -> jnp.ndarray:
    """Forward difference along the last axis; last column zero (reflect-101).

    img: (..., H, W) float32.
    """
    g = img[..., :, 1:] - img[..., :, :-1]
    return jnp.pad(g, [(0, 0)] * (img.ndim - 1) + [(0, 1)])


def gradient_y(img: jnp.ndarray) -> jnp.ndarray:
    """Forward difference along the second-to-last axis; last row zero."""
    g = img[..., 1:, :] - img[..., :-1, :]
    pad = [(0, 0)] * (img.ndim - 2) + [(0, 1), (0, 0)]
    return jnp.pad(g, pad)


def bgr_to_gray_u8(img_chw: jnp.ndarray) -> jnp.ndarray:
    """OpenCV BGR2GRAY with shift-15 fixed-point rounding, (3,H,W) f32 -> (H,W) f32.

    Matches cv2.cvtColor's integer arithmetic exactly (verified vs cv2 5.0):
    gray = (B*3735 + G*19235 + R*9798 + 2^14) >> 15 on u8 inputs.
    """
    b = img_chw[0].astype(jnp.int32)
    g = img_chw[1].astype(jnp.int32)
    r = img_chw[2].astype(jnp.int32)
    gray = (b * 3735 + g * 19235 + r * 9798 + (1 << 14)) >> 15
    return gray.astype(jnp.float32)


def guidance_field(
    dest_roi: jnp.ndarray,
    patch: jnp.ndarray,
    mask_eroded: jnp.ndarray,
    flags: int = NORMAL_CLONE,
    mixed_rule: str = "opencv",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Blended guidance gradients (gx, gy), each (C, H, W) f32.

    dest_roi, patch: (C, H, W) float32. mask_eroded: (H, W) uint8.
    flags is a static Python int (switches are resolved at trace time).
    mixed_rule: "opencv" = the comparison cv2 actually ships for MIXED
    (|gx_p - gy_p| > |gx_d - gy_d|, strict, per channel — bit-parity,
    verified vs cv2 5.0); "norm" = the Perez-paper larger-|grad|^2 variant.
    """
    m = (mask_eroded.astype(jnp.float32) / 255.0)[None, :, :]
    gx_d, gy_d = gradient_x(dest_roi), gradient_y(dest_roi)
    if flags == NORMAL_CLONE:
        gx_p, gy_p = gradient_x(patch), gradient_y(patch)
    elif flags == MIXED_CLONE:
        gx_p, gy_p = gradient_x(patch), gradient_y(patch)
        if mixed_rule == "norm":
            take_d = (gx_p * gx_p + gy_p * gy_p) < (gx_d * gx_d + gy_d * gy_d)
        else:
            take_d = jnp.abs(gx_p - gy_p) <= jnp.abs(gx_d - gy_d)
        gx_p = jnp.where(take_d, gx_d, gx_p)
        gy_p = jnp.where(take_d, gy_d, gy_p)
    elif flags == MONOCHROME_TRANSFER:
        gray = bgr_to_gray_u8(patch)
        c = patch.shape[0]
        gx_p = jnp.broadcast_to(gradient_x(gray)[None], (c,) + gray.shape)
        gy_p = jnp.broadcast_to(gradient_y(gray)[None], (c,) + gray.shape)
    else:
        raise ValueError(f"unknown clone flags={flags}")
    gx = (1.0 - m) * gx_d + m * gx_p
    gy = (1.0 - m) * gy_d + m * gy_p
    return gx, gy
