"""Batched clone: N same-shaped (patch, mask, center) jobs in one fused step.

The "64 masks into one 4K destination" configuration: ROIs are bucketed to a
common static shape, all N Poisson problems solve as ONE batched program
(the channel batch of the DST GEMMs simply grows N*C — bigger MXU matmuls,
better utilization), then the solved ROIs composite into the destination
with a scan of dynamic_update_slices.

Semantics: jobs whose ROIs overlap composite in order (later wins where both
wrote); non-overlapping jobs match N independent seamless_clone calls
bit-for-bit.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from seamlesscloneoptimization_tpu.models.pipeline import clone_roi


@partial(jax.jit, static_argnames=("flags", "solver"))
def clone_roi_batch(
    dest_rois: jnp.ndarray,
    patches: jnp.ndarray,
    mask_rois: jnp.ndarray,
    flags: int,
    solver: Callable[..., jnp.ndarray],
):
    """vmapped clone over (N, C, H, W) u8 ROI stacks. Returns (N, C, H, W) u8."""
    return jax.vmap(lambda d, p, m: clone_roi(d, p, m, flags, solver))(
        dest_rois, patches, mask_rois
    )


@partial(jax.jit, static_argnames=("flags", "solver", "roi_hw"))
def clone_batch_composite(
    dst: jnp.ndarray,
    srcs: jnp.ndarray,
    masks: jnp.ndarray,
    left_tops: jnp.ndarray,
    flags: int,
    solver: Callable[..., jnp.ndarray],
    roi_hw: tuple[int, int],
):
    """Full fused batch step: N patches into one destination.

    dst: (H, W, C) u8. srcs: (N, bh, bw, C) u8 pre-cropped to the common
    bucket. masks: (N, bh, bw) u8 (pre-cropped, border handled by caller).
    left_tops: (N, 2) int32 paste offsets. Returns (H, W, C) u8.
    """
    bh, bw = roi_hw
    n = srcs.shape[0]
    c = dst.shape[2]

    # Gather destination ROIs (vmapped dynamic slices).
    def gather(lt):
        return jax.lax.dynamic_slice(dst, (lt[1], lt[0], 0), (bh, bw, c))

    dest_rois = jax.vmap(gather)(left_tops)  # (N, bh, bw, C)

    d_p = jnp.transpose(dest_rois, (0, 3, 1, 2))
    s_p = jnp.transpose(srcs, (0, 3, 1, 2))
    s_p = jnp.where(masks[:, None] != 0, s_p, jnp.uint8(0))
    blended = clone_roi_batch(d_p, s_p, masks, flags, solver)  # (N, C, bh, bw)
    blended = jnp.transpose(blended, (0, 2, 3, 1))  # (N, bh, bw, C)

    # Composite sequentially (deterministic order for overlaps).
    def body(i, out):
        lt = left_tops[i]
        return jax.lax.dynamic_update_slice(out, blended[i], (lt[1], lt[0], jnp.int32(0)))

    return jax.lax.fori_loop(0, n, body, dst)
