"""Local gradient-domain editing: the OpenCV photo-module family on TPU.

cv2's ``colorChange`` / ``illuminationChange`` / ``textureFlattening`` share
the seamless-clone machinery — same Poisson solve, same Dirichlet treatment —
but run on the WHOLE image (interior (H-2, W-2), boundary = the image border)
with the guidance gradients modified only inside the 3x-eroded mask. The
reference CUDA repo implements none of them (NORMAL_CLONE only,
seamlessClone-CUDA/seamlessClone_imp.cu:301); the rules below were pinned
empirically against cv2 5.0 to diff_max <= 1 (core/reference.py:local_edit_np
is the NumPy oracle; tests/test_jax_pipeline.py:TestLocalEdits fuzzes both).

One jitted program per (image shape, kind): edit parameters (channel factors,
alpha/beta) are traced scalars, so sweeping them never recompiles — the knob
the reference reserves for rebuilds (#define-style config, SURVEY §5.6).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from seamlesscloneoptimization_tpu.ops.guidance import gradient_x, gradient_y
from seamlesscloneoptimization_tpu.ops.postprocess import postprocess_roi
from seamlesscloneoptimization_tpu.ops.rhs import poisson_rhs

COLOR_CHANGE = "color_change"
ILLUMINATION_CHANGE = "illumination_change"
TEXTURE_FLATTENING = "texture_flattening"


@partial(jax.jit, static_argnames=("iterations",))
def erode3x3_replicate(mask01: jnp.ndarray, iterations: int = 3) -> jnp.ndarray:
    """(H, W) {0,1} -> 3x3-eroded {0,1}, out-of-bounds counting as SET.

    cv2.erode's default border for erosion (replicate-max): border pixels
    survive unless an in-image neighbor is zero — unlike seamlessClone's
    zero-border myErode (ops/mask.py), because the local-edit path never
    border-zeroes its mask.
    """
    m = mask01.astype(jnp.float32)
    for _ in range(iterations):
        p = jnp.pad(m, 1, constant_values=1.0)
        acc = m
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                acc = jnp.minimum(
                    acc, p[1 + dy : 1 + dy + m.shape[0], 1 + dx : 1 + dx + m.shape[1]]
                )
        m = acc
    return m


def edit_guidance(src_f, me, params, edge_mask, *, kind):
    """The per-kind guidance-field modification — ONE source of truth.

    Shared by the single-device path (``local_edit_planar``) and the sharded
    path (parallel/clone_tiled.py:_local_edit_sharded); the rules are pinned
    bit-close to cv2 (diff_max <= 1), so any drift between the two paths is
    a silent parity break — they must not re-implement each other.

    src_f: (C, H, W) f32 image. me: (H, W) f32 {0,1} eroded mask.
    Returns (gx, gy): the modified guidance field (outside-mask gradients
    untouched, inside-mask gradients transformed per ``kind``). Every op is
    elementwise or a static-shift stencil, so the function is tile-local
    under any (C, 'ty', 'tx') sharding — XLA inserts only the one-pixel
    halo exchanges of the gradients.
    """
    gx_d = gradient_x(src_f)
    gy_d = gradient_y(src_f)
    me = me[None, :, :] if me.ndim == 2 else me
    gxm = gx_d * me
    gym = gy_d * me
    if kind == COLOR_CHANGE:
        fac = params[:, None, None]
        gxm, gym = gxm * fac, gym * fac
    elif kind == ILLUMINATION_CHANGE:
        alpha, beta = params[0], params[1]
        mag = jnp.sqrt(gxm * gxm + gym * gym)
        # alpha^beta * |g|^-beta; zero gradients stay zero (cv2's patchNaNs)
        scale = jnp.where(mag > 0.0, (alpha**beta) * mag ** (-beta), 0.0)
        gxm, gym = gxm * scale, gym * scale
    elif kind == TEXTURE_FLATTENING:
        e = edge_mask[None, :, :]
        gxm, gym = gxm * e, gym * e
    else:
        raise ValueError(f"unknown edit kind={kind!r}")
    gx = gx_d * (1.0 - me) + gxm
    gy = gy_d * (1.0 - me) + gym
    return gx, gy


@partial(jax.jit, static_argnames=("kind", "crossover"), donate_argnums=())
def local_edit_planar(
    src_p: jnp.ndarray,
    mask_eroded: jnp.ndarray,
    params: jnp.ndarray,
    edge_mask: jnp.ndarray | None = None,
    *,
    kind: str,
    crossover: int | None = None,
) -> jnp.ndarray:
    """Gradient-domain edit of a planar (C, H, W) u8 image, full-image solve.

    mask_eroded: (H, W) f32 in {0, 1} — the 3x-eroded (replicate-border)
    edit mask. params (traced, never recompiles):
      COLOR_CHANGE        (C,) per-channel gradient factors, BGR order
      ILLUMINATION_CHANGE (2,) [alpha, beta]
      TEXTURE_FLATTENING  unused (pass zeros); edge_mask (H, W) f32 {0,1} is
                          the host-computed Canny edge map
    Returns the edited planar u8 image.
    """
    from seamlesscloneoptimization_tpu.solvers import (
        AUTO_CROSSOVER_PIXELS,
        solve_auto,
    )

    src_f = src_p.astype(jnp.float32)
    gx, gy = edit_guidance(src_f, mask_eroded, params, edge_mask, kind=kind)
    g = poisson_rhs(gx, gy, src_f)
    # The editing family solves on the WHOLE image, so huge panoramas cross
    # the same solver crossover the clone engine's "auto" applies (7 MP —
    # beyond it the direct path is slower, its f32 conditioning degrades,
    # and its O(H^2+W^2) eigenbasis approaches the HBM budget). solve_auto
    # dispatches: below the crossover the exact direct solve keeps this
    # path's historical bit-exact configuration (f32, unfolded); above it
    # the quarter-plane multigrid (padded="q") solves to 1e-5 (the same
    # tolerance the sharded local_edit_tiled uses — well past u8
    # quantization). ``crossover`` (trace-time static) exists for tests;
    # None = the measured constant.
    u = solve_auto(g, tol=1e-5, precision="highest", folded=False,
                   padded="q",
                   crossover=(crossover if crossover is not None
                              else AUTO_CROSSOVER_PIXELS))
    return postprocess_roi(u, src_p)
