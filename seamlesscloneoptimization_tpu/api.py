"""Functional API mirroring OpenCV's signature.

``seamless_clone(src, dst, mask, center, flags)`` is a drop-in for
``cv2.seamlessClone`` (same argument order/semantics, returns uint8 HWC), with
TPU extensions: solver choice and batching. One module-level engine caches
compilations across calls (the reference's lazy instance creation,
seamlessClone-python-binding/SeamlessClone.cpp:108-118).
"""

from __future__ import annotations

import numpy as np

from seamlesscloneoptimization_tpu.core.config import (
    MIXED_CLONE,
    MONOCHROME_TRANSFER,
    NORMAL_CLONE,
    CloneConfig,
)
from seamlesscloneoptimization_tpu.core.engine import BoundedCache, SeamlessClone

_engines: dict = BoundedCache(maxsize=16)  # LRU: engines hold jit caches


def _engine(solver: str, tol: float) -> SeamlessClone:
    key = (solver, tol)
    eng = _engines.get(key)
    if eng is None:
        eng = SeamlessClone(CloneConfig(solver=solver, tol=tol))
        _engines[key] = eng
    return eng


def seamless_clone(
    src,
    dst,
    mask,
    center: tuple[int, int],
    flags: int = NORMAL_CLONE,
    *,
    solver: str = "auto",  # auto|dst_gemm|dst_fft|jacobi|multigrid
    tol: float = 1e-4,
    to_numpy: bool = True,
):
    """Seamlessly clone ``src`` (under ``mask``) into ``dst`` centered at ``center``.

    Args mirror cv2.seamlessClone; extras select the Poisson solver.
    Returns uint8 HWC (numpy if to_numpy else a JAX device array).
    """
    out = _engine(solver, tol).run(src, dst, mask, center, flags)
    return np.asarray(out) if to_numpy else out


def seamless_clone_batch(
    srcs,
    dst,
    masks,
    centers,
    flags: int = NORMAL_CLONE,
    *,
    solver: str = "auto",
    tol: float = 1e-4,
):
    """Composite N (src, mask, center) jobs into one destination sequentially.

    Non-overlapping ROIs compose exactly; overlapping ROIs apply in order.
    (The fused batched solve for same-shaped jobs lives in
    parallel/batch.py: ``seamless_clone_vmapped``.)
    """
    eng = _engine(solver, tol)
    out = np.asarray(dst)
    for src, mask, center in zip(srcs, masks, centers):
        out = np.asarray(eng.run(src, out, mask, center, flags))
    return out


def seamless_clone_batch_fused(dst, srcs, masks, centers, flags: int = NORMAL_CLONE):
    """Fused batch: N jobs bucketed to one shape, solved as ONE batched program.

    The "64 masks into one 4K destination" configuration — see
    parallel/batch.py:seamless_clone_batch_fused for semantics.
    """
    from seamlesscloneoptimization_tpu.parallel.batch import (
        seamless_clone_batch_fused as _fused,
    )

    return _fused(dst, srcs, masks, centers, flags)


def _local_edit(src, mask, kind, params, edge_mask=None, to_numpy=True):
    import jax.numpy as jnp

    from seamlesscloneoptimization_tpu.ops.edit import (
        erode3x3_replicate,
        local_edit_planar,
    )

    src = np.asarray(src)
    if mask is None:
        mask = np.full(src.shape[:2], 255, np.uint8)
    m01 = (np.asarray(mask) != 0).astype(np.float32)
    me = erode3x3_replicate(jnp.asarray(m01))
    src_p = jnp.asarray(np.transpose(src, (2, 0, 1)))
    em = jnp.asarray(edge_mask.astype(np.float32) / 255.0) if edge_mask is not None else None
    out = local_edit_planar(src_p, me, jnp.asarray(params, jnp.float32), em,
                            kind=kind)
    out = jnp.transpose(out, (1, 2, 0))
    return np.asarray(out) if to_numpy else out


def color_change(src, mask=None, red_mul: float = 1.0, green_mul: float = 1.0,
                 blue_mul: float = 1.0, *, to_numpy: bool = True):
    """Drop-in for ``cv2.colorChange(src, mask, red_mul, green_mul, blue_mul)``:
    multiplies the gradient field inside ``mask`` per channel and re-solves.
    Factors are traced — sweeping them reuses one compiled program."""
    from seamlesscloneoptimization_tpu.ops.edit import COLOR_CHANGE

    return _local_edit(src, mask, COLOR_CHANGE,
                       [blue_mul, green_mul, red_mul], to_numpy=to_numpy)


def illumination_change(src, mask=None, alpha: float = 0.2, beta: float = 0.4,
                        *, to_numpy: bool = True):
    """Drop-in for ``cv2.illuminationChange``: attenuates gradients inside
    ``mask`` by ``alpha^beta * |g|^-beta`` (Perez et al. §4, local illumination
    changes) and re-solves. alpha/beta are traced scalars."""
    from seamlesscloneoptimization_tpu.ops.edit import ILLUMINATION_CHANGE

    return _local_edit(src, mask, ILLUMINATION_CHANGE, [alpha, beta],
                       to_numpy=to_numpy)


def texture_flattening(src, mask=None, low_threshold: float = 30.0,
                       high_threshold: float = 45.0, kernel_size: int = 3,
                       *, to_numpy: bool = True):
    """Drop-in for ``cv2.textureFlattening``: keeps only gradients at Canny
    edge locations inside ``mask`` (washes out texture, preserves structure).
    The Canny edge map is host-side input prep (cv2), like mask decoding."""
    import cv2

    from seamlesscloneoptimization_tpu.ops.edit import TEXTURE_FLATTENING

    src = np.asarray(src)
    m = (np.full(src.shape[:2], 255, np.uint8) if mask is None
         else np.asarray(mask))
    masked = np.where(m[..., None] != 0, src, 0).astype(np.uint8)
    edges = cv2.Canny(masked, low_threshold, high_threshold,
                      apertureSize=kernel_size)
    return _local_edit(src, m, TEXTURE_FLATTENING, [0.0], edge_mask=edges,
                       to_numpy=to_numpy)


__all__ = [
    "seamless_clone",
    "seamless_clone_batch",
    "seamless_clone_batch_fused",
    "color_change",
    "illumination_change",
    "texture_flattening",
    "NORMAL_CLONE",
    "MIXED_CLONE",
    "MONOCHROME_TRANSFER",
]
