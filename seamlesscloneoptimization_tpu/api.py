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
from seamlesscloneoptimization_tpu.core.engine import SeamlessClone

_engines: dict = {}


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
    solver: str = "dst_gemm",  # dst_gemm|dst_fft|jacobi|multigrid|auto
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
    solver: str = "dst_gemm",
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


__all__ = [
    "seamless_clone",
    "seamless_clone_batch",
    "seamless_clone_batch_fused",
    "NORMAL_CLONE",
    "MIXED_CLONE",
    "MONOCHROME_TRANSFER",
]
