"""TPU-native seamless-clone engine (Poisson image editing).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
wujinzhong/seamlessCloneOptimization (a single-GPU CUDA re-implementation of
OpenCV's ``seamlessClone``), built TPU-first:

- fused XLA/Pallas pre-processing (layout, mask erode, guidance, Poisson RHS)
- direct DST Poisson solvers on the MXU (batched GEMM) and via FFT
- iterative red-black Jacobi and geometric multigrid V-cycle solvers
- tile-based domain decomposition over a ``jax.sharding.Mesh`` with
  halo exchange for multi-chip scaling
"""

from seamlesscloneoptimization_tpu.core.reference import (
    MIXED_CLONE,
    MONOCHROME_TRANSFER,
    NORMAL_CLONE,
    seamless_clone_np,
)

__version__ = "0.1.0"

__all__ = [
    "NORMAL_CLONE",
    "MIXED_CLONE",
    "MONOCHROME_TRANSFER",
    "seamless_clone_np",
    "seamless_clone",
    "SeamlessClone",
    "TiledSeamlessClone",
]


def __getattr__(name):
    # Lazy imports keep `import seamlesscloneoptimization_tpu` cheap and
    # JAX-free for NumPy-only users (e.g. the oracle tests).
    if name == "seamless_clone":
        from seamlesscloneoptimization_tpu.api import seamless_clone

        return seamless_clone
    if name == "SeamlessClone":
        from seamlesscloneoptimization_tpu.core.engine import SeamlessClone

        return SeamlessClone
    if name == "TiledSeamlessClone":
        from seamlesscloneoptimization_tpu.parallel import TiledSeamlessClone

        return TiledSeamlessClone
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
