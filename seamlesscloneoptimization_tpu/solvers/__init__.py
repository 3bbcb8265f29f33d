"""Poisson solvers on the interior grid.

All solvers share one contract:

    solve(g: f32[C, H, W]) -> f32[C, H, W]

solving the 5-point Dirichlet system  A u = g  where
``A u = u[i-1,j] + u[i+1,j] + u[i,j-1] + u[i,j+1] - 4 u[i,j]`` with an
implicit zero frame (the Dirichlet boundary values are already folded into
``g`` by ops/rhs.py).

- dst_gemm: exact direct solve via the DST eigenbasis as batched GEMMs (MXU).
  TPU-native redesign of the reference's cuBLAS path (seamlessClone_imp.cpp:
  1322-1334).
- dst_fft: exact direct solve via FFT-based DST (odd extension). TPU-native
  redesign of the reference's cuFFT path (seamlessClone_imp.cpp:1694-1918).
- jacobi: red-black Gauss-Seidel relaxation (iterative; the smoother).
- multigrid: geometric multigrid V-cycles with red-black smoothing (the
  north-star iterative solver; O(N) per digit of accuracy).
"""

from seamlesscloneoptimization_tpu.solvers.dst_gemm import solve_dst_gemm
from seamlesscloneoptimization_tpu.solvers.dst_fft import solve_dst_fft
from seamlesscloneoptimization_tpu.solvers.jacobi import solve_redblack, redblack_sweep
from seamlesscloneoptimization_tpu.solvers.multigrid import solve_multigrid

# Direct DST-GEMM is O(N^1.5) FLOPs on the MXU; multigrid is O(N). Pinned
# from measured v5e solver-only times (docs/PERF.md, tools/time_solver.py,
# 2026-08-18): at 3x2798x3798 (10.6 MP) dst_gemm(bf16_3x) 22.1 ms vs
# multigrid tol-2e-4 48.8 ms; extrapolating the O(N^1.5)-vs-O(N) constants
# puts the crossover near ~50 MP interiors, where the GEMM eigenbasis
# matrices alone reach hundreds of MB of HBM.
AUTO_CROSSOVER_PIXELS = 50_000_000


def auto_solver_name(shape, crossover: int = AUTO_CROSSOVER_PIXELS) -> str:
    """The size-based selection rule, exposed for tests/introspection."""
    _, h, w = shape
    return "multigrid" if h * w > crossover else "dst_gemm"


def solve_auto(g, precision: str = "highest", tol: float = 1e-4,
               crossover: int = AUTO_CROSSOVER_PIXELS,
               folded: bool = False, padded: bool = False, **_ignored):
    """Size-based solver selection (static under jit: shapes are trace-time).

    ``folded``/``padded`` forward to the selected solver's even/odd-folded
    GEMMs / rounded-space V-cycles respectively (see those solvers).
    """
    import jax

    if auto_solver_name(g.shape, crossover) == "multigrid":
        return solve_multigrid(g, tol=tol, padded=padded,
                               use_pallas=jax.default_backend() == "tpu")
    return solve_dst_gemm(g, precision=precision, folded=folded)


SOLVERS = {
    "dst_gemm": solve_dst_gemm,
    "dst_fft": solve_dst_fft,
    "jacobi": solve_redblack,
    "multigrid": solve_multigrid,
    "auto": solve_auto,
}

__all__ = [
    "SOLVERS",
    "solve_auto",
    "solve_dst_gemm",
    "solve_dst_fft",
    "solve_redblack",
    "redblack_sweep",
    "solve_multigrid",
]
