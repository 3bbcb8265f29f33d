"""Runtime configuration (replaces the reference's compile-time #defines).

The reference configures via preprocessor flags (SCDEBUG imp.h:13,
SC_FFT_ENABLE imp.h:15, SC_Enable_Cooperative_Group imp.h:14, LOOPS
imp.cu:290). Here it is a runtime dataclass: solver choice, clone mode,
tolerances, debug dumping — no rebuild required.
"""

from __future__ import annotations

import dataclasses
import os

_DEFAULT_CACHE_DIR = os.environ.get(
    "SCL_TPU_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "seamlessclone_tpu", "jax"),
)

NORMAL_CLONE = 1
MIXED_CLONE = 2
MONOCHROME_TRANSFER = 3


@dataclasses.dataclass(frozen=True)
class CloneConfig:
    """Configuration for a SeamlessClone engine instance."""

    solver: str = "auto"  # auto | dst_gemm | dst_fft | jacobi | multigrid
    # The measured-fast path IS the default (the reference ships its best
    # path as the default too: SC_FFT_ENABLE, seamlessClone_imp.h:15): a
    # bare CloneConfig() reproduces the bench.py headline configuration
    # (docs/PERF.md), INCLUDING the solver choice — "auto" resolves per
    # compiled program with the measured crossovers (7 MP single-shot /
    # 9 MP chained serve, solvers/__init__.py), so a <7 MP patch runs the
    # folded-bf16_3x DST GEMMs and an 8K patch runs the quarter-plane
    # multigrid that is both faster and better-conditioned there (direct
    # f32 rel-residual 1.7e-2 at 10.6 MP vs multigrid's 1.5e-4 — PERF.md).
    # On a CPU backend the Pallas flags degrade safely to the XLA path
    # (models/pipeline.py backend gate); precision/folded apply everywhere.
    precision: str = "high"  # dst_gemm MXU passes: highest (f32) | high (bf16_3x)
    dst_folded: bool = True  # even/odd-folded DST GEMMs: half the MXU FLOPs
    # per transform (solvers/dst_gemm.py:dst_matrices_folded); applies to
    # both the generic solve_dst_gemm path and the Pallas serve chain
    flags: int = NORMAL_CLONE
    mixed_rule: str = "opencv"  # MIXED_CLONE comparison: "opencv" (bit-parity
    # with shipped cv2: strict |gx_p-gy_p| > |gx_d-gy_d|) | "norm" (the
    # Perez-paper larger-|grad|^2 variant, OpenCV-3.4.5 style)
    tol: float = 1e-4  # relative residual tolerance (iterative solvers)
    max_iters: int = 10000  # jacobi sweep cap
    max_cycles: int = 60  # multigrid V-cycle cap
    mg_cycles: int | None = None  # fixed-work multigrid: FMG + N cycles, no checks
    use_pallas_smoother: bool = True  # fused k-sweep Pallas smoother (TPU only)
    mg_padded: bool | str = "q"  # rounded-space multigrid mode (TPU only):
    # "q" = quarter-plane finest level + transpose-fused coarse chain
    #       (solvers/multigrid.py vcycle_q/vcycle_t) — the 2026-08-20 v5e
    #       default: tol=2e-4 solve 10.06 -> 6.28 ms at 3x1550x2398, fixed-4
    #       7.8 -> 4.09; 8K fixed-4 12.63 ms = parity with folded dst_gemm.
    # "t" = dense alternating-orientation chain (vcycle_t), within noise of
    #       "q" in tol mode, ~10% behind in fixed-cycles mode.
    # True = round-2 blocked-ghost vcycle_p (kept for A/B); False = element.
    use_pallas_preprocess: bool = True  # one-pass Pallas erode+guidance+RHS (TPU only)
    use_pallas_postprocess: bool = True  # layout-aware Pallas blend (TPU;
    # dst_gemm and multigrid mg_padded="q" — the engine gates per solver)
    debug_dump: bool = False  # save per-stage arrays (ref: SCDEBUG dumps)
    debug_dir: str = "/tmp/scl_debug"
    donate_dst: bool = False  # buffer-donate dst for in-place update
    bbox_bucket: int = 0  # round bbox sizes up to this multiple (0 = exact).
    # Bucketing amortizes compiles across varying mask sizes in serving: the
    # ROI is enlarged around the mask (mask stays exact), which moves the
    # Poisson Dirichlet frame outward — output remains seamless (solved with
    # MORE context) but differs from cv2's tight-bbox result by ~30-45 dB
    # PSNR on rough content (measured diff_max 31 at bucket=128 on the
    # airplane/sky pair). bucket_exact removes that trade-off.
    bucket_exact: bool = False  # with bbox_bucket: solve the TIGHT Poisson
    # system inside the bucketed shapes via the runtime-domain multigrid
    # (solvers/multigrid_dyn.py) — bit-parity with the tight solve (and cv2)
    # at bucketed compile counts. Uses tol/mg_cycles; ignores `solver`.
    compilation_cache_dir: str | None = _DEFAULT_CACHE_DIR  # persistent XLA cache
    # (the TPU-native FFTParams plan cache, SURVEY §5.4: compiles survive
    # process restarts; None disables)

    def solver_kwargs(self) -> dict:
        if self.solver == "jacobi":
            return {"tol": self.tol, "max_iters": self.max_iters,
                    "use_pallas": self.use_pallas_smoother}
        if self.solver == "multigrid":
            return {"tol": self.tol, "max_cycles": self.max_cycles,
                    "use_pallas": self.use_pallas_smoother,
                    "cycles": self.mg_cycles, "padded": self.mg_padded}
        if self.solver == "dst_gemm":
            return {"precision": self.precision, "folded": self.dst_folded}
        if self.solver == "auto":
            return {"precision": self.precision, "tol": self.tol,
                    "folded": self.dst_folded, "padded": self.mg_padded,
                    "cycles": self.mg_cycles}
        return {}

    def cache_key_extras(self) -> tuple:
        return (self.solver, self.precision, self.dst_folded, self.flags,
                self.mixed_rule, self.tol,
                self.max_iters, self.max_cycles, self.mg_cycles, self.mg_padded,
                self.use_pallas_smoother, self.use_pallas_preprocess,
                self.use_pallas_postprocess, self.bbox_bucket,
                self.bucket_exact)
