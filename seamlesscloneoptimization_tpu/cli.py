"""CLI mirroring the reference's ``seamlessClone_main``.

Reference argv contract (seamlessClone-CUDA/seamlessClone_main.cu:74-80):

    ./seamlessClone_main src.yml dst.yml mask.yml centerX centerY gpu_id

Here:

    python -m seamlesscloneoptimization_tpu.cli src.yml dst.yml mask.yml \
        centerX centerY [device_id] [--solver S] [--flags F] [--loops N] \
        [--output-dir DIR]

Inputs are OpenCV-FileStorage YAML matrices (the reference's bit-exact
fixture format, read by the native C++ parser); outputs are the blended BMP
(``ucRGB_Output.bmp``, the reference artifact name, seamlessClone_imp.cu:
206-216) plus a result YAML, with the reference's timing/memory printout
(imp.cu:343-346).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="seamlessclone-tpu", description=__doc__)
    p.add_argument("src_yml")
    p.add_argument("dst_yml")
    p.add_argument("mask_yml")
    p.add_argument("center_x", type=int)
    p.add_argument("center_y", type=int)
    p.add_argument("device_id", type=int, nargs="?", default=0)
    p.add_argument("--solver", default="auto",
                   choices=["auto", "dst_gemm", "dst_fft", "jacobi", "multigrid"],
                   help="Poisson solver; auto (default) resolves per patch "
                        "size with the measured crossovers (7 MP single-shot "
                        "/ 9 MP serve — docs/PERF.md)")
    p.add_argument("--flags", type=int, default=1,
                   help="1=NORMAL_CLONE 2=MIXED_CLONE 3=MONOCHROME_TRANSFER")
    p.add_argument("--loops", type=int, default=1,
                   help="timed loops after warm-up (ref LOOPS, imp.cu:290)")
    p.add_argument("--output-dir", default="./output")
    p.add_argument("--debug-dump", action="store_true",
                   help="save per-stage arrays (ref SCDEBUG)")
    # fast-path knobs (defaults = the measured-fast CloneConfig defaults;
    # VERDICT r3: the CLI must be able to time every shipped configuration)
    p.add_argument("--precision", default=None, choices=["highest", "high"],
                   help="dst_gemm MXU tier: highest=f32, high=bf16_3x (default)")
    p.add_argument("--folded", dest="folded", default=None,
                   action="store_true",
                   help="even/odd-folded DST GEMMs (default on)")
    p.add_argument("--no-folded", dest="folded", action="store_false")
    p.add_argument("--pallas", dest="pallas", default=None, action="store_true",
                   help="Pallas pre/postprocess + smoother kernels (default "
                        "on; auto-degrades off-TPU)")
    p.add_argument("--no-pallas", dest="pallas", action="store_false")
    p.add_argument("--tol", type=float, default=None,
                   help="iterative-solver relative residual tolerance")
    p.add_argument("--mg-cycles", type=int, default=None,
                   help="fixed-work multigrid: exactly N V-cycles, no checks")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    from seamlesscloneoptimization_tpu import native

    if not native.HAVE_NATIVE:
        print("the native extension failed to build (g++ missing?); the CLI "
              "needs it for YAML/BMP IO", file=sys.stderr)
        return 3
    from seamlesscloneoptimization_tpu.core.config import CloneConfig
    from seamlesscloneoptimization_tpu.core.engine import SeamlessClone

    devices = jax.devices()
    if args.device_id >= len(devices):
        print(f"device {args.device_id} not available (have {len(devices)})", file=sys.stderr)
        return 2
    device = devices[args.device_id]
    print(f"using device {device} ({len(devices)} visible)")

    src = native.read_yaml_mat(args.src_yml)
    dst = native.read_yaml_mat(args.dst_yml)
    mask = native.read_yaml_mat(args.mask_yml)
    print(f"src {src.shape} dst {dst.shape} mask {mask.shape}")

    overrides = {}
    if args.precision is not None:
        overrides["precision"] = args.precision
    if args.folded is not None:
        overrides["dst_folded"] = args.folded
    if args.pallas is not None:
        overrides.update(use_pallas_preprocess=args.pallas,
                         use_pallas_postprocess=args.pallas,
                         use_pallas_smoother=args.pallas)
    if args.tol is not None:
        overrides["tol"] = args.tol
    if args.mg_cycles is not None:
        overrides["mg_cycles"] = args.mg_cycles
    eng = SeamlessClone(
        CloneConfig(solver=args.solver, flags=args.flags,
                    debug_dump=args.debug_dump, **overrides),
        device=device,
    )
    out, ms = eng.timed_run(src, dst, mask, (args.center_x, args.center_y),
                            loops=args.loops, warmup=1)

    outdir = Path(args.output_dir)
    outdir.mkdir(parents=True, exist_ok=True)
    import numpy as np

    out_np = np.asarray(out)
    native.write_bmp(outdir / "ucRGB_Output.bmp", out_np)
    native.write_yaml_mat(outdir / "result.yml", out_np, name="result")

    # The reference printout format (seamlessClone_imp.cu:343-346).
    if args.solver == "auto":
        print(f"solver: auto -> {eng.metrics.get('solver_resolved')}")
    bh, bw = eng.metrics["bbox"][3], eng.metrics["bbox"][2]
    print(f"Compute stage performance time= {ms:.3f} msec, patch size={bw}x{bh}")
    print(f"total device memory used: {eng.device_memory_bytes()} bytes")
    print(f"wrote {outdir / 'ucRGB_Output.bmp'} and {outdir / 'result.yml'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
