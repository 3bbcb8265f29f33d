"""Golden-diff harness: the reference ``compare/vs.py`` re-built as a module.

Two comparison modes, exactly mirroring the reference harness:

1. Image diff (vs.py:36-79): per-pixel absolute difference of two images
   (BMP/JPG/PNG/YAML), printing sum / differing-channel count / min / max /
   percent differing, and writing a diff YAML plus an amplified diff BMP.
2. Intermediate-tensor diff (vs.py:12-34, ``compareYaml``): per-channel
   comparison of dumped stage tensors (e.g. the Poisson RHS ``g{0,1,2}.yml``
   vs OpenCV's instrumented ``mod_diff{0,1,2}.yml``; note the reference
   reverses channel order between the two, g0 <-> mod_diff2).

Usage:
    python -m seamlesscloneoptimization_tpu.compare A.bmp B.bmp [--amplify 30]
    python -m seamlesscloneoptimization_tpu.compare --yaml g0.yml mod_diff2.yml
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def _load(path: str) -> np.ndarray:
    from seamlesscloneoptimization_tpu import native

    if not native.HAVE_NATIVE:
        raise RuntimeError(
            "the native extension failed to build (g++ missing?); the compare "
            "harness needs it for YAML/BMP IO"
        )
    p = Path(path)
    if p.suffix in (".yml", ".yaml"):
        return native.read_yaml_mat(p)
    if p.suffix == ".bmp":
        return native.read_bmp(p)
    import cv2

    img = cv2.imread(str(p))
    if img is None:
        raise FileNotFoundError(p)
    return img


def diff_stats(a: np.ndarray, b: np.ndarray) -> dict:
    """The vs.py:52-69 statistics over an absolute difference."""
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    d = np.abs(a.astype(np.float64) - b.astype(np.float64))
    nz = d != 0
    return {
        "diff_sum": float(d.sum()),
        "diff_channels": int(nz.sum()),
        "diff_min": float(d[nz].min()) if nz.any() else 0.0,
        "diff_max": float(d.max()),
        "percent_diff": float(nz.mean() * 100.0),
    }


def compare_images(path_a: str, path_b: str, amplify: int = 30, out_dir: str | None = None) -> dict:
    from seamlesscloneoptimization_tpu import native

    a, b = _load(path_a), _load(path_b)
    stats = diff_stats(a, b)
    if out_dir:
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        d = np.abs(a.astype(np.int32) - b.astype(np.int32))
        native.write_yaml_mat(out / "diff.yml", d.astype(np.int32), name="diff")
        amp = np.clip(d * amplify, 0, 255).astype(np.uint8)
        native.write_bmp(out / "diff.bmp", amp)
    return stats


def compare_yaml_stage(path_ours: str, path_golden: str) -> dict:
    """Stage-tensor comparison (float), the g-vs-mod_diff debugging method."""
    a, b = _load(path_ours).astype(np.float64), _load(path_golden).astype(np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    d = np.abs(a - b)
    return {
        "abs_max": float(d.max()),
        "abs_mean": float(d.mean()),
        "rel_max": float((d / np.maximum(np.abs(b), 1e-12)).max()),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="seamlessclone-tpu-compare", description=__doc__)
    p.add_argument("a", help="our output (bmp/jpg/yml)")
    p.add_argument("b", help="golden (bmp/jpg/yml)")
    p.add_argument("--yaml", action="store_true", help="float stage-tensor mode")
    p.add_argument("--amplify", type=int, default=30)
    p.add_argument("--out-dir", default=None, help="write diff.yml + diff.bmp here")
    args = p.parse_args(argv)

    if args.yaml:
        stats = compare_yaml_stage(args.a, args.b)
    else:
        stats = compare_images(args.a, args.b, args.amplify, args.out_dir)
    for k, v in stats.items():
        print(f"{k}: {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
