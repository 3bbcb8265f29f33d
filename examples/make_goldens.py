"""Standalone golden/fixture generator — the reference's OpenCV driver, TPU-native.

The reference ships a driver that materializes the bit-exact test artifacts on
disk: YAML dumps of the decoded src/dst/mask Mats plus the cv2 result as
jpg/bmp (seamlessClone-OpenCV/seamlessClone_OpenCV.cpp:94-96,119-123; the
standalone jpg->YAML converter jpg2yaml.cpp:36-86). Those YAMLs are the
inputs both implementations consume, so third parties can regression-test
against the set without running OpenCV themselves.

This tool does the same: for each configured case it writes

    <out>/<case>/src.yml dst.yml mask.yml        (cv2.FileStorage format)
    <out>/<case>/golden_cv2.bmp                  (cv2.seamlessClone output)
    <out>/<case>/golden_tpu.bmp                  (this framework's output)
    <out>/<case>/meta.json                       (center, flags, diff stats)

and a top-level manifest.json. Default cases mirror the reference driver:
full-rect mask (USE_POLYGON_MASK=false) and a 7-point polygon mask
(seamlessClone_OpenCV.cpp:64-93), each in all three clone modes.

    python examples/make_goldens.py [out_dir] [--src a.jpg --dst b.jpg --cx N --cy N]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

REF_IMAGES = Path("/root/reference/seamlessClone-OpenCV/images")

MODES = {"normal": 1, "mixed": 2, "monochrome": 3}


def polygon_mask(shape) -> np.ndarray:
    """The reference's 7-point polygon mask (seamlessClone_OpenCV.cpp:81-93),
    scaled to the source size."""
    import cv2

    h, w = shape[:2]
    pts = np.array(
        [(0.05, 0.3), (0.3, 0.05), (0.7, 0.05), (0.95, 0.3),
         (0.95, 0.7), (0.5, 0.95), (0.05, 0.7)]
    )
    poly = np.round(pts * [w - 1, h - 1]).astype(np.int32)
    mask = np.zeros((h, w), np.uint8)
    cv2.fillPoly(mask, [poly], 255)
    return mask


def write_yaml(path: Path, arr: np.ndarray, name: str) -> None:
    """cv2.FileStorage YAML (what the reference CLI consumes)."""
    try:
        from seamlesscloneoptimization_tpu import native

        native.write_yaml_mat(path, arr, name)
    except Exception:
        import cv2

        fs = cv2.FileStorage(str(path), cv2.FILE_STORAGE_WRITE)
        fs.write(name, arr)
        fs.release()


def make_case(out_dir: Path, case: str, src, dst, mask, center, flags: int) -> dict:
    import cv2

    from seamlesscloneoptimization_tpu.api import seamless_clone
    from seamlesscloneoptimization_tpu.compare import diff_stats

    d = out_dir / case
    d.mkdir(parents=True, exist_ok=True)
    write_yaml(d / "src.yml", src, "src")
    write_yaml(d / "dst.yml", dst, "dst")
    write_yaml(d / "mask.yml", mask, "mask")

    cv2_flag = {1: cv2.NORMAL_CLONE, 2: cv2.MIXED_CLONE, 3: cv2.MONOCHROME_TRANSFER}[flags]
    golden = cv2.seamlessClone(src, dst, mask.copy(), center, cv2_flag)
    ours = np.asarray(seamless_clone(src, dst, mask.copy(), center, flags=flags))
    cv2.imwrite(str(d / "golden_cv2.bmp"), golden)
    cv2.imwrite(str(d / "golden_tpu.bmp"), ours)

    stats = diff_stats(golden, ours)
    meta = {
        "center": list(center),
        "flags": flags,
        "src_shape": list(src.shape),
        "dst_shape": list(dst.shape),
        "diff": {k: (float(v) if isinstance(v, (int, float, np.floating)) else v)
                 for k, v in stats.items()},
    }
    (d / "meta.json").write_text(json.dumps(meta, indent=2))
    return meta


def main() -> int:
    import cv2

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("out_dir", nargs="?", default="./output/goldens")
    ap.add_argument("--src", default=str(REF_IMAGES / "airplane.jpg"))
    ap.add_argument("--dst", default=str(REF_IMAGES / "sky.jpg"))
    ap.add_argument("--cx", type=int, default=800)
    ap.add_argument("--cy", type=int, default=150)
    args = ap.parse_args()

    src = cv2.imread(args.src)
    dst = cv2.imread(args.dst)
    if src is None or dst is None:
        print(f"cannot read {args.src} / {args.dst}", file=sys.stderr)
        return 2
    out_dir = Path(args.out_dir)
    center = (args.cx, args.cy)

    full = np.full(src.shape[:2], 255, np.uint8)
    poly = polygon_mask(src.shape)
    manifest = {}
    for mode, flags in MODES.items():
        for mask_name, mask in (("rect", full), ("polygon", poly)):
            case = f"{mask_name}_{mode}"
            meta = make_case(out_dir, case, src, dst, mask, center, flags)
            manifest[case] = meta
            print(f"{case}: diff_max={meta['diff'].get('diff_max')} "
                  f"diff_sum={meta['diff'].get('diff_sum')}")
    (out_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))
    print(f"golden set written to {out_dir}")
    return 0


if __name__ == "__main__":
    import jax

    # goldens are a correctness artifact — CPU is always sufficient and never
    # contends with TPU benchmarks (set SCL_GOLDENS_TPU=1 to opt out)
    import os

    if not os.environ.get("SCL_GOLDENS_TPU"):
        jax.config.update("jax_platforms", "cpu")
    sys.exit(main())
