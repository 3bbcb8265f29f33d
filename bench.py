"""Benchmark harness: megapixels/s per chip, end-to-end, vs the reference.

Protocol mirrors the reference (seamlessClone-CUDA/seamlessClone_imp.cu:
281-349): warm-up call, then N timed loops ending in a device sync.

Headline config = the reference's largest published workload: 2400x1552
source patch into a 4800x2694 destination (seamlessClone_main.sh:23).
Baseline = V100 with-FFT e2e latency 63.988 ms (PDF §1.1 table) ~= 58.2 MP/s.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "MP/s", "vs_baseline": ...}
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

BASELINE_MPS_V100_2400 = 3.7248 / 63.988e-3  # 2400x1552 px / 63.988 ms


def load_images(scale_to=(2400, 1552), dst_to=(4800, 2694)):
    import cv2

    a = cv2.imread("/root/reference/seamlessClone-OpenCV/images/airplane.jpg")
    s = cv2.imread("/root/reference/seamlessClone-OpenCV/images/sky.jpg")
    src = cv2.resize(a, scale_to, interpolation=cv2.INTER_CUBIC)
    dst = cv2.resize(s, dst_to, interpolation=cv2.INTER_CUBIC)
    return src, dst


def main():
    solver = sys.argv[1] if len(sys.argv) > 1 else "dst_fft"
    loops = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from seamlesscloneoptimization_tpu.core.config import CloneConfig
    from seamlesscloneoptimization_tpu.core.engine import SeamlessClone

    src, dst = load_images()
    mask = np.full(src.shape[:2], 255, np.uint8)
    center = (dst.shape[1] // 2, dst.shape[0] // 2)

    eng = SeamlessClone(CloneConfig(solver=solver, tol=2e-4))
    _, ms = eng.timed_run(src, dst, mask, center, loops=loops, warmup=2)

    mp = src.shape[0] * src.shape[1] / 1e6
    mps = mp / (ms / 1e3)

    # accuracy spot-check at the published 300x194 config
    import cv2

    a = cv2.imread("/root/reference/seamlessClone-OpenCV/images/airplane.jpg")
    s = cv2.imread("/root/reference/seamlessClone-OpenCV/images/sky.jpg")
    m = np.full(a.shape[:2], 255, np.uint8)
    golden = cv2.seamlessClone(a, s, m.copy(), (800, 150), cv2.NORMAL_CLONE)
    mine = np.asarray(eng.run(a, s, m.copy(), (800, 150)))
    d = cv2.absdiff(golden, mine)

    print(
        json.dumps(
            {
                "metric": "seamless_clone_e2e_2400x1552_megapixels_per_s",
                "value": round(mps, 3),
                "unit": "MP/s",
                "vs_baseline": round(mps / BASELINE_MPS_V100_2400, 3),
                "extras": {
                    "solver": solver,
                    "e2e_ms_2400x1552": round(ms, 3),
                    "device_memory_bytes": eng.metrics.get("device_memory_bytes", 0),
                    "accuracy_300x194_diff_sum": int(d.sum()),
                    "accuracy_300x194_diff_max": int(d.max()),
                    "baseline_mps_v100_fft": round(BASELINE_MPS_V100_2400, 1),
                    "device": str(eng.device),
                    "loops": loops,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
