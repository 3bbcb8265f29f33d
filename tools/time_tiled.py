"""1x1-mesh sanity: the DD-backed tiled clone vs the single-chip engine.

VERDICT r3 next #2's done-criterion: on the real chip, a 1x1-mesh
`seamless_clone_tiled` (the multi-chip flagship path — DD multigrid with
per-shard Mosaic sweeps) should cost about what the single-chip multigrid
engine costs for the same clone, i.e. the DD wrapper must not tax the
degenerate mesh. Both sides timed with the same per-call protocol
(host inputs re-uploaded each call, scalar-fetch sync, best of 2 passes).

    timeout 580 python tools/time_tiled.py [loops]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    loops = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import cv2

    from seamlesscloneoptimization_tpu.core.config import CloneConfig
    from seamlesscloneoptimization_tpu.core.engine import SeamlessClone
    from seamlesscloneoptimization_tpu.parallel import (
        make_tile_mesh,
        seamless_clone_tiled,
    )

    a = cv2.imread("/root/reference/seamlessClone-OpenCV/images/airplane.jpg")
    s = cv2.imread("/root/reference/seamlessClone-OpenCV/images/sky.jpg")
    src = cv2.resize(a, (2400, 1552), interpolation=cv2.INTER_CUBIC)
    dst = cv2.resize(s, (4800, 2694), interpolation=cv2.INTER_CUBIC)
    mask = np.full(src.shape[:2], 255, np.uint8)
    center = (dst.shape[1] // 2, dst.shape[0] // 2)
    mesh = make_tile_mesh(jax.devices()[:1], (1, 1))

    def timed(fn):
        fn()  # warm/compile
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(loops):
                out = fn()
            best = min(best, (time.perf_counter() - t0) / loops)
        return best * 1e3, out

    tiled_ms, out_t = timed(lambda: seamless_clone_tiled(
        src, dst, mask, center, mesh=mesh, mg_cycles=4))
    eng = SeamlessClone(CloneConfig(solver="multigrid", mg_cycles=4,
                                    use_pallas_preprocess=False,
                                    use_pallas_postprocess=False))
    eng_ms, out_e = timed(lambda: np.asarray(
        eng.run(src, dst, mask, center)))
    d = int(np.abs(out_t.astype(int) - np.asarray(out_e).astype(int)).max())
    print(f"tiled 1x1 (DD fixed-4): {tiled_ms:.1f} ms/call | single-chip "
          f"multigrid engine (same per-call protocol, XLA pre/post): "
          f"{eng_ms:.1f} ms/call | diff_max {d}")


if __name__ == "__main__":
    main()
