"""Distributed-clone demo: one 8K clone sharded over a device mesh.

BASELINE config[4] as a runnable example: `seamless_clone_tiled` jits the
whole pipeline under GSPMD with the solve region sharded (C, 'ty', 'tx'),
so every stencil becomes tile-local compute + ICI halo exchange (SURVEY
§2.18 — the capability the reference lacks). On a machine without a pod
slice this script runs on 8 VIRTUAL CPU devices (the same fake-backend
setup the tests use), demonstrating that the multi-chip program compiles
and produces output identical to the single-device path; on real hardware
the identical code shards over however many chips are visible
(pass --real to use the attached devices instead of the virtual mesh).

    python examples/tiled_demo.py [out_dir] [dst_scale] [--real]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if "--real" not in sys.argv:
    # Default: demonstrate on 8 VIRTUAL CPU devices (jax_num_cpu_devices is
    # the robust form — an already-set XLA_FLAGS would silently swallow the
    # force_host_platform flag). Pass --real on a pod slice to shard over
    # the attached chips instead; probing jax.device_count() first is not an
    # option because it initializes the backend before the config can switch.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np


def main():
    import cv2

    from seamlesscloneoptimization_tpu.api import seamless_clone
    from seamlesscloneoptimization_tpu.parallel import (
        make_tile_mesh,
        seamless_clone_tiled,
    )

    argv = [a for a in sys.argv[1:] if a != "--real"]
    out_dir = Path(argv[0]) if argv else Path("./output/tiled_demo")
    scale = float(argv[1]) if len(argv) > 1 else 1.0  # 1.0 keeps CPU fast
    out_dir.mkdir(parents=True, exist_ok=True)

    a = cv2.imread("/root/reference/seamlessClone-OpenCV/images/airplane.jpg")
    s = cv2.imread("/root/reference/seamlessClone-OpenCV/images/sky.jpg")
    if scale != 1.0:
        a = cv2.resize(a, None, fx=scale, fy=scale, interpolation=cv2.INTER_CUBIC)
        s = cv2.resize(s, None, fx=scale, fy=scale, interpolation=cv2.INTER_CUBIC)
    mask = np.full(a.shape[:2], 255, np.uint8)
    center = (s.shape[1] // 2, s.shape[0] // 2)

    mesh = make_tile_mesh()
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} "
          f"over {len(jax.devices())} {jax.devices()[0].platform} devices")

    t0 = time.perf_counter()
    tiled = seamless_clone_tiled(a, s, mask.copy(), center, mesh=mesh, tol=1e-5)
    print(f"tiled clone ({s.shape[1]}x{s.shape[0]} dst): "
          f"{time.perf_counter() - t0:.1f} s incl. compile")

    single = np.asarray(seamless_clone(a, s, mask.copy(), center,
                                       solver="multigrid", tol=1e-5))
    diff = np.abs(tiled.astype(np.int16) - single.astype(np.int16))
    print(f"vs single-device multigrid: diff_max={diff.max()} "
          f"diff_sum={diff.sum()}")
    cv2.imwrite(str(out_dir / "tiled_result.jpg"), tiled)
    print(f"wrote {out_dir / 'tiled_result.jpg'}")
    assert diff.max() <= 1, "sharded pipeline diverged from the local one"

    # Mesh SERVE mode (round 5): the engine's instance contract over the
    # same mesh — executable cache, async run/sync, device-resident planar
    # chaining with the destination sharded across frames (see
    # docs/SERVING.md). Two chained frames: frame 2's destination IS frame
    # 1's on-mesh output, no host round-trip between them.
    from seamlesscloneoptimization_tpu.core.config import CloneConfig
    from seamlesscloneoptimization_tpu.parallel import TiledSeamlessClone

    eng = TiledSeamlessClone(CloneConfig(tol=1e-5), mesh=mesh)
    f1 = eng.run(a, s, mask.copy(), center)
    f2 = eng.run(a, f1, mask.copy(), (center[0] // 2, center[1] // 2))
    eng.sync()
    print(f"mesh serve: 2 chained frames, solver_resolved="
          f"{eng.metrics['solver_resolved']}, "
          f"{len(eng._cache)} cached executable(s)")
    cv2.imwrite(str(out_dir / "tiled_serve_chained.jpg"), np.asarray(f2))
    print(f"wrote {out_dir / 'tiled_serve_chained.jpg'}")


if __name__ == "__main__":
    main()
