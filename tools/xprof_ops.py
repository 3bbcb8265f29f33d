"""Capture an XProf trace of a multigrid piece on the TPU and print the op table.

The TPU analogue of the reference's nvprof per-kernel table (README.md:133-136).
Decodes the xplane protobuf via tensorboard_plugin_profile's converter.

    timeout 580 python tools/xprof_ops.py [piece] [h w] [loops]

pieces: vcycle vcycle_pl solve_tol solve_tol_pl solve_fix4_padded fmg serve
"""

from __future__ import annotations

import glob
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/seamlessclone_tpu/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

TRACE_DIR = "/tmp/scl_xprof"


def op_table(trace_dir: str, top: int = 35, loops: int = 1):
    """Aggregate device-plane op durations from the raw xplane protobuf."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    agg: dict[str, float] = {}
    counts: dict[str, int] = {}
    for f in glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True):
        space = xplane_pb2.XSpace()
        space.ParseFromString(open(f, "rb").read())
        for plane in space.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            meta = plane.event_metadata
            for line in plane.lines:
                if "XLA Ops" not in line.name and "Ops" != line.name:
                    continue
                for ev in line.events:
                    name = meta[ev.metadata_id].name
                    agg[name] = agg.get(name, 0.0) + ev.duration_ps / 1e12
                    counts[name] = counts.get(name, 0) + 1
    rows = sorted(((t, n) for n, t in agg.items()), reverse=True)
    total = sum(t for t, _ in rows)
    print(f"device op time: {total*1e3/loops:.3f} ms/loop over {len(rows)} distinct ops")
    for t, name in rows[:top]:
        print(f"  {t*1e3/loops:9.4f} ms  {100*t/total:5.1f}%  x{counts[name]:<4d} {name[:80]}")
    return rows


def profile_serve(h: int, w: int, loops: int):
    """Profile the full engine serve step (bench.py's exact config)."""
    import cv2

    from seamlesscloneoptimization_tpu.core.config import CloneConfig
    from seamlesscloneoptimization_tpu.core.engine import SeamlessClone

    a = cv2.imread("/root/reference/seamlessClone-OpenCV/images/airplane.jpg")
    s = cv2.imread("/root/reference/seamlessClone-OpenCV/images/sky.jpg")
    src = cv2.resize(a, (w, h), interpolation=cv2.INTER_CUBIC)
    dst = cv2.resize(s, (2 * w, (2 * h * 2694) // 3104), interpolation=cv2.INTER_CUBIC)
    mask = np.full(src.shape[:2], 255, np.uint8)
    center = (dst.shape[1] // 2, dst.shape[0] // 2)
    import os

    folded = os.environ.get("SCL_DST_FOLDED", "1") == "1"  # mirror bench.py
    solver = os.environ.get("SCL_SOLVER", "dst_gemm")  # e.g. multigrid
    eng = SeamlessClone(CloneConfig(solver=solver, donate_dst=True, precision="high",
                                    use_pallas_preprocess=True, use_pallas_postprocess=True,
                                    dst_folded=folded, tol=2e-4))
    # warm-up outside trace
    _, ms0 = eng.timed_serve(src, dst, mask, center, loops=4)
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    jax.profiler.start_trace(TRACE_DIR)
    _, ms = eng.timed_serve(src, dst, mask, center, loops=loops)
    jax.profiler.stop_trace()
    # timed_serve runs warmup(1) + 2 passes of `loops` + sync probes inside
    # the trace window; count executions as 2*loops+1 for per-frame figures
    print(f"serve {w}x{h}: {ms:.3f} ms/frame (warm pass {ms0:.3f})")
    op_table(TRACE_DIR, loops=2 * loops + 1)


def main():
    args = sys.argv[1:]
    piece = args[0] if args else "vcycle_pl"
    h, w = (int(args[1]), int(args[2])) if len(args) >= 3 else (1550, 2398)
    loops = int(args[3]) if len(args) >= 4 else 10

    if piece == "serve":
        profile_serve(h, w, loops)
        return

    from seamlesscloneoptimization_tpu.solvers import multigrid as MG

    rng = np.random.default_rng(0)
    g = jax.device_put(jnp.asarray(rng.normal(size=(3, h, w)).astype(np.float32) * 50))
    u = jax.device_put(jnp.asarray(rng.normal(size=(3, h, w)).astype(np.float32)))

    fns = {
        "vcycle": jax.jit(lambda x, gg: MG.vcycle(x, gg, 1, 2)),
        "vcycle_pl": jax.jit(lambda x, gg: MG.vcycle(x, gg, 1, 2, use_pallas=True)),
        "fmg": jax.jit(lambda x, gg: MG.fmg(gg + 0.0 * x[:, :1, :1].sum(), 1, 2)),
        "solve_tol": jax.jit(lambda x, gg: MG.solve_multigrid(
            gg + 0.0 * x[:, :1, :1].sum(), tol=2e-4)),
        "solve_tol_pl": jax.jit(lambda x, gg: MG.solve_multigrid(
            gg + 0.0 * x[:, :1, :1].sum(), tol=2e-4, use_pallas=True)),
        "solve_fix4_padded": jax.jit(lambda x, gg: MG.solve_multigrid(
            gg + 0.0 * x[:, :1, :1].sum(), cycles=4, use_pallas=True,
            padded=True)),
        "solve_fix4_t": jax.jit(lambda x, gg: MG.solve_multigrid(
            gg + 0.0 * x[:, :1, :1].sum(), cycles=4, use_pallas=True,
            padded="t")),
        "solve_fix4_q": jax.jit(lambda x, gg: MG.solve_multigrid(
            gg + 0.0 * x[:, :1, :1].sum(), cycles=4, use_pallas=True,
            padded="q")),
    }
    f = fns[piece]
    s = jax.jit(lambda a: jnp.max(jnp.abs(a)))
    u = f(u, g)
    float(s(u))  # compile + settle

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    jax.profiler.start_trace(TRACE_DIR)
    t0 = time.perf_counter()
    for _ in range(loops):
        u = f(u, g)
    v = float(s(u))
    wall = (time.perf_counter() - t0) * 1e3
    jax.profiler.stop_trace()
    print(f"{piece} 3x{h}x{w}: wall {wall/loops:.3f} ms/loop over {loops} loops (chk {v:.3g})")
    op_table(TRACE_DIR, loops=loops)


if __name__ == "__main__":
    main()
