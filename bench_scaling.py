"""Weak-scaling benchmark: tiled red-black solve across an N-device mesh.

Constant work PER DEVICE (one tile of TILE x TILE interior each), growing
the global problem with the mesh — the BASELINE weak-scaling protocol for
the 8K-panorama configuration. Efficiency = t(1 device) / t(N devices).

Hardware note: this environment exposes ONE physical TPU chip; multi-device
runs use the virtual CPU mesh (jax_num_cpu_devices — the standard JAX fake
backend), which validates the sharding/halo program structure and measures
its overhead, not real ICI bandwidth. On a real pod slice the same script
runs unchanged with JAX_PLATFORMS=tpu.

Usage:
    python bench_scaling.py            # sweep 1,2,4,8 virtual CPU devices
    python bench_scaling.py --devices 4 --tile 1024
Prints one JSON line per mesh size plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def run_one(n_devices: int, tile: int, sweeps: int, path: str = "redblack") -> dict:
    """Child-process entry: fixed work per device on an n-device mesh.

    path='redblack': `sweeps` explicit shard_map red-black sweeps (halo=4).
    path='multigrid': 4 GSPMD-partitioned V(1,2) cycles (fixed-work mode,
    the serving configuration) — XLA inserts the halo collectives and
    coarse-level reshards itself (SURVEY §2.18 item 3).
    path='dd': 4 domain-decomposed V(1,2) cycles (shard_map fine level with
    CA ppermute halos + per-shard Mosaic sweeps + replicated coarse) — the
    flagship path seamless_clone_tiled runs (VERDICT r3 missing #1).
    path='batch': DATA-parallel fused batch clone — 8 independent jobs of
    min(tile, 256)^2 interior PER DEVICE (capped: each job is a full DST
    direct solve, O(n^3) on the CPU backend, so tile-sized jobs would take
    minutes), the batch dim sharded over the flattened mesh (SURVEY §2.18
    item 1: zero inter-device traffic by construction — the weak-scaling
    STRUCTURE ceiling; per-device WORK is not comparable across paths).
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_devices)
    import jax.numpy as jnp
    import numpy as np

    from seamlesscloneoptimization_tpu.parallel import (
        make_tile_mesh,
        solve_multigrid_sharded,
        solve_redblack_tiled,
    )
    from seamlesscloneoptimization_tpu.parallel.mesh import tile_sharding

    mesh = make_tile_mesh(jax.devices()[:n_devices])
    ty, tx = mesh.shape["ty"], mesh.shape["tx"]

    if path == "batch":
        from jax.sharding import NamedSharding, PartitionSpec as P

        from seamlesscloneoptimization_tpu.parallel.batch import clone_roi_batch
        from seamlesscloneoptimization_tpu.solvers import solve_dst_gemm

        jobs_per_dev, bhw = 8, min(tile, 256) + 2  # ROI incl. Dirichlet ring
        n_jobs = jobs_per_dev * n_devices
        rng = np.random.default_rng(0)
        dests = rng.integers(0, 256, (n_jobs, 3, bhw, bhw)).astype(np.uint8)
        patches = rng.integers(0, 256, (n_jobs, 3, bhw, bhw)).astype(np.uint8)
        masks = np.full((n_jobs, bhw, bhw), 255, np.uint8)
        batch_shard = NamedSharding(mesh, P(("ty", "tx")))
        args = [jax.device_put(jnp.asarray(x), batch_shard)
                for x in (dests, patches, masks)]
        fn = lambda: clone_roi_batch(*args, 1, solve_dst_gemm)  # noqa: E731
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        dt = time.perf_counter() - t0
        mp = n_jobs * bhw * bhw / 1e6
        return {
            "path": path, "devices": n_devices, "mesh": f"{ty}x{tx}",
            "grid": f"{n_jobs}x{bhw}x{bhw}", "megapixels": round(mp, 1),
            "seconds": round(dt, 3), "mp_clones_per_s": round(mp / dt, 1),
        }
    H, W = tile * ty, tile * tx
    rng = np.random.default_rng(0)
    g = jax.device_put(
        jnp.asarray(rng.normal(size=(3, H, W)).astype(np.float32) * 50), tile_sharding(mesh)
    )

    if path == "multigrid":
        work = 4  # cycles; each V(1,2) ~ 4 fine-sweep equivalents of traffic
        fn = lambda: solve_multigrid_sharded(g, mesh, cycles=work)
        unit = "mp_cycles_per_s"
    elif path == "dd":
        from seamlesscloneoptimization_tpu.parallel import solve_multigrid_dd

        work = 4
        fn = lambda: solve_multigrid_dd(g, mesh, cycles=work)
        unit = "mp_cycles_per_s"
    else:
        work = sweeps  # fixed work: exactly `sweeps` sweeps (tol=0 never converges)
        fn = lambda: solve_redblack_tiled(
            g, mesh, tol=0.0, max_iters=sweeps, check_every=sweeps, halo=4
        )
        unit = "mp_sweeps_per_s"
    u = fn()
    jax.block_until_ready(u)  # includes compile
    t0 = time.perf_counter()
    u = fn()
    jax.block_until_ready(u)
    dt = time.perf_counter() - t0
    mp = H * W / 1e6
    return {
        "path": path,
        "devices": n_devices,
        "mesh": f"{ty}x{tx}",
        "grid": f"{H}x{W}",
        "megapixels": round(mp, 1),
        "seconds": round(dt, 3),
        unit: round(mp * work / dt, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=None, help="run one size (child mode)")
    p.add_argument("--tile", type=int, default=1024)
    p.add_argument("--sweeps", type=int, default=100)
    p.add_argument("--path",
                   choices=("redblack", "multigrid", "dd", "batch", "both"),
                   default="both")
    args = p.parse_args()

    if args.devices is not None:
        print(json.dumps(run_one(args.devices, args.tile, args.sweeps, args.path)))
        return

    paths = (("redblack", "multigrid", "dd", "batch") if args.path == "both"
             else (args.path,))
    for path in paths:
        results = []
        for n in (1, 2, 4, 8):
            r = subprocess.run(
                [sys.executable, __file__, "--devices", str(n), "--tile", str(args.tile),
                 "--sweeps", str(args.sweeps), "--path", path],
                capture_output=True, text=True, timeout=1200,
            )
            line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
            if not line:
                print(f"path={path} devices={n} FAILED:\n{r.stderr[-2000:]}", file=sys.stderr)
                continue
            res = json.loads(line[-1])
            results.append(res)
            print(json.dumps(res))

        if results and results[0]["devices"] == 1:
            t1 = results[0]["seconds"]
            for r in results[1:]:
                r["weak_scaling_efficiency"] = round(t1 / r["seconds"], 3)
            print(json.dumps({
                "summary": f"{path} weak scaling (virtual CPU mesh; structure/overhead only)",
                "efficiency": {r["devices"]: r.get("weak_scaling_efficiency") for r in results[1:]},
            }))


if __name__ == "__main__":
    main()
