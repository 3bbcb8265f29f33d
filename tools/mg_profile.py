"""Profile multigrid components on the real TPU (tunnel-safe protocol).

Times each piece with data-dependency chains ending in a scalar fetch,
subtracts the measured sync round-trip, best-of-N passes. Usage:

    timeout 580 python tools/mg_profile.py [h w] [piece ...]

pieces: sweep residual restrict prolong vcycle fmg solve_tol solve_fix
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/seamlessclone_tpu/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def sync_overhead_ms(samples=10):
    f = jax.jit(lambda x: x + 1)
    x = jnp.float32(1.0)
    float(f(x))
    t0 = time.perf_counter()
    for _ in range(samples):
        float(f(x))
    return (time.perf_counter() - t0) / samples * 1e3


def timeit(fn, x, g, loops, rpc_ms, passes=2):
    """fn must map (x, g) -> array like x; chained x = fn(x, g)."""
    f = jax.jit(fn)
    x = f(x, g)  # compile
    s = jax.jit(lambda a: jnp.max(jnp.abs(a)))
    float(s(x))
    best = 1e30
    for _ in range(passes):
        t0 = time.perf_counter()
        xx = x
        for _ in range(loops):
            xx = f(xx, g)
        float(s(xx))
        best = min(best, ((time.perf_counter() - t0) * 1e3 - rpc_ms) / loops)
    return best


def main():
    args = sys.argv[1:]
    h, w = 1550, 2398
    if len(args) >= 2 and args[0].isdigit():
        h, w = int(args[0]), int(args[1])
        args = args[2:]
    pieces = args or ["sweep", "residual", "restrict", "prolong",
                      "vcycle", "fmg", "solve_tol", "solve_fix"]

    from seamlesscloneoptimization_tpu.solvers.jacobi import redblack_sweep, residual
    from seamlesscloneoptimization_tpu.solvers import multigrid as MG

    print(f"backend={jax.default_backend()} shape=3x{h}x{w}", flush=True)
    rpc = sync_overhead_ms()
    print(f"sync_overhead_ms={rpc:.1f}", flush=True)

    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(3, h, w)).astype(np.float32) * 50)
    u = jnp.asarray(rng.normal(size=(3, h, w)).astype(np.float32))
    g = jax.device_put(g)
    u = jax.device_put(u)

    hc, wc = (h - 1) // 2, (w - 1) // 2
    ec = jnp.asarray(rng.normal(size=(3, hc, wc)).astype(np.float32))

    for p in pieces:
        t0 = time.perf_counter()
        if p == "sweep":
            ms = timeit(lambda x, gg: redblack_sweep(x, gg), u, g, 20, rpc)
        elif p == "residual":
            ms = timeit(lambda x, gg: residual(x, gg), u, g, 20, rpc)
        elif p == "restrict":
            # chain via output-dependent scalar folded back (shape changes);
            # instead: restrict then prolong to keep the shape (measures both,
            # reported as the pair; see 'prolong' for prolong-only trick)
            ms = timeit(lambda x, gg: MG.prolong_bilinear(
                4.0 * MG.restrict_fw(x), h, w), u, g, 100, rpc)
        elif p == "restrict_only":
            ms = timeit(lambda x, gg: jnp.pad(
                MG.restrict_fw(x), ((0, 0), (0, h - hc), (0, w - wc))),
                u, g, 100, rpc)
        elif p == "prolong":
            # prolong-only: fold the fine result back down with a cheap slice
            ms = timeit(
                lambda x, gg: MG.prolong_bilinear(x[:, :hc, :wc], h, w)[:, :h, :w]
                * 0.5, u, g, 100, rpc)
        elif p == "vcycle":
            ms = timeit(lambda x, gg: MG.vcycle(x, gg), u, g, 5, rpc)
        elif p == "vcycle_pl":
            ms = timeit(lambda x, gg: MG.vcycle(x, gg, use_pallas=True), u, g, 5, rpc)
        elif p == "fmg":
            ms = timeit(lambda x, gg: MG.fmg(gg + 0.0 * x[:, :1, :1].sum()),
                        u, g, 5, rpc)
        elif p == "solve_tol":
            ms = timeit(lambda x, gg: MG.solve_multigrid(
                gg + 0.0 * x[:, :1, :1].sum(), tol=2e-4), u, g, 2, rpc)
        elif p == "solve_tol_pl":
            ms = timeit(lambda x, gg: MG.solve_multigrid(
                gg + 0.0 * x[:, :1, :1].sum(), tol=2e-4, use_pallas=True),
                u, g, 2, rpc)
        elif p == "solve_fix":
            ms = timeit(lambda x, gg: MG.solve_multigrid(
                gg + 0.0 * x[:, :1, :1].sum(), cycles=2), u, g, 2, rpc)
        else:
            print(f"unknown piece {p}")
            continue
        print(f"{p}: {ms:.3f} ms   (wall incl compile {time.perf_counter()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
