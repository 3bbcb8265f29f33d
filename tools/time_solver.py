"""Solver-level timing on the real TPU (tunnel-safe protocol).

Usage: python tools/time_solver.py <solver> <C,H,W> [loops]
  solver: multigrid | multigrid_fixed4 | dst_gemm | dst_gemm_high
Chained data-dependency loop ending in a scalar fetch, sync round-trip
measured with a trivial jitted op and subtracted, best of two passes
(see CLAUDE.md tunnel rules).
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    name = sys.argv[1]
    shape = tuple(int(x) for x in sys.argv[2].split(","))
    loops = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from seamlesscloneoptimization_tpu.solvers.dst_gemm import solve_dst_gemm
    from seamlesscloneoptimization_tpu.solvers.multigrid import solve_multigrid

    from seamlesscloneoptimization_tpu.solvers.jacobi import (
        redblack_sweep,
        residual as _resid,
    )

    def _sweeps4_pl(g):
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import rb_sweeps_pallas
        return rb_sweeps_pallas(jnp.zeros_like(g), g, 4)

    import os

    th_env = os.environ.get("SCL_MG_TH")  # strip-height sweep knob
    th_kw = {"th": int(th_env)} if th_env else {}

    def _mg_down(g):
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import mg_down_pallas
        u, rh = mg_down_pallas(jnp.zeros_like(g), g, 1, **th_kw)
        return u + jnp.pad(rh, ((0, 0), (0, g.shape[1] - rh.shape[1]), (0, 0)))

    def _mg_up(g):
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import mg_up_pallas
        hc = (g.shape[1] - 1) // 2  # e_lane: (C, (H-1)//2, W)
        return mg_up_pallas(jnp.zeros_like(g), g, g[:, :hc, :] * 0.5, 2, **th_kw)

    def _mg_dyn(g):
        # runtime-domain multigrid at a true size ~0.8x the padded shape
        # (the bucket_exact serving solver; fixed 4 cycles like serving)
        import jax.numpy as jnp

        from seamlesscloneoptimization_tpu.solvers.multigrid_dyn import (
            solve_multigrid_dyn,
        )
        h = jnp.int32(int(g.shape[1] * 0.8))
        w = jnp.int32(int(g.shape[2] * 0.8))
        return solve_multigrid_dyn(g, (h, w), cycles=4)

    def _transfers(g):
        from seamlesscloneoptimization_tpu.solvers.multigrid import (
            prolong_bilinear,
            restrict_fw,
        )
        rc = restrict_fw(g)
        return prolong_bilinear(rc, g.shape[1], g.shape[2])

    fns = {
        "multigrid": partial(solve_multigrid, tol=2e-4, use_pallas=True),
        "multigrid_xla": partial(solve_multigrid, tol=2e-4, use_pallas=False),
        "multigrid_fixed4": partial(solve_multigrid, cycles=4, use_pallas=True),
        "multigrid_fixed3": partial(solve_multigrid, cycles=3, use_pallas=True),
        "multigrid_fixed4_padded": partial(solve_multigrid, cycles=4,
                                           use_pallas=True, padded=True),
        "multigrid_fixed3_padded": partial(solve_multigrid, cycles=3,
                                           use_pallas=True, padded=True),
        "multigrid_fixed4_t": partial(solve_multigrid, cycles=4,
                                      use_pallas=True, padded="t"),
        "multigrid_fixed3_t": partial(solve_multigrid, cycles=3,
                                      use_pallas=True, padded="t"),
        "multigrid_t": partial(solve_multigrid, tol=2e-4, use_pallas=True,
                               padded="t"),
        "multigrid_fixed4_q": partial(solve_multigrid, cycles=4,
                                      use_pallas=True, padded="q"),
        "multigrid_q": partial(solve_multigrid, tol=2e-4, use_pallas=True,
                               padded="q"),
        "vcycle1": partial(solve_multigrid, cycles=1, use_pallas=True),
        "multigrid_dyn": _mg_dyn,
        "dst_gemm": partial(solve_dst_gemm, precision="high"),
        "dst_gemm_f32": partial(solve_dst_gemm, precision="highest"),
        "dst_gemm_folded": partial(solve_dst_gemm, precision="high", folded=True),
        "dst_gemm_f32_folded": partial(solve_dst_gemm, precision="highest",
                                       folded=True),
        "sweeps4_pl": jax.jit(_sweeps4_pl),
        "sweep1_xla": jax.jit(lambda g: redblack_sweep(jnp.zeros_like(g), g)),
        "residual": jax.jit(lambda g: _resid(g * 0.5, g)),
        "mg_down": jax.jit(_mg_down),
        "mg_up": jax.jit(_mg_up),
        "transfers": jax.jit(_transfers),
    }
    fn = fns[name]
    rng = np.random.default_rng(0)
    g = jnp.asarray((rng.normal(size=shape) * 255).astype(np.float32))

    t0 = time.perf_counter()
    u = fn(g)
    float(jnp.max(jnp.abs(u)))
    print(f"compile+first: {time.perf_counter() - t0:.1f} s", flush=True)

    triv = jax.jit(lambda x: jnp.max(x))
    float(triv(g))
    rpcs = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(triv(g))
        rpcs.append(time.perf_counter() - t0)
    rpc = min(rpcs)

    best = float("inf")
    for _ in range(2):
        uu = jnp.zeros_like(g)
        t0 = time.perf_counter()
        for _ in range(loops):
            uu = fn(g + 1e-7 * uu)  # data-dependency chain
        float(jnp.max(jnp.abs(uu)))
        best = min(best, (time.perf_counter() - t0 - rpc) / loops)
    # verify quality once
    from seamlesscloneoptimization_tpu.solvers.jacobi import residual
    rel = float(jnp.max(jnp.abs(residual(u, g))) / jnp.max(jnp.abs(g)))
    print(f"{name} {shape}: {best * 1e3:.2f} ms/solve  rel_residual={rel:.2e}",
          flush=True)


if __name__ == "__main__":
    main()
