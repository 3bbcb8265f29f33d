"""TPU probe: channel-batched grid for the fused multigrid level kernels.

The 8K profile (tools/xprof_ops.py solve_fix4_padded 2798 3798) shows the
fine-level kernels at 2-3x their DMA roof: mg_down 1.25 ms / mg_up 1.66 ms
per launch at (3, 2816, 3840) against ~0.57 ms of traffic. One suspect is
per-grid-step cost at 66 steps/launch (grid = channels x strips). This
probe times the production mg_down against a variant whose grid is strips
ONLY, each step processing all 3 channels from (3, th, wp) blocks (3x the
DMA per step, 1/3 the steps, same total traffic). The channel loop is
unrolled in-kernel, so the VPU work is identical.

Run:  timeout 580 python tools/probe_mgch.py [h w loops [th]]
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
    _M,
    _mg_down_body,
    _round_up,
    _vmem_params,
    mg_down_pallas,
    mg_geometry,
)


def _ghost_specs_c(th: int, hp: int, wp: int, c: int):
    nb = hp // _M
    r = th // _M
    return (
        pl.BlockSpec((c, th, wp), lambda i: (0, i, 0)),
        pl.BlockSpec((c, _M, wp), lambda i: (0, jnp.maximum(i * r - 1, 0), 0)),
        pl.BlockSpec((c, _M, wp), lambda i: (0, jnp.minimum((i + 1) * r, nb - 1), 0)),
    )


def _asm_c(i, ci, th, h, wp, ctr, top, bot):
    m = _M
    rt = i * th - m + jax.lax.broadcasted_iota(jnp.int32, (m, wp), 0)
    rb = (i + 1) * th + jax.lax.broadcasted_iota(jnp.int32, (m, wp), 0)
    wtop = jnp.where(rt >= 0, top[ci], 0.0)
    wbot = jnp.where(rb < h, bot[ci], 0.0)
    return jnp.concatenate([wtop, ctr[ci], wbot], axis=0)


def _down_kernel_c(uc, ut, ub, gc, gt, gb, uo_ref, rh_ref, *, nu1, th, h, w,
                   wp, hc, h_even, bh, bw, c):
    i = pl.program_id(0)
    for ci in range(c):  # unrolled: same VPU work as the per-channel grid
        u = _asm_c(i, ci, th, h, wp, uc, ut, ub)
        g = _asm_c(i, ci, th, h, wp, gc, gt, gb)
        strip, rh = _mg_down_body(u, g, i, nu1=nu1, th=th, h=h, w=w, wp=wp,
                                  hc=hc, h_even=h_even, bh=bh, bw=bw)
        uo_ref[ci] = strip
        rh_ref[ci] = rh


def mg_down_chbatch(u, g, nu1, th, true_hw):
    h, w = true_hw
    c = g.shape[0]
    th, hp, wp = mg_geometry(h, w, th)
    hc = (h - 1) // 2
    ctr, top, bot = _ghost_specs_c(th, hp, wp, c)
    return pl.pallas_call(
        partial(_down_kernel_c, nu1=nu1, th=th, h=h, w=w, wp=wp, hc=hc,
                h_even=(h % 2 == 0), bh=1.0, bw=1.0, c=c),
        grid=(hp // th,),
        in_specs=[ctr, top, bot] * 2,
        out_specs=[
            pl.BlockSpec((c, th, wp), lambda i: (0, i, 0)),
            pl.BlockSpec((c, th // 2, wp), lambda i: (0, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((c, hp // 2, wp), jnp.float32),
        ],
        compiler_params=_vmem_params(3 * th, wp, False),
        interpret=False,
    )(u, u, u, g, g, g)


def timeit(f, args, loops, rpc):
    out = f(*args)
    s = jax.jit(lambda a: jnp.max(jnp.abs(a[0])))
    float(s(out))
    best = 1e30
    for _ in range(2):
        t0 = time.perf_counter()
        x = args[0]
        for _ in range(loops):
            o = f(x, *args[1:])
            x = o[0]
        float(s(o))
        best = min(best, (time.perf_counter() - t0 - rpc) / loops)
    return best * 1e3, out


def main():
    a = sys.argv[1:]
    h, w = (int(a[0]), int(a[1])) if len(a) >= 2 else (2798, 3798)
    loops = int(a[2]) if len(a) >= 3 else 20
    th = int(a[3]) if len(a) >= 4 else None

    th_r, hp, wp = mg_geometry(h, w, th)
    rng = np.random.default_rng(0)
    gp = jnp.zeros((3, hp, wp), jnp.float32)
    gp = gp.at[:, :h, :w].set(
        jnp.asarray(rng.normal(size=(3, h, w)).astype(np.float32) * 50))
    up = jnp.zeros_like(gp)

    triv = jax.jit(lambda x: jnp.max(x))
    float(triv(gp))
    rpc = min(
        (lambda t0: (float(triv(gp)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(3)
    )

    base = jax.jit(partial(mg_down_pallas, nu1=1, blocked=True, padded_io=True,
                           true_hw=(h, w), th=th))
    ms_b, out_b = timeit(base, (up, gp), loops, rpc)
    print(f"baseline  mg_down ({3}x{hp}x{wp}, th={th_r}): {ms_b:.3f} ms", flush=True)

    chb = jax.jit(partial(mg_down_chbatch, nu1=1, th=th, true_hw=(h, w)))
    ms_c, out_c = timeit(chb, (up, gp), loops, rpc)
    print(f"chbatched mg_down ({3}x{hp}x{wp}, th={th_r}): {ms_c:.3f} ms", flush=True)

    for x, y in zip(out_b, out_c):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    print("outputs bit-identical")


if __name__ == "__main__":
    main()
