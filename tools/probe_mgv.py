"""TPU probe: VPU-cut variants of the fused mg level kernel bodies.

The 8K XProf (2026-08-20, solve_fix4_t) shows the fine-level kernels at
~2x their DMA roof on in-kernel VPU work (mg_up 1.15 ms/launch vs 0.56 ms
of DMA at 3x2816x3840). This probe times _mg_up_body variants in the real
blocked-ghost launch harness:

  A: current body (jnp.pad vertical neighbors, dense h_even edge selects)
  B: sublane pltpu.roll vertical neighbors (wrap rows are the outermost
     window ghosts, beyond the staleness cone — owned output identical)
  C: h_even edge correction under lax.cond on the strip index (only the
     strip(s) whose window reaches rows h-2/h-1 pay the alt-interleave
     and the two full-window selects)
  D: B + C

Checks exact equality of owned outputs vs A.

Run:  timeout 580 python tools/probe_mgv.py [h w loops [beta]]
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
from jax.experimental.pallas import tpu as pltpu

from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
    _M,
    _asm_window,
    _ghost_specs,
    _lane_neighbors,
    _level_ops,
    _round_up,
    _vmem_params,
    mg_geometry_t,
)


def _up_body_v(u, g, ec, i, *, nu2, th, h, w, wp, h_even, bh, bw,
               roll_vert: bool, cond_edge: bool):
    m = _M
    rows = i * th - m + jax.lax.broadcasted_iota(jnp.int32, (th + 2 * m, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th + 2 * m, wp), 1)
    in_dom = (rows >= 0) & (rows < h) & (cols < w)
    par = (rows + cols) % 2 == 0
    red = par & in_dom
    black = (~par) & in_dom

    nh = th // 2 + m
    j0 = m // 2
    mids = 0.5 * (ec[j0 - 1 : j0 - 1 + nh, :] + ec[j0 : j0 + nh, :])
    odd = ec[j0 : j0 + nh, :]
    corr = jnp.stack([mids, odd], axis=1).reshape(th + 2 * m, wp)
    if h_even:
        def with_edge(c0):
            gap = 2.0 + bh
            alt = jnp.stack([mids, mids], axis=1).reshape(th + 2 * m, wp)
            c0 = jnp.where(rows == h - 2, c0 * (2.0 * (1.0 + bh) / gap), c0)
            return jnp.where(rows == h - 1, alt * (2.0 * bh / gap), c0)

        if cond_edge:
            touches = (i + 1) * th + m > h - 2
            corr = jax.lax.cond(touches, with_edge, lambda c0: c0, corr)
        else:
            corr = with_edge(corr)
    u = jnp.where(in_dom, u + corr, u)

    nsum0, inv_d, _ = _level_ops(rows, cols, h, w, bh, bw, wp)
    if roll_vert:
        n = th + 2 * m
        lsh, rsh = _lane_neighbors(w, wp)
        if bh == 1.0 and bw == 1.0:
            def nsum(x):
                return (pltpu.roll(x, 1, 0) + pltpu.roll(x, n - 1, 0)
                        + lsh(x) + rsh(x))
        else:
            lrow = jnp.where(rows == h - 1, jnp.float32(2.0 / (1.0 + bh) - 1.0), 0.0)
            lcol = jnp.where(cols == w - 1, jnp.float32(2.0 / (1.0 + bw) - 1.0), 0.0)

            def nsum(x):
                up_ = pltpu.roll(x, 1, 0)
                lf = lsh(x)
                return (up_ + pltpu.roll(x, n - 1, 0) + lf + rsh(x)
                        + lrow * up_ + lcol * lf)
    else:
        nsum = nsum0
    for _ in range(nu2):
        u = jnp.where(red, (nsum(u) - g) * inv_d, u)
        u = jnp.where(black, (nsum(u) - g) * inv_d, u)
    return u[m : m + th, :]


def _kernel_v(uc, ut, ub, gc, gt, gb, ecc, ect, ecb, uo_ref, *, nu2, th, h, w,
              wp, hc, h_even, bh, bw, roll_vert, cond_edge):
    i = pl.program_id(1)
    u = _asm_window(i, th, h, wp, uc, ut, ub)
    g = _asm_window(i, th, h, wp, gc, gt, gb)
    ec = _asm_window(i, th // 2, hc, wp, ecc, ect, ecb)
    uo_ref[0] = _up_body_v(u, g, ec, i, nu2=nu2, th=th, h=h, w=w, wp=wp,
                           h_even=h_even, bh=bh, bw=bw, roll_vert=roll_vert,
                           cond_edge=cond_edge)


def launch(u, g, e, h, w, th, hp, wp, bh, bw, roll_vert, cond_edge):
    c = u.shape[0]
    hc = (h - 1) // 2
    ctr, top, bot = _ghost_specs(th, hp, wp)
    e_rows = e.shape[1]
    ec_ctr, ec_top, ec_bot = _ghost_specs(th // 2, e_rows, wp)
    return pl.pallas_call(
        partial(_kernel_v, nu2=2, th=th, h=h, w=w, wp=wp, hc=hc,
                h_even=(h % 2 == 0), bh=bh, bw=bw, roll_vert=roll_vert,
                cond_edge=cond_edge),
        grid=(c, hp // th),
        in_specs=[ctr, top, bot, ctr, top, bot, ec_ctr, ec_top, ec_bot],
        out_specs=pl.BlockSpec((1, th, wp), lambda ci, i: (ci, i, 0)),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
        compiler_params=_vmem_params(th, wp, False),
    )(u, u, u, g, g, g, e, e, e)


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 2798
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 3798
    loops = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    beta = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0
    th, hp, wp, hp2 = mg_geometry_t(h, w)
    hc = (h - 1) // 2
    rng = np.random.default_rng(0)

    def mk(shape, true_hw):
        a = np.zeros(shape, np.float32)
        a[:, : true_hw[0], : true_hw[1]] = (
            rng.normal(size=(shape[0],) + true_hw).astype(np.float32) * 20)
        return jax.device_put(jnp.asarray(a))

    u = mk((3, hp, wp), (h, w))
    g = mk((3, hp, wp), (h, w))
    e = mk((3, hp2, wp), (hc, w))

    fns = {}
    for name, (rv, ce) in {"A_base": (False, False), "B_roll": (True, False),
                           "C_edge": (False, True), "D_both": (True, True)}.items():
        fns[name] = jax.jit(partial(launch, h=h, w=w, th=th, hp=hp, wp=wp,
                                    bh=beta, bw=beta, roll_vert=rv,
                                    cond_edge=ce))

    ref = None
    triv = jax.jit(lambda x: jnp.max(jnp.abs(x)))
    float(triv(u))
    t0 = time.perf_counter(); float(triv(u)); rpc = time.perf_counter() - t0
    for name, fn in fns.items():
        out = fn(u, g, e)
        chk = np.asarray(out[:, :h, :w])
        if ref is None:
            ref = chk
        eq = bool((chk == ref).all())
        best = float("inf")
        for _ in range(2):
            x = u
            t0 = time.perf_counter()
            for _ in range(loops):
                x = fn(x, g, e)
            float(triv(x))
            best = min(best, (time.perf_counter() - t0 - rpc) / loops)
        print(f"{name}: {best * 1e3:.3f} ms/launch  owned==A: {eq}", flush=True)


if __name__ == "__main__":
    main()
