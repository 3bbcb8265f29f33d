"""TPU probe: roll-form neighbor sum for the in-kernel red-black sweeps.

The fused level kernels are VPU-bound (tools/probe_mgch.py killed the
per-step theory). Each half-sweep's ``nsum`` does a lane-direction
jnp.pad + 2 lane slices; Mosaic handles the off-128 lane pad with
masked shifts that may cost more than a plain cyclic shift. In PADDED
space, columns >= w are exact zeros, so when w < wp the lane neighbors
are ``pltpu.roll(x, +-1, axis=1)``: the wrap-around brings a zero into
column 0's left neighbor (exactly the Dirichlet pad), and the garbage
right-neighbor at column wp-1 is outside the domain and killed by the
in_dom select. (w == wp exactly would wrap real data — the variant is
only valid for w < wp.)

Times rb-sweep kernels (4 sweeps, the _rb_body structure) in the
current pad form vs the roll form at a target shape; checks bitwise
equality on the true domain.

Run:  timeout 580 python tools/probe_nsum.py [h w loops [th]]
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
    _ghost_specs,
    _asm_window,
    _rb_launch_b,
    _round_up,
    _vmem_params,
)


def _rb_body_roll(u, g, i, *, n_sweeps, th, h, w, wp):
    m = _M
    rows = i * th - m + jax.lax.broadcasted_iota(jnp.int32, (th + 2 * m, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th + 2 * m, wp), 1)
    in_dom = (rows >= 0) & (rows < h) & (cols < w)
    par = (rows + cols) % 2 == 0
    red = par & in_dom
    black = (~par) & in_dom

    def nsum(x):
        vert = jnp.pad(x, ((1, 1), (0, 0)))  # sublane pad: cheap
        v = vert[:-2, :] + vert[2:, :]
        return v + pltpu.roll(x, 1, 1) + pltpu.roll(x, wp - 1, 1)

    def body(_, x):
        x = jnp.where(red, (nsum(x) - g) * 0.25, x)
        x = jnp.where(black, (nsum(x) - g) * 0.25, x)
        return x

    u = jax.lax.fori_loop(0, n_sweeps, body, u)
    return u[m : m + th, :]


def _kernel_roll(uc, ut, ub, gc, gt, gb, out_ref, *, n_sweeps, th, h, w, wp):
    i = pl.program_id(1)
    u = _asm_window(i, th, h, wp, uc, ut, ub)
    g = _asm_window(i, th, h, wp, gc, gt, gb)
    out_ref[0] = _rb_body_roll(u, g, i, n_sweeps=n_sweeps, th=th, h=h, w=w, wp=wp)


def rb_sweeps_roll(u, g, n_sweeps, th, true_hw):
    h, w = true_hw
    c, hp, wp = g.shape
    assert w < wp, "roll form requires zero lanes beyond w"
    ctr, top, bot = _ghost_specs(th, hp, wp)
    return pl.pallas_call(
        partial(_kernel_roll, n_sweeps=n_sweeps, th=th, h=h, w=w, wp=wp),
        grid=(c, hp // th),
        in_specs=[ctr, top, bot] * 2,
        out_specs=pl.BlockSpec((1, th, wp), lambda ci, i: (ci, i, 0)),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
        compiler_params=_vmem_params(th, wp, False),
    )(u, u, u, g, g, g)


def timeit(f, args, loops, rpc):
    out = f(*args)
    s = jax.jit(lambda a: jnp.max(jnp.abs(a)))
    float(s(out))
    best = 1e30
    for _ in range(2):
        t0 = time.perf_counter()
        x = args[0]
        for _ in range(loops):
            x = f(x, *args[1:])
        float(s(x))
        best = min(best, (time.perf_counter() - t0 - rpc) / loops)
    return best * 1e3, out


def main():
    a = sys.argv[1:]
    h, w = (int(a[0]), int(a[1])) if len(a) >= 2 else (2798, 3798)
    loops = int(a[2]) if len(a) >= 3 else 30
    th = int(a[3]) if len(a) >= 4 else 128

    wp = _round_up(w, 128)
    hp = _round_up(h, th)
    rng = np.random.default_rng(0)
    gp = jnp.zeros((3, hp, wp), jnp.float32)
    gp = gp.at[:, :h, :w].set(
        jnp.asarray(rng.normal(size=(3, h, w)).astype(np.float32) * 50))
    up = jnp.zeros_like(gp)

    triv = jax.jit(lambda x: jnp.max(x))
    float(triv(gp))
    t0 = time.perf_counter(); float(triv(gp)); rpc = time.perf_counter() - t0

    # baseline: the production blocked rb kernel on the SAME pre-padded
    # buffers (no crop/pad passes on either side — kernel-only comparison)
    base = jax.jit(lambda u, g: _rb_launch_b(u, g, 4, th, h, w, wp, hp, 3, False))
    ms_b, out_b = timeit(base, (up, gp), loops, rpc)
    print(f"pad-form  rb x4 (3x{hp}x{wp}, th={th}): {ms_b:.3f} ms", flush=True)

    roll = jax.jit(partial(rb_sweeps_roll, n_sweeps=4, th=th, true_hw=(h, w)))
    ms_r, out_r = timeit(roll, (up, gp), loops, rpc)
    print(f"roll-form rb x4 (3x{hp}x{wp}, th={th}): {ms_r:.3f} ms", flush=True)

    np.testing.assert_array_equal(np.asarray(out_b[:, :h, :w]),
                                  np.asarray(out_r[:, :h, :w]))
    print("outputs bit-identical on the true domain")


if __name__ == "__main__":
    main()
