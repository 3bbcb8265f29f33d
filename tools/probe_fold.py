"""TPU probe: in-kernel lane-reversal forms for the DST fold, and their speed.

jnp.flip inside a Mosaic kernel does NOT lower (rev primitive missing), so the
reversal must be built from supported pieces. Variants:
  copy         — pure strip pass, the bandwidth baseline
  full_roll    — block-mirror + per-tile anti-identity dot + pltpu.roll
  full_2dot    — roll-free: each reversed 128-block = two shifted one-hot dots
                 of the two straddling input blocks, stored per-block
Both "full" variants compute s = x + rev_n(x) over the padded strip (exact).

Run:  timeout 580 python tools/probe_fold.py [m n loops [th]]
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

HI = jax.lax.Precision.HIGHEST


def _ru(x, m):
    return (x + m - 1) // m * m


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), precision=HI,
                               preferred_element_type=jnp.float32)


def shift_rev_mats(n: int):
    """(A, B) one-hot f32 (128,128): reversed output block bo of rev_n reads
    rev_blk = x_blk(bi) @ A + x_blk(bi+1) @ B with bi = (n-1-128*bo)//128 - 1.
    Out-of-range source lanes map to nothing (zero columns)."""
    r = (n - 1) % 128
    a = np.zeros((128, 128), np.float32)
    b = np.zeros((128, 128), np.float32)
    for l in range(128):
        s = r - l  # source lane relative to block bi's base + 128
        if s >= 0:
            b[s, l] = 1.0  # lives in the upper block (bi+1), lane s
        else:
            a[128 + s, l] = 1.0  # lower block (bi), lane 128+s
    return a, b


def _pallas(kernel, x, extra=(), th=256, out_lanes=None):
    c, m, npad = x.shape
    mp = _ru(m, th)
    ol = out_lanes or npad
    xp = jnp.pad(x, ((0, 0), (0, mp - m), (0, 0)))
    in_specs = [pl.BlockSpec((1, th, npad), lambda ci, i: (ci, i, 0))]
    args = [xp]
    for e in extra:
        in_specs.append(pl.BlockSpec(e.shape, lambda ci, i: (0,) * e.ndim))
        args.append(e)
    out = pl.pallas_call(
        kernel,
        grid=(c, mp // th),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, ol), lambda ci, i: (ci, i, 0)),
        out_shape=jax.ShapeDtypeStruct((c, mp, ol), jnp.float32),
    )(*args)
    return out[:, :m]


def make_variants(n, npad):
    nb = npad // 128
    j128 = jnp.asarray(np.eye(128, dtype=np.float32)[::-1].copy())
    a_m, b_m = shift_rev_mats(n)
    ja, jb = jnp.asarray(a_m), jnp.asarray(b_m)

    def copy_k(x_ref, o_ref):
        o_ref[0] = x_ref[0] * 1.0000001

    def full_roll_k(x_ref, j_ref, o_ref):
        x = x_ref[0]
        j = j_ref[...]
        parts = [_dot(x[:, (nb - 1 - b) * 128:(nb - b) * 128], j)
                 for b in range(nb)]
        rev_aligned = jnp.concatenate(parts, axis=-1)
        rev = pltpu.roll(rev_aligned, n, 1) if npad != n else rev_aligned
        o_ref[0] = x + rev

    def full_2dot_k(x_ref, a_ref, b_ref, o_ref):
        x = x_ref[0]
        a, b = a_ref[...], b_ref[...]
        zero = jnp.zeros((x.shape[0], 128), jnp.float32)

        def blk(i):
            return x[:, i * 128:(i + 1) * 128] if 0 <= i < nb else zero

        for bo in range(nb):
            bi = (n - 1 - 128 * bo) // 128 - 1
            rev = _dot(blk(bi), a) + _dot(blk(bi + 1), b)
            o_ref[0, :, bo * 128:(bo + 1) * 128] = blk(bo) + rev

    return {
        "copy": (copy_k, ()),
        "full_roll": (full_roll_k, (j128,)),
        "full_2dot": (full_2dot_k, (ja, jb)),
    }


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 2432
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1550
    loops = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    th = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    npad = _ru(n, 128)
    rng = np.random.default_rng(0)
    xh = np.zeros((3, m, npad), np.float32)
    xh[:, :, :n] = rng.normal(size=(3, m, n)).astype(np.float32)
    x = jnp.asarray(xh)
    want = xh[:, :, :n] + xh[:, :, :n][:, :, ::-1]  # x + rev_n, lanes [0, n)

    triv = jax.jit(lambda a: jnp.max(a))
    float(triv(x))
    t0 = time.perf_counter()
    float(triv(x))
    rpc = time.perf_counter() - t0

    for name, (kern, extra) in make_variants(n, npad).items():
        try:
            def g(a, kern=kern, extra=extra):
                return _pallas(kern, a * (1 + 1e-12), extra, th=th)
            f = jax.jit(g)
            out = np.asarray(f(x))
            err = float(np.abs(out[:, :, :n] - want).max())
            u = x
            t0 = time.perf_counter()
            for _ in range(loops):
                u = f(u)
            float(jnp.max(u))
            dt = (time.perf_counter() - t0 - rpc) / loops
            gbs = 2 * x.size * 4 / dt / 1e9
            print(f"{name:12s}: err={err:.2e}  {dt*1e3:.3f} ms/pass  {gbs:.0f} GB/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
