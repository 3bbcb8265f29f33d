"""TPU probe: fused fold + VMEM-resident folded-V GEMM (half-size blocks).

VERDICT r2 next #7. The serve chain's last ~1 ms is einsum<->custom-call
staging around the Pallas fold/transpose kernels; the only recovery route
is the folded GEMMs INSIDE the kernel, with the folded (half-size) V
factors VMEM-resident. The round-2 probe of this idea (tools/tpu_queue.md
§1, 2026-08-18, not committed as code) measured the single-bf16 2-pass
form at no win and the bf16_3x 3-pass form order-of-magnitude unstable in
Mosaic. This is the committed, reproducible version at exactly the
half-size folded shapes:

  chain      — the shipping decomposition: fold_minor_pallas + two XLA
               einsums (HIGH = bf16_3x) against the folded factors
  fused2     — one kernel: in-VMEM fold, V resident as single bf16,
               2 MXU passes per GEMM pair (changes numerics: ~bf16_1x)
  fused3     — one kernel: bf16_3x-equivalent (x split hi/lo, 3 dots)

Shapes default to the 2400x1552 headline's w-axis transform.

Run:  timeout 580 python tools/probe_foldgemm.py [m n loops]
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
    _J128, _round_up, fold_minor_pallas)

HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _fold(x, n, j128, ep, op):
    npad = x.shape[-1]
    nb = npad // 128
    parts = [
        jax.lax.dot_general(x[:, (nb - 1 - b) * 128:(nb - b) * 128], j128,
                            (((1,), (0,)), ((), ())), precision=HI,
                            preferred_element_type=jnp.float32)
        for b in range(nb)
    ]
    rev = pltpu.roll(jnp.concatenate(parts, axis=-1), n, 1)
    if n % 2:
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        rev = jnp.where(lane == (n - 1) // 2, 0.0, rev)
    return (x + rev)[:, :ep], (x - rev)[:, :op]


def _fused_kernel(x_ref, j_ref, vs_ref, vd_ref, o_ref, *, n, ep, op, three):
    s, d = _fold(x_ref[0], n, j_ref[...], ep, op)
    vs, vd = vs_ref[...], vd_ref[...]
    if three:
        s_hi = s.astype(jnp.bfloat16)
        s_lo = (s - s_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        d_hi = d.astype(jnp.bfloat16)
        d_lo = (d - d_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        vsh = vs
        vdh = vd
        es = _dot(s_hi, vsh) + _dot(s_lo, vsh)
        eo = _dot(d_hi, vdh) + _dot(d_lo, vdh)
    else:
        es = _dot(s.astype(jnp.bfloat16), vs)
        eo = _dot(d.astype(jnp.bfloat16), vd)
    o_ref[0] = jnp.concatenate([es, eo], axis=-1)


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 1664
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2398
    loops = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    npad = _round_up(n, 128)
    he, ho = (n + 1) // 2, n // 2
    ep, op = _round_up(he, 128), _round_up(ho, 128)
    # random stand-ins at the exact folded-factor shapes — the probe's
    # question (Mosaic schedule + MXU throughput) is shape-only
    rng = np.random.default_rng(0)
    vep = jnp.asarray(rng.normal(size=(ep, ep)).astype(np.float32) * 0.02)
    vop = jnp.asarray(rng.normal(size=(op, ep)).astype(np.float32) * 0.02)
    x = jax.device_put(jnp.asarray(
        rng.normal(size=(3, m, npad)).astype(np.float32) * 100))

    th = 256
    mp = _round_up(m, th)
    xp = jnp.pad(x, ((0, 0), (0, mp - m), (0, 0)))

    def fused(xp, three):
        return pl.pallas_call(
            partial(_fused_kernel, n=n, ep=ep, op=op, three=three),
            grid=(3, mp // th),
            in_specs=[
                pl.BlockSpec((1, th, npad), lambda c, i: (c, i, 0)),
                pl.BlockSpec((128, 128), lambda c, i: (0, 0)),
                pl.BlockSpec((ep, ep), lambda c, i: (0, 0)),
                pl.BlockSpec((op, ep), lambda c, i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, th, 2 * ep), lambda c, i: (c, i, 0)),
            out_shape=jax.ShapeDtypeStruct((3, mp, 2 * ep), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 << 20),
        )(xp, jnp.asarray(_J128),
          vs_ref_arg := vep.astype(jnp.bfloat16), vop.astype(jnp.bfloat16))

    def chain(xp):
        s, d = fold_minor_pallas(xp, n)
        es = jnp.einsum("cme,ef->cmf", s, vep, precision=jax.lax.Precision.HIGH)
        eo = jnp.einsum("cmo,of->cmf", d, vop, precision=jax.lax.Precision.HIGH)
        return jnp.concatenate([es, eo], axis=-1)

    triv = jax.jit(lambda a: jnp.max(jnp.abs(a)))
    float(triv(x))
    t0 = time.perf_counter(); float(triv(x)); rpc = time.perf_counter() - t0

    fns = {
        "chain": jax.jit(chain),
        "fused2": jax.jit(partial(fused, three=False)),
        "fused3": jax.jit(partial(fused, three=True)),
    }
    for name, fn in fns.items():
        try:
            y = fn(xp)
            float(triv(y))
        except Exception as e:  # Mosaic rejections are data too
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}")
            continue
        best = float("inf")
        for _ in range(2):
            z = xp
            t0 = time.perf_counter()
            for _ in range(loops):
                y = fn(z)
                z = jnp.pad(y[:, :, :npad] * 1e-6, (
                    (0, 0), (0, 0), (0, max(0, npad - y.shape[-1]))))[:, :, :npad]
            float(triv(y))
            best = min(best, (time.perf_counter() - t0 - rpc) / loops)
        print(f"{name}: {best * 1e3:.3f} ms/transform", flush=True)


if __name__ == "__main__":
    main()
