"""TPU probe: where do the quarter-plane solve's 93 ms go?

Times (chained, sync-corrected): the XLA parity-split round trip
(to_quarters o from_quarters), one mg_down_q / mg_up_q launch, and the
dense mg_down / mg_up at the same size for reference.

Run:  timeout 580 python tools/probe_quarter.py [h w loops]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
    mg_down_pallas, mg_geometry_t, mg_up_pallas)
from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import (
    from_quarters, mg_down_q_pallas, mg_geometry_q, mg_up_q_pallas,
    to_quarters)


def bench(fn, x, loops, rpc):
    y = fn(x)
    jnp.max(jnp.abs(y)).block_until_ready()
    best = float("inf")
    for _ in range(2):
        z = x
        t0 = time.perf_counter()
        for _ in range(loops):
            z = fn(z)
        float(jnp.max(jnp.abs(z)))
        best = min(best, (time.perf_counter() - t0 - rpc) / loops)
    return best * 1e3


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 2798
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 3798
    loops = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    qgeom = mg_geometry_q(h, w)
    th, hq, wq2, hp2 = qgeom
    tgeom = mg_geometry_t(h, w)
    tth, thp, twp, thp2 = tgeom
    rng = np.random.default_rng(0)
    gd = jax.device_put(jnp.asarray(np.pad(
        (rng.normal(size=(3, h, w)) * 50).astype(np.float32),
        ((0, 0), (0, 2 * hq - h), (0, 2 * wq2 - w)))))
    gq = jax.jit(to_quarters)(gd)
    gq.block_until_ready()
    e_sp = jax.device_put(jnp.asarray(
        (rng.normal(size=(3, hp2, wq2)) * 5).astype(np.float32)))
    gdt = jax.device_put(jnp.asarray(np.pad(
        (rng.normal(size=(3, h, w)) * 50).astype(np.float32),
        ((0, 0), (0, thp - h), (0, twp - w)))))
    e_dn = jax.device_put(jnp.asarray(
        (rng.normal(size=(3, thp2, twp)) * 5).astype(np.float32)))

    triv = jax.jit(lambda x: jnp.max(jnp.abs(x)))
    float(triv(gd))
    t0 = time.perf_counter(); float(triv(gd)); rpc = time.perf_counter() - t0

    conv = jax.jit(lambda x: to_quarters(from_quarters(x)))
    down_q = jax.jit(lambda x: mg_down_q_pallas(x, gq, 1, (h, w), qgeom)[0])
    up_q = jax.jit(lambda x: mg_up_q_pallas(x, gq, e_sp, e_sp, 2, (h, w), qgeom))
    down_d = jax.jit(lambda x: mg_down_pallas(
        x, gdt, 1, blocked=True, padded_io=True, true_hw=(h, w),
        geom=(tth, thp, twp))[0])
    up_d = jax.jit(lambda x: mg_up_pallas(
        x, gdt, e_dn[:, : thp // 2, :], 2, blocked=True, padded_io=True,
        true_hw=(h, w), geom=(tth, thp, twp)))

    print(f"conv_pair: {bench(conv, gq, loops, rpc):.3f} ms", flush=True)
    print(f"down_q:    {bench(down_q, gq, loops, rpc):.3f} ms", flush=True)
    print(f"up_q:      {bench(up_q, gq, loops, rpc):.3f} ms", flush=True)
    print(f"down_dense:{bench(down_d, gdt, loops, rpc):.3f} ms", flush=True)
    print(f"up_dense:  {bench(up_d, gdt, loops, rpc):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
