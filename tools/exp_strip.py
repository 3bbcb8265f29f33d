"""Experiment: mg_down_pallas strip-height sweep on the real TPU."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from seamlesscloneoptimization_tpu.ops import pallas_kernels as PK

shape = (3, 2798, 3798)
rng = np.random.default_rng(0)
print("uploading...", flush=True)
g = jnp.asarray((rng.normal(size=shape) * 255).astype(np.float32))
u0 = jnp.zeros_like(g)

triv = jax.jit(lambda x: jnp.max(x))
float(triv(g))
t0 = time.perf_counter(); float(triv(g)); rpc = time.perf_counter() - t0
print(f"rpc={rpc * 1e3:.1f} ms", flush=True)

ref = None
for th in [None, 32, 64, 128, 256]:
    try:
        t0 = time.perf_counter()
        uo, rh = PK.mg_down_pallas(u0, g, 1, th=th)
        s = float(jnp.max(jnp.abs(uo)) + jnp.max(jnp.abs(rh)))
        print(f"th={th}: compiled in {time.perf_counter() - t0:.1f} s", flush=True)
        if ref is None:
            ref = s
        best = 1e9
        for _ in range(2):
            uu = u0
            t0 = time.perf_counter()
            for _ in range(20):
                uu, rh = PK.mg_down_pallas(uu * 1e-7, g, 1, th=th)
            float(jnp.max(jnp.abs(uu)) + jnp.max(jnp.abs(rh)))
            best = min(best, (time.perf_counter() - t0 - rpc) / 20)
        ok = abs(s - ref) < 1e-2 * abs(ref)
        print(f"th={th}: {best * 1e3:7.3f} ms  consistent={ok}", flush=True)
    except Exception as e:
        print(f"th={th}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
