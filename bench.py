"""Benchmark harness: megapixels/s per chip, steady-state serve, vs the reference.

Protocol: the reference's serve mode (seamlessClone-CUDA/seamlessClone_imp.cu:
265-352 with bSync=false + SeamlessClone_test.py instance reuse): one warm
instance, inputs device-resident, each frame's output chained as the next
frame's destination, one sync at the end. Host<->device sync latency (large
through the axon TPU tunnel, ~70 ms, vs <0.1 ms on a local PCIe host) is
measured separately, subtracted from the loop, and reported in extras
together with a per-call e2e number that includes host uploads.

Headline config = the reference's largest published workload: 2400x1552
source patch into a 4800x2694 destination (seamlessClone_main.sh:23).
Baseline = V100 with-FFT e2e latency 63.988 ms (PDF §1.1 table) ~= 58.2 MP/s.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "MP/s", "vs_baseline": ...}
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

BASELINE_MPS_V100_2400 = 3.7248 / 63.988e-3  # 2400x1552 px / 63.988 ms


def load_images(scale_to=(2400, 1552), dst_to=(4800, 2694)):
    import os

    import cv2

    # SCL_BENCH_SIZES="sw,sh,dw,dh" overrides the workload (CI smoke tests)
    env = os.environ.get("SCL_BENCH_SIZES")
    if env:
        sw, sh, dw, dh = (int(x) for x in env.split(","))
        scale_to, dst_to = (sw, sh), (dw, dh)
    a = cv2.imread("/root/reference/seamlessClone-OpenCV/images/airplane.jpg")
    s = cv2.imread("/root/reference/seamlessClone-OpenCV/images/sky.jpg")
    src = cv2.resize(a, scale_to, interpolation=cv2.INTER_CUBIC)
    dst = cv2.resize(s, dst_to, interpolation=cv2.INTER_CUBIC)
    return src, dst


def accuracy_check(eng):
    """diff vs cv2.seamlessClone at the published 300x194 config, on-device.

    (The vs.py harness metric, compare/vs.py:52-69; D2H through the tunnel is
    pathologically slow, so the absdiff reduces on the TPU and only two
    scalars come back.)
    """
    import cv2
    import jax
    import jax.numpy as jnp

    a = cv2.imread("/root/reference/seamlessClone-OpenCV/images/airplane.jpg")
    s = cv2.imread("/root/reference/seamlessClone-OpenCV/images/sky.jpg")
    m = np.full(a.shape[:2], 255, np.uint8)
    golden = cv2.seamlessClone(a, s, m.copy(), (800, 150), cv2.NORMAL_CLONE)
    mine = eng.run(a, s, m.copy(), (800, 150))
    g_d = jax.device_put(golden, eng.device)
    diff = jnp.abs(mine.astype(jnp.int32) - g_d.astype(jnp.int32))
    return int(jnp.sum(diff)), int(jnp.max(diff))


def pallas_parity_check(eng):
    """On-TPU Mosaic-vs-XLA cross-check (ref: the with-FFT vs with-GEMM
    cross-check discipline, PDF §1.1 table).

    The interpret-mode unit tests validate kernel *semantics* on CPU; this
    validates the actual Mosaic lowering on the chip: the same inputs run
    through the full-Pallas engine (``eng``) and a pure-XLA engine, and the
    bench FAILS LOUDLY if they disagree by more than 1 LSB (the two paths
    accumulate the DST GEMMs in different orders, so bit-equality is not
    guaranteed, but any Mosaic miscompile shows up as a gross diff).
    """
    import cv2
    import jax.numpy as jnp

    from seamlesscloneoptimization_tpu.core.config import CloneConfig
    from seamlesscloneoptimization_tpu.core.engine import SeamlessClone

    a = cv2.imread("/root/reference/seamlessClone-OpenCV/images/airplane.jpg")
    s = cv2.imread("/root/reference/seamlessClone-OpenCV/images/sky.jpg")
    m = np.full(a.shape[:2], 255, np.uint8)
    xla_eng = SeamlessClone(CloneConfig(solver="dst_gemm", precision="high"))
    got_pl = eng.run(a, s, m.copy(), (800, 150))
    got_xla = xla_eng.run(a, s, m.copy(), (800, 150))
    diff = jnp.abs(got_pl.astype(jnp.int32) - got_xla.astype(jnp.int32))
    dmax = int(jnp.max(diff))
    if dmax > 1:
        raise AssertionError(
            f"Pallas (Mosaic) output diverged from the XLA path: diff_max={dmax}")
    return dmax


def batch_metric(eng, loops: int = 20):
    """BASELINE "64 masks into one 4K destination": ms per fused batch step.

    Device-resident inputs, each step's output chained as the next step's
    destination (the tunnel runtime is dataflow-lazy — unchained steps may
    never execute), one scalar-fetch sync, rpc latency subtracted. The
    figure previously lived only in docs/PERF.md; the driver now records it
    every round (VERDICT r3 next #7).
    """
    from functools import partial

    import os

    import jax
    import jax.numpy as jnp

    from seamlesscloneoptimization_tpu.parallel.batch import (
        clone_batch_composite,
        fast_dst_solver,
    )

    # the SHIPPED batch config: folded bf16_3x GEMMs (seamless_clone_batch_
    # fused's defaults — VERDICT r4 weak #1: the driver-recorded figure must
    # reflect the fast path users get). A/B knobs: SCL_BATCH_PRECISION=
    # highest, SCL_BATCH_FOLDED=0, SCL_BATCH_PALLAS=1.
    solver = fast_dst_solver(
        precision=os.environ.get("SCL_BATCH_PRECISION", "high"),
        folded=os.environ.get("SCL_BATCH_FOLDED", "1") == "1")
    use_pallas = os.environ.get("SCL_BATCH_PALLAS", "0") == "1"

    rng = np.random.default_rng(0)
    device = eng.device
    n, b = 64, 130  # 64 jobs, 128x128 interiors
    hd, wd = 2160, 3840
    dst = jax.device_put(rng.integers(0, 256, (hd, wd, 3)).astype(np.uint8), device)
    srcs = jax.device_put(rng.integers(0, 256, (n, b, b, 3)).astype(np.uint8), device)
    masks = jax.device_put(np.full((n, b, b), 255, np.uint8), device)
    lts = jax.device_put(np.array(
        [[(i % 8) * 470 + 20, (i // 8) * 260 + 20] for i in range(n)],
        np.int32), device)
    fn = jax.jit(partial(clone_batch_composite, flags=1, solver=solver,
                         roi_hw=(b, b), use_pallas=use_pallas))
    sync = jax.jit(lambda x: jnp.max(x))
    out = fn(dst, srcs, masks, lts)
    float(sync(out))  # warm-up compile + sync-op compile
    # min(pre, post) rpc like timed_serve (one shared sampler — the engine's
    # _sync_overhead_ms): a turbulent one-shot estimate over-subtracts and
    # reports impossible step times
    rpc_pre = eng._sync_overhead_ms()
    t0 = time.perf_counter()
    for _ in range(loops):
        out = fn(out, srcs, masks, lts)
    float(sync(out))
    elapsed = (time.perf_counter() - t0) * 1e3
    return max((elapsed - min(rpc_pre, eng._sync_overhead_ms())) / loops, 1e-6)


def main():
    solver = sys.argv[1] if len(sys.argv) > 1 else "auto"
    loops = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from seamlesscloneoptimization_tpu.core.config import CloneConfig
    from seamlesscloneoptimization_tpu.core.engine import SeamlessClone

    src, dst = load_images()
    mask = np.full(src.shape[:2], 255, np.uint8)
    center = (dst.shape[1] // 2, dst.shape[0] // 2)
    size_tag = f"{src.shape[1]}x{src.shape[0]}"
    is_default_size = size_tag == "2400x1552"

    import os

    # The bench measures the SHIPPED DEFAULTS (CloneConfig: precision="high",
    # dst_folded, mg_padded="q", full Pallas serve chain — all flipped on
    # from the 2026-08-18/20 hardware A/Bs, docs/PERF.md; VERDICT r3 next
    # #1). Env knobs override for A/B only:
    cfg_kwargs = dict(solver=solver, tol=2e-4, donate_dst=True)
    folded_env = os.environ.get("SCL_DST_FOLDED")  # "0"/"1"
    if folded_env is not None:
        cfg_kwargs["dst_folded"] = folded_env == "1"
    # q (quarter-plane, default) | t (dense transpose-fused) |
    # 1 (round-2 vcycle_p) | 0 (element mode)
    mg_env = os.environ.get("SCL_MG_PADDED")
    if mg_env is not None:
        cfg_kwargs["mg_padded"] = {"0": False, "1": True}.get(mg_env, mg_env)
    eng = SeamlessClone(CloneConfig(**cfg_kwargs))
    _, serve_ms = eng.timed_serve(src, dst, mask, center, loops=loops)
    # "auto" (the shipped default) resolves per compiled program; the
    # accuracy/parity gates below key on what actually ran. At the headline
    # 2400x1552 (3.7 MP < both crossovers) this is dst_gemm.
    solver_eff = eng.metrics.get("solver_resolved", solver)
    heal_fired = bool(eng.metrics.get("heal_fired", False))

    # one per-call e2e sample including host->device uploads (reference
    # protocol, imp.cpp:419-421 H2D each call); forced with a scalar fetch —
    # block_until_ready can lie through the tunnel (see CLAUDE.md)
    import jax.numpy as jnp

    # The non-planar program is DISTINCT from the serve loop's planar one:
    # warm it first (one untimed run + sync) so the sample measures
    # H2D + solve, not a fresh 20-60 s tunnel XLA compile (VERDICT r3 weak
    # #2: r03's 15.2 s "e2e" was a compile). The compile cost is reported
    # separately.
    t0 = time.perf_counter()
    float(jnp.max(eng.run(src, dst, mask, center)))
    compile_ms = (time.perf_counter() - t0) * 1e3
    # best of two: single-sample H2D through the tunnel swings 2-4x run
    # to run (one-sided latency spikes), and this extra stays comparable
    # across rounds
    e2e_ms = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = eng.run(src, dst, mask, center)
        float(jnp.max(out))
        e2e_ms = min(e2e_ms, (time.perf_counter() - t0) * 1e3)

    mp = src.shape[0] * src.shape[1] / 1e6
    mps = mp / (serve_ms / 1e3)
    diff_sum, diff_max = accuracy_check(eng)
    # Accuracy ENVELOPE, not just diff-max: the reference tracked diff SUMS
    # (44/128 at 300x194, PDF §1.1; vs.py:52-69) — fail loudly on drift that
    # diff-max <= 1 hides (r01->r02 moved 704 -> 769 untracked). The direct
    # solver pins <= 1000 (measured 769); the iterative solvers at tol=2e-4
    # carry a residual-bounded tail of extra +-1 pixels (multigrid measures
    # ~1600 with diff_max still 1) — bounded at 2500.
    sum_bound = 1000 if solver_eff in ("dst_gemm", "dst_fft") else 2500
    if diff_max > 1 or diff_sum > sum_bound:
        raise AssertionError(
            f"300x194 accuracy envelope violated: diff_max={diff_max} (<=1), "
            f"diff_sum={diff_sum} (<={sum_bound})")
    mean_abs_big = None
    if is_default_size and os.environ.get("SCL_BENCH_ENVELOPE", "1") == "1":
        # headline-size mean-abs envelope vs cv2 (the <1 LSB north star);
        # ~30 s of host cv2 time, skippable with SCL_BENCH_ENVELOPE=0
        import cv2
        import jax
        import jax.numpy as jnp

        golden = cv2.seamlessClone(src, dst, mask.copy(), center, cv2.NORMAL_CLONE)
        g_d = jax.device_put(golden, eng.device)
        d = jnp.abs(out.astype(jnp.int32) - g_d.astype(jnp.int32))
        mean_abs_big = float(jnp.mean(d.astype(jnp.float32)))
        # 0.45 bound: measured 0.397 (direct-solver f32 conditioning shared
        # with the reference's cuBLAS path, PERF.md) + ~13% headroom for
        # benign accumulation-order drift (XLA version, FMA contraction) —
        # the bound exists to catch GROSS regressions, not sub-LSB noise;
        # the <1-LSB north star is the mean staying far below 1.0
        if mean_abs_big > 0.45:
            raise AssertionError(
                f"2400x1552 mean-abs envelope violated: {mean_abs_big} (<=0.45; "
                f"PERF.md pins 0.397)")
    parity_max = pallas_parity_check(eng) if solver_eff == "dst_gemm" else None

    batch_ms = None
    if solver_eff == "dst_gemm" and os.environ.get("SCL_BENCH_BATCH", "1") == "1":
        try:
            batch_ms = round(batch_metric(eng), 3)
        except Exception as e:  # never let the extra kill the headline line
            print(f"batch_metric failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"seamless_clone_serve_{size_tag}_megapixels_per_s",
                "value": round(mps, 3),
                "unit": "MP/s",
                # the baseline is the 2400x1552 V100 number; a size override
                # (SCL_BENCH_SIZES smoke tests) has no comparable baseline
                "vs_baseline": round(mps / BASELINE_MPS_V100_2400, 3) if is_default_size else 0.0,
                "extras": {
                    "solver": solver,
                    "solver_resolved": solver_eff,
                    "serve_layout_heal_fired": heal_fired,
                    "precision": eng.config.precision,
                    "dst_folded": eng.config.dst_folded,
                    "mg_padded": eng.config.mg_padded,
                    f"serve_ms_per_frame_{size_tag}": round(serve_ms, 3),
                    f"e2e_ms_with_h2d_{size_tag}": round(e2e_ms, 3),
                    "nonplanar_first_call_ms": round(compile_ms, 1),
                    "sync_overhead_ms": round(eng.metrics.get("sync_overhead_ms", 0.0), 2),
                    "device_memory_bytes": eng.metrics.get("device_memory_bytes", 0),
                    "accuracy_300x194_diff_sum": diff_sum,
                    "accuracy_300x194_diff_max": diff_max,
                    "accuracy_2400x1552_mean_abs": (
                        round(mean_abs_big, 4) if mean_abs_big is not None else None),
                    "pallas_vs_xla_on_tpu_diff_max": parity_max,
                    "fused_batch_64x128_into_4k_ms": batch_ms,
                    "baseline_mps_v100_fft": round(BASELINE_MPS_V100_2400, 1),
                    "device": str(eng.device),
                    "loops": loops,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
