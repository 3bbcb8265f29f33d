"""JAX pipeline vs the NumPy oracle and vs cv2 (golden), all solvers."""

import cv2
import jax
import numpy as np
import pytest

from seamlesscloneoptimization_tpu.api import seamless_clone
from seamlesscloneoptimization_tpu.core import reference as R
from seamlesscloneoptimization_tpu.core.config import CloneConfig
from seamlesscloneoptimization_tpu.core.engine import SeamlessClone


from conftest import diff_stats, psnr


class TestJaxVsOracle:
    @pytest.mark.parametrize("solver", ["dst_gemm", "dst_fft"])
    def test_direct_solvers_match_oracle(self, airplane, sky, irregular_mask, solver):
        oracle = R.seamless_clone_np(airplane, sky, irregular_mask.copy(), (700, 300))
        out = seamless_clone(airplane, sky, irregular_mask.copy(), (700, 300), solver=solver)
        s, m = diff_stats(oracle, out)
        assert m <= 1, f"{solver}: diff max {m}"

    def test_multigrid_matches_oracle(self, airplane, sky, irregular_mask):
        oracle = R.seamless_clone_np(airplane, sky, irregular_mask.copy(), (700, 300))
        out = seamless_clone(
            airplane, sky, irregular_mask.copy(), (700, 300), solver="multigrid", tol=1e-6
        )
        s, m = diff_stats(oracle, out)
        assert m <= 1, f"multigrid: diff max {m}, sum {s}"

    @pytest.mark.parametrize("flags", [R.NORMAL_CLONE, R.MIXED_CLONE, R.MONOCHROME_TRANSFER])
    def test_all_modes_match_oracle(self, airplane, sky, irregular_mask, flags):
        oracle = R.seamless_clone_np(airplane, sky, irregular_mask.copy(), (700, 300), flags=flags)
        out = seamless_clone(airplane, sky, irregular_mask.copy(), (700, 300), flags=flags)
        s, m = diff_stats(oracle, out)
        assert m <= 1, f"flags={flags}: diff max {m}"


class TestJaxVsGolden:
    def test_normal_bitclose_vs_cv2(self, airplane, sky, full_mask):
        golden = cv2.seamlessClone(airplane, sky, full_mask.copy(), (800, 150), cv2.NORMAL_CLONE)
        out = seamless_clone(airplane, sky, full_mask.copy(), (800, 150))
        s, m = diff_stats(golden, out)
        assert m <= 1, f"diff max {m}"
        assert s <= 1000, f"diff sum {s}"

    def test_accuracy_envelope_bench_config(self, airplane, sky, full_mask):
        """Pin the ACCURACY ENVELOPE of the bench serve config (bf16_3x +
        folded DST): diff-max <= 1 alone hides sub-LSB drift — BENCH_r01 ->
        r02 moved 300x194 diff_sum 704 -> 769 with nothing tracking it
        (VERDICT r2 weak #4). The reference published diff SUMS at this size
        (44 FFT / 128 GEMM, PDF §1.1; vs.py:52-69 reports sum) — bound ours
        at 1000 so a regression that diff-max misses still fails loudly."""
        golden = cv2.seamlessClone(airplane, sky, full_mask.copy(), (800, 150),
                                   cv2.NORMAL_CLONE)
        eng = SeamlessClone(CloneConfig(solver="dst_gemm", precision="high",
                                        dst_folded=True))
        out = eng.run(airplane, sky, full_mask.copy(), (800, 150))
        s, m = diff_stats(golden, np.asarray(out))
        assert m <= 1, f"diff max {m}"
        assert s <= 1000, f"diff sum {s} (bench-config envelope)"


class TestEngine:
    def test_instance_reuse_no_recompile(self, airplane, sky, full_mask):
        eng = SeamlessClone(CloneConfig(solver="dst_gemm"))
        eng.run(airplane, sky, full_mask.copy(), (800, 150))
        n_compiled = len(eng._cache)
        for cx in (790, 800, 810):  # moving the center must not recompile
            eng.run(airplane, sky, full_mask.copy(), (cx, 150))
        eng.sync()
        assert len(eng._cache) == n_compiled == 1

    def test_empty_mask_returns_dst(self, airplane, sky):
        eng = SeamlessClone()
        out = eng.run(airplane, sky, np.zeros(airplane.shape[:2], np.uint8), (800, 150))
        assert np.array_equal(np.asarray(out), sky)

    def test_out_of_bounds_raises(self, airplane, sky, full_mask):
        eng = SeamlessClone()
        with pytest.raises(ValueError):
            eng.run(airplane, sky, full_mask.copy(), (5, 5))

    def test_timed_run_metrics(self, airplane, sky, full_mask):
        eng = SeamlessClone()
        _, ms = eng.timed_run(airplane, sky, full_mask.copy(), (800, 150), loops=2, warmup=1)
        assert ms > 0
        assert "compute_ms" in eng.metrics

    def test_planar_pipeline_matches_interleaved(self, airplane, sky, irregular_mask):
        """The serve loop's planar-destination pipeline must produce the
        same image as the interleaved one (single application)."""
        import jax.numpy as jnp

        from seamlesscloneoptimization_tpu.core.engine import prepare_inputs

        eng = SeamlessClone(CloneConfig(solver="dst_gemm"))
        want = np.asarray(eng.run(airplane, sky, irregular_mask.copy(), (700, 300)))
        m, (x0, y0), (left, top), (bh, bw) = prepare_inputs(
            irregular_mask.copy(), airplane.shape, sky.shape, (700, 300))
        fn = eng._compiled(airplane.shape, (3,) + sky.shape[:2], (bh, bw), 1,
                           planar_dst=True)
        out_p = fn(jnp.asarray(airplane), jnp.transpose(jnp.asarray(sky), (2, 0, 1)),
                   jnp.asarray(m), np.array([x0, y0], np.int32),
                   np.array([left, top], np.int32))
        got = np.asarray(jnp.transpose(out_p, (1, 2, 0)))
        assert np.array_equal(got, want)

    def test_timed_serve_returns_valid_frame(self, airplane, sky, full_mask):
        """timed_serve chains planar frames on device; the returned image
        must still be a plausible interleaved blend (untouched outside ROI)."""
        eng = SeamlessClone(CloneConfig(solver="dst_gemm", donate_dst=False))
        out, ms = eng.timed_serve(airplane, sky, full_mask.copy(), (800, 150), loops=1)
        out = np.asarray(out)
        assert ms > 0
        assert out.shape == sky.shape
        assert np.array_equal(out[0], sky[0])  # first row outside the ROI
        # the layout-pin regression telemetry exists and reads clean on a
        # healthy serve (VERDICT r4 weak #4; bench extras surface it)
        assert eng.metrics["heal_fired"] is False
        assert eng.metrics["heal_count"] == 0
        assert eng.metrics["solver_resolved"] == "dst_gemm"

    def test_per_instance_memory_accounting(self, airplane, sky, full_mask):
        """device_memory_bytes is per-engine (ref: SCImage::mOccupy): a second
        engine's traffic must not inflate the first engine's number."""
        a = SeamlessClone()
        jax.block_until_ready(a.run(airplane, sky, full_mask.copy(), (800, 150)))
        bytes_a = a.device_memory_bytes()
        assert bytes_a >= sky.nbytes  # at least its own output image
        b = SeamlessClone()
        jax.block_until_ready(b.run(airplane, sky, full_mask.copy(), (800, 150)))
        assert a.device_memory_bytes() == bytes_a
        assert b.device_memory_bytes() >= sky.nbytes
        b.destroy()
        assert b.device_memory_bytes() == 0


class TestBatch:
    def test_sequential_batch_composites(self, airplane, sky):
        from seamlesscloneoptimization_tpu.api import seamless_clone_batch

        mask = np.full(airplane.shape[:2], 255, np.uint8)
        out = seamless_clone_batch(
            [airplane, airplane],
            sky,
            [mask.copy(), mask.copy()],
            [(300, 150), (1100, 600)],
        )
        # both ROIs changed
        assert not np.array_equal(out[50:250, 150:450], sky[50:250, 150:450])
        assert not np.array_equal(out[500:700, 950:1250], sky[500:700, 950:1250])


class TestValidation:
    def test_wrong_channel_count_raises(self, sky):
        eng = SeamlessClone()
        gray = sky[..., 0]
        with pytest.raises(ValueError, match="must be"):
            eng.run(gray, sky, None, (800, 150))

    def test_wrong_dtype_raises(self, airplane, sky):
        eng = SeamlessClone()
        with pytest.raises(TypeError, match="uint8"):
            eng.run(airplane.astype(np.float32), sky, None, (800, 150))

    def test_dst_smaller_than_src_raises(self, airplane, sky):
        eng = SeamlessClone()
        with pytest.raises(ValueError, match="smaller"):
            eng.run(sky, airplane, None, (100, 100))

    def test_wide_src_into_tall_dst_allowed(self):
        """The reference asserts AREA only (imp.cpp:436); a wide-short src
        whose mask ROI fits inside a tall-narrow dst is valid input."""
        rng = np.random.default_rng(0)
        src = rng.integers(0, 256, (40, 200, 3)).astype(np.uint8)  # wide-short
        dst = rng.integers(0, 256, (400, 100, 3)).astype(np.uint8)  # tall-narrow
        mask = np.zeros(src.shape[:2], np.uint8)
        mask[10:30, 80:120] = 255  # 40x20 ROI, fits in dst
        eng = SeamlessClone()
        out = np.asarray(eng.run(src, dst, mask, (50, 200)))
        assert out.shape == dst.shape
        assert not np.array_equal(out, dst)

    def test_mask_shape_mismatch_raises(self, airplane, sky):
        eng = SeamlessClone()
        bad = np.full((10, 10), 255, np.uint8)
        with pytest.raises(Exception):
            eng.run(airplane, sky, bad, (800, 150))


class TestProfileHook:
    def test_profile_writes_trace(self, tmp_path, airplane, sky, full_mask):
        eng = SeamlessClone()
        with eng.profile(str(tmp_path / "trace")) as d:
            jax.block_until_ready(eng.run(airplane, sky, full_mask.copy(), (800, 150)))
        import os

        found = any(f.endswith((".pb", ".json.gz", ".trace.json.gz"))
                    for _, _, fs in os.walk(d) for f in fs)
        assert found, "no profiler artifacts written"


class TestModes1080p:
    """BASELINE config[2]: MIXED + MONOCHROME guidance modes on 1080p dst."""

    @pytest.fixture(scope="class")
    def hd(self, airplane, sky):
        src = cv2.resize(airplane, (400, 300), interpolation=cv2.INTER_CUBIC)
        dst = cv2.resize(sky, (1920, 1080), interpolation=cv2.INTER_CUBIC)
        mask = np.zeros((300, 400), np.uint8)
        cv2.ellipse(mask, (200, 150), (170, 120), 0, 0, 360, 255, -1)
        return src, dst, mask

    def test_monochrome_1080p_bitclose_vs_cv2(self, hd):
        src, dst, mask = hd
        golden = cv2.seamlessClone(src, dst, mask.copy(), (960, 540), cv2.MONOCHROME_TRANSFER)
        mine = seamless_clone(src, dst, mask.copy(), (960, 540), R.MONOCHROME_TRANSFER)
        s, m = diff_stats(golden, mine)
        assert m <= 1, f"diff max {m}"

    def test_mixed_1080p_bitclose_vs_cv2(self, hd):
        src, dst, mask = hd
        mine = seamless_clone(src, dst, mask.copy(), (960, 540), R.MIXED_CLONE)
        oracle = R.seamless_clone_np(src, dst, mask.copy(), (960, 540), flags=R.MIXED_CLONE)
        s, m = diff_stats(oracle, mine)
        assert m <= 1, f"vs oracle diff max {m}"
        golden = cv2.seamlessClone(src, dst, mask.copy(), (960, 540), cv2.MIXED_CLONE)
        s, m = diff_stats(golden, mine)
        assert m <= 1, f"vs cv2 MIXED diff max {m}"


class TestFuzzVsCv2:
    @pytest.mark.parametrize(
        "seed,flags",
        [(0, 1), (1, 1), (2, 1), (3, 1), (4, 1),  # NORMAL
         (0, 2), (2, 2), (4, 2),                  # MIXED
         (1, 3), (3, 3)],                         # MONOCHROME
    )
    def test_random_masks_and_centers_bitclose(self, airplane, sky, seed, flags):
        """Property test: random blob masks, sizes and paste positions must
        stay within the reference acceptance bar (diff_max <= 1) vs cv2,
        in every clone mode."""
        rng = np.random.default_rng(seed)
        h = int(rng.integers(40, 190))
        w = int(rng.integers(40, 290))
        y0 = int(rng.integers(0, airplane.shape[0] - h))
        x0 = int(rng.integers(0, airplane.shape[1] - w))
        src = np.ascontiguousarray(airplane[y0 : y0 + h, x0 : x0 + w])
        mask = np.zeros((h, w), np.uint8)
        for _ in range(int(rng.integers(1, 4))):
            cx = int(rng.integers(5, w - 5))
            cy = int(rng.integers(5, h - 5))
            r = int(rng.integers(5, max(6, min(h, w) // 2)))
            cv2.circle(mask, (cx, cy), r, 255, -1)
        center = (
            int(rng.integers(w, sky.shape[1] - w)),
            int(rng.integers(h, sky.shape[0] - h)),
        )
        cv2_flag = {1: cv2.NORMAL_CLONE, 2: cv2.MIXED_CLONE,
                    3: cv2.MONOCHROME_TRANSFER}[flags]
        golden = cv2.seamlessClone(src, sky, mask.copy(), center, cv2_flag)
        mine = seamless_clone(src, sky, mask.copy(), center, flags=flags)
        s, m = diff_stats(golden, mine)
        assert m <= 1, f"seed {seed} flags {flags}: diff max {m} (sum {s})"


class TestDeterminism:
    def test_pipeline_bitwise_deterministic(self, airplane, sky, irregular_mask):
        """SURVEY §5.2: XLA programs are race-free; repeated runs must be
        bit-identical (the reference relied on single-stream ordering)."""
        outs = [
            seamless_clone(airplane, sky, irregular_mask.copy(), (700, 300))
            for _ in range(3)
        ]
        assert np.array_equal(outs[0], outs[1])
        assert np.array_equal(outs[1], outs[2])


class TestJacobiEndToEnd:
    def test_jacobi_airplane_sky_vs_cv2(self, airplane, sky, full_mask):
        """BASELINE config[0]: the airplane->sky pair solved with red-black
        Jacobi (CPU-runnable), bit-close to cv2."""
        golden = cv2.seamlessClone(airplane, sky, full_mask.copy(), (800, 150),
                                   cv2.NORMAL_CLONE)
        # plain relaxation needs O(n^2) sweeps: raise the cap beyond the
        # engine default (this is exactly why multigrid exists)
        eng = SeamlessClone(CloneConfig(solver="jacobi", tol=2e-6, max_iters=300000))
        out = np.asarray(eng.run(airplane, sky, full_mask.copy(), (800, 150)))
        s, m = diff_stats(golden, out)
        # plain relaxation: error ~ kappa * residual, so sub-LSB parity costs
        # O(n^2 log) more sweeps — 2 LSB at tol 2e-6 is the documented bar
        # (the direct/multigrid solvers hold diff_max <= 1; that is their job)
        assert m <= 2, f"jacobi diff max {m} (sum {s})"
        assert s < 100000, f"jacobi diff sum {s}"


class TestBboxBucketing:
    def test_varying_masks_one_compile(self, airplane, sky):
        """bbox_bucket: different mask sizes share one compiled program."""
        eng = SeamlessClone(CloneConfig(bbox_bucket=128))
        for hw in [(60, 90), (80, 70), (100, 120)]:
            mask = np.zeros(airplane.shape[:2], np.uint8)
            mask[20 : 20 + hw[0], 30 : 30 + hw[1]] = 255
            out = eng.run(airplane, sky, mask, (800, 400))
        eng.sync()
        assert len(eng._cache) == 1, f"{len(eng._cache)} compiles for 3 mask sizes"
        assert np.asarray(out).shape == sky.shape

    def test_bucketed_output_stays_seamless(self, airplane, sky):
        from seamlesscloneoptimization_tpu.core import reference as R

        mask = np.zeros(airplane.shape[:2], np.uint8)
        cv2.circle(mask, (150, 97), 50, 255, -1)
        eng = SeamlessClone(CloneConfig(bbox_bucket=128))
        out = np.asarray(eng.run(airplane, sky, mask.copy(), (800, 400)))
        tight = R.seamless_clone_np(airplane, sky, mask.copy(), (800, 400))
        db = psnr(out, tight)
        assert db > 40, f"bucketed PSNR {db:.1f} dB vs tight solve"


class TestBucketExact:
    """bucket_exact: the runtime-domain multigrid (solvers/multigrid_dyn.py)
    solves the TIGHT Poisson system inside the bucketed shapes — cv2
    bit-closeness at bucketed compile counts (plain bucketing measures
    diff_max ~31 on this pair; see CloneConfig.bbox_bucket)."""

    def test_exact_bucket_bitclose_to_cv2(self, airplane, sky):
        mask = np.zeros(airplane.shape[:2], np.uint8)
        cv2.circle(mask, (150, 97), 80, 255, -1)
        golden = cv2.seamlessClone(airplane, sky, mask.copy(), (800, 150),
                                   cv2.NORMAL_CLONE)
        eng = SeamlessClone(CloneConfig(bbox_bucket=128, bucket_exact=True,
                                        tol=2e-5))
        out = np.asarray(eng.run(airplane, sky, mask.copy(), (800, 150)))
        s, m = diff_stats(golden, out)
        assert m <= 1, f"bucket_exact diff max {m} (sum {s})"

    def test_varying_masks_one_compile_still_exact(self, airplane, sky):
        eng = SeamlessClone(CloneConfig(bbox_bucket=128, bucket_exact=True,
                                        tol=2e-5))
        for hw, center in [((60, 90), (800, 400)), ((80, 70), (700, 300)),
                           ((100, 120), (900, 500))]:
            mask = np.zeros(airplane.shape[:2], np.uint8)
            mask[20 : 20 + hw[0], 30 : 30 + hw[1]] = 255
            golden = cv2.seamlessClone(airplane, sky, mask.copy(), center,
                                       cv2.NORMAL_CLONE)
            out = np.asarray(eng.run(airplane, sky, mask.copy(), center))
            s, m = diff_stats(golden, out)
            assert m <= 1, f"{hw}: diff max {m} (sum {s})"
        assert len(eng._cache) == 1, f"{len(eng._cache)} compiles for 3 sizes"

    def test_serve_program_carries_tight_bbox(self, airplane, sky):
        """The planar SERVE program must solve the TIGHT system too: one
        frame through _compiled(planar_dst=True) with the tight arg equals
        the non-planar run() bit-for-bit (previously timed_serve dropped
        the tight arg and silently degraded to pad-bucket accuracy)."""
        import jax.numpy as jnp

        mask = np.zeros(airplane.shape[:2], np.uint8)
        cv2.circle(mask, (150, 97), 60, 255, -1)
        eng = SeamlessClone(CloneConfig(bbox_bucket=128, bucket_exact=True,
                                        tol=2e-5))
        center = (800, 150)
        want = np.asarray(eng.run(airplane, sky, mask.copy(), center))
        prep = eng._prepare(mask.copy(), airplane.shape, sky.shape, center)
        m, (x0, y0), (left, top), (bh, bw), tight = eng._unpack_prep(prep)
        assert tight is not None
        fn = eng._compiled(airplane.shape, (3,) + sky.shape[:2], (bh, bw),
                           1, planar_dst=True)
        out_p = fn(jnp.asarray(airplane),
                   jnp.transpose(jnp.asarray(sky), (2, 0, 1)),
                   jnp.asarray(m), np.array([x0, y0], np.int32),
                   np.array([left, top], np.int32),
                   np.array(tight, np.int32))
        got = np.asarray(jnp.transpose(out_p, (1, 2, 0)))
        assert np.array_equal(got, want)

    @pytest.mark.parametrize("flags", [2, 3])
    def test_exact_bucket_other_modes(self, airplane, sky, flags):
        """MIXED/MONOCHROME guidance runs through the same dyn path."""
        mask = np.zeros(airplane.shape[:2], np.uint8)
        cv2.circle(mask, (150, 97), 60, 255, -1)
        cv2_flag = {2: cv2.MIXED_CLONE, 3: cv2.MONOCHROME_TRANSFER}[flags]
        golden = cv2.seamlessClone(airplane, sky, mask.copy(), (800, 150),
                                   cv2_flag)
        eng = SeamlessClone(CloneConfig(bbox_bucket=128, bucket_exact=True,
                                        tol=2e-5, flags=flags))
        out = np.asarray(eng.run(airplane, sky, mask.copy(), (800, 150)))
        s, m = diff_stats(golden, out)
        assert m <= 1, f"flags {flags}: diff max {m} (sum {s})"


class TestEdgeProbes:
    def test_all_zero_mask_returns_dst(self, airplane, sky):
        """Empty mask: nothing to clone; the destination comes back untouched
        (prepare_inputs returns None -> engine passthrough)."""
        z = np.zeros(airplane.shape[:2], np.uint8)
        out = np.asarray(seamless_clone(airplane, sky, z, (800, 150)))
        assert np.array_equal(out, sky)

    def test_paste_flush_with_dst_corner(self, airplane):
        """ROI flush against the destination's top-left corner (a valid cv2
        position): must stay bit-close, no clamping artifacts."""
        rng = np.random.default_rng(3)
        dst = rng.integers(0, 256, (400, 500, 3)).astype(np.uint8)
        src = cv2.resize(airplane, (120, 80), interpolation=cv2.INTER_CUBIC)
        mask = np.full(src.shape[:2], 255, np.uint8)
        # cv2 centers the (eroded) mask bbox at `center`; put the ROI flush
        # at the corner: bbox after 1px border-zero is 118x78 at offset (1,1)
        center = (59, 39)
        golden = cv2.seamlessClone(src, dst, mask.copy(), center, cv2.NORMAL_CLONE)
        mine = seamless_clone(src, dst, mask.copy(), center)
        s, m = diff_stats(golden, mine)
        assert m <= 1, f"corner paste diff max {m} (sum {s})"


class TestLocalEdits:
    """cv2 photo-module family (colorChange/illuminationChange/
    textureFlattening): the reference has NORMAL_CLONE only; these reuse the
    Poisson machinery with modified guidance. Rules pinned vs cv2 5.0."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_color_change_bitclose_vs_cv2(self, seed):
        from seamlesscloneoptimization_tpu.api import color_change

        rng = np.random.default_rng(seed)
        h, w = int(rng.integers(24, 80)), int(rng.integers(24, 80))
        src = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        mask = np.zeros((h, w), np.uint8)
        cv2.circle(mask, (w // 2, h // 2), min(h, w) // 3, 255, -1)
        want = cv2.colorChange(src, mask.copy(), red_mul=1.7, green_mul=0.6,
                               blue_mul=1.2)
        got = color_change(src, mask, red_mul=1.7, green_mul=0.6, blue_mul=1.2)
        d = np.abs(want.astype(int) - got.astype(int)).max()
        assert d <= 1, d

    @pytest.mark.parametrize("seed", [0, 3])
    def test_illumination_change_bitclose_vs_cv2(self, seed):
        from seamlesscloneoptimization_tpu.api import illumination_change

        rng = np.random.default_rng(seed)
        src = rng.integers(0, 256, (50, 60, 3)).astype(np.uint8)
        mask = np.zeros((50, 60), np.uint8)
        cv2.ellipse(mask, (30, 25), (20, 14), 0, 0, 360, 255, -1)
        want = cv2.illuminationChange(src, mask.copy(), alpha=0.25, beta=0.35)
        got = illumination_change(src, mask, alpha=0.25, beta=0.35)
        d = np.abs(want.astype(int) - got.astype(int)).max()
        assert d <= 1, d

    def test_texture_flattening_bitclose_vs_cv2(self, airplane):
        from seamlesscloneoptimization_tpu.api import texture_flattening

        src = cv2.resize(airplane, (96, 64), interpolation=cv2.INTER_CUBIC)
        mask = np.zeros((64, 96), np.uint8)
        mask[10:54, 14:82] = 255
        want = cv2.textureFlattening(src, mask.copy(), low_threshold=30,
                                     high_threshold=45, kernel_size=3)
        got = texture_flattening(src, mask, 30, 45, 3)
        d = np.abs(want.astype(int) - got.astype(int)).max()
        assert d <= 1, d

    def test_big_image_edit_routes_to_multigrid(self):
        """Past the 7 MP crossover the full-image edit solve runs the
        multigrid path (round 5 — the direct eigenbasis is slower, worse
        conditioned and HBM-hungry there); forced here via the static
        crossover arg at CPU-test size, still bit-close to cv2."""
        import jax.numpy as jnp

        from seamlesscloneoptimization_tpu.api import _local_edit  # noqa
        from seamlesscloneoptimization_tpu.ops.edit import (
            COLOR_CHANGE,
            erode3x3_replicate,
            local_edit_planar,
        )

        rng = np.random.default_rng(9)
        src = rng.integers(0, 256, (90, 110, 3)).astype(np.uint8)
        mask = np.zeros((90, 110), np.uint8)
        cv2.circle(mask, (55, 45), 30, 255, -1)
        want = cv2.colorChange(src, mask.copy(), red_mul=1.4, green_mul=0.8,
                               blue_mul=1.1)
        me = erode3x3_replicate(jnp.asarray((mask != 0).astype(np.float32)))
        got = local_edit_planar(
            jnp.asarray(np.transpose(src, (2, 0, 1))), me,
            jnp.asarray([1.1, 0.8, 1.4], jnp.float32), kind=COLOR_CHANGE,
            crossover=1_000)  # force the multigrid branch
        got = np.transpose(np.asarray(got), (1, 2, 0))
        d = np.abs(want.astype(int) - got.astype(int)).max()
        assert d <= 1, d

    def test_oracle_matches_cv2(self):
        """NumPy oracle (core/reference.local_edit_np) vs cv2, all kinds."""
        rng = np.random.default_rng(7)
        src = rng.integers(0, 256, (40, 44, 3)).astype(np.uint8)
        mask = np.zeros((40, 44), np.uint8)
        cv2.circle(mask, (22, 20), 12, 255, -1)
        cc = cv2.colorChange(src, mask.copy(), red_mul=0.5, green_mul=1.4,
                             blue_mul=1.0)
        my = R.local_edit_np(src, mask, R.COLOR_CHANGE, red_mul=0.5,
                             green_mul=1.4, blue_mul=1.0)
        assert np.abs(cc.astype(int) - my.astype(int)).max() <= 1
        ic = cv2.illuminationChange(src, mask.copy(), alpha=0.2, beta=0.4)
        my2 = R.local_edit_np(src, mask, R.ILLUMINATION_CHANGE, alpha=0.2,
                              beta=0.4)
        assert np.abs(ic.astype(int) - my2.astype(int)).max() <= 1

    def test_param_sweep_no_recompile(self):
        """Edit parameters are traced: sweeping them reuses one program."""
        import jax

        from seamlesscloneoptimization_tpu.api import color_change

        rng = np.random.default_rng(0)
        src = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
        mask = np.full((40, 40), 255, np.uint8)
        color_change(src, mask, 1.1, 1.0, 1.0)  # warm
        with jax.log_compiles():
            import logging

            rec = []
            h = logging.Handler()
            h.emit = lambda r: rec.append(r.getMessage())
            logging.getLogger("jax._src.interpreters.pxla").addHandler(h)
            for f in (0.5, 0.9, 1.7):
                color_change(src, mask, f, 1.0, 1.0)
            logging.getLogger("jax._src.interpreters.pxla").removeHandler(h)
        assert not [m for m in rec if "local_edit_planar" in m], rec
