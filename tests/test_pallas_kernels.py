"""Pallas kernel tests (interpret mode on CPU) vs the XLA/oracle stages."""

import jax.numpy as jnp
import numpy as np
import pytest

from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
    preprocess_rhs_pallas,
    rb_sweeps_pallas,
)
from seamlesscloneoptimization_tpu.solvers.jacobi import redblack_sweep


def _rand(shape, seed=0, scale=50.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)


class TestRBSweepsPallas:
    @pytest.mark.parametrize("hw", [(16, 128), (30, 61), (100, 200)])
    def test_matches_xla_sweeps(self, hw):
        h, w = hw
        g = _rand((3, h, w), seed=1)
        u0 = _rand((3, h, w), seed=2, scale=10.0)
        u_pl = rb_sweeps_pallas(u0, g, n_sweeps=4, interpret=True)
        u_x = u0
        for _ in range(4):
            u_x = redblack_sweep(u_x, g)
        np.testing.assert_allclose(np.asarray(u_pl), np.asarray(u_x), atol=1e-3, rtol=1e-5)


class TestPreprocessPallas:
    @pytest.mark.parametrize("flags", [1, 2])
    def test_matches_oracle_rhs(self, airplane, sky, irregular_mask, flags):
        from seamlesscloneoptimization_tpu.core import reference as R

        _, st = R.seamless_clone_np(
            airplane, sky, irregular_mask.copy(), (700, 300), flags=flags, return_stages=True
        )
        left, top = st["left_top"]
        _, _, bw, bh = st["bbox"]
        dest_roi = np.transpose(sky[top : top + bh, left : left + bw], (2, 0, 1)).astype(np.float32)
        patch = np.transpose(st["patch"], (2, 0, 1)).astype(np.float32)
        g = preprocess_rhs_pallas(
            jnp.asarray(dest_roi),
            jnp.asarray(patch),
            jnp.asarray(st["mask_roi"]),
            flags=flags,
            interpret=True,
        )
        want = np.transpose(st["rhs"], (2, 0, 1))
        np.testing.assert_allclose(np.asarray(g), want, atol=1e-3)
        # u8 inputs (the serve path: cast happens in VMEM) must bit-match f32
        g8 = preprocess_rhs_pallas(
            jnp.asarray(dest_roi.astype(np.uint8)),
            jnp.asarray(patch.astype(np.uint8)),
            jnp.asarray(st["mask_roi"]),
            flags=flags,
            interpret=True,
        )
        assert np.array_equal(np.asarray(g8), np.asarray(g))


class TestPreprocessPaddedPallas:
    """preprocess_rhs_padded_pallas: the mg serve path's pre-padded RHS
    (natural-orientation twin of the transposed kernel)."""

    @pytest.mark.parametrize("flags", [1, 2])
    @pytest.mark.parametrize("hw", [(260, 300), (257, 385),
                                    # width classes at the lane boundary:
                                    # w-2 mod 128 in {1, 127, 126} and the
                                    # odd/even height split
                                    (513, 515), (512, 641), (385, 257)])
    def test_matches_natural_kernel_and_pads_zero(self, hw, flags):
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
            preprocess_rhs_padded_pallas,
        )
        from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import (
            mg_geometry_q,
        )

        h, w = hw
        rng = np.random.default_rng(0)
        dest = jnp.asarray(rng.integers(0, 256, (3, h, w)).astype(np.uint8))
        patch = jnp.asarray(rng.integers(0, 256, (3, h, w)).astype(np.uint8))
        mask = jnp.asarray((rng.random((h, w)) > 0.3).astype(np.uint8) * 255)
        patch = jnp.where(mask[None] != 0, patch, jnp.uint8(0))
        g = preprocess_rhs_pallas(dest, patch, mask, flags, interpret=True)
        h2, w2 = h - 2, w - 2
        _, hq, wq2, _ = mg_geometry_q(h2, w2)
        gp = preprocess_rhs_padded_pallas(
            dest, patch, mask, (2 * hq, 2 * wq2), flags, interpret=True)
        assert gp.shape == (3, 2 * hq, 2 * wq2)
        # interior bit-equal to the generic kernel, exact zeros outside
        assert np.array_equal(np.asarray(gp[:, :h2, :w2]), np.asarray(g))
        assert not np.asarray(gp[:, h2:, :]).any()
        assert not np.asarray(gp[:, :, w2:]).any()

    @pytest.mark.parametrize("flags", [1, 2])
    @pytest.mark.parametrize("hw", [(260, 300), (513, 515)])
    def test_quarters_kernel_matches_padded(self, hw, flags):
        """preprocess_rhs_quarters_pallas == to_quarters(padded kernel)."""
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
            preprocess_rhs_padded_pallas,
            preprocess_rhs_quarters_pallas,
        )
        from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import (
            mg_geometry_q,
            to_quarters,
        )

        h, w = hw
        rng = np.random.default_rng(7)
        dest = jnp.asarray(rng.integers(0, 256, (3, h, w)).astype(np.uint8))
        patch = jnp.asarray(rng.integers(0, 256, (3, h, w)).astype(np.uint8))
        mask = jnp.asarray((rng.random((h, w)) > 0.3).astype(np.uint8) * 255)
        patch = jnp.where(mask[None] != 0, patch, jnp.uint8(0))
        _, hq, wq2, _ = mg_geometry_q(h - 2, w - 2)
        want = to_quarters(preprocess_rhs_padded_pallas(
            dest, patch, mask, (2 * hq, 2 * wq2), flags, interpret=True))
        got = preprocess_rhs_quarters_pallas(
            dest, patch, mask, (2 * hq, 2 * wq2), flags, interpret=True)
        assert got.shape == (3, 4, hq, wq2)
        assert np.array_equal(np.asarray(got), np.asarray(want))

    def test_f32_patch_monochrome_style(self):
        """MONOCHROME pre-grays the patch to non-integer f32 on the caller
        side; the kernel must accept mixed u8/f32 inputs (flags=1 there)."""
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
            preprocess_rhs_padded_pallas,
        )
        from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import (
            mg_geometry_q,
        )

        h, w = 260, 300
        rng = np.random.default_rng(3)
        dest = jnp.asarray(rng.integers(0, 256, (3, h, w)).astype(np.uint8))
        patch = jnp.asarray(
            rng.uniform(0, 255, (3, h, w)).astype(np.float32))
        mask = jnp.asarray(np.full((h, w), 255, np.uint8))
        g = preprocess_rhs_pallas(dest, patch, mask, 1, interpret=True)
        _, hq, wq2, _ = mg_geometry_q(h - 2, w - 2)
        gp = preprocess_rhs_padded_pallas(
            dest, patch, mask, (2 * hq, 2 * wq2), 1, interpret=True)
        assert np.array_equal(
            np.asarray(gp[:, : h - 2, : w - 2]), np.asarray(g))


class TestPipelinePallasPre:
    def test_clone_roi_pallas_pre_matches_xla(self, airplane, sky, irregular_mask):
        """use_pallas_pre routes through the strip kernel; output must match
        the XLA path bit-for-bit (interpret mode on CPU)."""
        from unittest import mock

        import jax.numpy as jnp

        from seamlesscloneoptimization_tpu.core import reference as R
        from seamlesscloneoptimization_tpu.models import pipeline as P
        from seamlesscloneoptimization_tpu.ops import pallas_kernels as PK
        from seamlesscloneoptimization_tpu.solvers import solve_dst_gemm

        _, st = R.seamless_clone_np(
            airplane, sky, irregular_mask.copy(), (700, 300), return_stages=True
        )
        left, top = st["left_top"]
        _, _, bw, bh = st["bbox"]
        dest = jnp.asarray(
            np.transpose(sky[top : top + bh, left : left + bw], (2, 0, 1))
        ).astype(jnp.uint8)
        patch = jnp.asarray(np.transpose(st["patch"], (2, 0, 1))).astype(jnp.uint8)
        mask = jnp.asarray(st["mask_roi"])

        ref = P.clone_roi(dest, patch, mask, 1, solve_dst_gemm)
        orig = PK.preprocess_rhs_pallas
        calls = []

        def interp(*a, **k):
            calls.append(1)
            return orig(*a, **{**k, "interpret": True})

        with mock.patch.object(PK, "preprocess_rhs_pallas", interp), \
                mock.patch.object(P, "_pallas_backend_available", lambda: True):
            got = P.clone_roi(dest, patch, mask, 1, solve_dst_gemm, use_pallas_pre=True)
        assert calls, "the Pallas preprocess path was never exercised"
        assert np.array_equal(np.asarray(ref), np.asarray(got))


class TestPostprocessTransposedPallas:
    def test_matches_xla_postprocess(self):
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
            postprocess_transposed_pallas,
        )
        from seamlesscloneoptimization_tpu.ops.postprocess import postprocess_roi

        rng = np.random.default_rng(3)
        bh, bw = 150, 260
        dest = jnp.asarray(rng.integers(0, 256, (3, bh, bw)).astype(np.uint8))
        u = jnp.asarray(rng.normal(size=(3, bh - 2, bw - 2)).astype(np.float32) * 120 + 100)
        ref = postprocess_roi(u, dest)
        got = postprocess_transposed_pallas(jnp.swapaxes(u, 1, 2), dest, interpret=True)
        assert np.array_equal(np.asarray(ref), np.asarray(got))

    @pytest.mark.parametrize("bw", [90, 126, 127, 128, 256])
    def test_all_width_classes(self, bw):
        """bw % 128 in {0, 123..127} used to crash with a negative pad
        (VERDICT r1 weak #1); every class must match the XLA postprocess."""
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
            postprocess_transposed_pallas,
        )
        from seamlesscloneoptimization_tpu.ops.postprocess import postprocess_roi

        rng = np.random.default_rng(bw)
        bh = 64
        dest = jnp.asarray(rng.integers(0, 256, (3, bh, bw)).astype(np.uint8))
        u = jnp.asarray(rng.normal(size=(3, bh - 2, bw - 2)).astype(np.float32) * 120 + 100)
        ref = postprocess_roi(u, dest)
        got = postprocess_transposed_pallas(jnp.swapaxes(u, 1, 2), dest, interpret=True)
        assert np.array_equal(np.asarray(ref), np.asarray(got))

    def test_engine_bucket128_pallas_post(self, airplane, sky, irregular_mask):
        """bbox_bucket=128 makes every ROI width a multiple of 128 — exactly
        the class that crashed. Engine-level run through the bucketed +
        use_pallas_postprocess config must succeed and stay plausible."""
        from unittest import mock

        from seamlesscloneoptimization_tpu.core.config import CloneConfig
        from seamlesscloneoptimization_tpu.core.engine import SeamlessClone
        from seamlesscloneoptimization_tpu.models import pipeline as P
        from seamlesscloneoptimization_tpu.ops import pallas_kernels as PK

        orig = PK.postprocess_transposed_pallas
        calls = []

        def interp(*a, **k):
            calls.append(1)
            return orig(*a, **{**k, "interpret": True})

        # preprocess explicitly OFF: this test exercises the post-only
        # (transposed-output) branch, and only patches the post kernel
        eng = SeamlessClone(CloneConfig(bbox_bucket=128,
                                        use_pallas_preprocess=False,
                                        use_pallas_postprocess=True))
        with mock.patch.object(PK, "postprocess_transposed_pallas", interp), \
                mock.patch.object(P, "_pallas_backend_available", lambda: True):
            out = np.asarray(eng.run(airplane, sky, irregular_mask.copy(), (700, 300)))
        assert calls, "the Pallas postprocess path was never exercised"
        x0, y0, bw, bh = eng.metrics["bbox"]
        assert bw % 128 == 0, "bucketing did not produce a width in the crash class"
        # un-bucketed engine as the yardstick (bucketing shifts the Dirichlet
        # frame, so compare against the same bucketed config's XLA path)
        eng2 = SeamlessClone(CloneConfig(bbox_bucket=128))
        want = np.asarray(eng2.run(airplane, sky, irregular_mask.copy(), (700, 300)))
        # the transposed GEMM chain accumulates in a different order, so
        # truncation can flip +-1 LSB — the acceptance tolerance of vs.py
        diff = np.abs(out.astype(np.int16) - want.astype(np.int16))
        assert diff.max() <= 1, diff.max()

    def test_transposed_solver_chain_matches(self):
        from seamlesscloneoptimization_tpu.solvers import solve_dst_gemm

        rng = np.random.default_rng(4)
        g = jnp.asarray(rng.normal(size=(3, 60, 90)).astype(np.float32) * 50)
        u1 = solve_dst_gemm(g)
        u2 = jnp.swapaxes(solve_dst_gemm(g, transposed_output=True), 1, 2)
        scale = float(jnp.abs(u1).max())
        assert float(jnp.abs(u1 - u2).max()) / scale < 1e-5


class TestServeChainPallas:
    """The full-Pallas serve chain: transposed preprocess -> Pallas-transpose
    GEMM solve -> dest-free clamp-cast -> inset paste."""

    def test_erode3_pallas(self):
        from seamlesscloneoptimization_tpu.ops.mask import binarize_mask, erode3x3
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import erode3_pallas

        rng = np.random.default_rng(5)
        m = (rng.random((90, 170)) < 0.85).astype(np.uint8) * 255
        want = (np.asarray(erode3x3(binarize_mask(jnp.asarray(m)))) != 0).astype(np.uint8)
        got = np.asarray(erode3_pallas(jnp.asarray((m != 0).astype(np.uint8)),
                                       interpret=True))
        assert np.array_equal(got, want)

    @pytest.mark.parametrize("ab", [(60, 90), (128, 256), (130, 61)])
    def test_transpose_pallas(self, ab):
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import transpose_pallas
        from seamlesscloneoptimization_tpu.solvers.dst_gemm import dst_eigenvalues

        a, b = ab
        rng = np.random.default_rng(a)
        x = jnp.asarray(rng.normal(size=(3, a, b)).astype(np.float32) * 40)
        got = transpose_pallas(x, interpret=True)
        assert np.array_equal(np.asarray(got), np.asarray(jnp.swapaxes(x, 1, 2)))
        # fused spectral divide: out[c, b, a] = x[c, a, b] / (lam_a[a]+lam_b[b])
        la, lb = dst_eigenvalues(a), dst_eigenvalues(b)
        got_d = transpose_pallas(x, lam_a=la, lam_b=lb, interpret=True)
        want = np.asarray(jnp.swapaxes(x, 1, 2)) / (
            np.asarray(lb)[None, :, None] + np.asarray(la)[None, None, :])
        np.testing.assert_allclose(np.asarray(got_d), want, rtol=1e-6)

    def test_solve_dst_gemm_pl_matches_xla_chain(self):
        from seamlesscloneoptimization_tpu.solvers.dst_gemm import (
            solve_dst_gemm,
            solve_dst_gemm_pl,
        )

        rng = np.random.default_rng(6)
        h2, w2 = 61, 93
        g = jnp.asarray(rng.normal(size=(3, h2, w2)).astype(np.float32) * 50)
        want = np.asarray(solve_dst_gemm(g))
        # padded-space contract: transposed RHS at the origin of a 128-slab
        g_tp = jnp.zeros((3, 128, 128), jnp.float32)
        g_tp = g_tp.at[:, :w2, :h2].set(jnp.swapaxes(g, 1, 2))
        u_p = np.asarray(solve_dst_gemm_pl(g_tp, h2=h2, w2=w2, interpret=True))
        scale = np.abs(want).max()
        assert np.abs(u_p[:, :h2, :w2] - want).max() / scale < 1e-5
        # the padding must come out (near-)zero so downstream slicing is safe
        pad_mask = np.ones(u_p.shape, bool)
        pad_mask[:, :h2, :w2] = False
        assert np.abs(u_p[pad_mask]).max() < 1e-4 * scale

    @pytest.mark.parametrize("off", [(55, 201), (128, 256), (1, 1), (7, 127)])
    def test_paste_interior_pallas(self, off):
        """Pallas tile-local paste == dynamic_update_slice of the interior."""
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
            clamp_cast_guarded_pallas,
            paste_interior_pallas,
        )

        top1, left1 = off
        h2, w2 = 130, 260
        rng = np.random.default_rng(top1)
        dst = rng.integers(0, 256, (3, 300, 520)).astype(np.uint8)
        u = rng.normal(size=(3, h2, w2)).astype(np.float32) * 160 + 90
        up = jnp.asarray(np.pad(u, ((0, 0), (0, 128 * ((h2 + 127) // 128) - h2),
                                    (0, 128 * ((w2 + 127) // 128) - w2))))
        ig = clamp_cast_guarded_pallas(up, interpret=True)
        got = np.asarray(paste_interior_pallas(
            jnp.asarray(dst), ig, jnp.int32(top1), jnp.int32(left1),
            h2, w2, interpret=True))
        want = dst.copy()
        want[:, top1 : top1 + h2, left1 : left1 + w2] = (
            np.clip(u, 0, 255).astype(np.int32).astype(np.uint8))
        assert np.array_equal(got, want)

    def test_clamp_cast_pallas(self):
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import clamp_cast_pallas

        rng = np.random.default_rng(7)
        u = jnp.asarray(rng.normal(size=(3, 70, 140)).astype(np.float32) * 160 + 90)
        want = np.clip(np.asarray(u), 0.0, 255.0).astype(np.int32).astype(np.uint8)
        got = np.asarray(clamp_cast_pallas(u, interpret=True))
        assert np.array_equal(got, want)

    def test_preprocess_transposed_matches_oracle(self, airplane, sky, irregular_mask):
        from seamlesscloneoptimization_tpu.core import reference as R
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
            preprocess_rhs_transposed_pallas,
        )

        for flags in (1, 2):
            _, st = R.seamless_clone_np(
                airplane, sky, irregular_mask.copy(), (700, 300), flags=flags,
                return_stages=True,
            )
            left, top = st["left_top"]
            _, _, bw, bh = st["bbox"]
            dest = jnp.asarray(np.transpose(
                sky[top : top + bh, left : left + bw], (2, 0, 1)).astype(np.uint8))
            patch = jnp.asarray(np.transpose(st["patch"], (2, 0, 1)).astype(np.uint8))
            g_tp = np.asarray(preprocess_rhs_transposed_pallas(
                dest, patch, jnp.asarray(st["mask_roi"]), flags=flags, interpret=True))
            want = np.transpose(st["rhs"], (2, 1, 0))  # (C, W-2, H-2)
            w2, h2 = want.shape[1], want.shape[2]
            np.testing.assert_allclose(g_tp[:, :w2, :h2], want, atol=1e-3)
            # padding must be EXACTLY zero (the padded-GEMM chain needs it)
            pad_mask = np.ones(g_tp.shape, bool)
            pad_mask[:, :w2, :h2] = False
            assert not g_tp[pad_mask].any()

    def _interp_mocks(self):
        """Patch every kernel of the serve chain to interpret mode."""
        from unittest import mock

        from seamlesscloneoptimization_tpu.ops import pallas_kernels as PK

        def force_interp(orig):
            return lambda *a, **k: orig(*a, **{**k, "interpret": True})

        patches = []
        for name in ("preprocess_rhs_transposed_pallas", "erode3_pallas",
                     "transpose_pallas", "clamp_cast_pallas",
                     "clamp_cast_guarded_pallas", "paste_interior_pallas",
                     "fold_minor_pallas", "unfold_minor_pallas",
                     "transpose_pair_pallas", "unfold_transpose_pallas",
                     "unfold_clamp_guarded_pallas"):
            patches.append(mock.patch.object(PK, name, force_interp(getattr(PK, name))))
        return patches

    def test_clone_roi_full_pallas_matches_xla(self, airplane, sky, irregular_mask):
        """clone_roi's standalone (non-inset) full-Pallas contract: the whole
        ROI, within 1 LSB of the XLA path (GEMM accumulation order differs)."""
        import contextlib
        from unittest import mock

        from seamlesscloneoptimization_tpu.core import reference as R
        from seamlesscloneoptimization_tpu.models import pipeline as P
        from seamlesscloneoptimization_tpu.solvers import solve_dst_gemm

        _, st = R.seamless_clone_np(
            airplane, sky, irregular_mask.copy(), (700, 300), return_stages=True)
        left, top = st["left_top"]
        _, _, bw, bh = st["bbox"]
        dest = jnp.asarray(np.transpose(
            sky[top : top + bh, left : left + bw], (2, 0, 1)).astype(np.uint8))
        patch = jnp.asarray(np.transpose(st["patch"], (2, 0, 1)).astype(np.uint8))
        mask = jnp.asarray(st["mask_roi"])

        ref = np.asarray(P.clone_roi(dest, patch, mask, 1, solve_dst_gemm))
        with contextlib.ExitStack() as es:
            for p in self._interp_mocks():
                es.enter_context(p)
            es.enter_context(mock.patch.object(
                P, "_pallas_backend_available", lambda: True))
            got = np.asarray(P.clone_roi(
                dest, patch, mask, 1, solve_dst_gemm,
                use_pallas_pre=True, use_pallas_post=True))
        assert got.shape == ref.shape
        # border ring must be EXACTLY dest (the inset-paste invariant)
        assert np.array_equal(got[:, 0, :], np.asarray(dest)[:, 0, :])
        assert np.array_equal(got[:, -1, :], np.asarray(dest)[:, -1, :])
        assert np.array_equal(got[:, :, 0], np.asarray(dest)[:, :, 0])
        assert np.array_equal(got[:, :, -1], np.asarray(dest)[:, :, -1])
        diff = np.abs(got.astype(np.int16) - ref.astype(np.int16))
        assert diff.max() <= 1, diff.max()

    def test_engine_full_pallas_serve_matches(self, airplane, sky, irregular_mask):
        """Engine-level: both pallas flags + inset paste, vs the plain engine
        (1 LSB tolerance) — validates the (top+1, left+1) paste offsets."""
        import contextlib
        from unittest import mock

        from seamlesscloneoptimization_tpu.core.config import CloneConfig
        from seamlesscloneoptimization_tpu.core.engine import SeamlessClone
        from seamlesscloneoptimization_tpu.models import pipeline as P

        eng = SeamlessClone(CloneConfig(
            use_pallas_preprocess=True, use_pallas_postprocess=True))
        with contextlib.ExitStack() as es:
            for p in self._interp_mocks():
                es.enter_context(p)
            es.enter_context(mock.patch.object(
                P, "_pallas_backend_available", lambda: True))
            out = np.asarray(eng.run(airplane, sky, irregular_mask.copy(), (700, 300)))
        want = np.asarray(SeamlessClone(CloneConfig()).run(
            airplane, sky, irregular_mask.copy(), (700, 300)))
        diff = np.abs(out.astype(np.int16) - want.astype(np.int16))
        assert diff.max() <= 1, diff.max()
        # everything outside the ROI interior is untouched destination
        assert np.array_equal(out[0, :, :], sky[0, :, :])

    def test_engine_full_pallas_folded_dst_matches(self, airplane, sky, irregular_mask):
        """dst_folded (even/odd-folded DST GEMMs) through the engine fast
        path == the plain engine within 1 LSB."""
        import contextlib
        from unittest import mock

        from seamlesscloneoptimization_tpu.core.config import CloneConfig
        from seamlesscloneoptimization_tpu.core.engine import SeamlessClone
        from seamlesscloneoptimization_tpu.models import pipeline as P

        eng = SeamlessClone(CloneConfig(
            use_pallas_preprocess=True, use_pallas_postprocess=True,
            dst_folded=True))
        with contextlib.ExitStack() as es:
            for p in self._interp_mocks():
                es.enter_context(p)
            es.enter_context(mock.patch.object(
                P, "_pallas_backend_available", lambda: True))
            out = np.asarray(eng.run(airplane, sky, irregular_mask.copy(), (700, 300)))
        want = np.asarray(SeamlessClone(CloneConfig()).run(
            airplane, sky, irregular_mask.copy(), (700, 300)))
        diff = np.abs(out.astype(np.int16) - want.astype(np.int16))
        assert diff.max() <= 1, diff.max()
        assert np.array_equal(out[0, :, :], sky[0, :, :])

    @pytest.mark.parametrize("folded", [False, True])
    def test_planar_full_pallas_serve_matches(self, airplane, sky, irregular_mask,
                                              folded):
        """The planar serve step (full-Pallas chain + tile-local Pallas
        paste) must match the plain engine within 1 LSB — with and without
        the folded-DST pair chain (the folded variant exercises the fused
        unfold+guarded-clamp kernel)."""
        import contextlib
        from unittest import mock

        import jax.numpy as jnp

        from seamlesscloneoptimization_tpu.core.config import CloneConfig
        from seamlesscloneoptimization_tpu.core.engine import SeamlessClone, prepare_inputs
        from seamlesscloneoptimization_tpu.models import pipeline as P

        eng = SeamlessClone(CloneConfig(
            use_pallas_preprocess=True, use_pallas_postprocess=True,
            dst_folded=folded))
        m, (x0, y0), (left, top), (bh, bw) = prepare_inputs(
            irregular_mask.copy(), airplane.shape, sky.shape, (700, 300))
        with contextlib.ExitStack() as es:
            for p in self._interp_mocks():
                es.enter_context(p)
            es.enter_context(mock.patch.object(
                P, "_pallas_backend_available", lambda: True))
            fn = eng._compiled(airplane.shape, (3,) + sky.shape[:2], (bh, bw), 1,
                               planar_dst=True)
            out_p = fn(jnp.asarray(airplane),
                       jnp.transpose(jnp.asarray(sky), (2, 0, 1)),
                       jnp.asarray(m), np.array([x0, y0], np.int32),
                       np.array([left, top], np.int32))
            got = np.asarray(jnp.transpose(out_p, (1, 2, 0)))
        want = np.asarray(SeamlessClone(CloneConfig()).run(
            airplane, sky, irregular_mask.copy(), (700, 300)))
        diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
        assert diff.max() <= 1, diff.max()
        assert np.array_equal(got[0, :, :], sky[0, :, :])


class TestFusedMultigridKernels:
    """mg_down/mg_up vs their XLA compositions, and blocked-ghost vs
    pl.Element window forms (must be bitwise identical — same arithmetic,
    different DMA structure)."""

    CASES = [
        ((64, 130), (1.0, 1.0)),
        ((63, 127), (1.5, 1.25)),   # odd sizes, beta-level operator
        ((70, 200), (1.0, 2.0)),    # even h, beta on w
        ((129, 257), (2.0, 1.0)),   # multi-strip at th=16/32
        ((64, 128), (1.0, 1.0)),    # w == wp: _lane_neighbors pad fallback
        ((40, 256), (1.0, 1.5)),    # w == wp with beta on w
    ]

    @staticmethod
    def _xla_down(u, g, nu1, bh, bw):
        from seamlesscloneoptimization_tpu.solvers.jacobi import (
            redblack_sweep,
            residual,
        )
        from seamlesscloneoptimization_tpu.solvers.multigrid import (
            _residual_b,
            _restrict_rows,
            _sweeps_b,
        )

        if bh == 1.0 and bw == 1.0:
            for _ in range(nu1):
                u = redblack_sweep(u, g)
            r = residual(u, g)
        else:
            u = _sweeps_b(u, g, nu1, bh, bw)
            r = _residual_b(u, g, bh, bw)
        return u, _restrict_rows(r, bh)

    @staticmethod
    def _xla_up(u, g, e_lane, nu2, bh, bw):
        from seamlesscloneoptimization_tpu.solvers.jacobi import redblack_sweep
        from seamlesscloneoptimization_tpu.solvers.multigrid import (
            _prolong_rows,
            _sweeps_b,
        )

        u = u + _prolong_rows(e_lane, u.shape[1], bh)
        if bh == 1.0 and bw == 1.0:
            for _ in range(nu2):
                u = redblack_sweep(u, g)
            return u
        return _sweeps_b(u, g, nu2, bh, bw)

    @pytest.mark.parametrize("hw,beta", CASES)
    def test_mg_down_matches_xla(self, hw, beta):
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import mg_down_pallas

        h, w = hw
        bh, bw = beta
        g = _rand((3, h, w), seed=3)
        u0 = _rand((3, h, w), seed=4, scale=10.0)
        u_pl, rh_pl = mg_down_pallas(u0, g, 1, bh=bh, bw=bw, interpret=True,
                                     th=32)
        u_x, rh_x = self._xla_down(u0, g, 1, bh, bw)
        np.testing.assert_allclose(np.asarray(u_pl), np.asarray(u_x),
                                   atol=1e-3, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(rh_pl), np.asarray(rh_x),
                                   atol=1e-3, rtol=1e-5)

    @pytest.mark.parametrize("hw,beta", CASES)
    def test_mg_up_matches_xla(self, hw, beta):
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import mg_up_pallas

        h, w = hw
        bh, bw = beta
        hc = (h - 1) // 2
        g = _rand((3, h, w), seed=5)
        u0 = _rand((3, h, w), seed=6, scale=10.0)
        e = _rand((3, hc, w), seed=7, scale=5.0)
        u_pl = mg_up_pallas(u0, g, e, 2, bh=bh, bw=bw, interpret=True, th=32)
        u_x = self._xla_up(u0, g, e, 2, bh, bw)
        np.testing.assert_allclose(np.asarray(u_pl), np.asarray(u_x),
                                   atol=1e-3, rtol=1e-5)

    @pytest.mark.parametrize("hw,beta", CASES)
    @pytest.mark.parametrize("th", [16, 32])
    def test_blocked_equals_element(self, hw, beta, th):
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
            mg_down_pallas,
            mg_up_pallas,
            rb_sweeps_pallas,
        )

        h, w = hw
        bh, bw = beta
        hc = (h - 1) // 2
        g = _rand((3, h, w), seed=8)
        u0 = _rand((3, h, w), seed=9, scale=10.0)
        e = _rand((3, hc, w), seed=10, scale=5.0)

        ue, rhe = mg_down_pallas(u0, g, 1, bh=bh, bw=bw, interpret=True,
                                 th=th, blocked=False)
        ub, rhb = mg_down_pallas(u0, g, 1, bh=bh, bw=bw, interpret=True,
                                 th=th, blocked=True)
        assert np.array_equal(np.asarray(ue), np.asarray(ub))
        assert np.array_equal(np.asarray(rhe), np.asarray(rhb))

        upe = mg_up_pallas(u0, g, e, 2, bh=bh, bw=bw, interpret=True, th=th,
                           blocked=False)
        upb = mg_up_pallas(u0, g, e, 2, bh=bh, bw=bw, interpret=True, th=th,
                           blocked=True)
        assert np.array_equal(np.asarray(upe), np.asarray(upb))

        se = rb_sweeps_pallas(u0, g, 4, interpret=True, th=th, blocked=False)
        sb = rb_sweeps_pallas(u0, g, 4, interpret=True, th=th, blocked=True)
        assert np.array_equal(np.asarray(se), np.asarray(sb))

    @pytest.mark.parametrize("hw,beta", CASES)
    @pytest.mark.parametrize("th", [None, 32])
    def test_padded_io_equals_cropped(self, hw, beta, th):
        """padded_io launches == plain blocked launches + explicit pad/crop
        (bitwise: identical kernels, the pads just move to the caller).
        th=32 makes the larger CASES multi-strip, exercising the cross-strip
        ghost blocks in rounded space."""
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
            mg_down_pallas,
            mg_geometry,
            mg_up_pallas,
        )

        h, w = hw
        bh, bw = beta
        hc = (h - 1) // 2
        g = _rand((3, h, w), seed=13)
        u0 = _rand((3, h, w), seed=14, scale=10.0)
        e = _rand((3, hc, w), seed=15, scale=5.0)
        _, hp, wp = mg_geometry(h, w, th)

        def padto(x, rows):
            return np.pad(np.asarray(x), ((0, 0), (0, rows - x.shape[1]),
                                          (0, wp - x.shape[2])))

        up = jnp.asarray(padto(u0, hp))
        gp = jnp.asarray(padto(g, hp))
        u_want, rh_want = mg_down_pallas(u0, g, 1, bh=bh, bw=bw, th=th,
                                         interpret=True, blocked=True)
        u_got, rh_got = mg_down_pallas(up, gp, 1, bh=bh, bw=bw, th=th,
                                       interpret=True,
                                       blocked=True, padded_io=True,
                                       true_hw=(h, w))
        assert np.array_equal(np.asarray(u_got)[:, :h, :w], np.asarray(u_want))
        assert np.array_equal(np.asarray(rh_got)[:, :hc, :w], np.asarray(rh_want))
        # rounded-space zero invariant: everything beyond the domain is 0
        # (zm can be empty when (h, w) is already in rounded space)
        zm = np.ones(u_got.shape, bool)
        zm[:, :h, :w] = False
        assert not np.asarray(u_got)[zm].any()

        ep = jnp.asarray(padto(e, hp // 2))
        up_want = mg_up_pallas(u0, g, e, 2, bh=bh, bw=bw, th=th,
                               interpret=True, blocked=True)
        up_got = mg_up_pallas(up, gp, ep, 2, bh=bh, bw=bw, th=th,
                              interpret=True,
                              blocked=True, padded_io=True, true_hw=(h, w))
        assert np.array_equal(np.asarray(up_got)[:, :h, :w], np.asarray(up_want))
        assert not np.asarray(up_got)[zm].any()

    @pytest.mark.parametrize("hw,beta", CASES)
    def test_u_zero_equals_explicit_zeros(self, hw, beta):
        """u_zero=True (zero guess synthesized in VMEM) == passing a zeros
        array, in element, blocked, and padded_io forms."""
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
            mg_down_pallas,
            mg_geometry,
        )

        h, w = hw
        bh, bw = beta
        g = _rand((3, h, w), seed=17)
        z = jnp.zeros_like(g)
        for blocked in (False, True):
            uw, rw = mg_down_pallas(z, g, 1, bh=bh, bw=bw, interpret=True,
                                    blocked=blocked)
            uz, rz = mg_down_pallas(None, g, 1, bh=bh, bw=bw, interpret=True,
                                    blocked=blocked, u_zero=True)
            assert np.array_equal(np.asarray(uw), np.asarray(uz))
            assert np.array_equal(np.asarray(rw), np.asarray(rz))
        _, hp, wp = mg_geometry(h, w)
        gp = jnp.asarray(np.pad(np.asarray(g),
                                ((0, 0), (0, hp - h), (0, wp - w))))
        uw, rw = mg_down_pallas(jnp.zeros_like(gp), gp, 1, bh=bh, bw=bw,
                                interpret=True, blocked=True, padded_io=True,
                                true_hw=(h, w))
        uz, rz = mg_down_pallas(None, gp, 1, bh=bh, bw=bw, interpret=True,
                                blocked=True, padded_io=True, true_hw=(h, w),
                                u_zero=True)
        assert np.array_equal(np.asarray(uw), np.asarray(uz))
        assert np.array_equal(np.asarray(rw), np.asarray(rz))

    @pytest.mark.parametrize("hw,beta", CASES)
    def test_restrict_t_matches_xla(self, hw, beta):
        """mg_restrict_t_pallas == transpose(4 * _restrict_axis(.)) to 1 ulp
        (the x4 folds into the (1,2,1) weights exactly — power-of-2 scaling
        commutes with rounding — but XLA's FMA contraction choices differ
        between the two expression shapes on the even-w edge row)."""
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
            _round_up, mg_restrict_t_pallas)
        from seamlesscloneoptimization_tpu.solvers.multigrid import _restrict_axis

        h, w = hw
        _, bw = beta
        hc, wc = (h - 1) // 2, (w - 1) // 2
        if hc < 1 or wc < 1:
            pytest.skip("too small")
        rh = _rand((3, hc, w), seed=21)
        hp2 = _round_up(hc, 128)
        wp = _round_up(w, 128)
        rh_p = jnp.asarray(np.pad(np.asarray(rh),
                                  ((0, 0), (0, hp2 - hc), (0, wp - w))))
        out_rows = _round_up(wc, 16)
        got = np.asarray(mg_restrict_t_pallas(rh_p, h, w, bw,
                                              out_rows=out_rows,
                                              interpret=True))
        want = np.asarray(4.0 * _restrict_axis(rh, bw))  # (3, hc, wc)
        assert got.shape == (3, out_rows, hp2)
        np.testing.assert_allclose(got[:, :wc, :hc], np.swapaxes(want, 1, 2),
                                   rtol=3e-6, atol=1e-3)
        assert not got[:, wc:, :].any() and not got[:, :, hc:].any()

    @pytest.mark.parametrize("hw,beta", CASES)
    def test_prolong_t_matches_xla(self, hw, beta):
        """mg_prolong_t_pallas == _prolong_axis(transpose(.)) bitwise."""
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
            _round_up, mg_prolong_t_pallas)
        from seamlesscloneoptimization_tpu.solvers.multigrid import _prolong_axis

        h, w = hw
        _, bw = beta
        hc, wc = (h - 1) // 2, (w - 1) // 2
        if hc < 1 or wc < 1:
            pytest.skip("too small")
        ec = _rand((3, hc, wc), seed=22, scale=5.0)
        hp_c = _round_up(wc, 16)
        lanes = _round_up(hc, 128)
        # transposed coarse solution at the origin, zeros outside
        ec_t = jnp.asarray(np.pad(np.swapaxes(np.asarray(ec), 1, 2),
                                  ((0, 0), (0, hp_c - wc), (0, lanes - hc))))
        out_rows = lanes
        wp = _round_up(w, 128)
        got = np.asarray(mg_prolong_t_pallas(ec_t, h, w, bw,
                                             out_rows=out_rows, wp=wp,
                                             interpret=True))
        want = np.asarray(_prolong_axis(ec, w, bw))  # (3, hc, w)
        assert got.shape == (3, out_rows, wp)
        np.testing.assert_array_equal(got[:, :hc, :w], want)
        assert not got[:, hc:, :].any() and not got[:, :, w:].any()

    def test_alt_orientation_solve_matches_quality(self):
        """padded='t' (vcycle_t): same contraction as vcycle_p, solutions
        equal to f32 rounding (the transposed coarse levels associate the
        neighbor adds in the other order, so bitwise equality is not
        expected)."""
        from seamlesscloneoptimization_tpu.solvers.jacobi import residual
        from seamlesscloneoptimization_tpu.solvers.multigrid import solve_multigrid

        for hw in [(512, 520), (511, 517)]:
            g = _rand((1,) + hw, seed=16)
            gn = float(jnp.abs(g).max())
            a = solve_multigrid(g, cycles=3, use_pallas=True, interpret=True,
                                padded=True)
            b = solve_multigrid(g, cycles=3, use_pallas=True, interpret=True,
                                padded="t")
            ra = float(jnp.abs(residual(a, g)).max()) / gn
            rb = float(jnp.abs(residual(b, g)).max()) / gn
            assert rb < 1.1 * ra + 1e-6, (hw, ra, rb)
            # both are 3-cycle iterates of the SAME fixed point; they differ
            # by O(their own remaining error) (the t-path's exact eigen
            # coarse solve converges slightly faster), not more
            rel = float(jnp.abs(a - b).max() / jnp.abs(a).max())
            assert rel < 1e-3, (hw, rel)

    @pytest.mark.parametrize("hw", [(64, 130), (63, 127), (70, 200), (65, 128)])
    def test_quarter_down_matches_dense(self, hw):
        """mg_down_q_pallas == the dense XLA sweep+residual+row-restrict
        (the quarter decomposition computes the same Gauss-Seidel updates,
        just only at the active color's cells)."""
        from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import (
            from_quarters, mg_down_q_pallas, mg_geometry_q, to_quarters)
        from seamlesscloneoptimization_tpu.solvers.multigrid import _restrict_rows

        h, w = hw
        hc = (h - 1) // 2
        g = _rand((3, h, w), seed=31)
        u0 = _rand((3, h, w), seed=32, scale=10.0)
        geom = mg_geometry_q(h, w, th=16)
        th, hq, wq2, hp2 = geom

        def pad_q(x):
            xp = jnp.asarray(np.pad(np.asarray(x), (
                (0, 0), (0, 2 * hq - h), (0, 2 * wq2 - w))))
            return to_quarters(xp)

        uq, rh_e, rh_o = mg_down_q_pallas(pad_q(u0), pad_q(g), 1, (h, w),
                                          geom, interpret=True)
        u_got = np.asarray(from_quarters(uq))[:, :h, :w]
        u_x, rh_x = self._xla_down(u0, g, 1, 1.0, 1.0)
        np.testing.assert_allclose(u_got, np.asarray(u_x), atol=1e-3, rtol=1e-5)
        # interleave the split rh planes back to dense and compare
        rh_el = np.asarray(rh_e)[:, :hc, :]
        rh_ol = np.asarray(rh_o)[:, :hc, :]
        dense = np.zeros((3, hc, 2 * wq2), np.float32)
        dense[:, :, 0::2] = rh_el
        dense[:, :, 1::2] = rh_ol
        np.testing.assert_allclose(dense[:, :, :w], np.asarray(rh_x),
                                   atol=1e-3, rtol=1e-5)

    @pytest.mark.parametrize("hw", [(64, 130), (63, 127), (70, 200), (65, 128)])
    def test_quarter_up_matches_dense(self, hw):
        from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import (
            from_quarters, mg_geometry_q, mg_up_q_pallas, to_quarters)

        h, w = hw
        hc = (h - 1) // 2
        g = _rand((3, h, w), seed=33)
        u0 = _rand((3, h, w), seed=34, scale=10.0)
        e = _rand((3, hc, w), seed=35, scale=5.0)
        geom = mg_geometry_q(h, w, th=16)
        th, hq, wq2, hp2 = geom

        def pad_q(x):
            xp = jnp.asarray(np.pad(np.asarray(x), (
                (0, 0), (0, 2 * hq - h), (0, 2 * wq2 - w))))
            return to_quarters(xp)

        # split e_lane into lane-parity planes (what mg_prolong_tq emits)
        ew = np.zeros((3, hc, 2 * wq2), np.float32)
        ew[:, :, :w] = np.asarray(e)
        e_even = jnp.asarray(np.pad(ew[:, :, 0::2], ((0, 0), (0, hp2 - hc), (0, 0))))
        e_odd = jnp.asarray(np.pad(ew[:, :, 1::2], ((0, 0), (0, hp2 - hc), (0, 0))))
        uq = mg_up_q_pallas(pad_q(u0), pad_q(g), e_even, e_odd, 2, (h, w),
                            geom, interpret=True)
        u_got = np.asarray(from_quarters(uq))[:, :h, :w]
        u_x = self._xla_up(u0, g, e, 2, 1.0, 1.0)
        np.testing.assert_allclose(u_got, np.asarray(u_x), atol=1e-3, rtol=1e-5)
        # with_residual: same planes + the in-kernel red-cell residual max
        # equals the dense residual max (black residual is exactly zero
        # after the final black half-sweep, up to f32 association)
        from seamlesscloneoptimization_tpu.solvers.jacobi import residual as res_d

        uq2, rmax = mg_up_q_pallas(pad_q(u0), pad_q(g), e_even, e_odd, 2,
                                   (h, w), geom, interpret=True,
                                   with_residual=True)
        assert np.array_equal(np.asarray(uq2), np.asarray(uq))
        want_r = float(jnp.abs(res_d(jnp.asarray(u_got), g)).max())
        assert abs(float(rmax) - want_r) <= 1e-3 + 1e-4 * want_r, (
            float(rmax), want_r)

    @pytest.mark.parametrize("hw", [(64, 130), (63, 127)])
    def test_fused_ud_matches_up_then_down(self, hw):
        """mg_ud_q_pallas == mg_up_q_pallas followed by mg_down_q_pallas,
        BITWISE (same arithmetic; the unfused pair re-fetches post-up
        ghosts the fused window already holds exactly)."""
        from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import (
            mg_down_q_pallas, mg_geometry_q, mg_ud_q_pallas, mg_up_q_pallas,
            to_quarters)

        h, w = hw
        hc = (h - 1) // 2
        g = _rand((3, h, w), seed=41)
        u0 = _rand((3, h, w), seed=42, scale=10.0)
        geom = mg_geometry_q(h, w, th=16)
        th, hq, wq2, hp2 = geom

        def pad_q(x):
            xp = jnp.asarray(np.pad(np.asarray(x), (
                (0, 0), (0, 2 * hq - h), (0, 2 * wq2 - w))))
            return to_quarters(xp)

        rng = np.random.default_rng(43)
        e_e = np.zeros((3, hp2, wq2), np.float32)
        e_o = np.zeros((3, hp2, wq2), np.float32)
        e_e[:, :hc, :] = rng.normal(size=(3, hc, wq2)) * 5
        e_o[:, :hc, :] = rng.normal(size=(3, hc, wq2)) * 5
        e_e, e_o = jnp.asarray(e_e), jnp.asarray(e_o)
        uq0, gq = pad_q(u0), pad_q(g)
        up = mg_up_q_pallas(uq0, gq, e_e, e_o, 2, (h, w), geom,
                            interpret=True)
        want = mg_down_q_pallas(up, gq, 1, (h, w), geom, interpret=True)
        got = mg_ud_q_pallas(uq0, gq, e_e, e_o, 2, 1, (h, w), geom,
                             interpret=True)
        for a, b in zip(got, want):
            assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_fused_ud_with_residual(self):
        """mg_ud_q_pallas(with_residual=True): same planes/rh outputs,
        plus the descent-half residual max == the dense residual of the
        OUTPUT state (round 5: makes checked tol cycles cost the same
        fine-level DMA as check-free ones)."""
        from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import (
            from_quarters, mg_geometry_q, mg_ud_q_pallas, to_quarters)
        from seamlesscloneoptimization_tpu.solvers.jacobi import residual as res_d

        h, w = 64, 130
        g = _rand((3, h, w), seed=51)
        u0 = _rand((3, h, w), seed=52, scale=10.0)
        geom = mg_geometry_q(h, w, th=16)
        th, hq, wq2, hp2 = geom
        hc = (h - 1) // 2

        def pad_q(x):
            xp = jnp.asarray(np.pad(np.asarray(x), (
                (0, 0), (0, 2 * hq - h), (0, 2 * wq2 - w))))
            return to_quarters(xp)

        rng = np.random.default_rng(53)
        e_e = np.zeros((3, hp2, wq2), np.float32)
        e_o = np.zeros((3, hp2, wq2), np.float32)
        e_e[:, :hc, :] = rng.normal(size=(3, hc, wq2)) * 5
        e_o[:, :hc, :] = rng.normal(size=(3, hc, wq2)) * 5
        e_e, e_o = jnp.asarray(e_e), jnp.asarray(e_o)
        uq0, gq = pad_q(u0), pad_q(g)
        plain = mg_ud_q_pallas(uq0, gq, e_e, e_o, 2, 1, (h, w), geom,
                               interpret=True)
        withr = mg_ud_q_pallas(uq0, gq, e_e, e_o, 2, 1, (h, w), geom,
                               interpret=True, with_residual=True)
        for a, b in zip(plain, withr[:-1]):
            assert np.array_equal(np.asarray(a), np.asarray(b))
        u_out = jnp.asarray(np.asarray(from_quarters(withr[0]))[:, :h, :w])
        want_r = float(jnp.abs(res_d(u_out, g)).max())
        got_r = float(withr[-1])
        assert abs(got_r - want_r) <= 1e-3 + 1e-4 * want_r, (got_r, want_r)

    def test_fused_tol_loop_contract(self):
        """The round-5 fused tol loop (_solve_q_tol_fused, reached through
        solve_multigrid's padded='q' tolerance mode at the default rct
        geometry) honors the tolerance contract and reports cycles."""
        from seamlesscloneoptimization_tpu.solvers.jacobi import residual
        from seamlesscloneoptimization_tpu.solvers.multigrid import solve_multigrid

        g = _rand((1, 511, 517), seed=54)
        gn = float(jnp.abs(g).max())
        u, info = solve_multigrid(g, tol=1e-3, use_pallas=True,
                                  interpret=True, padded="q",
                                  return_info=True)
        r = float(jnp.abs(residual(u[:, :511, :517] if u.shape[1] != 511
                                   else u, g)).max()) / gn
        assert r <= 1e-3 * 1.01, r
        assert 1 <= int(info["cycles"]) <= 60

    def test_fused_solve_matches_unfused_loop(self):
        """solve_multigrid's fused fixed-cycles pipeline == the plain
        vcycle_q loop. Bit-equal everywhere EXCEPT the even-size
        Shortley-Weller edge lane of the fused transposed restrict
        (rct_rows): its 1/3 and 1/6 weights are not powers of two, so XLA's
        FMA contraction across the now-fused producer/consumer boundary
        rounds once less there (~1 ulp of the coarse RHS; bounded here at
        rel 1e-4 of the solution — far inside the solver's tolerance
        contract)."""
        from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import (
            from_quarters_pallas, mg_geometry_q, to_quarters_pallas)
        from seamlesscloneoptimization_tpu.solvers.multigrid import (
            _pad_to, solve_multigrid, vcycle_q)

        h, w = 512, 520
        g = _rand((1, h, w), seed=44)
        got = solve_multigrid(g, cycles=3, use_pallas=True, interpret=True,
                              padded="q")
        qgeom = mg_geometry_q(h, w)
        _, hq, wq2, _ = qgeom
        g_q = to_quarters_pallas(_pad_to(g, (1, 2 * hq, 2 * wq2)),
                                 interpret=True)
        uq = jnp.zeros((1, 4, hq, wq2), jnp.float32)
        for _ in range(3):
            uq = vcycle_q(uq, g_q, h, w, 1, 2, 63, interpret=True, geom=qgeom)
        want = np.asarray(from_quarters_pallas(uq, interpret=True))[:, :h, :w]
        d = np.abs(np.asarray(got) - want).max()
        assert d <= 1e-4 * np.abs(want).max(), d
        # odd-size grid: no even-size edge lane -> strictly bit-equal
        g2 = _rand((1, 511, 517), seed=45)
        a = solve_multigrid(g2, cycles=2, use_pallas=True, interpret=True,
                            padded="q")
        qg2 = mg_geometry_q(511, 517)
        g2q = to_quarters_pallas(_pad_to(g2, (1, 2 * qg2[1], 2 * qg2[2])),
                                 interpret=True)
        uq2 = jnp.zeros((1, 4, qg2[1], qg2[2]), jnp.float32)
        for _ in range(2):
            uq2 = vcycle_q(uq2, g2q, 511, 517, 1, 2, 63, interpret=True,
                           geom=qg2)
        want2 = np.asarray(from_quarters_pallas(uq2, interpret=True))[:, :511, :517]
        assert np.array_equal(np.asarray(a), want2)

    def test_quarter_solve_matches_t(self):
        """padded='q' == padded='t' contraction (identical algorithm; the
        finest level just computes only the active color's cells)."""
        from seamlesscloneoptimization_tpu.solvers.jacobi import residual
        from seamlesscloneoptimization_tpu.solvers.multigrid import solve_multigrid

        for hw in [(512, 520), (511, 517)]:
            g = _rand((1,) + hw, seed=16)
            gn = float(jnp.abs(g).max())
            a = solve_multigrid(g, cycles=3, use_pallas=True, interpret=True,
                                padded="t")
            b = solve_multigrid(g, cycles=3, use_pallas=True, interpret=True,
                                padded="q")
            ra = float(jnp.abs(residual(a, g)).max()) / gn
            rb = float(jnp.abs(residual(b, g)).max()) / gn
            # same contraction; the tolerance absorbs f32 rounding noise at
            # the ~1e-5 residuals three cycles reach
            assert rb < 1.3 * ra + 1e-6, (hw, ra, rb)
            rel = float(jnp.abs(a - b).max() / jnp.abs(a).max())
            assert rel < 1e-4, (hw, rel)

    def test_padded_space_solve_matches_plain(self):
        """solve_multigrid(padded=True) == padded=False bitwise (interpret
        fused levels; the size clears the 1<<18 fused-level gate)."""
        from seamlesscloneoptimization_tpu.solvers.multigrid import solve_multigrid

        g = _rand((1, 512, 520), seed=16)
        # padded=False explicitly: the DEFAULT is the quarter path now
        # (best-path-as-default, round 5) — this test compares the two
        # dense-chain modes against each other
        want = solve_multigrid(g, cycles=2, use_pallas=True, interpret=True,
                               padded=False)
        got = solve_multigrid(g, cycles=2, use_pallas=True, interpret=True,
                              padded=True)
        assert np.array_equal(np.asarray(got), np.asarray(want))
        # tolerance-driven (while_loop) path: same bitwise contract
        want_t, info_w = solve_multigrid(g, tol=1e-3, use_pallas=True,
                                         interpret=True, return_info=True,
                                         padded=False)
        got_t, info_g = solve_multigrid(g, tol=1e-3, use_pallas=True,
                                        interpret=True, padded=True,
                                        return_info=True)
        assert np.array_equal(np.asarray(got_t), np.asarray(want_t))
        assert int(info_g["cycles"]) == int(info_w["cycles"])

    def test_quarter_tol_fused_check_contract(self):
        """padded='q' tolerance mode (fused in-kernel residual check) honors
        the tolerance contract and burns the same cycle count as the plain
        dense-checked loop (the fused red-cell residual equals the dense one
        up to f32 association; the 0.5% threshold shave absorbs it)."""
        from seamlesscloneoptimization_tpu.solvers.jacobi import residual
        from seamlesscloneoptimization_tpu.solvers.multigrid import solve_multigrid

        for hw, tol in [((512, 520), 1e-3), ((511, 517), 2e-4)]:
            g = _rand((1,) + hw, seed=17)
            gn = float(jnp.abs(g).max())
            u_q, info_q = solve_multigrid(g, tol=tol, use_pallas=True,
                                          interpret=True, padded="q",
                                          return_info=True)
            assert float(info_q["residual"]) <= tol * gn, (
                hw, float(info_q["residual"]) / gn)
            # the dense residual of the returned state agrees with what the
            # while_loop's fused check saw
            rel = float(jnp.abs(residual(u_q, g)).max()) / gn
            assert rel <= tol, (hw, rel)
            _, info_p = solve_multigrid(g, tol=tol, use_pallas=True,
                                        interpret=True, return_info=True)
            assert abs(int(info_q["cycles"]) - int(info_p["cycles"])) <= 1, (
                int(info_q["cycles"]), int(info_p["cycles"]))

    def test_blocked_multi_launch_sweeps(self):
        """>4 sweeps in blocked mode (the repad-free relaunch path)."""
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import rb_sweeps_pallas

        g = _rand((3, 50, 70), seed=11)
        u0 = _rand((3, 50, 70), seed=12, scale=10.0)
        sb = rb_sweeps_pallas(u0, g, 6, interpret=True, th=16, blocked=True)
        u_x = u0
        for _ in range(6):
            u_x = redblack_sweep(u_x, g)
        np.testing.assert_allclose(np.asarray(sb), np.asarray(u_x),
                                   atol=1e-3, rtol=1e-5)


class TestMgGeometry:
    """Pins the strip-height contract the padded-space V-cycle allocates
    against (ops/pallas_kernels.py:mg_geometry): width-keyed defaults from
    the 2026-08-19 full-solver hardware re-sweep (post _vmem_params), the
    coarse-level height clamp, the scoped-VMEM clamp, and the SCL_MG_TH
    override."""

    def test_width_keyed_defaults(self):
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import mg_geometry

        th, hp, wp = mg_geometry(1550, 2398)  # headline: wp=2432 -> th=160
        assert (th, wp) == (160, 2432) and hp % th == 0
        th, hp, wp = mg_geometry(2798, 3798)  # 8K: wp=3840 -> th=128
        assert (th, wp) == (128, 3840) and hp % th == 0

    def test_height_clamp_coarse_levels(self):
        """A level shorter than the width-keyed th gets a single strip of
        ~its own height instead of padding rows up to a tall strip."""
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import mg_geometry

        th, hp, wp = mg_geometry(97, 2398)
        assert th == 112 and hp == 112  # round_up(97, 16): one strip, no waste
        th, hp, _ = mg_geometry(5, 300)
        assert th == 16 and hp == 16  # floor

    def test_vmem_clamp_very_wide(self):
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
            _strip_height, mg_geometry)

        th, hp, wp = mg_geometry(10000, 40000)
        assert th < 128  # the VMEM budget forces narrower strips
        assert th == max(16, _strip_height(wp, n_windows=3,
                                           budget_bytes=48 << 20) // 16 * 16)
        assert th % 16 == 0 and hp % th == 0

    def test_env_override(self, monkeypatch):
        from seamlesscloneoptimization_tpu.ops import pallas_kernels as pk

        monkeypatch.setenv("SCL_MG_TH", "80")
        th, hp, wp = pk.mg_geometry(1550, 2398)
        assert th == 80 and hp % 80 == 0
        monkeypatch.setenv("SCL_MG_TH", "23")  # rounded down to 16-multiple
        th, _, _ = pk.mg_geometry(1550, 2398)
        assert th == 16

    def test_explicit_th_wins(self):
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import mg_geometry

        th, hp, wp = mg_geometry(129, 257, th=32)
        assert th == 32 and hp == 160 and wp == 384

    def test_vmem_params(self):
        """Tall strips raise Mosaic's scoped-VMEM limit (the measured th=80/
        wp=3840 boundary was a compile failure at the ~16 MB default); small
        strips keep the floor, interpret mode passes no params at all."""
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import _vmem_params

        assert _vmem_params(128, 3840, interpret=True) is None
        small = _vmem_params(16, 256, interpret=False)
        assert small.vmem_limit_bytes == 16 << 20  # floor: default behavior
        tall = _vmem_params(128, 3840, interpret=False)
        assert (16 << 20) < tall.vmem_limit_bytes <= 96 << 20
        assert _vmem_params(512, 16384, interpret=False).vmem_limit_bytes == 96 << 20


class TestFoldKernels:
    """fold/unfold Pallas kernels vs the XLA folded-DST forms (exact)."""

    @pytest.mark.parametrize("n", [126, 127, 128, 129, 255, 256, 300, 775])
    def test_fold_minor(self, n):
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
            fold_minor_pallas,
        )

        npad = (n + 127) // 128 * 128
        rng = np.random.default_rng(n)
        x = np.zeros((2, 256, npad), np.float32)
        x[:, :, :n] = rng.normal(size=(2, 256, n)).astype(np.float32) * 50
        s, d = fold_minor_pallas(jnp.asarray(x), n, interpret=True)
        he, ho = (n + 1) // 2, n // 2
        head = x[:, :, :ho]
        tail = x[:, :, n - ho:n][:, :, ::-1]
        s_true = head + tail
        d_true = head - tail
        np.testing.assert_array_equal(np.asarray(s)[:, :, :ho], s_true)
        np.testing.assert_array_equal(np.asarray(d)[:, :, :ho], d_true)
        if n % 2:  # middle element counted once
            np.testing.assert_array_equal(np.asarray(s)[:, :, he - 1],
                                          x[:, :, he - 1])

    @pytest.mark.parametrize("n", [126, 127, 128, 129, 300])
    def test_unfold_minor(self, n):
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
            unfold_minor_pallas,
        )

        he, ho = (n + 1) // 2, n // 2
        ep = (he + 127) // 128 * 128
        out_pad = max((n + 127) // 128 * 128, ep)
        rng = np.random.default_rng(n)
        e = np.zeros((2, 128, ep), np.float32)
        o = np.zeros((2, 128, ep), np.float32)
        e[:, :, :he] = rng.normal(size=(2, 128, he)).astype(np.float32)
        o[:, :, :he] = rng.normal(size=(2, 128, he)).astype(np.float32)
        out = unfold_minor_pallas(jnp.asarray(e), jnp.asarray(o), n, out_pad,
                                  interpret=True)
        want = np.zeros((2, 128, out_pad), np.float32)
        want[:, :, :he] = e[:, :, :he] + o[:, :, :he]
        want[:, :, he:n] = (e[:, :, :ho] - o[:, :, :ho])[:, :, ::-1]
        np.testing.assert_array_equal(np.asarray(out), want)

    @pytest.mark.parametrize("hw", [(61, 93), (200, 300), (255, 256),
                                    (300, 90), (90, 300)])
    def test_solve_pl_pallas_fold_matches_xla_fold(self, hw):
        from seamlesscloneoptimization_tpu.solvers.dst_gemm import (
            solve_dst_gemm_pl,
        )

        h2, w2 = hw
        hp = (h2 + 127) // 128 * 128
        wp = (w2 + 127) // 128 * 128
        rng = np.random.default_rng(7)
        g_tp = np.zeros((3, wp, hp), np.float32)
        g_tp[:, :w2, :h2] = rng.normal(size=(3, w2, h2)).astype(np.float32) * 50
        g_tp = jnp.asarray(g_tp)
        u_xla = np.asarray(solve_dst_gemm_pl(g_tp, h2=h2, w2=w2, folded=True,
                                             pallas_fold=False, interpret=True))
        u_pl = np.asarray(solve_dst_gemm_pl(g_tp, h2=h2, w2=w2, folded=True,
                                            pallas_fold=True, interpret=True))
        np.testing.assert_allclose(u_pl, u_xla, atol=1e-4, rtol=1e-6)

    @pytest.mark.parametrize("n", [127, 128, 300])
    def test_unfold_transpose(self, n):
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
            unfold_minor_pallas,
            unfold_transpose_pallas,
        )

        he = (n + 1) // 2
        ep = (he + 127) // 128 * 128
        out_pad = max((n + 127) // 128 * 128, ep)
        rng = np.random.default_rng(n)
        e = np.zeros((2, 256, ep), np.float32)
        o = np.zeros((2, 256, ep), np.float32)
        e[:, :, :he] = rng.normal(size=(2, 256, he)).astype(np.float32)
        o[:, :, :he] = rng.normal(size=(2, 256, he)).astype(np.float32)
        e, o = jnp.asarray(e), jnp.asarray(o)
        want = jnp.swapaxes(unfold_minor_pallas(e, o, n, out_pad,
                                                interpret=True), 1, 2)
        got_a = unfold_transpose_pallas(e, o, n, out_pad, row_start=0,
                                        row_count=128, interpret=True)
        got_b = unfold_transpose_pallas(e, o, n, out_pad, row_start=128,
                                        row_count=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(got_a),
                                      np.asarray(want[:, :, :128]))
        np.testing.assert_array_equal(np.asarray(got_b),
                                      np.asarray(want[:, :, 128:256]))

    @pytest.mark.parametrize("n", [127, 300])
    def test_unfold_clamp_guarded(self, n):
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
            _PASTE_CW,
            clamp_cast_guarded_pallas,
            unfold_clamp_guarded_pallas,
            unfold_minor_pallas,
        )

        he = (n + 1) // 2
        ep = (he + 127) // 128 * 128
        out_pad = max((n + 127) // 128 * 128, ep)
        rng = np.random.default_rng(n)
        e = np.zeros((3, 128, ep), np.float32)
        o = np.zeros((3, 128, ep), np.float32)
        e[:, :, :he] = rng.normal(size=(3, 128, he)).astype(np.float32) * 120
        o[:, :, :he] = rng.normal(size=(3, 128, he)).astype(np.float32) * 120
        e, o = jnp.asarray(e), jnp.asarray(o)
        u = unfold_minor_pallas(e, o, n, out_pad, interpret=True)
        want = clamp_cast_guarded_pallas(u, interpret=True)
        got = unfold_clamp_guarded_pallas(e, o, n, out_pad, interpret=True)
        assert got.shape == want.shape
        th, cw = 128, _PASTE_CW
        # only the written data region is defined (the ring/ragged block are
        # uninitialized by contract); compare there
        np.testing.assert_array_equal(
            np.asarray(got)[:, th:th + 128, cw:cw + out_pad],
            np.asarray(want)[:, th:th + 128, cw:cw + out_pad])
