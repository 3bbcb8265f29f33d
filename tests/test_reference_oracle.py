"""Golden comparison of the NumPy oracle vs cv2.seamlessClone.

Replicates the reference repo's validation strategy (compare/vs.py:52-69):
absdiff of outputs, asserting on diff-sum / diff-max. The reference published
diff-max 1 and diff-sum 44-128 at the 300x194 config; we hold ourselves to the
same bar for NORMAL_CLONE and MONOCHROME_TRANSFER.
"""

import cv2
import numpy as np
import pytest

from seamlesscloneoptimization_tpu.core import reference as R


from conftest import diff_stats


class TestNormalClone:
    def test_full_mask_bitclose(self, airplane, sky, full_mask):
        golden = cv2.seamlessClone(airplane, sky, full_mask.copy(), (800, 150), cv2.NORMAL_CLONE)
        mine = R.seamless_clone_np(airplane, sky, full_mask.copy(), (800, 150))
        s, m = diff_stats(golden, mine)
        assert m <= 1, f"diff max {m}"
        assert s <= 1000, f"diff sum {s}"

    def test_irregular_mask_bitclose(self, airplane, sky, irregular_mask):
        golden = cv2.seamlessClone(airplane, sky, irregular_mask.copy(), (700, 300), cv2.NORMAL_CLONE)
        mine = R.seamless_clone_np(airplane, sky, irregular_mask.copy(), (700, 300))
        s, m = diff_stats(golden, mine)
        assert m <= 1, f"diff max {m}"
        assert s <= 2000, f"diff sum {s}"

    def test_none_mask_means_full(self, airplane, sky, full_mask):
        a = R.seamless_clone_np(airplane, sky, None, (800, 150))
        b = R.seamless_clone_np(airplane, sky, full_mask.copy(), (800, 150))
        assert np.array_equal(a, b)

    def test_output_outside_roi_untouched(self, airplane, sky, irregular_mask):
        out, st = R.seamless_clone_np(
            airplane, sky, irregular_mask.copy(), (700, 300), return_stages=True
        )
        left, top = st["left_top"]
        _, _, bw, bh = st["bbox"]
        m = np.ones(sky.shape[:2], bool)
        m[top : top + bh, left : left + bw] = False
        assert np.array_equal(out[m], sky[m])

    def test_empty_mask_returns_dst(self, airplane, sky):
        mask = np.zeros(airplane.shape[:2], np.uint8)
        out = R.seamless_clone_np(airplane, sky, mask, (800, 150))
        assert np.array_equal(out, sky)

    def test_roi_out_of_bounds_raises(self, airplane, sky, full_mask):
        with pytest.raises(ValueError):
            R.seamless_clone_np(airplane, sky, full_mask.copy(), (10, 10))


class TestOtherModes:
    def test_monochrome_bitclose(self, airplane, sky, irregular_mask):
        golden = cv2.seamlessClone(
            airplane, sky, irregular_mask.copy(), (700, 300), cv2.MONOCHROME_TRANSFER
        )
        mine = R.seamless_clone_np(
            airplane, sky, irregular_mask.copy(), (700, 300), flags=R.MONOCHROME_TRANSFER
        )
        s, m = diff_stats(golden, mine)
        assert m <= 1, f"diff max {m}"
        assert s <= 2000, f"diff sum {s}"

    def test_mixed_bitclose(self, airplane, sky, irregular_mask):
        # Pinned to the installed cv2's actual MIXED rule (the strict
        # component-difference comparison, see guidance_field): bit-close.
        golden = cv2.seamlessClone(
            airplane, sky, irregular_mask.copy(), (700, 300), cv2.MIXED_CLONE
        )
        mine = R.seamless_clone_np(
            airplane, sky, irregular_mask.copy(), (700, 300), flags=R.MIXED_CLONE
        )
        s, m = diff_stats(golden, mine)
        assert m <= 1, f"diff max {m}"


class TestStages:
    def test_erode_matches_cv2_view_semantics(self, irregular_mask):
        # cv2.erode on a zero-padded mask == our erode3x3 with zero border.
        m = R.zero_mask_border(irregular_mask.copy())
        x0, y0, bw, bh = R.mask_bounding_box(m)
        roi = m[y0 : y0 + bh, x0 : x0 + bw]
        padded = np.pad(roi, 3, constant_values=0)
        golden = cv2.erode(padded, np.ones((3, 3), np.uint8), iterations=3)[3:-3, 3:-3]
        assert np.array_equal(R.erode3x3(roi, 3), golden)

    def test_bounding_box_matches_cv2(self, irregular_mask):
        m = R.zero_mask_border(irregular_mask.copy())
        assert R.mask_bounding_box(m) == tuple(cv2.boundingRect(m))

    def test_dst_solver_exact(self):
        # Solve A u = g with the 5-point Laplacian; check the residual.
        rng = np.random.default_rng(0)
        h, w = 31, 17
        g = rng.normal(size=(h, w, 2)).astype(np.float32) * 10
        u = R.poisson_solve_dst(g)
        up = np.pad(u, ((1, 1), (1, 1), (0, 0)))  # Dirichlet-0 frame
        lap = up[:-2, 1:-1] + up[2:, 1:-1] + up[1:-1, :-2] + up[1:-1, 2:] - 4 * u
        assert np.abs(lap - g).max() < 1e-2

    def test_dst_matrix_orthogonal(self):
        # V is symmetric-orthogonal: V @ V = I (the reference's testDST idea,
        # seamlessClone_imp.cpp:532-554).
        for n in (5, 64, 190):
            V = R.dst_matrix(n).astype(np.float64)
            assert np.abs(V @ V - np.eye(n)).max() < 1e-4

    def test_rhs_matches_golden_laplacian(self, airplane, sky, full_mask):
        # The solved interior's discrete Laplacian must equal the RHS
        # (the g-vs-mod_diff intermediate check of compare/vs.py:81-86).
        _, st = R.seamless_clone_np(
            airplane, sky, full_mask.copy(), (800, 150), return_stages=True
        )
        u, g = st["u"], st["rhs"]
        # The Dirichlet terms are already folded into g, so the interior
        # operator uses a zero frame.
        up = np.pad(u, ((1, 1), (1, 1), (0, 0)))
        lap = up[:-2, 1:-1] + up[2:, 1:-1] + up[1:-1, :-2] + up[1:-1, 2:] - 4 * u
        assert np.abs(lap - g).max() < 0.3
