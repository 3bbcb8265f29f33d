"""Solver unit tests: exactness, cross-checks, convergence.

The DST solvers are exact (validated against the operator and each other);
Jacobi/multigrid must converge to the DST answer within tolerance — the
reference's 'with-FFT vs with-GEMM' cross-check (PDF §1.1 table) generalized.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from seamlesscloneoptimization_tpu.solvers import (
    solve_dst_fft,
    solve_dst_gemm,
    solve_multigrid,
    solve_redblack,
)
from seamlesscloneoptimization_tpu.solvers.jacobi import residual
from seamlesscloneoptimization_tpu.solvers.multigrid import prolong_bilinear, restrict_fw


def _rand_g(h, w, c=3, seed=0, scale=50.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(c, h, w)).astype(np.float32) * scale)


def _apply_A(u):
    up = jnp.pad(u, ((0, 0), (1, 1), (1, 1)))
    return up[:, :-2, 1:-1] + up[:, 2:, 1:-1] + up[:, 1:-1, :-2] + up[:, 1:-1, 2:] - 4 * u


SIZES = [(7, 9), (32, 32), (63, 127), (190, 296), (100, 53)]


class TestDirectSolvers:
    @pytest.mark.parametrize("hw", SIZES)
    def test_dst_gemm_solves_operator(self, hw):
        g = _rand_g(*hw)
        u = solve_dst_gemm(g)
        err = jnp.abs(_apply_A(u) - g).max() / jnp.abs(g).max()
        assert err < 1e-4, f"rel residual {err}"

    @pytest.mark.parametrize("hw", SIZES)
    def test_fft_matches_gemm(self, hw):
        g = _rand_g(*hw, seed=1)
        u1 = solve_dst_gemm(g)
        u2 = solve_dst_fft(g)
        scale = jnp.abs(u1).max()
        assert jnp.abs(u1 - u2).max() / scale < 1e-4

    def test_dst_transform_orthogonal(self):
        from seamlesscloneoptimization_tpu.solvers.dst_fft import dst1_2d

        x = _rand_g(33, 65, c=1, seed=2, scale=1.0)
        xx = dst1_2d(dst1_2d(x))
        assert jnp.abs(xx - x).max() < 1e-4

    # odd/odd, even/even, odd/even and a one-axis-gated (tiny h) case
    @pytest.mark.parametrize("hw", [(255, 257), (256, 384), (255, 384), (61, 300)])
    def test_folded_dst_transform_roundtrip(self, hw):
        """Folded fwd o grouped-eigendivide o folded inv == plain transform
        chain, on one axis at a time (the _pl chain composes these)."""
        from seamlesscloneoptimization_tpu.solvers.dst_gemm import (
            _ru128,
            dst_eigenvalues_grouped,
            dst_fwd_folded_minor,
            dst_inv_folded_minor,
            dst_matrix,
        )

        h, n = hw
        rng = np.random.default_rng(n)
        kp = _ru128(n)
        x = np.zeros((2, h, kp), np.float32)
        x[:, :, :n] = rng.normal(size=(2, h, n)).astype(np.float32) * 40
        xj = jnp.asarray(x)
        mm = lambda a, v: jnp.einsum("...ij,jk->...ik", a, v)  # noqa: E731

        spec = dst_fwd_folded_minor(xj, n, mm)
        he, ho = (n + 1) // 2, n // 2
        ep = _ru128(he)
        v = np.asarray(dst_matrix(n))
        want_spec = x[:, :, :n] @ v
        got_even = np.asarray(spec)[:, :, :he]
        got_odd = np.asarray(spec)[:, :, ep : ep + ho]
        tol = 1e-3 * np.abs(want_spec).max()
        assert np.abs(got_even - want_spec[:, :, 0::2]).max() < tol
        assert np.abs(got_odd - want_spec[:, :, 1::2]).max() < tol
        # grouped padding slots must be exactly zero (padded-chain contract)
        def maxabs(a):
            return np.abs(a).max() if a.size else 0.0

        assert maxabs(np.asarray(spec)[:, :, he:ep]) == 0.0
        assert maxabs(np.asarray(spec)[:, :, ep + ho :]) == 0.0

        lam = jnp.asarray(dst_eigenvalues_grouped(n))
        back = dst_inv_folded_minor(spec / lam, n, kp, mm)
        # reference: plain chain u = (x V / lam_natural) V
        from seamlesscloneoptimization_tpu.solvers.dst_gemm import dst_eigenvalues
        want = (want_spec / np.asarray(dst_eigenvalues(n))[None, None, :]) @ v
        got = np.asarray(back)
        assert np.abs(got[:, :, :n] - want).max() < 1e-3 * np.abs(want).max()
        assert maxabs(got[:, :, n:]) == 0.0

    @pytest.mark.parametrize("hw", [(255, 300), (300, 296), (190, 296)])
    @pytest.mark.parametrize("layout", ["natural", "t_out", "t_in"])
    def test_solve_dst_gemm_folded_matches(self, hw, layout):
        """solve_dst_gemm(folded=True) == unfolded in every layout variant
        (per-axis gating included: 190 folds, 296+ folds, both orders)."""
        g = _rand_g(*hw, seed=11)
        if layout == "natural":
            want = solve_dst_gemm(g)
            got = solve_dst_gemm(g, folded=True)
        elif layout == "t_out":
            want = solve_dst_gemm(g, transposed_output=True)
            got = solve_dst_gemm(g, transposed_output=True, folded=True)
        else:
            g_t = jnp.swapaxes(g, 1, 2)
            want = solve_dst_gemm(g_t, transposed_input=True)
            got = solve_dst_gemm(g_t, transposed_input=True, folded=True)
        scale = jnp.abs(want).max()
        assert jnp.abs(got - want).max() / scale < 1e-5

    @pytest.mark.parametrize("hw", [(255, 300), (190, 296), (300, 255)])
    def test_solve_dst_gemm_pl_folded_matches_plain(self, hw):
        """The folded padded-space chain == the unfolded one (both interpret
        mode; folding halves the GEMM FLOPs, docs/PERF.md)."""
        from seamlesscloneoptimization_tpu.solvers.dst_gemm import (
            _ru128,
            solve_dst_gemm_pl,
        )

        h2, w2 = hw
        g = _rand_g(h2, w2, seed=9)
        hp, wp = _ru128(h2), _ru128(w2)
        g_tp = jnp.zeros((3, wp, hp), jnp.float32)
        g_tp = g_tp.at[:, :w2, :h2].set(jnp.swapaxes(g, 1, 2))
        want = np.asarray(solve_dst_gemm_pl(g_tp, h2=h2, w2=w2, interpret=True))
        got = np.asarray(solve_dst_gemm_pl(g_tp, h2=h2, w2=w2, interpret=True,
                                           folded=True))
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 1e-5
        # padding must stay (near-)zero for downstream slicing
        pad_mask = np.ones(got.shape, bool)
        pad_mask[:, :h2, :w2] = False
        assert np.abs(got[pad_mask]).max() < 1e-4 * scale


class TestIterativeSolvers:
    @pytest.mark.parametrize("hw", [(31, 31), (64, 48)])
    def test_redblack_converges(self, hw):
        g = _rand_g(*hw, seed=3)
        u = solve_redblack(g, tol=1e-5, max_iters=20000)
        exact = solve_dst_gemm(g)
        assert jnp.abs(u - exact).max() / jnp.abs(exact).max() < 1e-2

    @pytest.mark.parametrize("hw", [(31, 31), (63, 127), (190, 296), (100, 53), (256, 256)])
    def test_multigrid_converges(self, hw):
        g = _rand_g(*hw, seed=4)
        u = solve_multigrid(g, tol=1e-5, max_cycles=60)
        r = jnp.abs(residual(u, g)).max() / jnp.abs(g).max()
        # bar matches the DIRECT solver's own f32 floor (see
        # test_dst_gemm_solves_operator): sizes at/below the coarsest cutoff
        # solve exactly and bottom out near kappa*eps, not at tol
        assert r < 1e-4, f"rel residual {r}"
        exact = solve_dst_gemm(g)
        assert jnp.abs(u - exact).max() / jnp.abs(exact).max() < 1e-3

    def test_multigrid_fast_convergence_rate(self):
        # A V(2,2) cycle on a smooth problem must contract the residual by
        # >=4x per cycle on average (sanity check that MG is really MG).
        from seamlesscloneoptimization_tpu.solvers.multigrid import vcycle

        g = _rand_g(129, 129, c=1, seed=5)
        u = jnp.zeros_like(g)
        r0 = float(jnp.abs(residual(u, g)).max())
        n = 6
        for _ in range(n):
            u = vcycle(u, g)
        rn = float(jnp.abs(residual(u, g)).max())
        rate = (rn / r0) ** (1.0 / n)
        assert rate < 0.25, f"avg contraction {rate}"

    def test_tol_burst_prediction(self):
        """_tol_burst: check-free cycles stay within the tolerance contract.

        The burst count must (a) be zero outside (0, 0.15) where the
        contraction model is invalid, (b) cap at max_cycles, and (c) stay at
        least two checks SHORT of the first cycle count that could pass at
        the modeled worst-case 0.15/cycle contraction, so the while_loop
        always re-verifies the tolerance.
        """
        import math

        from seamlesscloneoptimization_tpu.solvers.multigrid import _tol_burst

        assert _tol_burst(0.5, 30) == 0
        assert _tol_burst(0.15, 30) == 0
        assert _tol_burst(-1.0, 30) == 0
        assert _tol_burst(1e-30, 5) == 5  # capped
        for tol in (1e-2, 2e-4, 1e-5, 1e-7):
            b = _tol_burst(tol, 60)
            assert 0 <= b <= 60
            # after b cycles the worst-case residual is still above tol
            assert 0.15 ** b > tol, (tol, b)

    @pytest.mark.parametrize("padded", [False, "q"])
    def test_tol_burst_end_state_matches_no_burst(self, padded):
        """Burst + while_loop must land on the same tolerance contract as the
        pure while_loop: reported residual <= tol and cycles >= burst."""
        from seamlesscloneoptimization_tpu.solvers.multigrid import _tol_burst

        g = _rand_g(190, 296, seed=21)
        tol = 1e-4
        u, info = solve_multigrid(g, tol=tol, return_info=True, padded=padded)
        rel = float(info["residual"]) / float(jnp.abs(g).max())
        assert rel <= tol, rel
        assert int(info["cycles"]) >= _tol_burst(tol, 30)

    def test_restrict_prolong_shapes(self):
        r = _rand_g(63, 127, c=1)
        rc = restrict_fw(r)
        assert rc.shape == (1, 31, 63)
        e = prolong_bilinear(rc, 63, 127)
        assert e.shape == (1, 63, 127)
        # even sizes
        r = _rand_g(64, 100, c=1)
        rc = restrict_fw(r)
        assert rc.shape == (1, 31, 49)
        assert prolong_bilinear(rc, 64, 100).shape == (1, 64, 100)


class TestConvergenceComparison:
    def test_multigrid_vs_jacobi_iterations_and_psnr(self):
        """BASELINE config[1]: convergence-iterations and PSNR vs Jacobi.

        Multigrid must reach the tolerance in FAR fewer fine-grid-equivalent
        sweeps than red-black Jacobi, and both must match the exact DST
        solution at high PSNR.
        """
        g = _rand_g(190, 296, seed=9)
        exact = solve_dst_gemm(g)

        u_j, info_j = solve_redblack(g, tol=1e-4, max_iters=60000,
                                     check_every=200, return_info=True)
        u_m, info_m = solve_multigrid(g, tol=1e-4, return_info=True)

        def psnr(u):
            mse = float(jnp.mean((u - exact) ** 2))
            peak = float(jnp.abs(exact).max())
            return 10 * np.log10(peak**2 / mse)

        sweeps_j = int(info_j["iterations"])
        cycles_m = int(info_m["cycles"])
        # one V(2,2) cycle costs ~6 fine-sweep-equivalents (4 smoothing + ~2
        # for transfers/coarse); FMG adds a few more. Count generously.
        sweeps_m_equiv = (cycles_m + 3) * 8
        assert sweeps_j > 10 * sweeps_m_equiv, (
            f"jacobi {sweeps_j} sweeps vs multigrid ~{sweeps_m_equiv} equiv"
        )
        assert psnr(u_j) > 40, f"jacobi PSNR {psnr(u_j):.1f}"
        assert psnr(u_m) > 40, f"multigrid PSNR {psnr(u_m):.1f}"


class TestAutoSolver:
    def test_auto_picks_direct_below_crossover(self):
        from seamlesscloneoptimization_tpu.solvers import solve_auto

        g = _rand_g(64, 96, seed=11)
        u = solve_auto(g)
        exact = solve_dst_gemm(g)
        assert float(jnp.abs(u - exact).max()) == 0.0  # same code path

    def test_auto_multigrid_branch(self):
        """The >crossover branch routes to multigrid and converges to the
        direct answer (crossover lowered so the branch runs at test size)."""
        from seamlesscloneoptimization_tpu.solvers import solve_auto

        g = _rand_g(64, 96, seed=12)
        u = solve_auto(g, tol=1e-7, crossover=1000)
        exact = solve_dst_gemm(g)
        scale = float(jnp.abs(exact).max())
        assert float(jnp.abs(u - exact).max()) / scale < 1e-4

    def test_auto_selection_rule(self):
        from seamlesscloneoptimization_tpu.solvers import (
            AUTO_CROSSOVER_PIXELS,
            auto_solver_name,
        )

        assert auto_solver_name((3, 1550, 2398)) == "dst_gemm"  # 3.7 MP
        assert auto_solver_name((3, 2048, 3072)) == "dst_gemm"  # 6.3 MP
        assert auto_solver_name((3, 2798, 3798)) == "multigrid"  # 10.6 MP
        assert auto_solver_name((3, 2000, 3500)) == "dst_gemm"  # exactly 7 MP
        assert auto_solver_name((3, 2000, 3501)) == "multigrid"  # just past it
        assert AUTO_CROSSOVER_PIXELS == 7_000_000  # pinned by docs/PERF.md

    def test_auto_via_engine(self):
        import cv2

        from seamlesscloneoptimization_tpu.api import seamless_clone

        a = cv2.imread("/root/reference/seamlessClone-OpenCV/images/airplane.jpg")
        s = cv2.imread("/root/reference/seamlessClone-OpenCV/images/sky.jpg")
        m = np.full(a.shape[:2], 255, np.uint8)
        golden = cv2.seamlessClone(a, s, m.copy(), (800, 150), cv2.NORMAL_CLONE)
        out = seamless_clone(a, s, m.copy(), (800, 150), solver="auto")
        d = np.abs(out.astype(int) - golden.astype(int))
        assert d.max() <= 1


class TestMultigridDyn:
    """Runtime-domain multigrid (solvers/multigrid_dyn.py): transfers match
    the static operators at every traced size/parity, and the solve matches
    the exact direct answer on the true domain with zeros outside."""

    @pytest.mark.parametrize("n", [3, 4, 5, 17, 31, 32, 63, 64])
    @pytest.mark.parametrize("beta", [1.0, 0.8, 1.37])
    def test_transfers_match_static(self, n, beta):
        from seamlesscloneoptimization_tpu.solvers.multigrid import (
            _prolong_axis,
            _prolong_rows,
            _restrict_axis,
            _restrict_rows,
        )
        from seamlesscloneoptimization_tpu.solvers.multigrid_dyn import (
            _prolong_axis_dyn,
            _prolong_rows_dyn,
            _restrict_axis_dyn,
            _restrict_rows_dyn,
        )

        Np = 70
        rng = np.random.default_rng(n)
        nc = (n - 1) // 2
        nj, bj = jnp.int32(n), jnp.float32(beta)

        r = np.zeros((2, 5, Np), np.float32)
        r[..., :n] = rng.normal(size=(2, 5, n)).astype(np.float32)
        want = np.asarray(_restrict_axis(jnp.asarray(r[..., :n]), beta))
        got = np.asarray(_restrict_axis_dyn(jnp.asarray(r), nj, bj))
        np.testing.assert_allclose(got[..., :nc], want, atol=2e-6)
        assert np.abs(got[..., nc:]).max() == 0.0

        rr = np.swapaxes(r, -1, -2).copy()
        wantr = np.asarray(_restrict_rows(jnp.asarray(rr[:, :n]), beta))
        gotr = np.asarray(_restrict_rows_dyn(jnp.asarray(rr), nj, bj))
        np.testing.assert_allclose(gotr[:, :nc], wantr, atol=2e-6)
        assert np.abs(gotr[:, nc:]).max() == 0.0

        Ncp = (Np - 1) // 2
        e = np.zeros((2, 5, Ncp), np.float32)
        e[..., :nc] = rng.normal(size=(2, 5, nc)).astype(np.float32)
        wantp = np.asarray(_prolong_axis(jnp.asarray(e[..., :nc]), n, beta))
        gotp = np.asarray(_prolong_axis_dyn(jnp.asarray(e), Np, nj, bj))
        np.testing.assert_allclose(gotp[..., :n], wantp, atol=2e-6)
        assert np.abs(gotp[..., n:]).max() == 0.0

        er = np.swapaxes(e, -1, -2).copy()
        wantq = np.asarray(_prolong_rows(jnp.asarray(er[:, :nc]), n, beta))
        gotq = np.asarray(_prolong_rows_dyn(jnp.asarray(er), Np, nj, bj))
        np.testing.assert_allclose(gotq[:, :n], wantq, atol=2e-6)
        assert np.abs(gotq[:, n:]).max() == 0.0

    @pytest.mark.parametrize(
        "hw", [(100, 126), (97, 113), (126, 126), (40, 120), (5, 126)]
    )
    def test_solve_matches_direct_on_true_domain(self, hw):
        from seamlesscloneoptimization_tpu.solvers.multigrid_dyn import (
            solve_multigrid_dyn,
        )

        h, w = hw
        Hp = Wp = 126
        rng = np.random.default_rng(h * 1000 + w)
        gt = (rng.normal(size=(3, h, w)) * 255).astype(np.float32)
        g = np.zeros((3, Hp, Wp), np.float32)
        g[:, :h, :w] = gt
        # garbage outside the domain must be ignored (solver masks it)
        g[:, h:, :] = 1e6
        u = np.asarray(
            solve_multigrid_dyn(jnp.asarray(g), (jnp.int32(h), jnp.int32(w)),
                                tol=2e-5)
        )
        exact = np.asarray(solve_dst_gemm(jnp.asarray(gt)))
        rel = np.abs(u[:, :h, :w] - exact).max() / np.abs(exact).max()
        assert rel < 1e-3, rel
        if h < Hp:
            assert np.abs(u[:, h:, :]).max() == 0.0
        if w < Wp:
            assert np.abs(u[:, :, w:]).max() == 0.0

    def test_one_compiled_program_many_sizes(self):
        """The whole point: traced sizes never retrace/recompile."""
        import jax

        from seamlesscloneoptimization_tpu.solvers.multigrid_dyn import (
            solve_multigrid_dyn,
        )

        g = _rand_g(96, 96, seed=5)
        gp = jnp.pad(g, ((0, 0), (0, 30), (0, 30)))
        with jax.checking_leaks():
            n0 = solve_multigrid_dyn._cache_size()
            for h, w in [(96, 96), (50, 70), (33, 97)]:
                solve_multigrid_dyn(gp, (jnp.int32(h), jnp.int32(w)), cycles=2)
            assert solve_multigrid_dyn._cache_size() - n0 == 1

    def test_fixed_cycles_contraction(self):
        """~0.1/cycle contraction at a runtime size (the serving mode)."""
        from seamlesscloneoptimization_tpu.solvers.multigrid_dyn import (
            _residual_dyn,
            solve_multigrid_dyn,
        )

        h, w = 90, 110
        g = jnp.pad(_rand_g(h, w, seed=6, scale=255.0),
                    ((0, 0), (0, 36), (0, 16)))
        hj, wj = jnp.int32(h), jnp.int32(w)
        one = jnp.float32(1.0)
        gn = float(jnp.max(jnp.abs(g)))
        r4 = float(jnp.max(jnp.abs(_residual_dyn(
            solve_multigrid_dyn(g, (hj, wj), cycles=4), g, hj, wj, one, one))))
        assert r4 / gn < 5e-4, r4 / gn
