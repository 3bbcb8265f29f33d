"""The shipped defaults ARE the measured-fast configuration.

VERDICT r3 next #1/#6: the reference ships its best path as the default
(SC_FFT_ENABLE, seamlessClone-CUDA/seamlessClone_imp.h:15); ours must too —
a bare ``CloneConfig()`` / ``api.seamless_clone`` has to reproduce the
bench.py headline configuration, and ``solve_auto``'s standalone defaults
have to match what the engine would run.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from seamlesscloneoptimization_tpu.core.config import CloneConfig


class TestFastDefaults:
    def test_bare_config_is_the_bench_config(self):
        """CloneConfig() field-for-field equals what bench.py constructs
        (bench only overrides solver/tol/donate_dst — serve-protocol knobs,
        not speed knobs)."""
        cfg = CloneConfig()
        bench_cfg = CloneConfig(solver="dst_gemm", tol=2e-4, donate_dst=True)
        import dataclasses

        diff = {
            f.name
            for f in dataclasses.fields(CloneConfig)
            if getattr(cfg, f.name) != getattr(bench_cfg, f.name)
        }
        assert diff == {"tol", "donate_dst"}, diff

    def test_default_values_are_the_measured_winners(self):
        """The docs/PERF.md winning configuration, field by field."""
        cfg = CloneConfig()
        assert cfg.precision == "high"  # bf16_3x: 4.9 -> 2.9 ms headline
        assert cfg.dst_folded is True  # folded DST: half the MXU FLOPs
        assert cfg.mg_padded == "q"  # quarter-plane multigrid
        assert cfg.use_pallas_preprocess is True
        assert cfg.use_pallas_postprocess is True
        assert cfg.use_pallas_smoother is True

    def test_cli_exposes_the_fast_knobs(self):
        """--precision/--folded/--pallas exist and override the defaults
        (VERDICT r3 weak #5); parse-only — no device work."""
        from seamlesscloneoptimization_tpu.cli import build_parser

        args = build_parser().parse_args(
            ["s.yml", "d.yml", "m.yml", "10", "10", "--precision", "highest",
             "--no-folded", "--no-pallas", "--tol", "1e-5",
             "--mg-cycles", "3"])
        assert args.precision == "highest"
        assert args.folded is False
        assert args.pallas is False
        assert args.tol == 1e-5 and args.mg_cycles == 3
        # bare argv: every knob None -> CloneConfig defaults rule
        bare = build_parser().parse_args(["s.yml", "d.yml", "m.yml", "10", "10"])
        assert bare.precision is None and bare.folded is None
        assert bare.pallas is None and bare.tol is None

    def test_engine_solver_kwargs_auto_forwards_cycles(self):
        cfg = CloneConfig(solver="auto", mg_cycles=4)
        kw = cfg.solver_kwargs()
        assert kw["cycles"] == 4
        assert kw["padded"] == "q"
        assert kw["folded"] is True
        assert kw["precision"] == "high"


class TestSolveAutoAlignment:
    def test_auto_defaults_match_engine_defaults_above_crossover(self, monkeypatch):
        """Above the crossover, bare solve_auto must launch the SAME
        multigrid configuration the engine's defaults produce (VERDICT r3
        weak #4: direct callers used to get the slow non-q V-cycle)."""
        import seamlesscloneoptimization_tpu.solvers as S

        captured = {}

        def fake_mg(g, **kwargs):
            captured.update(kwargs)
            return g

        monkeypatch.setattr(S, "solve_multigrid", fake_mg)
        g = jnp.zeros((3, 8, 8), jnp.float32)
        S.solve_auto(g, crossover=1)  # force the multigrid branch
        cfg_kw = CloneConfig(solver="auto").solver_kwargs()
        assert captured["padded"] == cfg_kw["padded"] == "q"
        assert captured["tol"] == cfg_kw["tol"]
        assert captured["cycles"] == cfg_kw["cycles"] is None

    def test_auto_forwards_cycles(self, monkeypatch):
        import seamlesscloneoptimization_tpu.solvers as S

        captured = {}

        def fake_mg(g, **kwargs):
            captured.update(kwargs)
            return g

        monkeypatch.setattr(S, "solve_multigrid", fake_mg)
        S.solve_auto(jnp.zeros((3, 8, 8), jnp.float32), crossover=1, cycles=4)
        assert captured["cycles"] == 4

    def test_auto_small_still_exact(self):
        """Below the crossover the direct solver still runs (sanity)."""
        from seamlesscloneoptimization_tpu.solvers import solve_auto
        from seamlesscloneoptimization_tpu.solvers.jacobi import residual

        rng = np.random.default_rng(0)
        g = jnp.asarray(rng.normal(size=(3, 40, 56)).astype(np.float32) * 10)
        u = solve_auto(g)
        r = float(jnp.max(jnp.abs(residual(u, g)))) / float(jnp.max(jnp.abs(g)))
        assert r < 1e-2  # bf16_3x direct solve


class TestTolValidation:
    def test_traced_tol_raises_clear_error(self):
        """ADVICE r3: a traced tol must fail with a clear message, not
        JAX's generic unhashable-static error."""
        import jax

        from seamlesscloneoptimization_tpu.solvers import solve_multigrid

        g = jnp.zeros((1, 8, 8), jnp.float32)
        with pytest.raises(TypeError, match="trace-time static"):
            jax.jit(lambda gg, t: solve_multigrid(gg, tol=t))(g, jnp.float32(1e-4))

    def test_scalar_array_tol_ok(self):
        from seamlesscloneoptimization_tpu.solvers import solve_multigrid

        rng = np.random.default_rng(1)
        g = jnp.asarray(rng.normal(size=(1, 12, 12)).astype(np.float32))
        u = solve_multigrid(g, tol=np.float64(1e-4))
        assert u.shape == g.shape

    def test_nonscalar_tol_raises(self):
        from seamlesscloneoptimization_tpu.solvers import solve_multigrid

        with pytest.raises(TypeError):
            solve_multigrid(jnp.zeros((1, 8, 8)), tol=np.array([1e-4, 1e-3]))


class TestTolBurstModel:
    def test_derates_for_weak_smoothing(self):
        """ADVICE r3: the 0.15/cycle model is validated for V(1,2)+ only;
        fewer sweeps must derate to the smoothing-only bound."""
        from seamlesscloneoptimization_tpu.solvers.multigrid import _tol_burst

        assert _tol_burst(1e-4, 60, nu1=1, nu2=2) > _tol_burst(1e-4, 60, nu1=1, nu2=0)
        # V(1,0): unvalidated contraction -> halved burst (3 // 2)
        assert _tol_burst(1e-4, 60, nu1=1, nu2=0) == 1
        assert _tol_burst(1e-4, 60) == _tol_burst(1e-4, 60, nu1=1, nu2=2) == 3

    def test_below_noise_tol_contract_still_bounded(self):
        """tol below the f32 noise floor: the fused-check shave goes
        nonpositive and the solve runs to max_cycles — bounded, no hang,
        and the result is still the best the hierarchy can do."""
        from seamlesscloneoptimization_tpu.solvers import solve_multigrid
        from seamlesscloneoptimization_tpu.solvers.jacobi import residual

        rng = np.random.default_rng(2)
        g = jnp.asarray(rng.normal(size=(1, 20, 20)).astype(np.float32))
        u, info = solve_multigrid(g, tol=1e-9, max_cycles=8, return_info=True)
        assert int(info["cycles"]) <= 8
        r = float(jnp.max(jnp.abs(residual(u, g)))) / float(jnp.max(jnp.abs(g)))
        assert r < 1e-5  # converged to (near) f32 floor
