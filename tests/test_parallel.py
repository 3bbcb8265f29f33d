"""Distributed-solve tests on the 8-device virtual CPU mesh.

Halo-exchange correctness and tiled-solver convergence are validated against
the single-device exact DST solution — the fake-backend strategy from
SURVEY §4 (multi-device semantics without TPU hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from seamlesscloneoptimization_tpu.parallel import (
    make_tile_mesh,
    solve_multigrid_sharded,
    solve_redblack_tiled,
)
from seamlesscloneoptimization_tpu.parallel.tiled import halo_exchange
from seamlesscloneoptimization_tpu.solvers import solve_dst_gemm


def _rand_g(h, w, c=3, seed=0, scale=50.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(c, h, w)).astype(np.float32) * scale)


@pytest.fixture(scope="module")
def mesh24():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_tile_mesh(jax.devices()[:8], (2, 4))


@pytest.fixture(scope="module")
def mesh18():
    return make_tile_mesh(jax.devices()[:8], (1, 8))


class TestHaloExchange:
    def test_halo_matches_global_pad(self, mesh24):
        """shard_map halo_exchange must reproduce the global zero-padded array."""
        h, w = 16, 32
        x = _rand_g(h, w, c=2, seed=1)
        ty, tx = 2, 4
        th, tw = h // ty, w // tx

        def local(x_loc):
            return halo_exchange(x_loc, ty, tx)

        padded_tiles = shard_map(
            local,
            mesh=mesh24,
            in_specs=(P(None, "ty", "tx"),),
            out_specs=P(None, "ty", "tx"),
        )(x)
        # out_specs concatenates (th+2, tw+2) tiles; fetch per-tile shards
        # and compare each against the globally zero-padded array.
        xg = np.asarray(jnp.pad(x, ((0, 0), (1, 1), (1, 1))))
        tiles = np.asarray(padded_tiles).reshape(2, ty, th + 2, tx, tw + 2)
        for i in range(ty):
            for j in range(tx):
                tile = tiles[:, i, :, j, :]
                want = xg[:, i * th : i * th + th + 2, j * tw : j * tw + tw + 2]
                # INCLUDING corners: the column exchange runs after the row
                # concat, so corner blocks carry true diagonal-neighbor data
                # (required by the k>1 communication-avoiding sweeps)
                np.testing.assert_allclose(tile, want, rtol=0, atol=0)


class TestTiledSolvers:
    @pytest.mark.parametrize("meshname", ["mesh24", "mesh18"])
    def test_redblack_tiled_matches_exact(self, request, meshname):
        mesh = request.getfixturevalue(meshname)
        g = _rand_g(32, 64, seed=2)
        u = solve_redblack_tiled(g, mesh, tol=1e-5, max_iters=40000)
        exact = solve_dst_gemm(g)
        rel = float(jnp.abs(u - exact).max() / jnp.abs(exact).max())
        assert rel < 1e-2, rel

    @pytest.mark.parametrize("halo", [2, 6, 8])
    def test_communication_avoiding_halo_widths_agree(self, mesh24, halo):
        """k-px ghost bands: owned cells stay exact for any even k."""
        g = _rand_g(32, 64, seed=5)
        u = solve_redblack_tiled(g, mesh24, tol=1e-5, max_iters=40000, halo=halo)
        exact = solve_dst_gemm(g)
        rel = float(jnp.abs(u - exact).max() / jnp.abs(exact).max())
        assert rel < 1e-2, f"halo={halo}: rel {rel}"

    def test_redblack_tiled_padded_domain(self, mesh24):
        # true domain 30x61 embedded in 32x64 tile-divisible grid
        g_true = _rand_g(30, 61, seed=3)
        g = jnp.zeros((3, 32, 64), jnp.float32).at[:, :30, :61].set(g_true)
        u = solve_redblack_tiled(g, mesh24, true_hw=(30, 61), tol=1e-5, max_iters=40000)
        exact = solve_dst_gemm(g_true)
        rel = float(jnp.abs(u[:, :30, :61] - exact).max() / jnp.abs(exact).max())
        assert rel < 1e-2, rel
        assert float(jnp.abs(u[:, 30:, :]).max()) == 0.0
        assert float(jnp.abs(u[:, :, 61:]).max()) == 0.0

    @pytest.mark.parametrize("halo", [2, 4, 8])
    def test_pallas_tile_sweeps_bitwise_equal(self, mesh24, halo):
        """Per-shard Mosaic sweeps (rb_sweeps_tile_pallas via the interpreter)
        must be BITWISE equal to the XLA tile body — the distributed program
        runs the same kernels as the single-chip path (VERDICT r2 missing #2)."""
        g = _rand_g(32, 64, seed=6)
        u_xla = solve_redblack_tiled(g, mesh24, tol=1e-4, halo=halo,
                                     use_pallas=False)
        u_pl = solve_redblack_tiled(g, mesh24, tol=1e-4, halo=halo,
                                    use_pallas=True, interpret=True)
        assert bool(jnp.all(u_pl == u_xla))

    def test_pallas_tile_sweeps_padded_domain(self, mesh24):
        """Global-coordinate masks in the kernel: padded cells stay pinned."""
        g_true = _rand_g(30, 61, seed=7)
        g = jnp.zeros((3, 32, 64), jnp.float32).at[:, :30, :61].set(g_true)
        u_xla = solve_redblack_tiled(g, mesh24, true_hw=(30, 61), tol=1e-5,
                                     max_iters=40000, use_pallas=False)
        u_pl = solve_redblack_tiled(g, mesh24, true_hw=(30, 61), tol=1e-5,
                                    max_iters=40000, use_pallas=True,
                                    interpret=True)
        assert bool(jnp.all(u_pl == u_xla))
        assert float(jnp.abs(u_pl[:, 30:, :]).max()) == 0.0
        assert float(jnp.abs(u_pl[:, :, 61:]).max()) == 0.0

    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_overlap_schedule_bitwise_equal(self, mesh24, use_pallas):
        """Interior-first halo overlap (SURVEY §2.18 item 4) is a pure
        reschedule: bitwise-equal results, ghost exchange off the critical
        path."""
        g = _rand_g(48, 96, seed=8)
        kw = dict(tol=1e-4, halo=4, use_pallas=use_pallas,
                  interpret=use_pallas)
        base = solve_redblack_tiled(g, mesh24, overlap=False, **kw)
        over = solve_redblack_tiled(g, mesh24, overlap=True, **kw)
        assert bool(jnp.all(over == base))

    def test_overlap_padded_domain_with_truehw(self, mesh24):
        g_true = _rand_g(45, 90, seed=9)
        g = jnp.zeros((3, 48, 96), jnp.float32).at[:, :45, :90].set(g_true)
        base = solve_redblack_tiled(g, mesh24, true_hw=(45, 90), tol=1e-5,
                                    max_iters=40000, overlap=False,
                                    use_pallas=False)
        over = solve_redblack_tiled(g, mesh24, true_hw=(45, 90), tol=1e-5,
                                    max_iters=40000, overlap=True,
                                    use_pallas=False)
        assert bool(jnp.all(over == base))
        exact = solve_dst_gemm(g_true)
        rel = float(jnp.abs(over[:, :45, :90] - exact).max()
                    / jnp.abs(exact).max())
        assert rel < 1e-2, rel

    # (34, 120): global even-size edge coarse ROW = the LAST local coarse
    # row of tile ty=0 (regression: the restriction's fourth Shortley-
    # Weller term used to fall outside the 1-ghost window and silently
    # drop); (60, 98): same trigger in the LANE direction (edge coarse
    # col 47 = last local of tile tx=2).
    @pytest.mark.parametrize("true_hw", [None, (61, 121), (34, 120), (60, 98)])
    def test_multigrid_dd_matches_single_chip(self, mesh24, true_hw):
        """Domain-decomposed multigrid (shard_map fine level + replicated
        coarse) == the single-device solver to f32 rounding; Pallas
        per-shard sweeps bitwise-equal to the XLA tile body."""
        from seamlesscloneoptimization_tpu.parallel.tiled import solve_multigrid_dd
        from seamlesscloneoptimization_tpu.solvers.multigrid import solve_multigrid

        H, W = 64, 128
        ht, wt = true_hw if true_hw else (H, W)
        rng = np.random.default_rng(13)
        gt = (rng.normal(size=(3, ht, wt)) * 50).astype(np.float32)
        g = np.zeros((3, H, W), np.float32)
        g[:, :ht, :wt] = gt
        g = jnp.asarray(g)
        u_dd = solve_multigrid_dd(g, mesh24, true_hw=true_hw, cycles=4,
                                  use_pallas=False)
        u_ref = solve_multigrid(jnp.asarray(gt), cycles=4)
        rel = float(jnp.abs(u_dd[:, :ht, :wt] - u_ref).max()
                    / jnp.abs(u_ref).max())
        # 4e-5 bar: measured <= 3e-5 at every size here; a dropped edge
        # restriction term measures 6e-5 (the regression this pins).
        assert rel < 4e-5, rel
        assert float(jnp.abs(u_dd[:, ht:, :]).max() if ht < H else 0.0) == 0.0
        u_pl = solve_multigrid_dd(g, mesh24, true_hw=true_hw, cycles=4,
                                  use_pallas=True, interpret=True)
        assert bool(jnp.all(u_pl == u_dd))

    def test_multigrid_sharded_matches_exact(self, mesh24):
        g = _rand_g(64, 128, seed=4)
        u = solve_multigrid_sharded(g, mesh24, tol=1e-5)
        exact = solve_dst_gemm(g)
        rel = float(jnp.abs(u - exact).max() / jnp.abs(exact).max())
        assert rel < 1e-3, rel

    def test_multigrid_dd_tolerance_mode(self, mesh24):
        """DD tol mode (burst + pmax-voted while_loop) honors the tolerance
        contract and matches the exact solve (VERDICT r3 next #2)."""
        from seamlesscloneoptimization_tpu.parallel.tiled import solve_multigrid_dd
        from seamlesscloneoptimization_tpu.solvers.jacobi import residual

        g = _rand_g(64, 128, seed=14)
        tol = 1e-5
        u = solve_multigrid_dd(g, mesh24, tol=tol, use_pallas=False)
        gn = float(jnp.abs(g).max())
        r = float(jnp.abs(residual(u, g)).max()) / gn
        assert r <= tol * 1.01, r
        exact = solve_dst_gemm(g)
        rel = float(jnp.abs(u - exact).max() / jnp.abs(exact).max())
        assert rel < 1e-3, rel

    def test_solve_poisson_dd_arbitrary_size(self, mesh24):
        """The padded front door: any (H, W), zero-pad embedding, exact crop."""
        from seamlesscloneoptimization_tpu.parallel.tiled import solve_poisson_dd
        from seamlesscloneoptimization_tpu.solvers.jacobi import residual
        from seamlesscloneoptimization_tpu.solvers.multigrid import solve_multigrid

        for hw in [(45, 90), (61, 121), (10, 17)]:
            rng = np.random.default_rng(sum(hw))
            g = jnp.asarray((rng.normal(size=(3,) + hw) * 50).astype(np.float32))
            u = solve_poisson_dd(g, mesh24, tol=1e-5, use_pallas=False)
            assert u.shape == g.shape
            r = float(jnp.abs(residual(u, g)).max()) / float(jnp.abs(g).max())
            assert r <= 1e-5 * 1.01, (hw, r)
            u_ref = solve_multigrid(g, tol=1e-5)
            rel = float(jnp.abs(u - u_ref).max() / (jnp.abs(u_ref).max() + 1e-30))
            assert rel < 1e-3, (hw, rel)

    def test_clone_tiled_dd_matches_gspmd(self, airplane, sky, full_mask):
        """The flagship DD path == the GSPMD A/B path <= 1 LSB."""
        from seamlesscloneoptimization_tpu.parallel import (
            make_tile_mesh,
            seamless_clone_tiled,
        )

        mesh = make_tile_mesh(jax.devices()[:8], (2, 4))
        a = seamless_clone_tiled(airplane, sky, full_mask.copy(), (800, 150),
                                 mesh=mesh, tol=1e-6, path="dd")
        b = seamless_clone_tiled(airplane, sky, full_mask.copy(), (800, 150),
                                 mesh=mesh, tol=1e-6, path="gspmd")
        d = np.abs(a.astype(int) - b.astype(int)).max()
        assert d <= 1, d


class TestBatch:
    def test_fused_batch_matches_sequential(self, airplane, sky):
        import cv2

        from seamlesscloneoptimization_tpu.parallel.batch import clone_batch_composite
        from seamlesscloneoptimization_tpu.solvers import solve_dst_gemm
        from seamlesscloneoptimization_tpu.core import reference as R

        # two non-overlapping jobs with a common ROI bucket
        patch = airplane[:64, :96]
        mask = np.zeros((64, 96), np.uint8)
        cv2.circle(mask, (48, 32), 25, 255, -1)
        m = R.zero_mask_border(mask)
        x0, y0, bw, bh = R.mask_bounding_box(m)
        srcs = np.stack([patch[y0 : y0 + bh, x0 : x0 + bw]] * 2)
        masks = np.stack([m[y0 : y0 + bh, x0 : x0 + bw]] * 2)
        centers = [(300, 200), (800, 500)]
        lts = np.array([[cx - bw // 2, cy - bh // 2] for cx, cy in centers], np.int32)

        out = clone_batch_composite(
            jnp.asarray(sky), jnp.asarray(srcs), jnp.asarray(masks), jnp.asarray(lts),
            1, solve_dst_gemm, (bh, bw),
        )
        seq = sky.copy()
        for c in centers:
            seq = R.seamless_clone_np(patch, seq, mask, c)
        d = np.abs(np.asarray(out).astype(int) - seq.astype(int))
        assert d.max() <= 1, d.max()


class TestFusedBatch64:
    def test_64_masks_into_4k_destination(self):
        """BASELINE config[3]: 64 masks/patches into one 4K dst, fused solve."""
        import cv2

        from seamlesscloneoptimization_tpu.api import seamless_clone_batch_fused
        from seamlesscloneoptimization_tpu.core import reference as R

        rng = np.random.default_rng(7)
        H, W = 2160, 3840
        dst = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
        srcs, masks, centers = [], [], []
        shapes = [(32, 40), (28, 28), (44, 36), (24, 46)]  # 4 shape groups
        for i in range(64):
            h, w = shapes[i % 4]
            src = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            mask = np.zeros((h, w), np.uint8)
            cv2.circle(mask, (w // 2, h // 2), min(h, w) // 2 - 2, 255, -1)
            # 8x8 grid of centers, jittered, away from the frame
            gx, gy = i % 8, i // 8
            cx = 240 + gx * 460 + int(rng.integers(-40, 40))
            cy = 140 + gy * 260 + int(rng.integers(-30, 30))
            srcs.append(src)
            masks.append(mask)
            centers.append((cx, cy))

        out = seamless_clone_batch_fused(dst, srcs, masks, centers)
        assert out.shape == dst.shape and out.dtype == np.uint8

        # every job must match its independent tight solve closely (bucket
        # padding introduces only a tiny boundary-harmonic difference)
        worst = 0
        for i in [0, 13, 37, 63]:
            seq = R.seamless_clone_np(srcs[i], dst, masks[i], centers[i])
            cx, cy = centers[i]
            m = R.zero_mask_border(
                np.where(masks[i] != 0, np.uint8(255), np.uint8(0)))
            x0, y0, bw, bh = R.mask_bounding_box(m)
            left, top = cx - bw // 2, cy - bh // 2
            a = out[top : top + bh, left : left + bw].astype(int)
            b = seq[top : top + bh, left : left + bw].astype(int)
            worst = max(worst, int(np.abs(a - b).max()))
        assert worst <= 1, f"fused vs tight solve diff {worst}"

    def test_pad_exact_mixed_sizes_match_sequential(self, sky):
        """bucket='pad_exact' (VERDICT r4 weak #3): mixed-size jobs share
        ONE executable yet each solves its TIGHT Dirichlet system — output
        bit-close (diff_max <= 1) to sequential seamless_clone calls,
        unlike pad mode's 30-45 dB membrane drift."""
        from seamlesscloneoptimization_tpu.api import seamless_clone
        from seamlesscloneoptimization_tpu.parallel.batch import (
            clone_batch_composite_dyn,
            seamless_clone_batch_fused,
        )

        rng = np.random.default_rng(5)
        dst = np.ascontiguousarray(sky[:400, :600])
        shapes = [(40, 50), (30, 44), (26, 36)]
        srcs = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                for h, w in shapes]
        masks = [np.full(s.shape[:2], 255, np.uint8) for s in srcs]
        centers = [(150, 120), (420, 280), (300, 60)]

        n0 = clone_batch_composite_dyn._cache_size()
        out = seamless_clone_batch_fused(
            dst, srcs, masks, centers, bucket="pad_exact", tol=1e-6)
        # one executable for the whole mixed-size batch
        assert clone_batch_composite_dyn._cache_size() == n0 + 1

        seq = dst.copy()
        for src, mask, c in zip(srcs, masks, centers):
            seq = seamless_clone(src, seq, mask, c, solver="multigrid",
                                 tol=1e-6)
        d = np.abs(out.astype(int) - seq.astype(int)).max()
        assert d <= 1, d

    def test_pad_bucket_mode_stays_seamless(self, sky):
        """bucket='pad': one compile; output close to tight solves (PSNR).

        The pad bucket moves the Poisson Dirichlet frame off the tight
        bbox; the resulting membrane is equally seamless but differs from
        the tight solve with content roughness (noise patches here measure
        ~34 dB; see the docstring). The assertion pins the documented
        quality floor, the visual-equivalence bar, not bit parity.
        """
        from seamlesscloneoptimization_tpu.parallel.batch import (
            seamless_clone_batch_fused,
        )
        from seamlesscloneoptimization_tpu.core import reference as R

        rng = np.random.default_rng(3)
        dst = np.ascontiguousarray(sky[:400, :600])
        srcs = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                for h, w in [(40, 50), (30, 44)]]
        masks = [np.full(s.shape[:2], 255, np.uint8) for s in srcs]
        centers = [(150, 120), (420, 280)]
        out = seamless_clone_batch_fused(dst, srcs, masks, centers, bucket="pad")
        from conftest import psnr

        for src, mask, c in zip(srcs, masks, centers):
            seq = R.seamless_clone_np(src, dst, mask, c)
            m = R.zero_mask_border(mask.copy())
            x0, y0, bw, bh = R.mask_bounding_box(m)
            left, top = c[0] - bw // 2, c[1] - bh // 2
            db = psnr(out[top : top + bh, left : left + bw],
                      seq[top : top + bh, left : left + bw])
            assert db > 30, f"pad-bucket PSNR {db:.1f} dB"


class TestTiledClone:
    def test_tiled_clone_end_to_end_vs_cv2(self, airplane, sky, full_mask):
        """BASELINE config[4] structure: whole pipeline GSPMD-sharded over a
        2x4 mesh with the multigrid solve tile-partitioned; bit-close output.
        """
        import cv2

        from seamlesscloneoptimization_tpu.parallel import (
            make_tile_mesh,
            seamless_clone_tiled,
        )

        mesh = make_tile_mesh(jax.devices()[:8], (2, 4))
        out = seamless_clone_tiled(
            airplane, sky, full_mask.copy(), (800, 150), mesh=mesh, tol=1e-6
        )
        golden = cv2.seamlessClone(
            airplane, sky, full_mask.copy(), (800, 150), cv2.NORMAL_CLONE
        )
        d = np.abs(out.astype(int) - golden.astype(int))
        assert d.max() <= 1, f"diff max {d.max()}"


class TestTiledServeEngine:
    """TiledSeamlessClone: the engine's serve-mode contract over a mesh
    (VERDICT r4 missing #1 — instance reuse, async run, device-resident
    planar chaining, timed_serve)."""

    def test_run_matches_cv2_on_mesh(self, airplane, sky, full_mask):
        import cv2

        from seamlesscloneoptimization_tpu.core.config import CloneConfig
        from seamlesscloneoptimization_tpu.parallel import (
            TiledSeamlessClone,
            make_tile_mesh,
        )

        mesh = make_tile_mesh(jax.devices()[:8], (2, 4))
        eng = TiledSeamlessClone(CloneConfig(tol=1e-6), mesh=mesh)
        out = np.asarray(eng.run(airplane, sky, full_mask.copy(), (800, 150)))
        golden = cv2.seamlessClone(
            airplane, sky, full_mask.copy(), (800, 150), cv2.NORMAL_CLONE)
        d = np.abs(out.astype(int) - golden.astype(int)).max()
        assert d <= 1, d

    def test_serve_chained_matches_single_chip(self, airplane, sky, full_mask):
        """The chained planar serve loop on a 2x4 mesh produces the same
        frame sequence as the single-chip engine's serve loop (same
        warm-up + 2x loops protocol; both solve their Poisson systems well
        past the u8 quantization, so the chained outputs must agree to the
        accumulation of +-1 roundings per frame)."""
        from seamlesscloneoptimization_tpu.core.config import CloneConfig
        from seamlesscloneoptimization_tpu.core.engine import SeamlessClone
        from seamlesscloneoptimization_tpu.parallel import (
            TiledSeamlessClone,
            make_tile_mesh,
        )

        mesh = make_tile_mesh(jax.devices()[:8], (2, 4))
        tiled = TiledSeamlessClone(CloneConfig(tol=1e-7), mesh=mesh)
        got, _ = tiled.timed_serve(airplane, sky, full_mask.copy(),
                                   (800, 150), loops=2)
        single = SeamlessClone(CloneConfig(solver="multigrid", tol=1e-7))
        want, _ = single.timed_serve(airplane, sky, full_mask.copy(),
                                     (800, 150), loops=2)
        d = np.abs(np.asarray(got).astype(int)
                   - np.asarray(want).astype(int)).max()
        assert d <= 2, d
        # the serve executable is cached: a second serve at the same shapes
        # must not add executables (the reference's instance-reuse property)
        n = len(tiled._cache)
        tiled.timed_serve(airplane, sky, full_mask.copy(), (800, 150), loops=1)
        assert len(tiled._cache) == n

    def test_mixed_and_monochrome_flags_on_mesh(self, airplane, sky, full_mask):
        """The mesh engine inherits the full flags surface (MIXED_CLONE /
        MONOCHROME_TRANSFER guidance rules partition tile-locally)."""
        import cv2

        from seamlesscloneoptimization_tpu.core.config import CloneConfig
        from seamlesscloneoptimization_tpu.parallel import (
            TiledSeamlessClone,
            make_tile_mesh,
        )

        mesh = make_tile_mesh(jax.devices()[:8], (2, 4))
        eng = TiledSeamlessClone(CloneConfig(tol=1e-6), mesh=mesh)
        for flags, cvflag in ((2, cv2.MIXED_CLONE), (3, cv2.MONOCHROME_TRANSFER)):
            out = np.asarray(eng.run(airplane, sky, full_mask.copy(),
                                     (800, 150), flags))
            golden = cv2.seamlessClone(airplane, sky, full_mask.copy(),
                                       (800, 150), cvflag)
            d = np.abs(out.astype(int) - golden.astype(int)).max()
            assert d <= 1, (flags, d)
        # on a real mesh the metric reports the distributed solver that
        # actually ran, not the single-chip crossover answer
        assert eng.metrics["solver_resolved"] == "multigrid_dd"

    def test_1x1_mesh_degenerates_to_engine(self, airplane, sky, full_mask):
        """A 1x1 mesh runs the identical single-chip program (same solver
        resolution, same kwargs) — byte-equal output."""
        from seamlesscloneoptimization_tpu.core.config import CloneConfig
        from seamlesscloneoptimization_tpu.core.engine import SeamlessClone
        from seamlesscloneoptimization_tpu.parallel import (
            TiledSeamlessClone,
            make_tile_mesh,
        )

        mesh = make_tile_mesh(jax.devices()[:1], (1, 1))
        tiled = TiledSeamlessClone(CloneConfig(tol=1e-6), mesh=mesh)
        eng = SeamlessClone(CloneConfig(tol=1e-6))
        got = np.asarray(tiled.run(airplane, sky, full_mask.copy(), (800, 150)))
        want = np.asarray(eng.run(airplane, sky, full_mask.copy(), (800, 150)))
        assert np.array_equal(got, want)
        assert tiled.metrics["solver_resolved"] == eng.metrics["solver_resolved"]


class TestLocalEditTiled:
    def test_color_change_sharded_matches_single(self, airplane):
        """GSPMD-sharded colorChange == single-device exact path <= 1 LSB."""
        import cv2 as _cv2

        from seamlesscloneoptimization_tpu.api import color_change
        from seamlesscloneoptimization_tpu.ops.edit import COLOR_CHANGE
        from seamlesscloneoptimization_tpu.parallel import make_tile_mesh
        from seamlesscloneoptimization_tpu.parallel.clone_tiled import (
            local_edit_tiled,
        )

        src = _cv2.resize(airplane, (160, 120), interpolation=_cv2.INTER_CUBIC)
        mask = np.zeros((120, 160), np.uint8)
        _cv2.circle(mask, (80, 60), 40, 255, -1)
        want = color_change(src, mask, 1.6, 0.7, 1.1)
        got = local_edit_tiled(src, mask, COLOR_CHANGE, [1.1, 0.7, 1.6],
                               mesh=make_tile_mesh(), tol=1e-6)
        d = np.abs(want.astype(int) - got.astype(int)).max()
        assert d <= 1, d

    def test_illumination_change_sharded_matches_single(self, airplane):
        """All three edit kinds ride the SHARED edit_guidance rules
        (VERDICT r4 weak #5): illumination kind, sharded vs single."""
        import cv2 as _cv2

        from seamlesscloneoptimization_tpu.api import illumination_change
        from seamlesscloneoptimization_tpu.ops.edit import ILLUMINATION_CHANGE
        from seamlesscloneoptimization_tpu.parallel import make_tile_mesh
        from seamlesscloneoptimization_tpu.parallel.clone_tiled import (
            local_edit_tiled,
        )

        src = _cv2.resize(airplane, (160, 120), interpolation=_cv2.INTER_CUBIC)
        mask = np.zeros((120, 160), np.uint8)
        _cv2.circle(mask, (70, 50), 35, 255, -1)
        want = illumination_change(src, mask, 0.2, 0.4)
        got = local_edit_tiled(src, mask, ILLUMINATION_CHANGE, [0.2, 0.4],
                               mesh=make_tile_mesh(), tol=1e-6)
        d = np.abs(want.astype(int) - got.astype(int)).max()
        assert d <= 1, d

    def test_texture_flattening_sharded_matches_single(self, airplane):
        import cv2 as _cv2

        from seamlesscloneoptimization_tpu.api import texture_flattening
        from seamlesscloneoptimization_tpu.ops.edit import TEXTURE_FLATTENING
        from seamlesscloneoptimization_tpu.parallel import make_tile_mesh
        from seamlesscloneoptimization_tpu.parallel.clone_tiled import (
            local_edit_tiled,
        )

        src = _cv2.resize(airplane, (160, 120), interpolation=_cv2.INTER_CUBIC)
        mask = np.zeros((120, 160), np.uint8)
        _cv2.circle(mask, (80, 60), 40, 255, -1)
        masked = np.where(mask[..., None] != 0, src, 0).astype(np.uint8)
        edges = _cv2.Canny(masked, 30.0, 45.0, apertureSize=3)
        want = texture_flattening(src, mask, 30.0, 45.0, 3)
        got = local_edit_tiled(src, mask, TEXTURE_FLATTENING, [0.0],
                               edge_mask=edges, mesh=make_tile_mesh(),
                               tol=1e-6)
        d = np.abs(want.astype(int) - got.astype(int)).max()
        assert d <= 1, d
