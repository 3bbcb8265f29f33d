"""Geometric multigrid V-cycle for the 5-point Dirichlet Laplacian.

The north-star iterative solver (absent in the reference, which is
direct-solver only): O(N) per digit of accuracy, built from shift/elementwise
stencils that XLA fuses per level, and whose smoothing sweeps tile across a
device mesh with halo exchange (see parallel/tiled.py).

Scheme (vertex-centered, unscaled operators, boundary-consistent hierarchy):
- smoother: red-black Gauss-Seidel (solvers/jacobi.py; beta-aware variant
  _sweeps_b on coarse levels)
- restriction: separable full-weighting (1/4, 1/2, 1/4 per axis) at fine
  points (2i+1, 2j+1); coarse size (n-1)//2. The coarse RHS is scaled by 4
  (A_h ~ h^2 * Laplacian, so the 2h-grid equation needs 4x the restricted
  residual).
- prolongation: bilinear, separable, zero outside the coarse grid
  (the exact transpose of restriction up to the factor 4).
- EVEN sizes: every level tracks its boundary-gap parameter beta per axis
  (_coarsen): the right/bottom wall sits beta*h beyond the last line. The
  coarse operator uses Shortley-Weller last-line coefficients consistent
  with that geometry, and the edge transfer weights are the linear
  interpolation over the beta gap ((2/3, 1/3) at beta=1). This is what
  makes contraction ~0.11/cycle at EVERY size — with a uniform-stencil
  hierarchy, even sizes degraded to 0.52/cycle.
- coarsest level (min dim <= coarsest): EXACT direct solve in the
  (beta-modified) separable eigenbasis (solvers/dst_gemm.py:solve_sep_eig;
  plain DST when beta==1) — a handful of tiny MXU matmuls, far cheaper and
  tighter than smoothing the coarsest grid.

Correctness at the FINEST level is untouched by all of this: the true
5-point operator defines the residual and the stopping rule, so the result
matches the exact DST solvers to the requested tolerance; the beta
machinery only shapes coarse corrections.

The level hierarchy is built at trace time (static shapes per level), so the
whole solve is one jit-compiled while_loop — no host round-trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from seamlesscloneoptimization_tpu.solvers.dst_gemm import solve_dst_gemm, solve_sep_eig
from seamlesscloneoptimization_tpu.solvers.jacobi import redblack_sweep, residual


def _coarsen(m: int, beta: float) -> tuple[int, float]:
    """Coarse size and boundary-gap parameter for one axis.

    Each level's right/bottom boundary sits ``beta * h`` beyond its last
    line (beta = 1 on the finest). Coarse points are the odd fine indices,
    mc = (m-1)//2, so the coarse gap is (m - 2*mc + beta)/2 coarse spacings:
    odd m -> (1+beta)/2, even m -> 1 + beta/2. Keeping the coarse operator,
    smoother and transfers consistent with this geometry (Shortley-Weller
    last-line coefficients) is what restores textbook ~0.1/cycle contraction
    on arbitrary even sizes — measured 0.52/cycle at 3x1550x2398 with the
    uniform-stencil hierarchy vs 0.11 with this one.
    """
    mc = (m - 1) // 2
    return mc, (m - 2 * mc + beta) / 2.0


def _restrict_axis(r: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """1-D full-weighting along the last axis: (..., n) -> (..., (n-1)//2).

    out[j] = 1/4 r[2j] + 1/2 r[2j+1] + 1/4 r[2j+2] — the transpose of
    bilinear prolongation scaled by 1/2. For even n the last coarse row is
    the transpose of the (2/3, 1/3) edge prolongation (see _prolong_axis):
    out[nc-1] = 1/4 r[n-4] + 1/2 r[n-3] + 1/3 r[n-2] + 1/6 r[n-1].

    Scatter-free: the even-n edge row is the bulk row plus a rank-1 patch
    joined by concat (an ``at[].set`` here forced an extra full-array
    materialization pass per axis per level — measured 0.64 ms at
    3x1550x2398 against a ~0.06 ms HBM roof).
    """
    n = r.shape[-1]
    nc = (n - 1) // 2
    # Stride-2 decimation expressed as reshape-to-pairs: XLA lowers a
    # stride-2 slice on the LANE axis by transposing the whole array per
    # channel (async slice+copy chains — ~2.9 ms of a 7.2 ms V-cycle at
    # 3x1550x2398), whereas the (n/2, 2) reshape is one T(2,128) relayout
    # copy like the prolong interleave. A (= r[2j]) and B (= r[2j+1]) then
    # make the stencil pure elementwise work.
    m = 2 * nc + 2
    rp = jnp.pad(r, [(0, 0)] * (r.ndim - 1) + [(0, m - n)]) if m != n else r
    pairs = rp.reshape(r.shape[:-1] + (nc + 1, 2))
    a, b = pairs[..., 0], pairs[..., 1]
    out = 0.25 * a[..., :nc] + 0.5 * b[..., :nc] + 0.25 * a[..., 1 : nc + 1]
    if n % 2 == 0:
        gap = 2.0 + beta
        edge = (
            0.25 * a[..., nc - 1]
            + 0.5 * b[..., nc - 1]
            + ((1.0 + beta) / gap * 0.5) * a[..., nc]
            + (beta / gap * 0.5) * b[..., nc]
        )
        out = jnp.concatenate([out[..., : nc - 1], edge[..., None]], axis=-1)
    return out


def _restrict_rows(r: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Same 1-D full-weighting applied along axis -2 (no transpose).

    XProf showed the ``swapaxes`` formulation lowering to per-channel
    async slice+copy chains that dominated the V-cycle (~2.9 ms of a
    7.2 ms cycle at 3x1550x2398); strided slices along the sublane axis
    fuse into the surrounding elementwise work instead.
    """
    n = r.shape[-2]
    nc = (n - 1) // 2
    out = (
        0.25 * r[..., 0 : 2 * nc - 1 : 2, :]
        + 0.5 * r[..., 1 : 2 * nc : 2, :]
        + 0.25 * r[..., 2 : 2 * nc + 1 : 2, :]
    )
    if n % 2 == 0:
        gap = 2.0 + beta
        edge = (
            0.25 * r[..., n - 4, :]
            + 0.5 * r[..., n - 3, :]
            + ((1.0 + beta) / gap * 0.5) * r[..., n - 2, :]
            + (beta / gap * 0.5) * r[..., n - 1, :]
        )
        out = jnp.concatenate([out[..., : nc - 1, :], edge[..., None, :]], axis=-2)
    return out


def restrict_fw(r: jnp.ndarray, bh: float = 1.0, bw: float = 1.0) -> jnp.ndarray:
    """Full-weighting restriction (C, h, w) -> (C, (h-1)//2, (w-1)//2).

    Separable tensor product of the 1-D rows; exactly (1/4) x the transpose
    of prolong_bilinear, including the even-size edge rows.
    """
    return _restrict_rows(_restrict_axis(r, bw), bh)


def _prolong_axis(e: jnp.ndarray, n: int, beta: float = 1.0) -> jnp.ndarray:
    """Bilinear prolongation along the last axis: (..., nc) -> (..., n).

    Scatter-free: even/odd fine lines are interleaved with one
    stack+reshape instead of two strided ``at[].set`` scatters (each of
    which cost a full fine-array pass — 0.81 ms at 3x1550x2398 against a
    ~0.08 ms write roof), and the edge lines are joined by concat.
    """
    nc = e.shape[-1]
    ep = jnp.pad(e, [(0, 0)] * (e.ndim - 1) + [(1, 1)])  # zero Dirichlet pad
    # even fine index 2j holds the average of flanking coarse points,
    # odd fine index 2j+1 coincides with coarse point j
    mids = 0.5 * (ep[..., : nc + 1] + ep[..., 1 : nc + 2])
    pairs = jnp.stack([mids[..., :nc], e], axis=-1).reshape(e.shape[:-1] + (2 * nc,))
    if n % 2 == 1:
        # odd n = 2*nc+1: final even line is mids[nc] (= e[nc-1]/2)
        return jnp.concatenate([pairs, mids[..., nc:]], axis=-1)
    # Even n = 2*nc+2: the last coarse point sits at fine 2*nc-1 = n-3 while
    # the zero boundary sits at fine n — linear interpolation over that 3h gap
    # gives the last two fine lines 2/3 and 1/3 of the last coarse value.
    # (Without this the line n-1 gets no coarse correction and the V-cycle
    # contraction degrades from ~0.1 to smoothing-only ~0.27.)
    gap = 2.0 + beta
    last = e[..., nc - 1 :]
    return jnp.concatenate(
        [pairs[..., : n - 2], last * ((1.0 + beta) / gap), last * (beta / gap)],
        axis=-1,
    )


def _prolong_rows(e: jnp.ndarray, n: int, beta: float = 1.0) -> jnp.ndarray:
    """Bilinear prolongation along axis -2: (..., nc, w) -> (..., n, w).

    Transpose-free for the same reason as _restrict_rows: the row
    interleave is a stack+reshape on the sublane axis, which XLA lowers
    as a cheap layout change instead of per-channel transpose copies.
    """
    nc = e.shape[-2]
    ep = jnp.pad(e, [(0, 0)] * (e.ndim - 2) + [(1, 1), (0, 0)])
    mids = 0.5 * (ep[..., : nc + 1, :] + ep[..., 1 : nc + 2, :])
    pairs = jnp.stack([mids[..., :nc, :], e], axis=-2).reshape(
        e.shape[:-2] + (2 * nc,) + e.shape[-1:]
    )
    if n % 2 == 1:
        return jnp.concatenate([pairs, mids[..., nc:, :]], axis=-2)
    gap = 2.0 + beta
    last = e[..., nc - 1 :, :]
    return jnp.concatenate(
        [pairs[..., : n - 2, :], last * ((1.0 + beta) / gap), last * (beta / gap)],
        axis=-2,
    )


def prolong_bilinear(e: jnp.ndarray, h: int, w: int,
                     bh: float = 1.0, bw: float = 1.0) -> jnp.ndarray:
    """Bilinear prolongation (C, hc, wc) -> (C, h, w), separable.

    Columns first, then rows — the same evaluation order as restrict_fw's
    transpose, keeping the transfer pair bit-exact adjoints.
    """
    return _prolong_rows(_prolong_axis(e, w, bw), h, bh)


def _ops_b(h, w, bh, bw):
    """Neighbor-sum and inverse diagonal of a beta-level operator (XLA path).

    Standard 5-point everywhere except the last row/col: Shortley-Weller
    coefficients for the short boundary gap (up/left-neighbor 2/(1+beta),
    per-axis diagonal -2/beta). beta = 1 reduces to the uniform stencil.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    dh = jnp.where(rows == h - 1, jnp.float32(2.0 / bh), jnp.float32(2.0))
    dw = jnp.where(cols == w - 1, jnp.float32(2.0 / bw), jnp.float32(2.0))
    inv_d = (1.0 / (dh + dw))[None]
    cuh = 2.0 / (1.0 + bh) - 1.0
    cuw = 2.0 / (1.0 + bw) - 1.0
    lrow = (rows == h - 1).astype(jnp.float32)[None] * cuh
    lcol = (cols == w - 1).astype(jnp.float32)[None] * cuw

    def nsum(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
        up_, dn = xp[:, :-2, 1:-1], xp[:, 2:, 1:-1]
        lf, rt = xp[:, 1:-1, :-2], xp[:, 1:-1, 2:]
        return up_ + dn + lf + rt + lrow * up_ + lcol * lf

    return nsum, inv_d


def _sweeps_b(u, g, n, bh, bw):
    """n red-black sweeps of the beta-level operator (small coarse grids)."""
    _, h, w = u.shape
    nsum, inv_d = _ops_b(h, w, bh, bw)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    red = (((rows + cols) % 2) == 0)[None]
    for _ in range(n):
        u = jnp.where(red, (nsum(u) - g) * inv_d, u)
        u = jnp.where(red, u, (nsum(u) - g) * inv_d)
    return u


def _residual_b(u, g, bh, bw):
    """g - A_beta u for the beta-level operator."""
    _, h, w = u.shape
    nsum, inv_d = _ops_b(h, w, bh, bw)
    return g - (nsum(u) - u / inv_d)


def _sweeps(u, g, n, use_pallas=False):
    # The Pallas path fuses the n-sweep burst into one HBM round-trip
    # (~1.7x the XLA sweep on v5e); only worth the launch overhead on
    # fine grids, and only lowers on the TPU backend.
    if (use_pallas and n > 1 and u.shape[-1] * u.shape[-2] >= 1 << 18
            and jax.default_backend() == "tpu"):
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import rb_sweeps_pallas

        return rb_sweeps_pallas(u, g, n)
    for _ in range(n):
        u = redblack_sweep(u, g)
    return u


def _fused_level(h: int, w: int, nu1: int, nu2: int, use_pallas, interpret: bool,
                 fuse_min: int = 1 << 18) -> bool:
    """Whether this level runs as the two fused Pallas stage kernels."""
    if not use_pallas or h * w < fuse_min or nu1 > 2 or nu2 > 4:
        return False
    return interpret or jax.default_backend() == "tpu"


def quarter_path_applies(h: int, w: int, nu1: int = 1, nu2: int = 2,
                         coarsest: int = 63, use_pallas: bool = True) -> bool:
    """Backend-independent gates of the fused quarter-plane branch.

    The single source of truth shared by the solver's padded="q" dispatch
    (which additionally requires the TPU backend or interpret mode) and
    models/pipeline.py's pre-padded-RHS gate (where the backend check is
    implied by mg_post) — so the two cannot drift. Mirrors the solver's
    small-grid floor and _fused_level's size/sweep bounds.
    """
    small = min(h, w) <= coarsest or min((h - 1) // 2, (w - 1) // 2) < 1
    return (not small and nu1 >= 1
            and _fused_level(h, w, nu1, nu2, use_pallas, interpret=True))


def _tol_burst(tol: float, max_cycles: int, nu1: int = 1, nu2: int = 2) -> int:
    """Check-free V-cycles to run before the first residual check (zero start).

    Tolerance mode pays ~0.6 cycle-equivalents per residual check (the
    from_quarters/crop conversion + the 5-point residual pass + the max
    reduce, all serialized by the while_loop) — measured 25.4 ms vs the
    fixed-4 12.6 ms at 3x2798x3798. From a ZERO start the first check is
    pure waste (||r0|| = ||g||) and the next few are predictable: the
    boundary-consistent hierarchy contracts ~0.11-0.12/cycle at every size
    measured (see solve_multigrid's docstring). Assuming a conservative
    0.15/cycle, the first check that can possibly pass is after
    ceil(log tol / log 0.15) cycles; we burst two fewer than that through
    a check-free fori_loop and let the while_loop verify from there, so
    the tolerance contract is untouched even for badly-conditioned RHS.

    The 0.15/cycle model is validated for the default V(1,2)/V(2,2)
    hierarchies only (ADVICE r3). The burst must be a LOWER bound on the
    cycles actually needed (overshooting wastes whole check-free cycles;
    undershooting costs only cheap checks), so for weaker smoothing
    configurations (nu1 + nu2 < 3, contraction unvalidated) the burst is
    halved rather than re-predicted — the tolerance contract is untouched
    either way because the while_loop re-verifies from wherever the burst
    lands.
    """
    import math
    import os

    env = os.environ.get("SCL_MG_BURST")  # absolute override (A/B probe)
    if env is not None:
        return min(int(env), max_cycles)
    if not (0.0 < tol < 0.15):
        return 0
    pred = math.ceil(math.log(tol) / math.log(0.15))
    burst = max(0, min(max_cycles, pred - 2))
    if nu1 + nu2 < 3:
        burst //= 2
    return burst


def _fuse_min_t() -> int:
    """Size gate for vcycle_t's fused levels (trace-time env knob).

    Lower than vcycle/vcycle_p's 1<<18: every sub-gate level eigen-solves
    DIRECTLY (no XLA recursion), and the 8K q-solve XProf showed the
    (473, 348) eigen operands costing 3.5 ms/solve in per-cycle S(1)
    staging copies — one more fused level shrinks them 4x.
    """
    import os

    return int(os.environ.get("SCL_MG_FUSEMIN", str(1 << 16)))


def vcycle(u: jnp.ndarray, g: jnp.ndarray, nu1: int = 2, nu2: int = 2, coarsest: int = 63,
           use_pallas: bool = False, interpret: bool = False,
           bh: float = 1.0, bw: float = 1.0, u_zero: bool = False) -> jnp.ndarray:
    """One V-cycle; recursion unrolls at trace time over static level shapes.

    With ``use_pallas`` each large level runs as TWO fused Pallas launches
    (ops/pallas_kernels.py: mg_down_pallas = sweeps+residual+row-restrict,
    mg_up_pallas = row-prolong+correct+sweeps); only the lane-direction halves
    of the separable transfers remain in XLA, on half-height arrays. This cut
    the measured V(1,2) cycle at 3x1550x2398 from ~3.9 ms (Pallas sweeps, XLA
    transfers) to the fused figure in docs/PERF.md. ``interpret`` runs the
    same fused path through the Pallas interpreter for CPU tests.
    """
    _, h, w = u.shape
    if min(h, w) <= coarsest or min((h - 1) // 2, (w - 1) // 2) < 1:
        # Exact coarse solve: tiny MXU matmuls in the (beta-)eigenbasis beat
        # any amount of smoothing (solvers/dst_gemm.py:solve_sep_eig).
        return solve_sep_eig(g, round(bh, 9), round(bw, 9))
    hc, bh_c = _coarsen(h, bh)
    wc, bw_c = _coarsen(w, bw)
    if _fused_level(h, w, nu1, nu2, use_pallas, interpret):
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
            mg_down_pallas, mg_up_pallas)

        # u_zero: coarse levels always start from zero — the kernel then
        # synthesizes the zero guess in VMEM instead of DMA'ing it
        u, rh = mg_down_pallas(None if u_zero else u, g, nu1, bh=bh, bw=bw,
                               interpret=interpret, u_zero=u_zero)
        rc = 4.0 * _restrict_axis(rh, bw)
        ec = vcycle(jnp.zeros_like(rc), rc, nu1, nu2, coarsest, use_pallas,
                    interpret, bh_c, bw_c, u_zero=True)
        return mg_up_pallas(u, g, _prolong_axis(ec, w, bw), nu2, bh=bh, bw=bw,
                            interpret=interpret)
    if bh == 1.0 and bw == 1.0:
        u = _sweeps(u, g, nu1, use_pallas)
        r = residual(u, g)
    else:
        u = _sweeps_b(u, g, nu1, bh, bw)
        r = _residual_b(u, g, bh, bw)
    rc = 4.0 * restrict_fw(r, bh, bw)
    ec = vcycle(jnp.zeros_like(rc), rc, nu1, nu2, coarsest, use_pallas,
                interpret, bh_c, bw_c)
    u = u + prolong_bilinear(ec, h, w, bh, bw)
    if bh == 1.0 and bw == 1.0:
        return _sweeps(u, g, nu2, use_pallas)
    return _sweeps_b(u, g, nu2, bh, bw)


def _pad_to(x: jnp.ndarray, shape) -> jnp.ndarray:
    return jnp.pad(x, [(0, t - s) for s, t in zip(x.shape, shape)])


def vcycle_p(u_p: jnp.ndarray, g_p: jnp.ndarray, h: int, w: int,
             nu1: int = 1, nu2: int = 2, coarsest: int = 63,
             use_pallas: bool = True, interpret: bool = False,
             bh: float = 1.0, bw: float = 1.0, u_zero: bool = False) -> jnp.ndarray:
    """One V-cycle in ROUNDED space (blocked-ghost Pallas levels).

    u_p/g_p: (C, hp, wp) per ops.pallas_kernels.mg_geometry(h, w), exact
    zeros outside the true (h, w) domain; the output keeps both invariants.
    Levels run as the padded_io fused kernels, which removes the 2-pad +
    2-crop full-array passes that every mg_down/mg_up launch of the plain
    vcycle pays (XLA materializes each as a whole-array copy — ~4 extra
    HBM round-trips per level per cycle; at 3x2798x3798 that is an
    estimated ~1.3 ms of the measured 5.06 ms mg_down, pending a hardware
    A/B). Non-fused levels (small grids) fall back to the exact ``vcycle``
    on the cropped interior.
    """
    from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
        mg_down_pallas, mg_geometry, mg_up_pallas)

    c = u_p.shape[0]
    small = min(h, w) <= coarsest or min((h - 1) // 2, (w - 1) // 2) < 1
    if small or not _fused_level(h, w, nu1, nu2, use_pallas, interpret):
        u = vcycle(u_p[:, :h, :w], g_p[:, :h, :w], nu1, nu2, coarsest,
                   use_pallas, interpret, bh, bw, u_zero=u_zero)
        return _pad_to(u, u_p.shape)
    hc, bh_c = _coarsen(h, bh)
    wc, bw_c = _coarsen(w, bw)
    u_s, rh = mg_down_pallas(None if u_zero else u_p, g_p, nu1, bh=bh, bw=bw,
                             interpret=interpret, blocked=True, padded_io=True,
                             true_hw=(h, w), u_zero=u_zero)
    rc = 4.0 * _restrict_axis(rh[:, :hc, :w], bw)          # (C, hc, wc)
    _, hpc, wpc = mg_geometry(hc, wc)
    ec_p = vcycle_p(jnp.zeros((c, hpc, wpc), u_p.dtype), _pad_to(rc, (c, hpc, wpc)),
                    hc, wc, nu1, nu2, coarsest, use_pallas, interpret, bh_c, bw_c,
                    u_zero=True)
    e_lane = _prolong_axis(ec_p[:, :hc, :wc], w, bw)       # (C, hc, w)
    e_lane_p = _pad_to(e_lane, (c, u_p.shape[1] // 2, u_p.shape[2]))
    return mg_up_pallas(u_s, g_p, e_lane_p, nu2, bh=bh, bw=bw,
                        interpret=interpret, blocked=True, padded_io=True,
                        true_hw=(h, w))


def vcycle_t(u_p: jnp.ndarray, g_p: jnp.ndarray, h: int, w: int,
             nu1: int = 1, nu2: int = 2, coarsest: int = 63,
             interpret: bool = False, bh: float = 1.0, bw: float = 1.0,
             u_zero: bool = False,
             geom: tuple[int, int, int, int] | None = None) -> jnp.ndarray:
    """One V-cycle in ALTERNATING-ORIENTATION rounded space.

    The transpose-fused chain: each level transition is exactly two
    roofline Pallas passes — mg_restrict_t_pallas emits the x4 coarse RHS
    TRANSPOSED (lane restriction becomes a sublane op after an in-VMEM
    transpose), and the coarse level solves the transposed system (the
    operator is symmetric under transpose with bh/bw swapped), so
    mg_prolong_t_pallas's inverse transpose lands the correction back in
    natural orientation. This removes ALL the XLA lane-direction transfer
    glue of vcycle_p (~7 ms/solve of T(2,128) reshape relayouts + layout
    copies at 3x2798x3798 — tools/tpu_queue.md §2, the round-2 XProf
    breakdown of the 8K gap).

    u_p/g_p: (C, hp, wp) per mg_geometry_t(h, w), exact zeros outside the
    true (h, w) domain; geom carries (th, hp, wp, hp2) for this level (lane
    extents are inherited downward: the coarse level's wp IS this level's
    hp2, so the transposed transfers read/write whole blocks).
    """
    from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
        mg_down_pallas, mg_geometry_t, mg_prolong_t_pallas,
        mg_restrict_t_pallas, mg_up_pallas)

    c = g_p.shape[0]
    th, hp, wp, hp2 = geom if geom is not None else mg_geometry_t(h, w)
    small = min(h, w) <= coarsest or min((h - 1) // 2, (w - 1) // 2) < 1
    if small or not _fused_level(h, w, nu1, nu2, True, interpret,
                                 fuse_min=_fuse_min_t()):
        # Any level below the fused-kernel gate solves EXACTLY in the
        # separable eigenbasis (a few MXU GEMMs, <= ~0.3 GFLOP at the
        # 512^2-area gate) instead of recursing through XLA sweep levels:
        # the 8K XProf showed the sub-fused tail costing ~1.3 ms/solve in
        # tiny-op staging copies (90 us S(1) round-trips for 13 KB eigen
        # operands) while an exact coarse solve strictly improves the
        # cycle's contraction. Levels below the fine one always enter with
        # a zero guess, so the direct solve replaces the correction fully
        # (the fine level never lands here: solve_multigrid only selects
        # the 't' branch when the fine level passes the same gate).
        if u_zero:
            u = solve_sep_eig(g_p[:, :h, :w], round(bh, 9), round(bw, 9))
        else:
            u = vcycle(u_p[:, :h, :w], g_p[:, :h, :w], nu1, nu2, coarsest,
                       True, interpret, bh, bw, u_zero=False)
        return _pad_to(u, u_p.shape)
    hc, bh_c = _coarsen(h, bh)
    wc, bw_c = _coarsen(w, bw)
    u_s, rh = mg_down_pallas(None if u_zero else u_p, g_p, nu1, bh=bh, bw=bw,
                             interpret=interpret, blocked=True, padded_io=True,
                             true_hw=(h, w), u_zero=u_zero, geom=(th, hp, wp),
                             rh_rows=hp2)
    # child level: logical (wc, hc) in TRANSPOSED orientation; its lane
    # extent inherits hp2 (>= round_up(hc, 128) always), betas swap
    cgeom = mg_geometry_t(wc, hc, wp_min=hp2)
    cth, chp, cwp, chp2 = cgeom
    rc_t = mg_restrict_t_pallas(rh, h, w, bw, out_rows=chp, interpret=interpret)
    ec_t = vcycle_t(jnp.zeros((c, chp, cwp), g_p.dtype), rc_t, wc, hc,
                    nu1, nu2, coarsest, interpret, bw_c, bh_c, u_zero=True,
                    geom=cgeom)
    e_lane = mg_prolong_t_pallas(ec_t, h, w, bw, out_rows=hp2, wp=wp,
                                 interpret=interpret)
    return mg_up_pallas(u_s, g_p, e_lane, nu2, bh=bh, bw=bw,
                        interpret=interpret, blocked=True, padded_io=True,
                        true_hw=(h, w), geom=(th, hp, wp))


def vcycle_q(uq: jnp.ndarray | None, gq: jnp.ndarray, h: int, w: int,
             nu1: int = 1, nu2: int = 2, coarsest: int = 63,
             interpret: bool = False, u_zero: bool = False,
             geom=None, with_residual: bool = False) -> jnp.ndarray:
    """One V-cycle with the FINEST level in quarter-plane form.

    uq/gq: (C, 4, hq, wq2) stacked (row-parity x col-parity) planes
    (ops/pallas_mg_quarter.py) — each half-sweep computes only its color's
    two quarter planes (~2.5x less VPU than the dense select form, which
    is the fine kernels' binding constraint). The coarse levels run the
    dense alternating-orientation chain (vcycle_t); the transposed
    transfer kernels consume/produce the split planes directly, so no
    lane interleave exists anywhere between the one XLA to_quarters /
    from_quarters pair at the solve boundary. Finest-level betas are
    always 1, which is all the quarter kernels support.
    """
    from seamlesscloneoptimization_tpu.ops.pallas_kernels import mg_geometry_t
    from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import (
        mg_down_q_pallas, mg_geometry_q, mg_prolong_tq_pallas,
        mg_restrict_tq_pallas, mg_up_q_pallas)

    c = gq.shape[0]
    th, hq, wq2, hp2 = geom if geom is not None else mg_geometry_q(h, w)
    hc, bh_c = _coarsen(h, 1.0)
    wc, bw_c = _coarsen(w, 1.0)
    u_s, rh_e, rh_o = mg_down_q_pallas(uq, gq, nu1, (h, w), (th, hq, wq2, hp2),
                                       u_zero=u_zero, interpret=interpret)
    cgeom = mg_geometry_t(wc, hc, wp_min=hp2)
    cth, chp, cwp, chp2 = cgeom
    rc_t = mg_restrict_tq_pallas(rh_e, rh_o, h, w, 1.0, out_rows=chp,
                                 out_lanes=hp2, interpret=interpret)
    ec_t = vcycle_t(jnp.zeros((c, chp, cwp), gq.dtype), rc_t, wc, hc,
                    nu1, nu2, coarsest, interpret, bw_c, bh_c, u_zero=True,
                    geom=cgeom)
    e_e, e_o = mg_prolong_tq_pallas(ec_t, h, w, 1.0, out_rows=hp2, wq2=wq2,
                                    interpret=interpret)
    return mg_up_q_pallas(u_s, gq, e_e, e_o, nu2, (h, w), (th, hq, wq2, hp2),
                          interpret=interpret, with_residual=with_residual)


def _coarse_q(rh_e, rh_o, h, w, nu1, nu2, coarsest, interpret, geom):
    """The coarse side of one quarter V-cycle: transposed x4 lane-restrict
    of the split residual planes -> dense vcycle_t on the transposed coarse
    system -> split-plane lane-prolongation back. Factored out of vcycle_q
    so the fused cycle-boundary launch (mg_ud_q_pallas) can interleave with
    it in the fixed-cycles/burst pipelines."""
    from seamlesscloneoptimization_tpu.ops.pallas_kernels import mg_geometry_t
    from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import (
        mg_prolong_tq_pallas, mg_restrict_tq_pallas)

    th, hq, wq2, hp2 = geom
    c = rh_e.shape[0]
    hc, bh_c = _coarsen(h, 1.0)
    wc, bw_c = _coarsen(w, 1.0)
    cgeom = mg_geometry_t(wc, hc, wp_min=hp2)
    cth, chp, cwp, chp2 = cgeom
    rc_t = mg_restrict_tq_pallas(rh_e, rh_o, h, w, 1.0, out_rows=chp,
                                 out_lanes=hp2, interpret=interpret)
    ec_t = vcycle_t(jnp.zeros((c, chp, cwp), rc_t.dtype), rc_t, wc, hc,
                    nu1, nu2, coarsest, interpret, bw_c, bh_c, u_zero=True,
                    geom=cgeom)
    return mg_prolong_tq_pallas(ec_t, h, w, 1.0, out_rows=hp2, wq2=wq2,
                                interpret=interpret)


def _coarse_from_rct(rc_t, h, w, nu1, nu2, coarsest, interpret, geom, cgeom):
    """Coarse solve + split-plane prolongation from an ALREADY-restricted
    transposed coarse RHS (the fused-restrict kernels' rc_t output).

    SCL_MG_COARSE_NU="n1,n2" overrides the coarse V-cycle's sweep counts —
    a measurement probe ONLY (changes accuracy): if halving the coarse
    work does not move the serve time, the coarse solve is hidden under
    the fine-level DMA and quarter-izing it buys nothing (tpu_queue §5).
    """
    import os

    from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import (
        mg_prolong_tq_pallas)

    th, hq, wq2, hp2 = geom
    hc, bh_c = _coarsen(h, 1.0)
    wc, bw_c = _coarsen(w, 1.0)
    env = os.environ.get("SCL_MG_COARSE_NU")
    cn1, cn2 = (int(x) for x in env.split(",")) if env else (nu1, nu2)
    ec_t = vcycle_t(jnp.zeros_like(rc_t), rc_t, wc, hc, cn1, cn2, coarsest,
                    interpret, bw_c, bh_c, u_zero=True, geom=cgeom)
    return mg_prolong_tq_pallas(ec_t, h, w, 1.0, out_rows=hp2, wq2=wq2,
                                interpret=interpret)


def _cycle_chain(body, st, n: int):
    """Run ``n`` check-free V-cycle boundaries: unrolled straight-line
    calls for small static n, fori_loop past that.

    A ``fori_loop`` carrying the (C, 4, hq, wq2) quarter planes pays a
    full-array XLA copy per iteration (~0.4 ms for the 129 MB 8K carry —
    the while/fori slot cannot be read and written by the same unaliased
    custom call, xprof `copy.32`); straight-line repetitions let buffer
    assignment chain the pallas outputs copy-free. The unroll bound keeps
    the duplicated coarse-chain HLO (compile time) within reason — burst
    and fixed-cycle counts are <= ~6 in practice, far below it.
    Bit-identical either way (same ops in the same order).
    """
    if n <= 8:
        for i in range(n):
            st = body(i, st)
        return st
    return jax.lax.fori_loop(0, n, body, st)


def _q_rct_setup(h, w, nu1, nu2, coarsest, interpret, qgeom):
    """(rct_rows | None, cgeom, coarse_fn) for the fused-restrict quarter
    geometry; rct is None when the strip height can't own whole lane blocks
    of the transposed coarse RHS (callers fall back to split rh planes)."""
    from seamlesscloneoptimization_tpu.ops.pallas_kernels import mg_geometry_t

    th, hq, wq2, hp2 = qgeom
    hc, _bh_c = _coarsen(h, 1.0)
    wc, _bw_c = _coarsen(w, 1.0)
    cgeom = mg_geometry_t(wc, hc, wp_min=hp2)
    if not (th % 128 == 0 and hp2 == hq and cgeom[2] == hp2):
        return None, cgeom, None

    def coarse(rc_t):
        return _coarse_from_rct(rc_t, h, w, nu1, nu2, coarsest, interpret,
                                qgeom, cgeom)

    return cgeom[1], cgeom, coarse  # cgeom[1] = chp: rc_t row extent


def _solve_q_tol_fused(g_q, uq0, burst, h, w, nu1, nu2, coarsest, interpret,
                       qgeom, thresh, max_cycles):
    """Tolerance-mode quarter solve where EVERY cycle boundary is fused.

    The round-4 tol loop ran its checked cycles as separate down+up
    launches (two fine-level passes each) around a residual decision; this
    one keeps the fused ``mg_ud_q_pallas`` boundary throughout and reads
    the residual of the launch's OUTPUT state from its descent half (free
    — the same red-cell ree/roo the restriction consumes), so a checked
    cycle costs the same fine-level DMA as a check-free one. Structure:

        down0 -> (burst-1) x [coarse -> ud] -> [coarse -> ud+check] while
        the check fails (up of cycle k, then descent smoothing of k+1)

    The loop exits on a state that has ALREADY received the next descent's
    nu1 sweeps — strictly more converged than the checked contract
    requires; ``it`` counts completed ascents like the round-4 loop.
    Requires the fused-restrict geometry (caller checks) and burst >= 1.
    Returns (uq, rmax, it).
    """
    from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import (
        mg_down_q_pallas, mg_ud_q_pallas)

    rct, _cgeom, coarse = _q_rct_setup(h, w, nu1, nu2, coarsest, interpret,
                                       qgeom)
    assert rct is not None and burst >= 1
    u_s, rc_t = mg_down_q_pallas(uq0, g_q, nu1, (h, w), qgeom,
                                 u_zero=uq0 is None, interpret=interpret,
                                 rct_rows=rct)

    def free_body(_, st):
        u_s, rc_t = st
        e_e, e_o = coarse(rc_t)
        return mg_ud_q_pallas(u_s, g_q, e_e, e_o, nu2, nu1, (h, w), qgeom,
                              interpret=interpret, rct_rows=rct)

    u_s, rc_t = _cycle_chain(free_body, (u_s, rc_t), burst - 1)

    def checked_body(st):
        u_s, rc_t, _, it = st
        e_e, e_o = coarse(rc_t)
        u_s, rc_t, rmax = mg_ud_q_pallas(u_s, g_q, e_e, e_o, nu2, nu1,
                                         (h, w), qgeom, interpret=interpret,
                                         rct_rows=rct, with_residual=True)
        return u_s, rc_t, rmax, it + 1

    st = checked_body((u_s, rc_t, jnp.float32(0.0), jnp.int32(burst - 1)))
    st = jax.lax.while_loop(
        lambda s: (s[2] > thresh) & (s[3] < max_cycles), checked_body, st)
    return st[0], st[2], st[3]


def _solve_q_fused(g_q, uq0, cycles, h, w, nu1, nu2, coarsest, interpret,
                   qgeom, with_final_residual=False):
    """``cycles`` quarter V-cycles with FUSED cycle boundaries.

    down -> (cycles-1) x [coarse -> fused up+down] -> coarse -> final up.
    Bit-equal to the vcycle_q fori_loop (mg_ud_q_pallas's docstring has the
    staleness argument) but each cycle boundary is ONE launch instead of an
    up and a down — saving a full fine-level u write + read + g read per
    cycle, the dominant HBM cost at 8K. When the strip height owns whole
    lane blocks (th % 128 == 0, the default geometry), the transposed x4
    lane-restriction ALSO fuses into the descent/boundary kernels
    (rct_rows): the split rh planes never touch HBM and the separate
    restrict launch disappears. uq0 None = zero start (the descent
    synthesizes its carry in VMEM). Returns the swept quarter planes, plus
    the fused red-cell residual max of the final ascent when
    ``with_final_residual`` (the tol-mode burst consumer).
    """
    from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import (
        mg_down_q_pallas, mg_ud_q_pallas, mg_up_q_pallas)

    th, hq, wq2, hp2 = qgeom
    rct, cgeom, coarse = _q_rct_setup(h, w, nu1, nu2, coarsest, interpret,
                                      qgeom)
    if rct is not None:
        u_s, rc_t = mg_down_q_pallas(uq0, g_q, nu1, (h, w), qgeom,
                                     u_zero=uq0 is None, interpret=interpret,
                                     rct_rows=rct)

        def body(_, st):
            u_s, rc_t = st
            e_e, e_o = coarse(rc_t)
            return mg_ud_q_pallas(u_s, g_q, e_e, e_o, nu2, nu1, (h, w),
                                  qgeom, interpret=interpret, rct_rows=rct)

        u_s, rc_t = _cycle_chain(body, (u_s, rc_t), cycles - 1)
        e_e, e_o = coarse(rc_t)
        return mg_up_q_pallas(u_s, g_q, e_e, e_o, nu2, (h, w), qgeom,
                              interpret=interpret,
                              with_residual=with_final_residual)

    st = mg_down_q_pallas(uq0, g_q, nu1, (h, w), qgeom,
                          u_zero=uq0 is None, interpret=interpret)

    def body(_, st):
        u_s, rh_e, rh_o = st
        e_e, e_o = _coarse_q(rh_e, rh_o, h, w, nu1, nu2, coarsest,
                             interpret, qgeom)
        return mg_ud_q_pallas(u_s, g_q, e_e, e_o, nu2, nu1, (h, w), qgeom,
                              interpret=interpret)

    u_s, rh_e, rh_o = jax.lax.fori_loop(0, cycles - 1, body, st)
    e_e, e_o = _coarse_q(rh_e, rh_o, h, w, nu1, nu2, coarsest, interpret,
                         qgeom)
    return mg_up_q_pallas(u_s, g_q, e_e, e_o, nu2, (h, w), qgeom,
                          interpret=interpret,
                          with_residual=with_final_residual)


def fmg(g: jnp.ndarray, nu1: int = 2, nu2: int = 2, coarsest: int = 63,
        use_pallas: bool = False, interpret: bool = False,
        bh: float = 1.0, bw: float = 1.0) -> jnp.ndarray:
    """Full multigrid: coarse-to-fine cascade giving a near-converged start.

    Restrict the RHS down the hierarchy (same 4x scaling as the residual
    equation), solve the coarsest level exactly, then prolong the solution up
    one level at a time, polishing each with one V-cycle. One FMG pass lands
    within ~discretization accuracy, so the main solve needs only a cycle or
    two of polish — the standard O(N) Poisson recipe, and ~3x fewer fine-grid
    sweeps than V-cycling from a zero guess.
    """
    _, h, w = g.shape
    if min(h, w) <= coarsest or min((h - 1) // 2, (w - 1) // 2) < 1:
        return solve_sep_eig(g, round(bh, 9), round(bw, 9))
    hc, bh_c = _coarsen(h, bh)
    wc, bw_c = _coarsen(w, bw)
    gc = 4.0 * restrict_fw(g, bh, bw)
    uc = fmg(gc, nu1, nu2, coarsest, use_pallas, interpret, bh_c, bw_c)
    u = prolong_bilinear(uc, h, w, bh, bw)
    return vcycle(u, g, nu1, nu2, coarsest, use_pallas, interpret, bh, bw)


def solve_multigrid(g, u0=None, tol: float = 1e-4, **kwargs):
    """Validating front door for :func:`_solve_multigrid_jit` (same contract).

    ``tol`` is trace-time STATIC (it sizes the check-free burst, see
    _tol_burst), so it must be a real Python/NumPy scalar — a traced value
    would otherwise surface as JAX's generic unhashable-static error
    (ADVICE r3). Each distinct tol compiles its own executable; for a dense
    tol sweep use fixed ``cycles`` instead.
    """
    if hasattr(tol, "dtype") and getattr(tol, "shape", None) != ():
        raise TypeError(f"tol must be a scalar, got array of shape {tol.shape}")
    try:
        tol = float(tol)
    except TypeError as e:  # jax tracer (jitted-over tol) or other non-scalar
        raise TypeError(
            "solve_multigrid tol is trace-time static: pass a Python float, "
            "not a traced value (jit over `cycles` sweeps instead; see the "
            "docstring)") from e
    if kwargs.get("true_hw") is not None:  # static argname: must be hashable
        kwargs["true_hw"] = tuple(int(x) for x in kwargs["true_hw"])
    return _solve_multigrid_jit(g, u0, tol=tol, **kwargs)


@partial(jax.jit, static_argnames=("tol", "max_cycles", "nu1", "nu2",
                                   "return_info", "use_pallas", "cycles",
                                   "pcg", "interpret", "coarsest",
                                   "fmg_start", "padded", "padded_output",
                                   "true_hw"))
def _solve_multigrid_jit(
    g: jnp.ndarray,
    u0: jnp.ndarray | None = None,
    tol: float = 1e-4,
    max_cycles: int = 60,
    nu1: int = 1,
    nu2: int = 2,
    return_info: bool = False,
    use_pallas: bool = False,
    cycles: int | None = None,
    pcg: bool = False,
    interpret: bool = False,
    coarsest: int = 63,
    fmg_start: bool = False,
    padded: bool | str = "q",  # the measured-fast default (CloneConfig's
    # mg_padded): quarter-plane finest level + transpose-fused coarse chain.
    # Self-gating — when the quarter gate fails (off-TPU, small grids,
    # nu1 < 1 or oversized nu) the truthy ``padded`` falls to the
    # rounded-space vcycle_p branch, and off-TPU _fused_level gates that
    # off too, landing on the element-mode path — so a bare
    # solve_multigrid() call gets the fastest applicable chain everywhere
    # (the imp.h:15 best-path-as-default rule).
    padded_output: bool = False,
    true_hw: tuple[int, int] | None = None,
):
    """V-cycle iteration until ||r||_inf <= tol * ||g||_inf.

    The boundary-consistent (Shortley-Weller) coarse hierarchy gives the
    V-cycle textbook ~0.11/cycle contraction at EVERY size (see _coarsen;
    before it, even-sized grids like 1550x2398 degraded to 0.52/cycle and
    needed an MG-preconditioned-CG wrapper to converge usefully). From a
    zero start, tol=2e-4 takes 4 cycles at any size tried (256^2 ..
    1550x2398) — measured 13.8 ms at 3x1550x2398 on v5e with the fused
    Pallas levels.

    Starts (cheapest first, measured at 3x1550x2398, tol=2e-4, v5e):
    - zero start (default): 4 cycles, 13.8 ms — the V-cycle kills the
      whole spectrum fast enough that a better start cannot pay for itself.
    - ``fmg_start=True``: FMG cascade costs ~1.33 cycle-equivalents and
      saves exactly one cycle (3 remain): 16.1 ms.
    - ``pcg=True``: flexible-CG wrapped V-cycle preconditioner; same cycle
      count as plain at higher per-iteration cost (operator apply + dots).
      Kept for ill-conditioned RHS and as a cross-check.

    Default cycle shape is V(1,2): same cycle counts as V(2,2) at 25%
    fewer sweeps.

    ``cycles=k`` switches to FIXED-WORK mode: k unrolled cycles, no
    residual checks or while_loop — 11.2 ms for k=4 at 3x1550x2398
    (verified rel. residual 1.1e-4 there; use for serving where the cycle
    count for a target quality is known). ``tol`` is ignored then.

    ``tol`` is trace-time STATIC (it sizes the check-free burst, see
    _tol_burst): pass a Python float — a traced tol raises, and each
    distinct tol compiles its own executable. Every in-repo caller passes
    a config constant; for a dense tol sweep use fixed ``cycles`` instead.

    ``padded_output=True`` skips the final crop of the rounded-space modes
    and returns the solver's internal padded array (exact zeros outside
    the true (h, w) domain — the Pallas serve tail feeds it straight into
    the guarded clamp+cast, saving a crop + re-pad pass; VERDICT r3
    missing #3). ``padded_output="quarters"`` goes further on the
    padded="q" branches: the (C, 4, HQ, WQ) checkerboard carry is returned
    AS IS (clamp_cast_guarded_quarters_pallas interleaves it in VMEM), so
    the from_quarters pass disappears too; branches without a quarters
    carry degrade to their dense padded/exact-size result — callers
    dispatch on ndim. Non-padded branches return the exact-size solution
    (the caller pads). Exclusive with ``return_info``.

    ``true_hw=(h, w)`` declares ``g`` PRE-PADDED to the quarter geometry's
    footprint: either the dense (C, 2HQ, 2WQ) slab
    (preprocess_rhs_padded_pallas — interior RHS at the origin, exact
    zeros outside) or the born-quartered (C, 4, HQ, WQ) form
    (preprocess_rhs_quarters_pallas). The quarter branches consume either
    with no conversion/pad passes; every other use sees the true-size
    dense view. Requires ``padded="q"``; branches that cannot run fused
    (small grids, non-TPU) degrade to that view.
    """
    if padded_output and return_info:
        raise ValueError("padded_output is exclusive with return_info")
    g_prepad = None
    g_prequarters = None
    if true_hw is not None:
        if padded != "q":
            raise ValueError("true_hw (pre-padded g) requires padded='q'")
        from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import (
            from_quarters, mg_geometry_q)

        _, hq_c, wq2_c, _ = mg_geometry_q(*true_hw)
        if g.ndim == 4:
            # g born as checkerboard quarters (preprocess_rhs_quarters_pallas):
            # the fused branches consume it with ZERO conversion passes; the
            # XLA from_quarters below is traced only for the non-fused
            # fallback (small grids / non-TPU) and is dead code otherwise.
            if g.shape[1:] != (4, hq_c, wq2_c):
                raise ValueError(
                    f"pre-quartered g {g.shape} does not match the quarter "
                    f"geometry {(4, hq_c, wq2_c)} for true_hw={true_hw}")
            if u0 is not None or fmg_start or pcg or return_info:
                raise ValueError(
                    "quartered g supports only the zero-start padded='q' "
                    "modes (no u0/fmg_start/pcg/return_info)")
            g_prequarters = g
            g = from_quarters(g)[:, : true_hw[0], : true_hw[1]]
        else:
            if g.shape[1:] != (2 * hq_c, 2 * wq2_c):
                raise ValueError(
                    f"pre-padded g {g.shape} does not match the quarter-geometry "
                    f"footprint {(2 * hq_c, 2 * wq2_c)} for true_hw={true_hw}")
            g_prepad, g = g, g[:, : true_hw[0], : true_hw[1]]

    def _quartered_g(c, hq, wq2, interpret):
        """The (C, 4, HQ, WQ) RHS for the fused quarter branches: born
        quartered > pre-padded > pad-and-split (shared by the cycles and
        tolerance dispatches below)."""
        if g_prequarters is not None:
            return g_prequarters  # born quartered: zero conversion passes
        from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import (
            to_quarters_pallas)

        return to_quarters_pallas(
            g_prepad if g_prepad is not None
            else _pad_to(g, (c, 2 * hq, 2 * wq2)),
            interpret=interpret)

    if u0 is not None:
        u = u0
    elif fmg_start:
        u = fmg(g, nu1, nu2, coarsest, use_pallas=use_pallas, interpret=interpret)
    else:
        u = jnp.zeros_like(g)
    if cycles is not None:
        # fori_loop, not an unrolled chain: the V-cycle body is traced ONCE,
        # which cuts the program (and the minutes-long tunnel compile of the
        # unrolled hierarchy) by ~cycles x at identical arithmetic
        c, h, w = g.shape
        # degenerate/small finest level: the plain-vcycle branch solves it
        # exactly (direct eigenbasis); the fused paths assume a real
        # hierarchy (vcycle_q has no small branch) and nu1 >= 1 (the
        # quarter descent's red-cell residual identity)
        small = min(h, w) <= coarsest or min((h - 1) // 2, (w - 1) // 2) < 1
        if (padded == "q" and quarter_path_applies(h, w, nu1, nu2, coarsest,
                                                   use_pallas)
                and _fused_level(h, w, nu1, nu2, use_pallas, interpret)):
            # quarter-plane finest level (vcycle_q): dense <-> quarters
            # conversion once per solve, carry stays split across cycles
            from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import (
                from_quarters_pallas, mg_geometry_q, to_quarters_pallas)

            qgeom = mg_geometry_q(h, w)
            _, hq, wq2, _ = qgeom
            # Pallas conversions: XLA's generic lowering of the 5D parity
            # reshapes measured 81 of 93 ms/solve at 8K (xprof 2026-08-20)
            g_q = _quartered_g(c, hq, wq2, interpret)
            from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import _MQ

            if cycles >= 1 and nu1 + nu2 + 2 <= _MQ:
                # fused cycle boundaries (mg_ud_q_pallas): one launch per
                # boundary instead of up + down; zero starts synthesize the
                # carry in VMEM (no 0-array read)
                uq0 = (None if (u0 is None and not fmg_start) else
                       to_quarters_pallas(_pad_to(u, (c, 2 * hq, 2 * wq2)),
                                          interpret=interpret))
                uq = _solve_q_fused(g_q, uq0, cycles, h, w, nu1, nu2,
                                    coarsest, interpret, qgeom)
            else:
                if u0 is None and not fmg_start:
                    uq0 = jnp.zeros((c, 4, hq, wq2), g.dtype)
                else:
                    uq0 = to_quarters_pallas(_pad_to(u, (c, 2 * hq, 2 * wq2)),
                                             interpret=interpret)
                uq = jax.lax.fori_loop(
                    0, cycles,
                    lambda _, x: vcycle_q(x, g_q, h, w, nu1, nu2, coarsest,
                                          interpret=interpret, geom=qgeom),
                    uq0)
            if padded_output == "quarters":
                return uq  # serve tail consumes the checkerboard directly
            u = from_quarters_pallas(uq, interpret=interpret)
            if not padded_output:
                u = u[:, :h, :w]
        elif (padded == "t" and not small
              and _fused_level(h, w, nu1, nu2, use_pallas, interpret)):
            # alternating-orientation rounded space (vcycle_t): the level
            # transfers run entirely as transpose-fused Pallas passes
            from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
                mg_geometry_t)

            geom = mg_geometry_t(h, w)
            _, hp, wp, _ = geom
            g_p = _pad_to(g, (c, hp, wp))
            u = jax.lax.fori_loop(
                0, cycles,
                lambda _, x: vcycle_t(x, g_p, h, w, nu1, nu2, coarsest,
                                      interpret=interpret, geom=geom),
                _pad_to(u, (c, hp, wp)))
            if not padded_output:
                u = u[:, :h, :w]
        elif (padded and not small
              and _fused_level(h, w, nu1, nu2, use_pallas, interpret)):
            # rounded-space iteration: ONE pad in, ONE crop out for the
            # whole solve (see vcycle_p) instead of per-launch pad/crop
            from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
                mg_geometry)

            _, hp, wp = mg_geometry(h, w)
            g_p = _pad_to(g, (c, hp, wp))
            u = jax.lax.fori_loop(
                0, cycles,
                lambda _, x: vcycle_p(x, g_p, h, w, nu1, nu2, coarsest,
                                      use_pallas=use_pallas, interpret=interpret),
                _pad_to(u, (c, hp, wp)))
            if not padded_output:
                u = u[:, :h, :w]
        else:
            u = jax.lax.fori_loop(
                0, cycles,
                lambda _, x: vcycle(x, g, nu1, nu2, coarsest,
                                    use_pallas=use_pallas, interpret=interpret),
                u)
        if return_info:
            return u, {"cycles": jnp.int32(cycles),
                       "residual": jnp.max(jnp.abs(residual(u, g)))}
        return u
    # norm over the born-quartered form when present: |g| is invariant
    # under the parity permutation + zero padding, and reading the dense
    # view would materialize the (fallback-only) XLA conversion
    g_norm_src = g_prequarters if g_prequarters is not None else g
    gnorm = jnp.maximum(jnp.max(jnp.abs(g_norm_src)), 1e-30)
    # Zero start: the first _tol_burst(tol) cycles run check-free (see its
    # docstring); the while_loop then verifies the tolerance from there.
    burst = (0 if (u0 is not None or fmg_start or pcg)
             else _tol_burst(tol, max_cycles, nu1, nu2))

    if pcg:
        def apply_A(p):
            pp = jnp.pad(p, ((0, 0), (1, 1), (1, 1)))
            return (pp[:, :-2, 1:-1] + pp[:, 2:, 1:-1]
                    + pp[:, 1:-1, :-2] + pp[:, 1:-1, 2:]) - 4.0 * p

        def precond(r):
            return vcycle(jnp.zeros_like(r), r, nu1, nu2, coarsest,
                          use_pallas=use_pallas, interpret=interpret)

        r0 = residual(u, g)
        z0 = precond(r0)
        state0 = (u, r0, z0, jnp.vdot(r0, z0), jnp.int32(0))

        def cond(state):
            _, r, _, _, it = state
            return (jnp.max(jnp.abs(r)) > tol * gnorm) & (it < max_cycles)

        def body(state):
            u, r, p, rz, it = state
            Ap = apply_A(p)
            alpha = rz / jnp.vdot(p, Ap)
            u = u + alpha * p
            r = r - alpha * Ap
            z = precond(r)
            rz_new = jnp.vdot(r, z)
            p = z + (rz_new / rz) * p  # flexible CG: V-cycle is not symmetric
            return u, r, p, rz_new, it + 1

        u, r, _, _, it = jax.lax.while_loop(cond, body, state0)
        if return_info:
            return u, {"cycles": it, "residual": jnp.max(jnp.abs(r))}
        return u

    c, h, w = g.shape
    # Degenerate/small finest level: one vcycle solves it EXACTLY via the
    # direct eigenbasis branch — skip the fused padded/quarter machinery
    # (vcycle_q has no small branch; vcycle_p's pad would be pure waste)
    # and never burst more than that one exact cycle.
    small = min(h, w) <= coarsest or min((h - 1) // 2, (w - 1) // 2) < 1
    if small:
        burst = min(burst, 1)
    if (padded == "q" and quarter_path_applies(h, w, nu1, nu2, coarsest,
                                               use_pallas)
            and _fused_level(h, w, nu1, nu2, use_pallas, interpret)):
        from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import (
            from_quarters_pallas, mg_geometry_q, to_quarters_pallas)

        qgeom = mg_geometry_q(h, w)
        _, hq, wq2, _ = qgeom
        g_q = _quartered_g(c, hq, wq2, interpret)

        # The check is FUSED into the ascent kernel (mg_up_q_pallas
        # with_residual): red-cell residual max computed in-VMEM during the
        # last sweep's pass, so a checked cycle costs the same DMA as a
        # check-free one (the dense conversion + residual pass it replaces
        # cost ~0.6 cycle-equivalents). The threshold is shaved so that a
        # passing FUSED check implies the DENSE residual (what return_info
        # reports) also meets tol: 0.5% covers the relative f32-association
        # drift at practical tolerances, and the 4e-7 absolute floor covers
        # cancellation noise (~eps * ||g||) when tol itself approaches the
        # f32 noise floor (ADVICE r3). For tol <= 4e-7 the shaved threshold
        # is <= 0 and the loop runs to max_cycles — the honest outcome of
        # demanding a below-noise f32 tolerance.
        thresh = gnorm * min(tol * 0.995, tol - 4.0e-7)

        def cond_q(state):
            _, rmax, it = state
            return (rmax > thresh) & (it < max_cycles)

        def body_q(state):
            uq, _, it = state
            uq, rmax = vcycle_q(uq, g_q, h, w, nu1, nu2, coarsest,
                                interpret=interpret, geom=qgeom,
                                with_residual=True)
            return uq, rmax, it + 1

        zero0 = u0 is None and not fmg_start
        if zero0:  # zero guess: skip a conversion
            uq0 = jnp.zeros((c, 4, hq, wq2), g.dtype)
            rmax0 = jnp.max(jnp.abs(g_norm_src))  # residual of the zero guess
        else:
            uq0 = to_quarters_pallas(_pad_to(u, (c, 2 * hq, 2 * wq2)),
                                     interpret=interpret)
            rmax0 = jnp.max(jnp.abs(residual(u, g)))
        from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import _MQ

        import os as _os

        rct_ok = _q_rct_setup(h, w, nu1, nu2, coarsest, interpret,
                              qgeom)[0] is not None
        # burst >= 1 gate: the fused loop always runs at least one cycle,
        # so burst == 0 (SCL_MG_BURST=0 probe / near-0.15 tolerances, where
        # an already-converged warm start must exit after the free rmax0
        # check) keeps the check-first fallback loop below.
        if (rct_ok and nu1 + nu2 + 2 <= _MQ and max_cycles >= 1 and burst >= 1
                and _os.environ.get("SCL_MG_TOLFUSED", "1") == "1"):
            # round-5 fused tol loop: EVERY cycle boundary (checked or not)
            # is one mg_ud_q_pallas launch; the check reads the launch's
            # own descent-half residual. vs the round-4 structure
            # (fused burst + down/up-per-checked-cycle) this removes one
            # full fine-level pass per checked cycle AND the separate
            # burst-ending ascent (_solve_q_tol_fused docstring).
            uq, _, it = _solve_q_tol_fused(
                g_q, None if zero0 else uq0, burst, h, w, nu1, nu2,
                coarsest, interpret, qgeom, thresh, max_cycles)
        else:
            if burst and nu1 + nu2 + 2 <= _MQ:
                # check-free burst with FUSED cycle boundaries ending in a
                # checked ascent — cycles+1 fine launches instead of 2*cycles
                uq0, rmax0 = _solve_q_fused(g_q, None if zero0 else uq0,
                                            burst, h, w, nu1, nu2, coarsest,
                                            interpret, qgeom,
                                            with_final_residual=True)
            elif burst:  # burst-1 check-free cycles, then one checked one
                uq0 = jax.lax.fori_loop(
                    0, burst - 1,
                    lambda _, x: vcycle_q(x, g_q, h, w, nu1, nu2, coarsest,
                                          interpret=interpret, geom=qgeom), uq0)
                uq0, rmax0 = vcycle_q(uq0, g_q, h, w, nu1, nu2, coarsest,
                                      interpret=interpret, geom=qgeom,
                                      with_residual=True)
            uq, _, it = jax.lax.while_loop(cond_q, body_q,
                                           (uq0, rmax0, jnp.int32(burst)))
        if padded_output == "quarters":
            return uq  # serve tail consumes the checkerboard directly
        u = from_quarters_pallas(uq, interpret=interpret)
        if not padded_output:
            u = u[:, :h, :w]
        if return_info:
            return u, {"cycles": it, "residual": jnp.max(jnp.abs(residual(u, g)))}
        return u
    if padded and not small and _fused_level(h, w, nu1, nu2, use_pallas, interpret):
        # rounded-space while_loop: the residual check crops (1 pass) but
        # every V-cycle saves the per-launch pad/crop passes (vcycle_p /
        # vcycle_t for padded == "t")
        if padded == "t":
            from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
                mg_geometry_t)

            geom = mg_geometry_t(h, w)
            _, hp, wp, _ = geom
        else:
            from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
                mg_geometry)

            _, hp, wp = mg_geometry(h, w)
        g_p = _pad_to(g, (c, hp, wp))

        def cond_p(state):
            u_p, it = state
            r = residual(u_p[:, :h, :w], g)
            return (jnp.max(jnp.abs(r)) > tol * gnorm) & (it < max_cycles)

        def body_p(state):
            u_p, it = state
            if padded == "t":
                nxt = vcycle_t(u_p, g_p, h, w, nu1, nu2, coarsest,
                               interpret=interpret, geom=geom)
            else:
                nxt = vcycle_p(u_p, g_p, h, w, nu1, nu2, coarsest,
                               use_pallas=use_pallas, interpret=interpret)
            return nxt, it + 1

        u_p0 = _pad_to(u, (c, hp, wp))
        if burst:
            u_p0 = jax.lax.fori_loop(
                0, burst, lambda _, x: body_p((x, 0))[0], u_p0)
        u_p, it = jax.lax.while_loop(cond_p, body_p, (u_p0, jnp.int32(burst)))
        u = u_p if padded_output else u_p[:, :h, :w]
        if return_info:
            return u, {"cycles": it, "residual": jnp.max(jnp.abs(residual(u, g)))}
        return u

    def cond(state):
        u, it = state
        return (jnp.max(jnp.abs(residual(u, g))) > tol * gnorm) & (it < max_cycles)

    def body(state):
        u, it = state
        return vcycle(u, g, nu1, nu2, coarsest, use_pallas=use_pallas, interpret=interpret), it + 1

    if burst:
        u = jax.lax.fori_loop(0, burst, lambda _, x: body((x, 0))[0], u)
    u, it = jax.lax.while_loop(cond, body, (u, jnp.int32(burst)))
    if return_info:
        return u, {"cycles": it, "residual": jnp.max(jnp.abs(residual(u, g)))}
    return u
