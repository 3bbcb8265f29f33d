"""Pallas TPU kernels for the hot ops — strip-tiled, VMEM-resident.

Two kernels carry the compute cost of the stencil path. Both use the same
structure: the plane is cut into full-width row STRIPS (the lane dimension
stays whole, so fetches are contiguous and lane-aligned); each program reads
its strip PLUS an 8-row ghost band through an overlapping element-indexed
window (``pl.Element`` block specs — Pallas pipelines these with
double-buffered DMA automatically), computes the whole fused chain on-chip
recomputing the ghost rows redundantly (the on-chip version of the
communication-avoiding halo scheme in parallel/tiled.py), and writes only
the owned strip. One HBM round-trip per launch no matter how much
arithmetic is fused on top.

1. ``rb_sweeps_pallas`` — up to 4 red-black Gauss-Seidel sweeps per launch
   inside the 8-row ghost band (the staleness wavefront advances one layer
   per half-sweep and never reaches the owned strip). The XLA sweep costs
   ~3 HBM passes each; fusing k sweeps into one round-trip beats that roof.
   The TPU analogue of the reference's kernel-merging campaign
   (PDF §2.1.8-§2.1.11: 22 launches -> 8).

2. ``preprocess_rhs_pallas`` — erode(x3) + guidance blend + divergence in
   one pass (the reference's fused pre-processing, ``pre_process_kernel_*``
   seamlessClone-CUDA/seamlessClone_imp.cpp:1920-2018 plus ``myErode`` x3 at
   :1060-1062); the 8-row band covers the 5-px dependency radius
   (3 erode + 1 forward gradient + 1 backward divergence).

Works on arbitrary shapes (host-side zero-pad to strip/lane multiples; the
zero pad IS the Dirichlet frame, enforced in-kernel by global-coordinate
masks). ``interpret=True`` runs the same code on CPU for tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401  (memory spaces)

_M = 8  # ghost rows: sublane-aligned; covers 4 rb sweeps or the 5-px preprocess radius


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _vmem_params(th: int, wp: int, interpret: bool):
    """CompilerParams raising Mosaic's scoped-VMEM limit for tall strips.

    The default ~16 MB cap rejects level-kernel strip heights past ~64 at
    8K widths (th=80 at wp=3840 overflows it by 1.88 MB — docs/PERF.md)
    while the v5e has real headroom: 64 MB kernels measured clean
    (tools/tpu_queue.md fold-probe). Sized from the ghosted-window
    footprint with generous headroom for double buffering + body
    temporaries, floored at the default so small strips are unaffected,
    capped at 96 MB. ``None`` in interpret mode (no Mosaic there).
    """
    if interpret:
        return None
    est = 4 * wp * (th + 2 * _M) * 20
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(96 << 20, max(16 << 20, est)))


def _strip_height(wp: int, n_windows: int, budget_bytes: int = 6 << 20) -> int:
    """Largest multiple-of-8 strip height whose pipelined windows fit VMEM.

    n_windows counts input windows; x2 for double buffering plus the same
    again as headroom for the kernel's arithmetic temporaries.
    """
    th = (budget_bytes // (4 * n_windows * 4 * wp)) - 2 * _M
    th = max(8, (th // 8) * 8)
    return min(th, 512)


def _halo_spec(th: int, wp: int):
    """Overlapping (1, th+2M, wp) window starting M rows above the strip."""
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(th + 2 * _M), pl.Element(wp)),
        lambda c, i: (c, pl.multiple_of(i * th, 8), 0),
    )


def _halo_spec_2d(th: int, wp: int):
    return pl.BlockSpec(
        (pl.Element(th + 2 * _M), pl.Element(wp)),
        lambda c, i: (pl.multiple_of(i * th, 8), 0),
    )


# ---------------------------------------------------------------------------
# Blocked-ghost windows: the pipelined alternative to pl.Element overlap
# ---------------------------------------------------------------------------
#
# The stencil kernels need a (th + 2M, wp) window per (th, wp) strip. The
# pl.Element overlapping-window form above expresses that directly but was
# measured paying a large per-grid-step cost on hardware (mg_down: 5.06 ms
# at 3x2798x3798 against a ~0.5 ms DMA roof with th=16 strips). The blocked
# form uses only STANDARD block specs — a (th, wp) center block plus two
# M-row ghost blocks indexed from the neighboring strips — which Mosaic
# double-buffers like any blocked pipeline; the window is assembled in VMEM
# (one concat) and out-of-domain ghost rows are zeroed in-kernel (index
# clamping at the grid edges makes the DMA'd edge ghosts carry arbitrary
# rows; every such row is provably outside [0, h) and zeroed before use).
# It also removes the +-M host-side row padding: inputs are plain
# (C, hp, wp) zero-extended arrays, which lets callers keep whole level
# hierarchies in rounded space with no per-launch pad/crop copies.
#
# Mode select: SCL_PALLAS_GHOST=blocked|element (read at TRACE time — set it
# before the process first compiles; the jit caches do not key on it).


def _ghost_blocked() -> bool:
    import os

    return os.environ.get("SCL_PALLAS_GHOST", "element") == "blocked"


def mg_geometry(h: int, w: int, th: int | None = None) -> tuple[int, int, int]:
    """(th, hp, wp) for the fused multigrid level kernels at true size (h, w).

    The padded-space V-cycle (solvers/multigrid.py:vcycle_p) must allocate
    its level arrays with EXACTLY the padding the kernels' blocked specs
    expect; this is the single source of that geometry.

    Default th is width-keyed from the v5e FULL-solver sweeps
    (tools/time_solver.py multigrid_fixed4_padded, SCL_MG_TH sweep — the
    isolated mg_down optimum does NOT transfer to the full V-cycle).
    2026-08-19 re-sweep with the _vmem_params scoped-VMEM raise (which
    made th > 64 legal at 8K widths): wp=2432 optimum 160 (7.84 ms vs
    9.42 at the old 48; 128/192/320 within tunnel noise); wp=3840 optimum
    128 (27.37 ms vs 29.55 at the old 64; plateau 160/192). The height
    clamp keeps small COARSE levels from rounding up into padding rows
    (th > h buys nothing); the _strip_height clamp bounds the window
    footprint to ~1.67x its budget, inside _vmem_params' 96 MB cap.
    SCL_MG_TH overrides for sweeps (trace-time read, like
    SCL_PALLAS_GHOST).
    """
    import os

    wp = _round_up(w, 128)
    if th is None:
        th_env = os.environ.get("SCL_MG_TH")
        if th_env:
            th = max(16, int(th_env) // 16 * 16)
        else:
            th = 160 if wp <= 2560 else 128
            th = min(th, _round_up(max(h, 16), 16))
            th = min(th, max(16, _strip_height(wp, n_windows=3,
                                               budget_bytes=48 << 20) // 16 * 16))
    return th, _round_up(h, th), wp


def mg_geometry_t(h: int, w: int, wp_min: int = 0,
                  th: int | None = None) -> tuple[int, int, int, int]:
    """(th, hp, wp, hp2) for the TRANSPOSE-FUSED level chain (vcycle_t).

    Differences from mg_geometry: th is restricted to {16, 32, 64, 128, 256}
    so th//2 divides 128 (the half-height arrays rh / e_lane and the coarse
    level's lane extent all round to hp2 = round_up(hp//2, 128), and every
    blocked spec that touches them needs th//2 | 128); wp can be raised by
    ``wp_min`` — the COARSE level of vcycle_t inherits the fine level's hp2
    as its lane extent so the transposed transfer kernels read/write whole
    blocks with no relayout (extra lanes are exact zeros). Default th = 128:
    the mg_geometry sweep measured 128/160/192 within tunnel noise at both
    headline and 8K widths (docs/PERF.md 2026-08-19).
    """
    import os

    wp = max(_round_up(w, 128), wp_min)
    if th is None:
        th_env = os.environ.get("SCL_MG_TH")
        th = int(th_env) if th_env else 128
        th = max(16, min(256, 1 << (th.bit_length() - 1)))  # pow2 in [16,256]
        th = min(th, _round_up(max(h, 16), 16))
        if th & (th - 1):  # h-clamp broke pow2: round down again
            th = 1 << (th.bit_length() - 1)
        th = max(16, th)
    assert th in (16, 32, 64, 128, 256), th
    hp = _round_up(h, th)
    hp2 = _round_up(hp // 2, 128)
    return th, hp, wp, hp2


def _ghost_specs(th: int, hp: int, wp: int):
    """(center, top-ghost, bottom-ghost) block specs for a (C, hp, wp) input."""
    nb = hp // _M  # the ghost specs view the array as M-row blocks
    r = th // _M
    return (
        pl.BlockSpec((1, th, wp), lambda c, i: (c, i, 0)),
        pl.BlockSpec((1, _M, wp), lambda c, i: (c, jnp.maximum(i * r - 1, 0), 0)),
        pl.BlockSpec((1, _M, wp), lambda c, i: (c, jnp.minimum((i + 1) * r, nb - 1), 0)),
    )


def _asm_window(i, th: int, h: int, wp: int, ctr_ref, top_ref, bot_ref):
    """Assemble the (th + 2M, wp) ghosted window from blocked refs.

    Ghost rows outside [0, h) are zeroed: at the grid edges the clamped
    block indices DMA'd arbitrary in-array rows there, and everywhere else
    the input is zero-extended so the ``where`` is a no-op.
    """
    m = _M
    rt = i * th - m + jax.lax.broadcasted_iota(jnp.int32, (m, wp), 0)
    rb = (i + 1) * th + jax.lax.broadcasted_iota(jnp.int32, (m, wp), 0)
    wtop = jnp.where(rt >= 0, top_ref[0], 0.0)
    wbot = jnp.where(rb < h, bot_ref[0], 0.0)
    return jnp.concatenate([wtop, ctr_ref[0], wbot], axis=0)


# ---------------------------------------------------------------------------
# Strip-tiled communication-avoiding red-black sweeps
# ---------------------------------------------------------------------------


def _lane_neighbors(w: int, wp: int):
    """(left, right) fetches: out[:, j] = x[:, j-1] / x[:, j+1], zero edges.

    Roll form when w < wp: Mosaic lowers the off-128 lane pad in the naive
    pad/slice form into masked shifts that dominated the stencil kernels'
    VPU time (tools/probe_nsum.py: 3.15 -> 1.74 ms for the 4-sweep kernel
    at 3x2816x3840, bit-identical). A cyclic ``pltpu.roll`` is exact
    instead: lanes >= w hold zeros by the padded-space invariant, so the
    wrap carries an exact zero into column 0's left neighbor (the
    Dirichlet pad), and every wrapped garbage lane lands at column >= w,
    already excluded by the callers' in_dom selects. Pad/slice fallback
    when w == wp (the wrap would carry real data).
    """
    if w < wp:
        return (lambda x: pltpu.roll(x, 1, 1),
                lambda x: pltpu.roll(x, wp - 1, 1))
    return (lambda x: jnp.pad(x[:, :-1], ((0, 0), (1, 0))),
            lambda x: jnp.pad(x[:, 1:], ((0, 0), (0, 1))))


def _rb_sweep_loop(u, g, red, black, lsh, rsh, n_sweeps):
    """n select-form red-black sweeps on one ghosted window (shared core).

    ``n_sweeps`` is static and small (<= 4): unrolled as a Python loop so
    Mosaic schedules across the sweep boundary instead of fencing at an
    scf.for back-edge (same arithmetic order — bit-identical)."""

    def nsum(x):
        vert = jnp.pad(x, ((1, 1), (0, 0)))
        return vert[:-2, :] + vert[2:, :] + lsh(x) + rsh(x)

    for _ in range(n_sweeps):
        u = jnp.where(red, (nsum(u) - g) * 0.25, u)
        u = jnp.where(black, (nsum(u) - g) * 0.25, u)
    return u


def _rb_body(u, g, i, *, n_sweeps, th, h, w, wp):
    """k sweeps inside a (th + 2M, wp) ghosted window; returns the strip.

    Select-form sweeps on boolean masks (see solvers/jacobi.py
    redblack_sweep): the inputs arrive zero-padded outside the domain and
    the color masks exclude out-of-domain points, so padding stays zero
    through every half-sweep with no f32 mask multiplies at all.
    """
    m = _M
    rows = i * th - m + jax.lax.broadcasted_iota(jnp.int32, (th + 2 * m, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th + 2 * m, wp), 1)
    in_dom = (rows >= 0) & (rows < h) & (cols < w)
    par = (rows + cols) % 2 == 0
    red = par & in_dom
    black = (~par) & in_dom
    lsh, rsh = _lane_neighbors(w, wp)
    u = _rb_sweep_loop(u, g, red, black, lsh, rsh, n_sweeps)
    return u[m : m + th, :]


def _rb_strip_kernel(u_ref, g_ref, out_ref, *, n_sweeps, th, h, w, wp):
    i = pl.program_id(1)
    out_ref[0] = _rb_body(u_ref[0], g_ref[0], i,
                          n_sweeps=n_sweeps, th=th, h=h, w=w, wp=wp)


def _rb_strip_kernel_b(uc, ut, ub, gc, gt, gb, out_ref, *, n_sweeps, th, h, w, wp):
    i = pl.program_id(1)
    u = _asm_window(i, th, h, wp, uc, ut, ub)
    g = _asm_window(i, th, h, wp, gc, gt, gb)
    out_ref[0] = _rb_body(u, g, i, n_sweeps=n_sweeps, th=th, h=h, w=w, wp=wp)


def _rb_launch(up, gp, n_sweeps, th, h, w, wp, hp, c, interpret):
    """One kernel launch on pre-padded (C, hp+2M, wp) buffers -> (C, hp, wp)."""
    return pl.pallas_call(
        partial(_rb_strip_kernel, n_sweeps=n_sweeps, th=th, h=h, w=w, wp=wp),
        grid=(c, hp // th),
        in_specs=[_halo_spec(th, wp), _halo_spec(th, wp)],
        out_specs=pl.BlockSpec((1, th, wp), lambda c, i: (c, i, 0)),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
        compiler_params=_vmem_params(th, wp, interpret),
        interpret=interpret,
    )(up, gp)


def _rb_launch_b(up, gp, n_sweeps, th, h, w, wp, hp, c, interpret):
    """Blocked-ghost launch on plain (C, hp, wp) buffers -> (C, hp, wp)."""
    ctr, top, bot = _ghost_specs(th, hp, wp)
    return pl.pallas_call(
        partial(_rb_strip_kernel_b, n_sweeps=n_sweeps, th=th, h=h, w=w, wp=wp),
        grid=(c, hp // th),
        in_specs=[ctr, top, bot] * 2,
        out_specs=pl.BlockSpec((1, th, wp), lambda c, i: (c, i, 0)),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
        compiler_params=_vmem_params(th, wp, interpret),
        interpret=interpret,
    )(up, up, up, gp, gp, gp)


@partial(jax.jit, static_argnames=("n_sweeps", "interpret", "th", "blocked"))
def rb_sweeps_pallas(
    u: jnp.ndarray,
    g: jnp.ndarray,
    n_sweeps: int,
    interpret: bool = False,
    th: int | None = None,
    blocked: bool | None = None,
):
    """k red-black sweeps over (C, H, W) f32, one HBM round-trip per <=4.

    Pads once, launches ceil(k/4) strip-tiled kernels, crops once;
    bitwise-equivalent to k XLA ``redblack_sweep``s. ``th`` overrides the
    strip height (multiple of 16).
    """
    if n_sweeps < 1:
        return u
    if blocked is None:
        blocked = _ghost_blocked()
    c, h, w = u.shape
    wp = _round_up(w, 128)
    if th is None:
        th = _strip_height(wp, n_windows=2)
    hp = _round_up(h, th)
    if blocked:
        up = jnp.pad(u, ((0, 0), (0, hp - h), (0, wp - w)))
        gp = jnp.pad(g, ((0, 0), (0, hp - h), (0, wp - w)))
        done = 0
        while done < n_sweeps:
            step = min(4, n_sweeps - done)
            up = _rb_launch_b(up, gp, step, th, h, w, wp, hp, c, interpret)
            done += step
        return up[:, :h, :w]
    pad = ((0, 0), (_M, hp - h + _M), (0, wp - w))
    up = jnp.pad(u, pad)
    gp = jnp.pad(g, pad)

    done = 0
    while done < n_sweeps:
        step = min(4, n_sweeps - done)
        out = _rb_launch(up, gp, step, th, h, w, wp, hp, c, interpret)
        done += step
        if done < n_sweeps:
            up = jnp.pad(out, ((0, 0), (_M, _M), (0, 0)))
    return out[:, :h, :w]


def _rb_tile_kernel(s_ref, u_ref, g_ref, out_ref, *, n_sweeps, th, hl, wl, wp,
                    ht, wt):
    """Origin-aware CA sweeps for one strip of a shard_map GHOSTED tile.

    s_ref: scalar-prefetched (2,) int32 — GLOBAL coordinates of local (0, 0)
    (negative by the exchanged halo width on interior tiles). The color
    parity and the Dirichlet domain test run in global coordinates, so the
    kernel computes exactly the arithmetic of parallel/tiled.py's XLA tile
    body: owned cells come out bitwise identical (the strip ghost rows
    OUTSIDE the exchanged tile are excluded by the local-bounds test — the
    XLA body re-zeroes them every half-sweep via its jnp.pad, and cells they
    could influence are beyond the CA staleness budget either way).
    """
    i = pl.program_id(1)
    m = _M
    lrow = i * th - m + jax.lax.broadcasted_iota(jnp.int32, (th + 2 * m, wp), 0)
    lcol = jax.lax.broadcasted_iota(jnp.int32, (th + 2 * m, wp), 1)
    grow = s_ref[0] + lrow
    gcol = s_ref[1] + lcol
    in_dom = ((lrow >= 0) & (lrow < hl) & (lcol < wl)
              & (grow >= 0) & (grow < ht) & (gcol >= 0) & (gcol < wt))
    par = (grow + gcol) % 2 == 0
    red = par & in_dom
    black = (~par) & in_dom
    lsh, rsh = _lane_neighbors(wl, wp)
    u = _rb_sweep_loop(u_ref[0], g_ref[0], red, black, lsh, rsh, n_sweeps)
    out_ref[0] = u[m : m + th, :]


def rb_sweeps_tile_pallas(
    u: jnp.ndarray,
    g: jnp.ndarray,
    n_sweeps: int,
    origin: jnp.ndarray,
    domain_hw: tuple[int, int],
    interpret: bool = False,
    th: int | None = None,
) -> jnp.ndarray:
    """k red-black sweeps on a (C, hl, wl) shard_map tile, global-coordinate
    masks; the per-shard compute path of solve_redblack_tiled (VERDICT r2
    missing #2: the distributed program must run the same speed-of-light
    kernels as the single-chip path).

    u/g: the halo-EXCHANGED local tile (ghost band included). origin: traced
    (2,) int32 global coords of local (0, 0). domain_hw: static global
    (Ht, Wt) — cells outside stay pinned to zero (the Dirichlet frame).
    Bitwise-equal on owned cells to the XLA select-form tile sweeps.
    """
    if n_sweeps < 1:
        return u
    c, hl, wl = u.shape
    wp = _round_up(wl, 128)
    if th is None:
        th = _strip_height(wp, n_windows=2)
    hp = _round_up(hl, th)
    ht, wt = domain_hw
    s = jnp.asarray(origin, jnp.int32)
    pad = ((0, 0), (_M, hp - hl + _M), (0, wp - wl))
    up = jnp.pad(u, pad)
    gp = jnp.pad(g, pad)
    # under shard_map the output must declare how it varies across mesh axes
    # (vma); inherit the input's so the kernel works inside or outside one
    try:
        vma = jax.typeof(u).vma
    except AttributeError:
        vma = frozenset()
    out_sds = jax.ShapeDtypeStruct((c, hp, wp), jnp.float32, vma=vma)

    def launch(up, step):
        return pl.pallas_call(
            partial(_rb_tile_kernel, n_sweeps=step, th=th, hl=hl,
                    wl=wl, wp=wp, ht=ht, wt=wt),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(c, hp // th),
                in_specs=[
                    pl.BlockSpec(
                        (pl.Element(1), pl.Element(th + 2 * _M), pl.Element(wp)),
                        lambda ci, i, s_ref: (ci, pl.multiple_of(i * th, 8), 0)),
                    pl.BlockSpec(
                        (pl.Element(1), pl.Element(th + 2 * _M), pl.Element(wp)),
                        lambda ci, i, s_ref: (ci, pl.multiple_of(i * th, 8), 0)),
                ],
                out_specs=pl.BlockSpec((1, th, wp), lambda ci, i, s_ref: (ci, i, 0)),
            ),
            out_shape=out_sds,
            compiler_params=_vmem_params(th, wp, interpret),
            interpret=interpret,
        )(s, up, gp)

    done = 0
    while done < n_sweeps:
        step = min(4, n_sweeps - done)
        out = launch(up, step)
        done += step
        if done < n_sweeps:
            up = jnp.pad(out, ((0, 0), (_M, _M), (0, 0)))
    return out[:, :hl, :wl]


# ---------------------------------------------------------------------------
# Fused multigrid level stages: sweeps+residual+row-restrict / mg-prolong+
# correct+sweeps. One HBM round-trip per half-level instead of ~6 XLA passes.
# ---------------------------------------------------------------------------
#
# Mosaic cannot lower lane-direction (last axis) stride-2 decimation or
# interleave, but handles both on the SUBLANE (row) axis via reshape-to-pairs
# and stack+reshape. So the separable transfer operators are split: the row
# half runs fused inside these kernels at full width, and the lane half runs
# in XLA on the HALF-HEIGHT intermediate (solvers/multigrid.py), where its
# relayout copies cost half as much. The TPU counterpart of the reference's
# kernel-merging campaign applied to the V-cycle (PDF §2.1.8-§2.1.11).


def _level_ops(rows, cols, h, w, bh, bw, wp):
    """(nsum, inv_diag, diag) of the level operator inside a strip kernel.

    bh/bw are the level's boundary-gap parameters (solvers/multigrid.py
    _coarsen): Shortley-Weller coefficients on the last row/col when != 1,
    the plain 5-point stencil (all constants, zero overhead) when == 1.
    Lane neighbors via _lane_neighbors (roll form when w < wp).
    """
    lsh, rsh = _lane_neighbors(w, wp)
    if bh == 1.0 and bw == 1.0:
        def nsum(x):
            vert = jnp.pad(x, ((1, 1), (0, 0)))
            return vert[:-2, :] + vert[2:, :] + lsh(x) + rsh(x)
        return nsum, 0.25, 4.0
    lrow = jnp.where(rows == h - 1, jnp.float32(2.0 / (1.0 + bh) - 1.0), 0.0)
    lcol = jnp.where(cols == w - 1, jnp.float32(2.0 / (1.0 + bw) - 1.0), 0.0)
    diag = (jnp.where(rows == h - 1, jnp.float32(2.0 / bh), jnp.float32(2.0))
            + jnp.where(cols == w - 1, jnp.float32(2.0 / bw), jnp.float32(2.0)))

    def nsum(x):
        vert = jnp.pad(x, ((1, 1), (0, 0)))
        up_ = vert[:-2, :]
        lf = lsh(x)
        return up_ + vert[2:, :] + lf + rsh(x) + lrow * up_ + lcol * lf

    return nsum, 1.0 / diag, diag


def _mg_down_body(u, g, i, *, nu1, th, h, w, wp, hc, h_even, bh, bw,
                  u_is_zero: bool = False):
    """nu1 sweeps + residual + row-restrict on a ghosted window.

    Returns (swept strip (th, wp), row-restricted residual strip (th//2, wp)).

    ``u_is_zero``: the guess is identically zero, so the first red
    half-sweep's neighbor sum vanishes — ``u_red = -g * inv_d`` exactly
    (bit-identical to the dense form, one full stencil pass cheaper).
    """
    m = _M
    rows = i * th - m + jax.lax.broadcasted_iota(jnp.int32, (th + 2 * m, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th + 2 * m, wp), 1)
    in_dom = (rows >= 0) & (rows < h) & (cols < w)
    par = (rows + cols) % 2 == 0
    red = par & in_dom
    black = (~par) & in_dom

    nsum, inv_d, diag = _level_ops(rows, cols, h, w, bh, bw, wp)
    for sweep in range(nu1):
        if sweep == 0 and u_is_zero and nu1 > 0:
            u = jnp.where(red, (0.0 - g) * inv_d, u)
        else:
            u = jnp.where(red, (nsum(u) - g) * inv_d, u)
        u = jnp.where(black, (nsum(u) - g) * inv_d, u)
    strip = u[m : m + th, :]

    # Residual is valid over the slab [m, m+th+2) for nu1 <= 2 (the staleness
    # wavefront advances 2 rows per sweep from each window edge, +1 for the
    # neighbor sum: 2*nu1+1 <= m on top, 2*nu1+1 <= m-1 below the owned strip).
    r = jnp.where(in_dom, g - (nsum(u) - diag * u), 0.0)
    s = r[m : m + th + 2, :].reshape(th // 2 + 1, 2, wp)
    a, b = s[:, 0, :], s[:, 1, :]  # fine rows i*th+2k / i*th+2k+1
    nhc = th // 2
    out = 0.25 * a[:nhc] + 0.5 * b[:nhc] + 0.25 * a[1 : nhc + 1]
    if h_even:
        # last coarse row gets (1/4, 1/2, wA/2, wB/2) weights, the transpose
        # of the bh-gap edge prolongation (for bh=1: 1/4,1/2,1/3,1/6); the
        # bulk already holds 1/4 of fine h-2, top up to wA/2 and add wB/2.
        gap = 2.0 + bh
        edge = (out + ((1.0 + bh) / gap * 0.5 - 0.25) * a[1 : nhc + 1]
                + (bh / gap * 0.5) * b[1 : nhc + 1])
        jc = i * nhc + jax.lax.broadcasted_iota(jnp.int32, (nhc, wp), 0)
        out = jnp.where(jc == hc - 1, edge, out)
    return strip, out


def _mg_down_kernel(u_ref, g_ref, uo_ref, rh_ref, *, nu1, th, h, w, wp, hc,
                    h_even, bh, bw):
    i = pl.program_id(1)
    uo_ref[0], rh_ref[0] = _mg_down_body(
        u_ref[0], g_ref[0], i, nu1=nu1, th=th, h=h, w=w, wp=wp, hc=hc,
        h_even=h_even, bh=bh, bw=bw)


def _mg_down_kernel0(g_ref, uo_ref, rh_ref, *, nu1, th, h, w, wp, hc,
                     h_even, bh, bw):
    """Element-window form of the known-zero-guess descent (see kernel_b0)."""
    i = pl.program_id(1)
    g = g_ref[0]
    uo_ref[0], rh_ref[0] = _mg_down_body(
        jnp.zeros_like(g), g, i, nu1=nu1, th=th, h=h, w=w, wp=wp, hc=hc,
        h_even=h_even, bh=bh, bw=bw, u_is_zero=True)


def _mg_down_kernel_b(uc, ut, ub, gc, gt, gb, uo_ref, rh_ref, *, nu1, th, h,
                      w, wp, hc, h_even, bh, bw):
    i = pl.program_id(1)
    u = _asm_window(i, th, h, wp, uc, ut, ub)
    g = _asm_window(i, th, h, wp, gc, gt, gb)
    uo_ref[0], rh_ref[0] = _mg_down_body(
        u, g, i, nu1=nu1, th=th, h=h, w=w, wp=wp, hc=hc, h_even=h_even,
        bh=bh, bw=bw)


def _mg_down_kernel_b0(gc, gt, gb, uo_ref, rh_ref, *, nu1, th, h, w, wp, hc,
                       h_even, bh, bw):
    """mg_down from a KNOWN-ZERO initial guess: u is synthesized in VMEM
    instead of DMA'd — every coarse level of a V-cycle starts from zero, so
    this drops a third of the descent's input HBM traffic there."""
    i = pl.program_id(1)
    g = _asm_window(i, th, h, wp, gc, gt, gb)
    u = jnp.zeros_like(g)
    uo_ref[0], rh_ref[0] = _mg_down_body(
        u, g, i, nu1=nu1, th=th, h=h, w=w, wp=wp, hc=hc, h_even=h_even,
        bh=bh, bw=bw, u_is_zero=True)


@partial(jax.jit, static_argnames=("nu1", "bh", "bw", "interpret", "th", "blocked",
                                   "padded_io", "true_hw", "u_zero", "geom",
                                   "rh_rows"))
def mg_down_pallas(u: jnp.ndarray | None, g: jnp.ndarray, nu1: int = 1,
                   bh: float = 1.0, bw: float = 1.0, interpret: bool = False,
                   th: int | None = None, blocked: bool | None = None,
                   padded_io: bool = False,
                   true_hw: tuple[int, int] | None = None,
                   u_zero: bool = False,
                   geom: tuple[int, int, int] | None = None,
                   rh_rows: int | None = None):
    """Fused V-cycle descent: nu1 sweeps + residual + row-restrict, one pass.

    (C, H, W) f32 -> (swept u (C, H, W), row-restricted residual
    (C, (H-1)//2, W)). The caller applies the lane-direction restriction
    (multigrid._restrict_axis) and the 4x coarse-RHS scaling on the
    half-height output. nu1 must be <= 2 (ghost-band staleness budget).
    ``th`` overrides the strip height (multiple of 16; tuning knob).

    ``padded_io=True`` (forces the blocked-ghost kernels regardless of
    ``blocked``/env): u/g arrive ALREADY in rounded space — (C, hp, wp) per
    mg_geometry(*true_hw), exact zeros outside the true (h, w) domain — and
    the outputs stay in rounded space, uncropped. This removes the 2 pad +
    2 crop full-array passes per launch; the padded-space V-cycle
    (solvers/multigrid.py) keeps whole level hierarchies rounded so they
    never materialize at all.

    ``u_zero=True``: the initial guess is KNOWN zero (every coarse level of
    a V-cycle) — ``u`` may be None; the kernel synthesizes the zero window
    in VMEM instead of DMA'ing a zeros array, dropping a third of the
    descent's input HBM traffic.

    ``geom=(th, hp, wp)`` overrides mg_geometry for the padded_io path (the
    vcycle_t chain pins its own rounded geometry, with lane extents
    inherited across levels); ``rh_rows`` over-allocates the residual
    output's row dim (multiple of th//2 — rows beyond hp//2 stay UNWRITTEN,
    for consumers that read whole 128-row blocks and mask, like
    mg_restrict_t_pallas).
    """
    assert 0 <= nu1 <= 2, nu1
    if blocked is None:
        blocked = _ghost_blocked()
    if padded_io:
        assert true_hw is not None
        h, w = true_hw
        c = g.shape[0]
        th, hp, wp = geom if geom is not None else mg_geometry(h, w, th)
        assert g.shape == (c, hp, wp), (g.shape, (c, hp, wp))
        assert u_zero or u.shape == (c, hp, wp), (u.shape, (c, hp, wp))
        rh_rows = hp // 2 if rh_rows is None else rh_rows
        assert rh_rows >= hp // 2 and rh_rows % (th // 2) == 0, (rh_rows, th)
        hc = (h - 1) // 2
        ctr, top, bot = _ghost_specs(th, hp, wp)
        out_specs = [
            pl.BlockSpec((1, th, wp), lambda ci, i: (ci, i, 0)),
            pl.BlockSpec((1, th // 2, wp), lambda ci, i: (ci, i, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((c, rh_rows, wp), jnp.float32),
        ]
        kw = dict(nu1=nu1, th=th, h=h, w=w, wp=wp, hc=hc,
                  h_even=(h % 2 == 0), bh=bh, bw=bw)
        if u_zero:
            return pl.pallas_call(
                partial(_mg_down_kernel_b0, **kw),
                grid=(c, hp // th),
                in_specs=[ctr, top, bot],
                out_specs=out_specs,
                out_shape=out_shape,
                compiler_params=_vmem_params(th, wp, interpret),
                interpret=interpret,
            )(g, g, g)
        return pl.pallas_call(
            partial(_mg_down_kernel_b, **kw),
            grid=(c, hp // th),
            in_specs=[ctr, top, bot] * 2,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=_vmem_params(th, wp, interpret),
            interpret=interpret,
        )(u, u, u, g, g, g)
    c, h, w = g.shape
    th, hp, wp = mg_geometry(h, w, th)
    hc = (h - 1) // 2
    out_specs = [
        pl.BlockSpec((1, th, wp), lambda ci, i: (ci, i, 0)),
        pl.BlockSpec((1, th // 2, wp), lambda ci, i: (ci, i, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
        jax.ShapeDtypeStruct((c, hp // 2, wp), jnp.float32),
    ]
    kw = dict(nu1=nu1, th=th, h=h, w=w, wp=wp, hc=hc,
              h_even=(h % 2 == 0), bh=bh, bw=bw)
    if blocked:
        gp = jnp.pad(g, ((0, 0), (0, hp - h), (0, wp - w)))
        ctr, top, bot = _ghost_specs(th, hp, wp)
        if u_zero:
            u_out, rh = pl.pallas_call(
                partial(_mg_down_kernel_b0, **kw),
                grid=(c, hp // th),
                in_specs=[ctr, top, bot],
                out_specs=out_specs,
                out_shape=out_shape,
                compiler_params=_vmem_params(th, wp, interpret),
                interpret=interpret,
            )(gp, gp, gp)
            return u_out[:, :h, :w], rh[:, :hc, :w]
        up = jnp.pad(u, ((0, 0), (0, hp - h), (0, wp - w)))
        u_out, rh = pl.pallas_call(
            partial(_mg_down_kernel_b, **kw),
            grid=(c, hp // th),
            in_specs=[ctr, top, bot] * 2,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=_vmem_params(th, wp, interpret),
            interpret=interpret,
        )(up, up, up, gp, gp, gp)
        return u_out[:, :h, :w], rh[:, :hc, :w]
    pad = ((0, 0), (_M, hp - h + _M), (0, wp - w))
    gp = jnp.pad(g, pad)
    if u_zero:
        u_out, rh = pl.pallas_call(
            partial(_mg_down_kernel0, **kw),
            grid=(c, hp // th),
            in_specs=[_halo_spec(th, wp)],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=_vmem_params(th, wp, interpret),
            interpret=interpret,
        )(gp)
        return u_out[:, :h, :w], rh[:, :hc, :w]
    up = jnp.pad(u, pad)
    u_out, rh = pl.pallas_call(
        partial(_mg_down_kernel, **kw),
        grid=(c, hp // th),
        in_specs=[_halo_spec(th, wp), _halo_spec(th, wp)],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_vmem_params(th, wp, interpret),
        interpret=interpret,
    )(up, gp)
    return u_out[:, :h, :w], rh[:, :hc, :w]


def _mg_up_body(u, g, ec, i, *, nu2, th, h, w, wp, h_even, bh, bw):
    """Row-direction bilinear prolong + correction add + nu2 sweeps.

    u/g: (th + 2M, wp) fine windows; ec: (th//2 + 2M, wp) coarse window
    (window row j = coarse row i*th/2 - M + j, zero outside the coarse
    grid). Returns the swept (th, wp) strip.
    """
    m = _M
    rows = i * th - m + jax.lax.broadcasted_iota(jnp.int32, (th + 2 * m, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th + 2 * m, wp), 1)
    in_dom = (rows >= 0) & (rows < h) & (cols < w)
    par = (rows + cols) % 2 == 0
    red = par & in_dom
    black = (~par) & in_dom

    # Fine window row t pairs with coarse q = i*th/2 - m/2 + p, p = t//2,
    # so e_loc[q] = ec[p + m/2]: fine 2q <- mids, fine 2q+1 <- e[q].
    nh = th // 2 + m
    j0 = m // 2
    mids = 0.5 * (ec[j0 - 1 : j0 - 1 + nh, :] + ec[j0 : j0 + nh, :])
    odd = ec[j0 : j0 + nh, :]
    corr = jnp.stack([mids, odd], axis=1).reshape(th + 2 * m, wp)
    if h_even:
        # fine rows h-2 / h-1 take (wA, wB) of the last coarse row, the
        # linear interpolation over the bh-gap (bh=1: 2/3, 1/3). The bulk
        # interleave put 1/2 of it at h-2 (mids with zero pad) and 0 at h-1,
        # so rescale h-2 by 2*wA and take 2*wB of the mids plane at h-1.
        gap = 2.0 + bh
        alt = jnp.stack([mids, mids], axis=1).reshape(th + 2 * m, wp)
        corr = jnp.where(rows == h - 2, corr * (2.0 * (1.0 + bh) / gap), corr)
        corr = jnp.where(rows == h - 1, alt * (2.0 * bh / gap), corr)
    u = jnp.where(in_dom, u + corr, u)

    nsum, inv_d, _ = _level_ops(rows, cols, h, w, bh, bw, wp)
    for _ in range(nu2):
        u = jnp.where(red, (nsum(u) - g) * inv_d, u)
        u = jnp.where(black, (nsum(u) - g) * inv_d, u)
    return u[m : m + th, :]


def _mg_up_kernel(u_ref, g_ref, e_ref, uo_ref, *, nu2, th, h, w, wp, h_even,
                  bh, bw):
    i = pl.program_id(1)
    uo_ref[0] = _mg_up_body(u_ref[0], g_ref[0], e_ref[0], i, nu2=nu2, th=th,
                            h=h, w=w, wp=wp, h_even=h_even, bh=bh, bw=bw)


def _mg_up_kernel_b(uc, ut, ub, gc, gt, gb, ecc, ect, ecb, uo_ref, *, nu2,
                    th, h, w, wp, hc, h_even, bh, bw):
    i = pl.program_id(1)
    u = _asm_window(i, th, h, wp, uc, ut, ub)
    g = _asm_window(i, th, h, wp, gc, gt, gb)
    ec = _asm_window(i, th // 2, hc, wp, ecc, ect, ecb)
    uo_ref[0] = _mg_up_body(u, g, ec, i, nu2=nu2, th=th, h=h, w=w, wp=wp,
                            h_even=h_even, bh=bh, bw=bw)


def _coarse_halo_spec(thc: int, wp: int):
    """Overlapping (1, thc+2M, wp) coarse window, M rows above the strip."""
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(thc + 2 * _M), pl.Element(wp)),
        lambda c, i: (c, pl.multiple_of(i * thc, 8), 0),
    )


@partial(jax.jit, static_argnames=("nu2", "bh", "bw", "interpret", "th", "blocked",
                                   "padded_io", "true_hw", "geom"))
def mg_up_pallas(u: jnp.ndarray, g: jnp.ndarray, e_lane: jnp.ndarray,
                 nu2: int = 2, bh: float = 1.0, bw: float = 1.0,
                 interpret: bool = False, th: int | None = None,
                 blocked: bool | None = None, padded_io: bool = False,
                 true_hw: tuple[int, int] | None = None,
                 geom: tuple[int, int, int] | None = None) -> jnp.ndarray:
    """Fused V-cycle ascent: row-prolong of the lane-prolonged coarse
    correction + add + nu2 sweeps, one pass.

    e_lane: (C, (H-1)//2, W) — the coarse correction already prolonged along
    the lane axis by multigrid._prolong_axis. nu2 <= 4.
    ``th`` overrides the strip height (multiple of 16; tuning knob).

    ``padded_io=True`` (forces the blocked-ghost kernels regardless of
    ``blocked``/env): u/g are (C, hp, wp) rounded per mg_geometry(*true_hw),
    e_lane is (C, >= hp//2, wp) (rows [hc, ..) zero or ignored — the window
    assembly zeroes past hc), all exact zeros outside their true domains;
    the output stays rounded (see mg_down_pallas). ``geom`` overrides
    mg_geometry like mg_down_pallas's.
    """
    assert 0 <= nu2 <= 4, nu2
    if blocked is None:
        blocked = _ghost_blocked()
    if padded_io:
        assert true_hw is not None
        h, w = true_hw
        c = u.shape[0]
        th, hp, wp = geom if geom is not None else mg_geometry(h, w, th)
        hc = (h - 1) // 2
        assert u.shape == (c, hp, wp) and g.shape == (c, hp, wp)
        e_rows = e_lane.shape[1]
        assert (e_lane.shape[0] == c and e_lane.shape[2] == wp
                and e_rows >= hp // 2 and e_rows % (th // 2) == 0), (
            e_lane.shape, (c, hp // 2, wp))
        ctr, top, bot = _ghost_specs(th, hp, wp)
        ec_ctr, ec_top, ec_bot = _ghost_specs(th // 2, e_rows, wp)
        return pl.pallas_call(
            partial(_mg_up_kernel_b, nu2=nu2, th=th, h=h, w=w, wp=wp, hc=hc,
                    h_even=(h % 2 == 0), bh=bh, bw=bw),
            grid=(c, hp // th),
            in_specs=[ctr, top, bot, ctr, top, bot, ec_ctr, ec_top, ec_bot],
            out_specs=pl.BlockSpec((1, th, wp), lambda ci, i: (ci, i, 0)),
            out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
            compiler_params=_vmem_params(th, wp, interpret),
            interpret=interpret,
        )(u, u, u, g, g, g, e_lane, e_lane, e_lane)
    c, h, w = u.shape
    hc = (h - 1) // 2
    assert e_lane.shape == (c, hc, w), (e_lane.shape, u.shape)
    th, hp, wp = mg_geometry(h, w, th)
    if blocked:
        up = jnp.pad(u, ((0, 0), (0, hp - h), (0, wp - w)))
        gp = jnp.pad(g, ((0, 0), (0, hp - h), (0, wp - w)))
        ep = jnp.pad(e_lane, ((0, 0), (0, hp // 2 - hc), (0, wp - w)))
        ctr, top, bot = _ghost_specs(th, hp, wp)
        ec_ctr, ec_top, ec_bot = _ghost_specs(th // 2, hp // 2, wp)
        out = pl.pallas_call(
            partial(_mg_up_kernel_b, nu2=nu2, th=th, h=h, w=w, wp=wp, hc=hc,
                    h_even=(h % 2 == 0), bh=bh, bw=bw),
            grid=(c, hp // th),
            in_specs=[ctr, top, bot, ctr, top, bot, ec_ctr, ec_top, ec_bot],
            out_specs=pl.BlockSpec((1, th, wp), lambda ci, i: (ci, i, 0)),
            out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
            compiler_params=_vmem_params(th, wp, interpret),
            interpret=interpret,
        )(up, up, up, gp, gp, gp, ep, ep, ep)
        return out[:, :h, :w]
    pad = ((0, 0), (_M, hp - h + _M), (0, wp - w))
    up = jnp.pad(u, pad)
    gp = jnp.pad(g, pad)
    ep = jnp.pad(e_lane, ((0, 0), (_M, hp // 2 + _M - hc), (0, wp - w)))
    out = pl.pallas_call(
        partial(_mg_up_kernel, nu2=nu2, th=th, h=h, w=w, wp=wp,
                h_even=(h % 2 == 0), bh=bh, bw=bw),
        grid=(c, hp // th),
        in_specs=[_halo_spec(th, wp), _halo_spec(th, wp),
                  _coarse_halo_spec(th // 2, wp)],
        out_specs=pl.BlockSpec((1, th, wp), lambda ci, i: (ci, i, 0)),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
        compiler_params=_vmem_params(th, wp, interpret),
        interpret=interpret,
    )(up, gp, ep)
    return out[:, :h, :w]


# ---------------------------------------------------------------------------
# Transpose-fused lane-direction transfers (the vcycle_t chain)
# ---------------------------------------------------------------------------
#
# Mosaic cannot lower lane-direction stride-2 decimation/interleave, which is
# why the plain fused levels leave the lane half of the separable transfers
# to XLA — measured ~7 ms/solve of relayout glue at 8K (T(2,128) reshape
# relayouts + layout copies, tools/tpu_queue.md §2). These kernels remove it:
# transpose each 128-lane slab IN VMEM (supported, roofline — see
# transpose_pallas) and do the w-direction restrict/prolong as SUBLANE
# reshape/stack ops on the transposed block. The coarse level then lives in
# TRANSPOSED orientation and the V-cycle alternates orientation per level
# (solvers/multigrid.py vcycle_t) — every level transition is exactly one
# read + one write of the half-height intermediate, nothing else.


def _restrict_t_kernel(rh_ref, out_ref, *, w, wc, hc, bw, out_rows):
    """One (128-row, wp) slab of rh -> (out_rows, 128) transposed+restricted.

    out[jw, l] = 4 * restrict_w(rh)[row j*128+l, jw] — the x4 coarse-RHS
    scale folded into the (1, 2, 1) weights (exact: power-of-2 scaling
    commutes with the rounding of each add, so this is bitwise
    4*_restrict_axis(...) in the same association order).
    """
    j = pl.program_id(1)
    t = jnp.transpose(rh_ref[0], (1, 0))          # (wp, 128): sublanes = w
    wp = t.shape[0]
    pairs = t.reshape(wp // 2, 2, 128)
    a, b = pairs[:, 0, :], pairs[:, 1, :]          # rh cols 2j / 2j+1
    out = (a[:wc] + 2.0 * b[:wc]) + a[1 : wc + 1]
    if w % 2 == 0:
        gap = 2.0 + bw
        edge = ((a[wc - 1] + 2.0 * b[wc - 1])
                + (2.0 * (1.0 + bw) / gap) * a[wc]) + (2.0 * bw / gap) * b[wc]
        sub = jax.lax.broadcasted_iota(jnp.int32, (wc, 128), 0)
        out = jnp.where(sub == wc - 1, edge[None], out)
    # lanes beyond the true coarse height carry rh garbage (unwritten rows /
    # beyond-hc restrict leftovers) — select them to exact zero
    lane = j * 128 + jax.lax.broadcasted_iota(jnp.int32, (out_rows, 128), 1)
    full = jnp.pad(out, ((0, out_rows - wc), (0, 0)))
    out_ref[0] = jnp.where(lane < hc, full, 0.0)


def mg_restrict_t_pallas(rh: jnp.ndarray, h: int, w: int, bw: float,
                         out_rows: int, interpret: bool = False) -> jnp.ndarray:
    """4x lane-restriction of the row-restricted residual, emitted TRANSPOSED.

    rh: (C, hp2, wp) from mg_down_pallas(padded_io, rh_rows=hp2) — rows
    [0, hc) hold the row-restricted residual, lanes [0, w) valid (rows
    beyond hp//2 may be uninitialized; they are masked in-kernel). Returns
    (C, out_rows, hp2): the coarse RHS 4*restrict(r) of the (hc, wc) grid in
    TRANSPOSED orientation at the origin, exact zeros elsewhere — the input
    of the coarse vcycle_t level, whose rounded geometry is
    (out_rows = round_up(wc, th_c), lane extent = hp2).
    """
    c, hp2, wp = rh.shape
    assert hp2 % 128 == 0 and wp % 128 == 0, (hp2, wp)
    hc, wc = (h - 1) // 2, (w - 1) // 2
    assert wp >= 2 * wc + 2 and out_rows >= wc, (wp, wc, out_rows)
    return pl.pallas_call(
        partial(_restrict_t_kernel, w=w, wc=wc, hc=hc, bw=bw,
                out_rows=out_rows),
        grid=(c, hp2 // 128),
        in_specs=[pl.BlockSpec((1, 128, wp), lambda ci, j: (ci, j, 0))],
        out_specs=pl.BlockSpec((1, out_rows, 128), lambda ci, j: (ci, 0, j)),
        out_shape=jax.ShapeDtypeStruct((c, out_rows, hp2), jnp.float32),
        compiler_params=_vmem_params(128, wp, interpret),
        interpret=interpret,
    )(rh)


def _prolong_t_kernel(ec_ref, out_ref, *, w, wc, bw, wp):
    """One (hp_c, 128)-lane window of ec_t -> (128, wp) prolonged fine rows.

    Sublane-direction bilinear interleave of the coarse values (the
    transposed image of multigrid._prolong_axis), then transpose back to
    natural orientation. Lanes of the input beyond the true coarse height
    are exact zeros by the padded-space invariant, so the matching output
    rows come out zero with no masking.
    """
    e = ec_ref[0]                                   # (hp_c, 128): sublanes = wc
    ep = jnp.pad(e, ((1, 1), (0, 0)))               # zero Dirichlet pads
    mids = 0.5 * (ep[: wc + 1] + ep[1 : wc + 2])
    pairs = jnp.stack([mids[:wc], e[:wc]], axis=1).reshape(2 * wc, 128)
    if w % 2 == 1:
        res = jnp.concatenate([pairs, mids[wc : wc + 1]], axis=0)
    else:
        gap = 2.0 + bw
        last = e[wc - 1 : wc]
        res = jnp.concatenate(
            [pairs[: w - 2], last * ((1.0 + bw) / gap), last * (bw / gap)],
            axis=0)
    out = jnp.pad(res, ((0, wp - w), (0, 0)))
    out_ref[0] = jnp.transpose(out, (1, 0))


def mg_prolong_t_pallas(ec_t: jnp.ndarray, h: int, w: int, bw: float,
                        out_rows: int, wp: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Lane-prolongation of the TRANSPOSED coarse correction, back to natural.

    ec_t: (C, hp_c, hp2) — the coarse vcycle_t solution, logical (wc, hc) at
    the origin, exact zeros outside. Returns (C, out_rows, wp) f32 =
    multigrid._prolong_axis(ec, w, bw) zero-extended — mg_up_pallas's e_lane
    operand (out_rows = hp2 >= hp//2 rows, multiple of 128).
    """
    c, hp_c, lanes = ec_t.shape
    wc = (w - 1) // 2
    assert lanes % 128 == 0 and out_rows % 128 == 0, (lanes, out_rows)
    assert lanes >= out_rows, (lanes, out_rows)
    assert hp_c >= wc and wp >= w, (hp_c, wc, wp, w)
    return pl.pallas_call(
        partial(_prolong_t_kernel, w=w, wc=wc, bw=bw, wp=wp),
        grid=(c, out_rows // 128),
        in_specs=[pl.BlockSpec((1, hp_c, 128), lambda ci, j: (ci, 0, j))],
        out_specs=pl.BlockSpec((1, 128, wp), lambda ci, j: (ci, j, 0)),
        out_shape=jax.ShapeDtypeStruct((c, out_rows, wp), jnp.float32),
        compiler_params=_vmem_params(128, wp, interpret),
        interpret=interpret,
    )(ec_t)


# ---------------------------------------------------------------------------
# Strip-tiled fused pre-processing: erode x3 + guidance + divergence
# ---------------------------------------------------------------------------


def _pre_strip_kernel(dest_ref, patch_ref, mask_ref, out_ref, *, flags, mixed_rule, th, h, w, wp):
    m = _M
    i = pl.program_id(1)
    rows = i * th - m + jax.lax.broadcasted_iota(jnp.int32, (th + 2 * m, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th + 2 * m, wp), 1)
    in_dom = ((rows >= 0) & (rows < h) & (cols < w)).astype(jnp.float32)

    # inputs may arrive as u8 (serve path: 4x less HBM traffic than f32);
    # cast once in VMEM. Mosaic lacks a direct u8->f32 cast; hop via int32.
    def to_f32(x):
        if x.dtype == jnp.uint8:
            return x.astype(jnp.int32).astype(jnp.float32)
        return x

    d = to_f32(dest_ref[0])
    p = to_f32(patch_ref[0])
    msk = to_f32(mask_ref[:]) * in_dom  # {0,1}; zero outside ROI = erosion border

    # 3x binary erosion (min over 3x3), zero border via the zero pad/mask
    def erode(x):
        xp = jnp.pad(x, ((1, 1), (1, 1)))
        out = x
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                out = jnp.minimum(out, xp[1 + dy : 1 + dy + x.shape[0], 1 + dx : 1 + dx + x.shape[1]])
        return out

    me = erode(erode(erode(msk)))

    # forward-difference gradients, zero at the ROI's last column/row. The
    # lane fetches go through _lane_neighbors (roll form when w < wp): the
    # in_dom / cols-range selects mask exactly the lanes where the cyclic
    # wrap differs from the zero-fill pad.
    lsh, rsh = _lane_neighbors(w, wp)

    def gradx(img):
        return jnp.where(cols < w - 1, rsh(img) - img, 0.0) * in_dom

    def grady(img):
        s = jnp.pad(img[1:, :], ((0, 1), (0, 0)))
        return jnp.where(rows < h - 1, s - img, 0.0) * in_dom

    gx_d, gy_d = gradx(d), grady(d)
    gx_p, gy_p = gradx(p), grady(p)
    if flags == 2:  # MIXED_CLONE (see ops/guidance.py for the rule variants)
        if mixed_rule == "norm":
            take_d = (gx_p * gx_p + gy_p * gy_p) < (gx_d * gx_d + gy_d * gy_d)
        else:  # cv2 bit-parity: strict |gx_p - gy_p| > |gx_d - gy_d|
            take_d = jnp.abs(gx_p - gy_p) <= jnp.abs(gx_d - gy_d)
        gx_p = jnp.where(take_d, gx_d, gx_p)
        gy_p = jnp.where(take_d, gy_d, gy_p)
    gx = (1.0 - me) * gx_d + me * gx_p
    gy = (1.0 - me) * gy_d + me * gy_p

    # backward divergence: lap[y, x] = gx[y,x]-gx[y,x-1] + gy[y,x]-gy[y-1,x]
    # (gx is in_dom-masked, so lsh's wrap lane at col 0 is an exact zero)
    lap = (gx - lsh(gx)) + (gy - jnp.pad(gy[:-1, :], ((1, 0), (0, 0))))
    out_ref[0] = lap[m : m + th, :]


def preprocess_rhs_pallas(
    dest_roi: jnp.ndarray,
    patch: jnp.ndarray,
    mask_roi: jnp.ndarray,
    flags: int = 1,
    mixed_rule: str = "opencv",
    interpret: bool = False,
):
    """Fused RHS: (C,H,W) dest/patch + (H,W) u8 mask -> (C,H-2,W-2) f32.

    dest_roi/patch may be u8 (serve path: the kernel casts in VMEM, reading
    a quarter of the f32 HBM traffic) or f32 (MONOCHROME's pre-grayed
    non-integer patch). One strip-tiled pass computes erode(x3) + guidance +
    divergence; the Dirichlet boundary subtraction (4 edge vectors) is
    folded on top in XLA. MONOCHROME_TRANSFER pre-grays the patch on the
    caller side; this kernel handles NORMAL (flags=1) and MIXED (flags=2).
    """
    c, h, w = dest_roi.shape
    wp = _round_up(w, 128)
    th = _strip_height(wp, n_windows=3)
    hp = _round_up(h, th)
    pad3 = ((0, 0), (_M, hp - h + _M), (0, wp - w))
    pad2 = ((_M, hp - h + _M), (0, wp - w))
    dp = jnp.pad(dest_roi, pad3)
    pp = jnp.pad(patch, pad3)
    mp = jnp.pad((mask_roi != 0).astype(jnp.uint8), pad2)

    lap = pl.pallas_call(
        partial(_pre_strip_kernel, flags=flags, mixed_rule=mixed_rule,
                th=th, h=h, w=w, wp=wp),
        grid=(c, hp // th),
        in_specs=[
            _halo_spec(th, wp),
            _halo_spec(th, wp),
            _halo_spec_2d(th, wp),
        ],
        out_specs=pl.BlockSpec((1, th, wp), lambda c, i: (c, i, 0)),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
        interpret=interpret,
    )(dp, pp, mp)

    g = lap[:, 1 : h - 1, 1 : w - 1]
    d = dest_roi.astype(jnp.float32)  # only the 4 edge vectors are touched
    g = g.at[:, 0, :].add(-d[:, 0, 1:-1])
    g = g.at[:, -1, :].add(-d[:, -1, 1:-1])
    g = g.at[:, :, 0].add(-d[:, 1:-1, 0])
    g = g.at[:, :, -1].add(-d[:, 1:-1, -1])
    return g


def _erode3_kernel(mask_ref, out_ref, *, th, h, w, wp):
    """3x binary 3x3 erosion of the {0,1} mask, strip-tiled, u8 in/out.

    3 iterations of a 3x3 square erosion == one 7x7 square erosion
    (structuring elements compose), which is SEPARABLE: a radius-3 vertical
    min then a radius-3 horizontal min, each built log-style (radius-1 min,
    then min with its +-2 shifts) — 8 shifted mins instead of the naive 27,
    ~3x less VPU work (this kernel is compute-bound, 0.18 ms at 2400x1552).
    Zero padding/out-of-domain zeros propagate identically through min.
    """
    i = pl.program_id(0)
    m = _M
    rows = i * th - m + jax.lax.broadcasted_iota(jnp.int32, (th + 2 * m, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th + 2 * m, wp), 1)
    in_dom = ((rows >= 0) & (rows < h) & (cols < w)).astype(jnp.float32)
    msk = mask_ref[:].astype(jnp.int32).astype(jnp.float32) * in_dom

    def min_r3(x, axis):
        def sh(a, d):  # shift by d along axis, zero-fill
            pad = [(0, 0), (0, 0)]
            if d > 0:
                pad[axis] = (d, 0)
                sl = [slice(None)] * 2
                sl[axis] = slice(0, a.shape[axis] - d)
            else:
                pad[axis] = (0, -d)
                sl = [slice(None)] * 2
                sl[axis] = slice(-d, a.shape[axis])
            return jnp.pad(a[tuple(sl)], pad)

        m1 = jnp.minimum(x, jnp.minimum(sh(x, 1), sh(x, -1)))
        return jnp.minimum(m1, jnp.minimum(sh(m1, 2), sh(m1, -2)))

    me = min_r3(min_r3(msk, 0), 1)
    out_ref[:] = me[m : m + th, :].astype(jnp.int32).astype(jnp.uint8)


def erode3_pallas(mask01: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(H, W) u8 {0,1} mask -> 3x-eroded {0,1} u8, one strip pass."""
    h, w = mask01.shape
    wp = _round_up(w, 128)
    th = _strip_height(wp, n_windows=1)
    hp = _round_up(h, th)
    mp = jnp.pad(mask01, ((_M, hp - h + _M), (0, wp - w)))
    out = pl.pallas_call(
        partial(_erode3_kernel, th=th, h=h, w=w, wp=wp),
        grid=(hp // th,),
        in_specs=[pl.BlockSpec((pl.Element(th + 2 * _M), pl.Element(wp)),
                               lambda i: (pl.multiple_of(i * th, 8), 0))],
        out_specs=pl.BlockSpec((th, wp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.uint8),
        interpret=interpret,
    )(mp)
    return out[:h, :w]


def _fused_lap_tile(dest_ref, patch_ref, me_ref, *, flags, mixed_rule, th, h,
                    w, wpk):
    """Shared body of the padded preprocess kernels (_pre_strip_kernel_t /
    _pre_strip_kernel_p): the ghosted-window coordinate preamble, u8->f32
    VMEM casts, guidance, divergence, the in-kernel Dirichlet fold (ref
    pre_process_kernel_lapXY, seamlessClone_imp.cpp:1992-2007), and
    interior-validity zeroing on one ghosted (th + 2M, wpk) window.
    Returns ``(lap, rsh)`` — the masked lap tile plus the lane right-fetch
    (the natural emitter shifts with it); the callers only differ in how
    they shift/orient the emission."""
    m = _M
    i = pl.program_id(1)
    rows = i * th - m + jax.lax.broadcasted_iota(jnp.int32, (th + 2 * m, wpk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th + 2 * m, wpk), 1)
    in_dom = ((rows >= 0) & (rows < h) & (cols < w)).astype(jnp.float32)
    # lane fetches via _lane_neighbors (roll form: w < wpk always here —
    # the wrappers size wpk past max(w, wp_out + 1); selects mask the wraps)
    lsh, rsh = _lane_neighbors(w, wpk)

    def to_f32(x):
        if x.dtype == jnp.uint8:
            return x.astype(jnp.int32).astype(jnp.float32)
        return x

    me = to_f32(me_ref[:]) * in_dom

    def gradx(img):
        return jnp.where(cols < w - 1, rsh(img) - img, 0.0) * in_dom

    def grady(img):
        s = jnp.pad(img[1:, :], ((0, 1), (0, 0)))
        return jnp.where(rows < h - 1, s - img, 0.0) * in_dom

    d = to_f32(dest_ref[0])
    p = to_f32(patch_ref[0])
    gx_d, gy_d = gradx(d), grady(d)
    gx_p, gy_p = gradx(p), grady(p)
    if flags == 2:
        if mixed_rule == "norm":
            take_d = (gx_p * gx_p + gy_p * gy_p) < (gx_d * gx_d + gy_d * gy_d)
        else:
            take_d = jnp.abs(gx_p - gy_p) <= jnp.abs(gx_d - gy_d)
        gx_p = jnp.where(take_d, gx_d, gx_p)
        gy_p = jnp.where(take_d, gy_d, gy_p)
    gx = (1.0 - me) * gx_d + me * gx_p
    gy = (1.0 - me) * gy_d + me * gy_p
    lap = (gx - lsh(gx)) + (gy - jnp.pad(gy[:-1, :], ((1, 0), (0, 0))))
    # Dirichlet boundary subtraction, folded in: interior-adjacent rows/cols
    # subtract the destination's border pixel (row 0 / h-1, col 0 / w-1)
    d_up = jnp.pad(d[:-1, :], ((1, 0), (0, 0)))   # d at row-1
    d_dn = jnp.pad(d[1:, :], ((0, 1), (0, 0)))    # d at row+1
    lap = lap - jnp.where(rows == 1, d_up, 0.0) - jnp.where(rows == h - 2, d_dn, 0.0)
    lap = lap - jnp.where(cols == 1, d[:, 0:1], 0.0)
    lap = lap - jnp.where(cols == w - 2, d[:, w - 1 : w], 0.0)
    # zero everything outside the interior (the padded solver chains require
    # exact zeros in the padding)
    valid = (rows >= 1) & (rows <= h - 2) & (cols >= 1) & (cols <= w - 2)
    return jnp.where(valid, lap, 0.0), rsh


def _padded_pre_inputs(dest_roi, patch, mask_roi, hp_out: int, wpk: int,
                       interpret: bool):
    """Shared host scaffolding of the padded preprocess wrappers: pad the
    (C, H, W) dest/patch and the hoisted-erode mask into the ghosted
    (hp_out + 2M, wpk) window space the halo specs read."""
    h, w = dest_roi.shape[1], dest_roi.shape[2]
    pad3 = ((0, 0), (_M, hp_out - h + _M), (0, wpk - w))
    pad2 = pad3[1:]
    dp = jnp.pad(dest_roi, pad3)
    pp = jnp.pad(patch, pad3)
    me = erode3_pallas((mask_roi != 0).astype(jnp.uint8), interpret=interpret)
    return dp, pp, jnp.pad(me, pad2)


def _pre_strip_kernel_t(dest_ref, patch_ref, me_ref, out_ref, *, flags,
                        mixed_rule, th, h, w, wp_out, wpk):
    """Per-(channel, strip) preprocess emitting the PADDED TRANSPOSED RHS.

    Serve-path optimizations over ``_pre_strip_kernel``:
    - the 3x3-erode chain (the dominant VPU cost: 27 shifted mins per
      application) is hoisted into its own shared pass (erode3_pallas)
      instead of being recomputed per channel;
    - the Dirichlet boundary subtraction (ref pre_process_kernel_lapXY,
      seamlessClone_imp.cpp:1992-2007) is folded IN-KERNEL — the edge
      destination pixels it needs are always inside the strip's halo —
      instead of an XLA ``at[].add`` pass over the whole array (~0.63 ms
      at 2400x1552);
    - the interior is written TRANSPOSED at the ORIGIN of a zero-padded
      (C, WPo, HPo) slab (both 128-multiples), so the whole DST-GEMM chain
      (solve_dst_gemm_pl) can run in padded space with zero-padded V
      matrices: no inter-stage relayout slice/pad copies anywhere
      (measured ~2.4 ms of the serve step).
    """
    lap, _ = _fused_lap_tile(dest_ref, patch_ref, me_ref, flags=flags,
                             mixed_rule=mixed_rule, th=th, h=h, w=w, wpk=wpk)
    # shift the interior to the origin, emit transposed:
    # out[j, r] = lap[y = r+1, x = j+1]
    m = _M
    lap_s = lap[m + 1 : m + 1 + th, :]      # rows y = i*th+1 .. i*th+th
    # drop border column 0 AFTER the transpose: a sublane slice, which
    # Mosaic supports (the pre-transpose lane-shift pad does not lower)
    t = jnp.transpose(lap_s, (1, 0))        # (wpk, th)
    out_ref[0] = t[1 : 1 + wp_out, :]


def preprocess_rhs_transposed_pallas(
    dest_roi: jnp.ndarray,
    patch: jnp.ndarray,
    mask_roi: jnp.ndarray,
    flags: int = 1,
    mixed_rule: str = "opencv",
    interpret: bool = False,
):
    """Fused RHS, TRANSPOSED + PADDED: inputs as preprocess_rhs_pallas,
    output (C, WPo, HPo) f32 with WPo/HPo = 128-roundups of (W-2, H-2), the
    transposed interior RHS at the origin and exact zeros in the padding,
    Dirichlet edges already applied — ready for solve_dst_gemm_pl's
    padded-space chain with no slice/pad copies at either end."""
    c, h, w = dest_roi.shape
    h2, w2 = h - 2, w - 2
    wp_out = _round_up(w2, 128)
    hp_out = _round_up(h2, 128)
    # the kernel left-shifts the strip by one lane before emitting, so the
    # read width must cover wp_out + 1 columns (cf. the postprocess bwp fix)
    wpk = _round_up(max(w, wp_out + 1), 128)
    th = 128  # lane-dim write offsets must be 128-aligned
    dp, pp, mep = _padded_pre_inputs(dest_roi, patch, mask_roi, hp_out, wpk,
                                     interpret)

    return pl.pallas_call(
        partial(_pre_strip_kernel_t, flags=flags, mixed_rule=mixed_rule,
                th=th, h=h, w=w, wp_out=wp_out, wpk=wpk),
        grid=(c, hp_out // th),
        in_specs=[
            _halo_spec(th, wpk),
            _halo_spec(th, wpk),
            _halo_spec_2d(th, wpk),
        ],
        out_specs=pl.BlockSpec((1, wp_out, th), lambda ci, i: (ci, 0, i)),
        out_shape=jax.ShapeDtypeStruct((c, wp_out, hp_out), jnp.float32),
        # f32 body temporaries overflow the default ~17 MB scoped-VMEM
        # stack past wpk ~ 4600 (measured OOM at the 16.5 MP patch)
        compiler_params=_vmem_params(th, wpk, interpret),
        interpret=interpret,
    )(dp, pp, mep)


def _shifted_interior(lap, rsh, th, wp_out):
    """Shared natural-orientation emission: out[r, j] = lap[y=r+1, x=j+1]
    — sublane shift via the strip slice, lane shift via the cyclic roll
    (wrapped lanes carry the exact zeros the validity mask wrote)."""
    m = _M
    return rsh(lap[m + 1 : m + 1 + th, :])[:, :wp_out]


def _pre_strip_kernel_p(dest_ref, patch_ref, me_ref, out_ref, *, flags,
                        mixed_rule, th, h, w, wp_out, wpk):
    """Per-(channel, strip) preprocess emitting the PADDED NATURAL RHS.

    The multigrid twin of ``_pre_strip_kernel_t`` (same fused math via
    _fused_lap_tile: hoisted erode, in-kernel Dirichlet fold) emitting the
    interior RHS at the ORIGIN of a zero-padded natural-orientation
    (C, HP, WP) slab sized by the caller to the quarter-plane multigrid's
    dense footprint — solve_multigrid(padded="q", true_hw=...) then starts
    with zero XLA slice/pad passes. Replaces the r1-era natural kernel on
    the mg serve path, which re-ran the erode chain per channel, paid an
    XLA at[].add Dirichlet pass, and emitted an exact-size slice the solver
    immediately re-padded: 2.89 ms/frame at 8K vs ~0.5 for this kernel
    (xprof 2026-08-20, docs/PERF.md).
    """
    lap, rsh = _fused_lap_tile(dest_ref, patch_ref, me_ref, flags=flags,
                               mixed_rule=mixed_rule, th=th, h=h, w=w, wpk=wpk)
    out_ref[0] = _shifted_interior(lap, rsh, th, wp_out)


def preprocess_rhs_padded_pallas(
    dest_roi: jnp.ndarray,
    patch: jnp.ndarray,
    mask_roi: jnp.ndarray,
    out_hw: tuple[int, int],
    flags: int = 1,
    mixed_rule: str = "opencv",
    interpret: bool = False,
):
    """Fused RHS, NATURAL orientation + PADDED: inputs as
    preprocess_rhs_pallas, output (C, HP, WP) f32 with (HP, WP) = ``out_hw``
    (the quarter-plane geometry's dense footprint: HP a 128-multiple
    >= H-2, WP a 128-multiple >= W-2), the interior RHS at the origin,
    exact zeros in the padding, Dirichlet edges already applied — ready for
    ``solve_multigrid(padded="q", true_hw=(H-2, W-2))`` with no slice/pad
    copies at either end (the mg twin of preprocess_rhs_transposed_pallas).

    The serve pipeline ships the further-fused
    ``preprocess_rhs_quarters_pallas``; this dense variant is the
    validation bridge (the quarters kernel is pinned bit-equal to it,
    which is pinned to the generic kernel and the NumPy oracle) and the
    dense ``true_hw`` entry for callers that want the padded slab itself.
    """
    c, h, w = dest_roi.shape
    hp_out, wp_out = out_hw
    th = 128  # divides the q geometry's HP (a 256-multiple) and any 128-multiple
    assert hp_out % th == 0 and wp_out % 128 == 0, out_hw
    assert hp_out >= h - 2 and wp_out >= w - 2, (out_hw, dest_roi.shape)
    # the kernel left-shifts by one lane before emitting, so the read width
    # must cover wp_out + 1 columns AND keep w < wpk (roll form, exact wrap)
    wpk = _round_up(max(w, wp_out + 1), 128)
    dp, pp, mep = _padded_pre_inputs(dest_roi, patch, mask_roi, hp_out, wpk,
                                     interpret)

    return pl.pallas_call(
        partial(_pre_strip_kernel_p, flags=flags, mixed_rule=mixed_rule,
                th=th, h=h, w=w, wp_out=wp_out, wpk=wpk),
        grid=(c, hp_out // th),
        in_specs=[
            _halo_spec(th, wpk),
            _halo_spec(th, wpk),
            _halo_spec_2d(th, wpk),
        ],
        out_specs=pl.BlockSpec((1, th, wp_out), lambda ci, i: (ci, i, 0)),
        out_shape=jax.ShapeDtypeStruct((c, hp_out, wp_out), jnp.float32),
        # same scoped-VMEM raise as the transposed kernel: the f32 body
        # temporaries overflow the default stack limit past wpk ~ 4600
        compiler_params=_vmem_params(th, wpk, interpret),
        interpret=interpret,
    )(dp, pp, mep)


def _pre_strip_kernel_pq(dest_ref, patch_ref, me_ref, out_ref, *, flags,
                         mixed_rule, th, h, w, wp_out, wpk):
    """Quarter-emitting preprocess: one 256-row natural strip -> one
    (4, 128, WP/2) checkerboard-decomposed RHS block, in a single pass.

    Same fused lap as the padded twin, then the dense->quarters transpose
    trick runs IN VMEM (pallas_mg_quarter.dense_to_quarters_tile) — the
    multigrid solver's to_quarters_pallas round-trip over the full RHS
    (read+write ~2x129 MB at 8K, 0.40-0.43 ms measured) disappears.
    """
    lap, rsh = _fused_lap_tile(dest_ref, patch_ref, me_ref, flags=flags,
                               mixed_rule=mixed_rule, th=th, h=h, w=w, wpk=wpk)
    from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import (
        dense_to_quarters_tile,
    )

    ee, eo, oe, oo = dense_to_quarters_tile(
        _shifted_interior(lap, rsh, th, wp_out))    # (th, WP) dense strip
    out_ref[0, 0] = ee
    out_ref[0, 1] = eo
    out_ref[0, 2] = oe
    out_ref[0, 3] = oo


def preprocess_rhs_quarters_pallas(
    dest_roi: jnp.ndarray,
    patch: jnp.ndarray,
    mask_roi: jnp.ndarray,
    out_hw: tuple[int, int],
    flags: int = 1,
    mixed_rule: str = "opencv",
    interpret: bool = False,
):
    """Fused RHS born as CHECKERBOARD QUARTERS: inputs as
    preprocess_rhs_pallas, output (C, 4, HP/2, WP/2) f32 — the quarter
    decomposition solve_multigrid's padded="q" path iterates on, with the
    interior RHS at the origin of each parity plane and exact zeros in the
    padding. ``out_hw`` is the quarter geometry's DENSE footprint
    (2*hq, 2*wq2) as for preprocess_rhs_padded_pallas; feed the result to
    ``solve_multigrid(padded="q", true_hw=(H-2, W-2))`` directly.
    """
    c, h, w = dest_roi.shape
    hp_out, wp_out = out_hw
    th = 256  # one strip = two quarter-row blocks of 128
    assert hp_out % th == 0 and wp_out % 256 == 0, out_hw
    assert hp_out >= h - 2 and wp_out >= w - 2, (out_hw, dest_roi.shape)
    wpk = _round_up(max(w, wp_out + 1), 128)
    dp, pp, mep = _padded_pre_inputs(dest_roi, patch, mask_roi, hp_out, wpk,
                                     interpret)

    return pl.pallas_call(
        partial(_pre_strip_kernel_pq, flags=flags, mixed_rule=mixed_rule,
                th=th, h=h, w=w, wp_out=wp_out, wpk=wpk),
        grid=(c, hp_out // th),
        in_specs=[
            _halo_spec(th, wpk),
            _halo_spec(th, wpk),
            _halo_spec_2d(th, wpk),
        ],
        out_specs=pl.BlockSpec((1, 4, th // 2, wp_out // 2),
                               lambda ci, i: (ci, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (c, 4, hp_out // 2, wp_out // 2), jnp.float32),
        compiler_params=_vmem_params(th, wpk, interpret),
        interpret=interpret,
    )(dp, pp, mep)


# ---------------------------------------------------------------------------
# Layout-aware post-processing: transposed solve output -> u8 blended ROI
# ---------------------------------------------------------------------------


def _post_strip_kernel(u_ref, dest_ref, out_ref, *, th, bh, bw, w2p):
    """One (TH, BWp) output strip: transpose the (W2p, TH) solve slab in VMEM,
    clamp + truncate-cast, and merge with the destination borders."""
    i = pl.program_id(1)
    u_tr = jnp.transpose(u_ref[0], (1, 0))  # (TH, W2p)
    # out column j holds interior column j-1; shift right by one and pad to BWp
    iv = jnp.pad(u_tr, ((0, 0), (1, out_ref.shape[2] - 1 - w2p)))
    rows = i * th + jax.lax.broadcasted_iota(jnp.int32, iv.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, iv.shape, 1)
    interior = (rows >= 1) & (rows <= bh - 2) & (cols >= 1) & (cols <= bw - 2)
    # Mosaic lacks a direct f32->u8 cast; go through int32 (same truncation)
    val = jnp.clip(iv, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)
    out_ref[0] = jnp.where(interior, val, dest_ref[0])


def postprocess_transposed_pallas(
    u_t: jnp.ndarray,
    dest_roi_u8: jnp.ndarray,
    interpret: bool = False,
):
    """Blend a TRANSPOSED interior solution into the destination ROI.

    u_t: (C, W-2, H-2) f32 — the solve output in transposed orientation
    (solve_dst_gemm(transposed_output=True)). XLA's GEMM schedule naturally
    ends in this orientation (docs/PERF.md op profile), so consuming it here
    removes the final physical un-transpose AND the cast fusion: one strip
    pass transposes each slab in VMEM, clamps, truncate-casts and merges the
    ROI borders. dest_roi_u8: (C, H, W) u8; returns (C, H, W) u8.
    """
    c, bh, bw = dest_roi_u8.shape
    w2, h2 = u_t.shape[1], u_t.shape[2]
    assert (w2, h2) == (bw - 2, bh - 2), (u_t.shape, dest_roi_u8.shape)
    th = 128
    hp = _round_up(bh, th)
    w2p = _round_up(w2, 8)
    # The kernel right-shifts the (TH, W2p) slab by one lane before masking,
    # so the output lane dim must hold W2p+1 columns: without the max() the
    # shift pad went negative for bw % 128 in {0, 123..127} (VERDICT weak #1).
    bwp = max(_round_up(bw, 128), _round_up(w2p + 1, 128))
    # u_pad[:, :, r] corresponds to output row r (leading zero column)
    u_pad = jnp.pad(u_t, ((0, 0), (0, w2p - w2), (1, hp - h2 - 1)))
    dest_pad = jnp.pad(dest_roi_u8, ((0, 0), (0, hp - bh), (0, bwp - bw)))

    out = pl.pallas_call(
        partial(_post_strip_kernel, th=th, bh=bh, bw=bw, w2p=w2p),
        grid=(c, hp // th),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(w2p), pl.Element(th)),
                lambda ci, i: (ci, 0, pl.multiple_of(i * th, 128)),
            ),
            pl.BlockSpec((1, th, bwp), lambda ci, i: (ci, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, bwp), lambda ci, i: (ci, i, 0)),
        out_shape=jax.ShapeDtypeStruct((c, hp, bwp), jnp.uint8),
        interpret=interpret,
    )(u_pad, dest_pad)
    return out[:, :bh, :bw]


# ---------------------------------------------------------------------------
# Strip-tiled f32 transpose (optionally fused with the spectral divide)
# ---------------------------------------------------------------------------


def _transpose_kernel(x_ref, out_ref):
    out_ref[0] = jnp.transpose(x_ref[0], (1, 0))


def _transpose_div_kernel(x_ref, la_ref, lb_ref, out_ref):
    xt = jnp.transpose(x_ref[0], (1, 0))  # (Bp, ta)
    out_ref[0] = xt / (lb_ref[0][:, None] + la_ref[0][None, :])


def transpose_pallas(x: jnp.ndarray, lam_a=None, lam_b=None,
                     interpret: bool = False) -> jnp.ndarray:
    """(C, A, B) f32 -> (C, B, A), one strip pass at ~the HBM roofline.

    XLA's own relayout transposes between the DST chain's GEMMs run ~9x off
    the memory roofline at 2400x1552 (docs/PERF.md); this kernel reads
    (ta=128, B) slabs, transposes them in VMEM and writes (B, 128) column
    blocks. With ``lam_a`` (len A) and ``lam_b`` (len B) it also divides by
    ``lam_a[a] + lam_b[b]`` — the spectral-divide step fused for free into
    the middle transpose of solve_dst_gemm_pl. Padding lanes divide by a
    1e9-padded eigenvalue sum (never zero: real DST eigenvalues lie in
    (-4, 0)), and are sliced away.
    """
    c, a, b = x.shape
    ta = 128
    ap = _round_up(a, ta)
    bp = _round_up(b, 8)
    xp = jnp.pad(x, ((0, 0), (0, ap - a), (0, bp - b)))
    grid = (c, ap // ta)
    if lam_a is None:
        out = pl.pallas_call(
            _transpose_kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((1, ta, bp), lambda ci, i: (ci, i, 0))],
            out_specs=pl.BlockSpec((1, bp, ta), lambda ci, i: (ci, 0, i)),
            out_shape=jax.ShapeDtypeStruct((c, bp, ap), jnp.float32),
            interpret=interpret,
        )(xp)
    else:
        la = jnp.pad(jnp.asarray(lam_a, jnp.float32), (0, ap - a),
                     constant_values=1e9)[None, :]
        lb = jnp.pad(jnp.asarray(lam_b, jnp.float32), (0, bp - b),
                     constant_values=1e9)[None, :]
        out = pl.pallas_call(
            _transpose_div_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, ta, bp), lambda ci, i: (ci, i, 0)),
                pl.BlockSpec((1, ta), lambda ci, i: (0, i)),
                pl.BlockSpec((1, bp), lambda ci, i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bp, ta), lambda ci, i: (ci, 0, i)),
            out_shape=jax.ShapeDtypeStruct((c, bp, ap), jnp.float32),
            interpret=interpret,
        )(xp, la, lb)
    return out[:, :b, :a]


# ---------------------------------------------------------------------------
# Natural-orientation post-processing (for the solve_dst_gemm_pl chain)
# ---------------------------------------------------------------------------


def _clamp_cast_kernel(u_ref, out_ref):
    out_ref[0] = jnp.clip(u_ref[0], 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)


def clamp_cast_pallas(u: jnp.ndarray, out_hw: tuple[int, int] | None = None,
                      interpret: bool = False) -> jnp.ndarray:
    """(C, H2, W2) f32 solution -> u8, clamp + OpenCV truncate-cast.

    The serve fast path pastes the solved INTERIOR directly into the
    destination at a (+1, +1) inset — the ROI's border ring is by
    construction identical to what the destination already holds, so
    blending against dest (ref post_processing, seamlessClone_imp.cpp:
    2078-2103) is unnecessary and this kernel needs no dest operand at all
    (XLA staged that operand through memory space 1 at ~2.8 ms/frame).

    ``out_hw`` slices the returned u8 to (h2, w2) — for padded-chain inputs
    (solve_dst_gemm_pl output) whose interior sits at the origin; the slice
    happens on u8, a quarter of the f32 traffic, and typically fuses into
    the caller's layout op.
    """
    c, h2, w2 = u.shape
    th = 128
    hp = _round_up(h2, th)
    wp = _round_up(w2, 128)
    up = jnp.pad(u, ((0, 0), (0, hp - h2), (0, wp - w2)))
    out = pl.pallas_call(
        _clamp_cast_kernel,
        grid=(c, hp // th),
        in_specs=[pl.BlockSpec((1, th, wp), lambda ci, i: (ci, i, 0))],
        out_specs=pl.BlockSpec((1, th, wp), lambda ci, i: (ci, i, 0)),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.uint8),
        interpret=interpret,
    )(up)
    oh, ow = out_hw if out_hw is not None else (h2, w2)
    return out[:, :oh, :ow]


import os as _os

_PASTE_CW = int(_os.environ.get("SCL_PASTE_CW", "512"))
# paste/guarded-clamp column block: 4x fewer grid steps than 128
# (741 -> ~230 at 2400x1552 — both kernels were per-grid-step-overhead
# bound, 0.34/0.21 ms vs ~0.05 ms of DMA; see docs/PERF.md op profile).
# SCL_PASTE_CW is a trace-time A/B knob like SCL_MG_TH.


def clamp_cast_guarded_pallas(u: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Like clamp_cast_pallas but emits into a GUARDED slab for the paste.

    Output (C, 128 + HP + 128, CW + WP5 + CW) u8 (CW = _PASTE_CW,
    WP5 = WP rounded up to CW) with the cast data written at block offset
    (+1, +1); the guard ring is left UNWRITTEN (uninitialized —
    paste_interior_pallas's overlapping read windows may touch it but every
    such value is masked out by its in-range select, as is the
    [WP, WP5) ragged-block garbage). The guard ring costs no DMA; it only
    exists so the paste kernel's 2x-overlapping windows never index out of
    bounds.
    """
    c, hp, wp = u.shape
    th, cw = 128, _PASTE_CW
    wp5 = _round_up(wp, cw)
    assert hp % th == 0 and wp % 128 == 0, (hp, wp)
    out = pl.pallas_call(
        _clamp_cast_kernel,
        grid=(c, hp // th, wp5 // cw),
        in_specs=[pl.BlockSpec((1, th, cw), lambda ci, i, j: (ci, i, j))],
        out_specs=pl.BlockSpec((1, th, cw), lambda ci, i, j: (ci, i + 1, j + 1)),
        out_shape=jax.ShapeDtypeStruct((c, hp + 2 * th, wp5 + 2 * cw), jnp.uint8),
        interpret=interpret,
    )(u)
    return out


def _clamp_guard_q_kernel(q_ref, out_ref):
    """One (4, 128, DCW/2) quarter block -> a clamped u8 (256, DCW) dense
    block of the guarded slab (interleave + clamp + truncate-cast fused)."""
    from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import (
        quarters_to_dense_tile,
    )

    ee, eo, oe, oo = (q_ref[0, i] for i in range(4))
    dense = quarters_to_dense_tile(ee, eo, oe, oo)
    out_ref[0] = jnp.clip(dense, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)


def clamp_cast_guarded_quarters_pallas(uq: jnp.ndarray,
                                       interpret: bool = False) -> jnp.ndarray:
    """clamp_cast_guarded straight from the CHECKERBOARD QUARTERS solve.

    uq: (C, 4, HQ, WQ) f32 (solve_multigrid padded_output="quarters") —
    the quarters->dense interleave runs IN VMEM per block, so the solver's
    from_quarters_pallas full-array round-trip plus the dense re-read
    disappear from the serve tail. Output: a guarded slab for
    paste_interior_pallas with ring_r=256 (the row ring is 256 so the
    256-row dense blocks stay ring-aligned; the column ring stays
    _PASTE_CW, written in DCW-wide blocks where DCW is the largest of
    {256, 128} dividing it). As with the dense guarded kernel, the ring
    and the [WP, WP5) ragged region are unwritten garbage the paste's
    in-range select masks.
    """
    c, four, hq, wq2 = uq.shape
    assert four == 4 and hq % 128 == 0 and wq2 % 128 == 0, uq.shape
    cw = _PASTE_CW
    hp, wp = 2 * hq, 2 * wq2
    wp5 = _round_up(wp, cw)
    ring_r = 256
    # dense column-block width: the data must land at column offset cw
    # exactly, so the block width must divide cw (SCL_PASTE_CW=128 A/B:
    # 256-wide blocks would place data at offset 0 and silently corrupt
    # the paste — caught in review 2026-08-20)
    dcw = 256 if cw % 256 == 0 else 128
    assert cw % dcw == 0, (cw, dcw)
    out = pl.pallas_call(
        _clamp_guard_q_kernel,
        grid=(c, hq // 128, wq2 // (dcw // 2)),
        in_specs=[pl.BlockSpec((1, 4, 128, dcw // 2),
                               lambda ci, i, j: (ci, 0, i, j))],
        out_specs=pl.BlockSpec((1, 256, dcw),
                               lambda ci, i, j: (ci, i + 1, j + cw // dcw)),
        out_shape=jax.ShapeDtypeStruct(
            (c, hp + 2 * ring_r, wp5 + 2 * cw), jnp.uint8),
        interpret=interpret,
    )(uq)
    return out


def _paste_win_start(s_ref, i, j, *, th, cw, hd, wd, ring_r, slab_h, slab_w):
    """Element start (row, lane) of the NARROW slab window for dst block
    (i, j), plus the data offsets inside it.

    The dst block's data occupies exactly th contiguous slab rows starting
    at ``br*th - top1 + ring_r`` — an arbitrary row offset, which Element
    block specs can only express at 8-sublane / 128-lane granularity. So
    the window is (th+16, cw+256): start aligned DOWN (and clamped into
    the slab), data at offset (row_off < 16, lane_off < 256) recovered by
    the kernel's dynamic rolls. Blocks clamped at the slab edge can carry
    larger nominal offsets, but such blocks contain no in-range pixels
    (they exist only to cover misalignment) and the in-range select masks
    everything they produce. Shared by the index map and the kernel — the
    two MUST agree.
    """
    top1 = s_ref[0]
    left1 = s_ref[1]
    br = jnp.minimum(top1 // th + i, (hd + th - 1) // th - 1)
    bc = jnp.minimum(left1 // cw + j, (wd + cw - 1) // cw - 1)
    r_exact = br * th - top1 + ring_r
    l_exact = bc * cw - left1 + cw
    r_start = jnp.clip((r_exact // 8) * 8, 0, slab_h - (th + 16))
    l_start = jnp.clip((l_exact // 128) * 128, 0, slab_w - (cw + 256))
    return br, bc, r_start, l_start, r_exact - r_start, l_exact - l_start


def _paste_kernel(s_ref, int_ref, dstin_ref, out_ref, *, th, cw, h2, w2,
                  hd, wd, ring_r, slab_h, slab_w):
    i = pl.program_id(1)
    j = pl.program_id(2)
    top1 = s_ref[0]
    left1 = s_ref[1]
    br, bc, _, _, r_off, l_off = _paste_win_start(
        s_ref, i, j, th=th, cw=cw, hd=hd, wd=wd, ring_r=ring_r,
        slab_h=slab_h, slab_w=slab_w)
    r0 = br * th
    c0 = bc * cw
    # Mosaic's dynamic rotate is 32-bit only: hop the u8 window through i32
    w_ = int_ref[0].astype(jnp.int32)                 # (th+16, cw+256)
    # out row k <- window row k+r_off: roll(x, s)[k] = x[(k-s) mod N]
    rows_sft = pltpu.roll(w_, (th + 16) - r_off, axis=0)[:th]
    blk = pltpu.roll(rows_sft, (cw + 256) - l_off, axis=1)[:, :cw].astype(jnp.uint8)
    rows = r0 + jax.lax.broadcasted_iota(jnp.int32, (th, cw), 0)
    cols = c0 + jax.lax.broadcasted_iota(jnp.int32, (th, cw), 1)
    in_r = ((rows >= top1) & (rows < top1 + h2)
            & (cols >= left1) & (cols < left1 + w2))
    out_ref[0] = jnp.where(in_r, blk, dstin_ref[0])


def paste_interior_pallas(
    dst_p: jnp.ndarray,
    interior_g: jnp.ndarray,
    top1,
    left1,
    h2: int,
    w2: int,
    interpret: bool = False,
    ring_r: int = 128,
) -> jnp.ndarray:
    """Paste the solved interior into the planar destination, in place.

    XLA's dynamic-update-slice runs at ~25-50 GB/s for multi-MB regions on
    this target (measured: 0.40-0.47 ms for an 11 MB u8 paste even when
    tile-aligned and donated) — it re-materializes far more than the
    touched tiles. This kernel updates ONLY the covering tiles: for each
    128 x _PASTE_CW destination block it reads the NARROW
    (128+16, _PASTE_CW+256) guarded-interior window holding exactly its
    data (Element-granular start aligned down to the 8-sublane/128-lane
    DMA grid — round 5; the original (2x128, 2x_PASTE_CW) windows re-read
    the slab ~4x, this reads ~1.4x), shifts it into place with dynamic
    lane/sublane rotates (the paste offset is a traced scalar, prefetched
    into SMEM), selects in-range pixels and writes the block back through
    an input/output alias. Ref: the scatter half of ``post_processing``
    (seamlessClone_imp.cpp:2095, writing the ROI into ucRGB_Output).

    dst_p: (C, Hd, Wd) u8 planar destination (donated/aliased).
    interior_g: guarded slab from clamp_cast_guarded_pallas (ring_r=128)
      or clamp_cast_guarded_quarters_pallas (ring_r=256), data =
      (h2, w2) interior at offset (ring_r, _PASTE_CW).
    top1/left1: traced int32 paste offsets (top+1, left+1).
    ring_r: the slab's row guard size (must be >= 128).
    """
    c, hd, wd = dst_p.shape
    th, cw = 128, _PASTE_CW
    assert ring_r >= 128 and ring_r % 8 == 0, ring_r
    slab_h = interior_g.shape[1]
    slab_w = interior_g.shape[2]
    hp = slab_h - 2 * ring_r
    wp5 = slab_w - 2 * cw
    nbr = hp // th + 1
    nbc = wp5 // cw + 1
    s = jnp.stack([jnp.asarray(top1, jnp.int32), jnp.asarray(left1, jnp.int32)])
    kw = dict(th=th, cw=cw, hd=hd, wd=wd, ring_r=ring_r,
              slab_h=slab_h, slab_w=slab_w)

    def dst_map(ci, i, j, s_ref):
        br = jnp.minimum(s_ref[0] // th + i, (hd + th - 1) // th - 1)
        bc = jnp.minimum(s_ref[1] // cw + j, (wd + cw - 1) // cw - 1)
        return (ci, br, bc)

    def win_map(ci, i, j, s_ref):
        _, _, r_start, l_start, _, _ = _paste_win_start(s_ref, i, j, **kw)
        return (ci, pl.multiple_of(r_start, 8), pl.multiple_of(l_start, 128))

    return pl.pallas_call(
        partial(_paste_kernel, h2=h2, w2=w2, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(c, nbr, nbc),
            in_specs=[
                pl.BlockSpec((pl.Element(1), pl.Element(th + 16),
                              pl.Element(cw + 256)), win_map),
                pl.BlockSpec((1, th, cw), dst_map),
            ],
            out_specs=pl.BlockSpec((1, th, cw), dst_map),
        ),
        out_shape=jax.ShapeDtypeStruct((c, hd, wd), jnp.uint8),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(s, interior_g, dst_p)


# ---------------------------------------------------------------------------
# Even/odd DST fold and unfold (for the folded-GEMM solver chain)
# ---------------------------------------------------------------------------
#
# The folded DST (solvers/dst_gemm.py: dst_matrices_folded) halves the MXU
# FLOPs per transform but needs s = x + rev_n(x), d = x - rev_n(x) around
# every GEMM pair. Expressed in XLA those fold/unfold passes cost
# 0.28-0.56 ms each at 2400x1552 (docs/PERF.md op profile) — ~4x off the
# HBM roofline — and were the largest remaining serve-frame item. Mosaic
# has no `rev` primitive, so the lane reversal is built from supported
# pieces: mirror the 128-lane blocks in block order (static slices),
# reverse within each block by an anti-identity MXU dot (one-hot f32,
# exact), then realign with pltpu.roll. Measured 0.18 ms/pass (527 GB/s)
# at (3, 2432, 1664) vs 0.37-0.56 for the XLA fold fusions it replaces.


_J128 = np.eye(128, dtype=np.float32)[::-1].copy()  # lane anti-identity


def _rev_lanes(x: jnp.ndarray, n: int, j128: jnp.ndarray) -> jnp.ndarray:
    """rev_n over the padded lane axis: out[:, j] = x[:, n-1-j] for j < n.

    x: (th, NP) with NP a 128-multiple >= n. Lanes j >= n of the result hold
    rolled-around values — callers must mask them or contract them against
    zero matrix rows.
    """
    npad = x.shape[-1]
    nb = npad // 128
    parts = [
        jax.lax.dot_general(
            x[:, (nb - 1 - b) * 128:(nb - b) * 128], j128,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        for b in range(nb)
    ]
    rev_aligned = jnp.concatenate(parts, axis=-1)  # x[NP-1-j]
    # realign: rev_n[j] = x[n-1-j] = rev_aligned[(j - n) mod NP]
    return pltpu.roll(rev_aligned, n, 1) if n != npad else rev_aligned


def _fold_kernel(x_ref, j_ref, s_ref, d_ref, *, n, ep, op):
    x = x_ref[0]
    rev = _rev_lanes(x, n, j_ref[...])
    if n % 2:
        # odd n: the self-paired middle element is counted ONCE in s (the
        # folded Vep row for it carries the full weight); zeroing rev there
        # also poisons d's lane (n-1)/2 = he-1 >= ho, which Vop's zero row
        # kills.
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        rev = jnp.where(lane == (n - 1) // 2, 0.0, rev)
    s_ref[0] = (x + rev)[:, :ep]
    d_ref[0] = (x - rev)[:, :op]


def fold_minor_pallas(x: jnp.ndarray, n: int, th: int = 128,
                      interpret: bool = False):
    """Forward even/odd DST fold along the padded minor axis, one strip pass.

    x: (C, M, NP) f32, true data in lanes [0, n), EXACT ZEROS beyond; M and
    NP 128-multiples. Returns ``(s, d)``: s (C, M, ep) = x + rev_n(x),
    d (C, M, op) = x - rev_n(x) with ep/op = round_up(ceil(n/2) / floor(n/2),
    128) — the operands of the folded forward GEMMs
    (dst_fwd_folded_minor's s/d, solvers/dst_gemm.py). Lanes beyond
    he = ceil(n/2) (resp. ho) carry fold garbage by contract: the folded V
    matrices' zero rows annihilate them, so ONLY contract this output
    against dst_matrices_folded factors.
    """
    c, m, npad = x.shape
    assert npad % 128 == 0 and npad >= n, (npad, n)
    he, ho = (n + 1) // 2, n // 2
    ep, op = _round_up(he, 128), _round_up(ho, 128)
    mp = _round_up(m, th)
    xp = x if mp == m else jnp.pad(x, ((0, 0), (0, mp - m), (0, 0)))
    s, d = pl.pallas_call(
        partial(_fold_kernel, n=n, ep=ep, op=op),
        grid=(c, mp // th),
        in_specs=[
            pl.BlockSpec((1, th, npad), lambda ci, i: (ci, i, 0)),
            pl.BlockSpec((128, 128), lambda ci, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, th, ep), lambda ci, i: (ci, i, 0)),
            pl.BlockSpec((1, th, op), lambda ci, i: (ci, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, mp, ep), jnp.float32),
            jax.ShapeDtypeStruct((c, mp, op), jnp.float32),
        ],
        interpret=interpret,
    )(xp, jnp.asarray(_J128))
    return (s[:, :m], d[:, :m]) if mp != m else (s, d)


def _unfold_kernel(e_ref, o_ref, j_ref, out_ref, *, n, he):
    out_ref[0] = _unfold_body(e_ref[0], o_ref[0], j_ref[...], n=n, he=he,
                              out_lanes=out_ref.shape[-1])


def unfold_minor_pallas(e: jnp.ndarray, o: jnp.ndarray, n: int, out_pad: int,
                        th: int = 128, interpret: bool = False) -> jnp.ndarray:
    """Inverse even/odd DST combine along the minor axis, one strip pass.

    e, o: (C, M, ep) f32 — the inverse folded GEMM outputs (E_x and O_x on
    lanes [0, he), exact zeros beyond; both are ep wide since vo2p is
    (op, ep)). Returns (C, M, out_pad): out[x] = E_x + O_x for x < he,
    out[n-1-x] = E_x - O_x for x < ho, EXACT ZEROS elsewhere — the same
    contract as dst_inv_folded_minor (solvers/dst_gemm.py).
    """
    c, m, ep = e.shape
    assert o.shape == e.shape, (e.shape, o.shape)
    assert out_pad % 128 == 0 and out_pad >= n and out_pad >= ep
    he = (n + 1) // 2
    mp = _round_up(m, th)
    if mp != m:
        e = jnp.pad(e, ((0, 0), (0, mp - m), (0, 0)))
        o = jnp.pad(o, ((0, 0), (0, mp - m), (0, 0)))
    out = pl.pallas_call(
        partial(_unfold_kernel, n=n, he=he),
        grid=(c, mp // th),
        in_specs=[
            pl.BlockSpec((1, th, ep), lambda ci, i: (ci, i, 0)),
            pl.BlockSpec((1, th, ep), lambda ci, i: (ci, i, 0)),
            pl.BlockSpec((128, 128), lambda ci, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, out_pad), lambda ci, i: (ci, i, 0)),
        out_shape=jax.ShapeDtypeStruct((c, mp, out_pad), jnp.float32),
        interpret=interpret,
    )(e, o, jnp.asarray(_J128))
    return out[:, :m] if mp != m else out


def _tp_pair_kernel(a_ref, b_ref, o_ref, *, pa):
    o_ref[0, :pa] = jnp.transpose(a_ref[0], (1, 0))
    o_ref[0, pa:] = jnp.transpose(b_ref[0], (1, 0))


def _tp_pair_div_kernel(a_ref, b_ref, lp_ref, lr_ref, o_ref, *, pa):
    den = lp_ref[0][:, None] + lr_ref[0][None, :]  # (P, ta)
    o_ref[0, :pa] = jnp.transpose(a_ref[0], (1, 0)) / den[:pa]
    o_ref[0, pa:] = jnp.transpose(b_ref[0], (1, 0)) / den[pa:]


def _tp_single_kernel(a_ref, o_ref):
    o_ref[0] = jnp.transpose(a_ref[0], (1, 0))


def _tp_single_div_kernel(a_ref, lp_ref, lr_ref, o_ref):
    den = lp_ref[0][:, None] + lr_ref[0][None, :]
    o_ref[0] = jnp.transpose(a_ref[0], (1, 0)) / den


def transpose_pair_pallas(a: jnp.ndarray, b: jnp.ndarray | None = None,
                          lam_p=None, lam_r=None,
                          row_start: int = 0, row_count: int | None = None,
                          interpret: bool = False) -> jnp.ndarray:
    """Transpose of [a | b] (lane concat) restricted to a row window.

    a (C, M, PA), b (C, M, PB) or None — the logical input is
    x = concat([a, b], lanes) (C, M, P). Returns x[:, row_start:
    row_start+row_count, :] transposed -> (C, P, row_count), reading each
    input element exactly once. This shape exists to keep the folded-DST
    GEMM chain free of XLA-materialized concats and slices: the two
    forward-GEMM outputs transpose as a PAIR (no concat), and the two
    row-windows of the spectral slab transpose as separate calls whose
    outputs feed the inverse GEMMs whole (no slices). With ``lam_p``
    (len P) and ``lam_r`` (len M) also divides by
    ``lam_p[p] + lam_r[row]`` — the spectral-divide fusion of
    transpose_pallas, in the same grouped order as the operands.

    All of M, PA, PB, row_start, row_count must be 128-multiples (the
    folded chain's slabs always are).
    """
    c, m, pa = a.shape
    pb = b.shape[-1] if b is not None else 0
    rc = row_count if row_count is not None else m
    ta = 128
    assert m % ta == 0 and row_start % ta == 0 and rc % ta == 0, (m, row_start, rc)
    assert pa % 128 == 0 and pb % 128 == 0, (pa, pb)
    off = row_start // ta
    grid = (c, rc // ta)
    in_specs = [pl.BlockSpec((1, ta, pa), lambda ci, i: (ci, i + off, 0))]
    args = [a]
    if b is not None:
        in_specs.append(pl.BlockSpec((1, ta, pb), lambda ci, i: (ci, i + off, 0)))
        args.append(b)
    if lam_p is not None:
        lp = jnp.asarray(lam_p, jnp.float32)[None, :]
        lr = jnp.asarray(lam_r, jnp.float32)[None, :]
        assert lp.shape[-1] == pa + pb and lr.shape[-1] == m
        in_specs += [
            pl.BlockSpec((1, pa + pb), lambda ci, i: (0, 0)),
            pl.BlockSpec((1, ta), lambda ci, i: (0, i + off)),
        ]
        args += [lp, lr]
        kernel = (partial(_tp_pair_div_kernel, pa=pa) if b is not None
                  else _tp_single_div_kernel)
    else:
        kernel = (partial(_tp_pair_kernel, pa=pa) if b is not None
                  else _tp_single_kernel)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, pa + pb, ta), lambda ci, i: (ci, 0, i)),
        out_shape=jax.ShapeDtypeStruct((c, pa + pb, rc), jnp.float32),
        interpret=interpret,
    )(*args)


def _unfold_body(e, o, j, *, n, he, out_lanes):
    """Shared unfold arithmetic on one (th, ep) strip pair -> (th, out_lanes)."""
    pad = out_lanes - e.shape[-1]
    if pad:
        z = jnp.zeros((e.shape[0], pad), jnp.float32)
        e = jnp.concatenate([e, z], axis=-1)
        o = jnp.concatenate([o, z], axis=-1)
    diff_rev = _rev_lanes(e - o, n, j)
    lane = jax.lax.broadcasted_iota(jnp.int32, e.shape, 1)
    first = jnp.where(lane < he, e + o, 0.0)
    second = jnp.where((lane >= he) & (lane < n), diff_rev, 0.0)
    return first + second


def _unfold_tp_kernel(e_ref, o_ref, j_ref, out_ref, *, n, he):
    u = _unfold_body(e_ref[0], o_ref[0], j_ref[...], n=n, he=he,
                     out_lanes=out_ref.shape[1])
    out_ref[0] = jnp.transpose(u, (1, 0))


def unfold_transpose_pallas(e: jnp.ndarray, o: jnp.ndarray, n: int,
                            out_pad: int, row_start: int = 0,
                            row_count: int | None = None,
                            interpret: bool = False) -> jnp.ndarray:
    """unfold_minor_pallas + transpose_pair_pallas fused into one pass.

    e, o: (C, M, ep) inverse folded GEMM outputs (unfold_minor_pallas's
    contract). Returns ``transpose(unfold(e, o, n, out_pad))[:, :, row_start:
    row_start+row_count]`` — i.e. (C, out_pad, row_count) — without ever
    materializing the unfolded slab. Used for the folded chain's
    inverse-h -> transpose step: the two row windows (even/odd spectral
    halves of the NEXT axis) come from two calls that together read each
    element once.
    """
    c, m, ep = e.shape
    rc = row_count if row_count is not None else m
    ta = 128
    assert m % ta == 0 and row_start % ta == 0 and rc % ta == 0
    assert out_pad % 128 == 0 and out_pad >= n and out_pad >= ep
    he = (n + 1) // 2
    off = row_start // ta
    return pl.pallas_call(
        partial(_unfold_tp_kernel, n=n, he=he),
        grid=(c, rc // ta),
        in_specs=[
            pl.BlockSpec((1, ta, ep), lambda ci, i: (ci, i + off, 0)),
            pl.BlockSpec((1, ta, ep), lambda ci, i: (ci, i + off, 0)),
            pl.BlockSpec((128, 128), lambda ci, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, out_pad, ta), lambda ci, i: (ci, 0, i)),
        out_shape=jax.ShapeDtypeStruct((c, out_pad, rc), jnp.float32),
        interpret=interpret,
    )(e, o, jnp.asarray(_J128))


def _unfold_clamp_kernel(e_ref, o_ref, j_ref, out_ref, *, n, he):
    u = _unfold_body(e_ref[0], o_ref[0], j_ref[...], n=n, he=he,
                     out_lanes=out_ref.shape[-1])
    out_ref[0] = jnp.clip(u, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)


def unfold_clamp_guarded_pallas(e: jnp.ndarray, o: jnp.ndarray, n: int,
                                out_pad: int,
                                interpret: bool = False) -> jnp.ndarray:
    """unfold_minor_pallas + clamp_cast_guarded_pallas fused into one pass.

    e, o: (C, HP, ep) — the folded chain's final inverse GEMM outputs along
    the W axis (n = w2, out_pad = WP). Emits the same guarded u8 slab as
    clamp_cast_guarded_pallas (data at block offset (+1, +1), ring
    unwritten) for paste_interior_pallas, skipping the unfolded f32 slab's
    HBM round-trip entirely.
    """
    c, hp, ep = e.shape
    th, cw = 128, _PASTE_CW
    wp5 = _round_up(out_pad, cw)
    assert hp % th == 0 and out_pad % 128 == 0 and out_pad >= n and out_pad >= ep
    he = (n + 1) // 2
    return pl.pallas_call(
        partial(_unfold_clamp_kernel, n=n, he=he),
        grid=(c, hp // th),
        in_specs=[
            pl.BlockSpec((1, th, ep), lambda ci, i: (ci, i, 0)),
            pl.BlockSpec((1, th, ep), lambda ci, i: (ci, i, 0)),
            pl.BlockSpec((128, 128), lambda ci, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (pl.Element(1), pl.Element(th), pl.Element(out_pad)),
            lambda ci, i: (ci, pl.multiple_of((i + 1) * th, 128),
                           pl.multiple_of(cw, 128)),
        ),
        out_shape=jax.ShapeDtypeStruct((c, hp + 2 * th, wp5 + 2 * cw),
                                       jnp.uint8),
        interpret=interpret,
    )(e, o, jnp.asarray(_J128))
