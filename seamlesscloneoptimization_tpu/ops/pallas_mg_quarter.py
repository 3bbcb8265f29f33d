"""Quarter-plane (checkerboard-decomposed) fused multigrid level kernels.

The finest level dominates the V-cycle (8K XProf 2026-08-20: mg_up 1.15 /
mg_down 0.75 ms per launch vs ~0.56 ms DMA roofs — VPU-bound at ~2x). The
select-form sweeps compute a dense update everywhere and keep half per
color; this module removes that waste structurally: u is stored as FOUR
quarter planes indexed by (row parity, column parity),

    EE[i,j] = u[2i,   2j]      EO[i,j] = u[2i,   2j+1]
    OE[i,j] = u[2i+1, 2j]      OO[i,j] = u[2i+1, 2j+1]

stacked as one (C, 4, H/2, W/2) array. Red cells are EE u OO, black are
EO u OE, so each half-sweep updates exactly its two quarter planes from
the other color's planes with +-1 sublane/lane shifts — no checkerboard
masks, no discarded work, ~2.5x less VPU per sweep. The residual is
computed on the red quarters only (it is identically zero at black after
a black half-sweep), and the row-restriction falls out as two half-width
planes (even/odd output lanes) with trivial weights — which the
transposed lane-restriction (mg_restrict_tq_pallas) consumes WITHOUT any
lane interleave, because after its in-VMEM transpose the combine is pure
sublane arithmetic. Every reshape in the kernels is on the SUBLANE axis
(Mosaic-legal); the single lane-parity split/merge happens ONCE per solve
in XLA (to_quarters/from_quarters — one T(2,128) relayout each way).

Used by solvers/multigrid.py:vcycle_q for the FINEST level only (bh ==
bw == 1 there always); coarse levels keep the dense alternating-
orientation chain (vcycle_t). Ref: the reference is direct-solver-only
(SURVEY §2.7-2.8); this is the TPU-native iterative path's hot loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401

from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
    _round_up,
    _vmem_params,
)

_MQ = 8  # quarter-row ghost band = 16 dense rows (>= any nu <= 4 staleness)


def mg_geometry_q(h: int, w: int, th: int | None = None):
    """(th_q, hq, wq2, hp2) for the quarter-plane finest level.

    th_q: quarter-strip height (dense strip = 2*th_q). hq = rounded
    quarter-plane rows, wq2 = rounded quarter lane extent (so the dense
    pad is (2*hq, 2*wq2) — wp is forced to a 256-multiple). hp2 =
    round_up(hq, 128): the rh split planes' row extent, and the lane
    extent inherited by the coarse (dense, transposed) level.
    """
    import os

    if th is None:
        th_env = os.environ.get("SCL_MG_THQ")
        # 128 default: measured equal to 64 pre-fusion (12.81 vs 12.88 at
        # 8K, 2026-08-20 sweep) and required for the fused transposed
        # restrict (each strip must own whole 128-lane blocks of rc_t)
        th = int(th_env) if th_env else 128
    assert th in (8, 16, 32, 64, 128, 256), th
    # hq rounds to lcm(th, 128): strips need th | hq, the Pallas
    # quarter<->dense conversion kernels need 128 | hq
    hq = _round_up((h + 1) // 2, max(th, 128))
    wq2 = _round_up((w + 1) // 2, 128)
    hp2 = _round_up(hq, 128)
    return th, hq, wq2, hp2


def to_quarters(x_p: jnp.ndarray) -> jnp.ndarray:
    """(C, 2*HQ, 2*WQ) dense -> (C, 4, HQ, WQ) quarter planes (XLA, once
    per solve; the lane pair-split is one T(2,128) relayout)."""
    c, hp, wp = x_p.shape
    q = x_p.reshape(c, hp // 2, 2, wp // 2, 2)
    return q.transpose(0, 2, 4, 1, 3).reshape(c, 4, hp // 2, wp // 2)


def from_quarters(uq: jnp.ndarray) -> jnp.ndarray:
    """(C, 4, HQ, WQ) -> (C, 2*HQ, 2*WQ) dense (XLA, once per solve)."""
    c, _, hq, wq = uq.shape
    q = uq.reshape(c, 2, 2, hq, wq).transpose(0, 3, 1, 4, 2)
    return q.reshape(c, 2 * hq, 2 * wq)


def dense_to_quarters_tile(xw):
    """In-VMEM (2R, WP) dense tile -> (EE, EO, OE, OO) quarter tiles (R, WP/2).

    The lane-parity split rides an in-VMEM transpose (sublane reshapes are
    Mosaic-legal, lane ones are not); the row-parity split is a sublane
    reshape. XLA's own lowering of this conversion was the whole
    pathology: 81 of the 93 ms/solve at 8K (generic 5D reshapes + layout
    copies at ~5 GB/s, solve_fix4_q XProf 2026-08-20). Shared by
    to_quarters_pallas and the quarter-emitting preprocess
    (pallas_kernels.preprocess_rhs_quarters_pallas).
    """
    rows = xw.shape[0]
    t = jnp.transpose(xw, (1, 0))                        # (WP, 2R)
    pr = t.reshape(t.shape[0] // 2, 2, rows)
    e = jnp.transpose(pr[:, 0, :], (1, 0))               # (2R, WP/2) even lanes
    o = jnp.transpose(pr[:, 1, :], (1, 0))
    er = e.reshape(rows // 2, 2, e.shape[1])
    orr = o.reshape(rows // 2, 2, o.shape[1])
    return er[:, 0, :], orr[:, 0, :], er[:, 1, :], orr[:, 1, :]


def _to_q_kernel(a_ref, b_ref, out_ref):
    """Two dense 128-row slabs -> one (4, 128, wq2) stacked quarter block."""
    xw = jnp.concatenate([a_ref[0], b_ref[0]], axis=0)   # (256, wp_d)
    ee, eo, oe, oo = dense_to_quarters_tile(xw)
    out_ref[0, 0] = ee
    out_ref[0, 1] = eo
    out_ref[0, 2] = oe
    out_ref[0, 3] = oo


def to_quarters_pallas(x_p: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(C, 2*HQ, 2*WQ) dense -> (C, 4, HQ, WQ) quarters, ~2 roofline passes."""
    c, hp_d, wp_d = x_p.shape
    hq, wq2 = hp_d // 2, wp_d // 2
    assert hq % 128 == 0 and wq2 % 128 == 0, (hq, wq2)
    return pl.pallas_call(
        _to_q_kernel,
        grid=(c, hq // 128),
        in_specs=[
            pl.BlockSpec((1, 128, wp_d), lambda ci, i: (ci, 2 * i, 0)),
            pl.BlockSpec((1, 128, wp_d), lambda ci, i: (ci, 2 * i + 1, 0)),
        ],
        out_specs=pl.BlockSpec((1, 4, 128, wq2), lambda ci, i: (ci, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((c, 4, hq, wq2), jnp.float32),
        compiler_params=_vmem_params(256, wp_d, interpret),
        interpret=interpret,
    )(x_p, x_p)


def quarters_to_dense_tile(ee, eo, oe, oo):
    """In-VMEM (R, W) quarter tiles -> the (2R, 2W) dense tile (inverse of
    dense_to_quarters_tile; shared by from_quarters_pallas and the
    quarters-consuming guarded clamp in pallas_kernels)."""
    rows = 2 * ee.shape[0]
    e = jnp.stack([ee, oe], axis=1).reshape(rows, ee.shape[1])  # even lanes
    o = jnp.stack([eo, oo], axis=1).reshape(rows, eo.shape[1])
    et = jnp.transpose(e, (1, 0))                               # (W, 2R)
    ot = jnp.transpose(o, (1, 0))
    inter = jnp.stack([et, ot], axis=1).reshape(2 * et.shape[0], rows)
    return jnp.transpose(inter, (1, 0))                         # (2R, 2W)


def _from_q_kernel(q_ref, out_ref):
    """One (4, 128, wq2) quarter block -> a dense (256, wp_d) slab."""
    ee, eo, oe, oo = (q_ref[0, i] for i in range(4))
    out_ref[0] = quarters_to_dense_tile(ee, eo, oe, oo)


def from_quarters_pallas(uq: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(C, 4, HQ, WQ) quarters -> (C, 2*HQ, 2*WQ) dense, ~2 roofline passes."""
    c, _, hq, wq2 = uq.shape
    assert hq % 128 == 0 and wq2 % 128 == 0, (hq, wq2)
    return pl.pallas_call(
        _from_q_kernel,
        grid=(c, hq // 128),
        in_specs=[pl.BlockSpec((1, 4, 128, wq2), lambda ci, i: (ci, 0, i, 0))],
        out_specs=pl.BlockSpec((1, 256, 2 * wq2), lambda ci, i: (ci, i, 0)),
        out_shape=jax.ShapeDtypeStruct((c, 2 * hq, 2 * wq2), jnp.float32),
        compiler_params=_vmem_params(256, 2 * wq2, interpret),
        interpret=interpret,
    )(uq)


def _ghost_specs_q(th: int, hq: int, wq2: int):
    """(center, top, bottom) specs for a stacked (C, 4, hq, wq2) input."""
    nb = hq // _MQ
    r = th // _MQ
    return (
        pl.BlockSpec((1, 4, th, wq2), lambda c, i: (c, 0, i, 0)),
        pl.BlockSpec((1, 4, _MQ, wq2), lambda c, i: (c, 0, jnp.maximum(i * r - 1, 0), 0)),
        pl.BlockSpec((1, 4, _MQ, wq2), lambda c, i: (c, 0, jnp.minimum((i + 1) * r, nb - 1), 0)),
    )


def _asm_q(i, th, hq_true, wq2, ctr, top, bot):
    """Assemble 4 ghosted (th + 2*MQ, wq2) quarter windows from blocked refs.

    hq_true: quarter rows that hold real data (ceil(h/2)); clamped edge
    DMAs beyond are zeroed like pallas_kernels._asm_window.
    """
    m = _MQ
    rt = i * th - m + jax.lax.broadcasted_iota(jnp.int32, (m, wq2), 0)
    rb = (i + 1) * th + jax.lax.broadcasted_iota(jnp.int32, (m, wq2), 0)
    out = []
    for q in range(4):
        wtop = jnp.where(rt >= 0, top[0, q], 0.0)
        wbot = jnp.where(rb < hq_true, bot[0, q], 0.0)
        out.append(jnp.concatenate([wtop, ctr[0, q], wbot], axis=0))
    return out  # [EE, EO, OE, OO]


def _lane_sh_q(wq: int, wq2: int):
    """(left, right) lane fetches on a quarter plane (roll when wq < wq2)."""
    if wq < wq2:
        return (lambda x: pltpu.roll(x, 1, 1),
                lambda x: pltpu.roll(x, wq2 - 1, 1))
    return (lambda x: jnp.pad(x[:, :-1], ((0, 0), (1, 0))),
            lambda x: jnp.pad(x[:, 1:], ((0, 0), (0, 1))))


def _sub_sh(x, up: bool):
    """Sublane +-1 shift (quarter-row neighbors).

    Default: pad+slice with zero fill. SCL_MG_SUBROLL=1 (read at TRACE
    time, like the other SCL_* probe knobs) uses a cyclic ``pltpu.roll``
    instead — the wrapped row lands at the WINDOW edge (ghost row 0 /
    last), whose post-update values are already inside the discarded
    staleness band (the same wavefront argument that lets the zero fill
    be wrong vs the true array there: divergence advances one row per
    half-sweep and the _MQ ghost budget keeps it off the owned rows), so
    owned-row outputs are bit-identical either way. A/B probe for whether
    Mosaic's sublane rotate beats the pad+slice copy the way the
    lane-direction roll did (tools/probe_nsum.py: 1.8x) — measured a wash
    on 2026-08-20 Mosaic (tools/tpu_queue.md §5), kept for re-probing.
    """
    import os

    if os.environ.get("SCL_MG_SUBROLL", "0") == "1":
        return pltpu.roll(x, 1 if up else x.shape[0] - 1, 0)
    if up:  # x[i-1]
        return jnp.pad(x[:-1, :], ((1, 0), (0, 0)))
    return jnp.pad(x[1:, :], ((0, 1), (0, 0)))


def _doms_q(i, th, h, w, wq2):
    """Domain masks for the four quarter windows, in dense coordinates.

    Quarter cell (iq, jq) of plane (rp, cp) is dense (2*iq + rp, 2*jq + cp);
    valid iff inside [0, h) x [0, w) and the window row maps into [0, ..).
    """
    m = _MQ
    iq = i * th - m + jax.lax.broadcasted_iota(jnp.int32, (th + 2 * m, wq2), 0)
    jq = jax.lax.broadcasted_iota(jnp.int32, (th + 2 * m, wq2), 1)
    doms = []
    for rp in (0, 1):
        for cp in (0, 1):
            r = 2 * iq + rp
            cc = 2 * jq + cp
            doms.append((r >= 0) & (r < h) & (cc >= 0) & (cc < w))
    return doms  # [EE, EO, OE, OO] order


def _sweep_q(planes, gq, doms, lsh, rsh, n_sweeps):
    """n red-black Gauss-Seidel sweeps on quarter planes.

    Exact dense-update arithmetic per cell, association mirroring the
    dense kernels' ((up + dn) + l) + r neighbor-sum order. ``n_sweeps`` is
    trace-time static and <= 4, so the loop UNROLLS (Python loop, not
    lax.fori_loop): Mosaic then schedules shifts/FMAs across the sweep
    boundary instead of fencing at an scf.for back-edge.
    """
    ee, eo, oe, oo = planes
    gee, geo, goe, goo = gq
    dee, deo, doe, doo = doms

    for _ in range(n_sweeps):
        # red: EE (up/dn = OE[i-1]/OE[i], l/r = EO[j-1]/EO[j])
        ns = ((_sub_sh(oe, True) + oe) + lsh(eo)) + eo
        ee = jnp.where(dee, (ns - gee) * 0.25, ee)
        # red: OO (up/dn = EO[i]/EO[i+1], l/r = OE[j]/OE[j+1])
        ns = ((eo + _sub_sh(eo, False)) + oe) + rsh(oe)
        oo = jnp.where(doo, (ns - goo) * 0.25, oo)
        # black: EO (up/dn = OO[i-1]/OO[i], l/r = EE[j]/EE[j+1])
        ns = ((_sub_sh(oo, True) + oo) + ee) + rsh(ee)
        eo = jnp.where(deo, (ns - geo) * 0.25, eo)
        # black: OE (up/dn = EE[i]/EE[i+1], l/r = OO[j-1]/OO[j])
        ns = ((ee + _sub_sh(ee, False)) + lsh(oo)) + oo
        oe = jnp.where(doe, (ns - goe) * 0.25, oe)
    return ee, eo, oe, oo


def _down_q_body(planes, gq, i, *, nu1, th, h, w, wq2, hc, h_even, bw,
                 u_is_zero=False, with_residual=False):
    """nu1 sweeps + red residual + row-restrict on ghosted quarter windows.

    Returns (4 swept (th, wq2) strips, rh_e strip, rh_o strip[, r2]) where
    rh_e/rh_o are the EVEN/ODD-lane planes of the dense row-restricted
    residual (coarse rows jc = i*th .. — one quarter-strip of fine rows
    yields th coarse rows since coarse row jc reads fine rows 2jc..2jc+2
    = quarter rows jc, jc+1). ``with_residual`` additionally returns the
    per-lane max |residual| of the OWNED rows — the residual of the strip
    this body writes out, at zero extra DMA (the same ree/roo the
    restriction consumes; red cells only, black is exactly zero after the
    final black half-sweep). Validity matches the restriction's reads
    (staleness nu1+1 quarter rows <= _MQ).
    """
    doms = _doms_q(i, th, h, w, wq2)
    lsh, rsh = _lane_sh_q((w + 1) // 2, wq2)
    if u_is_zero and nu1 > 0:
        ee, eo, oe, oo = planes
        gee, geo, goe, goo = gq
        dee, deo, doe, doo = doms
        # first red half-sweep from zero: neighbor sums vanish exactly
        ee = jnp.where(dee, (0.0 - gee) * 0.25, ee)
        oo = jnp.where(doo, (0.0 - goo) * 0.25, oo)
        ns = ((_sub_sh(oo, True) + oo) + ee) + rsh(ee)
        eo = jnp.where(deo, (ns - geo) * 0.25, eo)
        ns = ((ee + _sub_sh(ee, False)) + lsh(oo)) + oo
        oe = jnp.where(doe, (ns - goe) * 0.25, oe)
        planes = _sweep_q((ee, eo, oe, oo), gq, doms, lsh, rsh, nu1 - 1)
    else:
        planes = _sweep_q(planes, gq, doms, lsh, rsh, nu1)
    ee, eo, oe, oo = planes
    gee, geo, goe, goo = gq
    dee, deo, doe, doo = doms

    # residual at RED cells (zero at black after the black half-sweeps)
    ns = ((_sub_sh(oe, True) + oe) + lsh(eo)) + eo
    ree = jnp.where(dee, gee - (ns - 4.0 * ee), 0.0)
    ns = ((eo + _sub_sh(eo, False)) + oe) + rsh(oe)
    roo = jnp.where(doo, goo - (ns - 4.0 * oo), 0.0)

    # row-restriction: rh[jc, 2j] = 0.25(r[2jc,2j] + r[2jc+2,2j])
    #                 rh[jc, 2j+1] = 0.5 r[2jc+1, 2j+1]
    # (r vanishes at black cells). The even-h edge row folds the
    # Shortley-Weller gap weights like _mg_down_body's.
    m = _MQ
    jc_loc = slice(m, m + th)  # coarse row jc = quarter row (valid: res
    # window rows are exact over [m, m+th+1) — staleness 2*nu1+1 dense
    # rows = nu1+1 quarter rows <= m, +1 for the restrict's jc+1 fetch)
    ree_dn = ree[m + 1 : m + 1 + th, :]
    roo_dn = roo[m + 1 : m + 1 + th, :]
    w_e = jnp.float32(0.25)
    w_o0 = jnp.float32(0.5)
    if h_even:
        gap = 2.0 + 1.0  # bh == 1 at the finest level
        jc = i * th + jax.lax.broadcasted_iota(jnp.int32, (th, wq2), 0)
        last = jc == hc - 1
        w_e_dn = jnp.where(last, jnp.float32((1.0 + 1.0) / gap * 0.5), w_e)
        w_o_dn = jnp.where(last, jnp.float32(1.0 / gap * 0.5), 0.0)
        rh_e = w_e * ree[jc_loc, :] + w_e_dn * ree_dn
        rh_o = w_o0 * roo[jc_loc, :] + w_o_dn * roo_dn
    else:
        rh_e = w_e * ree[jc_loc, :] + w_e * ree_dn
        rh_o = w_o0 * roo[jc_loc, :]
    strips = [p[m : m + th, :] for p in planes]
    if with_residual:
        own = slice(m, m + th)
        r2 = jnp.maximum(jnp.max(jnp.abs(ree[own, :]), axis=0),
                         jnp.max(jnp.abs(roo[own, :]), axis=0))
        return strips, rh_e, rh_o, r2
    return strips, rh_e, rh_o


def _rct_strip(rh_e, rh_o, i, *, th, w, hc, bw, chp):
    """One strip's split rh planes -> its (chp, th) block of the TRANSPOSED
    x4 lane-restricted coarse RHS (lanes = coarse rows i*th ..).

    The same arithmetic as _restrict_tq_kernel, run in the producing
    kernel's VMEM so the rh planes never round-trip HBM (the separate
    restrict launch read them back at 2x the rc_t size)."""
    wc = (w - 1) // 2
    te = jnp.transpose(rh_e, (1, 0))  # (wq2, th): sublanes = even lanes
    to = jnp.transpose(rh_o, (1, 0))
    out = (te[:wc] + 2.0 * to[:wc]) + te[1 : wc + 1]
    if w % 2 == 0:
        gap = 2.0 + bw
        edge = ((te[wc - 1] + 2.0 * to[wc - 1])
                + (2.0 * (1.0 + bw) / gap) * te[wc]) + (2.0 * bw / gap) * to[wc]
        sub = jax.lax.broadcasted_iota(jnp.int32, (wc, th), 0)
        out = jnp.where(sub == wc - 1, edge[None], out)
    lane = i * th + jax.lax.broadcasted_iota(jnp.int32, (chp, th), 1)
    full = jnp.pad(out, ((0, chp - wc), (0, 0)))
    return jnp.where(lane < hc, full, 0.0)


def _down_q_kernel(uc, ut, ub, gc, gt, gb, uo_ref, rhe_ref, rho_ref=None, *,
                   nu1, th, hq_true, h, w, wq2, hc, h_even, bw, rct_rows=None):
    i = pl.program_id(1)
    planes = _asm_q(i, th, hq_true, wq2, uc, ut, ub)
    gq = _asm_q(i, th, hq_true, wq2, gc, gt, gb)
    strips, rh_e, rh_o = _down_q_body(planes, gq, i, nu1=nu1, th=th, h=h,
                                      w=w, wq2=wq2, hc=hc, h_even=h_even,
                                      bw=bw)
    for q in range(4):
        uo_ref[0, q] = strips[q]
    if rct_rows is not None:  # rhe_ref IS the rc_t output; rho_ref absent
        rhe_ref[0] = _rct_strip(rh_e, rh_o, i, th=th, w=w, hc=hc, bw=bw,
                                chp=rct_rows)
    else:
        rhe_ref[0] = rh_e
        rho_ref[0] = rh_o


def _down_q_kernel0(gc, gt, gb, uo_ref, rhe_ref, rho_ref=None, *, nu1, th,
                    hq_true, h, w, wq2, hc, h_even, bw, rct_rows=None):
    i = pl.program_id(1)
    gq = _asm_q(i, th, hq_true, wq2, gc, gt, gb)
    z = [jnp.zeros_like(g) for g in gq]
    strips, rh_e, rh_o = _down_q_body(z, gq, i, nu1=nu1, th=th, h=h, w=w,
                                      wq2=wq2, hc=hc, h_even=h_even, bw=bw,
                                      u_is_zero=True)
    for q in range(4):
        uo_ref[0, q] = strips[q]
    if rct_rows is not None:
        rhe_ref[0] = _rct_strip(rh_e, rh_o, i, th=th, w=w, hc=hc, bw=bw,
                                chp=rct_rows)
    else:
        rhe_ref[0] = rh_e
        rho_ref[0] = rh_o


@partial(jax.jit, static_argnames=("nu1", "true_hw", "geom", "h_even", "bw",
                                   "u_zero", "interpret", "rct_rows"))
def mg_down_q_pallas(uq, gq, nu1, true_hw, geom, bw: float = 1.0,
                     u_zero: bool = False, interpret: bool = False,
                     h_even: bool | None = None, rct_rows: int | None = None):
    """Quarter-plane fused descent at the finest level (bh = bw = 1).

    uq (or None with u_zero), gq: (C, 4, hq, wq2) stacked quarter planes,
    exact zeros outside the true domain. Returns (swept uq, rh_e, rh_o)
    with rh_e/rh_o (C, hp2, wq2): the even/odd-lane planes of the dense
    row-restricted residual (rows [0, hc) valid; rows beyond hq unwritten
    — mg_restrict_tq_pallas masks them).

    ``rct_rows=chp`` fuses the transposed x4 lane-restriction INTO this
    kernel: returns (swept uq, rc_t) with rc_t (C, chp, hp2) — the coarse
    vcycle_t's input directly, skipping the rh planes' HBM round-trip
    (needs th % 128 == 0 so each strip owns whole lane blocks of rc_t).
    Equal to the separate mg_restrict_tq_pallas launch except ~1 ulp at
    the even-size Shortley-Weller edge lane (its 1/3-1/6 weights are not
    powers of two, so the compiler's FMA contraction across the fused
    boundary rounds once less); all other weights are powers of two and
    bit-exact.
    """
    h, w = true_hw
    th, hq, wq2, hp2 = geom
    c = gq.shape[0]
    assert gq.shape == (c, 4, hq, wq2), (gq.shape, (c, 4, hq, wq2))
    # The descent restricts the residual evaluated at RED cells only — exact
    # because the preceding black half-sweep zeroes the black residual. With
    # no smoothing at all that identity does not hold (black residual = g).
    assert nu1 >= 1, "quarter-plane descent requires nu1 >= 1"
    hc = (h - 1) // 2
    if h_even is None:
        h_even = h % 2 == 0
    hq_true = (h + 1) // 2
    ctr, top, bot = _ghost_specs_q(th, hq, wq2)
    u_spec = pl.BlockSpec((1, 4, th, wq2), lambda ci, i: (ci, 0, i, 0))
    u_shape = jax.ShapeDtypeStruct((c, 4, hq, wq2), jnp.float32)
    if rct_rows is not None:
        assert th % 128 == 0 and hp2 == hq, (th, hp2, hq)
        assert wq2 >= (w - 1) // 2 + 1, (wq2, w)
        out_specs = [u_spec,
                     pl.BlockSpec((1, rct_rows, th), lambda ci, i: (ci, 0, i))]
        out_shape = [u_shape,
                     jax.ShapeDtypeStruct((c, rct_rows, hp2), jnp.float32)]
    else:
        out_specs = [
            u_spec,
            pl.BlockSpec((1, th, wq2), lambda ci, i: (ci, i, 0)),
            pl.BlockSpec((1, th, wq2), lambda ci, i: (ci, i, 0)),
        ]
        out_shape = [
            u_shape,
            jax.ShapeDtypeStruct((c, hp2, wq2), jnp.float32),
            jax.ShapeDtypeStruct((c, hp2, wq2), jnp.float32),
        ]
    kw = dict(nu1=nu1, th=th, hq_true=hq_true, h=h, w=w, wq2=wq2, hc=hc,
              h_even=h_even, bw=bw, rct_rows=rct_rows)
    if u_zero:
        return pl.pallas_call(
            partial(_down_q_kernel0, **kw),
            grid=(c, hq // th),
            in_specs=[ctr, top, bot],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=_vmem_params(2 * th, 2 * wq2, interpret),
            interpret=interpret,
        )(gq, gq, gq)
    return pl.pallas_call(
        partial(_down_q_kernel, **kw),
        grid=(c, hq // th),
        in_specs=[ctr, top, bot] * 2,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_vmem_params(2 * th, 2 * wq2, interpret),
        interpret=interpret,
    )(uq, uq, uq, gq, gq, gq)


def _restrict_tq_kernel(e_ref, o_ref, out_ref, *, w, wc, hc, bw, out_rows):
    """(128-row, wq2) slabs of rh_e/rh_o -> (out_rows, 128) transposed +
    lane-restricted coarse RHS (x4 folded into the weights)."""
    j = pl.program_id(1)
    te = jnp.transpose(e_ref[0], (1, 0))  # (wq2, 128): sublanes = even lanes
    to = jnp.transpose(o_ref[0], (1, 0))
    # dense lanes 2k = te[k], 2k+1 = to[k]; restrict: out[jw] =
    # 4*(0.25 rh[2jw] + 0.5 rh[2jw+1] + 0.25 rh[2jw+2])
    out = (te[:wc] + 2.0 * to[:wc]) + te[1 : wc + 1]
    if w % 2 == 0:
        gap = 2.0 + bw
        edge = ((te[wc - 1] + 2.0 * to[wc - 1])
                + (2.0 * (1.0 + bw) / gap) * te[wc]) + (2.0 * bw / gap) * to[wc]
        sub = jax.lax.broadcasted_iota(jnp.int32, (wc, 128), 0)
        out = jnp.where(sub == wc - 1, edge[None], out)
    lane = j * 128 + jax.lax.broadcasted_iota(jnp.int32, (out_rows, 128), 1)
    full = jnp.pad(out, ((0, out_rows - wc), (0, 0)))
    out_ref[0] = jnp.where(lane < hc, full, 0.0)


def mg_restrict_tq_pallas(rh_e, rh_o, h, w, bw, out_rows, out_lanes,
                          interpret: bool = False):
    """Transposed x4 lane-restriction from the SPLIT rh planes.

    rh_e/rh_o: (C, hp2, wq2) from mg_down_q_pallas. Returns
    (C, out_rows, out_lanes): the coarse RHS of the (hc, wc) grid in
    TRANSPOSED orientation (the dense vcycle_t coarse level's input).
    out_lanes must equal hp2 (whole-block reads); extra lanes zero.
    """
    c, hp2, wq2 = rh_e.shape
    assert rh_o.shape == rh_e.shape
    assert hp2 % 128 == 0 and out_lanes == hp2, (hp2, out_lanes)
    hc, wc = (h - 1) // 2, (w - 1) // 2
    assert wq2 >= wc + 1 and out_rows >= wc, (wq2, wc, out_rows)
    return pl.pallas_call(
        partial(_restrict_tq_kernel, w=w, wc=wc, hc=hc, bw=bw,
                out_rows=out_rows),
        grid=(c, hp2 // 128),
        in_specs=[pl.BlockSpec((1, 128, wq2), lambda ci, j: (ci, j, 0))] * 2,
        out_specs=pl.BlockSpec((1, out_rows, 128), lambda ci, j: (ci, 0, j)),
        out_shape=jax.ShapeDtypeStruct((c, out_rows, hp2), jnp.float32),
        compiler_params=_vmem_params(128, 2 * wq2, interpret),
        interpret=interpret,
    )(rh_e, rh_o)


def _prolong_tq_kernel(ec_ref, ee_ref, eo_ref, *, w, wc, bw, wq2):
    """One (hp_c, 128)-lane window of ec_t -> SPLIT lane-parity planes of
    the w-prolonged correction, transposed back to natural orientation.

    Dense prolong: out[2j] = mids[j], out[2j+1] = e[j] — the even/odd
    planes ARE mids and e directly (plus the even-w tail rows), so no
    interleave exists at all in split form.
    """
    e = ec_ref[0]
    ep = jnp.pad(e, ((1, 1), (0, 0)))
    mids = 0.5 * (ep[: wc + 1] + ep[1 : wc + 2])
    if w % 2 == 1:
        # even lanes: 2j for 2j < w -> j <= wc (last = mids[wc]); odd: j < wc
        ev = mids[: wc + 1]
        od = e[:wc]
    else:
        gap = 2.0 + bw
        last = e[wc - 1 : wc]
        ev = jnp.concatenate([mids[:wc], last * ((1.0 + bw) / gap)], axis=0)
        od = jnp.concatenate([e[:wc], last * (bw / gap)], axis=0)
    ee_ref[0] = jnp.transpose(jnp.pad(ev, ((0, wq2 - ev.shape[0]), (0, 0))), (1, 0))
    eo_ref[0] = jnp.transpose(jnp.pad(od, ((0, wq2 - od.shape[0]), (0, 0))), (1, 0))


def mg_prolong_tq_pallas(ec_t, h, w, bw, out_rows, wq2,
                         interpret: bool = False):
    """Lane-prolongation of the TRANSPOSED coarse correction, split form.

    ec_t: (C, hp_c, lanes >= out_rows) — the dense coarse vcycle_t
    solution ((wc, hc) at the origin). Returns (e_even, e_odd), each
    (C, out_rows, wq2): the even/odd lane-parity planes of
    _prolong_axis(ec, w, bw), mg_up_q_pallas's correction operands.
    """
    c, hp_c, lanes = ec_t.shape
    wc = (w - 1) // 2
    assert lanes % 128 == 0 and out_rows % 128 == 0 and lanes >= out_rows
    assert hp_c >= wc and wq2 >= (w + 1) // 2
    return pl.pallas_call(
        partial(_prolong_tq_kernel, w=w, wc=wc, bw=bw, wq2=wq2),
        grid=(c, out_rows // 128),
        in_specs=[pl.BlockSpec((1, hp_c, 128), lambda ci, j: (ci, 0, j))],
        out_specs=[pl.BlockSpec((1, 128, wq2), lambda ci, j: (ci, j, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((c, out_rows, wq2), jnp.float32)] * 2,
        compiler_params=_vmem_params(128, 2 * wq2, interpret),
        interpret=interpret,
    )(ec_t)


def _up_q_body(planes, gq, ee_c, eo_c, i, *, nu2, th, h, w, wq2, h_even,
               with_residual=False, return_windows=False):
    """Row-prolong of the split corrections + add + nu2 sweeps.

    with_residual: also return the per-lane max |residual| of the swept
    strip (red cells only — the residual is identically zero at black
    after the final black half-sweep, the same identity _down_q_body's
    restriction uses). Valid on the owned rows [m, m+th): their neighbor
    reads reach ghost row m-1, exact for staleness nu2+1 <= m-1 (nu2 <= 4
    is the fused-level gate). This makes the tolerance check DMA-free —
    the dense conversion + residual pass it replaces cost ~0.6
    cycle-equivalents per check (docs/PERF.md)."""
    doms = _doms_q(i, th, h, w, wq2)
    lsh, rsh = _lane_sh_q((w + 1) // 2, wq2)
    m = _MQ
    # quarter window row t holds dense rows 2*(i*th - m + t) + rp; its
    # coarse row for the prolong is q = i*th - m + t (same indexing!), so
    # corr_even_rows[t] = mids[q] needs ec rows q-1, q: the split coarse
    # windows ee_c/eo_c are (th + 2m, wq2) with window row t = coarse row
    # i*th - m + t, aligned 1:1 with the quarter windows.
    mids_e = 0.5 * (jnp.pad(ee_c[:-1], ((1, 0), (0, 0))) + ee_c)
    mids_o = 0.5 * (jnp.pad(eo_c[:-1], ((1, 0), (0, 0))) + eo_c)
    # dense corr rows: even 2q -> mids[q], odd 2q+1 -> e[q]
    cEE, cEO = mids_e, mids_o
    cOE, cOO = ee_c, eo_c
    if h_even:
        gap = 2.0 + 1.0
        rows = i * th - m + jax.lax.broadcasted_iota(
            jnp.int32, (th + 2 * m, wq2), 0)
        qedge = rows == (h - 2) // 2  # dense rows h-2 (even), h-1 (odd)
        wA = 2.0 * (1.0 + 1.0) / gap
        wB = 2.0 * 1.0 / gap
        cEE = jnp.where(qedge, cEE * wA, cEE)
        cEO = jnp.where(qedge, cEO * wA, cEO)
        cOE = jnp.where(qedge, mids_e * wB, cOE)
        cOO = jnp.where(qedge, mids_o * wB, cOO)
    ee, eo, oe, oo = planes
    dee, deo, doe, doo = doms
    ee = jnp.where(dee, ee + cEE, ee)
    eo = jnp.where(deo, eo + cEO, eo)
    oe = jnp.where(doe, oe + cOE, oe)
    oo = jnp.where(doo, oo + cOO, oo)
    planes = _sweep_q((ee, eo, oe, oo), gq, doms, lsh, rsh, nu2)
    out = (list(planes) if return_windows
           else [p[m : m + th, :] for p in planes])
    if not with_residual:
        return out, None
    ee, eo, oe, oo = planes
    gee, _, _, goo = gq
    dee, _, _, doo = doms
    ns = ((_sub_sh(oe, True) + oe) + lsh(eo)) + eo
    ree = jnp.where(dee, gee - (ns - 4.0 * ee), 0.0)
    ns = ((eo + _sub_sh(eo, False)) + oe) + rsh(oe)
    roo = jnp.where(doo, goo - (ns - 4.0 * oo), 0.0)
    own = slice(m, m + th)
    r2 = jnp.maximum(jnp.max(jnp.abs(ree[own, :]), axis=0),
                     jnp.max(jnp.abs(roo[own, :]), axis=0))
    return out, r2


def _up_q_kernel(uc, ut, ub, gc, gt, gb, eec, eet, eeb, eoc, eot, eob,
                 uo_ref, *rmax_ref, nu2, th, hq_true, h, w, wq2, hc, h_even,
                 with_residual=False):
    i = pl.program_id(1)
    planes = _asm_q(i, th, hq_true, wq2, uc, ut, ub)
    gq = _asm_q(i, th, hq_true, wq2, gc, gt, gb)
    m = _MQ
    rt = i * th - m + jax.lax.broadcasted_iota(jnp.int32, (m, wq2), 0)
    rb = (i + 1) * th + jax.lax.broadcasted_iota(jnp.int32, (m, wq2), 0)

    def asm1(ctr, top, bot):
        wtop = jnp.where(rt >= 0, top[0], 0.0)
        wbot = jnp.where(rb < hc, bot[0], 0.0)
        return jnp.concatenate([wtop, ctr[0], wbot], axis=0)

    ee_c = asm1(eec, eet, eeb)
    eo_c = asm1(eoc, eot, eob)
    strips, r2 = _up_q_body(planes, gq, ee_c, eo_c, i, nu2=nu2, th=th, h=h,
                            w=w, wq2=wq2, h_even=h_even,
                            with_residual=with_residual)
    for q in range(4):
        uo_ref[0, q] = strips[q]
    if with_residual:
        # (1, 8, wq2) block: Mosaic wants 8-divisible sublane blocks; all 8
        # rows carry the same lane-max (outputs must be fully written)
        rmax_ref[0][0] = jnp.broadcast_to(r2[None, :], (8, r2.shape[0]))


@partial(jax.jit, static_argnames=("nu2", "true_hw", "geom", "h_even",
                                   "interpret", "with_residual"))
def mg_up_q_pallas(uq, gq, e_even, e_odd, nu2, true_hw, geom,
                   interpret: bool = False, h_even: bool | None = None,
                   with_residual: bool = False):
    """Quarter-plane fused ascent: split-corr prolong + add + nu2 sweeps.

    e_even/e_odd: (C, hp2, wq2) from mg_prolong_tq_pallas (rows [0, hc)
    valid, zeros beyond). Returns the swept (C, 4, hq, wq2) planes; with
    ``with_residual`` also the scalar max |residual| of the swept state
    (in-kernel red-cell residual, see _up_q_body — frees the tolerance
    check from its dense-conversion cost).
    """
    h, w = true_hw
    th, hq, wq2, hp2 = geom
    c = uq.shape[0]
    hc = (h - 1) // 2
    if h_even is None:
        h_even = h % 2 == 0
    hq_true = (h + 1) // 2
    assert uq.shape == (c, 4, hq, wq2) and gq.shape == uq.shape
    assert e_even.shape == (c, hp2, wq2) and e_odd.shape == e_even.shape
    ctr, top, bot = _ghost_specs_q(th, hq, wq2)
    nb2 = hp2 // _MQ
    r = th // _MQ
    e_ctr = pl.BlockSpec((1, th, wq2), lambda ci, i: (ci, i, 0))
    e_top = pl.BlockSpec((1, _MQ, wq2),
                         lambda ci, i: (ci, jnp.maximum(i * r - 1, 0), 0))
    e_bot = pl.BlockSpec((1, _MQ, wq2),
                         lambda ci, i: (ci, jnp.minimum((i + 1) * r, nb2 - 1), 0))
    u_spec = pl.BlockSpec((1, 4, th, wq2), lambda ci, i: (ci, 0, i, 0))
    u_shape = jax.ShapeDtypeStruct((c, 4, hq, wq2), jnp.float32)
    nstrips = hq // th
    if with_residual:
        out_specs = [u_spec,
                     pl.BlockSpec((1, 8, wq2), lambda ci, i: (ci, i, 0))]
        out_shape = [u_shape,
                     jax.ShapeDtypeStruct((c, 8 * nstrips, wq2), jnp.float32)]
    else:
        out_specs, out_shape = u_spec, u_shape
    out = pl.pallas_call(
        partial(_up_q_kernel, nu2=nu2, th=th, hq_true=hq_true, h=h, w=w,
                wq2=wq2, hc=hc, h_even=h_even, with_residual=with_residual),
        grid=(c, hq // th),
        in_specs=[ctr, top, bot] * 2 + [e_ctr, e_top, e_bot] * 2,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_vmem_params(2 * th, 2 * wq2, interpret),
        interpret=interpret,
    )(uq, uq, uq, gq, gq, gq, e_even, e_even, e_even, e_odd, e_odd, e_odd)
    if with_residual:
        return out[0], jnp.max(out[1])
    return out


def _ud_q_kernel(uc, ut, ub, gc, gt, gb, eec, eet, eeb, eoc, eot, eob,
                 uo_ref, rhe_ref, *rest, nu2, nu1, th, hq_true,
                 h, w, wq2, hc, h_even, bw, rct_rows=None,
                 with_residual=False):
    """Fused ASCENT (cycle k) + DESCENT (cycle k+1) on one ghosted window.

    The post-up state never round-trips HBM between cycles: the up body
    returns its full swept WINDOWS (outer 2*nu2 dense layers stale) and the
    down body continues in-VMEM — its owned-row sweeps, residual and
    restriction all read layers the combined staleness budget leaves exact
    (nu2 + nu1 quarter rows + the restrict's jc+1 fetch <= _MQ = 8 for the
    fused-level gate nu1 <= 2, nu2 <= 4). Bit-equal to mg_up_q_pallas
    followed by mg_down_q_pallas (identical arithmetic on identical exact
    values; the unfused pair re-fetches post-up ghosts that this window
    already holds exactly). Saves one full fine-level u read + write + g
    read per V-cycle — the fine level is the 8K solve's dominant cost
    (docs/PERF.md: 0.71/0.75 ms launches vs 0.56 DMA roofs).
    """
    i = pl.program_id(1)
    planes = _asm_q(i, th, hq_true, wq2, uc, ut, ub)
    gq = _asm_q(i, th, hq_true, wq2, gc, gt, gb)
    m = _MQ
    rt = i * th - m + jax.lax.broadcasted_iota(jnp.int32, (m, wq2), 0)
    rb = (i + 1) * th + jax.lax.broadcasted_iota(jnp.int32, (m, wq2), 0)

    def asm1(ctr, top, bot):
        wtop = jnp.where(rt >= 0, top[0], 0.0)
        wbot = jnp.where(rb < hc, bot[0], 0.0)
        return jnp.concatenate([wtop, ctr[0], wbot], axis=0)

    ee_c = asm1(eec, eet, eeb)
    eo_c = asm1(eoc, eot, eob)
    windows, _ = _up_q_body(planes, gq, ee_c, eo_c, i, nu2=nu2, th=th, h=h,
                            w=w, wq2=wq2, h_even=h_even, return_windows=True)
    down = _down_q_body(windows, gq, i, nu1=nu1, th=th, h=h,
                        w=w, wq2=wq2, hc=hc, h_even=h_even,
                        bw=bw, with_residual=with_residual)
    strips, rh_e, rh_o = down[:3]
    for q in range(4):
        uo_ref[0, q] = strips[q]
    if rct_rows is not None:  # fused restrict: rhe_ref IS the rc_t output
        rhe_ref[0] = _rct_strip(rh_e, rh_o, i, th=th, w=w, hc=hc, bw=bw,
                                chp=rct_rows)
    else:
        rest[0][0] = rh_o  # rho_ref
        rhe_ref[0] = rh_e
    if with_residual:
        # (1, 8, wq2) block per strip, all rows the same lane-max (see
        # _up_q_kernel's rmax block comment)
        r2 = down[3]
        rest[-1][0] = jnp.broadcast_to(r2[None, :], (8, r2.shape[0]))


@partial(jax.jit, static_argnames=("nu2", "nu1", "true_hw", "geom", "h_even",
                                   "bw", "interpret", "rct_rows",
                                   "with_residual"))
def mg_ud_q_pallas(uq, gq, e_even, e_odd, nu2, nu1, true_hw, geom,
                   bw: float = 1.0, interpret: bool = False,
                   h_even: bool | None = None, rct_rows: int | None = None,
                   with_residual: bool = False):
    """Fused cycle-boundary launch: prolong+correct+nu2 sweeps of cycle k,
    then nu1 sweeps + red residual + row-restriction of cycle k+1.

    Inputs/outputs exactly match mg_up_q_pallas's inputs and
    mg_down_q_pallas's outputs: (swept uq, rh_e, rh_o) — or (swept uq,
    rc_t) with ``rct_rows`` (fused transposed restrict, see
    mg_down_q_pallas). Used by the fixed-cycles and burst (check-free)
    portions of solve_multigrid's quarter path, where no tolerance
    decision sits between the two halves.

    ``with_residual`` appends the scalar max |residual| of the OUTPUT
    state (the down-half's own ree/roo, free — the same arrays the
    restriction consumes), making a CHECKED tolerance cycle cost the same
    fine-level DMA as a check-free one: the tol loop's former
    down+up-per-checked-cycle (two fine passes) collapses to one fused
    launch (solve_multigrid's fused tol loop, round 5).
    """
    h, w = true_hw
    th, hq, wq2, hp2 = geom
    c = uq.shape[0]
    hc = (h - 1) // 2
    if h_even is None:
        h_even = h % 2 == 0
    hq_true = (h + 1) // 2
    # combined staleness must stay inside the ghost band: nu2 + nu1 quarter
    # rows of sweeps + 1 residual layer + 1 restrict fetch <= _MQ
    assert nu1 >= 1 and nu1 + nu2 + 2 <= _MQ, (nu1, nu2)
    assert uq.shape == (c, 4, hq, wq2) and gq.shape == uq.shape
    assert e_even.shape == (c, hp2, wq2) and e_odd.shape == e_even.shape
    ctr, top, bot = _ghost_specs_q(th, hq, wq2)
    nb2 = hp2 // _MQ
    r = th // _MQ
    e_ctr = pl.BlockSpec((1, th, wq2), lambda ci, i: (ci, i, 0))
    e_top = pl.BlockSpec((1, _MQ, wq2),
                         lambda ci, i: (ci, jnp.maximum(i * r - 1, 0), 0))
    e_bot = pl.BlockSpec((1, _MQ, wq2),
                         lambda ci, i: (ci, jnp.minimum((i + 1) * r, nb2 - 1), 0))
    u_spec = pl.BlockSpec((1, 4, th, wq2), lambda ci, i: (ci, 0, i, 0))
    u_shape = jax.ShapeDtypeStruct((c, 4, hq, wq2), jnp.float32)
    if rct_rows is not None:
        assert th % 128 == 0 and hp2 == hq, (th, hp2, hq)
        out_specs = [u_spec,
                     pl.BlockSpec((1, rct_rows, th), lambda ci, i: (ci, 0, i))]
        out_shape = [u_shape,
                     jax.ShapeDtypeStruct((c, rct_rows, hp2), jnp.float32)]
    else:
        out_specs = [
            u_spec,
            pl.BlockSpec((1, th, wq2), lambda ci, i: (ci, i, 0)),
            pl.BlockSpec((1, th, wq2), lambda ci, i: (ci, i, 0)),
        ]
        out_shape = [
            u_shape,
            jax.ShapeDtypeStruct((c, hp2, wq2), jnp.float32),
            jax.ShapeDtypeStruct((c, hp2, wq2), jnp.float32),
        ]
    nstrips = hq // th
    if with_residual:
        out_specs = list(out_specs) + [
            pl.BlockSpec((1, 8, wq2), lambda ci, i: (ci, i, 0))]
        out_shape = list(out_shape) + [
            jax.ShapeDtypeStruct((c, 8 * nstrips, wq2), jnp.float32)]
    out = pl.pallas_call(
        partial(_ud_q_kernel, nu2=nu2, nu1=nu1, th=th, hq_true=hq_true, h=h,
                w=w, wq2=wq2, hc=hc, h_even=h_even, bw=bw, rct_rows=rct_rows,
                with_residual=with_residual),
        grid=(c, hq // th),
        in_specs=[ctr, top, bot] * 2 + [e_ctr, e_top, e_bot] * 2,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_vmem_params(2 * th, 2 * wq2, interpret),
        interpret=interpret,
    )(uq, uq, uq, gq, gq, gq, e_even, e_even, e_even, e_odd, e_odd, e_odd)
    if with_residual:
        return tuple(out[:-1]) + (jnp.max(out[-1]),)
    return out
