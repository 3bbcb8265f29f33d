"""Runtime-domain geometric multigrid: exact solves inside bucketed shapes.

Serving with ``CloneConfig.bbox_bucket`` compiles ONE program per bucketed
shape, but the static-shape solvers then solve the GROWN Poisson problem —
the Dirichlet frame moves out to the bucket edge and the result drifts from
OpenCV's tight-bbox answer (measured diff_max 31 vs cv2 at bucket=128 on the
airplane/sky pair, vs 1 for the tight solve). This module removes that
trade-off: the same V-cycle scheme as solvers/multigrid.py, but the TRUE
domain size is a *traced* scalar inside a static zero-padded array, so one
compiled program serves every mask size up to the bucket while solving the
exact tight system.

Reference parity note: the reference re-sizes every buffer off the eroded
mask bbox each call (seamlessClone_imp.cpp:1073-1116) and relies on its
capacity pool to avoid reallocation; under XLA the analogous trick is
static padded shapes + traced true sizes, which additionally avoids
recompilation (the XLA analogue of its FFTParams plan-cache hit).

Scheme (identical math to solvers/multigrid.py, select-form throughout):
- unknowns live at [0, h) x [0, w) of the (Hp, Wp) padded array; everything
  outside stays exactly 0.0 = the zero Dirichlet frame (boundary values are
  folded into g by the caller at the TRUE frame).
- the boundary-consistent (Shortley-Weller) hierarchy's per-level size and
  beta parameters become traced scalars: h' = (h-1)//2,
  beta' = ((2 - h%2) + beta)/2; the even/odd edge handling in the transfer
  operators becomes ``where`` selects on traced parity.
- padded level shapes follow Hp' = (Hp-1)//2, which dominates h' for every
  h <= Hp, so the static hierarchy always contains the dynamic one.
- coarsest level: no exact eigen-solve is possible at runtime sizes, so the
  bottom of the cycle smooths a <=5-point-wide grid instead; the finest
  tol loop keeps the overall answer exact to tolerance regardless.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _f32(x):
    return jnp.asarray(x, jnp.float32)


def _dyn_ops(Hp: int, Wp: int, h, w, bh, bw):
    """Select-form operator pieces for a runtime (h, w, bh, bw) level.

    Returns (nsum, inv_d, diag, in_dom) on the static (Hp, Wp) grid. Same
    Shortley-Weller last-line coefficients as multigrid._ops_b, but the
    last line sits at the traced h-1 / w-1.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
    in_dom = ((rows < h) & (cols < w))[None]
    last_r = (rows == h - 1)
    last_c = (cols == w - 1)
    dh = jnp.where(last_r, 2.0 / bh, _f32(2.0))
    dw = jnp.where(last_c, 2.0 / bw, _f32(2.0))
    diag = (dh + dw)[None]
    inv_d = 1.0 / diag
    lrow = (last_r.astype(jnp.float32) * (2.0 / (1.0 + bh) - 1.0))[None]
    lcol = (last_c.astype(jnp.float32) * (2.0 / (1.0 + bw) - 1.0))[None]

    def nsum(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
        up_, dn = xp[:, :-2, 1:-1], xp[:, 2:, 1:-1]
        lf, rt = xp[:, 1:-1, :-2], xp[:, 1:-1, 2:]
        return up_ + dn + lf + rt + lrow * up_ + lcol * lf

    return nsum, inv_d, diag, in_dom


def _sweeps_dyn(u, g, k: int, h, w, bh, bw):
    """k red-black sweeps restricted to the runtime domain.

    u and g must be zero outside the domain; the color masks keep it so
    (same select-form invariant as the static sweeps / Pallas strips).
    """
    _, Hp, Wp = u.shape
    nsum, inv_d, _, in_dom = _dyn_ops(Hp, Wp, h, w, bh, bw)
    rows = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
    par = (((rows + cols) % 2) == 0)[None]
    red = par & in_dom
    black = (~par) & in_dom
    for _ in range(k):
        u = jnp.where(red, (nsum(u) - g) * inv_d, u)
        u = jnp.where(black, (nsum(u) - g) * inv_d, u)
    return u


def _residual_dyn(u, g, h, w, bh, bw):
    """r = g - A u on the runtime domain, zero outside."""
    _, Hp, Wp = u.shape
    nsum, _, diag, in_dom = _dyn_ops(Hp, Wp, h, w, bh, bw)
    return jnp.where(in_dom, g - (nsum(u) - diag * u), 0.0)


def _restrict_axis_dyn(r, n, beta):
    """Full-weighting along the last axis at runtime size n.

    r: (..., Np) zero beyond n. Returns (..., (Np-1)//2) zero beyond
    nc = (n-1)//2, matching multigrid._restrict_axis (including the even-n
    (2/3, 1/3)-transpose edge row) at every n <= Np.
    """
    Np = r.shape[-1]
    Ncp = (Np - 1) // 2
    m = 2 * Ncp + 2
    rp = jnp.pad(r, [(0, 0)] * (r.ndim - 1) + [(0, m - Np)]) if m != Np else r
    pairs = rp.reshape(r.shape[:-1] + (Ncp + 1, 2))
    a, b = pairs[..., 0], pairs[..., 1]
    bulk = 0.25 * a[..., :Ncp] + 0.5 * b[..., :Ncp] + 0.25 * a[..., 1 : Ncp + 1]
    nc = (n - 1) // 2
    jc = jax.lax.broadcasted_iota(jnp.int32, bulk.shape, bulk.ndim - 1)
    out = jnp.where(jc < nc, bulk, 0.0)
    # even-n edge row reads the last 4 fine lines r[n-4 .. n-1]
    gap = 2.0 + beta
    start = [jnp.int32(0)] * (r.ndim - 1) + [jnp.maximum(n - 4, 0)]
    l4 = jax.lax.dynamic_slice(r, start, r.shape[:-1] + (4,))
    edge = (0.25 * l4[..., 0] + 0.5 * l4[..., 1]
            + ((1.0 + beta) / gap * 0.5) * l4[..., 2]
            + (beta / gap * 0.5) * l4[..., 3])
    even = (n % 2) == 0
    return jnp.where(even & (jc == nc - 1), edge[..., None], out)


def _restrict_rows_dyn(r, n, beta):
    """Same full-weighting along axis -2 (strided slices, no transpose)."""
    Np = r.shape[-2]
    Ncp = (Np - 1) // 2
    m = 2 * Ncp + 2
    rp = (jnp.pad(r, [(0, 0)] * (r.ndim - 2) + [(0, m - Np), (0, 0)])
          if m != Np else r)
    bulk = (0.25 * rp[..., 0 : 2 * Ncp - 1 : 2, :]
            + 0.5 * rp[..., 1 : 2 * Ncp : 2, :]
            + 0.25 * rp[..., 2 : 2 * Ncp + 1 : 2, :])
    nc = (n - 1) // 2
    jc = jax.lax.broadcasted_iota(jnp.int32, bulk.shape, bulk.ndim - 2)
    out = jnp.where(jc < nc, bulk, 0.0)
    gap = 2.0 + beta
    start = ([jnp.int32(0)] * (r.ndim - 2)
             + [jnp.maximum(n - 4, 0), jnp.int32(0)])
    l4 = jax.lax.dynamic_slice(r, start, r.shape[:-2] + (4,) + r.shape[-1:])
    edge = (0.25 * l4[..., 0, :] + 0.5 * l4[..., 1, :]
            + ((1.0 + beta) / gap * 0.5) * l4[..., 2, :]
            + (beta / gap * 0.5) * l4[..., 3, :])
    even = (n % 2) == 0
    return jnp.where(even & (jc == nc - 1), edge[..., None, :], out)


def _prolong_axis_dyn(e, Np_fine: int, n, beta):
    """Bilinear prolongation along the last axis to runtime fine size n.

    e: (..., Ncp) zero beyond nc = (n-1)//2. Returns (..., Np_fine) zero
    beyond n, matching multigrid._prolong_axis (including the even-n
    (2/3, 1/3) edge lines) at every n <= Np_fine.
    """
    Ncp = e.shape[-1]
    ep = jnp.pad(e, [(0, 0)] * (e.ndim - 1) + [(1, 1)])
    mids = 0.5 * (ep[..., : Ncp + 1] + ep[..., 1 : Ncp + 2])
    pairs = jnp.stack([mids[..., :Ncp], e], axis=-1).reshape(
        e.shape[:-1] + (2 * Ncp,))
    out = jnp.pad(pairs, [(0, 0)] * (e.ndim - 1) + [(0, Np_fine - 2 * Ncp)])
    nc = (n - 1) // 2
    iv = jax.lax.broadcasted_iota(jnp.int32, out.shape, out.ndim - 1)
    out = jnp.where(iv < 2 * nc, out, 0.0)
    start = [jnp.int32(0)] * (e.ndim - 1) + [jnp.maximum(nc - 1, 0)]
    e_last = jax.lax.dynamic_slice(e, start, e.shape[:-1] + (1,))[..., 0]
    even = (n % 2) == 0
    gap = 2.0 + beta
    # odd n: fine line 2nc is mids[nc] = e[nc-1]/2; even n: lines 2nc, 2nc+1
    # carry the (1+beta)/gap, beta/gap edge interpolation
    at_2nc = jnp.where(even, e_last * ((1.0 + beta) / gap), 0.5 * e_last)
    out = jnp.where(iv == 2 * nc, at_2nc[..., None], out)
    return jnp.where(even & (iv == 2 * nc + 1),
                     (e_last * (beta / gap))[..., None], out)


def _prolong_rows_dyn(e, Np_fine: int, n, beta):
    """Same bilinear prolongation along axis -2."""
    Ncp = e.shape[-2]
    ep = jnp.pad(e, [(0, 0)] * (e.ndim - 2) + [(1, 1), (0, 0)])
    mids = 0.5 * (ep[..., : Ncp + 1, :] + ep[..., 1 : Ncp + 2, :])
    pairs = jnp.stack([mids[..., :Ncp, :], e], axis=-2).reshape(
        e.shape[:-2] + (2 * Ncp,) + e.shape[-1:])
    out = jnp.pad(pairs,
                  [(0, 0)] * (e.ndim - 2) + [(0, Np_fine - 2 * Ncp), (0, 0)])
    nc = (n - 1) // 2
    iv = jax.lax.broadcasted_iota(jnp.int32, out.shape, out.ndim - 2)
    out = jnp.where(iv < 2 * nc, out, 0.0)
    start = ([jnp.int32(0)] * (e.ndim - 2)
             + [jnp.maximum(nc - 1, 0), jnp.int32(0)])
    e_last = jax.lax.dynamic_slice(
        e, start, e.shape[:-2] + (1,) + e.shape[-1:])[..., 0, :]
    even = (n % 2) == 0
    gap = 2.0 + beta
    at_2nc = jnp.where(even, e_last * ((1.0 + beta) / gap), 0.5 * e_last)
    out = jnp.where(iv == 2 * nc, at_2nc[..., None, :], out)
    return jnp.where(even & (iv == 2 * nc + 1),
                     (e_last * (beta / gap))[..., None, :], out)


def _coarsen_dyn(m, beta):
    """Traced-level coarse size and boundary-gap beta (multigrid._coarsen)."""
    mc = (m - 1) // 2
    return mc, ((2 - m % 2).astype(jnp.float32) + beta) / 2.0


def vcycle_dyn(u, g, h, w, bh, bw, nu1: int = 1, nu2: int = 2,
               coarsest: int = 5, bottom_sweeps: int = 16):
    """One V-cycle at runtime domain (h, w); recursion over STATIC padded
    shapes (Hp' = (Hp-1)//2 >= h' always), so it unrolls at trace time."""
    _, Hp, Wp = u.shape
    if min(Hp, Wp) <= coarsest or min((Hp - 1) // 2, (Wp - 1) // 2) < 1:
        return _sweeps_dyn(u, g, bottom_sweeps, h, w, bh, bw)
    u = _sweeps_dyn(u, g, nu1, h, w, bh, bw)
    r = _residual_dyn(u, g, h, w, bh, bw)
    rc = 4.0 * _restrict_rows_dyn(_restrict_axis_dyn(r, w, bw), h, bh)
    hc, bh_c = _coarsen_dyn(h, bh)
    wc, bw_c = _coarsen_dyn(w, bw)
    ec = vcycle_dyn(jnp.zeros_like(rc), rc, hc, wc, bh_c, bw_c,
                    nu1, nu2, coarsest, bottom_sweeps)
    u = u + _prolong_rows_dyn(_prolong_axis_dyn(ec, Wp, w, bw), Hp, h, bh)
    return _sweeps_dyn(u, g, nu2, h, w, bh, bw)


@partial(jax.jit, static_argnames=("cycles", "max_cycles", "nu1", "nu2",
                                   "return_info"))
def solve_multigrid_dyn(
    g: jnp.ndarray,
    hw,
    tol: float = 1e-4,
    cycles: int | None = None,
    max_cycles: int = 60,
    nu1: int = 1,
    nu2: int = 2,
    return_info: bool = False,
):
    """Solve the 5-point Dirichlet system on a TRACED (h, w) domain.

    g: (C, Hp, Wp) f32, the RHS of the tight (h, w) interior system placed
    at [0, h) x [0, w) (anything outside is ignored). hw: (h, w) traced
    int32 scalars/array with h <= Hp, w <= Wp. Returns (C, Hp, Wp) with the
    solution in [0, h) x [0, w) and exact zeros outside.

    One compiled program per PADDED shape serves every true size — the
    exact-bucketed serving solver (CloneConfig.bbox_bucket + bucket_exact).
    """
    h = jnp.asarray(hw[0], jnp.int32)
    w = jnp.asarray(hw[1], jnp.int32)
    _, Hp, Wp = g.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
    in_dom = ((rows < h) & (cols < w))[None]
    g = jnp.where(in_dom, g, 0.0)
    one = _f32(1.0)
    u = jnp.zeros_like(g)
    if cycles is not None:
        # single-trace V-cycle body (see solve_multigrid: ~cycles x smaller
        # program and compile time than an unrolled chain)
        u = jax.lax.fori_loop(
            0, cycles,
            lambda _, x: vcycle_dyn(x, g, h, w, one, one, nu1, nu2), u)
        if return_info:
            r = _residual_dyn(u, g, h, w, one, one)
            return u, {"cycles": jnp.int32(cycles),
                       "residual": jnp.max(jnp.abs(r))}
        return u
    gnorm = jnp.maximum(jnp.max(jnp.abs(g)), 1e-30)

    def cond(state):
        u, it = state
        r = _residual_dyn(u, g, h, w, one, one)
        return (jnp.max(jnp.abs(r)) > tol * gnorm) & (it < max_cycles)

    def body(state):
        u, it = state
        return vcycle_dyn(u, g, h, w, one, one, nu1, nu2), it + 1

    u, it = jax.lax.while_loop(cond, body, (u, jnp.int32(0)))
    if return_info:
        r = _residual_dyn(u, g, h, w, one, one)
        return u, {"cycles": it, "residual": jnp.max(jnp.abs(r))}
    return u
