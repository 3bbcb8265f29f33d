"""Geometric multigrid V-cycle for the 5-point Dirichlet Laplacian.

The north-star iterative solver (absent in the reference, which is
direct-solver only): O(N) per digit of accuracy, built from shift/elementwise
stencils that XLA fuses per level, and whose smoothing sweeps tile across a
device mesh with halo exchange (see parallel/tiled.py).

Scheme (vertex-centered, unscaled operators):
- smoother: red-black Gauss-Seidel (solvers/jacobi.py)
- restriction: full-weighting 1/16 [1 2 1; 2 4 2; 1 2 1] at fine points
  (2i+1, 2j+1); coarse size (n-1)//2. The coarse RHS is scaled by 4
  (A_h ~ h^2 * Laplacian, so the 2h-grid equation needs 4x the restricted
  residual).
- prolongation: bilinear, separable, zero outside the coarse grid.
- coarsest level (min dim <= 3): relaxation is exact enough in a few sweeps.

Arbitrary (non 2^k-1) sizes are supported; for even sizes the last fine
line has no coarse parent and converges via smoothing alone — the V-cycle is
an iteration, correctness comes from the residual stopping rule, matching
the exact DST solvers to the requested tolerance.

The level hierarchy is built at trace time (static shapes per level), so the
whole solve is one jit-compiled while_loop — no host round-trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from seamlesscloneoptimization_tpu.solvers.jacobi import redblack_sweep, residual


def restrict_fw(r: jnp.ndarray) -> jnp.ndarray:
    """Full-weighting restriction (C, h, w) -> (C, (h-1)//2, (w-1)//2)."""
    _, h, w = r.shape
    hc, wc = (h - 1) // 2, (w - 1) // 2
    rp = jnp.pad(r, ((0, 0), (1, 1), (1, 1)))

    def sub(dy, dx):
        return rp[:, 2 + dy : 2 + dy + 2 * hc : 2, 2 + dx : 2 + dx + 2 * wc : 2]

    return (
        4.0 * sub(0, 0)
        + 2.0 * (sub(-1, 0) + sub(1, 0) + sub(0, -1) + sub(0, 1))
        + (sub(-1, -1) + sub(-1, 1) + sub(1, -1) + sub(1, 1))
    ) * (1.0 / 16.0)


def _prolong_axis(e: jnp.ndarray, n: int) -> jnp.ndarray:
    """Bilinear prolongation along the last axis: (..., nc) -> (..., n)."""
    nc = e.shape[-1]
    ep = jnp.pad(e, [(0, 0)] * (e.ndim - 1) + [(1, 1)])  # zero Dirichlet pad
    out = jnp.zeros(e.shape[:-1] + (n,), e.dtype)
    # odd fine indices 1, 3, .., 2*nc-1 coincide with coarse points
    out = out.at[..., 1 : 2 * nc : 2].set(e)
    # even fine indices 0, 2, .., 2*nc: average of flanking coarse points
    # (n >= 2*nc+1 always; for even n the last fine index 2*nc+1 stays 0)
    mids = 0.5 * (ep[..., : nc + 1] + ep[..., 1 : nc + 2])
    out = out.at[..., 0 : 2 * nc + 1 : 2].set(mids)
    return out


def prolong_bilinear(e: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear prolongation (C, hc, wc) -> (C, h, w), separable."""
    e = _prolong_axis(e, w)
    e = _prolong_axis(jnp.swapaxes(e, -1, -2), h)
    return jnp.swapaxes(e, -1, -2)


def _sweeps(u, g, n):
    for _ in range(n):
        u = redblack_sweep(u, g)
    return u


def vcycle(u: jnp.ndarray, g: jnp.ndarray, nu1: int = 2, nu2: int = 2, coarsest: int = 3) -> jnp.ndarray:
    """One V-cycle; recursion unrolls at trace time over static level shapes."""
    _, h, w = u.shape
    if min(h, w) <= coarsest or min((h - 1) // 2, (w - 1) // 2) < 1:
        return _sweeps(u, g, 16)
    u = _sweeps(u, g, nu1)
    r = residual(u, g)
    rc = 4.0 * restrict_fw(r)
    ec = vcycle(jnp.zeros_like(rc), rc, nu1, nu2, coarsest)
    u = u + prolong_bilinear(ec, h, w)
    return _sweeps(u, g, nu2)


@partial(jax.jit, static_argnames=("max_cycles", "nu1", "nu2"))
def solve_multigrid(
    g: jnp.ndarray,
    u0: jnp.ndarray | None = None,
    tol: float = 1e-4,
    max_cycles: int = 60,
    nu1: int = 2,
    nu2: int = 2,
) -> jnp.ndarray:
    """V-cycle until ||r||_inf <= tol * ||g||_inf (or max_cycles)."""
    u = jnp.zeros_like(g) if u0 is None else u0
    gnorm = jnp.maximum(jnp.max(jnp.abs(g)), 1e-30)

    def cond(state):
        u, it = state
        return (jnp.max(jnp.abs(residual(u, g))) > tol * gnorm) & (it < max_cycles)

    def body(state):
        u, it = state
        return vcycle(u, g, nu1, nu2), it + 1

    u, _ = jax.lax.while_loop(cond, body, (u, jnp.int32(0)))
    return u
