"""Red-black Gauss-Seidel relaxation for the 5-point Dirichlet Laplacian.

New capability vs the reference (which is direct-solver only): an iterative
smoother whose sweeps are pure shift/elementwise arithmetic — one fused VPU
stencil pass per color under XLA — and which tiles across a device mesh with
1-px halo exchange (see parallel/). Used standalone (solve_redblack) and as
the multigrid smoother (redblack_sweep).

System: A u = g, A u = sum of 4 neighbors - 4u, zero Dirichlet frame
(boundary already folded into g). Update for color points:
``u <- (N4(u) - g) / 4``. Red-black ordering makes each half-sweep an exact
Gauss-Seidel step, converging ~2x faster than plain Jacobi and staying
deterministic/parallel (the TPU answer to the reference's single-stream
in-order kernel chain).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _neighbor_sum(u: jnp.ndarray) -> jnp.ndarray:
    """Sum of 4 neighbors with an implicit zero frame. u: (C, H, W)."""
    up = jnp.pad(u, ((0, 0), (1, 1), (1, 1)))
    return up[:, :-2, 1:-1] + up[:, 2:, 1:-1] + up[:, 1:-1, :-2] + up[:, 1:-1, 2:]


def _checkerboard(h: int, w: int, parity: int, dtype=jnp.float32) -> jnp.ndarray:
    r = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return ((r + c) % 2 == parity).astype(dtype)


def redblack_sweep(u: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """One full red-black Gauss-Seidel sweep (red half then black half).

    Select form (``where`` on a boolean checkerboard) rather than the blend
    form ``u + mask*(upd - u)``: 2 fewer VPU passes per half-sweep, no
    f32 mask materialization, and the written value is exactly ``upd``
    (the blend form re-rounds through the add/subtract pair). All sweep
    implementations (XLA, Pallas strips, shard_map tiles) use this same
    form so they stay bitwise-identical to each other.
    """
    _, h, w = u.shape
    red = _checkerboard(h, w, 0, jnp.bool_)[None]
    black = _checkerboard(h, w, 1, jnp.bool_)[None]
    u = jnp.where(red, (_neighbor_sum(u) - g) * 0.25, u)
    u = jnp.where(black, (_neighbor_sum(u) - g) * 0.25, u)
    return u


def residual(u: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """r = g - A u."""
    return g - (_neighbor_sum(u) - 4.0 * u)


@partial(jax.jit, static_argnames=("max_iters", "check_every", "return_info", "use_pallas"))
def solve_redblack(
    g: jnp.ndarray,
    u0: jnp.ndarray | None = None,
    tol: float = 1e-3,
    max_iters: int = 10000,
    check_every: int = 50,
    return_info: bool = False,
    use_pallas: bool = False,
):
    """Iterate red-black sweeps until ||r||_inf <= tol * ||g||_inf.

    Residual checks batch ``check_every`` sweeps per convergence test so the
    while_loop body stays a long fused chain (XLA-friendly control flow; no
    per-sweep host sync, the iterative analogue of the reference's
    single-launch design).
    """
    if check_every < 1:
        raise ValueError(f"check_every must be >= 1, got {check_every}")
    u = jnp.zeros_like(g) if u0 is None else u0
    gnorm = jnp.maximum(jnp.max(jnp.abs(g)), 1e-30)

    def cond(state):
        u, it = state
        r = jnp.max(jnp.abs(residual(u, g)))
        return (r > tol * gnorm) & (it < max_iters)

    if use_pallas and jax.default_backend() == "tpu":
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import rb_sweeps_pallas

        def run_sweeps(u):
            return rb_sweeps_pallas(u, g, check_every)
    else:
        def run_sweeps(u):
            return jax.lax.fori_loop(0, check_every, lambda _, x: redblack_sweep(x, g), u)

    def body(state):
        u, it = state
        return run_sweeps(u), it + check_every

    u, it = jax.lax.while_loop(cond, body, (u, jnp.int32(0)))
    if return_info:
        return u, {"iterations": it, "residual": jnp.max(jnp.abs(residual(u, g)))}
    return u
