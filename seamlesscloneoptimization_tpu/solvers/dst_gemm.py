"""Exact Poisson solve in the DST eigenbasis via batched GEMMs (MXU path).

Math (same identity as the reference's cuBLAS solver, seamlessClone-CUDA/
seamlessClone_imp.cpp:1322-1334 and the DST basis built at :569-603):

With the orthonormal symmetric DST-I matrix
``V_n[i,j] = sin((i+1)(j+1)pi/(n+1)) * sqrt(2/(n+1))`` (V @ V = I) and
eigenvalues ``lam_k = 2(cos((k+1)pi/(n+1)) - 1)``, the 5-point Dirichlet
Laplacian diagonalizes as  A = (Vh ⊗ Vw) diag(lam_i + lam_j) (Vh ⊗ Vw),
so ``u = Vh @ ((Vh @ g @ Vw) / (lam_i + lam_j)) @ Vw`` per channel.

On TPU this is four (C-batched) f32 matmuls — exactly what the MXU is for.
``precision=HIGHEST`` keeps f32 accumulation (bf16 passes would break the
<1 LSB bit-closeness target).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def dst_matrix(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Orthonormal DST-I matrix, shape (n, n). Symmetric, V @ V = I."""
    i = jnp.arange(1, n + 1, dtype=jnp.float32)
    return (jnp.sin(jnp.outer(i, i) * (jnp.pi / (n + 1))) * jnp.sqrt(2.0 / (n + 1))).astype(dtype)


def dst_eigenvalues(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Eigenvalues 2(cos(k pi/(n+1)) - 1), k = 1..n, shape (n,)."""
    k = jnp.arange(1, n + 1, dtype=jnp.float32)
    return (2.0 * (jnp.cos(k * (jnp.pi / (n + 1))) - 1.0)).astype(dtype)


def _mm(a, b):
    return jnp.einsum("...ij,jk->...ik", a, b, precision=jax.lax.Precision.HIGHEST)


def _mm_left(m, a):
    return jnp.einsum("ij,...jk->...ik", m, a, precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("transform_only",))
def solve_dst_gemm(g: jnp.ndarray, transform_only: bool = False) -> jnp.ndarray:
    """Solve A u = g for g: (C, H, W) f32 via 4 batched GEMMs."""
    _, h, w = g.shape
    vh = dst_matrix(h)
    vw = dst_matrix(w)
    lam = dst_eigenvalues(h)[:, None] + dst_eigenvalues(w)[None, :]
    ghat = _mm(_mm_left(vh, g), vw)
    if transform_only:
        return ghat
    uhat = ghat / lam[None, :, :]
    return _mm(_mm_left(vh, uhat), vw)
