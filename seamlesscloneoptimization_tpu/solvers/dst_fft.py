"""Exact Poisson solve via FFT-based DST (odd extension).

TPU-native redesign of the reference's cuFFT path (seamlessClone-CUDA/
seamlessClone_imp.cpp:1694-1918: pack-odd-extension kernels + cufftExecC2C +
transpose/extract kernels). Here the whole dance is ``jnp.fft.rfft`` over an
odd-extended axis; XLA fuses the pack/extract arithmetic around its FFT.

DST-I of x[0..n-1] along an axis, via the odd extension
``y = [0, x0..x_{n-1}, 0, -x_{n-1}..-x0]`` (length N = 2n+2):
``fft(y)[k] = -2i * sum_j x_{j-1} sin(pi j k/(n+1))``, so
``DST(x)[k-1] = -imag(fft(y)[k]) / 2`` for k = 1..n; orthonormal scaling
multiplies by sqrt(2/(n+1)). Asymptotically O(N log N) vs the GEMM solver's
O(N^1.5) — wins for large ROIs; both are exact to f32 rounding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from seamlesscloneoptimization_tpu.solvers.dst_gemm import dst_eigenvalues


def dst1_lastaxis(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal DST-I along the last axis via rfft of the odd extension."""
    n = x.shape[-1]
    zeros = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    y = jnp.concatenate([zeros, x, zeros, -x[..., ::-1]], axis=-1)  # (.., 2n+2)
    spec = jnp.fft.rfft(y, axis=-1)  # (.., n+2)
    return (-spec.imag[..., 1 : n + 1]) * (0.5 * jnp.sqrt(2.0 / (n + 1))).astype(x.dtype)


def dst1_2d(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal 2-D DST-I over the last two axes of (C, H, W)."""
    x = dst1_lastaxis(x)
    x = dst1_lastaxis(jnp.swapaxes(x, -1, -2))
    return jnp.swapaxes(x, -1, -2)


@jax.jit
def solve_dst_fft(g: jnp.ndarray) -> jnp.ndarray:
    """Solve A u = g for g: (C, H, W) f32 via forward/inverse FFT-DST."""
    _, h, w = g.shape
    lam = dst_eigenvalues(h)[:, None] + dst_eigenvalues(w)[None, :]
    ghat = dst1_2d(g)
    uhat = ghat / lam[None, :, :]
    return dst1_2d(uhat)  # DST-I is its own inverse (orthonormal)
