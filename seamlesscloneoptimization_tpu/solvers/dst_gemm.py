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

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def dst_matrix(n: int):
    """Orthonormal DST-I matrix, shape (n, n). Symmetric, V @ V = I.

    Computed host-side in f64 and cached (same arithmetic as the NumPy
    oracle), then embedded as a program CONSTANT under jit — the on-device
    recompute (n^2 sin evaluations per call) cost ~25% of the whole solve
    at 2400x1552.
    """
    i = np.arange(1, n + 1, dtype=np.float64)
    return (np.sin(np.outer(i, i) * (np.pi / (n + 1))) * np.sqrt(2.0 / (n + 1))).astype(
        np.float32
    )


@lru_cache(maxsize=256)
def dst_eigenvalues(n: int):
    """Eigenvalues 2(cos(k pi/(n+1)) - 1), k = 1..n, shape (n,). Host-cached."""
    k = np.arange(1, n + 1, dtype=np.float64)
    return (2.0 * (np.cos(k * np.pi / (n + 1)) - 1.0)).astype(np.float32)


@lru_cache(maxsize=64)
def dst_matrix_padded(n: int, n_pad: int):
    """dst_matrix(n) zero-padded to (n_pad, n_pad).

    A zero-padded V keeps every GEMM of the padded-space chain exact: the
    extra rows/columns only ever multiply the (exactly zero) padding of the
    image operand, so no slicing is needed between stages.
    """
    v = np.zeros((n_pad, n_pad), np.float32)
    v[:n, :n] = dst_matrix(n)
    return v


@lru_cache(maxsize=256)
def dst_eigenvalues_padded(n: int, n_pad: int):
    """dst_eigenvalues(n) padded to n_pad with 1e9 (the spectral divide's
    padding lanes then divide ~0 by ~1e9: still exactly 0/harmless)."""
    lam = np.full(n_pad, 1e9, np.float32)
    lam[:n] = dst_eigenvalues(n)
    return lam


@lru_cache(maxsize=64)
def beta_eigenbasis(n: int, beta: float):
    """Eigenbasis of the 1-D Dirichlet tridiagonal with a short last gap.

    The multigrid coarse hierarchy (solvers/multigrid.py) discretizes each
    axis with uniform spacing except the RIGHT boundary, which sits at
    ``beta * h`` beyond the last point (Shortley-Weller): row n-1 has
    left-coefficient ``2/(1+beta)`` and diagonal ``-2/beta`` instead of
    (1, -2). That matrix T is nonsymmetric in one row but similar to a
    symmetric tridiagonal via a diagonal scaling (positive off-diagonal
    products), so its eigenvalues are real and the eigh of the symmetrized
    form is numerically exact. Host f64, cached like dst_matrix.

    Returns (lam (n,), V (n, n), Vi (n, n)) f32 with T = V diag(lam) Vi.
    """
    if beta == 1.0:
        v = dst_matrix(n).astype(np.float64)
        lam = dst_eigenvalues(n).astype(np.float64)
        return (lam.astype(np.float32), v.astype(np.float32), v.astype(np.float32))
    a_last = 2.0 / (1.0 + beta)  # sub-diagonal entry in the last row
    d = np.full(n, -2.0)
    d[-1] = -2.0 / beta
    # Similarity D T D^-1 with delta_i = 1 except delta_{n-1} = sqrt((1+beta)/2)
    # makes the off-diagonal sqrt(a_last) symmetric.
    off = np.ones(n - 1)
    off[-1] = np.sqrt(a_last)
    s = np.diag(d) + np.diag(off, 1) + np.diag(off, -1)
    lam, q = np.linalg.eigh(s)
    delta = np.ones(n)
    delta[-1] = np.sqrt((1.0 + beta) / 2.0)
    v = q / delta[:, None]       # V = D^-1 Q
    vi = q.T * delta[None, :]    # V^-1 = Q^T D
    return (lam.astype(np.float32), v.astype(np.float32), vi.astype(np.float32))


@partial(jax.jit, static_argnames=("bh", "bw", "precision"))
def solve_sep_eig(g: jnp.ndarray, bh: float = 1.0, bw: float = 1.0,
                  precision: str = "highest") -> jnp.ndarray:
    """Exact solve of the beta-modified separable Poisson operator.

    A = Th (x) I + I (x) Tw with Th/Tw from beta_eigenbasis. Solves
    ``Th U + U Tw^T = G`` per channel as
    ``U = Vh ((Vh^-1 G Vw^-T) / (lam_h_i + lam_w_j)) Vw^T`` — the same
    4-GEMM MXU shape as solve_dst_gemm, used for multigrid's coarsest level
    where the boundary-consistent hierarchy has beta != 1.
    """
    if bh == 1.0 and bw == 1.0:
        return solve_dst_gemm(g, precision=precision)
    prec = _PRECISIONS[precision]
    _, h, w = g.shape
    lh, vh, vhi = (jnp.asarray(x) for x in beta_eigenbasis(h, round(bh, 9)))
    lw, vw, vwi = (jnp.asarray(x) for x in beta_eigenbasis(w, round(bw, 9)))
    x = _mm(_mm_left(vhi, g, prec), vwi.T, prec)
    x = x / (lh[:, None] + lw[None, :])
    return _mm(_mm_left(vh, x, prec), vw.T, prec)


_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,  # f32 accumulation (bf16_6x on MXU)
    "high": jax.lax.Precision.HIGH,  # bf16_3x: ~2.2x faster on v5e
    "default": jax.lax.Precision.DEFAULT,  # single-pass bf16 (too lossy here)
}


def _mm(a, b, prec):
    return jnp.einsum("...ij,jk->...ik", a, b, precision=prec)


def _mm_2x(a, v, mode):
    """Two-MXU-pass f32-accurate-ish matmul: a (..., k) f32, v (k, n) f32 const.

    ``precision="high"`` (bf16_3x) splits BOTH operands into bf16 hi+lo and
    runs 3 MXU passes. When one operand is a CONSTANT whose rounding error
    is tolerable in bf16, 2 passes suffice:
      - mode "2x_img": image split hi+lo (image exact to ~2^-17), V rounded
        to a single bf16 (~2^-9 systematic on the transform).
      - mode "2x_v": V split hi+lo (transform exact to ~2^-17), image
        rounded to a single bf16.
    Both accumulate f32 on the MXU. Which rounding the Poisson solve
    tolerates is an empirical question — see docs/PERF.md.
    """
    ein = partial(jnp.einsum, "...ij,jk->...ik",
                  preferred_element_type=jnp.float32)
    vf = np.asarray(v, np.float32)
    if mode == "2x_img":
        vb = jnp.asarray(vf).astype(jnp.bfloat16)
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        return ein(ah, vb) + ein(al, vb)
    vh_ = jnp.asarray(vf).astype(jnp.bfloat16)
    vl_ = jnp.asarray(vf) - vh_.astype(jnp.float32)
    ab = a.astype(jnp.bfloat16)
    return ein(ab, vh_) + ein(ab, vl_.astype(jnp.bfloat16))


def _mm_left(m, a, prec):
    return jnp.einsum("ij,...jk->...ik", m, a, precision=prec)


@partial(jax.jit, static_argnames=("h2", "w2", "precision", "interpret"))
def solve_dst_gemm_pl(g_tp: jnp.ndarray, h2: int, w2: int,
                      precision: str = "highest",
                      interpret: bool = False) -> jnp.ndarray:
    """DST solve in PADDED space with Pallas transposes (TPU serve path).

    XLA canonicalizes every GEMM of the DST chain to a right-multiply
    (image @ V, contracting the image's minor dim) and materializes a
    relayout transpose between consecutive GEMMs — measured ~9x off the HBM
    roofline (0.6-1.1 ms each at 2400x1552, ~3.4 ms/frame total). This chain
    keeps the same canonical right-multiply GEMMs but does the three
    inter-GEMM transposes as Pallas strip kernels (~roofline, ~0.07 ms
    each), fusing the spectral divide into the middle one.

    The whole chain runs on 128-aligned PADDED slabs: in is g_tp
    (C, WPo, HPo) f32 — the padded transposed RHS from
    preprocess_rhs_transposed_pallas, interior (w2, h2) at the origin and
    exact zeros elsewhere. With zero-padded V matrices every GEMM stays
    exact and zero-padded, so nothing is sliced or re-padded between stages
    (each such slice cost 0.65-0.9 ms as a misaligned relayout copy). Out:
    (C, HPo, WPo) f32, the natural-orientation solution at the origin.
    """
    from seamlesscloneoptimization_tpu.ops.pallas_kernels import transpose_pallas

    c, wp, hp = g_tp.shape
    vhp = dst_matrix_padded(h2, hp)
    vwp = dst_matrix_padded(w2, wp)
    hi = lambda a, v: _mm(a, v, _PRECISIONS["high"])  # noqa: E731
    lo = lambda a, v: _mm_2x(a, v, "2x_v")  # noqa: E731
    if precision in ("2x_img", "2x_v"):
        mm = mm_inv = lambda a, v: _mm_2x(a, v, precision)  # noqa: E731
    elif precision == "fwd2x":  # forward transform 2-pass, inverse 3-pass
        mm, mm_inv = lo, hi
    elif precision == "inv2x":  # forward 3-pass, inverse 2-pass
        mm, mm_inv = hi, lo
    else:
        prec = _PRECISIONS[precision]
        mm = mm_inv = lambda a, v: _mm(a, v, prec)  # noqa: E731
    # forward: ghat = Vh G Vw, held transposed between the two multiplies
    s1 = mm(g_tp, vhp)                   # (C,WP,HP) = (Vh G)^T
    tr1 = transpose_pallas(s1, interpret=interpret)   # (C,HP,WP) = Vh G
    s2 = mm(tr1, vwp)                    # (C,HP,WP) = ghat
    # spectral divide fused into the transpose back: uhat^T
    tr2 = transpose_pallas(s2, lam_a=dst_eigenvalues_padded(h2, hp),
                           lam_b=dst_eigenvalues_padded(w2, wp),
                           interpret=interpret)       # (C,WP,HP) = uhat^T
    # inverse: u = Vh uhat Vw
    s4 = mm_inv(tr2, vhp)                # (C,WP,HP) = (Vh uhat)^T
    tr3 = transpose_pallas(s4, interpret=interpret)   # (C,HP,WP) = Vh uhat
    return mm_inv(tr3, vwp)              # (C,HP,WP) = u (padded)


@partial(jax.jit, static_argnames=("transform_only", "precision",
                                   "transposed_output", "transposed_input"))
def solve_dst_gemm(
    g: jnp.ndarray,
    transform_only: bool = False,
    precision: str = "highest",
    transposed_output: bool = False,
    transposed_input: bool = False,
) -> jnp.ndarray:
    """Solve A u = g for g: (C, H, W) f32 via 4 batched GEMMs.

    ``transposed_input=True`` means g arrives as (C, W, H) and the whole
    chain runs in transposed space with no physical transpose at either end
    (the output is then always transposed).

    precision: "highest" (f32 accumulation, bit-matches the NumPy oracle) |
    "high" (bf16_3x MXU passes, ~2.2x faster on v5e). Measured end-to-end
    vs cv2 both give diff_max 1 at 300x194 and identical 0.397 mean abs
    diff at 2400x1552 (the large-size diff is direct-vs-FFT-solver
    conditioning shared with the reference's own cuBLAS path, PDF §1.1:
    its diff-sum 13.7M / max 6 at that size). CPU backends ignore this.
    """
    prec = _PRECISIONS[precision]
    if transposed_input:
        _, w, h = g.shape
        vh = dst_matrix(h)
        vw = dst_matrix(w)
        lam_t = jnp.asarray(dst_eigenvalues(w)[:, None] + dst_eigenvalues(h)[None, :])
        ghat_t = _mm(_mm_left(vw, g, prec), vh, prec)
        uhat_t = ghat_t / lam_t[None, :, :]
        return _mm(_mm_left(vw, uhat_t, prec), vh, prec)
    _, h, w = g.shape
    vh = dst_matrix(h)
    vw = dst_matrix(w)
    if transposed_output:
        # run the whole chain in transposed space so the LOGICAL output is
        # (C, W, H): XLA's internal GEMM schedule already ends transposed
        # (see docs/PERF.md op profile), so this skips the final physical
        # un-transpose and lets a layout-aware postprocess consume it
        lam_t = jnp.asarray(dst_eigenvalues(w)[:, None] + dst_eigenvalues(h)[None, :])
        g_t = jnp.swapaxes(g, 1, 2)
        ghat_t = _mm(_mm_left(vw, g_t, prec), vh, prec)
        uhat_t = ghat_t / lam_t[None, :, :]
        return _mm(_mm_left(vw, uhat_t, prec), vh, prec)
    lam = jnp.asarray(dst_eigenvalues(h)[:, None] + dst_eigenvalues(w)[None, :])
    ghat = _mm(_mm_left(vh, g, prec), vw, prec)
    if transform_only:
        return ghat
    uhat = ghat / lam[None, :, :]
    return _mm(_mm_left(vh, uhat, prec), vw, prec)
