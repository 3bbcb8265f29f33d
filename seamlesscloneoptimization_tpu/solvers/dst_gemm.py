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


# ---------------------------------------------------------------------------
# Folded (even/odd) DST transforms: half the MXU FLOPs per axis
# ---------------------------------------------------------------------------
#
# The DST-I matrix has the reflection symmetry V[n-1-j, i] = (-1)^i V[j, i]
# (sin((i+1)(n-j)pi/(n+1)) = (-1)^i sin((i+1)(j+1)pi/(n+1))): every EVEN
# output depends only on the symmetric fold s_j = x_j + x_{n-1-j} and every
# ODD output only on the antisymmetric fold d_j = x_j - x_{n-1-j}. So one
# n x n transform GEMM splits into TWO (n/2)-sized GEMMs plus an elementwise
# fold — half the MXU work (the solver is FLOP-bound at large sizes:
# docs/PERF.md, ~3.2 ms of the 4 ms serve frame at 2400x1552). The inverse
# direction uses the same identity on its OUTPUT index: out_x = E_x + O_x,
# out_{n-1-x} = E_x - O_x with E/O the even/odd spectral half-transforms.
# The spectral axis stays in GROUPED order (even block, then odd block)
# between forward and inverse, so no interleave is ever materialized — only
# the grouped eigenvalue vector differs. Same math as the classic
# odd/even DST decimation, laid out for the MXU.


def _ru128(x: int) -> int:
    return (x + 127) // 128 * 128


def fold_pays(n: int) -> bool:
    """Whether the folded transform wins for axis size n (128-pad aware):
    two half-size padded GEMMs vs one full-size padded GEMM.

    The model is the MXU's (everything tiles to 128 there); on CPU backends
    an n slightly above a 128 multiple makes "folded" do more arithmetic
    than the unpadded plain GEMM — irrelevant for the TPU perf target, and
    correctness is identical either way.
    """
    ep = _ru128((n + 1) // 2)
    op = _ru128(n // 2)
    return ep * ep + op * op < _ru128(n) ** 2


def pallas_pair_chain_applies(h2: int, w2: int) -> bool:
    """Whether solve_dst_gemm_pl's fully-Pallas folded PAIR chain runs (both
    axes fold) — the single gate shared with the pipeline, which must know
    because only that chain supports return_parts (the fused
    unfold+guarded-clamp tail)."""
    return fold_pays(h2) and fold_pays(w2)


@lru_cache(maxsize=64)
def dst_matrices_folded(n: int):
    """Padded folded DST-I factor matrices (Vep, Vop, Ve2p, Vo2p) f32.

    he = ceil(n/2), ho = n//2, ep/op their 128-roundups:
    - Vep (ep, ep): Vep[j, r] = V[j, 2r]     (fwd even; row he-1 of odd n is
      the self-paired middle element, counted once in the fold)
    - Vop (op, op): Vop[j, r] = V[j, 2r+1]   (fwd odd)
    - Ve2p (ep, ep): Ve2p[r, x] = V[2r, x]   (inv even, x < he)
    - Vo2p (op, ep): Vo2p[r, x] = V[2r+1, x] (inv odd; V[odd, mid] = 0 makes
      the odd n middle output come out of the even part alone)
    Built host-side in f64 like dst_matrix; zero padding keeps the padded-
    space chain exact.
    """
    i = np.arange(1, n + 1, dtype=np.float64)
    v = np.sin(np.outer(i, i) * (np.pi / (n + 1))) * np.sqrt(2.0 / (n + 1))
    he, ho = (n + 1) // 2, n // 2
    ep, op = _ru128(he), _ru128(ho)
    vep = np.zeros((ep, ep), np.float32)
    vep[:he, :he] = v[:he, 0::2]
    vop = np.zeros((op, op), np.float32)
    vop[:ho, :ho] = v[:ho, 1::2]
    ve2p = np.zeros((ep, ep), np.float32)
    ve2p[:he, :he] = v[0::2, :he]
    vo2p = np.zeros((op, ep), np.float32)
    vo2p[:ho, :he] = v[1::2, :he]
    return vep, vop, ve2p, vo2p


@lru_cache(maxsize=256)
def dst_eigenvalues_grouped(n: int):
    """dst_eigenvalues(n) in the folded chain's GROUPED spectral order:
    [even-index eigenvalues | pad 1e9 to ep | odd-index | pad 1e9 to op]."""
    he, ho = (n + 1) // 2, n // 2
    ep, op = _ru128(he), _ru128(ho)
    lam = dst_eigenvalues(n)
    out = np.full(ep + op, 1e9, np.float32)
    out[:he] = lam[0::2]
    out[ep : ep + ho] = lam[1::2]
    return out


# NOTE on the fold's lane-direction reversals (measured 2026-08-18, v5e):
# jnp.flip(-1) FUSES into the fold's producer/consumer fusion and is the
# fastest available form. Two alternatives were built and measured slower
# end-to-end despite winning isolated microbenches: a dense (n, n) one-hot
# permutation GEMM (exact; serve 3.47 -> 5.36 ms/frame — f32 MXU is ~1/8
# rate) and a grouped decomposition (pad + reshape to (m, 128) tiles +
# cheap tile-order flip + one-hot (128, 128) einsum: isolated 0.284 ms vs
# flip's 0.519 at (3, 1792, 1199), but serve 3.47 -> 4.27 ms/frame because
# none of its stages fuse). Keep the flips; recovering the remaining fold
# overhead needs the reversal INSIDE a fused Pallas fold+GEMM kernel
# (Mosaic has no rev primitive — block-order reversal via index maps plus
# a per-tile one-hot dot would be the route).


def _rev_minor(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.flip(a, -1)


def _rev_rows(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.flip(a, -2)


def dst_fwd_folded_minor(a: jnp.ndarray, n: int, mm) -> jnp.ndarray:
    """Folded DST along the minor axis: (..., KP >= n, zero-padded beyond n)
    -> (..., ep + op) spectral in GROUPED even/odd order (zero-padded)."""
    he, ho = (n + 1) // 2, n // 2
    ep, op = _ru128(he), _ru128(ho)
    vep, vop, _, _ = dst_matrices_folded(n)
    head = a[..., :ho]
    tail = _rev_minor(a[..., n - ho : n])  # a_{n-1-j}, j = 0..ho-1
    s = head + tail
    d = head - tail
    if n % 2:
        s = jnp.concatenate([s, a[..., ho : ho + 1]], axis=-1)
    zpad = [(0, 0)] * (a.ndim - 1)
    s = jnp.pad(s, zpad + [(0, ep - he)])
    d = jnp.pad(d, zpad + [(0, op - ho)])
    return jnp.concatenate([mm(s, vep), mm(d, vop)], axis=-1)


def dst_inv_folded_minor(a: jnp.ndarray, n: int, out_pad: int, mm) -> jnp.ndarray:
    """Inverse folded DST along the minor axis: grouped spectral (..., ep+op)
    -> natural (..., out_pad) with exact zeros beyond n."""
    he, ho = (n + 1) // 2, n // 2
    ep, op = _ru128(he), _ru128(ho)
    _, _, ve2p, vo2p = dst_matrices_folded(n)
    e = mm(a[..., :ep], ve2p)        # E_x, x < he (zeros beyond)
    o = mm(a[..., ep : ep + op], vo2p)
    first = (e + o)[..., :he]                     # out_x,        x < he
    second = _rev_minor((e - o)[..., :ho])        # out_{n-1-x},  x = ho-1..0
    zpad = [(0, 0)] * (a.ndim - 1)
    return jnp.pad(jnp.concatenate([first, second], axis=-1),
                   zpad + [(0, out_pad - n)])


def dst_fwd_folded_rows(a: jnp.ndarray, n: int, mm_left) -> jnp.ndarray:
    """Folded DST along axis -2 (left-multiply orientation): (..., n, M)
    -> (..., ep + op, M) spectral in grouped even/odd order."""
    he, ho = (n + 1) // 2, n // 2
    ep, op = _ru128(he), _ru128(ho)
    vep, vop, _, _ = dst_matrices_folded(n)
    head = a[..., :ho, :]
    tail = _rev_rows(a[..., n - ho : n, :])
    s = head + tail
    d = head - tail
    if n % 2:
        s = jnp.concatenate([s, a[..., ho : ho + 1, :]], axis=-2)
    zpad = [(0, 0)] * (a.ndim - 2)
    s = jnp.pad(s, zpad + [(0, ep - he), (0, 0)])
    d = jnp.pad(d, zpad + [(0, op - ho), (0, 0)])
    # out[2r] = sum_j Ve[j, r] s_j  ->  Ve^T @ s (and likewise odd)
    return jnp.concatenate([mm_left(vep.T, s), mm_left(vop.T, d)], axis=-2)


def dst_inv_folded_rows(a: jnp.ndarray, n: int, mm_left) -> jnp.ndarray:
    """Inverse folded DST along axis -2: grouped spectral (..., ep+op, M)
    -> natural (..., n, M)."""
    he, ho = (n + 1) // 2, n // 2
    ep, op = _ru128(he), _ru128(ho)
    _, _, ve2p, vo2p = dst_matrices_folded(n)
    e = mm_left(ve2p.T, a[..., :ep, :])           # E_x = sum_r Ve2[r, x] ue_r
    o = mm_left(vo2p.T, a[..., ep : ep + op, :])
    first = (e + o)[..., :he, :]
    second = _rev_rows((e - o)[..., :ho, :])
    return jnp.concatenate([first, second], axis=-2)


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


@partial(jax.jit, static_argnames=("h2", "w2", "precision", "interpret",
                                   "folded", "pallas_fold", "return_parts"))
def solve_dst_gemm_pl(g_tp: jnp.ndarray, h2: int, w2: int,
                      precision: str = "highest",
                      interpret: bool = False,
                      folded: bool = False,
                      pallas_fold: bool = True,
                      return_parts: bool = False):
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

    ``folded=True`` runs each axis transform in the even/odd FOLDED form
    (see dst_matrices_folded): two half-size GEMMs per transform — half the
    MXU FLOPs — at the cost of one elementwise fold/unfold pass per
    transform. The spectral axes travel in grouped even/odd order between
    forward and inverse (grouped eigenvalue vectors feed the fused divide),
    so nothing is re-interleaved mid-chain. Applied per axis only where the
    128-padded half-GEMMs actually win (fold_pays).

    ``pallas_fold=True`` (default) runs those fold/unfold passes as Pallas
    strip kernels (fold_minor_pallas/unfold_minor_pallas) instead of XLA
    fusions — one ~roofline pass each vs 0.28-0.56 ms per XLA fold pair at
    2400x1552 (docs/PERF.md). Bit-identical: the kernels' lane reversal is
    exact and the summation order matches.
    """
    from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
        fold_minor_pallas,
        transpose_pair_pallas,
        transpose_pallas,
        unfold_minor_pallas,
        unfold_transpose_pallas,
    )

    c, wp, hp = g_tp.shape
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

    if folded and pallas_fold and pallas_pair_chain_applies(h2, w2):
        # fully-Pallas folded chain: every fold/unfold is a strip kernel and
        # every transpose consumes/produces the GEMM operands directly (pair
        # inputs, row-window outputs) so XLA never materializes a concat or
        # a slice copy between stages. 9 ~roofline passes + 8 half-GEMMs.
        vep_h, vop_h, ve2p_h, vo2p_h = dst_matrices_folded(h2)
        vep_w, vop_w, ve2p_w, vo2p_w = dst_matrices_folded(w2)
        lam_h = dst_eigenvalues_grouped(h2)  # grouped, len GH = ep_h + op_h
        lam_w = dst_eigenvalues_grouped(w2)
        ep_h, op_h = _ru128((h2 + 1) // 2), _ru128(h2 // 2)
        ep_w, op_w = _ru128((w2 + 1) // 2), _ru128(w2 // 2)
        # forward h: fold the minor (H) axis, two half-GEMMs
        s, d = fold_minor_pallas(g_tp, h2, interpret=interpret)
        fe, fo = mm(s, vep_h), mm(d, vop_h)        # (C,WP,ep_h), (C,WP,op_h)
        tr1 = transpose_pair_pallas(fe, fo, interpret=interpret)  # (C,GH,WP)
        # forward w on the transposed slab
        s2, d2 = fold_minor_pallas(tr1, w2, interpret=interpret)
        ge, go = mm(s2, vep_w), mm(d2, vop_w)      # (C,GH,ep_w), (C,GH,op_w)
        # spectral divide fused into the transposes back; the two row
        # windows of GH come out as separate slabs for the inverse GEMMs
        tr2e = transpose_pair_pallas(ge, go, lam_p=lam_w, lam_r=lam_h,
                                     row_start=0, row_count=ep_h,
                                     interpret=interpret)   # (C,GW,ep_h)
        tr2o = transpose_pair_pallas(ge, go, lam_p=lam_w, lam_r=lam_h,
                                     row_start=ep_h, row_count=op_h,
                                     interpret=interpret)   # (C,GW,op_h)
        e_h, o_h = mm_inv(tr2e, ve2p_h), mm_inv(tr2o, vo2p_h)  # (C,GW,ep_h) x2
        # unfold along h FUSED into the transposes back (no unfolded slab)
        t3e = unfold_transpose_pallas(e_h, o_h, h2, hp, row_start=0,
                                      row_count=ep_w, interpret=interpret)
        t3o = unfold_transpose_pallas(e_h, o_h, h2, hp, row_start=ep_w,
                                      row_count=op_w, interpret=interpret)
        e_w, o_w = mm_inv(t3e, ve2p_w), mm_inv(t3o, vo2p_w)
        if return_parts:
            return e_w, o_w
        return unfold_minor_pallas(e_w, o_w, w2, wp, interpret=interpret)

    # return_parts is ONLY meaningful on the pair chain above; reaching here
    # with it set means the caller's gate drifted from pallas_pair_chain_applies
    assert not return_parts, (
        "return_parts requires folded+pallas_fold and pallas_pair_chain_applies"
        f"(h2={h2}, w2={w2})")

    def axis_ops(n, n_pad):
        """(fwd, inv, lam) for one axis: folded where it pays, plain else."""
        if folded and fold_pays(n):
            if pallas_fold:
                he, ho = (n + 1) // 2, n // 2
                ep, op = _ru128(he), _ru128(ho)
                vep, vop, ve2p, vo2p = dst_matrices_folded(n)

                def fwd(a):
                    s, d = fold_minor_pallas(a, n, interpret=interpret)
                    return jnp.concatenate([mm(s, vep), mm(d, vop)], axis=-1)

                def inv(a):
                    e = mm_inv(a[..., :ep], ve2p)
                    o = mm_inv(a[..., ep:ep + op], vo2p)
                    return unfold_minor_pallas(e, o, n, n_pad,
                                               interpret=interpret)

                return fwd, inv, dst_eigenvalues_grouped(n)
            return (lambda a: dst_fwd_folded_minor(a, n, mm),
                    lambda a: dst_inv_folded_minor(a, n, n_pad, mm_inv),
                    dst_eigenvalues_grouped(n))
        vp = dst_matrix_padded(n, n_pad)
        return (lambda a: mm(a, vp),
                lambda a: mm_inv(a, vp),
                dst_eigenvalues_padded(n, n_pad))

    fwd_h, inv_h, lam_h = axis_ops(h2, hp)
    fwd_w, inv_w, lam_w = axis_ops(w2, wp)
    # forward: ghat = Vh G Vw, held transposed between the two multiplies
    s1 = fwd_h(g_tp)                     # (C,WP,HG) = (Vh G)^T
    tr1 = transpose_pallas(s1, interpret=interpret)   # (C,HG,WP) = Vh G
    s2 = fwd_w(tr1)                      # (C,HG,WG) = ghat
    # spectral divide fused into the transpose back: uhat^T
    tr2 = transpose_pallas(s2, lam_a=lam_h, lam_b=lam_w,
                           interpret=interpret)       # (C,WG,HG) = uhat^T
    # inverse: u = Vh uhat Vw
    s4 = inv_h(tr2)                      # (C,WG,HP) = (Vh uhat)^T
    tr3 = transpose_pallas(s4, interpret=interpret)   # (C,HP,WG) = Vh uhat
    return inv_w(tr3)                    # (C,HP,WP) = u (padded)


def _solve_folded(g2: jnp.ndarray, nr: int, nc: int, prec) -> jnp.ndarray:
    """Folded-transform solve of the (C, nr, nc) system, per-axis gated.

    Rows go through the left-multiply folds, columns through the minor-axis
    folds; the spectral domain lives in grouped even/odd order on each
    folded axis, with the matching grouped (1e9-padded) eigenvalue vectors.
    """
    mm_l = lambda m, a: _mm_left(m, a, prec)  # noqa: E731
    mm_r = lambda a, m: _mm(a, m, prec)  # noqa: E731
    fr, fc = fold_pays(nr), fold_pays(nc)
    x = (dst_fwd_folded_rows(g2, nr, mm_l) if fr
         else _mm_left(dst_matrix(nr), g2, prec))
    x = (dst_fwd_folded_minor(x, nc, mm_r) if fc
         else _mm(x, dst_matrix(nc), prec))
    lr = dst_eigenvalues_grouped(nr) if fr else dst_eigenvalues(nr)
    lc = dst_eigenvalues_grouped(nc) if fc else dst_eigenvalues(nc)
    x = x / jnp.asarray(lr[:, None] + lc[None, :])[None]
    x = (dst_inv_folded_rows(x, nr, mm_l) if fr
         else _mm_left(dst_matrix(nr), x, prec))
    return (dst_inv_folded_minor(x, nc, nc, mm_r) if fc
            else _mm(x, dst_matrix(nc), prec))


@partial(jax.jit, static_argnames=("transform_only", "precision",
                                   "transposed_output", "transposed_input",
                                   "folded"))
def solve_dst_gemm(
    g: jnp.ndarray,
    transform_only: bool = False,
    precision: str = "highest",
    transposed_output: bool = False,
    transposed_input: bool = False,
    folded: bool = False,
) -> jnp.ndarray:
    """Solve A u = g for g: (C, H, W) f32 via 4 batched GEMMs.

    ``transposed_input=True`` means g arrives as (C, W, H) and the whole
    chain runs in transposed space with no physical transpose at either end
    (the output is then always transposed).

    ``folded=True`` uses the even/odd-folded transforms (half the MXU FLOPs
    per axis where the fold pays — see dst_matrices_folded); ignored for
    ``transform_only`` whose contract is the natural-order spectrum.

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
        if folded:
            return _solve_folded(g, w, h, prec)
        vh = dst_matrix(h)
        vw = dst_matrix(w)
        lam_t = jnp.asarray(dst_eigenvalues(w)[:, None] + dst_eigenvalues(h)[None, :])
        ghat_t = _mm(_mm_left(vw, g, prec), vh, prec)
        uhat_t = ghat_t / lam_t[None, :, :]
        return _mm(_mm_left(vw, uhat_t, prec), vh, prec)
    _, h, w = g.shape
    if transposed_output:
        # run the whole chain in transposed space so the LOGICAL output is
        # (C, W, H): XLA's internal GEMM schedule already ends transposed
        # (see docs/PERF.md op profile), so this skips the final physical
        # un-transpose and lets a layout-aware postprocess consume it
        g_t = jnp.swapaxes(g, 1, 2)
        if folded:
            return _solve_folded(g_t, w, h, prec)
        vh = dst_matrix(h)
        vw = dst_matrix(w)
        lam_t = jnp.asarray(dst_eigenvalues(w)[:, None] + dst_eigenvalues(h)[None, :])
        ghat_t = _mm(_mm_left(vw, g_t, prec), vh, prec)
        uhat_t = ghat_t / lam_t[None, :, :]
        return _mm(_mm_left(vw, uhat_t, prec), vh, prec)
    if folded and not transform_only:
        return _solve_folded(g, h, w, prec)
    vh = dst_matrix(h)
    vw = dst_matrix(w)
    lam = jnp.asarray(dst_eigenvalues(h)[:, None] + dst_eigenvalues(w)[None, :])
    ghat = _mm(_mm_left(vh, g, prec), vw, prec)
    if transform_only:
        return ghat
    uhat = ghat / lam[None, :, :]
    return _mm(_mm_left(vh, uhat, prec), vw, prec)
