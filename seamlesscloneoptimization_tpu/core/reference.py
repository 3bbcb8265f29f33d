"""Pure-NumPy reference implementation of OpenCV's ``seamlessClone``.

This module is the *oracle* for the whole framework: every JAX / Pallas stage is
validated against the stages here, and this pipeline itself is validated against
``cv2.seamlessClone`` (golden comparison, the strategy of the reference repo's
``compare/vs.py``).

Algorithm (Poisson image editing, Perez et al. 2003, NORMAL_CLONE mode), matching
OpenCV 3.4.5 ``modules/photo/src/seamless_cloning.cpp`` and the reference CUDA
pipeline (see ``/root/reference/seamlessClone-CUDA/seamlessClone_imp.cpp``):

1.  Zero a 1-px frame of the mask (ref: ``setMaskBoundaryToConstant``,
    seamlessClone_imp.cpp:967-976).
2.  Bounding box of non-zero mask pixels (ref: ``calBoundingBox``,
    seamlessClone_imp.cpp:927-963).
3.  Destination ROI centered at ``p``: ``leftTop = p - (bbox_w//2, bbox_h//2)``
    (ref: seamlessClone_imp.cpp:1066).
4.  3x binary erosion of the mask ROI with a 3x3 all-ones kernel
    (ref: ``myErode`` x3, seamlessClone_imp.cpp:892-925, 1060-1062).
5.  Guidance field: forward-difference gradients of destination ROI and patch,
    blended per pixel by the eroded mask (ref: ``pre_process_kernel_gradient``,
    seamlessClone_imp.cpp:1920-1964).
6.  Poisson RHS: backward-difference divergence of the guidance field minus the
    Dirichlet boundary pixels of the destination ROI
    (ref: ``pre_process_kernel_lapXY``, seamlessClone_imp.cpp:1966-2018).
7.  Direct Poisson solve per channel with the DST eigenbasis
    (ref: ``poissonSolver2D``, seamlessClone_imp.cpp:1322-1334).
8.  Clamp to [0,255], truncate-cast to u8, write interior back
    (ref: ``post_processing``, seamlessClone_imp.cpp:2078-2103; truncation
    rather than rounding matches OpenCV's ``Cloning::solve``).
"""

from __future__ import annotations

import numpy as np

# Clone modes, numerically identical to OpenCV's cv2.NORMAL_CLONE etc.
NORMAL_CLONE = 1
MIXED_CLONE = 2
MONOCHROME_TRANSFER = 3

# MIXED_CLONE gradient-selection rule: "opencv" (bit-parity with shipped
# cv2, component-difference comparison) or "norm" (larger-|grad|^2, the
# Perez/3.4.5-style variant). Module-level so all paths stay consistent.
MIXED_RULE = "opencv"


# ---------------------------------------------------------------------------
# Stage 1-2: mask preparation
# ---------------------------------------------------------------------------

def zero_mask_border(mask: np.ndarray) -> np.ndarray:
    """Zero the 1-px frame of a mask (ref: seamlessClone_imp.cpp:967-976)."""
    out = mask.copy()
    out[0, :] = 0
    out[-1, :] = 0
    out[:, 0] = 0
    out[:, -1] = 0
    return out


def mask_bounding_box(mask: np.ndarray) -> tuple[int, int, int, int]:
    """(x0, y0, w, h) bounding box of non-zero pixels (like cv2.boundingRect).

    Ref: ``calBoundingBox`` seamlessClone_imp.cpp:927-963 (atomicMin/Max scan).
    """
    ys, xs = np.nonzero(mask)
    if ys.size == 0:
        return (0, 0, 0, 0)
    x0, x1 = int(xs.min()), int(xs.max())
    y0, y1 = int(ys.min()), int(ys.max())
    return (x0, y0, x1 - x0 + 1, y1 - y0 + 1)


def erode3x3(mask: np.ndarray, iterations: int = 3) -> np.ndarray:
    """Binary 3x3 erosion with a ZERO border, applied ``iterations`` times.

    Matches the reference ``myErode`` (seamlessClone_imp.cpp:892-925), which
    forces the ROI border to 0 so the mask erodes inward from the bounding-box
    edge. This also matches OpenCV's behavior: ``Cloning::computeDerivatives``
    erodes ``maskROI``, a *view* into the full mask whose surrounding pixels
    are all zero (the bounding box is tight), so the erosion sees zeros at the
    ROI border. Empirically this choice is what makes the output bit-close to
    ``cv2.seamlessClone`` (pad=255 gives a smooth error field up to ~50 LSB).
    """
    m = mask.astype(np.uint8)
    for _ in range(iterations):
        p = np.pad(m, 1, mode="constant", constant_values=0)
        acc = np.full(m.shape, 255, np.uint16)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                acc = np.minimum(acc, p[1 + dy : 1 + dy + m.shape[0], 1 + dx : 1 + dx + m.shape[1]])
        m = acc.astype(np.uint8)
    return m


# ---------------------------------------------------------------------------
# Stage 5: guidance field
# ---------------------------------------------------------------------------

def gradient_x(img: np.ndarray) -> np.ndarray:
    """Forward difference along x with reflect-101 border: g[:, w-1] = 0.

    OpenCV ``computeGradientX``: filter2D kernel [[0,0,0],[0,-1,1],[0,0,0]],
    BORDER_DEFAULT (reflect101) makes the last column difference zero.
    Ref CUDA: seamlessClone_imp.cpp:1937-1947.
    """
    g = np.zeros_like(img, dtype=np.float32)
    g[:, :-1] = img[:, 1:].astype(np.float32) - img[:, :-1].astype(np.float32)
    return g


def gradient_y(img: np.ndarray) -> np.ndarray:
    """Forward difference along y with reflect-101 border: g[h-1, :] = 0."""
    g = np.zeros_like(img, dtype=np.float32)
    g[:-1, :] = img[1:, :].astype(np.float32) - img[:-1, :].astype(np.float32)
    return g


def guidance_field(
    dest_roi: np.ndarray,
    patch: np.ndarray,
    mask_eroded: np.ndarray,
    flags: int = NORMAL_CLONE,
) -> tuple[np.ndarray, np.ndarray]:
    """Blend patch and background gradients by the eroded mask.

    NORMAL_CLONE: g = (1-m)*grad(dest) + m*grad(patch)
    MIXED_CLONE: per pixel pick the stronger gradient inside the mask.
    MONOCHROME_TRANSFER: use grayscale patch gradients inside the mask.
    Ref: seamlessClone_imp.cpp:1950-1953 (NORMAL only in the reference).
    """
    m = (mask_eroded.astype(np.float32) / 255.0)[..., None]
    gx_d, gy_d = gradient_x(dest_roi), gradient_y(dest_roi)
    if flags == NORMAL_CLONE:
        gx_p, gy_p = gradient_x(patch), gradient_y(patch)
    elif flags == MIXED_CLONE:
        # Per-pixel-per-channel, keep the patch gradient iff
        #   |gx_p - gy_p| > |gx_d - gy_d|        (strict >)
        # — the comparison OpenCV actually ships (Cloning::normalClone MIXED
        # branch, modules/photo/src/seamless_cloning_impl.cpp; identified
        # empirically against cv2 5.0: diff_max <= 1 on random images,
        # whereas gradient-norm comparisons diverge by ~40-90 LSB). The
        # textbook larger-|grad|^2 rule is kept as MIXED_RULE="norm".
        gx_p, gy_p = gradient_x(patch), gradient_y(patch)
        if MIXED_RULE == "norm":  # Perez-paper-style variant
            take_d = (gx_p * gx_p + gy_p * gy_p) < (gx_d * gx_d + gy_d * gy_d)
        else:
            take_d = np.abs(gx_p - gy_p) <= np.abs(gx_d - gy_d)
        gx_p = np.where(take_d, gx_d, gx_p)
        gy_p = np.where(take_d, gy_d, gy_p)
    elif flags == MONOCHROME_TRANSFER:
        # OpenCV cvtColor BGR2GRAY fixed-point arithmetic (round-to-nearest):
        # bit-closeness requires the u8-rounded gray, not the float blend.
        b = patch[..., 0].astype(np.int64)
        g_ = patch[..., 1].astype(np.int64)
        r = patch[..., 2].astype(np.int64)
        gray = ((b * 3735 + g_ * 19235 + r * 9798 + (1 << 14)) >> 15).astype(np.uint8)
        gx_p = gradient_x(gray)[..., None].repeat(patch.shape[2], axis=2)
        gy_p = gradient_y(gray)[..., None].repeat(patch.shape[2], axis=2)
    else:
        raise ValueError(f"unknown clone flags={flags}")
    gx = (1.0 - m) * gx_d + m * gx_p
    gy = (1.0 - m) * gy_d + m * gy_p
    return gx, gy


# ---------------------------------------------------------------------------
# Stage 6: Poisson RHS with Dirichlet boundary
# ---------------------------------------------------------------------------

def poisson_rhs(gx: np.ndarray, gy: np.ndarray, dest_roi: np.ndarray) -> np.ndarray:
    """RHS g on the interior grid (h-2, w-2, C).

    lap(i,j) = gx(i,j)-gx(i,j-1) + gy(i,j)-gy(i-1,j)  (backward divergence),
    then subtract the Dirichlet boundary values of dest_roi on interior cells
    adjacent to the ROI frame. Ref: seamlessClone_imp.cpp:1966-2018.
    """
    h, w = gx.shape[:2]
    lap = np.zeros_like(gx)
    lap[:, 1:] += gx[:, 1:] - gx[:, :-1]
    lap[1:, :] += gy[1:, :] - gy[:-1, :]
    g = lap[1:-1, 1:-1].copy()
    d = dest_roi.astype(np.float32)
    g[0, :] -= d[0, 1:-1]
    g[-1, :] -= d[-1, 1:-1]
    g[:, 0] -= d[1:-1, 0]
    g[:, -1] -= d[1:-1, -1]
    return g


# ---------------------------------------------------------------------------
# Stage 7: DST direct solver
# ---------------------------------------------------------------------------

def dst_matrix(n: int) -> np.ndarray:
    """Orthonormal DST-I matrix V[i,j] = sin((i+1)(j+1)pi/(n+1)) * sqrt(2/(n+1)).

    Symmetric and orthogonal: V @ V = I, so forward and inverse transforms are
    the same GEMM (ref: ``initDSTMatrix_kernel`` seamlessClone_imp.cpp:569-603).
    """
    i = np.arange(1, n + 1, dtype=np.float64)
    V = np.sin(np.outer(i, i) * (np.pi / (n + 1))) * np.sqrt(2.0 / (n + 1))
    return V.astype(np.float32)


def dst_eigenvalues(n: int) -> np.ndarray:
    """Eigenvalues of the 1-D second-difference operator: 2(cos(k pi/(n+1)) - 1).

    Ref: ``resetLambda`` seamlessClone_imp.cpp:521-530.
    """
    k = np.arange(1, n + 1, dtype=np.float64)
    return (2.0 * (np.cos(k * np.pi / (n + 1)) - 1.0)).astype(np.float32)


def poisson_solve_dst(g: np.ndarray) -> np.ndarray:
    """Solve the 5-point Laplacian system A u = g on the interior grid.

    u = V_h ( (V_h g V_w) / (lam_h[:,None] + lam_w[None,:]) ) V_w per channel.
    Ref: ``poissonSolver2D`` seamlessClone_imp.cpp:1322-1334.
    """
    h, w = g.shape[:2]
    Vh, Vw = dst_matrix(h), dst_matrix(w)
    lam = dst_eigenvalues(h)[:, None] + dst_eigenvalues(w)[None, :]
    out = np.empty_like(g, dtype=np.float32)
    for c in range(g.shape[2]):
        ghat = Vh @ g[..., c] @ Vw
        out[..., c] = Vh @ (ghat / lam) @ Vw
    return out


# ---------------------------------------------------------------------------
# Stage 8: post-processing
# ---------------------------------------------------------------------------

def postprocess(u: np.ndarray, dest_roi: np.ndarray) -> np.ndarray:
    """Clamp to [0,255], truncate-cast to u8, insert into a copy of dest_roi.

    Truncation (not rounding) matches OpenCV ``Cloning::solve`` and the
    reference ``post_processing`` kernel (seamlessClone_imp.cpp:2078-2103).
    """
    out = dest_roi.copy()
    out[1:-1, 1:-1] = np.clip(u, 0.0, 255.0).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------

def seamless_clone_np(
    src: np.ndarray,
    dst: np.ndarray,
    mask: np.ndarray | None,
    center: tuple[int, int],
    flags: int = NORMAL_CLONE,
    return_stages: bool = False,
):
    """NumPy reference for cv2.seamlessClone(src, dst, mask, center, flags).

    Args:
      src: (hs, ws, C) uint8 source patch.
      dst: (hd, wd, C) uint8 destination image.
      mask: (hs, ws) uint8 mask (None = full 255), nonzero = inside.
      center: (x, y) center of the pasted patch in dst coordinates.
      flags: NORMAL_CLONE | MIXED_CLONE | MONOCHROME_TRANSFER.
      return_stages: also return a dict of intermediate arrays for stage-level
        diffing (the ``g`` vs ``mod_diff`` debugging method of compare/vs.py).
    """
    if src.ndim != 3 or dst.ndim != 3:
        raise ValueError("src and dst must be HxWxC")
    if mask is None:
        mask = np.full(src.shape[:2], 255, np.uint8)
    if mask.ndim == 3:
        mask = mask[..., 0]
    if mask.shape != src.shape[:2]:
        raise ValueError(f"mask shape {mask.shape} != src {src.shape[:2]}")

    mask = zero_mask_border(np.where(mask != 0, np.uint8(255), np.uint8(0)))
    x0, y0, bw, bh = mask_bounding_box(mask)
    if bw == 0 or bh == 0:
        return (dst.copy(), {}) if return_stages else dst.copy()

    cx, cy = center
    left, top = cx - bw // 2, cy - bh // 2
    if left < 0 or top < 0 or left + bw > dst.shape[1] or top + bh > dst.shape[0]:
        raise ValueError("patch ROI falls outside the destination image")

    mask_roi = mask[y0 : y0 + bh, x0 : x0 + bw]
    # OpenCV zeroes src outside the (pre-erosion) mask when building sourceROI.
    patch = np.where(mask_roi[..., None] != 0, src[y0 : y0 + bh, x0 : x0 + bw], 0)
    dest_roi = dst[top : top + bh, left : left + bw]

    mask_eroded = erode3x3(mask_roi, iterations=3)
    gx, gy = guidance_field(dest_roi, patch, mask_eroded, flags)
    g = poisson_rhs(gx, gy, dest_roi)
    u = poisson_solve_dst(g)
    blended_roi = postprocess(u, dest_roi)

    out = dst.copy()
    out[top : top + bh, left : left + bw] = blended_roi
    if return_stages:
        stages = {
            "bbox": (x0, y0, bw, bh),
            "left_top": (left, top),
            "mask_roi": mask_roi,
            "mask_eroded": mask_eroded,
            "patch": patch,
            "gx": gx,
            "gy": gy,
            "rhs": g,
            "u": u,
        }
        return out, stages
    return out


# ---------------------------------------------------------------------------
# Local gradient-domain editing (OpenCV photo-module family)
# ---------------------------------------------------------------------------
#
# cv2's colorChange / illuminationChange / textureFlattening share the
# seamlessClone machinery but solve on the WHOLE image (Dirichlet frame =
# the image border, interior (H-2, W-2)) with the guidance modified only
# inside the 3x-eroded mask. Rules pinned empirically against the installed
# cv2 5.0 (diff_max <= 1 on random images; see tests): the erosion here uses
# cv2.erode's REPLICATE-max border (out-of-bounds counts as 255), unlike
# seamlessClone's zero-border myErode — the local-edit path never
# border-zeroes the mask. The reference CUDA repo has none of these; they
# extend its NORMAL_CLONE-only scope (seamlessClone_imp.cu:301).

COLOR_CHANGE = "color_change"
ILLUMINATION_CHANGE = "illumination_change"
TEXTURE_FLATTENING = "texture_flattening"


def erode3x3_replicate(mask: np.ndarray, iterations: int = 3) -> np.ndarray:
    """Binary 3x3 erosion, out-of-bounds treated as 255 (cv2.erode default
    border for erosion): border pixels stay set unless an IN-image neighbor
    is zero."""
    m = mask.astype(np.uint8)
    for _ in range(iterations):
        p = np.pad(m, 1, mode="constant", constant_values=255)
        acc = np.full(m.shape, 255, np.uint16)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                acc = np.minimum(
                    acc, p[1 + dy : 1 + dy + m.shape[0], 1 + dx : 1 + dx + m.shape[1]]
                )
        m = acc.astype(np.uint8)
    return m


def local_edit_np(
    src: np.ndarray,
    mask: np.ndarray | None,
    kind: str,
    *,
    red_mul: float = 1.0,
    green_mul: float = 1.0,
    blue_mul: float = 1.0,
    alpha: float = 0.2,
    beta: float = 0.4,
    edge_mask: np.ndarray | None = None,
) -> np.ndarray:
    """NumPy oracle for cv2.{colorChange, illuminationChange,
    textureFlattening}(src, mask, ...).

    kind selects the in-mask gradient modification:
      COLOR_CHANGE          g *= (blue_mul, green_mul, red_mul) per channel
      ILLUMINATION_CHANGE   g *= alpha^beta * |g|^-beta  (0-gradients -> 0,
                            OpenCV's patchNaNs)
      TEXTURE_FLATTENING    g *= edge_mask (the caller supplies the Canny
                            edge map of the masked source — cv2.Canny(src,
                            low, high, apertureSize=kernel_size); Canny
                            itself is host-side input prep, not part of the
                            Poisson pipeline)
    """
    if mask is None:
        mask = np.full(src.shape[:2], 255, np.uint8)
    m_er = erode3x3_replicate((mask != 0).astype(np.uint8) * 255, 3)
    me = (m_er.astype(np.float32) / 255.0)[..., None]
    gx_d, gy_d = gradient_x(src), gradient_y(src)
    gxm = gx_d * me
    gym = gy_d * me
    if kind == COLOR_CHANGE:
        fac = np.array([blue_mul, green_mul, red_mul], np.float32)
        gxm, gym = gxm * fac, gym * fac
    elif kind == ILLUMINATION_CHANGE:
        mag = np.sqrt(gxm * gxm + gym * gym)
        with np.errstate(divide="ignore", invalid="ignore"):
            scale = (alpha**beta) * mag ** (-beta)
        scale = np.nan_to_num(scale, nan=0.0, posinf=0.0, neginf=0.0)
        gxm, gym = gxm * scale, gym * scale
    elif kind == TEXTURE_FLATTENING:
        assert edge_mask is not None, "texture_flattening needs the Canny edges"
        e = (edge_mask.astype(np.float32) / 255.0)[..., None]
        gxm, gym = gxm * e, gym * e
    else:
        raise ValueError(f"unknown edit kind={kind!r}")
    gx = gx_d * (1.0 - me) + gxm
    gy = gy_d * (1.0 - me) + gym
    g = poisson_rhs(gx, gy, src)
    u = poisson_solve_dst(g)
    return postprocess(u, src)
