"""Seeded randomized-geometry parity sweep vs cv2.seamlessClone.

The fixture-based tests pin known shapes; this sweep walks randomized mask
geometries (rects/ellipses at random offsets, odd/even bbox parities,
frame-touching placements) through BOTH production solvers and asserts the
reference acceptance bar (diff_max <= 1 vs cv2, compare/vs.py discipline)
at every one. Deterministic seeds — a failure reproduces exactly.
"""

import cv2
import numpy as np
import pytest


def _golden_and_ours(airplane, sky, mask, center, solver, **cfg_kw):
    from seamlesscloneoptimization_tpu.core.config import CloneConfig
    from seamlesscloneoptimization_tpu.core.engine import SeamlessClone

    golden = cv2.seamlessClone(airplane, sky, mask.copy(), center,
                               cv2.NORMAL_CLONE)
    eng = SeamlessClone(CloneConfig(solver=solver, **cfg_kw))
    out = np.asarray(eng.run(airplane, sky, mask.copy(), center))
    return golden, out


def _rand_mask(rng, shape, kind):
    h, w = shape
    mask = np.zeros((h, w), np.uint8)
    if kind == "rect":
        # random odd/even extents, possibly frame-touching
        y0 = int(rng.integers(0, h // 2))
        x0 = int(rng.integers(0, w // 2))
        bh = int(rng.integers(40, h - y0 - 1))
        bw = int(rng.integers(40, w - x0 - 1))
        mask[y0 : y0 + bh, x0 : x0 + bw] = 255
    else:  # ellipse
        cy = int(rng.integers(h // 4, 3 * h // 4))
        cx = int(rng.integers(w // 4, 3 * w // 4))
        ay = int(rng.integers(25, h // 3))
        ax = int(rng.integers(25, w // 3))
        cv2.ellipse(mask, (cx, cy), (ax, ay), float(rng.uniform(0, 180)),
                    0, 360, 255, -1)
    return mask


@pytest.mark.parametrize("solver", ["dst_gemm", "multigrid"])
@pytest.mark.parametrize("seed", [3, 8, 17, 22, 29, 36, 41, 54])
def test_random_geometry_bit_close(airplane, sky, solver, seed):
    rng = np.random.default_rng(seed)
    kind = "rect" if seed % 2 else "ellipse"
    mask = _rand_mask(rng, airplane.shape[:2], kind)
    bb = cv2.boundingRect(mask)
    if bb[2] < 3 or bb[3] < 3:
        pytest.skip("degenerate mask draw")
    # center keeping the ROI inside the destination (cv2's own requirement)
    hd, wd = sky.shape[:2]
    left = int(rng.integers(1, wd - bb[2] - 2))
    top = int(rng.integers(1, hd - bb[3] - 2))
    center = (left + bb[2] // 2 + bb[2] % 2, top + bb[3] // 2 + bb[3] % 2)
    kw = {"tol": 2e-5} if solver == "multigrid" else {}
    try:
        golden, out = _golden_and_ours(airplane, sky, mask, center, solver,
                                       **kw)
    except cv2.error:
        pytest.skip("cv2 rejected the placement (outside its ROI rules)")
    d = np.abs(golden.astype(np.int16) - out.astype(np.int16))
    assert d.max() <= 1, (
        f"seed {seed} {kind} bbox {bb} center {center} solver {solver}: "
        f"diff_max {d.max()} sum {d.sum()}")


@pytest.mark.parametrize("seed", [7, 23])
def test_random_geometry_pad_exact_batch(sky, seed):
    """Mixed-size randomized jobs through bucket='pad_exact' (round 5):
    one executable, bit-close to sequential seamless_clone calls."""
    from seamlesscloneoptimization_tpu.api import seamless_clone
    from seamlesscloneoptimization_tpu.parallel.batch import (
        seamless_clone_batch_fused,
    )

    rng = np.random.default_rng(seed)
    dst = np.ascontiguousarray(sky[:420, :620])
    srcs, masks, centers = [], [], []
    anchors = [(150, 110), (450, 110), (300, 310)]  # non-overlapping
    for cx, cy in anchors:
        h = int(rng.integers(28, 64))
        w = int(rng.integers(28, 64))
        src = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        mask = np.zeros((h, w), np.uint8)
        if rng.integers(0, 2):
            mask[1:-1, 1:-1] = 255
        else:
            cv2.ellipse(mask, (w // 2, h // 2), (w // 2 - 2, h // 2 - 2),
                        0, 0, 360, 255, -1)
        srcs.append(src)
        masks.append(mask)
        centers.append((cx + int(rng.integers(-20, 20)),
                        cy + int(rng.integers(-20, 20))))
    out = seamless_clone_batch_fused(dst, srcs, masks, centers,
                                     bucket="pad_exact", tol=1e-6)
    seq = dst.copy()
    for src, mask, c in zip(srcs, masks, centers):
        seq = seamless_clone(src, seq, mask, c, solver="multigrid", tol=1e-6)
    d = np.abs(out.astype(int) - seq.astype(int)).max()
    assert d <= 1, f"seed {seed}: pad_exact vs sequential diff {d}"


@pytest.mark.parametrize("seed", [11, 31])
def test_random_geometry_tiled_serve_engine(airplane, sky, seed):
    """TiledSeamlessClone on the 2x4 virtual mesh through randomized mask
    geometry — the mesh engine honors the same cv2 acceptance bar."""
    import jax

    from seamlesscloneoptimization_tpu.core.config import CloneConfig
    from seamlesscloneoptimization_tpu.parallel import (
        TiledSeamlessClone,
        make_tile_mesh,
    )

    rng = np.random.default_rng(seed)
    mask = _rand_mask(rng, airplane.shape[:2], "ellipse" if seed % 2 else "rect")
    bb = cv2.boundingRect(mask)
    if bb[2] < 3 or bb[3] < 3:
        pytest.skip("degenerate mask draw")
    hd, wd = sky.shape[:2]
    left = int(rng.integers(1, wd - bb[2] - 2))
    top = int(rng.integers(1, hd - bb[3] - 2))
    center = (left + bb[2] // 2 + bb[2] % 2, top + bb[3] // 2 + bb[3] % 2)
    try:
        golden = cv2.seamlessClone(airplane, sky, mask.copy(), center,
                                   cv2.NORMAL_CLONE)
    except cv2.error:
        pytest.skip("cv2 rejected the placement")
    mesh = make_tile_mesh(jax.devices()[:8], (2, 4))
    eng = TiledSeamlessClone(CloneConfig(tol=1e-6), mesh=mesh)
    out = np.asarray(eng.run(airplane, sky, mask.copy(), center))
    d = np.abs(golden.astype(np.int16) - out.astype(np.int16))
    assert d.max() <= 1, f"seed {seed} bbox {bb}: diff_max {d.max()}"


@pytest.mark.parametrize("flags", [2, 3])
@pytest.mark.parametrize("seed", [5, 19])
def test_random_geometry_other_modes(airplane, sky, flags, seed):
    """MIXED_CLONE / MONOCHROME_TRANSFER through the same randomized
    geometry (cv2 5.x goldens; the reference implements NORMAL only)."""
    from seamlesscloneoptimization_tpu.core.config import CloneConfig
    from seamlesscloneoptimization_tpu.core.engine import SeamlessClone

    rng = np.random.default_rng(seed)
    mask = _rand_mask(rng, airplane.shape[:2], "ellipse")
    bb = cv2.boundingRect(mask)
    hd, wd = sky.shape[:2]
    left = int(rng.integers(1, wd - bb[2] - 2))
    top = int(rng.integers(1, hd - bb[3] - 2))
    center = (left + bb[2] // 2 + bb[2] % 2, top + bb[3] // 2 + bb[3] % 2)
    cv2_flag = {2: cv2.MIXED_CLONE, 3: cv2.MONOCHROME_TRANSFER}[flags]
    golden = cv2.seamlessClone(airplane, sky, mask.copy(), center, cv2_flag)
    out = np.asarray(SeamlessClone(CloneConfig(flags=flags)).run(
        airplane, sky, mask.copy(), center))
    d = np.abs(golden.astype(np.int16) - out.astype(np.int16))
    assert d.max() <= 1, (
        f"seed {seed} flags {flags} bbox {bb}: diff_max {d.max()}")
