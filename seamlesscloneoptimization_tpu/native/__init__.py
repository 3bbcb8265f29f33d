"""Native (C++) runtime utilities: YAML/BMP IO and host-side mask prep.

The compute path of this framework is JAX/XLA/Pallas on TPU; this package is
the native host runtime around it — the TPU-native counterpart of the
reference's C++/CUDA host code:

- OpenCV-FileStorage YAML matrix IO (the bit-exact fixture format,
  ref: seamlessClone-CUDA/seamlessClone_imp.cu:226-237, imp.h:49-63)
- 24-bit BMP writer/reader (ref: writeBMP, seamlessClone_imp.cu:68-190)
- fused binarize + border-zero + bbox mask prep (ref kernels
  seamlessClone_imp.cpp:967-1012, moved host-side here because the bbox
  decides the jit-static shapes)

The extension builds on first import with g++ (no pip installs needed) and
is cached next to the source. Every entry point has a NumPy-facing wrapper
below; ``HAVE_NATIVE`` tells callers whether the fast path loaded.
"""

from __future__ import annotations

import subprocess
import sysconfig
from pathlib import Path

import numpy as np

_here = Path(__file__).resolve().parent
_src = _here / "src" / "scnative.cpp"
_ext_suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
_so = _here / f"scnative{_ext_suffix}"

_DT = {"u": np.uint8, "s": np.int16, "i": np.int32, "f": np.float32, "d": np.float64}
_DT_FROM_NP = {np.dtype(v): k for k, v in _DT.items()}


def _build() -> None:
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", str(_src), "-o", str(_so),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load():
    if not _so.exists() or _so.stat().st_mtime < _src.stat().st_mtime:
        _build()
    import importlib.util

    spec = importlib.util.spec_from_file_location("scnative", _so)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


try:
    _native = _load()
    HAVE_NATIVE = True
except Exception:  # pragma: no cover - toolchain missing
    _native = None
    HAVE_NATIVE = False


def read_yaml_mat(path) -> np.ndarray:
    """Read an OpenCV FileStorage YAML matrix -> (H, W) or (H, W, C) ndarray."""
    m = _native.read_yaml_mat(str(path))
    arr = np.frombuffer(m["data"], dtype=_DT[m["dt"]])
    if m["channels"] == 1:
        return arr.reshape(m["rows"], m["cols"]).copy()
    return arr.reshape(m["rows"], m["cols"], m["channels"]).copy()


def write_yaml_mat(path, arr: np.ndarray, name: str = "mat") -> None:
    """Write an ndarray as an OpenCV FileStorage YAML matrix."""
    arr = np.ascontiguousarray(arr)
    if arr.ndim == 2:
        rows, cols, ch = arr.shape[0], arr.shape[1], 1
    elif arr.ndim == 3:
        rows, cols, ch = arr.shape
    else:
        raise ValueError("array must be 2-D or 3-D")
    dt = _DT_FROM_NP.get(arr.dtype)
    if dt is None:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    _native.write_yaml_mat(str(path), name, rows, cols, ch, dt, arr.tobytes())


def write_bmp(path, img: np.ndarray) -> None:
    """Write (H, W) or (H, W, 3) uint8 (BGR interleaved) as 24-bit BMP."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    c = 1 if img.ndim == 2 else img.shape[2]
    _native.write_bmp(str(path), img.shape[0], img.shape[1], c, img.tobytes())


def read_bmp(path) -> np.ndarray:
    """Read a 24-bit BMP -> (H, W, 3) uint8 BGR."""
    h, w, data = _native.read_bmp(str(path))
    return np.frombuffer(data, np.uint8).reshape(h, w, 3).copy()


def prep_mask(mask: np.ndarray):
    """Binarize + 1-px border zero + bbox, one native pass.

    Returns (prepared_mask u8 {0,255}, (x0, y0, bw, bh)); bw == 0 if empty.
    """
    mask = np.asarray(mask)
    if mask.dtype != np.uint8:
        # binarize BEFORE the cast: a uint8 cast would truncate (0.5 -> 0,
        # 256 -> 0) and silently diverge from the `mask != 0` semantics of
        # the NumPy fallback and the oracle
        mask = (mask != 0).astype(np.uint8)
    mask = np.ascontiguousarray(mask)
    h, w = mask.shape
    data, x0, y0, bw, bh = _native.prep_mask(mask.tobytes(), h, w)
    return np.frombuffer(data, np.uint8).reshape(h, w).copy(), (x0, y0, bw, bh)


__all__ = [
    "HAVE_NATIVE",
    "read_yaml_mat",
    "write_yaml_mat",
    "write_bmp",
    "read_bmp",
    "prep_mask",
]
