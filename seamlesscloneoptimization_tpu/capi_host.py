"""Host-side helpers for the C ABI (libseamlessclone_tpu.so).

The TPU-native equivalent of the reference's extern-C surface
(seamlessClone-CUDA/seamlessclone_cuda.h:6-62, compiled into
seamlessclone_cuda.so): ``native/src/capi.cpp`` embeds CPython and calls the
functions here with raw memoryviews over the caller's buffers. This module
does the numpy wrapping and engine dispatch; it keeps zero per-call
allocations beyond what XLA needs (the engine's executable cache plays the
role of the reference's SCImage capacity pool).

Semantics mirror the reference binding (SeamlessClone.cpp:108-118): the
result is copied into the caller's output buffer before return (the
reference's D2H inside seamlessCloneGPU synchronizes the stream the same
way); ``sync`` is the explicit barrier for anything still in flight.
"""

from __future__ import annotations

import json

import numpy as np


def create_instance(device_id: int, config_json: str):
    """Create an engine. device_id indexes jax.devices(); -1 = default.

    config_json: JSON object of CloneConfig fields, e.g.
    '{"solver": "dst_gemm", "flags": 1}'. Also honors {"platform": "cpu"}
    to force a backend before device selection.
    """
    cfg = json.loads(config_json) if config_json else {}
    platform = cfg.pop("platform", None)
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)

    from seamlesscloneoptimization_tpu.core.config import CloneConfig
    from seamlesscloneoptimization_tpu.core.engine import SeamlessClone

    device = jax.devices()[device_id] if device_id >= 0 else None
    return SeamlessClone(CloneConfig(**cfg), device=device)


def run(engine, face_mv, fh, fw, body_mv, bh, bw, mask_mv, mh, mw, cx, cy, out_mv, sync):
    """One clone: face (src patch) into body (dst) at (cx, cy).

    Buffers are interleaved BGR uint8 (mask single-channel); ``out_mv`` must
    hold bh*bw*3 bytes and receives the blended destination.
    """
    face = np.frombuffer(face_mv, np.uint8).reshape(fh, fw, 3)
    body = np.frombuffer(body_mv, np.uint8).reshape(bh, bw, 3)
    mask = np.frombuffer(mask_mv, np.uint8).reshape(mh, mw) if mask_mv is not None else None
    out = engine.run(face, body, mask, (cx, cy))
    result = np.asarray(out)  # device -> host (synchronizes, like the ref D2H)
    np.frombuffer(out_mv, np.uint8).reshape(bh, bw, 3)[...] = result
    if sync:
        engine.sync()
    return 0


def sync(engine):
    engine.sync()
    return 0


def destroy(engine):
    engine.destroy()
    return 0
