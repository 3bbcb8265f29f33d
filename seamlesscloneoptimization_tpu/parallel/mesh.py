"""Device mesh construction for 2-D tile-based domain decomposition.

The spatial analogue of context parallelism for stencil solves (SURVEY §2.18,
§5.7): the solve region is partitioned into a (ty, tx) grid of tiles, one per
device; smoothing sweeps exchange 1-px halos with mesh neighbors over ICI.
The reference is single-GPU (one cudaStream_t, seamlessClone_imp.cu:253) —
this subsystem is the new capability the TPU build introduces.
"""

from __future__ import annotations

import math

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize multi-host JAX for pod-slice meshes (SURVEY §5.8).

    Thin wrapper over ``jax.distributed.initialize`` (env-var driven when
    arguments are None — the standard TPU pod bootstrap); afterwards
    ``make_tile_mesh()`` spans every chip in the slice and the shard_map /
    GSPMD programs in this package run unchanged, with XLA routing halo
    ppermutes over ICI within a slice and DCN across slices. No-op if the
    runtime is already initialized. Single-process (one host) setups never
    need to call this.
    """
    import jax

    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except RuntimeError:
        pass  # already initialized


def make_tile_mesh(devices=None, shape: tuple[int, int] | None = None) -> Mesh:
    """Create a ('ty', 'tx') mesh over the given (or all) devices.

    If shape is None, picks the most-square factorization of the device count
    so halo perimeter (communication volume) is minimized.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        ty = int(math.sqrt(n))
        while n % ty:
            ty -= 1
        shape = (ty, n // ty)
    ty, tx = shape
    if ty * tx != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    import numpy as np

    return Mesh(np.array(devices).reshape(ty, tx), ("ty", "tx"))


def tile_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (C, H, W) arrays: spatial tiling, channels replicated."""
    return NamedSharding(mesh, P(None, "ty", "tx"))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (H, W, C) interleaved images."""
    return NamedSharding(mesh, P("ty", "tx", None))
