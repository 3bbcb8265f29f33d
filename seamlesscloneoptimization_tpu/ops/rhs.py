"""Poisson right-hand side: divergence of the guidance field + Dirichlet terms.

TPU-native equivalent of ``pre_process_kernel_lapXY``
(seamlessClone-CUDA/seamlessClone_imp.cpp:1966-2018): backward-difference
divergence on the interior (H-2, W-2) grid, with the destination ROI's
boundary pixels subtracted on interior-adjacent rows/cols (folding the
Dirichlet condition into the RHS). Fuses with guidance.py under XLA into the
reference's "fused pre-processing" — one pass over the ROI.
"""

from __future__ import annotations

import jax.numpy as jnp


def poisson_rhs(gx: jnp.ndarray, gy: jnp.ndarray, dest_roi: jnp.ndarray) -> jnp.ndarray:
    """RHS g on the interior grid.

    gx, gy, dest_roi: (C, H, W) float32. Returns (C, H-2, W-2) float32.
    """
    # Backward-difference divergence, evaluated on the interior only.
    lap = (gx[:, 1:-1, 1:-1] - gx[:, 1:-1, 0:-2]) + (gy[:, 1:-1, 1:-1] - gy[:, 0:-2, 1:-1])
    g = lap
    d = dest_roi
    g = g.at[:, 0, :].add(-d[:, 0, 1:-1])
    g = g.at[:, -1, :].add(-d[:, -1, 1:-1])
    g = g.at[:, :, 0].add(-d[:, 1:-1, 0])
    g = g.at[:, :, -1].add(-d[:, 1:-1, -1])
    return g
