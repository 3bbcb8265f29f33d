from seamlesscloneoptimization_tpu.parallel.mesh import init_distributed, make_tile_mesh
from seamlesscloneoptimization_tpu.parallel.tiled import (
    halo_exchange,
    solve_multigrid_dd,
    solve_multigrid_sharded,
    solve_poisson_dd,
    solve_redblack_tiled,
)
from seamlesscloneoptimization_tpu.parallel.batch import (
    clone_roi_batch,
    seamless_clone_batch_fused,
)
from seamlesscloneoptimization_tpu.parallel.clone_tiled import (
    TiledSeamlessClone,
    local_edit_tiled,
    seamless_clone_tiled,
)

__all__ = [
    "init_distributed",
    "make_tile_mesh",
    "halo_exchange",
    "solve_redblack_tiled",
    "solve_multigrid_dd",
    "solve_multigrid_sharded",
    "solve_poisson_dd",
    "clone_roi_batch",
    "seamless_clone_batch_fused",
    "seamless_clone_tiled",
    "TiledSeamlessClone",
    "local_edit_tiled",
]
