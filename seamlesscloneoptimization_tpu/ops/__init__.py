from seamlesscloneoptimization_tpu.ops.layout import interleaved_to_planar, planar_to_interleaved
from seamlesscloneoptimization_tpu.ops.mask import binarize_mask, erode3x3
from seamlesscloneoptimization_tpu.ops.guidance import guidance_field, gradient_x, gradient_y
from seamlesscloneoptimization_tpu.ops.rhs import poisson_rhs
from seamlesscloneoptimization_tpu.ops.postprocess import postprocess_roi

__all__ = [
    "interleaved_to_planar",
    "planar_to_interleaved",
    "binarize_mask",
    "erode3x3",
    "guidance_field",
    "gradient_x",
    "gradient_y",
    "poisson_rhs",
    "postprocess_roi",
]
