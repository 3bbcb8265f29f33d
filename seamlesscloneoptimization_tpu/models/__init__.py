from seamlesscloneoptimization_tpu.models.pipeline import clone_pipeline, clone_roi

__all__ = ["clone_pipeline", "clone_roi"]
