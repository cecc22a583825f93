from sherf_tpu.core.config import (
    ModelConfig,
    RenderConfig,
    TrainConfig,
    DataConfig,
    EvalConfig,
)
from sherf_tpu.core.types import SMPLPose, Rays, Camera

__all__ = [
    "ModelConfig",
    "RenderConfig",
    "TrainConfig",
    "DataConfig",
    "EvalConfig",
    "SMPLPose",
    "Rays",
    "Camera",
]
