from octic_vits_tpu.models.dinov2_vit import (
    DinoVisionTransformer,
    OcticDinoVisionTransformer,
)
from octic_vits_tpu.models.octic_vit import OcticVisionTransformer
from octic_vits_tpu.models.registry import create_model, list_models, register_model
from octic_vits_tpu.models.vit import VisionTransformer

__all__ = [
    "DinoVisionTransformer",
    "OcticDinoVisionTransformer",
    "OcticVisionTransformer",
    "VisionTransformer",
    "create_model",
    "list_models",
    "register_model",
]
