from chore_tpu.models.chore import CHOREField, FieldConfig, chore_losses
from chore_tpu.models.hourglass import HGFilter, HourGlass
from chore_tpu.models.layers import (
    ConvBlock,
    bicubic_upsample_2x,
    bicubic_upsample_matrix,
)

__all__ = [
    "CHOREField",
    "FieldConfig",
    "chore_losses",
    "HGFilter",
    "HourGlass",
    "ConvBlock",
    "bicubic_upsample_2x",
    "bicubic_upsample_matrix",
]
