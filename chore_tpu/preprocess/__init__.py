from chore_tpu.preprocess.boundary_sampler import BoundarySampler, flip_part_labels
from chore_tpu.preprocess.preprocess_scale import (
    process_scale_frame,
    process_scale_seq,
)

__all__ = [
    "BoundarySampler",
    "flip_part_labels",
    "process_scale_frame",
    "process_scale_seq",
]
