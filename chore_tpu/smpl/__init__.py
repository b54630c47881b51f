from chore_tpu.smpl import const
from chore_tpu.smpl.assets import (
    load_landmark_regressors,
    load_part_labels,
    load_priors,
)
from chore_tpu.smpl.lbs import SMPLModel, lbs, model_from_arrays
from chore_tpu.smpl.loader import (
    load_model_arrays,
    load_smpl_pickle,
    synthetic_smplh,
)
from chore_tpu.smpl.model import SMPLH, init_params, pack_betas, pack_pose, split_params
from chore_tpu.smpl.priors import (
    make_body_prior,
    make_hand_prior,
    mean_hand_pose,
)

__all__ = [
    "const",
    "load_landmark_regressors",
    "load_part_labels",
    "load_priors",
    "SMPLModel",
    "lbs",
    "model_from_arrays",
    "load_model_arrays",
    "load_smpl_pickle",
    "synthetic_smplh",
    "SMPLH",
    "init_params",
    "pack_betas",
    "pack_pose",
    "split_params",
    "make_body_prior",
    "make_hand_prior",
    "mean_hand_pose",
]
