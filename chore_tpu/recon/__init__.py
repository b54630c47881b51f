from chore_tpu.recon.fitter import FitConfig, ReconFitter
from chore_tpu.recon.generator import (
    Generator,
    SamplerConfig,
    init_box_samples,
    make_surface_sampler,
)
from chore_tpu.recon.losses import BEHAVE_WEIGHTS, COCO_WEIGHTS
from chore_tpu.recon.optimize import PhaseSpec, freeze_all_except, run_phase
from chore_tpu.recon.silhouette import SilhouetteLossROI

__all__ = [
    "FitConfig",
    "ReconFitter",
    "Generator",
    "SamplerConfig",
    "init_box_samples",
    "make_surface_sampler",
    "BEHAVE_WEIGHTS",
    "COCO_WEIGHTS",
    "PhaseSpec",
    "freeze_all_except",
    "run_phase",
    "SilhouetteLossROI",
]
