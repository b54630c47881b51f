"""Experiment configuration.

The reference uses a three-tier system (reference: model/options.py:9-229,
config/config_loader.py:11-40, PATHS.yml): a ~90-flag argparse schema
snapshotted to config/{exp_name}.json and re-loaded by every entry point,
with per-entry-point CLI overrides. Here the schema is one dataclass with
the same field names where they matter; json round-trip preserved so
existing experiment configs (e.g. chore-release.json) load directly.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Sequence

from chore_tpu.models.chore import FieldConfig
from chore_tpu.recon.fitter import FitConfig
from chore_tpu.recon.generator import SamplerConfig


@dataclasses.dataclass
class ChoreConfig:
    """Union of the reference's experiment options that drive behavior
    (release values from config/chore-release.json)."""

    exp_name: str = "chore-release"
    # data
    test_kid: int = 1
    image_size: Sequence[int] = (2048, 1536)
    net_img_size: Sequence[int] = (512, 512)
    batch_size: int = 15
    num_workers: int = 8
    worker_type: str = "thread"  # or "process" (GIL-heavy __getitem__)
    split_file: str = "splits/behave-split.pkl"
    num_samples_train: int = 20000
    sigmas: Sequence[float] = (0.08, 0.02, 0.003)
    ratios: Sequence[float] = (0.01, 0.49, 0.5)
    loadSize: int = 1200
    z_0: float = 2.2
    input_type: str = "RGBM3"
    random_flip: bool = False
    aug_blur: float = 0.0
    # model
    precision: str = "mixed"  # "mixed": bf16 encoder/f32 heads; "float32"
    num_stack: int = 5
    num_hourglass: int = 2
    hourglass_dim: int = 256
    norm: str = "group"
    skip_hourglass: bool = True
    remat: bool = False  # hourglass rematerialization (bigger train batches)
    hg_down: str = "ave_pool"
    z_feat: str = "xyz"
    projection_mode: str = "perspective"
    # training
    learning_rate: float = 1e-3
    num_epochs: int = 80
    milestones: Sequence[int] = (15, 25)
    clamp_thres: float = 0.1
    # recon
    filter_val: float = 0.004
    sparse_thres: float = 0.03
    seq_folder: Optional[str] = None

    def encoder_dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if self.precision == "mixed" else jnp.float32

    def field_config(self) -> FieldConfig:
        return FieldConfig(
            num_stack=self.num_stack,
            num_hourglass=self.num_hourglass,
            hourglass_dim=self.hourglass_dim,
            crop_size=self.loadSize,
            net_img_size=self.net_img_size[0],
            z0=self.z_0,
            clamp_thres=self.clamp_thres,
            remat=self.remat,
        )

    def sampler_config(self, num_points=5000) -> SamplerConfig:
        return SamplerConfig(
            filter_val=self.filter_val, num_points=num_points
        )

    def fit_config(self) -> FitConfig:
        return FitConfig(
            net_in_size=self.net_img_size[0],
            z0=self.z_0,
            crop_size=self.loadSize,
        )


def save_config(cfg: ChoreConfig, config_dir="configs"):
    """Snapshot to configs/{exp_name}.json
    (reference: config_loader.py:11-21)."""
    os.makedirs(config_dir, exist_ok=True)
    path = os.path.join(config_dir, f"{cfg.exp_name}.json")
    with open(path, "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)
    return path


def load_config(exp_name, config_dir="configs") -> ChoreConfig:
    """Load configs/{exp_name}.json, ignoring unknown keys so reference
    config files load unchanged (reference: config_loader.py:24-32)."""
    path = os.path.join(config_dir, f"{exp_name}.json")
    with open(path) as f:
        data = json.load(f)
    fields = {f.name for f in dataclasses.fields(ChoreConfig)}
    kept = {k: v for k, v in data.items() if k in fields}
    kept["exp_name"] = exp_name
    return ChoreConfig(**kept)
