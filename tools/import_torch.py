"""Convert a reference (torch) CHORE checkpoint into a chore_tpu experiment.

One step of the parity runbook (README "Chamfer parity runbook"): takes the
reference's released ``checkpoint_*h:*m:*s_*.tar`` (reference format:
trainer/trainer.py:186-206, a dict with ``model_state_dict``), maps every
tensor onto the flax tree (train/torch_import.py), and writes a native
checkpoint into ``experiments/<exp>/checkpoints/`` where the recon/demo
CLIs find it via their normal loading path.

Usage:
  python tools/import_torch.py /path/to/checkpoint_...tar [--exp chore-release]
      [--exp-root experiments]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def import_checkpoint(tar_path, exp_name="chore-release",
                      exp_root="experiments", cfg=None):
    """cfg: explicit ChoreConfig; defaults to configs/{exp_name}.json or
    the release architecture (the .tar's tensor shapes must match it)."""
    import jax

    from chore_tpu.cli.common import build_model
    from chore_tpu.config import ChoreConfig, load_config
    from chore_tpu.train.checkpoints import save_checkpoint
    from chore_tpu.train.torch_import import load_torch_checkpoint

    if cfg is None:
        try:
            cfg = load_config(exp_name)
        except FileNotFoundError:
            cfg = ChoreConfig(exp_name=exp_name)
    model, template = build_model(cfg)
    params, unused = load_torch_checkpoint(tar_path, template)
    if unused:
        print(f"ignored {len(unused)} non-parameter torch keys "
              f"(e.g. {unused[:3]})")
    # preserve the reference's wall-time file naming when parseable so the
    # provenance stays visible; epoch is unknown -> 0
    base = os.path.basename(tar_path)
    try:
        training_time = float(os.path.splitext(base)[0].split("_")[-1])
    except ValueError:
        training_time = 0.0
    ckpt_dir = os.path.join(exp_root, exp_name, "checkpoints")
    name = save_checkpoint(ckpt_dir, {"params": jax.device_get(params)},
                           training_time, epoch=0)
    out = os.path.join(ckpt_dir, name)
    print(f"imported {tar_path} -> {out}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tar_path")
    ap.add_argument("--exp", default="chore-release")
    ap.add_argument("--exp-root", default="experiments")
    args = ap.parse_args()
    import_checkpoint(args.tar_path, args.exp, args.exp_root)


if __name__ == "__main__":
    main()
