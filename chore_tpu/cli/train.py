"""Data-parallel training entry point.

Equivalent of the reference train_launch.py (reference:
train_launch.py:21-108) minus all the torch.distributed plumbing: one
process per host, a 1-D mesh over every chip, batch sharded on 'data'.

Usage:
  python -m chore_tpu.cli.train <exp_name> [--epochs N] [--data-root DIR]
"""
from __future__ import annotations

import os
from argparse import ArgumentParser

from chore_tpu.cli.common import build_model
from chore_tpu.config import ChoreConfig, load_config
from chore_tpu.data import BehaveTrainData, DataLoader, DataPaths
from chore_tpu.parallel import init_distributed, make_mesh
from chore_tpu.train import Trainer


def launch_train(cfg: ChoreConfig, exp_root="experiments", epochs=None,
                 ck_period_min=60.0, profile_dir=None, resume="latest",
                 from_torch=None):
    import jax

    init_distributed()
    mesh = make_mesh()
    print(f"training on {mesh.devices.size} devices "
          f"({jax.process_count()} hosts)")

    model, params = build_model(cfg)
    exp_dir = os.path.join(exp_root, cfg.exp_name)
    trainer = Trainer(
        model, params, exp_dir, mesh=mesh,
        base_lr=cfg.learning_rate, milestones=tuple(cfg.milestones),
        ck_period_min=ck_period_min, profile_dir=profile_dir,
    )
    if from_torch is not None:
        # weights + Adam moments + epoch from the reference's .tar; a
        # NATIVE checkpoint in exp_dir still wins below (crash re-resume)
        unused = trainer.import_torch(from_torch)
        print(f"imported reference checkpoint {from_torch} "
              f"(epoch {trainer.epoch}, {len(unused)} unused torch keys)")

    train_paths, val_paths = DataPaths.load_splits(cfg.split_file)
    shard_idx, shard_cnt = jax.process_index(), jax.process_count()
    # global batch = batch_size * n_devices (the reference uses batch 15
    # per GPU, train_launch README:87)
    per_host_batch = cfg.batch_size * mesh.devices.size // shard_cnt

    def make_ds(paths, phase):
        return BehaveTrainData(
            paths, phase=phase, total_samplenum=cfg.num_samples_train,
            image_size=tuple(cfg.net_img_size), ratios=tuple(cfg.ratios),
            sigmas=tuple(cfg.sigmas), random_flip=cfg.random_flip,
            aug_blur=cfg.aug_blur, crop_size=cfg.loadSize, z0=cfg.z_0,
        )

    train_ds = make_ds(train_paths, "train")
    val_ds = make_ds(val_paths[:per_host_batch * 4], "val")

    train_loader = DataLoader(train_ds, per_host_batch, shuffle=True,
                              num_workers=cfg.num_workers,
                              shard_index=shard_idx, shard_count=shard_cnt,
                              worker_type=cfg.worker_type)

    def train_batches(epoch):
        train_loader.set_epoch(epoch)
        for batch in train_loader:
            batch.pop("path", None)
            yield batch

    def val_batches():
        # drop_last=False: a val set smaller than the batch would otherwise
        # yield nothing and silently degrade best-checkpoint selection
        loader = DataLoader(val_ds, per_host_batch, shuffle=False,
                            num_workers=cfg.num_workers, drop_last=False)
        for batch in loader:
            batch.pop("path", None)
            yield batch

    trainer.train_model(train_batches, epochs or cfg.num_epochs, val_batches,
                        resume=resume)
    return trainer


def main():
    parser = ArgumentParser()
    parser.add_argument("exp_name", nargs="?", default="chore-release")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--exp-root", default="experiments")
    parser.add_argument("--ck-period-min", type=float, default=60.0)
    parser.add_argument("--profile-dir", default=None,
                        help="write a jax.profiler device trace of early "
                             "training steps here")
    parser.add_argument("--resume", choices=["latest", "best"],
                        default="latest",
                        help="checkpoint to resume from: latest (no lost "
                             "progress) or best (reference semantics: roll "
                             "back to the val-min checkpoint)")
    parser.add_argument("--from-torch", default=None, metavar="TAR",
                        help="continue training from a reference torch "
                             "checkpoint_*.tar (imports weights, Adam "
                             "moments and epoch)")
    args = parser.parse_args()
    try:
        cfg = load_config(args.exp_name)
    except FileNotFoundError:
        cfg = ChoreConfig(exp_name=args.exp_name)
    launch_train(cfg, args.exp_root, args.epochs, args.ck_period_min,
                 profile_dir=args.profile_dir, resume=args.resume,
                 from_torch=args.from_torch)


if __name__ == "__main__":
    main()
