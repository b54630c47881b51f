"""Data-parallel trainer for the CHORE field network.

TPU-native replacement of the reference training stack (reference:
trainer/trainer.py + train_launch.py + utils/dist_utils.py):
  * optax Adam at lr 1e-3 with the MultiStep schedule [15, 25] x 0.3
    (trainer.py:35,41, config milestones),
  * one jitted ``train_step`` with the batch sharded over the device mesh --
    DDP's gradient all-reduce becomes the XLA collective pjit inserts,
  * periodic wall-clock validation + checkpointing with best-val pointer
    semantics (trainer.py:149-162,294-322), main-process-only,
  * scalar metrics to JSONL (+ TensorBoard if torch is importable),
    replacing rank-0 SummaryWriter (trainer.py:64-72).
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from chore_tpu.models import CHOREField, chore_losses
from chore_tpu.parallel import (
    data_sharding,
    is_main_process,
    make_mesh,
    replicate,
    shard_batch,
    sync_decision,
)
from chore_tpu.train import checkpoints as ckpt


def multistep_lr(base_lr, milestones=(15, 25), gamma=0.3):
    """Per-epoch LR (MultiStepLR semantics, reference: trainer.py:41)."""

    def lr_for_epoch(epoch):
        factor = 1.0
        for m in milestones:
            if epoch >= m:
                factor *= gamma
        return base_lr * factor

    return lr_for_epoch


class MetricsLogger:
    """JSONL scalar log; mirrors the reference's TB scalars
    (trainer.py:156-177) and also writes TB events if torch is available."""

    def __init__(self, exp_dir, enabled=True):
        self.enabled = enabled
        self.path = os.path.join(exp_dir, "metrics.jsonl")
        self.tb = None
        if enabled:
            os.makedirs(exp_dir, exist_ok=True)
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(os.path.join(exp_dir, "tb"))
            except Exception:
                self.tb = None

    def log(self, step, **scalars):
        if not self.enabled:
            return
        with open(self.path, "a") as f:
            f.write(json.dumps({"step": step, **{k: float(v) for k, v in scalars.items()}}) + "\n")
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, float(v), step)


class Trainer:
    """Epoch loop driving the jitted sharded train step.

    Args:
      model: CHOREField.
      exp_dir: experiment directory (checkpoints/, val_min pointer, metrics).
      mesh: device mesh (defaults to 1-D over all devices).
      ck_period_min: wall-clock minutes between val+checkpoint
        (reference ck_period=60, trainer.py:149).
    """

    def __init__(self, model: CHOREField, params, exp_dir, mesh=None,
                 base_lr=1e-3, milestones=(15, 25), gamma=0.3,
                 optimizer="adam", ck_period_min=60.0,
                 profile_dir=None, profile_steps=20):
        self.model = model
        self.exp_dir = exp_dir
        self.mesh = mesh if mesh is not None else make_mesh()
        self.lr_fn = multistep_lr(base_lr, milestones, gamma)
        self.ck_period = ck_period_min * 60.0
        if optimizer == "adam":
            opt = optax.adam
        elif optimizer == "adadelta":
            opt = optax.adadelta
        elif optimizer == "rmsprop":
            opt = optax.rmsprop
        else:
            raise ValueError(optimizer)
        self.optimizer_name = optimizer
        self.tx = optax.inject_hyperparams(opt)(learning_rate=base_lr)
        self.params = replicate(params, self.mesh)
        self.opt_state = replicate(self.tx.init(params), self.mesh)
        self.epoch = 0
        self.training_time = 0.0
        self.global_step = 0
        self.logger = MetricsLogger(exp_dir, enabled=is_main_process())
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps

        batch_shard = data_sharding(self.mesh)
        rep = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec())

        def loss_fn(params, batch):
            preds = self.model.apply(
                params, batch["images"], batch["points"], batch["crop_center"]
            )
            return chore_losses(preds, batch, self.model.cfg)

        def train_step(params, opt_state, batch):
            (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, parts

        self._train_step = jax.jit(
            train_step,
            in_shardings=(rep, rep, batch_shard),
            out_shardings=(rep, rep, rep, rep),
            donate_argnums=(0, 1),
        )
        self._eval_step = jax.jit(loss_fn, in_shardings=(rep, batch_shard))

    def set_epoch_lr(self, epoch):
        lr = self.lr_fn(epoch)
        # inject_hyperparams exposes learning_rate inside the opt state
        self.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
        return lr

    def train_step(self, batch):
        batch = shard_batch(batch, self.mesh)
        self.params, self.opt_state, loss, parts = self._train_step(
            self.params, self.opt_state, batch
        )
        self.global_step += 1
        return loss, parts

    def compute_val_loss(self, val_batches):
        """Runs on EVERY process: _eval_step is a global-mesh SPMD program,
        so gating it on the main process would deadlock multi-host jobs.
        Only the logging/pointer update downstream is main-only.

        Batches whose size is not divisible by the device count (e.g. the
        trailing partial batch of a small val split, drop_last=False) are
        WRAP-padded to shardability (cyclic repetition spreads the
        duplicates evenly — exact when n_real divides the padded size);
        the final average weights each batch by its REAL sample count."""
        n_dev = int(self.mesh.devices.size)
        losses, weights = [], []
        for batch in val_batches:
            n_real = next(iter(batch.values())).shape[0]
            pad = (-n_real) % n_dev
            if pad:
                batch = {
                    k: np.concatenate(
                        [v, np.asarray(v)[np.arange(pad) % n_real]], axis=0)
                    for k, v in batch.items()
                }
            batch = shard_batch(batch, self.mesh)
            loss, _ = self._eval_step(self.params, batch)
            losses.append(float(loss))
            weights.append(n_real)
        if not losses:
            return float("inf")
        return float(np.average(losses, weights=weights))

    def save(self):
        if not is_main_process():
            return None
        state = {"params": self.params, "opt_state": self.opt_state}
        name = ckpt.save_checkpoint(
            os.path.join(self.exp_dir, "checkpoints"),
            jax.device_get(state),
            self.training_time,
            self.epoch,
            global_step=self.global_step,
        )
        return name

    def load(self, resume="latest"):
        """Resume from a checkpoint; like the reference, the LR is
        re-derived from the schedule, not restored (trainer.py:247-265).

        resume='latest' (default): newest checkpoint by training time —
        a crash/preemption resume loses no progress. resume='best':
        reference semantics (trainer.py:219-230, find_best_checkpoint) —
        roll back to the val_min pointer when one exists, else latest;
        long real-data runs that want reference-exact rollback-on-resume
        behavior should pass this."""
        if resume not in ("latest", "best"):
            raise ValueError(f"resume must be 'latest' or 'best': {resume!r}")
        prefer = "val_min" if resume == "best" else "latest"
        path = ckpt.find_checkpoint(self.exp_dir, prefer=prefer)
        if path is None:
            return False
        template = jax.device_get(
            {"params": self.params, "opt_state": self.opt_state}
        )
        (state, self.epoch, self.training_time,
         self.global_step) = ckpt.load_checkpoint(path, template)
        self.params = replicate(state["params"], self.mesh)
        self.opt_state = replicate(state["opt_state"], self.mesh)
        return True

    def import_torch(self, path):
        """Resume training FROM a reference torch checkpoint: model weights
        AND the Adam moments (reference checkpoint layout:
        trainer/trainer.py:186-206), so continued training follows the
        reference's trajectory instead of re-warming-up the optimizer from
        zero moments. Restores epoch and cumulative training time; the LR
        is re-derived from the schedule, exactly as the reference's own
        resume does (reference: trainer/trainer.py:247-265).

        Returns the torch keys that were not consumed (non-parameter
        buffers etc.)."""
        import torch

        from chore_tpu.train import torch_import as ti

        data = torch.load(path, map_location="cpu")
        template = jax.device_get(self.params)
        params, unused = ti.convert_state_dict(
            data["model_state_dict"], template)
        opt_state = self.tx.init(params)
        count = 0
        if "optimizer_state_dict" in data:
            if self.optimizer_name != "adam":
                raise ValueError(
                    "optimizer-state import is only defined for Adam "
                    f"(trainer built with {self.optimizer_name!r})")
            mu, nu, count, missing = ti.convert_optimizer_state(
                data, template)
            if missing and is_main_process():
                print(f"torch Adam state missing for {len(missing)} params "
                      f"(never stepped); zero-initialized: {missing[:3]}…")
            # inject_hyperparams wraps the adam chain: splice the moments
            # into its ScaleByAdamState (first element of the chain state)
            inner = opt_state.inner_state
            adam_s = inner[0]._replace(
                count=jnp.asarray(count, jnp.int32), mu=mu, nu=nu)
            opt_state = opt_state._replace(
                inner_state=(adam_s,) + tuple(inner[1:]))
        self.params = replicate(params, self.mesh)
        self.opt_state = replicate(opt_state, self.mesh)
        self.epoch = int(data.get("epoch", 0))
        self.training_time = float(data.get("training_time", 0.0))
        # the torch Adam step count IS the number of optimizer steps taken;
        # continuing the metrics/profiler/checkpoint timeline from it keeps
        # global_step consistent with the imported optimizer state
        self.global_step = int(count)
        return unused

    def train_model(self, train_batches_fn, num_epochs, val_batches_fn=None,
                    resume="latest"):
        """train_batches_fn(epoch) -> iterable of host batches.
        resume: checkpoint selection on restart, see ``load``."""
        from chore_tpu.utils.profiling import trace

        from chore_tpu.data.loader import prefetch_to_device

        self.load(resume=resume)
        last_ck = time.time()
        self._seg_start = time.time()
        profiling = False
        while self.epoch < num_epochs:
            lr = self.set_epoch_lr(self.epoch)
            epoch_losses = []
            # stage sharded batches ahead of the step so host->HBM copies
            # overlap device compute (train_step's shard_batch is then a
            # no-op on the already-committed arrays)
            batches = prefetch_to_device(
                iter(train_batches_fn(self.epoch)),
                transfer=lambda b: shard_batch(b, self.mesh))
            for batch in batches:
                # device trace of steps 2..2+profile_steps (skip compiles)
                if (self.profile_dir and not profiling
                        and self.global_step == 2 and is_main_process()):
                    self._trace = trace(self.profile_dir)
                    self._trace.__enter__()
                    profiling = True
                loss, parts = self.train_step(batch)
                if (profiling
                        and self.global_step >= 2 + self.profile_steps):
                    jax.block_until_ready(loss)
                    self._trace.__exit__(None, None, None)
                    profiling = False
                    self.profile_dir = None
                # keep the device array: float() here would sync the host
                # every step and serialize loading against compute
                epoch_losses.append(loss)
                if self.global_step % 50 == 0:
                    self.logger.log(self.global_step, loss=float(loss), lr=lr,
                                    **{k: float(v) for k, v in parts.items()})
                    # periodic val/checkpoint; the decision must agree on
                    # every host (SPMD eval), so sync it off process 0
                    due = sync_decision(
                        time.time() - last_ck > self.ck_period)
                    if due:
                        self._validate_and_save(val_batches_fn)
                        last_ck = time.time()
            self.epoch += 1
            # ONE batched readback for the whole epoch: float() per scalar
            # would pay a host round trip per training step here
            self.logger.log(
                self.global_step, epoch=self.epoch,
                epoch_loss=(float(np.mean(jax.device_get(epoch_losses)))
                            if epoch_losses else 0.0))
        self._validate_and_save(val_batches_fn)

    def _validate_and_save(self, val_batches_fn):
        now = time.time()
        self.training_time += now - self._seg_start
        self._seg_start = now
        name = self.save()
        if val_batches_fn is not None:
            # all processes participate in the SPMD eval; rank-0 logs
            val_loss = self.compute_val_loss(val_batches_fn())
            if is_main_process() and name is not None:
                self.logger.log(self.global_step, val_loss=val_loss)
                ckpt.update_val_min(self.exp_dir, self.epoch, val_loss, name)
