"""Checkpointing with best-validation pointer semantics.

Reproduces the reference's checkpoint contract (reference:
trainer/trainer.py:186-232,294-322):
  * files named ``checkpoint_{h}h:{m}m:{s}s_{secs}.ckpt`` keyed by cumulative
    training wall time,
  * a ``val_min={epoch}.npz`` marker holding [epoch, val_loss, ck_file],
  * loading prefers the val_min checkpoint, else latest-by-time,
  * "best" accepts val_loss <= val_min + 1.0 (trainer.py:304).

Serialization is flax msgpack of {params, opt_state, epoch, training_time}.
Writes are main-process-only (the caller gates).
"""
from __future__ import annotations

import glob
import os

import numpy as np
from flax import serialization


def _convert_secs(sec):
    return int(sec // 3600), int((sec // 60) % 60), int(sec % 60)


def checkpoint_name(training_time):
    h, m, s = _convert_secs(training_time)
    return f"checkpoint_{h}h:{m}m:{s}s_{training_time}.ckpt"


def save_checkpoint(ckpt_dir, state, training_time, epoch, global_step=0):
    """state: dict pytree {params, opt_state}; returns the file name."""
    os.makedirs(ckpt_dir, exist_ok=True)
    name = checkpoint_name(training_time)
    path = os.path.join(ckpt_dir, name)
    if os.path.isfile(path):
        return name
    payload = {
        "state": state,
        "epoch": np.asarray(epoch),
        "training_time": np.asarray(training_time),
        "global_step": np.asarray(global_step),
    }
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))
    return name


def _latest_checkpoint(ckpt_dir):
    files = glob.glob(os.path.join(ckpt_dir, "checkpoint_*.ckpt"))
    if not files:
        return None
    times = [float(os.path.splitext(os.path.basename(p))[0].split("_")[-1])
             for p in files]
    return files[int(np.argmax(times))]


def find_checkpoint(exp_dir, prefer="val_min"):
    """prefer='val_min': best-val pointer first, else latest (the
    reference's inference loading, generator.py:230-241). prefer='latest':
    newest checkpoint (training resume -- following the val_min pointer
    there would silently roll training back to the best-val epoch)."""
    ckpt_dir = os.path.join(exp_dir, "checkpoints")
    if prefer == "val_min":
        pointer = glob.glob(os.path.join(exp_dir, "val_min=*"))
        if pointer:
            log = np.load(pointer[0], allow_pickle=True)
            arr = log["data"] if hasattr(log, "files") else log
            path = os.path.join(ckpt_dir, str(arr[2]))
            if os.path.isfile(path):
                return path
    return _latest_checkpoint(ckpt_dir)


def load_checkpoint(path, state_template):
    """Restore (state, epoch, training_time, global_step). A checkpoint
    written before global_step entered the payload restores with
    global_step=0 (the old behavior) rather than failing."""
    with open(path, "rb") as f:
        raw = f.read()
    template = {
        "state": state_template,
        "epoch": np.asarray(0),
        "training_time": np.asarray(0.0),
        "global_step": np.asarray(0),
    }
    # inspect the payload to decide the template shape up front: a blind
    # retry-without-global_step would mask genuine template/shape
    # mismatches behind a misleading missing-key error
    restored = serialization.msgpack_restore(raw)
    if not (isinstance(restored, dict) and "global_step" in restored):
        template.pop("global_step")
    payload = serialization.from_state_dict(template, restored)
    payload.setdefault("global_step", np.asarray(0))
    return (payload["state"], int(payload["epoch"]),
            float(payload["training_time"]), int(payload["global_step"]))


def update_val_min(exp_dir, epoch, val_loss, ck_file):
    """Maintain the best-val pointer (reference: trainer.py:294-322):
    accept a NEWER checkpoint while val_loss <= best + 1.0 (prefer-recent
    tolerance), but keep comparing against the true running minimum --
    storing each accepted value verbatim (the reference behavior) lets the
    pointer ratchet arbitrarily upward in +1.0 steps."""
    best = val_loss
    pointer = glob.glob(os.path.join(exp_dir, "val_min=*"))
    if pointer:
        log = np.load(pointer[0], allow_pickle=True)
        arr = log["data"] if hasattr(log, "files") else log
        stored = float(arr[1])
        if stored + 1.0 < val_loss:
            return False
        best = min(val_loss, stored)
        for p in pointer:
            os.remove(p)
    path = os.path.join(exp_dir, f"val_min={epoch}.npz")
    np.savez(path, data=np.array([epoch, best, ck_file], dtype=object))
    return True
