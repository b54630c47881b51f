"""Device mesh + sharding helpers: the TPU-native replacement for the
reference's entire distributed stack (DDP/NCCL/DistributedSampler/barriers,
reference: utils/dist_utils.py:12-75, train_launch.py:29-30,68).

Design (SURVEY.md section 2.10): a 1-D mesh over all chips with the batch
sharded on the 'data' axis. Gradient all-reduce, metric reduction and the
rendezvous barrier all disappear into XLA collectives inserted by pjit --
there is no communication code to maintain.

Multi-host: call ``init_distributed()`` once per process; jax.distributed
wires DCN. Checkpoints/logs gate on ``is_main_process()``.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


import os


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Multi-host init (replaces dist.init_process_group, dist_utils.py:28-33).

    With explicit args, initializes directly. With none, auto-initializes
    (argless ``jax.distributed.initialize`` detects the cluster env) when a
    coordination environment is present; plain single-host runs stay a
    no-op.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)
        return
    coord_env = ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                 "MEGASCALE_COORDINATOR_ADDRESS", "SLURM_JOB_NUM_NODES")
    if any(os.environ.get(k) for k in coord_env):
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError) as e:  # already initialized etc.
            print(f"init_distributed: auto-init skipped ({e})")


def process_count():
    """Number of participating host processes. Module-level indirection so
    tests can monkeypatch the topology and execute the multi-host branches
    on one host (jax's own functions cannot be faked per-call)."""
    return jax.process_count()


def process_index():
    """This host's rank; injectable for tests like process_count()."""
    return jax.process_index()


def is_main_process():
    """Rank-0 gating for checkpoints/logs (reference: dist_utils.py:57-62)."""
    return process_index() == 0


def sync_decision(flag: bool) -> bool:
    """Make a host-local boolean decision (e.g. 'checkpoint now', from
    wall-clock time) agree across hosts by broadcasting process 0's value.
    Any decision feeding an SPMD computation must pass through this, or
    hosts diverge and the job deadlocks (reference has no analog: DDP
    ranks never make independent control decisions; our wall-clock
    checkpoint gate does, trainer.py periodic val)."""
    if process_count() > 1:
        from jax.experimental import multihost_utils

        import jax.numpy as jnp

        return bool(multihost_utils.broadcast_one_to_all(jnp.asarray(flag)))
    return bool(flag)


def make_mesh(axis="data", devices=None):
    """1-D mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh, axis="data"):
    """Sharding that splits the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicate(tree, mesh):
    """Replicate a pytree (params/opt state) across the mesh.

    Device-array leaves are copied first: device_put aliases the input's
    buffer when the source device belongs to the mesh (even under
    may_alias=False on the CPU backend), so a later donation of the
    replicated arrays (the trainer's donate_argnums) would silently delete
    the CALLER's arrays too ("Array has been deleted" on any reuse of the
    originals -- e.g. constructing a second Trainer from the same params).
    The copy makes donation consume only the private intermediate."""
    s = NamedSharding(mesh, P())
    return jax.device_put(
        jax.tree_util.tree_map(
            lambda x: x.copy() if isinstance(x, jax.Array) else x, tree
        ),
        s,
    )


def shard_batch(batch, mesh, axis="data"):
    """Place a host batch with its leading dim sharded across the mesh.

    Replaces DistributedSampler + pin_memory + .cuda(non_blocking) of the
    reference (base_data.py:49-61, trainer.py:88-100). Single-host: one
    device_put with a NamedSharding moves and splits in a single step.
    Multi-host: each process passes its LOCAL shard (from the loader's
    shard_index/shard_count split) and the global array is assembled with
    make_array_from_process_local_data -- device_put with a global
    sharding would wrongly treat each host's local batch as the full
    global batch.
    """
    s = data_sharding(mesh, axis)

    def place(x):
        # idempotent: a leaf already staged with this sharding (e.g. by
        # data.loader.prefetch_to_device) passes through untouched — the
        # multi-host path would otherwise pull the global array back to
        # host and mis-assemble it as a local shard
        if isinstance(x, jax.Array) and x.sharding == s:
            return x
        if process_count() > 1:
            return jax.make_array_from_process_local_data(s, np.asarray(x))
        return jax.device_put(x, s)

    return jax.tree_util.tree_map(place, batch)


def local_batch_slice(global_batch_size, count=None, index=None):
    """Per-process slice of the global batch (multi-host data loading).
    count/index default to the live topology; pass them explicitly to
    compute another rank's slice (or from tests)."""
    count = process_count() if count is None else count
    index = process_index() if index is None else index
    per = global_batch_size // count
    start = index * per
    return slice(start, start + per)
