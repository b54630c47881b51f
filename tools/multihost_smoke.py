"""Two-process distributed smoke test on one machine (CPU backend).

Launches TWO actual jax processes (coordinator + worker) with 4 virtual
CPU devices each and runs a sharded training step over the global
8-device mesh -- executing the REAL multi-host code paths
(jax.distributed.initialize, make_array_from_process_local_data assembly
of per-host shards, pjit's cross-host gradient reduction, the
broadcast-synced checkpoint gate, rank-0 gating) that single-process
tests can only exercise with a mocked topology
(tests/test_multihost.py). The reference cannot do this at all: its NCCL
backend needs GPUs (SURVEY §4 "multi-node/multi-GPU is untested").

Usage:
  python tools/multihost_smoke.py            # spawns both ranks, checks
  python tools/multihost_smoke.py --rank N   # internal: one rank
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = int(os.environ.get("CHORE_SMOKE_PORT", "12357"))
NPROC, LOCAL_DEVICES = 2, 4


def run_rank(rank):
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from chore_tpu.models import CHOREField, FieldConfig, chore_losses
    from chore_tpu.parallel import (
        init_distributed, is_main_process, local_batch_slice, make_mesh,
        process_count, replicate, shard_batch, sync_decision,
    )

    init_distributed(f"localhost:{PORT}", NPROC, rank)
    assert process_count() == NPROC, process_count()
    mesh = make_mesh()  # global 8-device mesh across both processes
    assert mesh.devices.size == NPROC * LOCAL_DEVICES

    cfg = FieldConfig(num_stack=1, num_hourglass=1, net_img_size=32)
    model = CHOREField(cfg=cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 5)),
                        jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)

    B, N = NPROC * LOCAL_DEVICES, 64
    rng = np.random.RandomState(0)  # SAME global batch on every host
    global_batch = {
        "images": rng.rand(B, 32, 32, 5).astype(np.float32),
        "points": (rng.rand(B, N, 3) * [2, 2, 0.5]
                   + [-1, -1, 1.95]).astype(np.float32),
        "crop_center": np.tile([[1018.0, 779.0]], (B, 1)).astype(np.float32),
        "df_h": np.abs(rng.randn(B, N)).astype(np.float32) * 0.05,
        "df_o": np.abs(rng.randn(B, N)).astype(np.float32) * 0.05,
        "parts": rng.randint(0, 14, (B, N)).astype(np.int32),
        "pca": np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1)),
        "body_center": np.tile([[0.0, 0, 2.2]], (B, 1)).astype(np.float32),
        "obj_center": np.tile([[0.3, 0, 0.0]], (B, 1)).astype(np.float32),
    }
    # each host slices ITS shard; shard_batch reassembles the global array
    sl = local_batch_slice(B)
    local = {k: v[sl] for k, v in global_batch.items()}
    batch = shard_batch(local, mesh)

    rep = NamedSharding(mesh, P())

    def loss_fn(p, b):
        return chore_losses(
            model.apply(p, b["images"], b["points"], b["crop_center"]),
            b, cfg)

    def step(p, o, b):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p, b)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    step_j = jax.jit(step, in_shardings=(rep, rep,
                                         NamedSharding(mesh, P("data"))),
                     out_shardings=(rep, rep, rep))
    params, opt_state, loss = step_j(params, opt_state, batch)
    loss = float(loss)

    # the checkpoint-gate sync path with a real 2-process broadcast:
    # only rank 0 decides "due"; every host must receive True
    due = sync_decision(rank == 0)
    assert due is True, "rank 0's decision must reach every host"

    print(f"RANK {rank} main={is_main_process()} loss={loss:.6f} OK",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=None)
    args = ap.parse_args()
    if args.rank is not None:
        run_rank(args.rank)
        return

    import tempfile
    import time as _time

    # ranks write to FILES, not pipes: two interdependent SPMD ranks with
    # full stdout pipes would deadlock mid-collective
    logs = [tempfile.NamedTemporaryFile("w+", suffix=f".rank{r}.log",
                                        delete=False) for r in range(NPROC)]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--rank", str(r)],
            stdout=logs[r], stderr=subprocess.STDOUT, text=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        for r in range(NPROC)
    ]
    deadline = _time.time() + float(os.environ.get("CHORE_SMOKE_TIMEOUT",
                                                   "480"))
    try:
        for p in procs:
            p.wait(timeout=max(1.0, deadline - _time.time()))
    except subprocess.TimeoutExpired:
        raise SystemExit("multihost smoke timed out")
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()  # no orphaned ranks holding the rendezvous port
    outs = []
    for lg in logs:
        lg.flush(); lg.seek(0)
        outs.append(lg.read())
        lg.close()
        os.unlink(lg.name)
    losses = []
    for r, (p, out) in enumerate(zip(procs, outs)):
        ok = p.returncode == 0 and f"RANK {r}" in out and "OK" in out
        if not ok:
            print(out)
            raise SystemExit(f"rank {r} failed (rc={p.returncode})")
        losses.append(out.split("loss=")[1].split()[0])
    assert losses[0] == losses[1], f"ranks disagree: {losses}"
    print(f"multihost smoke OK: {NPROC} processes x {LOCAL_DEVICES} devices, "
          f"loss={losses[0]} identical on every rank")


if __name__ == "__main__":
    main()
