"""8-device scaling curve for the sharded train step (virtual CPU mesh).

Measures the jitted data-parallel train step at mesh widths 1/2/4/8 with a
FIXED global batch, each width in its own subprocess with a forced
host-platform device count (the count is fixed at backend init, so widths
cannot share a process). CPU-mesh numbers are NOT chip numbers — the point
is the TREND: per-step time should fall as devices grow; a flat or
inverted curve exposes a sharding bug (e.g. every device computing the
full batch) that a single dryrun step cannot.

Usage: python tools/scaling_curve.py [--batch 8] [--steps 3]
Prints one JSON line per width plus a summary line.
Companion test: tests/test_train.py::TestShardingScaling pins the
per-device batch math at every width.
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, time
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P
from chore_tpu.models import CHOREField, FieldConfig, chore_losses
from chore_tpu.parallel import make_mesh, replicate, shard_batch

n = {n}
B, S, N = {batch}, 128, 2048
assert len(jax.devices()) == n, (n, jax.devices())
mesh = make_mesh()
cfg = FieldConfig(num_stack=2, num_hourglass=2, net_img_size=S)
model = CHOREField(cfg=cfg)
rng = np.random.RandomState(0)
batch = {{
    "images": rng.rand(B, S, S, 5).astype(np.float32),
    "points": (rng.rand(B, N, 3) * [2, 2, 0.5] + [-1, -1, 1.95]).astype(
        np.float32),
    "crop_center": np.tile([[1018.0, 779.0]], (B, 1)).astype(np.float32),
    "df_h": np.abs(rng.randn(B, N)).astype(np.float32) * 0.05,
    "df_o": np.abs(rng.randn(B, N)).astype(np.float32) * 0.05,
    "parts": rng.randint(0, 14, (B, N)).astype(np.int32),
    "pca": np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1)),
    "body_center": np.tile([[0.0, 0, 2.2]], (B, 1)).astype(np.float32),
    "obj_center": np.tile([[0.3, 0, 0.0]], (B, 1)).astype(np.float32),
}}
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 5)),
                    jnp.zeros((1, N, 3)), jnp.zeros((1, 2)))
tx = optax.adam(1e-3)
opt_state = tx.init(params)

def loss_fn(params, batch):
    preds = model.apply(params, batch["images"], batch["points"],
                        batch["crop_center"])
    return chore_losses(preds, batch, cfg)

def train_step(params, opt_state, batch):
    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, batch)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss

rep = NamedSharding(mesh, P())
step = jax.jit(train_step, in_shardings=(rep, rep,
                                         NamedSharding(mesh, P("data"))),
               out_shardings=(rep, rep, rep))
params = replicate(params, mesh)
opt_state = replicate(opt_state, mesh)
batch = shard_batch(batch, mesh)

# per-device FLOPs of the compiled SPMD program: the sharding-correctness
# signal. With the global batch fixed, this must fall ~1/width; a width-
# independent value means every device computes the full batch.
flops = None
try:
    ca = step.lower(params, opt_state, batch).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
except Exception:
    pass

for _ in range(2):  # compile + settle
    params, opt_state, loss = step(params, opt_state, batch)
    float(loss)
t0 = time.time()
for _ in range({steps}):
    params, opt_state, loss = step(params, opt_state, batch)
    float(loss)
dt = (time.time() - t0) / {steps}
print("SCALE_RESULT " + json.dumps(
    {{"devices": n, "step_ms": round(dt * 1e3, 1),
      "per_device_batch": B // n,
      "per_device_gflops": (round(flops / 1e9, 2)
                            if flops is not None else None),
      "loss": round(float(loss), 3)}}))
"""


def run_width(n, batch, steps):
    # the forced-CPU child recipe (sitecustomize overrides JAX_PLATFORMS
    # unless set before jax import) lives in ONE place: __graft_entry__
    sys.path.insert(0, REPO)
    from __graft_entry__ import _cpu_mesh_env

    env = _cpu_mesh_env(n)
    proc = subprocess.run(
        [sys.executable, "-c", CHILD.format(n=n, batch=batch, steps=steps)],
        capture_output=True, text=True, timeout=1200, cwd=REPO, env=env)
    if proc.returncode != 0:
        raise RuntimeError(
            f"width {n} failed:\n" +
            "\n".join((proc.stderr or "").splitlines()[-10:]))
    for line in proc.stdout.splitlines():
        if line.startswith("SCALE_RESULT "):
            return json.loads(line[len("SCALE_RESULT "):])
    raise RuntimeError(f"width {n}: no result line")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--widths", type=int, nargs="+", default=[1, 2, 4, 8])
    args = ap.parse_args()

    results = []
    for n in args.widths:
        r = run_width(n, args.batch, args.steps)
        results.append(r)
        print(json.dumps(r))
    losses = [r["loss"] for r in results]
    speedup = results[0]["step_ms"] / results[-1]["step_ms"]
    g0, gN = results[0]["per_device_gflops"], results[-1]["per_device_gflops"]
    print(json.dumps({
        "summary": "train-step scaling, fixed global batch "
                   f"{args.batch}, virtual CPU mesh (all widths share the "
                   "same physical cores: wall time cannot speed up here; "
                   "per-device FLOPs is the sharding-correctness signal)",
        "wall_speedup_1_to_max": round(speedup, 2),
        "per_device_flops_ratio_1_to_max": (
            round(g0 / gN, 2) if g0 and gN else None),
        "losses_agree_rel": max(losses) / min(losses) - 1.0 < 1e-4,
    }))


if __name__ == "__main__":
    main()
