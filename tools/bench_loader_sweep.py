"""Loader-overlap sweep at release train shapes (VERDICT round-3 item 7).

bench.py's train section reported loader_overlap_ratio 1.094 at the
default (workers=4, loader prefetch=2, device prefetch=2): ~9% of the
524 ms step is unhidden input pipeline. This driver compiles the train
step ONCE, measures the staged (device-resident) step time, then sweeps
loader knobs and reports ratio per config — isolating which knob hides
the residual (worker parallelism, host batch queue depth, or staged
device-buffer depth on the tunnel).

Usage (real chip):
  PYTHONPATH=/root/repo:$PYTHONPATH python3 tools/bench_loader_sweep.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402
from bench import _BenchTrainDataset  # noqa: E402

B, STEPS = 16, 6


def main():
    import jax
    import jax.numpy as jnp
    import optax

    print("backend:", jax.default_backend())
    from chore_tpu.data.loader import DataLoader, prefetch_to_device
    from chore_tpu.models import chore_losses

    model, params = bench.build_bench_model(jax, jnp)
    cfg = model.cfg
    tx = optax.adam(1e-3)
    with jax.default_device(jax.devices("cpu")[0]):
        opt_state = tx.init(params)
    opt_state = jax.device_put(opt_state, jax.devices()[0])

    def loss_fn(params, batch):
        preds = model.apply(
            params, batch["images"], batch["points"], batch["crop_center"])
        return chore_losses(preds, batch, cfg)

    def train_step(params, opt_state, batch):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))

    from chore_tpu.data.loader import collate

    ds0 = _BenchTrainDataset(n=2 * B)
    staged = [jax.device_put(collate([ds0[i * B + j] for j in range(B)]),
                             jax.devices()[0]) for i in range(2)]
    for i in range(3):  # compile + donated relayout recompile (never call 2)
        params, opt_state, loss = step(params, opt_state, staged[i % 2])
        float(loss)
    t0 = time.time()
    for i in range(STEPS):
        params, opt_state, loss = step(params, opt_state, staged[i % 2])
        float(loss)
    step_s = (time.time() - t0) / STEPS
    print(f"staged step: {step_s * 1e3:.1f} ms")

    # (workers, loader_prefetch, device_prefetch, worker_type)
    configs = [
        (4, 2, 2, "process"),   # bench.py default (reported 1.094)
        (6, 2, 2, "process"),
        (6, 3, 3, "process"),
        (8, 4, 3, "process"),
        (8, 4, 4, "process"),
        (4, 2, 4, "process"),
    ]
    results = {}
    for (w, lp, dp, wt) in configs:
        ds = _BenchTrainDataset(n=(STEPS + 1) * B)
        loader = DataLoader(ds, batch_size=B, shuffle=False, num_workers=w,
                            prefetch=lp, worker_type=wt)
        it = prefetch_to_device(iter(loader), size=dp)
        params, opt_state, loss = step(params, opt_state, next(it))
        float(loss)
        t0 = time.time()
        n = 0
        for batch in it:
            params, opt_state, loss = step(params, opt_state, batch)
            float(loss)
            n += 1
            if n >= STEPS:
                break
        dt = (time.time() - t0) / n
        loader.close()
        ratio = dt / step_s
        results[(w, lp, dp, wt)] = ratio
        print(f"workers={w} lp={lp} dp={dp} {wt}: "
              f"{dt * 1e3:.1f} ms  ratio {ratio:.3f}")

    best = min(results, key=results.get)
    print("BEST", best, round(results[best], 3))


if __name__ == "__main__":
    main()
