"""Benchmark: field-query throughput on the flagship CHORE forward.

Workload (BASELINE.md config b, the north-star): HGFilter encode (5-ch 512^2,
release num_stack=5, eval mode) + 50k-point df/part/pose/center field query,
batch 8, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against a reference-architecture estimate of
400k points/sec/GPU (the reference publishes no numbers; see BASELINE.md --
structural cost of filter+query on its torch/CUDA stack).
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from chore_tpu.models import CHOREField, FieldConfig

    B, N = 8, 50000
    cfg = FieldConfig()
    # inference precision: bf16 encoder (MXU native), f32 heads
    model = CHOREField(cfg=cfg, encoder_dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, 512, 512, 5).astype(np.float32))
    points = jnp.asarray(
        (rng.rand(B, N, 3) * [2, 2, 0.5] + [-1, -1, 1.95]).astype(np.float32)
    )
    crop_center = jnp.asarray(
        np.tile([[1018.0, 779.0]], (B, 1)).astype(np.float32)
    )
    # init on CPU at a small image size (weight shapes are size-independent),
    # then place on the accelerator ONCE (CPU-committed params would be
    # re-transferred on every call)
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)),
            points[:1, :8], crop_center[:1], train=False,
        )
    params = jax.device_put(params, jax.devices()[0])

    iters = 10

    @jax.jit
    def forward_loop(params, images, points, crop_center):
        # sustained throughput: `iters` full forwards chained on device with
        # per-iteration input perturbation (prevents CSE), one scalar
        # readback at the end -- keeps host/tunnel dispatch latency out of
        # the per-point figure
        def body(i, acc):
            p = model.apply(
                params, images, points + 1e-6 * i, crop_center, train=False
            )[-1]
            return acc + (p["df"].sum() + p["parts"].sum() + p["pca"].sum()
                          + p["centers"].sum())

        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(forward_loop(params, images, points, crop_center))  # compile+warm
    t0 = time.time()
    # scalar checksum readback forces execution on platforms where
    # block_until_ready does not synchronize (remote-tunnel backends)
    float(forward_loop(params, images, points, crop_center))
    dt = (time.time() - t0) / iters

    pts_per_sec = B * N / dt
    baseline = 4.0e5  # reference-architecture estimate, pts/sec/GPU
    print(json.dumps({
        "metric": "field_query_points_per_sec_per_chip",
        "value": round(pts_per_sec, 1),
        "unit": "points/sec",
        "vs_baseline": round(pts_per_sec / baseline, 2),
    }))


if __name__ == "__main__":
    main()
