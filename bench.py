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
    # init on CPU at a small image size (weight shapes are size-independent)
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)),
            points[:1, :8], crop_center[:1], train=False,
        )

    @jax.jit
    def forward(params, images, points, crop_center):
        preds = model.apply(params, images, points, crop_center, train=False)
        p = preds[-1]
        # scalar checksum: forces full execution on platforms where
        # block_until_ready does not synchronize (remote-tunnel backends)
        chk = (p["df"].sum() + p["parts"].sum() + p["pca"].sum()
               + p["centers"].sum())
        return p["df"], p["parts"], p["pca"], p["centers"], chk

    out = forward(params, images, points, crop_center)
    float(out[-1])  # warm-up + sync via host readback
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        out = forward(params, images, points, crop_center)
        float(out[-1])
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
