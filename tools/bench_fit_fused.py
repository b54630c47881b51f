"""Staged vs fused fit-pipeline timing on the current backend.

Measures steady-state sec/image of the full release-schedule fit
(bench.py bench_fit workload) twice: through the staged 5-dispatch
pipeline and through the single whole-fit jit (FitConfig.fused_pipeline).
The fused path exists to remove the inter-stage dispatch gaps on
remote-tunnel backends (VERDICT round-3 item 4; BASELINE.md fit profile
showed ~0.9 s device vs 1.08 s wall across the stage jits).

Usage (real chip):
  PYTHONPATH=/root/repo:$PYTHONPATH python3 tools/bench_fit_fused.py
"""
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402


def main():
    import jax

    print("backend:", jax.default_backend())
    import jax.numpy as jnp

    from chore_tpu.recon.fitter import FitConfig, ReconFitter
    from chore_tpu.recon.generator import SamplerConfig
    from chore_tpu.smpl import SMPLH, synthetic_smplh
    from chore_tpu.utils.meshio import octasphere

    model, params = bench.build_bench_model(jax, jnp)
    rng = np.random.RandomState(0)
    smplh = SMPLH(synthetic_smplh())
    tv, tf = octasphere(radius=0.18, subdiv=2)

    images = rng.rand(1, 512, 512, 5).astype(np.float32)
    crop_center = np.array([[1018.0, 779.0]], np.float32)
    pose = (rng.randn(1, 72) * 0.05).astype(np.float32)
    betas = np.zeros((1, 10), np.float32)
    kpts = np.concatenate([np.full((1, 25, 2), 256, np.float32),
                           np.ones((1, 25, 1), np.float32)], -1)

    results = {}
    for name, fused in (("staged", False), ("fused", True)):
        fitter = ReconFitter(
            model, params, smplh, tv, tf,
            cfg=dataclasses.replace(FitConfig(), fused_pipeline=fused),
            sampler_cfg=SamplerConfig())

        def run(k):
            out = fitter.fit_batch(images, crop_center, pose, betas, kpts,
                                   key=jax.random.PRNGKey(k),
                                   use_silhouette=True)
            # host readback = synchronization on remote-tunnel backends
            return float(np.asarray(out["obj_params"]["obj_t"]).sum())

        t0 = time.time()
        run(0)  # compile
        print(f"{name}: compile+first call {time.time() - t0:.1f}s")
        best = None
        for k in (1, 2, 3):
            t0 = time.time()
            run(k)
            dt = time.time() - t0
            print(f"{name}: run {k}: {dt:.3f}s")
            best = dt if best is None else min(best, dt)
        results[name] = best
        print(f"{name}: best {best:.3f} s/image")
        print(f"{name}: phase timing:", fitter.timer.summary())

    print("RESULT staged", results["staged"], "fused", results["fused"])


if __name__ == "__main__":
    main()
