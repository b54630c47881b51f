"""Steady-state fit profiler: per-stage wall breakdown + optional device trace.

Reproduces bench.bench_fit exactly (same model/params/scene/schedule), then
reports per-run wall time, the StepTimer dispatch phases, and — with
--trace — a jax.profiler device trace of one steady-state run.

Usage (real TPU):
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_fit.py [--trace DIR]
"""
import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, help="profiler trace output dir")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sil-kernel-micro", action="store_true",
                    help="also micro-bench the pallas sil kernel fwd/bwd")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from chore_tpu.recon.fitter import FitConfig, ReconFitter
    from chore_tpu.recon.generator import SamplerConfig
    from chore_tpu.smpl import SMPLH, synthetic_smplh
    from chore_tpu.utils.meshio import octasphere

    model, params = bench.build_bench_model(jax, jnp)

    rng = np.random.RandomState(0)
    smplh = SMPLH(synthetic_smplh())
    tv, tf = octasphere(radius=0.18, subdiv=2)
    fitter = ReconFitter(model, params, smplh, tv, tf,
                         cfg=FitConfig(), sampler_cfg=SamplerConfig())
    print(f"template faces: {tf.shape[0]}", flush=True)

    images = rng.rand(1, 512, 512, 5).astype(np.float32)
    crop_center = np.array([[1018.0, 779.0]], np.float32)
    pose = (rng.randn(1, 72) * 0.05).astype(np.float32)
    betas = np.zeros((1, 10), np.float32)
    kpts = np.concatenate([np.full((1, 25, 2), 256, np.float32),
                           np.ones((1, 25, 1), np.float32)], -1)

    def run(k):
        out = fitter.fit_batch(images, crop_center, pose, betas, kpts,
                               key=jax.random.PRNGKey(k),
                               use_silhouette=True)
        return float(np.asarray(out["obj_params"]["obj_t"]).sum())

    t0 = time.time()
    run(0)
    print(f"compile+first: {time.time() - t0:.1f}s", flush=True)

    for k in range(1, args.runs + 1):
        fitter.timer.reset()
        t0 = time.time()
        run(k)
        dt = time.time() - t0
        phases = {n: round(s["mean_ms"], 1)
                  for n, s in fitter.timer.summary().items()}
        print(f"run {k}: {dt:.3f}s  dispatch-phases(ms): {phases}",
              flush=True)

    if args.trace:
        jax.profiler.start_trace(args.trace)
        t0 = time.time()
        run(99)
        dt = time.time() - t0
        jax.profiler.stop_trace()
        print(f"traced run: {dt:.3f}s -> {args.trace}", flush=True)

    if args.sil_kernel_micro:
        from chore_tpu.ops.pallas.silhouette import (
            coverage_sums, edge_coeffs)

        for F_target, subdiv in ((128, 2), (2048, 4)):
            tv2, tf2 = octasphere(radius=0.18, subdiv=subdiv)
            faces = jnp.asarray(tf2)
            sigma = 0.5 * (2.0 / 256)
            v = jnp.asarray(
                tv2 + np.array([0, 0, 2.2], np.float32))
            # project to pseudo-NDC like the fit does (z stays positive)
            vndc = jnp.concatenate(
                [v[:, :2] / v[:, 2:3], v[:, 2:3]], axis=-1)

            def fwd_loop(vn, iters=50):
                def body(i, acc):
                    e = edge_coeffs(vn + 1e-6 * i, faces, sigma)
                    return acc + coverage_sums(e, 256, 1.0 / sigma).sum()
                return jax.lax.fori_loop(0, iters, body, 0.0)

            def grad_loop(vn, iters=50):
                def one(vn):
                    e = edge_coeffs(vn, faces, sigma)
                    return coverage_sums(e, 256, 1.0 / sigma).sum()
                g = jax.grad(one)

                def body(i, acc):
                    return acc + g(vn + 1e-6 * i).sum()
                return jax.lax.fori_loop(0, iters, body, 0.0)

            jf = jax.jit(fwd_loop)
            jg = jax.jit(grad_loop)
            float(jf(vndc)); float(jg(vndc))
            t0 = time.time(); float(jf(vndc))
            fms = (time.time() - t0) / 50 * 1e3
            t0 = time.time(); float(jg(vndc))
            gms = (time.time() - t0) / 50 * 1e3
            print(f"sil kernel F={tf2.shape[0]}: fwd {fms:.2f} ms, "
                  f"fwd+bwd {gms:.2f} ms", flush=True)


if __name__ == "__main__":
    sys.exit(main())
