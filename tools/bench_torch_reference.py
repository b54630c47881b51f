"""Measure the reference torch CHORE forward (filter + query) on this
host's CPU to bound the baseline denominator behind bench.py's
``vs_baseline`` (BASELINE.md: the reference publishes no throughput
numbers, so round 1-2 used a 400k pts/s/GPU architecture estimate).

Protocol (north-star workload, BASELINE.md config b): HGFilter encode of a
5-ch 512^2 image + a 50k-point df/part/pose/center field query, eval mode,
batch 1, f32. The same workload is then run with OUR jax model on the SAME
CPU, giving a same-host, same-math framework ratio; both numbers plus the
documented GPU-speedup band turn the estimate into a measured bound
(see BASELINE.md "Baseline denominator" for the derivation).

Usage: python tools/bench_torch_reference.py [--points 50000] [--iters 3]
Prints one JSON line.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# single source of truth for the release protocol and the import stubbing:
# the parity tests. Diverging copies here would let this benchmark measure
# a different model than the one proven parity-exact.
from test_torch_parity import RELEASE, _Opt, _stub_module  # noqa: E402


def bench_torch(imgs, pts, cc, iters):
    import torch

    if REF not in sys.path:
        sys.path.insert(0, REF)
    _stub_module("skimage.measure")
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self
    from model.chore import CHORE

    torch.manual_seed(0)
    model = CHORE(_Opt(RELEASE))
    model.eval()
    t_imgs = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
    t_pts = torch.from_numpy(pts)
    t_cc = torch.from_numpy(cc)
    with torch.no_grad():
        model.filter(t_imgs)  # warm
        model.query(t_pts, t_cc)
        t0 = time.time()
        for _ in range(iters):
            model.filter(t_imgs)
            model.query(t_pts, t_cc)
            _ = model.get_preds()
        dt = (time.time() - t0) / iters
    return dt


def bench_jax_cpu(imgs, pts, cc, iters):
    os.environ.setdefault("XLA_FLAGS", "")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from chore_tpu.models import CHOREField, FieldConfig

    model = CHOREField(cfg=FieldConfig())  # f32: same math as the torch run
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)),
                        jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)), train=False)

    @jax.jit
    def fwd(params, imgs, pts, cc):
        p = model.apply(params, imgs, pts, cc, train=False)[-1]
        return p["df"].sum() + p["parts"].sum() + p["pca"].sum() + \
            p["centers"].sum()

    float(fwd(params, imgs, pts, cc))  # compile+warm
    t0 = time.time()
    for _ in range(iters):
        float(fwd(params, imgs, pts, cc))
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=50000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--skip-jax", action="store_true")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    imgs = rng.rand(1, 512, 512, 5).astype(np.float32)
    pts = (rng.rand(1, args.points, 3) * [2, 2, 0.5] + [-1, -1, 1.95]).astype(
        np.float32)
    cc = np.array([[1018.0, 779.0]], np.float32)

    torch_s = bench_torch(imgs, pts, cc, args.iters)
    out = {
        "torch_cpu_sec_per_image": round(torch_s, 3),
        "torch_cpu_pts_per_sec": round(args.points / torch_s, 1),
        "points": args.points,
    }
    if not args.skip_jax:
        jax_s = bench_jax_cpu(imgs, pts, cc, args.iters)
        out["jax_cpu_sec_per_image"] = round(jax_s, 3)
        out["jax_cpu_pts_per_sec"] = round(args.points / jax_s, 1)
        out["jax_over_torch_cpu"] = round(torch_s / jax_s, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
