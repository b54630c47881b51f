"""Micro-bench: the 4-corner backward scatter of the stacked feature
gather at train shapes (VERDICT r3 item 3).

The release train step's single biggest non-conv leaf is the VJP of
``bilinear_sample(cat, xy)`` with cat (16, 128, 128, 1280) bf16 and
xy (16, 20000, 2): XLA lowers the take_along_axis backward to a
scatter-add with possibly-colliding indices (~74 ms in the r3 trace,
BASELINE.md "Post-change trace attribution"). This tool measures that
leaf in isolation and candidate reformulations, using the sustained
fori_loop + scalar-readback harness (block_until_ready does not sync
on the axon tunnel backend; see .claude/skills/verify/SKILL.md).

  fwd        forward gather alone (floor)
  xla        autodiff of the production sampler (baseline, d_feat+d_uv)
  f32        same with an f32 map/cotangent (layout probe)
  split      5 separate 256-ch scatters (pre-stacking form)
  segsum     sort corner updates by pixel id + sorted segment_sum (d_feat)
  sortsc     sorted ids + scatter-add with indices_are_sorted (d_feat)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python3 tools/bench_scatter.py
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from chore_tpu.ops.grid_sample import bilinear_sample

B, H, W, C, N = 16, 128, 128, 1280, 20000


def sustained_ms(fn, feat, uv, ct, iters=20):
    """Device ms/call: chain `iters` calls inside one jit via a data
    dependency through uv (prevents hoisting), read back one scalar."""

    @jax.jit
    def loop(feat, uv, ct):
        def body(i, s):
            out = fn(feat, uv + s, ct)
            leaves = jax.tree_util.tree_leaves(out)
            chk = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return chk * 1e-30 + s

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(feat, uv, ct))  # compile + warm
    t0 = time.time()
    v = float(loop(feat, uv, ct))
    dt = (time.time() - t0) / iters * 1e3
    assert np.isfinite(v)
    return dt


def make_inputs(seed=0, dtype=jnp.bfloat16):
    rng = np.random.RandomState(seed)
    feat = jnp.asarray(rng.randn(B, H, W, C), dtype)
    uv = jnp.asarray(rng.uniform(-1.1, 1.1, (B, N, 2)).astype(np.float32))
    ct = jnp.asarray(rng.randn(B, N, C), dtype)
    return feat, uv, ct


def f_fwd(feat, uv, ct):
    return bilinear_sample(feat, uv)


def f_vjp(feat, uv, ct):
    # bf16 feat x f32 weights promotes the output to f32 -> f32 cotangent
    # (exactly the production train step's types)
    _, pull = jax.vjp(bilinear_sample, feat, uv)
    return pull(ct.astype(jnp.float32))


def f_dfeat(feat, uv, ct):
    """d_feat only (training: points carry no grad, XLA DCEs d_uv)."""
    return jax.grad(
        lambda f: jnp.sum(bilinear_sample(f, uv) * ct.astype(jnp.float32))
    )(feat)


def f_vjp_f32(feat, uv, ct):
    _, pull = jax.vjp(bilinear_sample, feat.astype(jnp.float32), uv)
    return pull(ct.astype(jnp.float32))


def f_vjp_split(feat, uv, ct):
    def g(fe, u):
        chunks = [fe[..., i * 256:(i + 1) * 256] for i in range(5)]
        return jnp.concatenate(
            [bilinear_sample(c, u) for c in chunks], axis=-1)

    _, pull = jax.vjp(g, feat, uv)
    return pull(ct.astype(jnp.float32))


# ------------------------------------------------------- corner index math
def corner_ids_weights(uv):
    """Flat pixel ids (B, 4N) int32 (HW = out-of-bounds trash slot) and
    lerp weights (B, 4N) f32 for the 4 bilinear corners."""
    x = (uv[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (uv[..., 1] + 1.0) * 0.5 * (H - 1)
    x0, y0 = jnp.floor(x), jnp.floor(y)
    wx1, wy1 = x - x0, y - y0
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    ids, ws = [], []
    for xi, yi, wxi, wyi in ((x0, y0, wx0, wy0), (x0 + 1, y0, wx1, wy0),
                             (x0, y0 + 1, wx0, wy1),
                             (x0 + 1, y0 + 1, wx1, wy1)):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        flat = (yi.astype(jnp.int32) * W + xi.astype(jnp.int32))
        ids.append(jnp.where(inb, flat, H * W))
        ws.append(wxi * wyi * inb)
    return jnp.concatenate(ids, 1), jnp.concatenate(ws, 1)


def f_segsum(feat, uv, ct):
    ids, ws = corner_ids_weights(uv)          # (B, 4N)
    order = jnp.argsort(ids, axis=1)
    ids_s = jnp.take_along_axis(ids, order, axis=1)
    ws_s = jnp.take_along_axis(ws, order, axis=1)
    pt = order % N                            # source point row
    data = jnp.take_along_axis(ct, pt[..., None], axis=1)  # (B, 4N, C)
    data = data * ws_s[..., None].astype(ct.dtype)

    def per_b(d, i):
        return jax.ops.segment_sum(d, i, num_segments=H * W + 1,
                                   indices_are_sorted=True)

    out = jax.vmap(per_b)(data, ids_s)[:, :H * W]
    return out.reshape(B, H, W, C)


def f_halo_scatter(feat, uv, ct):
    """ONE scatter of N rows with 4C-wide updates into a (H+2, W+2) halo
    grid, then a shifted fold. Same bytes as the 4-corner scatter but 4x
    fewer update rows — a win iff XLA's scatter cost is row-bound, not
    bandwidth-bound. bf16 accumulation, matching what XLA's own backward
    does (the take() output is bf16, so its cotangent scatter is bf16)."""
    x = (uv[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (uv[..., 1] + 1.0) * 0.5 * (H - 1)
    x0, y0 = jnp.floor(x), jnp.floor(y)
    wx1, wy1 = x - x0, y - y0
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1

    def cw(xi, yi, wxi, wyi):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        return (wxi * wyi * inb)[..., None].astype(ct.dtype)

    w00 = cw(x0, y0, wx0, wy0)
    w10 = cw(x0 + 1, y0, wx1, wy0)
    w01 = cw(x0, y0 + 1, wx0, wy1)
    w11 = cw(x0 + 1, y0 + 1, wx1, wy1)
    upd = jnp.concatenate([w00 * ct, w10 * ct, w01 * ct, w11 * ct], -1)

    H2, W2 = H + 2, W + 2
    bx = x0.astype(jnp.int32) + 1
    by = y0.astype(jnp.int32) + 1
    inhalo = (bx >= 0) & (bx < W2) & (by >= 0) & (by < H2)
    cell = jnp.where(inhalo, by * W2 + bx, H2 * W2)

    zero = jnp.zeros((B, H2 * W2 + 1, 4 * C), ct.dtype)
    Z = jax.vmap(lambda z, i, u: z.at[i].add(u, mode="drop"))(
        zero, cell, upd)[:, :H2 * W2].reshape(B, H2, W2, 4, C)
    d = (Z[:, 1:H + 1, 1:W + 1, 0] + Z[:, 1:H + 1, 0:W, 1]
         + Z[:, 0:H, 1:W + 1, 2] + Z[:, 0:H, 0:W, 3])
    return d


def f_sorted_scatter(feat, uv, ct):
    ids, ws = corner_ids_weights(uv)
    order = jnp.argsort(ids, axis=1)
    ids_s = jnp.take_along_axis(ids, order, axis=1)
    ws_s = jnp.take_along_axis(ws, order, axis=1)
    pt = order % N
    data = jnp.take_along_axis(ct, pt[..., None], axis=1)
    data = data * ws_s[..., None].astype(ct.dtype)
    zero = jnp.zeros((B, H * W + 1, C), ct.dtype)

    def per_b(z, d, i):
        return z.at[i].add(d, indices_are_sorted=True, mode="drop")

    return jax.vmap(per_b)(zero, data, ids_s)[:, :H * W].reshape(B, H, W, C)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    feat, uv, ct = make_inputs()
    it = args.iters

    for name, fn in [("fwd gather", f_fwd), ("vjp XLA (baseline)", f_vjp),
                     ("d_feat only XLA", f_dfeat),
                     ("vjp f32", f_vjp_f32), ("vjp 5x256 split", f_vjp_split),
                     ("halo 1-scatter d_feat", f_halo_scatter),
                     ("segsum d_feat", f_segsum),
                     ("sorted scatter d_feat", f_sorted_scatter)]:
        try:
            ms = sustained_ms(fn, feat, uv, ct, iters=it)
            print(f"{name:24s}: {ms:7.2f} ms")
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name:24s}: FAILED {type(e).__name__}: {e}")

    if args.check:
        d_ref = jax.jit(f_dfeat)(feat, uv, ct)
        for nm, fn in [("halo", f_halo_scatter), ("segsum", f_segsum)]:
            d = jax.jit(fn)(feat, uv, ct)
            err = float(jnp.max(jnp.abs(d_ref.astype(jnp.float32)
                                        - d.astype(jnp.float32))))
            print(f"{nm} vs XLA d_feat max|diff| = {err:.4f} "
                  f"(bf16 order differences expected)")


if __name__ == "__main__":
    main()
