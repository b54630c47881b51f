"""Pixel-aligned bilinear feature sampling.

TPU-native equivalent of the reference's ``index()`` which wraps torch's
``F.grid_sample(..., align_corners=True)`` (reference: model/geometry.py:4-14).

We keep features channels-last (B, H, W, C) -- the layout XLA prefers on TPU --
and sample N points per batch element with explicit corner gathers + lerp.
Out-of-range samples use zero padding exactly like torch's default
``padding_mode='zeros'``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(feat, uv):
    """Sample features at normalized points.

    Args:
      feat: (B, H, W, C) feature maps.
      uv:   (B, N, 2) normalized coords in [-1, 1]; uv[..., 0] indexes width,
            uv[..., 1] indexes height (same convention as torch grid_sample).

    Returns:
      (B, N, C) sampled features. align_corners=True semantics:
      -1 -> pixel 0 center, +1 -> pixel (W-1) center. Out-of-bounds corners
      contribute zeros.
    """
    B, H, W, C = feat.shape
    x = (uv[..., 0] + 1.0) * 0.5 * (W - 1)  # (B, N)
    y = (uv[..., 1] + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    def corner(xi, yi, wxi, wyi):
        in_bounds = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat_idx = yc * W + xc  # (B, N)
        flat = feat.reshape(B, H * W, C)
        g = jnp.take_along_axis(flat, flat_idx[..., None], axis=1)  # (B, N, C)
        w = (wxi * wyi * in_bounds.astype(feat.dtype))[..., None]
        return g * w

    out = (
        corner(x0, y0, wx0, wy0)
        + corner(x1, y0, wx1, wy0)
        + corner(x0, y1, wx0, wy1)
        + corner(x1, y1, wx1, wy1)
    )
    return out


def _corners_and_weights(feat, uv):
    """Shared forward math: gather the 4 masked corner values and the
    lerp weights. Returns (gm00, gm10, gm01, gm11, wx0, wx1, wy0, wy1)
    where gm_ab = feat[corner(x_a, y_b)] * in_bounds (B, N, C) and the
    w's are (B, N). Bit-identical corner products to ``bilinear_sample``
    (masks are exactly 0/1 so the association (g*m)*(wx*wy) equals
    g*(wx*wy*m))."""
    B, H, W, C = feat.shape
    x = (uv[..., 0] + 1.0) * 0.5 * (W - 1)  # (B, N)
    y = (uv[..., 1] + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    flat = feat.reshape(B, H * W, C)

    def corner(xi, yi):
        in_bounds = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        g = jnp.take_along_axis(flat, (yc * W + xc)[..., None], axis=1)
        return g * in_bounds.astype(feat.dtype)[..., None]

    return (corner(x0, y0), corner(x1, y0), corner(x0, y1), corner(x1, y1),
            wx0, wx1, wy0, wy1)


@jax.custom_vjp
def bilinear_sample_frozen(feat, uv):
    """``bilinear_sample`` for FROZEN feature maps: identical forward, but
    the backward pass treats ``feat`` as a constant (its cotangent is a
    symbolic zero) and computes d/d(uv) from corner values SAVED in the
    forward pass instead of re-gathering them.

    Why: in the fitting and point-generation loops the network is frozen
    and gradients flow only to the 3D points. XLA's autodiff of the plain
    sampler rematerializes all 4 corner gathers in the backward pass
    (~18 ms/map at fit shapes, BASELINE.md fit profile); with saved
    corners the uv-gradient is a pure per-point contraction over channels
    — zero backward gathers. The extra residual memory is (B, N, 4, C),
    transient inside the optimization loop body.

    Do NOT use where gradients w.r.t. ``feat`` are needed (training):
    they are silently zero.
    """
    return bilinear_sample(feat, uv)


def _frozen_fwd(feat, uv):
    gm00, gm10, gm01, gm11, wx0, wx1, wy0, wy1 = _corners_and_weights(
        feat, uv)
    out = (gm00 * (wx0 * wy0)[..., None]
           + gm10 * (wx1 * wy0)[..., None]
           + gm01 * (wx0 * wy1)[..., None]
           + gm11 * (wx1 * wy1)[..., None])
    # feat rides along only to give the (DCE'd) zero cotangent its
    # shape/dtype -- residuals alias the input, no copy is made.
    res = (gm00, gm10, gm01, gm11, wx0, wx1, wy0, wy1, feat)
    return out, res


def _frozen_bwd(res, ct):
    gm00, gm10, gm01, gm11, wx0, wx1, wy0, wy1, feat = res
    _, H, W, _ = feat.shape
    # s_ab = <ct, gm_ab> over channels (B, N): the only reduction needed.
    cf = ct.astype(jnp.float32)
    s00 = jnp.sum(cf * gm00.astype(jnp.float32), axis=-1)
    s10 = jnp.sum(cf * gm10.astype(jnp.float32), axis=-1)
    s01 = jnp.sum(cf * gm01.astype(jnp.float32), axis=-1)
    s11 = jnp.sum(cf * gm11.astype(jnp.float32), axis=-1)
    # d(out)/dx = sum_ab g_ab * d(wx_a)/dx * wy_b  (dwx0/dx=-1, dwx1/dx=+1)
    dx = (s10 - s00) * wy0 + (s11 - s01) * wy1
    dy = (s01 - s00) * wx0 + (s11 - s10) * wx1
    # x = (u + 1) * 0.5 * (W - 1)
    du = dx * (0.5 * (W - 1))
    dv = dy * (0.5 * (H - 1))
    d_uv = jnp.stack([du, dv], axis=-1).astype(jnp.float32)
    d_feat = jnp.zeros_like(feat)  # frozen: DCE'd when unused
    return d_feat, d_uv


bilinear_sample_frozen.defvjp(_frozen_fwd, _frozen_bwd)
