"""Pixel-aligned bilinear feature sampling.

TPU-native equivalent of the reference's ``index()`` which wraps torch's
``F.grid_sample(..., align_corners=True)`` (reference: model/geometry.py:4-14).

We keep features channels-last (B, H, W, C) -- the layout XLA prefers on TPU --
and sample N points per batch element with explicit corner gathers + lerp.
Out-of-range samples use zero padding exactly like torch's default
``padding_mode='zeros'``.
"""
from __future__ import annotations

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
