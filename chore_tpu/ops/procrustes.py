"""Procrustes similarity alignment (scale + rotation + translation).

Jittable, batched equivalent of the reference's HMR-derived
``compute_transform`` (reference: recon/eval/pose_utils.py:148-184) and the
mesh-level aligner (reference: recon/eval/pose_utils.py:12-65).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def similarity_transform(src, ref):
    """Find (scale, R, t) minimizing || scale * R @ src + t - ref ||^2.

    Args:
      src, ref: (..., N, 3) corresponding point sets.

    Returns:
      (R (..., 3, 3), t (..., 1, 3), scale (..., 1, 1)) such that
      aligned = scale * src @ R^T + t.
    """
    mu1 = src.mean(axis=-2, keepdims=True)
    mu2 = ref.mean(axis=-2, keepdims=True)
    x1 = src - mu1
    x2 = ref - mu2
    var1 = jnp.sum(x1 * x1, axis=(-1, -2), keepdims=True)  # (..., 1, 1)

    # K = X1^T X2 with rows-as-points layout; the reference works with
    # 3xN column layout, this is the same matrix transposed.
    k = _mm(jnp.swapaxes(x1, -1, -2), x2)  # (..., 3, 3)
    u, _, vh = jnp.linalg.svd(k)
    v = jnp.swapaxes(vh, -1, -2)
    det = jnp.sign(jnp.linalg.det(_mm(u, jnp.swapaxes(v, -1, -2))))
    z = jnp.broadcast_to(jnp.eye(3, dtype=src.dtype), k.shape).copy()
    z = z.at[..., 2, 2].set(det)
    r = _mm(_mm(v, z), jnp.swapaxes(u, -1, -2))  # (..., 3, 3), maps src -> ref
    from chore_tpu.ops.rotation import _newton_schulz_orthogonalize

    r = _newton_schulz_orthogonalize(r)

    scale = jnp.trace(_mm(r, k), axis1=-2, axis2=-1)[..., None, None] / var1
    t = mu2 - scale * _mm(mu1, jnp.swapaxes(r, -1, -2))
    return r, t, scale


def align_points(src, ref):
    """Procrustes-align ``src`` onto ``ref``; returns the aligned points."""
    r, t, scale = similarity_transform(src, ref)
    return apply_transform(src, r, t, scale)


def apply_transform(points, r, t, scale):
    """Apply a similarity transform from :func:`similarity_transform` to any
    point set (e.g. align SMPL+object jointly, then transform each part)."""
    return scale * _mm(points, jnp.swapaxes(r, -1, -2)) + t
