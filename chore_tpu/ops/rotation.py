"""SO(3) utilities: SVD projection, Rodrigues, pseudo-inverse alignment.

TPU notes: 3x3 SVDs inside jitted optimizer loops are tiny; XLA lowers them
to an iterative kernel that is cheap at this size. The reference adds random
jitter before SVD to dodge degenerate inputs (reference:
recon/recon_fit_base.py:373-384); we thread an explicit PRNG key instead.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# 3x3 products must run at full f32 precision: TPU matmuls default to
# bfloat16 passes, which leaves ~1e-3 error in rotation matrices -- fatal for
# optimizer loops that repeatedly re-project. These matmuls are tiny, so
# HIGHEST costs nothing.
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def _newton_schulz_orthogonalize(x, steps=3):
    """Polish a nearly-orthogonal matrix to machine-precision orthogonality:
    X <- X (3I - X^T X) / 2. Quadratic convergence near O(3); preserves the
    determinant sign. Needed because TPU f32 SVD is iterative/approximate
    (~1e-3 residual), which is too loose for rotations fed back into
    optimization loops."""
    eye = jnp.eye(3, dtype=x.dtype)
    for _ in range(steps):
        x = 0.5 * _mm(x, 3.0 * eye - _mm(jnp.swapaxes(x, -1, -2), x))
    return x


def project_so3(mat):
    """Project (..., 3, 3) matrices onto SO(3) via symmetric orthogonalization.

    Computes U diag(1, 1, det(U V^T)) V^T -- the det fix keeps the result a
    proper rotation (reference: recon/recon_fit_base.py:167-188) -- then
    polishes with Newton-Schulz to absorb TPU SVD tolerance.
    """
    u, _, vt = jnp.linalg.svd(mat, full_matrices=False)
    det = jnp.linalg.det(_mm(u, vt))[..., None, None]
    vt_fixed = jnp.concatenate([vt[..., :2, :], vt[..., 2:, :] * det], axis=-2)
    return _newton_schulz_orthogonalize(_mm(u, vt_fixed))


def project_so3_jittered(mat, key):
    """SO(3) projection with small random jitter to avoid SVD divergence on
    degenerate inputs (reference: recon/recon_fit_base.py:373-384 uses
    uniform(0,1)*1e-4 noise)."""
    noise = 1e-4 * jax.random.uniform(key, mat.shape, dtype=mat.dtype)
    return project_so3(mat + noise)


def pseudo_inverse(mat):
    """Left pseudo-inverse (A^T A)^-1 A^T of (..., 3, 3) matrices
    (reference: recon_fit_base.py:190-196)."""
    mt = jnp.swapaxes(mat, -1, -2)
    return _mm(jnp.linalg.inv(_mm(mt, mat)), mt)


def init_object_orientation(tgt_axis, src_axis):
    """Relative rotation taking template PCA axes to predicted PCA axes,
    projected to SO(3) (reference: recon_fit_base.py:154-165)."""
    rot = _mm(pseudo_inverse(src_axis), tgt_axis)
    return project_so3(rot)


def axis_angle_to_matrix(axisang):
    """Batched Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation matrix.

    Uses the quaternion route for numerical stability near zero angle
    (matches the reference's rodrigues_layer semantics, computed here fully
    vectorized instead of a per-joint python loop).
    """
    angle = jnp.linalg.norm(axisang + 1e-8, axis=-1, keepdims=True)
    axis = axisang / angle
    half = angle * 0.5
    w = jnp.cos(half)[..., 0]
    xyz = jnp.sin(half) * axis
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rot = jnp.stack(
        [
            ww + xx - yy - zz, 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), ww - xx + yy - zz, 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), ww - xx - yy + zz,
        ],
        axis=-1,
    )
    return rot.reshape(axisang.shape[:-1] + (3, 3))
