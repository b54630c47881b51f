"""SMPL / SMPL-H linear blend skinning, vectorized for TPU.

Functional equivalent of the reference's smplpytorch forward (reference:
lib_smpl/smplpytorch/smplpytorch/pytorch/smpl_layer.py:72-175), with the two
per-joint python loops (Rodrigues and the kinematic chain) replaced by a
batched Rodrigues over all joints at once and a statically-unrolled chain of
4x4 composes (J is 24/52 and static, so unrolling lets XLA schedule it as a
short dependency chain of tiny fused matmuls).

All small matmuls run at HIGHEST precision -- bf16 passes would inject
millimeter-scale vertex noise, which matters at UDF thresholds of 0.004.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from chore_tpu.ops.rotation import axis_angle_to_matrix

_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
_ein = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


class SMPLModel(NamedTuple):
    """SMPL(-H) model arrays as a pytree; ``parents`` is a static tuple."""

    v_template: jax.Array  # (V, 3)
    shapedirs: jax.Array  # (V, 3, num_betas)
    posedirs: jax.Array  # (V, 3, 9*(J-1))
    j_regressor: jax.Array  # (J, V)
    weights: jax.Array  # (V, J)
    faces: jax.Array  # (F, 3) int32

    @property
    def num_joints(self):
        return self.j_regressor.shape[0]

    @property
    def num_verts(self):
        return self.v_template.shape[0]


def model_from_arrays(data) -> tuple[SMPLModel, tuple]:
    """Build an SMPLModel + static parents tuple from a loader dict."""
    # numpy on purpose: arrays embed as constants when traced into jitted
    # computations; eager jnp.asarray here would pay a per-array device
    # transfer at construction time (50+ MB through a remote-device tunnel)
    model = SMPLModel(
        v_template=np.asarray(data["v_template"], np.float32),
        shapedirs=np.asarray(data["shapedirs"], np.float32),
        posedirs=np.asarray(data["posedirs"], np.float32),
        j_regressor=np.asarray(data["j_regressor"], np.float32),
        weights=np.asarray(data["weights"], np.float32),
        faces=np.asarray(data["faces"], np.int32),
    )
    parents = tuple(int(p) for p in data["parents"])
    return model, parents


def lbs(model: SMPLModel, parents, pose, betas, trans, offsets=None):
    """SMPL(-H) forward.

    Args:
      model: SMPLModel arrays.
      parents: static tuple of J parent indices (parents[0] == -1).
      pose: (B, J*3) axis-angle pose (72 for SMPL, 156 for SMPL-H).
      betas: (B, num_betas) shape coefficients.
      trans: (B, 3) root translation.
      offsets: optional (B, V, 3) per-vertex t-pose offsets.

    Returns:
      (verts (B, V, 3), joints (B, J, 3), v_posed (B, V, 3), naked (B, V, 3))
      -- same contract as the reference forward
      (smpl_layer.py:175: verts, jtr, tposed, naked).
    """
    B = pose.shape[0]
    J = len(parents)
    rotmats = axis_angle_to_matrix(pose.reshape(B, J, 3))  # (B, J, 3, 3)

    # Shape blendshapes: v_shaped = template + shapedirs . betas
    v_shaped = model.v_template[None] + _ein(
        "vdk,bk->bvd", model.shapedirs, betas
    )
    joints = _ein("jv,bvd->bjd", model.j_regressor, v_shaped)  # (B, J, 3)

    # Pose blendshapes from the non-root rotations minus identity.
    eye = jnp.eye(3, dtype=pose.dtype)
    pose_map = (rotmats[:, 1:] - eye).reshape(B, (J - 1) * 9)
    naked = v_shaped + _ein("vdp,bp->bvd", model.posedirs, pose_map)
    v_posed = naked if offsets is None else naked + offsets

    # Kinematic chain: compose relative 4x4s root-to-leaf. Unrolled -- J is
    # static and small; each step is a (B, 4, 4) matmul.
    def make_tf(rot, loc):
        tf = jnp.zeros((B, 4, 4), dtype=pose.dtype)
        tf = tf.at[:, :3, :3].set(rot)
        tf = tf.at[:, :3, 3].set(loc)
        tf = tf.at[:, 3, 3].set(1.0)
        return tf

    results = [make_tf(rotmats[:, 0], joints[:, 0])]
    for i in range(1, J):
        p = parents[i]
        rel = make_tf(rotmats[:, i], joints[:, i] - joints[:, p])
        results.append(_mm(results[p], rel))
    global_tf = jnp.stack(results, axis=1)  # (B, J, 4, 4)

    # Remove the rest-pose joint location component (the reference's
    # th_results2, smpl_layer.py:133-142): A_j = G_j - pack(G_j @ [j, 0]).
    joints_h = jnp.concatenate(
        [joints, jnp.zeros((B, J, 1), dtype=pose.dtype)], axis=-1
    )
    shifted = _ein("bjpq,bjq->bjp", global_tf, joints_h)  # (B, J, 4)
    rel_tf = global_tf.at[:, :, :, 3].add(-shifted)

    # Skinning: per-vertex blended transform via one (V, J) x (B, J, 16)
    # matmul -- MXU-friendly.
    t_flat = rel_tf.reshape(B, J, 16)
    vert_tf = _ein("vj,bjk->bvk", model.weights, t_flat).reshape(B, -1, 4, 4)
    verts = (
        _ein("bvpq,bvq->bvp", vert_tf[:, :, :3, :3], v_posed)
        + vert_tf[:, :, :3, 3]
    )

    jtr = global_tf[:, :, :3, 3]
    verts = verts + trans[:, None, :]
    jtr = jtr + trans[:, None, :]
    return verts, jtr, v_posed, naked
