"""SMPL-H parameter pytrees and forward wrappers.

Replaces the reference's nn.Module wrappers
(lib_smpl/wrapper_pytorch.py:23-218) with plain parameter pytrees: the
"split params" design (global/body/hand pose, top/other betas, trans) is the
natural JAX formulation -- each phase of the fitting optimizer simply masks
which leaves receive updates (instead of constructing new torch Modules).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from chore_tpu.smpl import const
from chore_tpu.smpl.assets import load_landmark_regressors
from chore_tpu.smpl.lbs import lbs, model_from_arrays
from chore_tpu.smpl.priors import mean_hand_pose


def split_params(pose, betas, trans):
    """(B,156)/(B,nb)/(B,3) -> split-param dict
    (reference: wrapper_pytorch.py:197-218 ``from_smpl``)."""
    g = const.GLOBAL_POSE_NUM
    b = const.BODY_POSE_NUM
    return {
        "global_pose": pose[:, :g],
        "body_pose": pose[:, g : g + b],
        "hand_pose": pose[:, g + b :],
        "top_betas": betas[:, : const.TOP_BETA_NUM],
        "other_betas": betas[:, const.TOP_BETA_NUM :],
        "trans": trans,
    }


def pack_pose(params):
    return jnp.concatenate(
        [params["global_pose"], params["body_pose"], params["hand_pose"]], axis=1
    )


def pack_betas(params):
    return jnp.concatenate([params["top_betas"], params["other_betas"]], axis=1)


class SMPLH:
    """SMPL-H forward + landmarks bound to loaded model arrays.

    Stateless w.r.t. pose parameters: ``forward(params)`` takes the split
    param pytree so it can sit inside jit/grad.
    """

    def __init__(self, model_arrays, assets_dir=None):
        self.model, self.parents = model_from_arrays(model_arrays)
        regs = load_landmark_regressors(assets_dir)
        # numpy (not device arrays): embedded as constants at trace time
        self.body25_reg = np.asarray(regs["body25"], np.float32)  # (25, V)
        self.face_reg = np.asarray(regs["face"], np.float32)  # (70, V)
        self.hand_reg = np.asarray(regs["hand"], np.float32)  # (42, V)
        self.faces = np.asarray(self.model.faces)

    def forward(self, params, offsets=None):
        """-> (verts, joints, v_posed, naked), each (B, ., 3)."""
        return lbs(
            self.model,
            self.parents,
            pack_pose(params),
            pack_betas(params),
            params["trans"],
            offsets,
        )

    def verts(self, params, offsets=None):
        return self.forward(params, offsets)[0]

    def get_landmarks(self, params, offsets=None):
        """body25 (B,25,3), face (B,70,3), hand (B,42,3) landmarks via dense
        regressor matmuls (reference: wrapper_pytorch.py:78-90)."""
        verts = self.verts(params, offsets)
        # HIGHEST: these lower to dot_general, and the default single bf16
        # pass would inject mm-scale joint noise into smplz/j2d/ocent losses
        # (CLAUDE.md precision rule; lbs.py applies it for the same reason)
        hi = jax.lax.Precision.HIGHEST
        j = jnp.einsum("kv,bvd->bkd", self.body25_reg, verts, precision=hi)
        face = jnp.einsum("kv,bvd->bkd", self.face_reg, verts, precision=hi)
        hand = jnp.einsum("kv,bvd->bkd", self.hand_reg, verts, precision=hi)
        return j, face, hand

    def pelvis(self, params):
        """The "SMPL center": body25 joint 8
        (reference: lib_smpl/body_landmark.py:52-56)."""
        return self.get_landmarks(params)[0][:, const.BODY25_PELVIS]


def init_params(poses, betas, trans, assets_dir=None):
    """Build split params from (possibly SMPL-72) mocap estimates.

    Mirrors SMPLHGenerator.get_smplh (reference:
    lib_smpl/smpl_generator.py:85-99): 72-dim poses are padded to 156 with
    the GRAB mean hand pose; betas are used as-is (10-dim).
    """
    poses = jnp.asarray(poses, dtype=jnp.float32)
    betas = jnp.asarray(betas, dtype=jnp.float32)
    trans = jnp.asarray(trans, dtype=jnp.float32)
    B = poses.shape[0]
    if poses.shape[1] != const.SMPLH_POSE_PARAMS_NUM:
        assert poses.shape[1] == const.SMPL_POSE_PARAMS_NUM, (
            f"unknown pose source with {poses.shape[1]} params"
        )
        hand = jnp.tile(mean_hand_pose(assets_dir)[None], (B, 1))
        full = jnp.concatenate(
            [poses[:, : const.SMPLH_HANDPOSE_START], hand], axis=1
        )
    else:
        full = poses
    return split_params(full, betas, trans)
