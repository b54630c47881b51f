"""Mahalanobis pose priors (body + GRAB hands).

Functional equivalents of the reference's th_Mahalanobis / HandPrior
(reference: lib_smpl/th_smpl_prior.py:25-48, lib_smpl/th_hand_prior.py:46-72):
  body:  || (pose[3:66] - mean) @ precision ||^2 per example
  hands: || (pose[66:111] - lh_mean) @ lh_prec ||^2
         + || (pose[111:156] - rh_mean) @ rh_prec ||^2
"""
from __future__ import annotations

import jax.numpy as jnp

from chore_tpu.smpl.assets import load_priors
from chore_tpu.smpl.const import SMPLH_HANDPOSE_START


def make_body_prior(assets_dir=None):
    p = load_priors(assets_dir)
    mean = jnp.asarray(p["body_mean"])
    prec = jnp.asarray(p["body_precision"])

    def body_prior(pose, prefix=3, end=66):
        """(B, >=66) pose -> (B,) prior energy."""
        t = pose[:, prefix:end] - mean[None]
        t2 = t @ prec
        return jnp.sum(t2 * t2, axis=1)

    return body_prior


def make_hand_prior(assets_dir=None):
    p = load_priors(assets_dir)
    mean = jnp.asarray(jnp.concatenate([p["lh_mean"], p["rh_mean"]]))
    lh_prec = jnp.asarray(p["lh_precision"])
    rh_prec = jnp.asarray(p["rh_precision"])

    def hand_prior(full_pose, prefix=SMPLH_HANDPOSE_START):
        """(B, 156) SMPL-H pose -> (B,) prior energy."""
        t = full_pose[:, prefix:] - mean[None]
        lh = t[:, :45] @ lh_prec
        rh = t[:, 45:] @ rh_prec
        t2 = jnp.concatenate([lh, rh], axis=1)
        return jnp.sum(t2 * t2, axis=1)

    return hand_prior


def mean_hand_pose(assets_dir=None):
    """(90,) GRAB mean hand pose used to initialize SMPL-H hands
    (reference: lib_smpl/th_hand_prior.py:37-43)."""
    p = load_priors(assets_dir)
    return jnp.concatenate(
        [jnp.asarray(p["lh_mean"]), jnp.asarray(p["rh_mean"])]
    )


def mean_body_pose(assets_dir=None):
    """(63,) mean body pose from the body prior."""
    p = load_priors(assets_dir)
    return jnp.asarray(p["body_mean"])
