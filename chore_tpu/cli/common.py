"""Shared CLI plumbing: model/checkpoint/template/SMPL loading."""
from __future__ import annotations

import os

import numpy as np

import jax

from chore_tpu.config import ChoreConfig
from chore_tpu.data.paths import load_paths
from chore_tpu.models import CHOREField
from chore_tpu.recon.templates import MESH_TEMPLATES, load_template
from chore_tpu.smpl import SMPLH, load_model_arrays, synthetic_smplh
from chore_tpu.train.checkpoints import find_checkpoint, load_checkpoint



def build_model(cfg: ChoreConfig):
    model = CHOREField(cfg=cfg.field_config(),
                       encoder_dtype=cfg.encoder_dtype())
    import jax.numpy as jnp

    # init on the CPU backend at a tiny image size: weight shapes are
    # image-size independent, and init only exists to sample them -- not
    # worth an accelerator compile of the full 512^2 graph
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 5)),
            jnp.zeros((1, 8, 3)),
            jnp.zeros((1, 2)),
            train=False,
        )
    # one-time transfer to the accelerator: CPU-committed params would be
    # re-shipped on EVERY jitted call (tens of MB per stage per frame)
    params = jax.device_put(params, jax.devices()[0])
    return model, params


def load_trained(cfg: ChoreConfig, exp_root="experiments"):
    """Model + best/latest checkpoint params (warns if untrained)."""
    model, params = build_model(cfg)
    exp_dir = os.path.join(exp_root, cfg.exp_name)
    path = find_checkpoint(exp_dir) if os.path.isdir(exp_dir) else None
    if path is None:
        print(f"WARNING: no checkpoint under {exp_dir}; using random init")
        return model, params
    state, epoch, _, _ = load_checkpoint(path, {"params": params})
    print(f"loaded checkpoint {path} (epoch {epoch})")
    return model, jax.device_put(state["params"], jax.devices()[0])


def load_smplh(gender="male"):
    """Real SMPL-H model if PATHS.yml points at one, else the synthetic
    stand-in (shape-compatible; warns)."""
    root = load_paths().get("SMPL_MODEL_ROOT")
    if root and os.path.isfile(os.path.join(root, f"SMPLH_{gender}.pkl")):
        return SMPLH(load_model_arrays(root, gender=gender, hands=True))
    print("WARNING: SMPL-H model files not found; using the synthetic "
          "body model (set SMPL_MODEL_ROOT in PATHS.yml for real results)")
    return SMPLH(synthetic_smplh())


def load_object_template(obj_name):
    """BEHAVE object template, or a unit sphere stand-in when the objects
    directory is unavailable."""
    behave = load_paths().get("BEHAVE_PATH")
    objects = os.path.join(behave, "..", "objects") if behave else None
    if objects and obj_name in MESH_TEMPLATES:
        path = os.path.join(objects, MESH_TEMPLATES[obj_name])
        if os.path.isfile(path):
            return load_template(objects, obj_name)
    print(f"WARNING: template for '{obj_name}' not found; using a sphere "
          "stand-in")
    from chore_tpu.utils.meshio import octasphere

    return octasphere(radius=0.15, subdiv=3)
