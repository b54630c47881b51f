"""Import reference (torch) CHORE checkpoints into flax params.

Users of the reference train with torch DDP and save ``.tar`` dicts with a
``model_state_dict`` (reference: trainer/trainer.py:186-206); this module
maps that state dict onto our ``CHOREField`` parameter tree so trained
reference models run unchanged on TPU. The mapping covers the full release
architecture (reference: model/chore.py:32-85, model/HGFilters.py:56-185,
model/net_util.py:346-396):

  * DDP ``module.`` prefixes are stripped (reference strips them the same
    way at inference, recon/generator.py:255-264);
  * conv2d weights (O, I, kH, kW) -> flax NHWC kernels (kH, kW, I, O);
  * decoder Conv1d stacks (``df.0/2/4/6`` etc.) -> Dense kernels (I, O);
  * GroupNorm weight/bias -> scale/bias;
  * ConvBlock's ``downsample`` Sequential(bn4, ReLU, conv) aliases bn4 --
    ``downsample.0.*`` duplicates are ignored, ``downsample.2.weight`` is
    the projection conv.
"""
from __future__ import annotations

import numpy as np

# flax decoder module name -> torch attribute name (model/chore.py:49-55)
_DECODER_NAMES = {
    "df": "df",
    "pca": "pca_predictor",
    "parts": "part_predictor",
    "centers": "center_predictor",
}
# flax Dense layer name -> index in the torch nn.Sequential
# (make_decoder: Conv1d, ReLU, Conv1d, ReLU, Conv1d, ReLU, Conv1d)
_FC_INDEX = {"fc0": "0", "fc1": "2", "fc2": "4", "fc_out": "6"}


def _torch_key(path):
    """flax param path (tuple of names, leaf last) -> torch state-dict key."""
    *mods, leaf = path
    mods = list(mods)
    if mods and mods[0] in _DECODER_NAMES:
        mods[0] = _DECODER_NAMES[mods[0]]
        mods[1] = _FC_INDEX[mods[1]]
    if mods and mods[-1] == "downsample":
        mods[-1] = "downsample.2"
    suffix = {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]
    return ".".join(mods + [suffix])


def _convert_leaf(path, torch_arr, want_shape):
    leaf = path[-1]
    a = np.asarray(torch_arr, np.float32)
    if leaf == "kernel":
        if a.ndim == 4:  # conv2d (O, I, kH, kW) -> (kH, kW, I, O)
            a = a.transpose(2, 3, 1, 0)
        elif a.ndim == 3:  # conv1d (O, I, 1) -> Dense (I, O)
            a = a[..., 0].T
        elif a.ndim == 2:  # linear (O, I) -> (I, O)
            a = a.T
    if tuple(a.shape) != tuple(want_shape):
        raise ValueError(
            f"{'.'.join(path)}: torch shape {a.shape} != flax {want_shape}"
        )
    return a


def convert_state_dict(torch_sd, params_template):
    """Map a reference torch state dict onto a flax params pytree.

    Args:
      torch_sd: dict of name -> array-like (torch tensors or numpy).
      params_template: the target params pytree (from ``model.init``),
        used for structure and shape checking.

    Returns:
      (params, unused_keys): converted pytree + torch keys not consumed
      (loss-function buffers, downsample aliases, etc.).
    """
    import jax

    sd = {}
    for k, v in torch_sd.items():
        k = k[len("module."):] if k.startswith("module.") else k
        sd[k] = np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )

    flat = jax.tree_util.tree_flatten_with_path(params_template)[0]
    used = set()
    out = {}
    for keypath, leaf_val in flat:
        path = tuple(
            p.key if hasattr(p, "key") else str(p) for p in keypath
        )
        mod_path = path[1:] if path[0] == "params" else path
        tk = _torch_key(mod_path)
        if tk not in sd:
            raise KeyError(f"torch checkpoint missing {tk} (for {path})")
        out[path] = _convert_leaf(mod_path, sd[tk], np.shape(leaf_val))
        used.add(tk)

    def rebuild(path=()):
        children = {}
        for p, v in out.items():
            if p[: len(path)] == path:
                children.setdefault(p[len(path)], None)
        if not children:
            return out[path]
        return {
            k: out[path + (k,)] if path + (k,) in out else rebuild(path + (k,))
            for k in children
        }

    params = rebuild()
    unused = [k for k in sd if k not in used]
    return params, unused


def load_torch_checkpoint(path, params_template):
    """Load a reference ``checkpoint_*.tar`` (or bare state dict) file."""
    import torch

    data = torch.load(path, map_location="cpu")
    sd = data.get("model_state_dict", data) if isinstance(data, dict) else data
    return convert_state_dict(sd, params_template)


def _strip_ddp(sd):
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def _parameter_names(sd):
    """Model state-dict keys in ``model.parameters()`` order.

    torch.optim indexes parameters by their position in the iterable the
    optimizer was constructed with — ``model.parameters()`` in the
    reference (trainer/trainer.py:35). That order is the state-dict
    (registration) order with duplicate tensors removed: the only shared
    tensor in CHORE is ConvBlock's ``bn4``, re-registered as
    ``downsample.0`` (reference: model/net_util.py:357-371), and CHORE
    registers no buffers, so dropping the ``downsample.0`` alias keys
    reproduces the parameter order exactly (pinned by
    tests/test_torch_import.py::TestOptimizerImport).
    """
    return [k for k in sd if ".downsample.0." not in k]


def convert_optimizer_state(data, params_template):
    """Map a reference checkpoint's torch Adam ``optimizer_state_dict``
    onto optax adam moments (reference checkpoint layout:
    trainer/trainer.py:186-206; Adam ctor trainer.py:35).

    Args:
      data: the loaded ``.tar`` dict holding ``model_state_dict`` (needed
        for the index -> name mapping) and ``optimizer_state_dict``.
      params_template: target flax params pytree.

    Returns:
      (mu, nu, count, missing): ``exp_avg`` / ``exp_avg_sq`` pytrees shaped
      like ``params_template``, the global step count (max over params —
      optax keeps one count where torch keeps one per param), and the
      torch parameter names that had no Adam state (zero-initialized;
      DDP(find_unused_parameters=True) leaves never-used params without
      grads and torch.optim.Adam then never creates state for them).
    """
    sd = _strip_ddp(data["model_state_dict"])
    opt = data["optimizer_state_dict"]
    names = _parameter_names(sd)
    idx_order = [i for g in opt["param_groups"] for i in g["params"]]
    if len(idx_order) != len(names):
        raise ValueError(
            f"optimizer tracks {len(idx_order)} params but the model state "
            f"dict has {len(names)} parameter entries — architecture "
            "mismatch or unexpected buffers")

    def _np(v):
        return np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )

    mu_sd, nu_sd, missing, steps = {}, {}, [], [0]
    for name, idx in zip(names, idx_order):
        st = opt["state"].get(idx)
        if st is None:
            missing.append(name)
            z = np.zeros(_np(sd[name]).shape, np.float32)
            mu_sd[name], nu_sd[name] = z, z
        else:
            mu_sd[name] = _np(st["exp_avg"])
            nu_sd[name] = _np(st["exp_avg_sq"])
            steps.append(int(_np(st["step"])))
    # moments transform exactly like their parameters (elementwise stats),
    # so the weight converter maps them onto the flax tree
    mu, _ = convert_state_dict(mu_sd, params_template)
    nu, _ = convert_state_dict(nu_sd, params_template)
    return mu, nu, max(steps), missing
