"""Numerical forward parity against the actual reference torch CHORE.

Builds the reference model (reference: model/chore.py:10-190,
model/HGFilters.py:56-185) with random weights on CPU torch, imports its
state dict via train/torch_import.py, and asserts every decoder head of
every hourglass stack agrees with CHOREField at float32 tolerance on the
release shape (512^2 input, 5 stacks, out-of-image points included).

Green here proves the importer + architecture are numerically compatible:
running a released reference checkpoint at Chamfer parity becomes a pure
data problem (VERDICT round 1, item 2).
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "model")),
    reason="reference checkout not available",
)


class _Opt(dict):
    """Attribute + membership view of the release options (the reference's
    config objects support both ``opt.x`` and ``'x' in opt``,
    HGFilters.py:96, camera.py:16)."""

    __getattr__ = dict.__getitem__


# config/chore-release.json fields the model constructor reads
RELEASE = dict(
    num_stack=5, num_hourglass=2, norm="group", hg_down="ave_pool",
    hourglass_dim=256, skip_hourglass=True, input_type="RGBM3",
    z_feat="xyz", projection_mode="perspective", loadSize=1200,
    gpu_id="cpu",
)


def _stub_module(name):
    """Insert an empty stand-in for a dependency the reference imports at
    module scope but never touches on the forward path (e.g. skimage in
    mesh_util's marching cubes)."""
    import types

    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    parent, _, child = name.rpartition(".")
    if parent:
        _stub_module(parent)
        setattr(sys.modules[parent], child, mod)


@pytest.fixture(scope="module")
def torch_chore():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _stub_module("skimage.measure")
    # CPU-only torch: .cuda() must be a no-op (the reference hardcodes
    # .cuda(rank) on its loss modules, model/chore.py:58-61)
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self
    from model.chore import CHORE

    torch.manual_seed(0)
    model = CHORE(_Opt(RELEASE))
    model.train()  # keep ALL intermediate stacks (model/chore.py:93-96)
    return model


@pytest.fixture(scope="module")
def torch_chore_small():
    """2-stack reference model for the backward-pass comparison (same
    construction path as ``torch_chore``, smaller for CPU autodiff)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _stub_module("skimage.measure")
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self
    from model.chore import CHORE

    torch.manual_seed(3)
    model = CHORE(_Opt(dict(RELEASE, num_stack=2)))
    model.train()
    return model


def test_forward_parity_release_shape(torch_chore):
    from chore_tpu.models import CHOREField, FieldConfig
    from chore_tpu.train.torch_import import convert_state_dict

    cfg = FieldConfig()  # release: 5 stacks, 512^2, xyz z-feat
    model = CHOREField(cfg=cfg)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)),
        jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)),
    )
    params, unused = convert_state_dict(torch_chore.state_dict(), template)
    # permissible leftovers: the ConvBlock downsample.0 aliases of bn4,
    # and bn4 itself in equal-plane blocks where the reference constructs
    # it but never calls it (net_util.py:353-372); anything else is a
    # missed parameter
    assert all(".downsample.0." in k or ".bn4." in k for k in unused), unused

    rng = np.random.RandomState(0)
    imgs = rng.rand(1, 512, 512, 5).astype(np.float32)
    # spread beyond the frustum so the OUT_DIST path is exercised
    pts = (rng.rand(1, 400, 3) * [5.0, 5.0, 0.6] + [-2.5, -2.5, 1.9]).astype(
        np.float32
    )
    cc = np.array([[1018.0, 779.0]], np.float32)

    with torch.no_grad():
        torch_chore.filter(torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
        torch_chore.query(torch.from_numpy(pts), torch.from_numpy(cc))
        ref = [[np.asarray(t) for t in stack]
               for stack in torch_chore.intermediate_preds_list]
    assert len(ref) == cfg.num_stack

    preds = jax.jit(
        lambda p, i, x, c: model.apply(p, i, x, c, train=True)
    )(params, imgs, pts, cc)

    # both OUT_DIST and in-image branches must be live in this sample
    df0 = np.asarray(preds[0]["df"])
    assert (df0 == cfg.out_dist).any() and (df0 != cfg.out_dist).any()

    for s, (ours, theirs) in enumerate(zip(preds, ref)):
        df_t, pca_t, parts_t, centers_t = theirs  # torch channel-first
        kw = dict(rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(ours["df"]), df_t.transpose(0, 2, 1),
            err_msg=f"df stack {s}", **kw)
        np.testing.assert_allclose(
            np.asarray(ours["pca"]), pca_t.transpose(0, 3, 1, 2),
            err_msg=f"pca stack {s}", **kw)
        np.testing.assert_allclose(
            np.asarray(ours["parts"]), parts_t.transpose(0, 2, 1),
            err_msg=f"parts stack {s}", **kw)
        np.testing.assert_allclose(
            np.asarray(ours["centers"]), centers_t.transpose(0, 2, 1),
            err_msg=f"centers stack {s}", **kw)


def test_gradient_parity_full_train_step(torch_chore_small):
    """dL/dtheta parity against the actual reference torch model through
    the ENTIRE training path: encoder convs -> pixel-aligned query ->
    get_errors -> backward (reference: model/chore.py:176-242). Forward
    parity (above) proves the architectures match; green here proves the
    TRAINING SIGNAL matches -- both frameworks descend the same loss
    surface, so training from the same init follows the same trajectory
    up to optimizer numerics.

    Runs a 2-stack model at 128^2 with df_leak=0 (reproducing the
    reference's hard-clamp gradient exactly; the production leak=0.05 is
    a documented deviation that only differs where predictions overshoot
    the clamp).

    Tolerances are set at the measured f32 reduction-order noise floor:
    with both sides in float64 the two gradients agree to median 4e-8 /
    max 7e-8 (normalized per leaf) and losses to 1.4e-10 -- the math is
    identical -- while float32 torch itself differs from float64 torch
    by up to 4.5e-3 on conv leaves (different accumulation order in the
    conv backward). This check already caught a real systematic bug:
    flax GroupNorm's default epsilon (1e-6) vs torch's 1e-5
    (models/layers.py group_norm pins 1e-5)."""
    import dataclasses

    from chore_tpu.models import CHOREField, FieldConfig, chore_losses
    from chore_tpu.train.torch_import import convert_state_dict

    tmodel = torch_chore_small
    cfg = dataclasses.replace(FieldConfig(num_stack=2), df_leak=0.0)
    model = CHOREField(cfg=cfg)

    rng = np.random.RandomState(7)
    B, N, S = 1, 200, 128
    imgs = rng.rand(B, S, S, 5).astype(np.float32)
    # mostly in-frustum, a few outside (OUT_DIST branch carries zero grad
    # on both sides)
    pts = (rng.rand(B, N, 3) * [3.0, 3.0, 0.6] + [-1.5, -1.5, 1.9]).astype(
        np.float32
    )
    cc = np.array([[1018.0, 779.0]], np.float32)
    batch = {
        "df_h": (rng.rand(B, N) * 0.2).astype(np.float32),
        "df_o": (rng.rand(B, N) * 0.2).astype(np.float32),
        "parts": rng.randint(0, 14, (B, N)),
        "pca": rng.randn(B, N, 3, 3).astype(np.float32),
        "body_center": rng.randn(B, 3).astype(np.float32),
        "obj_center": rng.randn(B, 3).astype(np.float32),
    }

    # --- torch reference: forward + backward --------------------------
    tmodel.zero_grad()
    err_t, _ = tmodel.forward(
        torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
        torch.from_numpy(pts),
        torch.from_numpy(batch["df_h"]),
        torch.from_numpy(batch["df_o"]),
        torch.from_numpy(batch["parts"]).long(),
        torch.from_numpy(batch["pca"].transpose(0, 2, 3, 1)),
        body_center=torch.from_numpy(batch["body_center"]),
        max_dist=cfg.clamp_thres,
        obj_center=torch.from_numpy(batch["obj_center"])[..., None],
        crop_center=torch.from_numpy(cc),
    )
    err_t.backward()
    grad_sd = {
        k: (p.grad.numpy() if p.grad is not None
            else np.zeros(tuple(p.shape), np.float32))
        for k, p in tmodel.named_parameters()
    }

    # --- ours: same weights, jax.grad of the same loss ----------------
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)),
        jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)),
    )
    params, _ = convert_state_dict(tmodel.state_dict(), template)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}

    def loss_fn(p):
        preds = model.apply(p, jnp.asarray(imgs), jnp.asarray(pts),
                            jnp.asarray(cc), train=True)
        return chore_losses(preds, batch_j, cfg)[0]

    err_j, grads_j = jax.jit(jax.value_and_grad(loss_fn))(params)
    np.testing.assert_allclose(float(err_j), float(err_t), rtol=1e-4)

    # torch grads mapped through the SAME converter (grad of a reshaped/
    # transposed parameter transforms identically to the parameter)
    grads_t, _ = convert_state_dict(grad_sd, grads_j)

    flat_j = jax.tree_util.tree_flatten_with_path(grads_j)[0]
    flat_t = dict(jax.tree_util.tree_flatten_with_path(grads_t)[0])
    checked, sq_err, sq_norm = 0, 0.0, 0.0
    for keypath, gj in flat_j:
        gt = np.asarray(flat_t[keypath])
        gj = np.asarray(gj)
        name = jax.tree_util.keystr(keypath)
        scale = max(np.abs(gt).max(), np.abs(gj).max(), 1e-12)
        # per-leaf: within the measured f32 noise band (see docstring)
        assert np.abs(gj - gt).max() / scale < 2.5e-2, (
            f"gradient mismatch at {name}: "
            f"{np.abs(gj - gt).max() / scale:.3e} normalized")
        sq_err += float(((gj - gt) ** 2).sum())
        sq_norm += float((gt ** 2).sum())
        checked += 1
    assert checked > 100  # every conv/norm/decoder leaf was compared
    # whole-gradient direction: relative L2 over all 10M+ coordinates
    assert np.sqrt(sq_err / sq_norm) < 3e-3, np.sqrt(sq_err / sq_norm)


def test_loss_parity_get_errors(torch_chore):
    """chore_losses reproduces the reference CHORE.get_errors term by term
    (reference: model/chore.py:193-242) on synthetic predictions below the
    clamp threshold, where our documented leaky-clip deviation coincides
    exactly with the reference's hard clamp."""
    from chore_tpu.models import FieldConfig, chore_losses

    cfg = FieldConfig(num_stack=2)
    rng = np.random.RandomState(1)
    # B=1: at B>1 the reference's obj-center term broadcasts its (B,3,N)
    # error against a (B,1,1,N) mask into (B,B,3,N) -- cross-example
    # mask/error mixing (model/chore.py:218-220), a latent reference bug
    # that its release training (per-GPU batches) silently averages in.
    # Our per-example formulation is the intended math; parity is asserted
    # where the two coincide.
    B, N = 1, 300
    clamp = cfg.clamp_thres  # 0.1 (config clamp_thres)

    preds_list, torch_preds = [], []
    for _ in range(cfg.num_stack):
        df = rng.rand(B, N, 2).astype(np.float32) * 0.09  # below clamp
        pca = rng.randn(B, N, 3, 3).astype(np.float32)
        parts = rng.randn(B, N, 14).astype(np.float32)
        centers = rng.randn(B, N, 6).astype(np.float32)
        preds_list.append({
            "df": jnp.asarray(df), "pca": jnp.asarray(pca),
            "parts": jnp.asarray(parts), "centers": jnp.asarray(centers),
        })
        torch_preds.append((
            torch.from_numpy(df.transpose(0, 2, 1)),
            torch.from_numpy(pca.transpose(0, 2, 3, 1)),
            torch.from_numpy(parts.transpose(0, 2, 1)),
            torch.from_numpy(centers.transpose(0, 2, 1)),
        ))

    batch = {
        "df_h": rng.rand(B, N).astype(np.float32) * 0.2,
        "df_o": rng.rand(B, N).astype(np.float32) * 0.2,
        "parts": rng.randint(0, 14, (B, N)),
        "pca": rng.randn(B, N, 3, 3).astype(np.float32),
        "body_center": rng.randn(B, 3).astype(np.float32),
        "obj_center": rng.randn(B, 3).astype(np.float32),
    }

    torch_chore.intermediate_preds_list = torch_preds
    with torch.no_grad():
        err_t, losses_t = torch_chore.get_errors(
            torch.from_numpy(batch["df_h"]),
            torch.from_numpy(batch["df_o"]),
            torch.from_numpy(batch["parts"]).long(),
            torch.from_numpy(batch["pca"].transpose(0, 2, 3, 1)),
            clamp,
            torch.from_numpy(batch["body_center"]),
            torch.from_numpy(batch["obj_center"])[..., None],
        )

    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    err_j, parts_j = chore_losses(preds_list, batch_j, cfg)

    np.testing.assert_allclose(float(err_j), float(err_t), rtol=1e-5)
    ours_by_ref_order = [parts_j["df_h"], parts_j["df_o"], parts_j["parts"],
                         parts_j["pca"], parts_j["smpl_center"],
                         parts_j["obj_center"]]
    np.testing.assert_allclose(
        np.asarray([float(v) for v in ours_by_ref_order]),
        losses_t.numpy(), rtol=1e-4,
        err_msg="per-term losses [df_h, df_o, parts, pca, smpl_c, obj_c]")
