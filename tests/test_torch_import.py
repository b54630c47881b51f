"""Tests for reference (torch) checkpoint import (train/torch_import.py)."""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"

from chore_tpu.models import CHOREField, FieldConfig
from chore_tpu.train.torch_import import (
    _parameter_names,
    _torch_key,
    convert_optimizer_state,
    convert_state_dict,
)

TINY = FieldConfig(num_stack=2, num_hourglass=2, net_img_size=64)


@pytest.fixture(scope="module")
def template():
    model = CHOREField(cfg=TINY)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)),
        jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)),
    )
    return model, params


class TestNameMapping:
    """Spot-check against the reference's actual module names
    (model/chore.py:49-55, HGFilters.py:14-24,115-142, net_util.py:346-371)."""

    def test_known_names(self):
        assert _torch_key(("image_filter", "conv1", "kernel")) == \
            "image_filter.conv1.weight"
        assert _torch_key(("image_filter", "bn1", "scale")) == \
            "image_filter.bn1.weight"
        assert _torch_key(("image_filter", "m0", "b1_2", "conv1", "kernel")) \
            == "image_filter.m0.b1_2.conv1.weight"
        assert _torch_key(("image_filter", "conv2", "downsample", "kernel")) \
            == "image_filter.conv2.downsample.2.weight"
        assert _torch_key(("df", "fc0", "kernel")) == "df.0.weight"
        assert _torch_key(("df", "fc_out", "bias")) == "df.6.bias"
        assert _torch_key(("parts", "fc1", "kernel")) == \
            "part_predictor.2.weight"
        assert _torch_key(("centers", "fc2", "kernel")) == \
            "center_predictor.4.weight"
        assert _torch_key(("pca", "fc0", "kernel")) == "pca_predictor.0.weight"


def _synth_torch_sd(params, rng):
    """Torch-layout state dict with the right names/shapes for the tree."""
    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for keypath, leaf in flat:
        path = tuple(p.key for p in keypath)
        mod_path = path[1:] if path[0] == "params" else path
        tk = _torch_key(mod_path)
        shape = np.shape(leaf)
        if mod_path[-1] == "kernel":
            if len(shape) == 4:  # (kh, kw, I, O) -> (O, I, kh, kw)
                arr = rng.randn(shape[3], shape[2], shape[0], shape[1])
            else:  # dense (I, O) -> conv1d (O, I, 1)
                arr = rng.randn(shape[1], shape[0], 1)
        else:
            arr = rng.randn(*shape)
        sd[tk] = arr.astype(np.float32)
    return sd


class TestFullTreeConversion:
    def test_roundtrip_and_forward(self, template):
        model, params = template
        rng = np.random.RandomState(0)
        sd = _synth_torch_sd(params, rng)
        # DDP prefix + a stray buffer must be tolerated
        sd = {f"module.{k}": v for k, v in sd.items()}
        sd["module.loss_weights_buf"] = np.zeros(6, np.float32)

        converted, unused = convert_state_dict(sd, params)
        assert unused == ["loss_weights_buf"]
        # identical tree structure
        assert (jax.tree_util.tree_structure(converted)
                == jax.tree_util.tree_structure(params))
        for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(converted)[0],
        ):
            assert np.shape(a) == np.shape(b), ka

        # converted params drive the model
        images = jnp.asarray(rng.rand(1, 64, 64, 5).astype(np.float32))
        points = jnp.asarray(
            (rng.rand(1, 16, 3) * [2, 2, 0.5] + [-1, -1, 1.95]).astype(
                np.float32
            )
        )
        cc = jnp.asarray(np.array([[1018.0, 779.0]], np.float32))
        preds = model.apply(converted, images, points, cc, train=False)
        assert np.isfinite(np.asarray(preds[-1]["df"])).all()

    def test_missing_key_raises(self, template):
        _, params = template
        with pytest.raises(KeyError):
            convert_state_dict({}, params)


class TestNumericEquivalence:
    """Converted layers reproduce torch outputs exactly."""

    def test_decoder_stack_matches_torch(self):
        torch = pytest.importorskip("torch")
        tnn = torch.nn
        dec = tnn.Sequential(
            tnn.Conv1d(23, 16, 1), tnn.ReLU(),
            tnn.Conv1d(16, 16, 1), tnn.ReLU(),
            tnn.Conv1d(16, 16, 1), tnn.ReLU(),
            tnn.Conv1d(16, 2, 1),
        )
        x = np.random.RandomState(1).randn(1, 23, 50).astype(np.float32)
        with torch.no_grad():
            want = dec(torch.tensor(x)).numpy()  # (1, 2, 50)

        from chore_tpu.models.chore import Decoder

        fdec = Decoder(hidden=16, out=2)
        template = fdec.init(jax.random.PRNGKey(0), jnp.zeros((1, 50, 23)))
        sd = {f"df.{k}": v for k, v in dec.state_dict().items()}
        wrapped = {"params": {"df": template["params"]}}
        conv, _ = convert_state_dict(sd, wrapped)
        got = fdec.apply(
            {"params": conv["params"]["df"]},
            jnp.asarray(x.transpose(0, 2, 1)),
        )  # (1, 50, 2)
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 2, 1), want, atol=2e-5
        )

    def test_conv_groupnorm_matches_torch(self):
        torch = pytest.importorskip("torch")
        tnn = torch.nn
        conv = tnn.Conv2d(8, 16, 3, padding=1, bias=True)
        gn = tnn.GroupNorm(4, 16)
        with torch.no_grad():
            gn.weight.mul_(1.7).add_(0.1)
            gn.bias.add_(0.3)
        x = np.random.RandomState(2).randn(2, 8, 10, 12).astype(np.float32)
        with torch.no_grad():
            want = gn(conv(torch.tensor(x))).numpy()

        import flax.linen as nn

        class Mini(nn.Module):
            @nn.compact
            def __call__(self, y):
                y = nn.Conv(16, (3, 3), padding=1, name="c")(y)
                return nn.GroupNorm(num_groups=4, name="g")(y)

        m = Mini()
        template = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 10, 12, 8)))
        sd = {
            "c.weight": conv.weight.detach().numpy(),
            "c.bias": conv.bias.detach().numpy(),
            "g.weight": gn.weight.detach().numpy(),
            "g.bias": gn.bias.detach().numpy(),
        }
        conv_params, _ = convert_state_dict(sd, template)
        got = m.apply(conv_params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-4
        )


class TestOptimizerImport:
    """Adam-state import (convert_optimizer_state + Trainer.import_torch):
    reference torch Adam moments land on the right flax leaves and optax
    continues the exact torch trajectory."""

    def test_adam_trajectory_matches_torch(self):
        """Identical gradient sequences through torch.optim.Adam and the
        trainer's optax chain (inject_hyperparams(adam)) produce identical
        parameter trajectories, including an LR change mid-run (the
        MultiStepLR analogue, reference: trainer/trainer.py:35,41)."""
        torch = pytest.importorskip("torch")
        import optax

        rng = np.random.RandomState(0)
        p0 = rng.randn(7, 5).astype(np.float32) * 0.05
        grads = [
            (rng.randn(7, 5) * 10.0 ** rng.uniform(-3, 1)).astype(np.float32)
            for _ in range(6)
        ]

        tp = torch.nn.Parameter(torch.tensor(p0))
        topt = torch.optim.Adam([tp], lr=1e-3)
        tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
        jp = jnp.asarray(p0)
        state = tx.init(jp)
        for i, g in enumerate(grads):
            lr = 1e-3 if i < 3 else 3e-4  # milestone LR drop mid-run
            for grp in topt.param_groups:
                grp["lr"] = lr
            state.hyperparams["learning_rate"] = jnp.asarray(lr)
            tp.grad = torch.tensor(g)
            topt.step()
            updates, state = tx.update(jnp.asarray(g), state, jp)
            jp = optax.apply_updates(jp, updates)
            np.testing.assert_allclose(
                np.asarray(jp), tp.detach().numpy(), atol=2e-7, rtol=0,
                err_msg=f"step {i}")

    @pytest.fixture(scope="class")
    def torch_chore_opt(self):
        """Small reference CHORE + torch Adam with populated state (two
        steps on synthetic grads; no forward needed — the optimizer only
        sees .grad)."""
        torch = pytest.importorskip("torch")
        if not os.path.isdir(os.path.join(REF, "model")):
            pytest.skip("reference checkout not available")
        from tests.test_torch_parity import RELEASE, _Opt, _stub_module

        if REF not in sys.path:
            sys.path.insert(0, REF)
        _stub_module("skimage.measure")
        torch.nn.Module.cuda = lambda self, *a, **k: self
        torch.Tensor.cuda = lambda self, *a, **k: self
        from model.chore import CHORE

        torch.manual_seed(11)
        model = CHORE(_Opt(dict(RELEASE, num_stack=1)))
        opt = torch.optim.Adam(model.parameters(), lr=1e-3)
        g = torch.Generator().manual_seed(5)
        for _ in range(2):
            for p in model.parameters():
                p.grad = torch.randn(p.shape, generator=g) * 0.1
            opt.step()
        return model, opt

    def test_parameter_name_order(self, torch_chore_opt):
        """The crisp invariant behind the index mapping: state-dict keys
        minus the ConvBlock downsample.0 alias == named_parameters order
        (reference: model/net_util.py:357-371)."""
        model, _ = torch_chore_opt
        assert _parameter_names(model.state_dict()) == [
            n for n, _ in model.named_parameters()
        ]

    @pytest.mark.slow  # ~1 min torch+jax double trajectory oracle
    def test_resume_continues_torch_trajectory(self, torch_chore_opt,
                                               tmp_path):
        """Save a reference-layout .tar, Trainer.import_torch it, then take
        ONE more step with the SAME gradients on both sides: parameters
        must stay identical. Wrong moment placement (ordering bug), wrong
        step count (bias correction) or a formula mismatch would all
        diverge here."""
        torch = pytest.importorskip("torch")
        import optax

        from chore_tpu.train.trainer import Trainer

        model, opt = torch_chore_opt
        tar = tmp_path / "checkpoint_0h:1m:0s_60.0.tar"
        torch.save(
            {
                "model_state_dict": {
                    f"module.{k}": v for k, v in model.state_dict().items()
                },
                "optimizer_state_dict": opt.state_dict(),
                "epoch": 7,
                "training_time": 60.0,
            },
            tar,
        )

        cfg = FieldConfig(num_stack=1)
        jmodel = CHOREField(cfg=cfg)
        params = jmodel.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)),
            jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)),
        )
        trainer = Trainer(jmodel, params, str(tmp_path), base_lr=1e-3)
        trainer.import_torch(str(tar))
        assert trainer.epoch == 7
        assert trainer.training_time == 60.0
        # metrics/profiler/checkpoint timeline continues from the imported
        # optimizer trajectory, not from 0
        assert trainer.global_step >= 2

        # the shared extra gradient, as torch name -> array
        g = torch.Generator().manual_seed(99)
        grads_sd = {
            n: torch.randn(p.shape, generator=g) * 0.1
            for n, p in model.named_parameters()
        }
        for n, p in model.named_parameters():
            p.grad = grads_sd[n]
        opt.step()
        want, _ = convert_state_dict(
            model.state_dict(), jax.device_get(trainer.params))

        grads_j, _ = convert_state_dict(
            {k: v.numpy() for k, v in grads_sd.items()},
            jax.device_get(trainer.params))
        updates, _ = trainer.tx.update(
            grads_j, jax.device_get(trainer.opt_state), trainer.params)
        got = optax.apply_updates(trainer.params, updates)

        flat_w = jax.tree_util.tree_flatten_with_path(want)[0]
        flat_g = dict(jax.tree_util.tree_flatten_with_path(jax.device_get(got))[0])
        for keypath, w in flat_w:
            np.testing.assert_allclose(
                np.asarray(flat_g[keypath]), np.asarray(w), atol=1e-6,
                rtol=0, err_msg=jax.tree_util.keystr(keypath))

    def test_missing_state_zero_filled(self, torch_chore_opt):
        """Params the torch optimizer never stepped (DDP
        find_unused_parameters leaves them grad-less) import as zero
        moments and are reported."""
        torch = pytest.importorskip("torch")
        model, opt = torch_chore_opt
        sd = opt.state_dict()
        # drop the state of parameter index 0 (as if it was never stepped)
        state = {k: v for k, v in sd["state"].items() if k != 0}
        data = {
            "model_state_dict": model.state_dict(),
            "optimizer_state_dict": {
                "state": state,
                "param_groups": sd["param_groups"],
            },
        }
        cfg = FieldConfig(num_stack=1)
        jmodel = CHOREField(cfg=cfg)
        template = jmodel.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)),
            jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)),
        )
        mu, nu, count, missing = convert_optimizer_state(data, template)
        # >= 2: the class-scoped optimizer may have taken extra steps in
        # the trajectory test before this one
        assert count >= 2
        name0 = _parameter_names(model.state_dict())[0]
        assert missing == [name0]
        # the zero-filled leaf really is zero; every other mu leaf nonzero
        flat_mu = jax.tree_util.tree_flatten_with_path(mu)[0]
        zeros = [jax.tree_util.keystr(kp) for kp, v in flat_mu
                 if not np.any(np.asarray(v))]
        assert len(zeros) == 1

    def test_param_count_mismatch_raises(self, torch_chore_opt):
        torch = pytest.importorskip("torch")
        model, opt = torch_chore_opt
        sd = opt.state_dict()
        bad_groups = [dict(sd["param_groups"][0])]
        bad_groups[0]["params"] = bad_groups[0]["params"][:-1]
        data = {
            "model_state_dict": model.state_dict(),
            "optimizer_state_dict": {
                "state": sd["state"],
                "param_groups": bad_groups,
            },
        }
        cfg = FieldConfig(num_stack=1)
        jmodel = CHOREField(cfg=cfg)
        template = jmodel.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)),
            jnp.zeros((1, 8, 3)), jnp.zeros((1, 2)),
        )
        with pytest.raises(ValueError, match="architecture mismatch"):
            convert_optimizer_state(data, template)
