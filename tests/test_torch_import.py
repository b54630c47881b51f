"""Tests for reference (torch) checkpoint import (train/torch_import.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chore_tpu.models import CHOREField, FieldConfig
from chore_tpu.train.torch_import import (
    _torch_key,
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
