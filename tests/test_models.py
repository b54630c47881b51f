"""Field network tests: shapes, bicubic parity with torch, loss semantics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chore_tpu.models import (
    CHOREField,
    ConvBlock,
    FieldConfig,
    HGFilter,
    bicubic_upsample_2x,
    chore_losses,
)

TINY = FieldConfig(num_stack=2, num_hourglass=2, net_img_size=64)


@pytest.fixture(scope="module")
def field_model():
    model = CHOREField(cfg=TINY)
    rng = jax.random.PRNGKey(0)
    images = jnp.zeros((1, 64, 64, 5))
    points = jnp.zeros((1, 16, 3))
    cc = jnp.zeros((1, 2))
    params = model.init(rng, images, points, cc)
    return model, params


class TestBicubic:
    def test_matches_torch_interpolate(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.randn(2, 8, 6, 3).astype(np.float32)
        ours = bicubic_upsample_2x(jnp.asarray(x))
        t = torch.tensor(x).permute(0, 3, 1, 2)
        theirs = torch.nn.functional.interpolate(
            t, scale_factor=2, mode="bicubic", align_corners=True
        ).permute(0, 2, 3, 1).numpy()
        assert np.allclose(ours, theirs, atol=1e-5)


class TestConvBlock:
    def test_shapes_same_and_projected(self, rng):
        x = jnp.asarray(rng.randn(1, 8, 8, 64).astype(np.float32))
        blk = ConvBlock(64, 128)
        params = blk.init(jax.random.PRNGKey(0), x)
        y = blk.apply(params, x)
        assert y.shape == (1, 8, 8, 128)
        x2 = jnp.asarray(rng.randn(1, 8, 8, 128).astype(np.float32))
        blk2 = ConvBlock(128, 128)
        params2 = blk2.init(jax.random.PRNGKey(0), x2)
        y2 = blk2.apply(params2, x2)
        assert y2.shape == (1, 8, 8, 128)
        # identity-channel block has no projection branch
        assert "downsample" not in params2["params"]


class TestHGFilter:
    def test_output_shapes(self, rng):
        x = jnp.asarray(rng.randn(1, 64, 64, 5).astype(np.float32))
        hg = HGFilter(num_stack=2, depth=2)
        params = hg.init(jax.random.PRNGKey(0), x)
        outs, tmpx, normx = hg.apply(params, x)
        assert len(outs) == 2
        assert outs[0].shape == (1, 16, 16, 256)  # H/4
        assert tmpx.shape == (1, 32, 32, 64)  # H/2 stem
        assert normx.shape == (1, 16, 16, 128)

    def test_eval_keeps_last_stack_only(self, rng):
        x = jnp.asarray(rng.randn(1, 64, 64, 5).astype(np.float32))
        hg = HGFilter(num_stack=3, depth=2)
        params = hg.init(jax.random.PRNGKey(0), x)
        outs, _, _ = hg.apply(params, x, train=False)
        assert len(outs) == 1

    def test_tmpx_is_stop_gradiented(self, rng):
        x = jnp.asarray(rng.randn(1, 64, 64, 5).astype(np.float32))
        hg = HGFilter(num_stack=1, depth=2)
        params = hg.init(jax.random.PRNGKey(0), x)

        def loss(p):
            _, tmpx, _ = hg.apply(p, x)
            return jnp.sum(tmpx**2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.allclose(l, 0.0) for l in leaves)


class TestHGFilterGConv:
    """grouped_heads=True is the HGFilterGConv variant (reference:
    model/HGFilters.py:187-312): l/bl/al become depthwise 1x1 convs."""

    def test_shapes_and_param_tree_names(self, rng):
        x = jnp.asarray(rng.randn(1, 32, 32, 5).astype(np.float32))
        hg = HGFilter(num_stack=2, depth=1, features=8, out_dim=8,
                      grouped_heads=True)
        params = hg.init(jax.random.PRNGKey(0), x)
        outs, tmpx, normx = hg.apply(params, x)
        assert len(outs) == 2 and outs[0].shape == (1, 8, 8, 8)
        # same module names as HGFilter; only the head kernels shrink
        dense = HGFilter(num_stack=2, depth=1, features=8,
                         out_dim=8).init(jax.random.PRNGKey(0), x)
        assert set(params["params"]) == set(dense["params"])
        assert params["params"]["l0"]["kernel"].shape == (1, 1, 1, 8)
        assert dense["params"]["l0"]["kernel"].shape == (1, 1, 8, 8)

    def test_head_is_depthwise(self, rng):
        # groups == channels: output channel c of l{i} must depend ONLY on
        # input channel c (reference HGFilters.py:251-255 groups=256).
        import flax.linen as nn
        from chore_tpu.models.layers import conv_init
        conv = nn.Conv(8, (1, 1), feature_group_count=8,
                       kernel_init=conv_init)
        x = jnp.asarray(rng.randn(1, 4, 4, 8).astype(np.float32))
        p = conv.init(jax.random.PRNGKey(1), x)
        base = conv.apply(p, x)
        bumped = conv.apply(p, x.at[..., 3].add(1.0))
        changed = np.abs(np.asarray(bumped - base)).sum(axis=(0, 1, 2)) > 0
        assert changed.tolist() == [False] * 3 + [True] + [False] * 4

    def test_out_dim_must_tile_features(self):
        hg = HGFilter(num_stack=1, depth=1, features=8, out_dim=12,
                      grouped_heads=True)
        x = jnp.zeros((1, 16, 16, 5))
        with pytest.raises(ValueError, match="grouped_heads"):
            hg.init(jax.random.PRNGKey(0), x)


class TestCHOREField:
    def test_forward_shapes(self, field_model, rng):
        model, params = field_model
        images = jnp.asarray(rng.randn(1, 64, 64, 5).astype(np.float32))
        points = jnp.asarray(
            (rng.rand(1, 16, 3) * 0.5 + [[-0.25, -0.25, 2.0]]).astype(np.float32)
        )
        cc = jnp.asarray(np.array([[1018.0, 779.0]], np.float32))
        preds_list = model.apply(params, images, points, cc)
        assert len(preds_list) == 2
        p = preds_list[0]
        assert p["df"].shape == (1, 16, 2)
        assert p["pca"].shape == (1, 16, 3, 3)
        assert p["parts"].shape == (1, 16, 14)
        assert p["centers"].shape == (1, 16, 6)

    def test_uint8_images_match_float(self, field_model, rng):
        """uint8 input (the training transport) is normalized on device and
        must reproduce the float /255 path bitwise."""
        model, params = field_model
        img_u8 = rng.randint(0, 256, (1, 64, 64, 5)).astype(np.uint8)
        points = jnp.asarray(
            (rng.rand(1, 16, 3) * 0.5 + [[-0.25, -0.25, 2.0]]).astype(np.float32)
        )
        cc = jnp.asarray(np.array([[1018.0, 779.0]], np.float32))
        p_f = model.apply(
            params, jnp.asarray(img_u8.astype(np.float32) / 255.0),
            points, cc)
        p_u = model.apply(params, jnp.asarray(img_u8), points, cc)
        for f, u in zip(p_f, p_u):
            for k in f:
                np.testing.assert_array_equal(np.asarray(f[k]),
                                              np.asarray(u[k]), err_msg=k)

    def test_out_of_image_points_get_out_dist(self, field_model):
        model, params = field_model
        images = jnp.zeros((1, 64, 64, 5))
        # a point far to the side projects out of the crop
        points = jnp.asarray(np.array([[[50.0, 0.0, 2.2]]], np.float32))
        cc = jnp.asarray(np.array([[1018.0, 779.0]], np.float32))
        preds_list = model.apply(params, images, points, cc)
        assert np.allclose(preds_list[-1]["df"][0, 0], 5.0)

    def test_losses_structure_and_grads(self, field_model, rng):
        model, params = field_model
        B, N = 1, 64
        images = jnp.asarray(rng.randn(B, 64, 64, 5).astype(np.float32))
        points = jnp.asarray(
            (rng.randn(B, N, 3) * 0.2 + [[0, 0, 2.2]]).astype(np.float32)
        )
        cc = jnp.asarray(np.tile([[1018.0, 779.0]], (B, 1)).astype(np.float32))
        batch = {
            "df_h": jnp.asarray(np.abs(rng.randn(B, N)).astype(np.float32) * 0.05),
            "df_o": jnp.asarray(np.abs(rng.randn(B, N)).astype(np.float32) * 0.05),
            "parts": jnp.asarray(rng.randint(0, 14, (B, N))),
            "pca": jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))),
            "body_center": jnp.asarray(np.array([[0, 0, 2.2]], np.float32)),
            "obj_center": jnp.asarray(np.array([[0.3, 0, 0]], np.float32)),
        }

        def loss_fn(p):
            preds = model.apply(p, images, points, cc)
            total, parts = chore_losses(preds, batch, TINY)
            return total, parts

        (total, parts), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        assert np.isfinite(float(total))
        assert set(parts.keys()) == {
            "df_h", "df_o", "parts", "pca", "smpl_center", "obj_center"
        }
        gnorm = sum(jnp.sum(l**2) for l in jax.tree_util.tree_leaves(g))
        assert float(gnorm) > 0

    def test_compact_pca_gt_matches_tiled(self, rng):
        """The compact (B,3,3) pca GT (the dataset's transport form) must
        give bitwise the same loss as the tiled (B,N,3,3) form."""
        B, N = 2, 16
        preds = [{
            "df": jnp.asarray(np.abs(rng.randn(B, N, 2)).astype(np.float32)),
            "pca": jnp.asarray(rng.randn(B, N, 3, 3).astype(np.float32)),
            "parts": jnp.asarray(rng.randn(B, N, 14).astype(np.float32)),
            "centers": jnp.asarray(rng.randn(B, N, 6).astype(np.float32)),
        }]
        pca_gt = rng.randn(B, 3, 3).astype(np.float32)
        base = {
            "df_h": jnp.asarray(np.abs(rng.randn(B, N)).astype(np.float32) * 0.05),
            "df_o": jnp.asarray(np.abs(rng.randn(B, N)).astype(np.float32) * 0.05),
            "parts": jnp.asarray(rng.randint(0, 14, (B, N))),
            "body_center": jnp.asarray(np.tile([[0, 0, 2.2]], (B, 1)).astype(np.float32)),
            "obj_center": jnp.asarray(np.tile([[0.3, 0, 0]], (B, 1)).astype(np.float32)),
        }
        t_tiled, _ = chore_losses(
            preds, dict(base, pca=jnp.asarray(np.tile(pca_gt[:, None], (1, N, 1, 1)))),
            TINY)
        t_compact, _ = chore_losses(preds, dict(base, pca=jnp.asarray(pca_gt)),
                                    TINY)
        assert float(t_tiled) == float(t_compact)

    def test_loss_zero_when_perfect(self):
        # hand-built preds equal to GT must produce ~zero loss
        B, N = 1, 8
        preds = [{
            "df": jnp.full((B, N, 2), 0.02),
            "pca": jnp.tile(jnp.eye(3), (B, N, 1, 1)),
            "parts": jnp.full((B, N, 14), -100.0).at[..., 3].set(100.0),
            "centers": jnp.concatenate(
                [jnp.tile(jnp.array([0.0, 0, 2.2]), (B, N, 1)),
                 jnp.tile(jnp.array([0.3, 0, 0.0]), (B, N, 1))], axis=-1
            ),
        }]
        batch = {
            "df_h": jnp.full((B, N), 0.02),
            "df_o": jnp.full((B, N), 0.02),
            "parts": jnp.full((B, N), 3, dtype=jnp.int32),
            "pca": jnp.tile(jnp.eye(3), (B, N, 1, 1)),
            "body_center": jnp.array([[0.0, 0, 2.2]]),
            "obj_center": jnp.array([[0.3, 0, 0.0]]),
        }
        total, parts = chore_losses(preds, batch, TINY)
        assert float(total) < 1e-5


class TestMixedPrecision:
    def test_bf16_encoder_close_to_f32(self, field_model):
        """The mixed-precision path (bf16 encoder, f32 norms+heads) must
        track the f32 path closely enough for the 0.004-level df filtering."""
        model32, params = field_model
        model16 = CHOREField(cfg=TINY, encoder_dtype=jnp.bfloat16)
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.rand(2, 64, 64, 5).astype(np.float32))
        points = jnp.asarray(
            (rng.rand(2, 64, 3) * [2, 2, 0.5] + [-1, -1, 1.95]).astype(
                np.float32
            )
        )
        cc = jnp.asarray(np.tile([[1018.0, 779.0]], (2, 1)).astype(np.float32))
        p32 = model32.apply(params, images, points, cc, train=False)[-1]
        p16 = model16.apply(params, images, points, cc, train=False)[-1]
        assert p16["df"].dtype == jnp.float32  # heads stay f32
        scale = float(jnp.abs(p32["df"]).mean())
        err = float(jnp.abs(p16["df"] - p32["df"]).max())
        assert err < 0.05 * max(scale, 1.0), (err, scale)
        # part argmax labels essentially unchanged
        agree = (p16["parts"].argmax(-1) == p32["parts"].argmax(-1)).mean()
        assert float(agree) > 0.95


class TestRemat:
    """remat=True must be a pure memory/FLOPs trade: identical parameter
    tree (checkpoint compat) and identical outputs/gradients."""

    @pytest.mark.slow  # ~1.5 min; remat equivalence is an invariant
    # only touched when the encoder changes
    def test_same_tree_and_outputs(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from chore_tpu.models import CHOREField, FieldConfig, chore_losses

        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.rand(1, 64, 64, 5).astype(np.float32))
        points = jnp.asarray(
            (rng.rand(1, 32, 3) * [2, 2, 0.5] + [-1, -1, 1.95]).astype(
                np.float32))
        cc = jnp.asarray(np.array([[1018.0, 779.0]], np.float32))
        batch = {
            "images": images, "points": points, "crop_center": cc,
            "df_h": jnp.zeros((1, 32)), "df_o": jnp.zeros((1, 32)),
            "parts": jnp.zeros((1, 32), jnp.int32),
            "pca": jnp.tile(jnp.eye(3), (1, 32, 1, 1)),
            "body_center": jnp.asarray([[0.0, 0, 2.2]]),
            "obj_center": jnp.asarray([[0.3, 0, 0.0]]),
        }

        outs, grads = [], []
        params0 = None
        for remat in (False, True):
            cfg = FieldConfig(num_stack=2, num_hourglass=2, net_img_size=64,
                              remat=remat)
            model = CHOREField(cfg=cfg)
            params = model.init(jax.random.PRNGKey(0), images, points, cc)
            if params0 is None:
                params0 = params
            assert (jax.tree_util.tree_structure(params)
                    == jax.tree_util.tree_structure(params0))

            def loss(p):
                return chore_losses(model.apply(
                    p, images, points, cc), batch, cfg)[0]

            outs.append(np.asarray(model.apply(params0, images, points, cc
                                               )[-1]["df"]))
            grads.append(np.asarray(jax.tree_util.tree_leaves(
                jax.grad(loss)(params0))[0]))
        np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)
        np.testing.assert_allclose(grads[0], grads[1], rtol=1e-5, atol=1e-7)
