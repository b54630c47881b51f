"""Stacked-hourglass image encoder.

Flax re-implementation of the reference HGFilter/HourGlass (reference:
model/HGFilters.py:4-185): recursive U-shaped modules with avg-pool down /
bicubic-align-corners up, stem conv7x7 s2 + ConvBlocks + avg-pool
(hg_down='ave_pool', the release setting), ``num_stack`` hourglasses with
intermediate supervision outputs and residual re-injection.

Returns (outputs list, tmpx, normx) exactly like the reference
(HGFilters.py:185); tmpx is stop-gradiented there via .detach() and here via
jax.lax.stop_gradient.
"""
from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from chore_tpu.models.layers import (
    ConvBlock,
    avg_pool_2x,
    bicubic_upsample_2x,
    conv_init,
    group_norm,
)


class HourGlass(nn.Module):
    """Recursive U-module of depth ``depth`` at ``features`` channels
    (reference: HGFilters.py:4-53)."""

    depth: int
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def level(lv, inp):
            up1 = ConvBlock(self.features, self.features, self.dtype,
                            name=f"b1_{lv}")(inp)
            low1 = avg_pool_2x(inp)
            low1 = ConvBlock(self.features, self.features, self.dtype,
                             name=f"b2_{lv}")(low1)
            if lv > 1:
                low2 = level(lv - 1, low1)
            else:
                low2 = ConvBlock(self.features, self.features, self.dtype,
                                 name=f"b2_plus_{lv}")(low1)
            low3 = ConvBlock(self.features, self.features, self.dtype,
                             name=f"b3_{lv}")(low2)
            up2 = bicubic_upsample_2x(low3)
            return up1 + up2

        return level(self.depth, x)


class HGFilter(nn.Module):
    """Stem + ``num_stack`` hourglass stages (reference: HGFilters.py:56-185).

    Release config: num_stack=5, num_hourglass(depth)=2, hourglass_dim=256,
    norm=group, hg_down=ave_pool, input 5ch RGBM3
    (config/chore-release.json:51-58).
    """

    num_stack: int = 5
    depth: int = 2
    features: int = 256
    out_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # rematerialize each hourglass in the backward pass
    # grouped_heads=True is the HGFilterGConv variant (reference:
    # model/HGFilters.py:187-312, unused by the release config): the
    # per-stack head (l{i}) and re-injection convs (bl{i}/al{i}) become
    # depthwise 1x1 convs (groups == channels). Requires out_dim to be a
    # multiple of features.
    grouped_heads: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        head_groups = self.features if self.grouped_heads else 1
        if self.grouped_heads and self.out_dim % self.features:
            raise ValueError(
                "grouped_heads requires out_dim % features == 0 "
                f"(got {self.out_dim} % {self.features})")
        # Stem: 7x7 s2 -> 64ch at H/2 (the skip feature tmpx)
        x = nn.Conv(64, (7, 7), strides=2, padding=3, kernel_init=conv_init,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(group_norm(64, name="bn1")(x))
        tmpx = x
        # ave_pool downsampling path (HGFilters.py:115-116,151-152)
        x = ConvBlock(64, 128, self.dtype, name="conv2")(x)
        x = avg_pool_2x(x)
        normx = x
        x = ConvBlock(128, 128, self.dtype, name="conv3")(x)
        x = ConvBlock(128, self.features, self.dtype, name="conv4")(x)

        previous = x
        outputs = []
        # nn.remat trades ~1/3 more encoder FLOPs for O(num_stack) less
        # activation memory -- the hourglasses dominate both; the lifted
        # transform keeps the parameter tree identical (checkpoint compat)
        HG = nn.remat(HourGlass) if self.remat else HourGlass
        for i in range(self.num_stack):
            hg = HG(self.depth, self.features, self.dtype,
                    name=f"m{i}")(previous)
            ll = ConvBlock(self.features, self.features, self.dtype,
                           name=f"top_m_{i}")(hg)
            ll = nn.Conv(self.features, (1, 1), kernel_init=conv_init,
                         dtype=self.dtype, name=f"conv_last{i}")(ll)
            ll = nn.relu(group_norm(self.features, name=f"bn_end{i}")(ll))
            tmp_out = nn.Conv(self.out_dim, (1, 1), kernel_init=conv_init,
                              feature_group_count=head_groups,
                              dtype=self.dtype, name=f"l{i}")(ll)
            outputs.append(tmp_out)
            if i < self.num_stack - 1:
                ll = nn.Conv(self.features, (1, 1), kernel_init=conv_init,
                             feature_group_count=head_groups,
                             dtype=self.dtype, name=f"bl{i}")(ll)
                tmp_out_ = nn.Conv(self.features, (1, 1), kernel_init=conv_init,
                                   feature_group_count=head_groups,
                                   dtype=self.dtype, name=f"al{i}")(tmp_out)
                previous = previous + ll + tmp_out_

        if not train:
            # eval keeps only the last stack (reference: model/chore.py:93-96)
            outputs = outputs[-1:]
        return outputs, jax.lax.stop_gradient(tmpx), normx
