"""Building blocks for the stacked-hourglass encoder.

Flax equivalents of the reference's ConvBlock / conv3x3 / norm factory
(reference: model/net_util.py:323-396), NHWC layout (TPU-preferred). The
release config uses group norm everywhere (config/chore-release.json:52), so
no batch statistics cross device boundaries -- data-parallel training needs
no norm syncing.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# PIFu-style init: normal(0.02) (reference: model/net_util.py:218-244)
conv_init = nn.initializers.normal(stddev=0.02)


def group_norm(num_channels, name=None):
    # GroupNorm(32, C) (reference: net_util.py:336-337); clamp groups for
    # narrow layers (the reference never instantiates those with group norm).
    # epsilon matches torch's 1e-5 default (flax defaults to 1e-6) so
    # forward AND gradient parity vs reference checkpoints is exact.
    return nn.GroupNorm(num_groups=min(32, num_channels), epsilon=1e-5,
                        name=name)


class ConvBlock(nn.Module):
    """3-branch dense residual block (reference: net_util.py:346-396).

    out = concat(conv1(x), conv2(.), conv3(.)) + (x or 1x1-projected x),
    each conv preceded by norm+relu; channel split out/2 + out/4 + out/4.
    """

    in_planes: int
    out_planes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        half = self.out_planes // 2
        quarter = self.out_planes // 4

        out1 = nn.relu(group_norm(self.in_planes, name="bn1")(x))
        out1 = nn.Conv(half, (3, 3), padding=1, use_bias=False,
                       kernel_init=conv_init, dtype=self.dtype, name="conv1")(out1)

        out2 = nn.relu(group_norm(half, name="bn2")(out1))
        out2 = nn.Conv(quarter, (3, 3), padding=1, use_bias=False,
                       kernel_init=conv_init, dtype=self.dtype, name="conv2")(out2)

        out3 = nn.relu(group_norm(quarter, name="bn3")(out2))
        out3 = nn.Conv(quarter, (3, 3), padding=1, use_bias=False,
                       kernel_init=conv_init, dtype=self.dtype, name="conv3")(out3)

        out = jnp.concatenate([out1, out2, out3], axis=-1)

        residual = x
        if self.in_planes != self.out_planes:
            residual = nn.relu(group_norm(self.in_planes, name="bn4")(residual))
            residual = nn.Conv(self.out_planes, (1, 1), use_bias=False,
                               kernel_init=conv_init, dtype=self.dtype,
                               name="downsample")(residual)
        return out + residual


def _cubic_kernel(x, a=-0.75):
    """Keys cubic convolution kernel (the a=-0.75 variant torch uses)."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1,
        (a + 2) * ax**3 - (a + 3) * ax**2 + 1,
        np.where(ax < 2, a * ax**3 - 5 * a * ax**2 + 8 * a * ax - 4 * a, 0.0),
    )
    return w


def bicubic_upsample_matrix(in_size, out_size):
    """(out, in) dense interpolation matrix for 1D bicubic align_corners=True.

    Bicubic resize is linear in the input, so we express it as a matmul --
    exact, differentiable, and it runs on the MXU instead of a gather. Border
    handling replicates edge pixels (torch's behavior). Reproduces
    ``F.interpolate(..., mode='bicubic', align_corners=True)``
    (reference: model/HGFilters.py:47).
    """
    w = np.zeros((out_size, in_size), np.float32)
    if out_size == 1:
        w[0, 0] = 1.0
        return w
    scale = (in_size - 1) / (out_size - 1)
    for i in range(out_size):
        src = i * scale
        fl = int(np.floor(src))
        t = src - fl
        idx = np.array([fl - 1, fl, fl + 1, fl + 2])
        wts = _cubic_kernel(np.array([-1.0, 0.0, 1.0, 2.0]) - t)
        idx = np.clip(idx, 0, in_size - 1)
        for j, k in zip(idx, wts):
            w[i, j] += k
    return w


def bicubic_upsample_2x(x):
    """NHWC bicubic x2 upsample, align_corners=True, as two matmuls.

    The interpolation matrices are cast to the activation dtype: f32
    weights would silently promote a bf16 encoder's activations to f32
    for the rest of the hourglass (4x matmul cost + casts)."""
    B, H, W, C = x.shape
    wh = jnp.asarray(bicubic_upsample_matrix(H, 2 * H), x.dtype)
    ww = jnp.asarray(bicubic_upsample_matrix(W, 2 * W), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    x = jnp.einsum("ow,bhwc->bhoc", ww, x)
    return x


def avg_pool_2x(x):
    """2x2 stride-2 average pool, NHWC (reference: HGFilters.py:32,152)."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def one_hot_ce(logits, labels):
    """Per-element softmax cross-entropy via one-hot multiply.

    Bitwise-identical to gathering the true-class log-probability with
    take_along_axis (the off-class terms are exactly 0.0 and x + 0.0 == x
    for finite x), but fuses as a VPU elementwise pass on TPU where the
    gather form pays a strided per-call gather on the lane-padded class
    dim (measured ~2.4 ms x 5 stacks per train step at (16, 20000, 14)).
    Shared by the train loss (models/chore.py chore_losses) and the
    fitting part-CE (recon/losses.py part_ce_loss).

    logits: (..., C); labels: (...) int. Returns (...) CE values.
    """
    import jax

    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, logp.shape[-1], dtype=logp.dtype)
    return -jnp.sum(logp * onehot, axis=-1)
