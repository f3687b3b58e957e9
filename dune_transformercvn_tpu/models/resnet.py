"""ResNet-stack pixel embedder (the 'resnet' family).

The residual body reproduces the reference's ``ResNetStack``
(layers/resnet.py:8-146) exactly so its weights transplant directly
(tests/test_resnet_golden.py): basic blocks are conv3x3-BN -> PReLU ->
conv3x3-BN with a conv1x1+BN projection shortcut on any width change,
**no activation after the residual add** (ResidualBlock.forward adds and
returns), and each stage downsamples by 2 in its first block iff the width
changes (ResNetLayer:94-97).

The stem and head around the body are deliberate TPU-first adaptations, not
the reference's: the reference wraps the stack in config-derived legacy
embedders (prong_pixel_embedding.py:24-47, pixel_encoder.py:17-50) whose
sizing formulas collapse at this dataset's production scale — for 400x280
images and a ~120-wide embedding, ``hidden_dim // 2**int(log2(min_shape))``
rounds the initial width to zero (a constructor crash) and the output-block
conv kernel grows to the full post-stem extent.  We use the conventional
7x7/2 + maxpool3/2 stem and global-average-pool + linear head instead (the
same head shape as the shared output block), which keeps the family usable
at production geometry.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import MaskedBatchNorm, PReLU


class BasicBlock(nn.Module):
    """Reference ``ResNetBasicBlock`` (expansion 1): conv_bn -> PReLU ->
    conv_bn, projection shortcut on width change, residual add with NO
    trailing activation."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        shortcut = x
        h = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        h = MaskedBatchNorm(self.features, axis_name=self.axis_name)(
            h, mask, use_running_average=not train
        )
        h = PReLU(self.features)(h)
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = MaskedBatchNorm(self.features, axis_name=self.axis_name)(
            h, mask, use_running_average=not train
        )
        if x.shape[-1] != self.features:
            shortcut = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               param_dtype=jnp.float32, name="shortcut")(x)
            shortcut = MaskedBatchNorm(
                self.features, axis_name=self.axis_name, name="shortcut_norm"
            )(shortcut, mask, use_running_average=not train)
        return h + shortcut


class ResNetBody(nn.Module):
    """The reference ``ResNetStack``: one stage per entry of
    ``stage_features``; a stage's first block downsamples by 2 iff its width
    differs from the incoming width (so stage 0 never downsamples)."""

    stage_features: Sequence[int]
    stage_depths: Sequence[int]
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        for features, repeats in zip(self.stage_features, self.stage_depths):
            for i in range(repeats):
                stride = 2 if (i == 0 and x.shape[-1] != features) else 1
                x = BasicBlock(features, stride=stride, **kw)(x, mask, train)
        return x


class ResNetStack(nn.Module):
    """Embedder: NHWC images -> [N, output_dim]."""

    output_dim: int
    initial_features: int = 64
    block_config: Sequence[int] = (2, 2, 2, 2)
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, images, mask=None, train: bool = False):
        x = images.astype(self.dtype)
        x = nn.Conv(self.initial_features, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = MaskedBatchNorm(self.initial_features, axis_name=self.axis_name)(
            x, mask, use_running_average=not train
        )
        x = PReLU(self.initial_features)(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        stages = [self.initial_features * (2 ** i)
                  for i in range(len(self.block_config))]
        x = ResNetBody(stages, tuple(self.block_config), dtype=self.dtype,
                       axis_name=self.axis_name)(x, mask, train)

        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        x = MaskedBatchNorm(self.output_dim, axis_name=self.axis_name)(
            x, mask, use_running_average=not train
        )
        x = PReLU(self.output_dim)(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return x
