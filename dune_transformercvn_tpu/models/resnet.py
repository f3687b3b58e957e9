"""ResNet-stack pixel embedder (the 'resnet' family).

Capability variant documented by the reference's ResNet embedders
(layers/resnet.py:8-146, prong_pixel_embedding.py:9-83): basic residual
blocks (conv-BN-act x2 + projection shortcut on shape change), staged
stride-2 downsampling, mask-aware BatchNorm, global pooling and the shared
linear output block.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import MaskedBatchNorm, PReLU


class BasicBlock(nn.Module):
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
        if self.stride != 1 or x.shape[-1] != self.features:
            shortcut = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               param_dtype=jnp.float32, name="shortcut")(x)
            shortcut = MaskedBatchNorm(
                self.features, axis_name=self.axis_name, name="shortcut_norm"
            )(shortcut, mask, use_running_average=not train)
        return PReLU(self.features, name="out_act")(h + shortcut)


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
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        x = images.astype(self.dtype)
        x = nn.Conv(self.initial_features, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = MaskedBatchNorm(self.initial_features, axis_name=self.axis_name)(
            x, mask, use_running_average=not train
        )
        x = PReLU(self.initial_features)(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        features = self.initial_features
        for stage, repeats in enumerate(self.block_config):
            for i in range(repeats):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = BasicBlock(features, stride=stride, **kw)(x, mask, train)
            features *= 2
        features //= 2

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
