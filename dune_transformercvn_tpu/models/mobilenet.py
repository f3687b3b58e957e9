"""MobileNetV2 + squeeze-excitation pixel embedder (the 'mobilenet' family).

Capability variant documented by the reference's masked MobileNet embedders
(prong_masked_mobilenet_embedding.py:71-260, prong_mobilenet_embedding.py):
inverted-residual bottlenecks with expansion, depthwise 3x3 convolutions,
optional squeeze-excitation, and mask-aware BatchNorm so padded prong-slot
images never pollute statistics.  Structure is configurable through
``Options.mobilenet_structure`` as ``[expansion, channels, repeats, stride]``
rows (defaults to the standard MobileNetV2 ladder).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import MaskedBatchNorm, PReLU
from .blocks import make_divisible

DEFAULT_STRUCTURE = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class ConvBNAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    depthwise: bool = False
    act: bool = True
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        groups = x.shape[-1] if self.depthwise else 1
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=self.kernel // 2,
            feature_group_count=groups,
            use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        x = MaskedBatchNorm(self.features, axis_name=self.axis_name)(
            x, mask, use_running_average=not train
        )
        if self.act:
            x = jnp.minimum(nn.relu(x), 6.0)  # ReLU6
        return x


class SqueezeExcite(nn.Module):
    """Per-image channel gating (SE block, reference lines 71-106)."""

    reduction: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        squeezed = jnp.mean(x, axis=(1, 2))                       # [N, C]
        h = nn.Dense(make_divisible(c // self.reduction, 8),
                     dtype=self.dtype, param_dtype=jnp.float32)(squeezed)
        h = nn.relu(h)
        h = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32)(h)
        gate = nn.sigmoid(h)
        return x * gate[:, None, None, :]


class InvertedResidual(nn.Module):
    features: int
    stride: int = 1
    expand_ratio: int = 6
    use_se: bool = True
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        c_in = x.shape[-1]
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        h = x
        if self.expand_ratio != 1:
            h = ConvBNAct(c_in * self.expand_ratio, kernel=1, **kw)(h, mask, train)
        h = ConvBNAct(
            h.shape[-1], kernel=3, stride=self.stride, depthwise=True, **kw
        )(h, mask, train)
        if self.use_se:
            h = SqueezeExcite(dtype=self.dtype)(h)
        h = ConvBNAct(self.features, kernel=1, act=False, **kw)(h, mask, train)
        if self.stride == 1 and c_in == self.features:
            h = h + x
        return h


class MobileNetV2(nn.Module):
    """Embedder: NHWC images -> [N, output_dim]."""

    output_dim: int
    initial_features: int = 32
    structure: Sequence[Sequence[int]] = DEFAULT_STRUCTURE
    last_features: int = 1280
    use_se: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, images, mask=None, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        x = images.astype(self.dtype)
        x = ConvBNAct(self.initial_features, kernel=3, stride=2, **kw)(x, mask, train)
        for expansion, channels, repeats, stride in self.structure:
            channels = make_divisible(channels, 8)
            for i in range(repeats):
                x = InvertedResidual(
                    channels,
                    stride=stride if i == 0 else 1,
                    expand_ratio=expansion,
                    use_se=self.use_se,
                    **kw,
                )(x, mask, train)
        x = ConvBNAct(self.last_features, kernel=1, **kw)(x, mask, train)
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
