"""MobileNetV2 + squeeze-excitation pixel embedder (the 'mobilenet' family).

Matches the reference's masked MobileNet embedder
(prong_masked_mobilenet_embedding.py:26-260) layer for layer so its weights
transplant directly (tests/test_mobilenet_golden.py):

* ``ConvolutionBlock`` = conv(bias=False) -> BatchNorm -> SiLU -> Dropout;
* squeeze-excitation with reduction 2 and SiLU between the two biased
  linears, applied after the depthwise stage of every inverted residual;
* projection stage conv1x1(bias=False) -> BatchNorm -> Dropout (no act);
* a RECTANGULAR initial kernel ``(3 + delta, 3)`` (or transposed) derived
  from the image aspect, stride 2 (reference lines 204-208);
* last 1x1 block straight to the embedding width, then global average pool
  — no extra linear head.

The reference packs real prong images before the embedder
(neutrino_combined_network.py:68-69), so its BatchNorm sees only real rows;
we keep static shapes and weight the statistics by the slot mask instead
(``MaskedBatchNorm``), which is numerically identical.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import MaskedBatchNorm
from .blocks import make_divisible

# Reference default ladder (expand_ratio, channels, repeats, stride);
# prong_masked_mobilenet_embedding.py:185-192.
DEFAULT_STRUCTURE = (
    (1, 8, 1, 1),
    (6, 16, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 128, 3, 1),
)


class ConvBlock(nn.Module):
    """conv(bias=False) -> masked BN -> SiLU -> dropout."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    depthwise: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        kh, kw = self.kernel
        groups = x.shape[-1] if self.depthwise else 1
        x = nn.Conv(
            self.features, (kh, kw),
            strides=(self.stride, self.stride),
            padding=((kh - 1) // 2, (kw - 1) // 2),
            feature_group_count=groups,
            use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        x = MaskedBatchNorm(self.features, axis_name=self.axis_name)(
            x, mask, use_running_average=not train
        )
        x = nn.silu(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return x


class SqueezeExcite(nn.Module):
    """Per-image channel gating; reference SqueezeAndExcitation (lines
    72-107): reduction 2, biased linears, SiLU between them."""

    reduction: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        squeezed = jnp.mean(x, axis=(1, 2))                       # [N, C]
        h = nn.Dense(c // self.reduction,
                     dtype=self.dtype, param_dtype=jnp.float32)(squeezed)
        h = nn.silu(h)
        h = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32)(h)
        gate = nn.sigmoid(h)
        return x * gate[:, None, None, :]


class InvertedResidual(nn.Module):
    """expand(1x1) -> depthwise(3x3) -> SE -> project(1x1, no act);
    residual when stride 1 and matching width (reference lines 110-156)."""

    features: int
    stride: int = 1
    expand_ratio: int = 6
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        c_in = x.shape[-1]
        kw = dict(dropout=self.dropout, dtype=self.dtype,
                  axis_name=self.axis_name)
        h = x
        if self.expand_ratio != 1:
            h = ConvBlock(
                int(round(c_in * self.expand_ratio)), kernel=(1, 1), **kw
            )(h, mask, train)
        h = ConvBlock(
            h.shape[-1], kernel=(3, 3), stride=self.stride, depthwise=True,
            **kw
        )(h, mask, train)
        h = SqueezeExcite(dtype=self.dtype)(h)
        # projection: conv -> BN -> dropout, deliberately no activation
        h = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = MaskedBatchNorm(self.features, axis_name=self.axis_name)(
            h, mask, use_running_average=not train
        )
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=not train)
        if self.stride == 1 and c_in == self.features:
            h = h + x
        return h


def initial_kernel(input_shape: Optional[Tuple[int, int]]) -> Tuple[int, int]:
    """Reference lines 204-208: stretch the stem kernel along the longer
    image axis so the receptive field matches the aspect ratio."""
    if input_shape is None:
        return (3, 3)
    delta = max(input_shape) - min(input_shape)
    if input_shape[1] > input_shape[0]:
        return (3, 3 + delta)
    return (3 + delta, 3)


class MobileNetV2(nn.Module):
    """Embedder: NHWC images ``[N, H, W, C]`` -> vectors ``[N, output_dim]``."""

    output_dim: int
    initial_features: int = 32
    structure: Sequence[Sequence[int]] = DEFAULT_STRUCTURE
    input_shape: Optional[Tuple[int, int]] = None
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, images, mask=None, train: bool = False):
        kw = dict(dropout=self.dropout, dtype=self.dtype,
                  axis_name=self.axis_name)
        x = images.astype(self.dtype)
        x = ConvBlock(
            make_divisible(self.initial_features, 8),
            kernel=initial_kernel(self.input_shape), stride=2, **kw
        )(x, mask, train)
        for expansion, channels, repeats, stride in self.structure:
            channels = make_divisible(channels, 8)
            for i in range(repeats):
                x = InvertedResidual(
                    channels,
                    stride=stride if i == 0 else 1,
                    expand_ratio=expansion,
                    **kw,
                )(x, mask, train)
        # reference: last_channel = hidden_dim (the embedding width itself,
        # already rounded to a multiple of 8 by the caller), then adaptive
        # average pool + flatten — no linear head after
        x = ConvBlock(self.output_dim, kernel=(1, 1), **kw)(x, mask, train)
        return jnp.mean(x, axis=(1, 2))
