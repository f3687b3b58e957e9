"""Shared MLP building blocks: LinearBlock and the prong feature embedding.

Re-designs of the reference's LinearBlock / ProngFeatureEmbedding
(prong_feature_embedding.py:7-78) and the bias-carrying linear block used by
the decoders (layers/encoder.py:10-24).  BatchNorm is the masked variant so
padded slots never pollute statistics (the reference achieves the same by
packing real rows).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import MaskedBatchNorm, PReLU


class LinearBlock(nn.Module):
    """Dense (+no bias when BN) -> masked BN -> PReLU/ReLU -> Dropout."""

    features: int
    batch_norm: bool = True
    prelu: bool = True
    dropout: float = 0.0
    # Bias even when BN is on (the decoder-stack variant, encoder.py:11).
    force_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        x = nn.Dense(
            self.features,
            use_bias=self.force_bias or not self.batch_norm,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.batch_norm:
            x = MaskedBatchNorm(self.features, axis_name=self.axis_name)(
                x, mask=mask, use_running_average=not train
            )
        if self.prelu:
            x = PReLU(self.features)(x)
        else:
            x = nn.relu(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return x


class FeatureEmbedding(nn.Module):
    """Doubling-width LinearBlock stack from ``initial_dim`` up to ``output_dim``.

    Returns zeros when ``disabled`` (Options.disable_smart_features), matching
    prong_feature_embedding.py:73-78.
    """

    output_dim: int
    initial_dim: int
    max_layers: int
    disabled: bool = False
    batch_norm: bool = True
    prelu: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, data, extra, mask=None, train: bool = False):
        if self.disabled:
            return jnp.zeros((data.shape[0], self.output_dim), self.dtype)

        x = jnp.concatenate([data, extra], axis=1).astype(self.dtype)
        kwargs = dict(
            batch_norm=self.batch_norm,
            prelu=self.prelu,
            dropout=self.dropout,
            dtype=self.dtype,
            axis_name=self.axis_name,
        )
        x = LinearBlock(self.initial_dim, **kwargs)(x, mask, train)
        dim = self.initial_dim
        for _ in range(self.max_layers):
            if 2 * dim >= self.output_dim:
                break
            dim *= 2
            x = LinearBlock(dim, **kwargs)(x, mask, train)
        return LinearBlock(self.output_dim, **kwargs)(x, mask, train)


def make_divisible(value: int, divisor: int = 8) -> int:
    """Round to the nearest multiple of ``divisor``, never dropping below 90%
    (channel-count convention shared with the reference's embedder sizing,
    prong_masked_mobilenet_embedding.py:10-23)."""
    rounded = max(divisor, int(value + divisor / 2) // divisor * divisor)
    if rounded < 0.9 * value:
        rounded += divisor
    return rounded
