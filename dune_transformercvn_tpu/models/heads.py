"""Classification heads: event decoder and the halving-width prong decoder.

Event head: a single linear layer on the event token (prong_decoder.py:7-16).
Prong head: a halving-width MLP stack (128 -> 64 -> ... -> >=8) of
bias+BN+PReLU+dropout blocks followed by an output linear
(prong_target_decoder.py:8-41).  The reference applies the prong decoder's
BatchNorm to all (padded-included, zeroed) token rows; here the BN is masked
to real prongs — a conscious fix documented in SURVEY §7 (the reference's
statistics depend on the dynamic batch trim and are polluted by zero rows).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .blocks import LinearBlock


class EventDecoder(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, event_features):
        return nn.Dense(self.num_classes, dtype=self.dtype, param_dtype=jnp.float32)(
            event_features
        )


class ProngDecoder(nn.Module):
    num_classes: int
    hidden_dim: int
    num_layers: int
    min_dim: int = 8
    batch_norm: bool = True
    prelu: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, prong_features, mask=None, train: bool = False):
        """``prong_features``: [B, P, D]; ``mask``: [B, P] bool."""
        B, P, D = prong_features.shape
        x = prong_features.reshape(B * P, D)
        flat_mask = None if mask is None else mask.reshape(B * P)

        dim = self.hidden_dim
        for _ in range(self.num_layers):
            if dim // 2 < self.min_dim:
                break
            dim //= 2
            x = LinearBlock(
                dim,
                batch_norm=self.batch_norm,
                prelu=self.prelu,
                dropout=self.dropout,
                force_bias=True,
                dtype=self.dtype,
                axis_name=self.axis_name,
            )(x, flat_mask, train)

        x = nn.Dense(self.num_classes, dtype=self.dtype, param_dtype=jnp.float32)(x)
        return x.reshape(B, P, self.num_classes)
