"""Attention-pooling blocks: masked-softmax pooling and learned-query
multi-head pooling.

Reusable capability variants the reference developed in its legacy stack and
SURVEY flags as patterns worth keeping: the Combiner's masked-softmax
attention pooling (layers/combiner.py:14-35) and the summarizers'
learned-query cross-attention MultiHeadPooling
(prong_custom_bert_summarizer.py:9-24).  Both reduce a masked token set
``[B, T, D]`` to a single vector ``[B, D]``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class MaskedSoftmaxPooling(nn.Module):
    """Scalar attention score per token, masked softmax, weighted sum."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, mask):
        """``tokens``: [B, T, D]; ``mask``: [B, T] bool -> [B, D]."""
        scores = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32)(tokens)[..., 0]
        # a row with zero real tokens would softmax an all--inf row to NaN
        # (and NaN-poison gradients even through a post-hoc where); keep its
        # scores finite and zero its weights instead
        empty = ~mask.any(-1, keepdims=True)
        scores = jnp.where(mask, scores.astype(jnp.float32), -jnp.inf)
        scores = jnp.where(empty, 0.0, scores)
        weights = nn.softmax(scores, axis=-1).astype(tokens.dtype)
        weights = jnp.where(empty, 0.0, weights)
        return jnp.einsum("bt,btd->bd", weights, tokens)


class MultiHeadPooling(nn.Module):
    """Learned-query multi-head cross-attention pooling."""

    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, mask):
        """``tokens``: [B, T, D]; ``mask``: [B, T] bool -> [B, D]."""
        B, T, D = tokens.shape
        query = self.param(
            "query", nn.initializers.normal(0.02), (1, 1, D), jnp.float32
        )
        attention_mask = jnp.broadcast_to(mask[:, None, None, :], (B, 1, 1, T))
        pooled = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=D,
            out_features=D,
            deterministic=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(
            jnp.broadcast_to(query, (B, 1, D)).astype(tokens.dtype),
            tokens,
            mask=attention_mask,
        )
        return pooled[:, 0]
