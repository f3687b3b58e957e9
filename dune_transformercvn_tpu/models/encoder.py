"""Masked shared transformer encoder over the [event, prong_1..20] sequence.

Re-design of the reference encoder (prong_custom_bert_encoder.py:29-75), which
wraps torch ``nn.TransformerEncoder``:

* batch-first ``[B, T, D]`` layout (T = 21 tokens — tiny, so attention is a
  single fused XLA op; no flash/blockwise machinery is warranted, a parity
  decision documented in SURVEY §5),
* key-padding mask (padded keys excluded from attention),
* the input and output are multiplied by the sequence mask, matching
  prong_custom_bert_encoder.py:70-73,
* post-norm (torch default) or pre-norm per ``norm_first``,
* feed-forward width equals ``hidden_dim`` (the reference passes hidden_dim
  as dim_feedforward).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class EncoderLayer(nn.Module):
    hidden_dim: int
    num_heads: int
    dropout: float = 0.0
    activation: str = "gelu"
    norm_first: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask=None, train: bool = False):
        # exact (erf) gelu: torch's TransformerEncoderLayer default, vs
        # flax's tanh approximation — parity requires the exact form
        act = (
            (lambda x: nn.gelu(x, approximate=False))
            if self.activation == "gelu"
            else nn.relu
        )
        deterministic = not train

        def attn_block(h):
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                qkv_features=self.hidden_dim,
                out_features=self.hidden_dim,
                dropout_rate=self.dropout,
                deterministic=deterministic,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(h, h, mask=attention_mask)
            return nn.Dropout(self.dropout)(h, deterministic=deterministic)

        def ff_block(h):
            h = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32)(h)
            h = act(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32)(h)
            return nn.Dropout(self.dropout)(h, deterministic=deterministic)

        norm1 = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)
        norm2 = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)

        if self.norm_first:
            x = x + attn_block(norm1(x))
            x = x + ff_block(norm2(x))
        else:
            x = norm1(x + attn_block(x))
            x = norm2(x + ff_block(x))
        return x


class DecoderLayer(nn.Module):
    """Post-norm transformer decoder layer (self-attn, cross-attn, FFN)."""

    hidden_dim: int
    num_heads: int
    dropout: float = 0.0
    activation: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, targets, memory, memory_mask=None, self_mask=None,
        train: bool = False,
    ):
        act = (
            (lambda x: nn.gelu(x, approximate=False))
            if self.activation == "gelu"
            else nn.relu
        )
        deterministic = not train
        mha_kwargs = dict(
            num_heads=self.num_heads,
            qkv_features=self.hidden_dim,
            out_features=self.hidden_dim,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        h = nn.MultiHeadDotProductAttention(**mha_kwargs)(
            targets, targets, mask=self_mask
        )
        targets = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(
            targets + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        )
        h = nn.MultiHeadDotProductAttention(**mha_kwargs)(
            targets, memory, mask=memory_mask
        )
        targets = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(
            targets + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        )
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32)(targets)
        h = nn.Dropout(self.dropout)(act(h), deterministic=deterministic)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32)(h)
        return nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(
            targets + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        )


class InducedSetAttentionBlock(nn.Module):
    """ISAB (set-transformer): attend a learned inducing set to the tokens,
    then attend the tokens back to the induced summary — O(T*m) attention.

    The reference carries this block unused beside its encoder
    (prong_custom_bert_encoder.py:9-26); provided here as a drop-in
    building block for longer token sets.
    """

    hidden_dim: int
    num_heads: int
    num_indices: int = 8
    dropout: float = 0.0
    activation: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, mask=None, train: bool = False):
        """``tokens``: [B, T, D]; ``mask``: [B, T] bool.  Inputs whose
        feature width differs from ``hidden_dim`` are projected first (the
        residual adds inside the decoder layers require matching widths)."""
        B, T, D = tokens.shape
        if D != self.hidden_dim:
            tokens = nn.Dense(self.hidden_dim, dtype=self.dtype,
                              param_dtype=jnp.float32, name="input_projection")(tokens)
        inducing = self.param(
            "inducing_points",
            nn.initializers.xavier_uniform(),
            (1, self.num_indices, self.hidden_dim),
            jnp.float32,
        )
        inducing = jnp.broadcast_to(
            inducing, (B, self.num_indices, self.hidden_dim)
        ).astype(tokens.dtype)

        key_mask = None
        if mask is not None:
            key_mask = jnp.broadcast_to(
                mask[:, None, None, :], (B, 1, self.num_indices, T)
            )
        layer_kwargs = dict(
            hidden_dim=self.hidden_dim,
            num_heads=self.num_heads,
            dropout=self.dropout,
            activation=self.activation,
            dtype=self.dtype,
        )
        summary = DecoderLayer(**layer_kwargs)(
            inducing, tokens, memory_mask=key_mask, train=train
        )
        # second pass: tokens self-attend (padded keys masked, matching the
        # reference's tgt_key_padding_mask) then attend the induced summary
        self_mask = None
        if mask is not None:
            self_mask = jnp.broadcast_to(mask[:, None, None, :], (B, 1, T, T))
        return DecoderLayer(**layer_kwargs)(
            tokens, summary, self_mask=self_mask, train=train
        )


class TransformerEncoder(nn.Module):
    hidden_dim: int
    num_heads: int
    num_layers: int
    dropout: float = 0.0
    activation: str = "gelu"
    norm_first: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embeddings, mask, train: bool = False):
        """``embeddings``: [B, T, D]; ``mask``: [B, T] bool (True = real)."""
        B, T, _ = embeddings.shape
        seq_mask = mask[..., None].astype(embeddings.dtype)

        # [B, 1(heads), Tq, Tk]: every query may attend to any real key.
        attention_mask = jnp.broadcast_to(mask[:, None, None, :], (B, 1, T, T))

        x = embeddings * seq_mask
        for _ in range(self.num_layers):
            x = EncoderLayer(
                hidden_dim=self.hidden_dim,
                num_heads=self.num_heads,
                dropout=self.dropout,
                activation=self.activation,
                norm_first=self.norm_first,
                dtype=self.dtype,
            )(x, attention_mask, train)
        return x * seq_mask
