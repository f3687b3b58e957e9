"""SDXL-style pixel embedder: a VAE-encoder CNN with mid-block self-attention.

Flax NHWC re-implementation of the architecture the reference builds through
HuggingFace diffusers (``diffusers.models.vae.Encoder``; wrapper
layers/sdxl_net.py:7-42, instantiated with repeat_block_dim=2, num_blocks=4,
norm_num_groups=1 in networks/neutrino_full_sdxl_network.py:8-15).  This is
the production LArSoft architecture (README.md:53), so the topology matches
diffusers' semantics:

* conv_in 3x3 -> first block width;
* 9 DownEncoderBlock2D's, each = ``layers_per_block``(2) ResnetBlock2D
  (GroupNorm -> SiLU -> conv3x3, twice, with 1x1 shortcut on width change)
  followed by an asymmetric-padded stride-2 downsample conv on all but the
  last block — 400x280 collapses to exactly 1x1 after the 8 downsamples;
* UNet mid block: resnet -> single-head spatial self-attention
  (GroupNorm'd q/k/v linears, residual) -> resnet;
* GroupNorm -> SiLU -> conv_out 3x3, then Flatten + Linear.

GroupNorm is per-sample, so no mask plumbing is needed for padded prong
slots (unlike the BatchNorm-based DenseNet path).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name


def _maybe_save(h: jnp.ndarray, save_spatial: int) -> jnp.ndarray:
    """Tag a conv output for the selective chunk-remat policy.

    When ``embedder_chunk_save_spatial`` is on, conv outputs whose H*W is at
    most the threshold are named so ``apply_embedder``'s
    ``save_only_these_names`` policy keeps them across the chunk scan
    instead of recomputing them in backward (saved residuals stack over all
    scan steps, so only small deep maps are affordable)."""
    if save_spatial and h.ndim == 4 and h.shape[1] * h.shape[2] <= save_spatial:
        return checkpoint_name(h, "embedder_chunk_saved")
    return h


class ResnetBlock(nn.Module):
    features: int
    groups: int = 1
    dtype: jnp.dtype = jnp.float32
    save_spatial: int = 0

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        h = nn.silu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32)(h)
        h = _maybe_save(h, self.save_spatial)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype,
                         param_dtype=jnp.float32)(h)
        h = nn.silu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32)(h)
        h = _maybe_save(h, self.save_spatial)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="shortcut")(x)
            x = _maybe_save(x, self.save_spatial)
        return x + h


class SpatialSelfAttention(nn.Module):
    """Single-head attention over spatial positions (VAE mid-block style)."""

    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        N, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        tokens = h.reshape(N, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="q")(tokens)
        k = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="k")(tokens)
        v = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="v")(tokens)
        logits = jnp.einsum("nqc,nkc->nqk", q, k) / jnp.sqrt(jnp.asarray(C, jnp.float32)).astype(self.dtype)
        weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        attended = jnp.einsum("nqk,nkc->nqc", weights, v)
        out = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(attended)
        return x + out.reshape(N, H, W, C)


class DownEncoderBlock(nn.Module):
    features: int
    num_layers: int = 2
    add_downsample: bool = True
    groups: int = 1
    dtype: jnp.dtype = jnp.float32
    save_spatial: int = 0

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_layers):
            x = ResnetBlock(self.features, self.groups, self.dtype,
                            self.save_spatial)(x)
        if self.add_downsample:
            # diffusers pads (0, 1) on each spatial dim before the stride-2 conv
            x = nn.Conv(
                self.features, (3, 3), strides=(2, 2),
                padding=((0, 1), (0, 1)), dtype=self.dtype, param_dtype=jnp.float32,
            )(x)
            x = _maybe_save(x, self.save_spatial)
        return x


class SDXLEncoder(nn.Module):
    """Full embedder: NHWC images ``[N, H, W, C]`` -> ``[N, output_dim]``."""

    output_dim: int
    init_block_dim: int
    repeat_block_dim: int = 2
    num_blocks: int = 4
    norm_num_groups: int = 1
    layers_per_block: int = 2
    dtype: jnp.dtype = jnp.float32
    # tag conv outputs with H*W <= this for the selective chunk-remat
    # policy (Options.embedder_chunk_save_spatial); 0 = no tagging
    save_spatial: int = 0

    @nn.compact
    def __call__(self, images, mask: Optional[jnp.ndarray] = None, train: bool = False):
        # Channel ladder (layers/sdxl_net.py:19-25): init * {1,1,2,2,4,4,8,8}
        # for repeat 2 / 4 blocks, plus a final output_dim block.
        widths = []
        dim = self.init_block_dim
        for _ in range(self.num_blocks):
            widths.extend([dim] * self.repeat_block_dim)
            dim *= 2
        widths.append(self.output_dim)

        x = images.astype(self.dtype)
        x = nn.Conv(widths[0], (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(x)

        for i, width in enumerate(widths):
            x = DownEncoderBlock(
                width,
                num_layers=self.layers_per_block,
                add_downsample=i != len(widths) - 1,
                groups=self.norm_num_groups,
                dtype=self.dtype,
                save_spatial=self.save_spatial,
            )(x)

        # mid block: resnet -> attention -> resnet
        x = ResnetBlock(widths[-1], self.norm_num_groups, self.dtype,
                        self.save_spatial)(x)
        x = SpatialSelfAttention(self.norm_num_groups, self.dtype)(x)
        x = ResnetBlock(widths[-1], self.norm_num_groups, self.dtype,
                        self.save_spatial)(x)

        x = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.silu(x)
        x = nn.Conv(self.output_dim, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_out")(x)

        x = x.reshape(x.shape[0], -1)   # spatial collapses to 1x1 for 400x280
        return nn.Dense(self.output_dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="output_layer")(x)
