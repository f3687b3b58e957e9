"""DenseNet-BC pixel embedder in NHWC with PReLU and masked BatchNorm.

TPU-first re-design of the reference's custom DenseNet (dense_net.py:8-167):
same topology (7x7/2 stem + avgpool3/2, bottleneck 1x1-expand -> 3x3-growth
dense blocks with channel concat, 1x1 + avgpool2 transitions, global average
pool, linear output block) but NHWC layout for the MXU, bfloat16-friendly
compute, and per-image mask weighting of every BatchNorm so that padded
prong-slot images contribute nothing to the statistics (the reference instead
packs real images; the masked form is numerically identical).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import MaskedBatchNorm, PReLU


class SpaceToDepthStem(nn.Module):
    """The 7x7/2 stem conv, computed as a 4x4/1 conv over the 2x2
    space-to-depth input — numerically the same map, far better MXU
    tiling (the direct form contracts over kh*kw*cin = 7*7*3 with cin=3
    riding the 128-wide lane axis at 2% utilization; round-4 profiling
    showed the stem's forward + weight-grad fusions as the largest
    positive roofline residual in the step).

    Parameters are declared with the SAME names/shapes as the ``nn.Conv``
    it replaces (``kernel`` [7,7,C,F], ``bias`` [F]) and rearranged at
    apply time, so checkpoints, the torch importer, and the BN-fold pass
    are untouched.  Derivation: x2[n,p,q,(a,b,c)] = x[n,2p+a,2q+b,c] and
    W'[dh,dw,(a,b,c),f] = Wpad[2dh+a, 2dw+b, c, f] with Wpad zero-padded
    by one leading tap (kh = 2dh+a-1), so

      y[n,oh,ow,f] = sum x[n, 2oh+kh-3, 2ow+kw-3, c] W[kh,kw,c,f]
                   = sum x2[n, oh+dh-2, ow+dw-2, (a,b,c)] W'[dh,dw,(a,b,c),f]

    i.e. a stride-1 VALID conv over x2 padded (2,1)x(2,1).  Exact for
    even H,W (400x280 here); odd extents fall back to the direct conv.

    When ``in_channels`` is set and the input arrives with ``4*in_channels``
    channels, it is already in s2d layout (the Pallas densify kernel emits
    it directly from the COO hits — zero extra HBM traffic, see
    ``ops/pallas_densify.py``) and the reshape/transpose here is skipped.
    The kernel param stays ``[7, 7, in_channels, F]`` either way, so
    checkpoints, the torch importer, and the BN-fold pass are untouched.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    in_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        pre_s2d = self.in_channels is not None and c == 4 * self.in_channels
        if pre_s2d:
            c = self.in_channels
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, c, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        if not pre_s2d and (h % 2 or w % 2):
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(2, 2), padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(self.dtype)
        x2 = x if pre_s2d else (
            x.reshape(n, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, h // 2, w // 2, 4 * c)
        )
        wpad = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w2 = (
            wpad.reshape(4, 2, 4, 2, c, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * c, self.features)
        )
        y = jax.lax.conv_general_dilated(
            x2.astype(self.dtype), w2.astype(self.dtype),
            window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class Bottleneck(nn.Module):
    growth_rate: int
    batch_norm_size: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        c_in = x.shape[-1]
        expand = self.batch_norm_size * self.growth_rate

        h = MaskedBatchNorm(c_in, axis_name=self.axis_name)(
            x, mask, use_running_average=not train
        )
        h = PReLU(c_in)(h)
        h = nn.Conv(expand, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(h)

        h = MaskedBatchNorm(expand, axis_name=self.axis_name)(
            h, mask, use_running_average=not train
        )
        h = PReLU(expand)(h)
        h = nn.Conv(
            self.growth_rate, (3, 3), padding=1, dtype=self.dtype, param_dtype=jnp.float32
        )(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=not train)

        return jnp.concatenate([x, h], axis=-1)


class Transition(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    # The 1x1 conv and the 2x2/2 average pool are both linear, so they
    # commute: pooling FIRST computes the same map (fp rounding aside) with
    # 4x fewer conv FLOPs and without materializing the full-resolution conv
    # output at all — the pool fuses into the preceding normalize/PReLU
    # chain, deleting a full write+read HBM pass per transition (the
    # round-5 registered pass-elimination experiment; the BN-chain loop
    # fusions themselves are already HBM-saturated, PARITY "mega-fusion"
    # entry).  Same parameter tree either way.
    pool_first: bool = False

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        c_in = x.shape[-1]
        x = MaskedBatchNorm(c_in, axis_name=self.axis_name)(
            x, mask, use_running_average=not train
        )
        x = PReLU(c_in)(x)
        if self.pool_first:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                           param_dtype=jnp.float32)(x)
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    """Full embedder: NHWC images ``[N, H, W, C]`` -> vectors ``[N, output_dim]``."""

    output_dim: int
    initial_features: int = 64
    growth_rate: int = 32
    batch_norm_size: int = 4
    block_config: Sequence[int] = (6, 12, 24, 16)
    dropout: float = 0.0
    # rematerialize each bottleneck in backward (jax.checkpoint): trades
    # ~1/3 more FLOPs for O(depth) less activation memory, unlocking larger
    # per-chip batches
    remat: bool = False
    # compute the stem as a space-to-depth 4x4/1 conv (same parameters,
    # same map — see SpaceToDepthStem)
    stem_space_to_depth: bool = False
    # configured pixel-channel count; lets the s2d stem recognise input
    # already emitted in s2d layout by the Pallas densify kernel
    stem_in_channels: Optional[int] = None
    # transitions pool before the 1x1 conv (linear commute, 4x fewer conv
    # FLOPs, one less full-res HBM pass each) — see Transition.pool_first
    transition_pool_first: bool = False
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, images, mask=None, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        bottleneck_cls = (
            nn.remat(Bottleneck, static_argnums=(3,)) if self.remat else Bottleneck
        )
        x = images.astype(self.dtype)

        # Stem: 7x7/2 conv, BN, PReLU, 3x3/2 average pool.  The explicit
        # "Conv_0" name keeps the param tree identical across the
        # space-to-depth toggle (both declare kernel [7,7,C,F] + bias [F]).
        if self.stem_space_to_depth:
            x = SpaceToDepthStem(
                self.initial_features, dtype=self.dtype,
                in_channels=self.stem_in_channels, name="Conv_0",
            )(x)
        else:
            x = nn.Conv(
                self.initial_features, (7, 7), strides=(2, 2), padding=3,
                dtype=self.dtype, param_dtype=jnp.float32, name="Conv_0",
            )(x)
        return densenet_post_stem(self, x, mask, train, bottleneck_cls, kw)


def densenet_post_stem(mod, x, mask, train, bottleneck_cls, kw):
    """Post-stem DenseNet-BC body + output head, shared by :class:`DenseNet`
    and :class:`..models.coo_densenet.CooStemDenseNet` (the families are
    numerically identical past the stem and must not drift).  A plain helper
    — not a wrapper Module — so submodules are created in the CALLER's scope
    and auto/explicit names (hence checkpoints) are unchanged.
    """
    x = MaskedBatchNorm(mod.initial_features, axis_name=mod.axis_name)(
        x, mask, use_running_average=not train
    )
    x = PReLU(mod.initial_features)(x)
    x = nn.avg_pool(x, (3, 3), strides=(2, 2))

    features = mod.initial_features
    block_index = 0
    for i, num_layers in enumerate(mod.block_config):
        for _ in range(num_layers):
            # explicit names keep the param tree (and checkpoints)
            # identical whether or not remat wrapping is enabled
            x = bottleneck_cls(
                mod.growth_rate, mod.batch_norm_size, mod.dropout,
                name=f"Bottleneck_{block_index}", **kw
            )(x, mask, train)
            block_index += 1
        features += num_layers * mod.growth_rate
        if i != len(mod.block_config) - 1:
            features //= 2
            x = Transition(
                features,
                pool_first=getattr(mod, "transition_pool_first", False),
                **kw,
            )(x, mask, train)

    x = MaskedBatchNorm(features, axis_name=mod.axis_name)(
        x, mask, use_running_average=not train
    )
    x = PReLU(features)(x)

    # Global average pool over the remaining spatial extent.
    x = jnp.mean(x, axis=(1, 2))

    # Output block: Linear (no bias) -> BN -> PReLU -> Dropout.
    x = nn.Dense(mod.output_dim, use_bias=False, dtype=mod.dtype, param_dtype=jnp.float32)(x)
    x = MaskedBatchNorm(mod.output_dim, axis_name=mod.axis_name)(
        x, mask, use_running_average=not train
    )
    x = PReLU(mod.output_dim)(x)
    if mod.dropout > 0.0:
        x = nn.Dropout(mod.dropout)(x, deterministic=not train)
    return x
