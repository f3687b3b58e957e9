"""DenseNet embedder with a genuinely-sparse COO stem (`--embedder coo`).

The reference's MinkowskiEngine family exists to *skip* work on empty sites
(sparse_dense_net.py:20-203); its single most expensive layer is the stem
convolution at full 400x280 resolution.  This family runs that stem as a true
gather-matmul-scatter over the raw hit banks (:func:`..ops.coo_conv.
coo_stem_conv` — FLOPs proportional to hits, not pixels), scatters the result
into the stride-2 dense grid, and continues with the *exact* dense DenseNet
block stack (densenet.py Bottleneck/Transition) — so the whole family is
numerically identical to ``--embedder dense`` with the same weights (conv is
linear in its input), golden-tested in tests/test_variants.py.

The stem parameters are shared between two execution engines:

* COO input ``(xy, values, owner, num_rows)`` — the sparse path the trainer
  feeds (the batcher's banks, never densified at input resolution);
* a dense ``[N, H, W, C]`` image — the fallback the export/image entry uses
  (``lax.conv_general_dilated`` with the same kernel).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.coo_conv import coo_stem_conv
from .densenet import Bottleneck, densenet_post_stem


class CooStemDenseNet(nn.Module):
    """DenseNet-BC whose stem conv7/2 executes sparsely on COO hit banks.

    ``__call__(inputs, mask, train)`` where ``inputs`` is either the COO
    tuple ``(xy [N,2], values [N,C], owner [N], num_rows)`` or a dense NHWC
    image array (export path).  Geometry (image height/width) is a module
    attribute because the COO path cannot infer it from its inputs.
    """

    output_dim: int
    image_height: int
    image_width: int
    initial_features: int = 64
    growth_rate: int = 32
    batch_norm_size: int = 4
    block_config: Sequence[int] = (6, 12, 24, 16)
    dropout: float = 0.0
    remat: bool = False
    # transitions pool before the 1x1 conv (linear commute) — see
    # densenet.Transition.pool_first
    transition_pool_first: bool = False
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, mask=None, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        bottleneck_cls = (
            nn.remat(Bottleneck, static_argnums=(3,)) if self.remat else Bottleneck
        )

        if isinstance(inputs, (tuple, list)):
            # (xy, values, owner, num_rows[, starts]) — starts are the
            # batcher's owner-sorted CSR offsets enabling the Pallas scatter
            xy, values, owner, num_rows, *rest = inputs
            starts = rest[0] if rest else None
            if not isinstance(num_rows, int):
                # Under lifted transforms (nn.remat) Python-int pytree
                # leaves arrive traced, but the stem needs a static output
                # row count; recover it from an array shape instead.
                if starts is not None:
                    num_rows = starts.shape[0] - 1
                elif mask is not None:
                    num_rows = mask.shape[0]
                else:
                    raise ValueError(
                        "CooStemDenseNet under a lifted transform needs "
                        "either CSR starts or a row mask to recover the "
                        "static row count (num_rows was traced)"
                    )
            c_in = values.shape[-1]
        else:
            c_in = inputs.shape[-1]

        # Stem conv7/2 parameters, shared by both execution engines.
        stem_kernel = self.param(
            "stem_kernel",
            nn.initializers.lecun_normal(),
            (7, 7, c_in, self.initial_features),
            jnp.float32,
        )
        stem_bias = self.param(
            "stem_bias", nn.initializers.zeros, (self.initial_features,), jnp.float32
        )

        if isinstance(inputs, (tuple, list)):
            x = coo_stem_conv(
                xy, values.astype(self.dtype), owner,
                stem_kernel, stem_bias,
                batch=num_rows,
                height=self.image_height, width=self.image_width,
                stride=2, padding=3,
                starts=starts,
            )
        else:
            x = jax.lax.conv_general_dilated(
                inputs.astype(self.dtype),
                stem_kernel.astype(self.dtype),
                window_strides=(2, 2),
                padding=[(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + stem_bias.astype(self.dtype)

        # the exact dense body past the stem — shared so the families
        # cannot drift (numerically identical with the same weights)
        return densenet_post_stem(self, x, mask, train, bottleneck_cls, kw)
