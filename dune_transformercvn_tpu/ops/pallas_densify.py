"""Pallas TPU kernel for the COO→dense image scatter (the densify hot path).

XLA lowers the drop-mode scatter-add in ``ops.scatter.densify_images`` to a
serialized while-loop of HBM read-modify-writes (profiled: 4.6 ms at 35 GB/s
for a [128,400,280,3] build from 8192 hits — ~6% of the production train
step).  This kernel exploits what the batcher already guarantees — hits
sorted by owner image with padding at the end (``data/batcher.py::pack_coo``)
— to give each grid program ONE image as a VMEM-resident block: its hits
become cheap VMEM vector read-modify-writes (a one-hot [8, W*C] window per
hit, 8-sublane-aligned for Mosaic), and the finished image is DMA'd out
once.  Measured on the v5e: 0.55 ms for the same build — 8.4x faster than
the XLA scatter (as the earlier NCHW variant; see layout note).

Indices and values ride in SMEM via scalar prefetch (1-D arrays only: SMEM
operands are lane-padded to 128, so a [R, 2] layout would inflate 64x).

Layout: the block is ``[1, H, W*C]`` — H on sublanes, the flattened (w, c)
pair on lanes — so the public wrapper's ``reshape`` to NHWC ``[N, H, W, C]``
is free (row-major identity), no relayout copy.  A direct ``[1, H, W, C]``
block would put C=3 on the lane axis (43x pad); the earlier NCHW variant
(W on lanes, C on a leading block dim) padded 280→384 lanes (37%) and needed
a transpose back to NHWC, where W*C=840 pads to 896 (6.7%) and needs none.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# SMEM is ~1 MiB; leave headroom for Mosaic's own scalars.
_SMEM_BUDGET_BYTES = 800_000


def supports_pallas_densify(
    num_hits: int, num_channels: int, height: int,
    space_to_depth: bool = False, width: int = 0,
) -> bool:
    """Static guard: TPU backend, 8-aligned sublane windows, SMEM fit."""
    if os.environ.get("DUNE_TCVN_NO_PALLAS_DENSIFY"):
        return False   # escape hatch: force the XLA scatter fallback
    smem = 4 * num_hits * (2 + num_channels)   # x, y, and C value columns (f32)
    if space_to_depth:
        # the s2d block is [1, H/2, (W/2)*4C]: H/2 rides the sublane axis
        if height % 16 or height < 16 or width % 2:
            return False
        height //= 2
    return (
        jax.default_backend() == "tpu"
        and height % 8 == 0
        and height >= 8
        and num_channels <= 8
        and smem <= _SMEM_BUDGET_BYTES
    )


def _kernel(num_channels, width, s2d, starts_ref, x_ref, y_ref, *rest):
    vrefs, o_ref = rest[:num_channels], rest[num_channels]
    i = pl.program_id(0)
    o_ref[:] = jnp.zeros_like(o_ref)
    start = starts_ref[i]
    end = starts_ref[i + 1]
    # plain: lane l encodes (w, c) = (l // C, l % C); s2d: lane l encodes
    # (w//2, (h%2, w%2, c)) — one iota either way, per-channel offsets added
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, o_ref.shape[2]), 2)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)

    def body(j, carry):
        x = x_ref[j]
        y = y_ref[j]
        if s2d:
            # Space-to-depth emission (stem_space_to_depth): hit (x, y, c)
            # lands at sublane x//2, lane (y//2)*4C + (x%2)*2C + (y%2)*C + c
            # — the exact layout SpaceToDepthStem's reshape/transpose
            # produces, so emitting it here deletes that full HBM pass over
            # both image banks (round-4 finding: the transpose pass ate the
            # stem fusion win, conv_bw_study_s2d_v5e.json).  Validity is
            # explicit rather than proven through negative floor-division:
            # invalid hits get their row pushed past every 8-row window,
            # matching the XLA scatter's drop mode.
            valid = ((x >= 0) & (x < 2 * o_ref.shape[1])
                     & (y >= 0) & (y < width)).astype(jnp.int32)
            xc = jnp.clip(x, 0, 2 * o_ref.shape[1] - 1)
            yc = jnp.clip(y, 0, width - 1)
            base = ((yc // 2) * (4 * num_channels)
                    + (xc % 2) * (2 * num_channels)
                    + (yc % 2) * num_channels)
            row = (xc // 2) * valid + (1 - valid) * (o_ref.shape[1] + 8)
        else:
            # The row match uses the ORIGINAL x: out-of-range x lands
            # outside 0..7 relative to the in-bounds window and selects
            # nothing — exactly the XLA scatter's drop-mode semantics (OOB
            # y likewise matches no lane).
            row = x
            base = y * num_channels
        # Mosaic needs a provably 8-aligned sublane base, so derive it from
        # the CLAMPED row ((clip(row) // 8) * 8 stays a pure aligned
        # expression; clipping xb itself defeats the alignment proof).
        xb = pl.multiple_of(
            (jnp.clip(row, 0, o_ref.shape[1] - 1) // 8) * 8, 8
        )
        row_sel = (row8 == (row - xb)).astype(jnp.float32)
        delta = row_sel * sum(
            (lane == base + c).astype(jnp.float32) * vrefs[c][j]
            for c in range(num_channels)
        )
        o_ref[0, pl.ds(xb, 8), :] += delta[0].astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(start, end, body, 0, unroll=False)


@functools.partial(
    jax.jit, static_argnames=(
        "num_images", "height", "width", "space_to_depth", "interpret",
    )
)
def densify_images_pallas(
    xy: jnp.ndarray,       # [R, 2] int32 pixel coordinates (owner-sorted)
    values: jnp.ndarray,   # [R, C] pixel values (padding rows beyond starts[-1])
    starts: jnp.ndarray,   # [num_images + 1] int32 CSR offsets into the bank
    num_images: int,
    height: int,
    width: int,
    space_to_depth: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Dense NHWC images ``[num_images, H, W, C]`` from an owner-sorted bank
    (or the 2x2 space-to-depth layout ``[num_images, H/2, W/2, 4C]`` when
    ``space_to_depth`` — same hits, s2d indexing done in-kernel for free).

    Semantics match ``scatter.densify_images`` when the bank is sorted by
    owner with padding at the end (duplicates accumulate; rows outside
    ``[starts[i], starts[i+1])`` never contribute).
    """
    channels = values.shape[-1]
    vals32 = values.astype(jnp.float32)
    columns = [vals32[:, c] for c in range(channels)]
    if space_to_depth:
        out_h, out_lanes = height // 2, (width // 2) * 4 * channels
    else:
        out_h, out_lanes = height, width * channels
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 + channels,     # starts, x, y, value columns
        grid=(num_images,),
        in_specs=[],
        out_specs=pl.BlockSpec(
            (1, out_h, out_lanes),
            lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    flat = pl.pallas_call(
        functools.partial(_kernel, channels, width, space_to_depth),
        out_shape=jax.ShapeDtypeStruct(
            (num_images, out_h, out_lanes), values.dtype
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts.astype(jnp.int32), xy[:, 0], xy[:, 1], *columns)
    if space_to_depth:
        return flat.reshape(num_images, height // 2, width // 2, 4 * channels)
    return flat.reshape(num_images, height, width, channels)
