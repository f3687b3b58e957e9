"""Pallas TPU kernel for the COO→dense image scatter (the densify hot path).

XLA lowers the drop-mode scatter-add in ``ops.scatter.densify_images`` to a
serialized while-loop of HBM read-modify-writes (profiled: 4.6 ms at 35 GB/s
for a [128,400,280,3] build from 8192 hits — ~6% of the production train
step).  This kernel exploits what the batcher already guarantees — hits
sorted by owner image with padding at the end (``data/batcher.py::pack_coo``)
— to give each grid program ONE image as a VMEM-resident block: its hits
become cheap VMEM vector read-modify-writes (a one-hot [C, 8, W] window per
hit, 8-sublane-aligned for Mosaic), and the finished image is DMA'd out
once.  Measured on the v5e: 0.55 ms for the same build — 8.4x faster than
the XLA scatter.

Indices and values ride in SMEM via scalar prefetch (1-D arrays only: SMEM
operands are lane-padded to 128, so a [R, 2] layout would inflate 64x).

The kernel produces NCHW (image-per-program blocks need the lane dimension
on W, and C=3 lanes would pad 43x); the public wrapper transposes back to
NHWC — a fused relayout copy, far cheaper than the scatter it replaces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# SMEM is ~1 MiB; leave headroom for Mosaic's own scalars.
_SMEM_BUDGET_BYTES = 800_000


def supports_pallas_densify(num_hits: int, num_channels: int, height: int) -> bool:
    """Static guard: TPU backend, 8-aligned sublane windows, SMEM fit."""
    smem = 4 * num_hits * (2 + num_channels)   # x, y, and C value columns (f32)
    return (
        jax.default_backend() == "tpu"
        and height % 8 == 0
        and height >= 8
        and num_channels <= 8
        and smem <= _SMEM_BUDGET_BYTES
    )


def _kernel(num_channels, width, starts_ref, x_ref, y_ref, *rest):
    vrefs, o_ref = rest[:num_channels], rest[num_channels]
    i = pl.program_id(0)
    o_ref[:] = jnp.zeros_like(o_ref)
    start = starts_ref[i]
    end = starts_ref[i + 1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, width), 2)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)

    def body(j, carry):
        x = x_ref[j]
        y = y_ref[j]
        # Mosaic needs a provably 8-aligned sublane base, so derive it from
        # the CLAMPED x ((clip(x) // 8) * 8 stays a pure aligned expression;
        # clipping xb itself defeats the alignment proof).  The row match
        # uses the ORIGINAL x: out-of-range x lands outside 0..7 relative
        # to the in-bounds window and selects nothing — exactly the XLA
        # scatter's drop-mode semantics (OOB y likewise matches no column).
        xb = pl.multiple_of(
            (jnp.clip(x, 0, o_ref.shape[2] - 1) // 8) * 8, 8
        )
        sel = ((row8 == (x - xb)) & (col == y)).astype(jnp.float32)
        delta = jnp.concatenate(
            [sel * vref[j] for vref in vrefs], axis=0
        ).astype(o_ref.dtype)
        o_ref[0, :, pl.ds(xb, 8), :] += delta
        return carry

    jax.lax.fori_loop(start, end, body, 0, unroll=False)


@functools.partial(
    jax.jit, static_argnames=("num_images", "height", "width", "interpret")
)
def densify_images_pallas(
    xy: jnp.ndarray,       # [R, 2] int32 pixel coordinates (owner-sorted)
    values: jnp.ndarray,   # [R, C] pixel values (padding rows beyond starts[-1])
    starts: jnp.ndarray,   # [num_images + 1] int32 CSR offsets into the bank
    num_images: int,
    height: int,
    width: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Dense NHWC images ``[num_images, H, W, C]`` from an owner-sorted bank.

    Semantics match ``scatter.densify_images`` when the bank is sorted by
    owner with padding at the end (duplicates accumulate; rows outside
    ``[starts[i], starts[i+1])`` never contribute).
    """
    channels = values.shape[-1]
    vals32 = values.astype(jnp.float32)
    columns = [vals32[:, c] for c in range(channels)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 + channels,     # starts, x, y, value columns
        grid=(num_images,),
        in_specs=[],
        out_specs=pl.BlockSpec(
            (1, channels, height, width),
            lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    nchw = pl.pallas_call(
        functools.partial(_kernel, channels, width),
        out_shape=jax.ShapeDtypeStruct(
            (num_images, channels, height, width), values.dtype
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts.astype(jnp.int32), xy[:, 0], xy[:, 1], *columns)
    return jnp.transpose(nchw, (0, 2, 3, 1))
