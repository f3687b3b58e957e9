"""Pallas TPU kernel for the COO-stem convolution's scatter (sparse conv7/2).

:func:`..ops.coo_conv.coo_stem_conv` runs MinkowskiEngine's stem case
(sparse_dense_net.py:39-44) as gather-matmul-scatter; the measured crossover
(artifacts/coo_crossover_v5e.json) showed ~99% of its cost is the XLA
scatter-add of the ``[N*49, C_out]`` contribution rows — a serialized HBM
read-modify-write loop (28.7 of ~29 ms at 1% occupancy).  This kernel
replaces that scatter with the per-image VMEM-resident pattern proven by
``pallas_densify``:

* **XLA prep** (:func:`stem_patches`): because ``k=7, stride=2``, each hit
  touches a fixed 4x4 window of output pixels whose kernel taps depend only
  on the hit coordinate's PARITY (x even -> x-offsets {5,3,1}, odd ->
  {6,4,2,0}).  Four parity-specific ``[C_in, 16*C_out]`` matmuls (MXU) give
  every hit its full 4x4xC_out output patch, with image-border and
  out-of-grid taps zeroed.  The patch is then lane-packed ``[N, 16, 128]``:
  sublane = tap (a*4+b), lanes = ``P = 128//C_out`` adjacent output columns
  x C_out channels, each tap's values pre-placed in its column slot — so
  the kernel never shuffles lanes.
* **Kernel**: grid ``(num_images, H-tiles)``; each program owns an output
  tile ``[TILE_H, W2PAD, 128]`` in VMEM (f32).  The image's patch rows are
  DMA'd HBM->VMEM in double-buffered chunks; each hit then costs ~16
  masked ``[16,128]`` vector FMAs plus 4 sublane-window read-modify-writes
  — VMEM bandwidth instead of serialized HBM.

Semantics are identical to the XLA scatter path (fp32 accumulation,
drop-mode for malformed coordinates); golden-tested against it in
tests/test_coo_embedder.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SMEM_BUDGET_BYTES = 800_000
_CHUNK = 128          # patch rows per DMA chunk (2 x 1 MiB buffers)
_TILE_H = 104         # output rows per grid program (8-aligned)


def supports_pallas_coo_stem(
    num_hits: int,
    c_in: int,
    c_out: int,
    height: int,
    width: int,
    stride: int,
    padding: int,
    kernel: int,
) -> bool:
    """Static guard: production stem geometry on a TPU backend.  Hit
    coordinate columns ride in SMEM scalar prefetch, which caps the bank
    size (the low-occupancy regime this kernel targets fits easily)."""
    smem = 4 * num_hits * 2   # x, y int32 prefetch columns
    return (
        jax.default_backend() == "tpu"
        and kernel == 7
        and stride == 2
        and padding == 3
        and c_out in (16, 32, 64, 128)
        and smem <= _SMEM_BUDGET_BYTES
    )


def stem_patches(
    xy: jnp.ndarray,              # [N, 2] int32 hit coordinates
    values: jnp.ndarray,          # [N, C_in] preprocessed hit features
    kernel_weights: jnp.ndarray,  # [7, 7, C_in, C_out] HWIO
    height: int,
    width: int,
) -> jnp.ndarray:
    """Per-hit lane-packed 4x4 output patches ``[N, 16, 128]`` (fp32).

    Tap math for k=7, s=2, p=3: output row ``ox`` receives hit ``x`` through
    kernel offset ``a_off = x + 3 - 2*ox``; the valid ``ox`` are
    ``ox0 + a`` for ``a in 0..3`` with ``ox0 = (x-2)//2`` and
    ``a_off = (5 + x%2) - 2a`` (negative -> no tap).  Symmetric in y.
    """
    k, _, c_in, c_out = kernel_weights.shape
    pack = 128 // c_out
    out_h = (height + 2 * 3 - k) // 2 + 1
    out_w = (width + 2 * 3 - k) // 2 + 1
    n = xy.shape[0]

    x, y = xy[:, 0].astype(jnp.int32), xy[:, 1].astype(jnp.int32)
    ox0 = (x - 2) // 2
    oy0 = (y - 2) // 2

    # Parity-specific tap tables: W_par[px, py] : [C_in, 4*4*C_out].
    # Round the weights to the compute dtype FIRST (then accumulate fp32),
    # matching the XLA fallback's kernel_weights.astype(values.dtype) dot
    # and the dense family's stem_kernel.astype(dtype) conv — without this
    # the Pallas path computes with unrounded fp32 weights under bf16.
    w32 = kernel_weights.astype(values.dtype).astype(jnp.float32)
    offs = {p: [(5 + p) - 2 * a for a in range(4)] for p in (0, 1)}

    def tap(ax, by):
        if ax < 0 or by < 0:
            return jnp.zeros((c_in, c_out), jnp.float32)
        return w32[ax, by]

    w_par = {}
    for px in (0, 1):
        for py in (0, 1):
            taps = jnp.stack(
                [jnp.stack([tap(ax, by) for by in offs[py]], 0)
                 for ax in offs[px]], 0
            )                                    # [4, 4, C_in, C_out]
            w_par[(px, py)] = taps.transpose(2, 0, 1, 3).reshape(
                c_in, 16 * c_out
            )

    vals32 = values.astype(jnp.float32)
    patch = jnp.zeros((n, 16 * c_out), jnp.float32)
    for px in (0, 1):
        for py in (0, 1):
            sel = ((x % 2 == px) & (y % 2 == py)).astype(jnp.float32)
            patch = patch + (sel[:, None] * vals32) @ w_par[(px, py)]
    patch = patch.reshape(n, 4, 4, c_out)

    # Drop-mode masks: out-of-grid hits and out-of-range output rows/cols.
    a4 = jnp.arange(4)
    in_grid = (x >= 0) & (x < height) & (y >= 0) & (y < width)
    mask_a = (ox0[:, None] + a4 >= 0) & (ox0[:, None] + a4 < out_h)
    mask_b = (oy0[:, None] + a4 >= 0) & (oy0[:, None] + a4 < out_w)
    patch = (
        patch
        * mask_a[:, :, None, None]
        * mask_b[:, None, :, None]
        * in_grid[:, None, None, None]
    )

    # Lane packing: tap (a,b) lands in column slot (oy0+b) % pack.
    if pack == 1:
        return patch.reshape(n, 16, c_out)
    slot = jnp.mod(oy0[:, None] + a4, pack)               # [N, 4]
    place = jax.nn.one_hot(slot, pack, dtype=jnp.float32)  # [N, 4, pack]
    packed = patch[:, :, :, None, :] * place[:, None, :, :, None]
    return packed.reshape(n, 16, 128)


def _kernel(
    out_h, out_w, pack, tile_h, w2, w2pad, chunk,
    starts_ref, x_ref, y_ref, patch_ref, o_ref, chunk_ref, sem_ref,
):
    i = pl.program_id(0)
    t = pl.program_id(1)
    o_ref[:] = jnp.zeros_like(o_ref)
    start = starts_ref[i]
    end = starts_ref[i + 1]
    n = end - start
    nc = (n + chunk - 1) // chunk
    h_lo = t * tile_h
    row16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)

    def dma(c, slot):
        return pltpu.make_async_copy(
            patch_ref.at[pl.ds(start + c * chunk, chunk)],
            chunk_ref.at[slot],
            sem_ref.at[slot],
        )

    @pl.when(nc > 0)
    def _():
        dma(0, 0).start()

    def chunk_body(c, _):
        slot = jax.lax.rem(c, 2)
        dma(c, slot).wait()

        @pl.when(c + 1 < nc)
        def _():
            dma(c + 1, jax.lax.rem(c + 1, 2)).start()

        m = jnp.minimum(chunk, n - c * chunk)

        def hit_body(j, _):
            g = start + c * chunk + j
            x = x_ref[g]
            y = y_ref[g]
            # floor division for possibly-negative numerators
            ox0 = jax.lax.select(x >= 2, (x - 2) // 2, -((3 - x) // 2))
            oy0 = jax.lax.select(y >= 2, (y - 2) // 2, -((3 - y) // 2))
            g0 = jnp.clip(
                jax.lax.select(oy0 >= 0, oy0 // pack, jnp.int32(0)),
                0, w2 - 1,
            )
            sb = pl.multiple_of((g0 // 8) * 8, 8)
            tile = chunk_ref[slot, j]                       # [16, 128]

            # this hit's output rows vs this program's H-tile
            for a in range(4):
                oxa = ox0 + a
                row_local = oxa - h_lo
                ok = (oxa >= 0) & (oxa < out_h) \
                    & (row_local >= 0) & (row_local < tile_h)

                @pl.when(ok)
                def _(a=a, row_local=row_local, oy0=oy0, sb=sb, tile=tile):
                    delta = jnp.zeros((16, 128), jnp.float32)
                    for b in range(4):
                        oyb = oy0 + b
                        rb = jnp.clip(
                            jax.lax.select(
                                oyb >= 0, oyb // pack, jnp.int32(0)
                            ),
                            0, w2 - 1,
                        ) - sb
                        delta = delta + (
                            (row16 == rb).astype(jnp.float32)
                            * tile[a * 4 + b:a * 4 + b + 1, :]
                        )
                    o_ref[0, row_local, pl.ds(sb, 16), :] += delta

            return 0

        jax.lax.fori_loop(0, m, hit_body, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, nc, chunk_body, 0, unroll=False)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11)
)
def _scatter_patches(
    patch, starts, xy_x, xy_y,
    num_images, n_tiles, tile_h, w2pad, out_h, out_w, pack, interpret,
):
    """The pallas scatter with a hand-written VJP: the backward of a
    sum-scatter is a gather, which XLA does efficiently (it is scatter that
    serializes) — and ``pallas_call`` has no automatic differentiation, so
    without this the kernel would break the training path it accelerates.

    ``patch[n, t, l]`` is added to exactly one output element
    ``out[img(n), ox0(n) + t//4, (oy0(n) + t%4) // pack, l]`` (the kernel
    broadcasts each tap row across a one-hot sublane mask), so the
    cotangent of ``patch`` is a per-(hit, tap) row gather of the output
    cotangent.  Cotangents of dropped taps are cleaned up downstream by
    :func:`stem_patches`'s mask multiplications.
    """
    w2 = -(-out_w // pack)
    return pl.pallas_call(
        functools.partial(
            _kernel, out_h, out_w, pack, tile_h, w2, w2pad, _CHUNK
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_images, n_tiles * tile_h, w2pad, 128), jnp.float32
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_images, n_tiles),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, tile_h, w2pad, 128),
                lambda i, t, *_: (i, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, _CHUNK, 16, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=interpret,
    )(starts, xy_x, xy_y, patch)


def _scatter_patches_fwd(
    patch, starts, xy_x, xy_y,
    num_images, n_tiles, tile_h, w2pad, out_h, out_w, pack, interpret,
):
    out = _scatter_patches(
        patch, starts, xy_x, xy_y,
        num_images, n_tiles, tile_h, w2pad, out_h, out_w, pack, interpret,
    )
    return out, (starts, xy_x, xy_y, patch.shape[0])


def _scatter_patches_bwd(
    num_images, n_tiles, tile_h, w2pad, out_h, out_w, pack, interpret,
    res, g,
):
    starts, xy_x, xy_y, n = res
    m = xy_x.shape[0]           # real bank rows; patch also has a _CHUNK
    a4 = jnp.arange(4, dtype=jnp.int32)   # DMA-tail pad (n = m + _CHUNK)
    ox0 = jnp.where(xy_x >= 2, (xy_x - 2) // 2, -((3 - xy_x) // 2))
    oy0 = jnp.where(xy_y >= 2, (xy_y - 2) // 2, -((3 - xy_y) // 2))
    # owner image of each bank row from the CSR offsets (padding rows sit
    # past starts[-1]; clamp them onto image 0 — their cotangent is masked
    # to zero by stem_patches' in-grid/in-range masks)
    row = jnp.arange(m, dtype=jnp.int32)
    img = jnp.searchsorted(starts, row, side="right") - 1
    img = jnp.clip(img, 0, num_images - 1)
    rows = ox0[:, None] + a4                                 # [N, 4] out rows
    grp = jnp.where(                                         # [N, 4] col group
        oy0[:, None] + a4 >= 0, (oy0[:, None] + a4) // pack, 0
    )
    h_pad, w_pad = n_tiles * tile_h, w2pad
    valid = (
        (rows >= 0) & (rows < h_pad)
        & (grp >= 0) & (grp < w_pad)
    )
    rows_c = jnp.clip(rows, 0, h_pad - 1)
    grp_c = jnp.clip(grp, 0, w_pad - 1)
    # dpatch[n, a*4+b, :] = g[img(n), ox0+a, grp(b), :]
    dp = g[img[:, None, None], rows_c[:, :, None], grp_c[:, None, :], :]
    dp = dp * valid[:, :, None, None]                         # [N, 4, 4, 128]
    # bank rows outside every CSR range (OOB-owner padding, the _CHUNK DMA
    # tail) were never read by the forward scatter: zero their cotangent
    covered = row < starts[-1]
    dp = dp * covered[:, None, None, None]
    dp = jnp.pad(dp.reshape(m, 16, 128), ((0, n - m), (0, 0), (0, 0)))
    return (dp, None, None, None)


_scatter_patches.defvjp(_scatter_patches_fwd, _scatter_patches_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("num_images", "height", "width", "interpret"),
)
def coo_stem_conv_pallas(
    xy: jnp.ndarray,              # [N, 2] int32 (owner-sorted bank)
    values: jnp.ndarray,          # [N, C_in]
    starts: jnp.ndarray,          # [num_images + 1] CSR offsets
    kernel_weights: jnp.ndarray,  # [7, 7, C_in, C_out]
    bias: jnp.ndarray,            # [C_out]
    num_images: int,
    height: int,
    width: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sparse stem conv7/2 into a dense ``[B, out_h, out_w, C_out]`` grid.

    Equals ``coo_conv.coo_stem_conv`` (and therefore the dense
    ``conv(densify(hits))``) exactly: fp32 accumulation, drop-mode borders.
    """
    k, _, c_in, c_out = kernel_weights.shape
    pack = 128 // c_out
    out_h = (height + 6 - k) // 2 + 1
    out_w = (width + 6 - k) // 2 + 1
    w2 = -(-out_w // pack)                       # ceil
    w2pad = ((w2 - 1) // 8) * 8 + 16
    n_tiles = -(-out_h // _TILE_H)
    out_h_pad = n_tiles * _TILE_H

    patch = stem_patches(xy, values, kernel_weights, height, width)
    patch = jnp.pad(patch, ((0, _CHUNK), (0, 0), (0, 0)))

    packed = _scatter_patches(
        patch,
        starts.astype(jnp.int32),
        xy[:, 0].astype(jnp.int32),
        xy[:, 1].astype(jnp.int32),
        num_images, n_tiles, _TILE_H, w2pad, out_h, out_w, pack, interpret,
    )
    # Bias-add + downcast FIRST, on the kernel's packed fp32 output (the
    # bias tiles across the lane axis: lane = slot * c_out + channel), so
    # every downstream relayout/pad/slice moves compute-dtype bytes instead
    # of fp32 — the COO family's profiled formatting cost halves.  Value-
    # identical to slicing first: reshape/slice do not change elements.
    bias_lanes = jnp.tile(bias.astype(jnp.float32), pack)
    packed = (packed + bias_lanes).astype(values.dtype)
    # unpack: [B, H, W2PAD, pack, C_out] -> columns w = group*pack + slot
    grid = packed.reshape(num_images, out_h_pad, w2pad * pack, c_out)
    return grid[:, :out_h, :out_w, :]
