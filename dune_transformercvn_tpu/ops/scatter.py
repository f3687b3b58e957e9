"""COO <-> dense image / sequence scatter-gather with static shapes.

Replaces the reference's dynamic COO collation + ``sparse_to_dense``
scatter-add (neutrino_full_dense_trainer.py:15-24) and the TorchScript'd
masked pack/pad kernels (packed_data.py:60-95).  All shapes here are static;
padding rows carry out-of-range indices and are silently dropped via
``mode="drop"``, so the scatters lower to single fused XLA scatter ops with no
host synchronization and no recompilation.
"""

from __future__ import annotations

import jax.numpy as jnp


def densify_images(
    xy: jnp.ndarray,       # [N, 2] int32 pixel coordinates
    values: jnp.ndarray,   # [N, C] pixel values
    owner: jnp.ndarray,    # [N] int32 image index; >= num_images means padding
    num_images: int,
    height: int,
    width: int,
    starts: jnp.ndarray = None,  # optional [num_images+1] CSR offsets
    space_to_depth: bool = False,
) -> jnp.ndarray:
    """Scatter-add COO hits into dense NHWC images ``[num_images, H, W, C]``.

    When ``starts`` is provided (the batcher's per-image CSR offsets over an
    owner-sorted bank) and the backend supports it, the build runs as a
    Pallas kernel with VMEM-resident per-image accumulation — 8.4x faster
    than XLA's serialized scatter lowering on a v5e (see
    ``ops/pallas_densify.py``).  Otherwise falls back to the XLA scatter,
    which needs no ordering guarantee.

    ``space_to_depth`` returns the 2x2 space-to-depth layout
    ``[num_images, H/2, W/2, 4C]`` instead (requires even H, W): the Pallas
    kernel emits it directly from the hit coordinates at zero extra cost,
    deleting the full read+write HBM pass an XLA transpose of both image
    banks costs (which round 4 measured eating the stem fusion win,
    ``artifacts/conv_bw_study_s2d_v5e.json``); the scatter fallback pays
    that transpose.
    """
    if space_to_depth and (height % 2 or width % 2):
        raise ValueError(f"space_to_depth needs even H, W; got {height}x{width}")
    if starts is not None:
        from .pallas_densify import densify_images_pallas, supports_pallas_densify

        if supports_pallas_densify(xy.shape[0], values.shape[-1], height,
                                   space_to_depth, width):
            return densify_images_pallas(
                xy, values, starts, num_images, height, width,
                space_to_depth=space_to_depth,
            )
    # ``mode="drop"`` only drops indices that are out of range AFTER numpy's
    # negative-index wrap; push negative coordinates past the bounds so they
    # are genuinely dropped (matching the Pallas kernel and the COO path).
    oob = jnp.int32(max(num_images, height, width))
    owner, x, y = (
        jnp.where(idx < 0, oob, idx) for idx in (owner, xy[:, 0], xy[:, 1])
    )
    images = jnp.zeros((num_images, height, width, values.shape[-1]), values.dtype)
    images = images.at[owner, x, y].add(
        values, mode="drop", unique_indices=False, indices_are_sorted=False
    )
    if space_to_depth:
        n, h, w, c = images.shape
        images = (
            images.reshape(n, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, h // 2, w // 2, 4 * c)
        )
    return images


def pack_rows(
    data: jnp.ndarray,        # [B, L, ...]
    slot_batch: jnp.ndarray,  # [P] int32 event row per packed slot
    slot_pos: jnp.ndarray,    # [P] int32 position within event
) -> jnp.ndarray:
    """Gather padded ``[B, L, ...]`` rows into packed ``[P, ...]`` layout.

    Padding slots carry ``slot_batch == B`` (out of range); gather clips, so
    they read row ``B-1`` — callers must mask downstream (the masked BN /
    scatter-drop pattern guarantees they never contribute).
    """
    return data[
        jnp.clip(slot_batch, 0, data.shape[0] - 1),
        jnp.clip(slot_pos, 0, data.shape[1] - 1),
    ]


def pad_rows(
    packed: jnp.ndarray,      # [P, C]
    slot_batch: jnp.ndarray,  # [P]
    slot_pos: jnp.ndarray,    # [P]
    batch_size: int,
    max_length: int,
) -> jnp.ndarray:
    """Scatter packed rows back to ``[B, L, C]``; padding slots are dropped."""
    out = jnp.zeros((batch_size, max_length, packed.shape[-1]), packed.dtype)
    return out.at[slot_batch, slot_pos].set(packed, mode="drop")
