"""Unit tests for masked ops, scatter kernels, and losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dune_transformercvn_tpu.ops.losses import (
    class_balanced_loss,
    softmax_focal_loss,
)
from dune_transformercvn_tpu.ops.masked import MaskedBatchNorm, PReLU
from dune_transformercvn_tpu.ops.scatter import densify_images, pack_rows, pad_rows


def test_prelu_matches_definition():
    x = jnp.array([[-2.0, 3.0], [1.0, -1.0]])
    mod = PReLU(channels=2, init_value=0.1)
    params = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(params, x)
    np.testing.assert_allclose(y, [[-0.2, 3.0], [1.0, -0.1]], rtol=1e-6)


def test_masked_batchnorm_equals_packed_batchnorm():
    """BN over masked rows must equal BN over the packed (real-only) rows —
    the property the reference encodes by packing (packed_data.py:60-76)."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(10, 4)).astype(np.float32)
    mask = np.array([1, 1, 0, 1, 0, 1, 1, 0, 1, 1], bool)

    mod = MaskedBatchNorm(channels=4)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), mask=jnp.asarray(mask))

    y_masked, updated = mod.apply(
        variables, jnp.asarray(x), mask=jnp.asarray(mask), mutable=["batch_stats"]
    )

    packed = x[mask]
    mean = packed.mean(0)
    var = packed.var(0)
    expected = (packed - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(y_masked)[mask], expected, rtol=1e-4, atol=1e-5)

    # Running stats: torch momentum-0.1 update with unbiased variance.
    n = packed.shape[0]
    np.testing.assert_allclose(
        updated["batch_stats"]["mean"], 0.9 * 0 + 0.1 * mean, rtol=1e-5
    )
    np.testing.assert_allclose(
        updated["batch_stats"]["var"], 0.9 * 1 + 0.1 * var * n / (n - 1), rtol=1e-5
    )


def test_masked_batchnorm_spatial():
    """2D case: per-image mask over NHWC, stats over (N_real, H, W)."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 3, 2, 5)).astype(np.float32)
    mask = np.array([1, 0, 1, 1], bool)

    mod = MaskedBatchNorm(channels=5)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), mask=jnp.asarray(mask))
    y, _ = mod.apply(variables, jnp.asarray(x), mask=jnp.asarray(mask), mutable=["batch_stats"])

    real = x[mask].reshape(-1, 5)
    expected = (x - real.mean(0)) / np.sqrt(real.var(0) + 1e-5)
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4, atol=1e-5)


def test_masked_batchnorm_eval_uses_running_stats():
    x = jnp.ones((4, 3)) * 2.0
    mod = MaskedBatchNorm(channels=3)
    variables = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(variables, x, use_running_average=True)
    # running mean 0, var 1 -> y == x (scale 1, bias 0)
    np.testing.assert_allclose(y, x, rtol=1e-5)


def test_densify_images_drops_padding():
    xy = jnp.array([[0, 0], [1, 2], [1, 2], [3, 3]], jnp.int32)
    vals = jnp.array([[1.0], [2.0], [3.0], [99.0]])
    owner = jnp.array([0, 1, 1, 2], jnp.int32)  # owner 2 == num_images -> pad
    img = densify_images(xy, vals, owner, num_images=2, height=4, width=4)
    assert img.shape == (2, 4, 4, 1)
    assert img[0, 0, 0, 0] == 1.0
    assert img[1, 1, 2, 0] == 5.0  # duplicate hits accumulate
    assert img.sum() == 6.0        # padding hit dropped


def test_pack_pad_round_trip():
    rng = np.random.default_rng(2)
    B, L, C = 3, 5, 4
    data = rng.normal(size=(B, L, C)).astype(np.float32)
    mask = np.zeros((B, L), bool)
    counts = [2, 5, 1]
    for i, n in enumerate(counts):
        mask[i, :n] = True

    P = 12  # bucketed capacity > total real (8)
    slot_batch = np.full(P, B, np.int32)
    slot_pos = np.zeros(P, np.int32)
    cursor = 0
    for i, n in enumerate(counts):
        slot_batch[cursor:cursor + n] = i
        slot_pos[cursor:cursor + n] = np.arange(n)
        cursor += n

    packed = pack_rows(jnp.asarray(data), jnp.asarray(slot_batch), jnp.asarray(slot_pos))
    np.testing.assert_array_equal(np.asarray(packed)[:8], data[mask])

    restored = pad_rows(packed, jnp.asarray(slot_batch), jnp.asarray(slot_pos), B, L)
    np.testing.assert_array_equal(np.asarray(restored), np.where(mask[..., None], data, 0))


def test_focal_loss_equals_cross_entropy_at_gamma_zero():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, 4, size=16))
    focal = softmax_focal_loss(logits, targets, gamma=0.0)
    log_probs = jax.nn.log_softmax(logits)
    ce = -jnp.take_along_axis(log_probs, targets[:, None], axis=1).mean()
    np.testing.assert_allclose(focal, ce, rtol=1e-6)


def test_focal_loss_downweights_easy_examples():
    easy = jnp.array([[4.0, -4.0]])
    hard = jnp.array([[0.1, -0.1]])
    t = jnp.array([0])
    for logits in (easy, hard):
        g0 = softmax_focal_loss(logits, t, gamma=0.0)
        g2 = softmax_focal_loss(logits, t, gamma=2.0)
        assert g2 <= g0
    ratio_easy = softmax_focal_loss(easy, t, 2.0) / softmax_focal_loss(easy, t, 0.0)
    ratio_hard = softmax_focal_loss(hard, t, 2.0) / softmax_focal_loss(hard, t, 0.0)
    assert ratio_easy < ratio_hard


def test_focal_loss_masked_weights():
    logits = jnp.asarray(np.random.default_rng(4).normal(size=(6, 8)).astype(np.float32))
    targets = jnp.array([1, 2, -1, 3, -1, 0])
    weights = (targets >= 0).astype(jnp.float32)
    masked = softmax_focal_loss(logits, targets, 1.0, weights)
    manual = softmax_focal_loss(logits[jnp.array([0, 1, 3, 5])], targets[jnp.array([0, 1, 3, 5])], 1.0)
    np.testing.assert_allclose(masked, manual, rtol=1e-6)


def test_class_balanced_loss_runs():
    logits = jnp.asarray(np.random.default_rng(5).normal(size=(8, 4)).astype(np.float32))
    targets = jnp.asarray(np.arange(8) % 4)
    for loss_type in ("focal", "sigmoid", "softmax"):
        val = class_balanced_loss(targets, logits, beta=2.5, gamma=1.0, loss_type=loss_type)
        assert np.isfinite(float(val))


@pytest.mark.parametrize("C", [1, 3, 8])
def test_pallas_densify_matches_xla_scatter(C):
    """The Pallas densify kernel (interpret mode on CPU) == the XLA scatter
    on an owner-sorted bank with duplicates and tail padding.  Parametrized
    over channel counts: the kernel's lane axis encodes (w, c) = (l // C,
    l % C), so the one-hot algebra differs per C (C=1 exercises the
    degenerate lane==y case, C=8 the supports_pallas_densify cap)."""
    from dune_transformercvn_tpu.ops.pallas_densify import densify_images_pallas

    rng = np.random.default_rng(3)
    N, H, W = 3, 16, 11
    counts = [5, 0, 7]                       # image 1 empty
    owner = np.repeat(np.arange(N), counts).astype(np.int32)
    n = owner.size
    xy = np.stack([rng.integers(0, H, n), rng.integers(0, W, n)], 1).astype(np.int32)
    xy[1] = xy[0]                            # duplicate pixel -> accumulate
    xy[2] = (H + 4, 2)                       # out-of-range x -> dropped
    xy[3] = (3, W + 5)                       # out-of-range y -> dropped
    xy[5] = (-2, 4)                          # negative x -> dropped
    xy[6] = (7, -1)                          # negative y -> dropped
    xy[7] = (H - 1, W - 1)                   # far corner -> kept
    R = 16                                   # bank with padding rows at the end
    xy_full = np.concatenate([xy, np.zeros((R - n, 2), np.int32)])
    owner_full = np.concatenate([owner, np.full(R - n, N, np.int32)])
    vals = rng.normal(size=(R, C)).astype(np.float32)
    starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)

    ref = densify_images(
        jnp.asarray(xy_full), jnp.asarray(vals), jnp.asarray(owner_full), N, H, W
    )
    out = densify_images_pallas(
        jnp.asarray(xy_full), jnp.asarray(vals), jnp.asarray(starts),
        N, H, W, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


@pytest.mark.parametrize("C", [1, 3])
def test_pallas_densify_s2d_matches(C):
    """The kernel's space-to-depth emission == densify + the s2d transform
    SpaceToDepthStem would apply, including drop-mode OOB handling (the
    in-kernel validity logic differs from the plain path's OOB arithmetic,
    so the negative/overflow cases are re-exercised here)."""
    from dune_transformercvn_tpu.ops.pallas_densify import densify_images_pallas

    rng = np.random.default_rng(7)
    N, H, W = 3, 16, 12
    counts = [6, 0, 8]
    owner = np.repeat(np.arange(N), counts).astype(np.int32)
    n = owner.size
    xy = np.stack([rng.integers(0, H, n), rng.integers(0, W, n)], 1).astype(np.int32)
    xy[1] = xy[0]                            # duplicate pixel -> accumulate
    xy[2] = (H + 4, 2)                       # out-of-range x -> dropped
    xy[3] = (3, W + 5)                       # out-of-range y -> dropped
    xy[5] = (-2, 4)                          # negative x -> dropped
    xy[6] = (7, -1)                          # negative y -> dropped
    xy[7] = (H - 1, W - 1)                   # far corner -> kept
    R = 18
    xy_full = np.concatenate([xy, np.zeros((R - n, 2), np.int32)])
    owner_full = np.concatenate([owner, np.full(R - n, N, np.int32)])
    vals = rng.normal(size=(R, C)).astype(np.float32)
    starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)

    ref = densify_images(
        jnp.asarray(xy_full), jnp.asarray(vals), jnp.asarray(owner_full), N, H, W
    )
    ref = np.asarray(ref).reshape(N, H // 2, 2, W // 2, 2, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(N, H // 2, W // 2, 4 * C)
    out = densify_images_pallas(
        jnp.asarray(xy_full), jnp.asarray(vals), jnp.asarray(starts),
        N, H, W, space_to_depth=True, interpret=True,
    )
    assert out.shape == (N, H // 2, W // 2, 4 * C)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)


def test_densify_s2d_fallback_matches():
    """densify_images(space_to_depth=True) without CSR starts (the XLA
    scatter fallback) == plain densify + explicit transpose."""
    rng = np.random.default_rng(9)
    N, H, W, C, R = 2, 16, 12, 3, 20
    xy = np.stack([rng.integers(-2, H + 2, R), rng.integers(-2, W + 2, R)], 1)
    owner = rng.integers(0, N + 1, R)
    vals = rng.normal(size=(R, C)).astype(np.float32)
    args = (jnp.asarray(xy.astype(np.int32)), jnp.asarray(vals),
            jnp.asarray(owner.astype(np.int32)), N, H, W)
    plain = np.asarray(densify_images(*args))
    expected = plain.reshape(N, H // 2, 2, W // 2, 2, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(N, H // 2, W // 2, 4 * C)
    out = densify_images(*args, space_to_depth=True)
    np.testing.assert_array_equal(np.asarray(out), expected)


def test_batcher_emits_csr_starts():
    """The batcher's event/prong CSR offsets index an owner-sorted bank."""
    import os, tempfile
    from dune_transformercvn_tpu.data.batcher import Batcher
    from dune_transformercvn_tpu.data.dataset import EventDataset
    from dune_transformercvn_tpu.data.schema import make_synthetic_file

    path = os.path.join(tempfile.gettempdir(), "csr_starts.h5")
    if not os.path.exists(path):
        make_synthetic_file(path, num_events=12, seed=5)
    ds = EventDataset(path, event_current_targets=True)
    batcher = Batcher(ds, batch_size=4, coo_granularity=512)
    batch = batcher.build_batch(np.arange(4))

    for prefix, num_images in (("event", 4), ("prong", batch["slot_batch"].shape[0])):
        starts = batch[f"{prefix}_starts"]
        owner = batch[f"{prefix}_owner"]
        assert starts.shape == (num_images + 1,)
        assert starts[0] == 0
        for i in range(num_images):
            seg = owner[starts[i]:starts[i + 1]]
            assert (seg == i).all(), (prefix, i)
        # rows past the last offset are padding (out-of-range owners)
        assert (owner[starts[-1]:] >= num_images).all()


def test_pallas_coo_stem_matches_xla_scatter():
    """The Pallas COO-stem scatter kernel (interpret mode) is bit-identical
    to the XLA gather-matmul-scatter path, including drop-mode handling of
    out-of-grid coordinates, empty images, and padding rows."""
    from dune_transformercvn_tpu.ops.coo_conv import coo_stem_conv
    from dune_transformercvn_tpu.ops.pallas_coo_stem import coo_stem_conv_pallas

    rng = np.random.default_rng(3)
    B, H, W, c_in = 3, 48, 40, 3
    counts = [17, 0, 9]
    xy, vals, owner = [], [], []
    for b, nb in enumerate(counts):
        xy.append(np.stack(
            [rng.integers(0, H, nb), rng.integers(0, W, nb)], 1))
        vals.append(rng.normal(size=(nb, c_in)).astype(np.float32))
        owner.append(np.full(nb, b))
    # malformed coordinates inside an owner's CSR range: drop-mode on both
    xy.append(np.array([[H + 3, 1], [1, W + 2]]))
    vals.append(np.ones((2, c_in), np.float32))
    owner.append(np.full(2, B - 1))
    # padding rows at the end (outside every CSR range)
    pad = 5
    xy.append(np.zeros((pad, 2), int))
    vals.append(np.ones((pad, c_in), np.float32))
    owner.append(np.full(pad, B))

    xy = np.concatenate(xy).astype(np.int32)
    vals = np.concatenate(vals)
    owner = np.concatenate(owner).astype(np.int32)
    starts = np.concatenate(
        [[0], np.cumsum([17, 0, 9 + 2])]).astype(np.int32)

    for c_out in (16, 64):   # pack = 8 and pack = 2 lane layouts
        wk = rng.normal(size=(7, 7, c_in, c_out)).astype(np.float32) * 0.1
        bias = rng.normal(size=(c_out,)).astype(np.float32)
        ref = coo_stem_conv(
            jnp.asarray(xy), jnp.asarray(vals), jnp.asarray(owner),
            jnp.asarray(wk), jnp.asarray(bias), batch=B, height=H, width=W,
        )
        out = coo_stem_conv_pallas(
            jnp.asarray(xy), jnp.asarray(vals), jnp.asarray(starts),
            jnp.asarray(wk), jnp.asarray(bias),
            num_images=B, height=H, width=W, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
        )


def test_pallas_coo_stem_grad_matches_xla_scatter():
    """The hand-written VJP of the Pallas scatter (a row gather of the
    output cotangent) gives the same gradients wrt hit values, kernel
    weights, and bias as differentiating the XLA scatter path — including
    dropped out-of-grid taps and CSR padding rows, whose cotangents must
    vanish."""
    from dune_transformercvn_tpu.ops.coo_conv import coo_stem_conv
    from dune_transformercvn_tpu.ops.pallas_coo_stem import coo_stem_conv_pallas

    rng = np.random.default_rng(7)
    B, H, W, c_in, c_out = 2, 48, 40, 3, 64
    counts = [11, 6]
    xy, vals, owner = [], [], []
    for b, nb in enumerate(counts):
        xy.append(np.stack(
            [rng.integers(0, H, nb), rng.integers(0, W, nb)], 1))
        vals.append(rng.normal(size=(nb, c_in)).astype(np.float32))
        owner.append(np.full(nb, b))
    # malformed coordinate (drop-mode) + padding rows past the CSR ranges
    xy.append(np.array([[H + 1, 2]]))
    vals.append(np.ones((1, c_in), np.float32))
    owner.append(np.full(1, B - 1))
    xy.append(np.zeros((3, 2), int))
    vals.append(np.ones((3, c_in), np.float32))
    owner.append(np.full(3, B))
    xy = np.concatenate(xy).astype(np.int32)
    vals = np.concatenate(vals)
    owner = np.concatenate(owner).astype(np.int32)
    starts = np.asarray([0, 11, 18], np.int32)

    wk = rng.normal(size=(7, 7, c_in, c_out)).astype(np.float32) * 0.1
    bias = rng.normal(size=(c_out,)).astype(np.float32)
    out_h, out_w = (H + 6 - 7) // 2 + 1, (W + 6 - 7) // 2 + 1
    cot = rng.normal(size=(B, out_h, out_w, c_out)).astype(np.float32)

    def loss_ref(vals, wk, bias):
        out = coo_stem_conv(
            jnp.asarray(xy), vals, jnp.asarray(owner), wk, bias,
            batch=B, height=H, width=W,
        )
        return jnp.sum(out * cot)

    def loss_pallas(vals, wk, bias):
        out = coo_stem_conv_pallas(
            jnp.asarray(xy), vals, jnp.asarray(starts), wk, bias,
            num_images=B, height=H, width=W, interpret=True,
        )
        return jnp.sum(out * cot)

    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(
        jnp.asarray(vals), jnp.asarray(wk), jnp.asarray(bias))
    g_pal = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))(
        jnp.asarray(vals), jnp.asarray(wk), jnp.asarray(bias))
    for a, b, name in zip(g_ref, g_pal, ("values", "weights", "bias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
            err_msg=name)
    # dropped/padding rows must receive zero value-gradient
    np.testing.assert_array_equal(np.asarray(g_pal[0][17:]), 0.0)
