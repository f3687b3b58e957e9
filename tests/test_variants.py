"""Embedder-variant families and pooling blocks: shapes, masking, wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dune_transformercvn_tpu.models.mobilenet import MobileNetV2
from dune_transformercvn_tpu.models.pooling import MaskedSoftmaxPooling, MultiHeadPooling
from dune_transformercvn_tpu.models.resnet import ResNetStack
from dune_transformercvn_tpu.models.sparse_convnext import SparseConvNeXt
from dune_transformercvn_tpu.models.sparse_fcnn import SparseFCNN


def small_images(seed=0, n=3, h=64, w=48, c=3, occupancy=0.05):
    rng = np.random.default_rng(seed)
    occ = rng.uniform(size=(n, h, w)) < occupancy
    imgs = rng.uniform(0.1, 1.0, size=(n, h, w, c)).astype(np.float32) * occ[..., None]
    return jnp.asarray(imgs)


@pytest.mark.parametrize(
    "factory",
    [
        lambda: MobileNetV2(
            output_dim=16, initial_features=8, last_features=32,
            structure=((1, 8, 1, 1), (4, 16, 2, 2)),
        ),
        lambda: ResNetStack(output_dim=16, initial_features=8, block_config=(1, 1)),
        lambda: SparseConvNeXt(
            output_dim=16, hidden_features=(8, 16), hidden_depths=(1, 1),
            drop_path_rate=0.1,
        ),
        lambda: SparseFCNN(
            output_dim=16, initial_features=8, stage_features=(8, 16),
        ),
    ],
    ids=["mobilenet", "resnet", "convnext", "fcnn"],
)
def test_variant_embedder_forward_and_masking(factory):
    net = factory()
    images = small_images()
    mask = jnp.asarray([True, True, False])

    variables = jax.jit(lambda x, m: net.init(jax.random.PRNGKey(0), x, m, False))(
        images, mask
    )
    out = jax.jit(lambda v, x, m: net.apply(v, x, m, False))(variables, images, mask)
    assert out.shape == (3, 16)
    assert np.isfinite(np.asarray(out)).all()

    # masked (padded) image content must not influence real rows' output
    poisoned = images.at[2].set(7.0)
    out2 = jax.jit(lambda v, x, m: net.apply(v, x, m, False))(variables, poisoned, mask)
    np.testing.assert_allclose(
        np.asarray(out[:2]), np.asarray(out2[:2]), atol=1e-5
    )

    # train mode with BN mutation + rngs runs
    (out3, updates) = jax.jit(
        lambda v, x, m, r: net.apply(
            v, x, m, True, rngs=r, mutable=["batch_stats"]
        )
    )(variables, images, mask,
      {"dropout": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(out3)).all()


def test_variant_registry_wiring():
    from dune_transformercvn_tpu.config import Options
    from dune_transformercvn_tpu.models.network import ModelConfig, create_pixel_embedder

    o = Options()
    o.initial_pixel_dim = 8
    for family in ("mobilenet", "resnet", "convnext", "fcnn"):
        cfg = ModelConfig.from_options(o, 4, 2, 3, 4, 8, embedder=family)
        module = create_pixel_embedder(cfg, 16, "embed")
        assert module is not None
    with pytest.raises(ValueError):
        cfg = ModelConfig.from_options(o, 4, 2, 3, 4, 8, embedder="nope")
        create_pixel_embedder(cfg, 16, "embed")


def test_induced_set_attention_block():
    from dune_transformercvn_tpu.models.encoder import InducedSetAttentionBlock

    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.normal(size=(2, 6, 16)).astype(np.float32))
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], bool)
    mod = InducedSetAttentionBlock(hidden_dim=16, num_heads=4, num_indices=3)
    v = jax.jit(lambda x, m: mod.init(jax.random.PRNGKey(0), x, m))(tokens, mask)
    out = jax.jit(lambda v, x, m: mod.apply(v, x, m))(v, tokens, mask)
    assert out.shape == (2, 6, 16)
    # masked tokens don't leak into real tokens through the induced summary
    out2 = jax.jit(lambda v, x, m: mod.apply(v, x, m))(
        v, tokens.at[0, 4].set(99.0), mask
    )
    np.testing.assert_allclose(
        np.asarray(out[0, :3]), np.asarray(out2[0, :3]), atol=1e-4
    )


def test_masked_softmax_pooling():
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.normal(size=(2, 5, 8)).astype(np.float32))
    mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], bool)
    mod = MaskedSoftmaxPooling()
    v = mod.init(jax.random.PRNGKey(0), tokens, mask)
    out = mod.apply(v, tokens, mask)
    assert out.shape == (2, 8)
    # poisoning masked tokens changes nothing
    out2 = mod.apply(v, tokens.at[0, 4].set(100.0), mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)
    # pooled vector lies in the convex hull of real tokens (weights sum to 1)
    single = mask.at[0, 1:].set(False)
    out3 = mod.apply(v, tokens, single)
    np.testing.assert_allclose(np.asarray(out3[0]), np.asarray(tokens[0, 0]), atol=1e-5)


def test_multi_head_pooling():
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.normal(size=(2, 6, 16)).astype(np.float32))
    mask = jnp.asarray([[1, 1, 0, 0, 0, 0], [1, 1, 1, 1, 1, 1]], bool)
    mod = MultiHeadPooling(num_heads=4)
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), tokens, mask)
    out = jax.jit(mod.apply)(v, tokens, mask)
    assert out.shape == (2, 16)
    out2 = jax.jit(mod.apply)(v, tokens.at[0, 3].set(50.0), mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)
