"""Space-to-depth stem (``stem_space_to_depth``): exactness + params.

The DenseNet stem (7x7/2 conv over 3-channel images) contracts over
kh*kw*cin with cin=3 riding the 128-wide MXU lane axis; round-4 roofline
profiling (artifacts/conv_bw_study_v5e.json) measured its forward and
weight-grad fusions as the step's largest positive residual.
``SpaceToDepthStem`` computes the same map as a 4x4/1 conv over the 2x2
space-to-depth input.  These tests pin the contract:

* it declares the SAME parameters as the ``nn.Conv`` it replaces (kernel
  [7,7,C,F] + bias [F], same initializers) — checkpoints, the torch
  importer, and the BN-fold pass are untouched;
* forward matches the direct conv (fp32, reduction-order tolerance);
* gradients match;
* odd spatial extents fall back to the direct conv.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from dune_transformercvn_tpu.models.densenet import DenseNet, SpaceToDepthStem


def _direct_conv(features):
    return nn.Conv(
        features, (7, 7), strides=(2, 2), padding=3, param_dtype=jnp.float32
    )


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(3, 40, 28, 3)).astype(np.float32))


def test_stem_params_and_forward_match(image):
    conv = _direct_conv(16)
    s2d = SpaceToDepthStem(16)
    v = jax.jit(conv.init)(jax.random.PRNGKey(0), image)
    v2 = jax.jit(s2d.init)(jax.random.PRNGKey(0), image)
    # same tree: same names/shapes AND same values under the same seed
    flat_a = jax.tree_util.tree_flatten_with_path(v)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(v2)[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (_, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    y_ref = jax.jit(conv.apply)(v, image)
    y = jax.jit(s2d.apply)(v, image)  # the DIRECT conv's variables
    assert y.shape == y_ref.shape == (3, 20, 14, 16)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )


def test_stem_gradients_match(image):
    conv = _direct_conv(8)
    s2d = SpaceToDepthStem(8)
    v = jax.jit(conv.init)(jax.random.PRNGKey(1), image)

    def loss(params, model):
        y = model.apply(params, image)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))

    g_ref = jax.jit(lambda p: jax.grad(loss)(p, conv))(v)
    g = jax.jit(lambda p: jax.grad(loss)(p, s2d))(v)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
        jax.tree_util.tree_flatten_with_path(g)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4, err_msg=str(pa)
        )


def test_odd_extent_falls_back(image):
    odd = image[:, :39, :27, :]
    conv = _direct_conv(8)
    s2d = SpaceToDepthStem(8)
    v = jax.jit(conv.init)(jax.random.PRNGKey(2), odd)
    np.testing.assert_allclose(
        np.asarray(jax.jit(s2d.apply)(v, odd)),
        np.asarray(jax.jit(conv.apply)(v, odd)),
        rtol=1e-6, atol=1e-6,
    )


def _to_s2d(x):
    n, h, w, c = x.shape
    return (
        x.reshape(n, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, h // 2, w // 2, 4 * c)
    )


def test_stem_pre_s2d_input_matches(image):
    """With ``in_channels`` set, the stem recognises input already in s2d
    layout (as emitted by the Pallas densify kernel) and skips its own
    reshape/transpose — bit-identical to transforming internally."""
    s2d = SpaceToDepthStem(16, in_channels=3)
    v = jax.jit(s2d.init)(jax.random.PRNGKey(4), image)
    y_internal = jax.jit(s2d.apply)(v, image)
    y_pre = jax.jit(s2d.apply)(v, _to_s2d(image))
    np.testing.assert_array_equal(np.asarray(y_pre), np.asarray(y_internal))


def test_densenet_pre_s2d_input(image):
    """The full DenseNet accepts pre-s2d images when stem_in_channels is
    configured (network.py emits them straight from the densify when the
    toggle is on), with the identical param tree."""
    kw = dict(
        output_dim=8, initial_features=16, growth_rate=8,
        batch_norm_size=2, block_config=(1, 1), stem_space_to_depth=True,
    )
    net = DenseNet(**kw, stem_in_channels=3)
    v = jax.jit(lambda r, x: net.init(r, x, None, False))(
        jax.random.PRNGKey(5), image
    )
    y_nhwc = jax.jit(lambda v, x: net.apply(v, x, None, False))(v, image)
    y_pre = jax.jit(lambda v, x: net.apply(v, x, None, False))(v, _to_s2d(image))
    np.testing.assert_array_equal(np.asarray(y_pre), np.asarray(y_nhwc))


def test_densenet_toggle_matches(image):
    kw = dict(
        output_dim=8, initial_features=16, growth_rate=8,
        batch_norm_size=2, block_config=(1, 1),
    )
    base = DenseNet(**kw)
    fast = DenseNet(**kw, stem_space_to_depth=True)
    v = jax.jit(lambda r, x: base.init(r, x, None, False))(
        jax.random.PRNGKey(3), image
    )
    flat_a = [p for p, _ in jax.tree_util.tree_flatten_with_path(v)[0]]
    v2 = jax.jit(lambda r, x: fast.init(r, x, None, False))(
        jax.random.PRNGKey(3), image
    )
    flat_b = [p for p, _ in jax.tree_util.tree_flatten_with_path(v2)[0]]
    assert flat_a == flat_b
    y_ref = jax.jit(lambda v, x: base.apply(v, x, None, False))(v, image)
    y = jax.jit(lambda v, x: fast.apply(v, x, None, False))(v, image)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-4
    )
