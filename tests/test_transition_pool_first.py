"""Transition ``pool_first`` (``transition_pool_first``): exactness + params.

A DenseNet transition (reference dense_net.py's ``_Transition``: BN ->
PReLU -> 1x1 conv -> 2x2/2 avg pool) ends with two LINEAR ops, so they
commute: pooling FIRST computes the same map (fp rounding aside) with 4x
fewer conv FLOPs and — the actual motivation on a v5e, where the step is
HBM-bound — without ever materializing the full-resolution conv output
(the pool instead fuses into the preceding normalize/PReLU chain,
deleting one full-res write+read HBM pass per transition).  These tests
pin the contract:

* the SAME parameter tree either way (same names/shapes/values under the
  same seed) — checkpoints, the torch importer, and BN fold untouched;
* forward matches in fp32 at eval AND train semantics (including the
  batch_stats update, which happens before the commuted pair);
* gradients match;
* odd spatial extents match too (VALID pooling truncates rows/cols
  pointwise, which also commutes with a 1x1 conv);
* the full DenseNet embedder is invariant to the flag.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dune_transformercvn_tpu.models.densenet import DenseNet, Transition


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(4, 20, 14, 12)).astype(np.float32))


@pytest.fixture(scope="module")
def mask():
    m = np.ones((4,), dtype=bool)
    m[-1] = False  # one padded row, exercising the masked BN path
    return jnp.asarray(m)


def _pair(features=6):
    return Transition(features), Transition(features, pool_first=True)


def test_same_param_tree(image, mask):
    ref, pf = _pair()
    v_ref = jax.jit(lambda r, x: ref.init(r, x, mask))(
        jax.random.PRNGKey(0), image)
    v_pf = jax.jit(lambda r, x: pf.init(r, x, mask))(
        jax.random.PRNGKey(0), image)
    flat_a = jax.tree_util.tree_flatten_with_path(v_ref)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(v_pf)[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (_, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("train", [False, True])
def test_forward_and_stats_match(image, mask, train):
    ref, pf = _pair()
    v = jax.jit(lambda r, x: ref.init(r, x, mask))(
        jax.random.PRNGKey(1), image)

    def run(mod, x):
        return mod.apply(v, x, mask, train, mutable=["batch_stats"])

    y_ref, s_ref = jax.jit(lambda x: run(ref, x))(image)
    y_pf, s_pf = jax.jit(lambda x: run(pf, x))(image)
    assert y_ref.shape == y_pf.shape == (4, 10, 7, 6)
    np.testing.assert_allclose(
        np.asarray(y_pf), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    # BN statistics update is upstream of the commuted pair: identical
    for (_, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(s_ref)[0],
        jax.tree_util.tree_flatten_with_path(s_pf)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gradients_match(image, mask):
    ref, pf = _pair()
    v = jax.jit(lambda r, x: ref.init(r, x, mask))(
        jax.random.PRNGKey(2), image)

    def loss(params, mod):
        out, _ = mod.apply(
            {**v, "params": params}, image, mask, True,
            mutable=["batch_stats"],
        )
        return (out * out).mean()

    g_ref = jax.jit(lambda p: jax.grad(loss)(p, ref))(v["params"])
    g_pf = jax.jit(lambda p: jax.grad(loss)(p, pf))(v["params"])
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
        jax.tree_util.tree_flatten_with_path(g_pf)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_odd_spatial_extents_match():
    # VALID pooling drops the trailing odd row/col; dropping commutes with
    # a pointwise (1x1) conv, so the maps still agree.
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 13, 9, 8)).astype(np.float32))
    ref, pf = _pair(4)
    v = jax.jit(lambda r, a: ref.init(r, a))(jax.random.PRNGKey(3), x)
    y_ref = jax.jit(lambda a: ref.apply(v, a))(x)
    y_pf = jax.jit(lambda a: pf.apply(v, a))(x)
    assert y_ref.shape == y_pf.shape == (2, 6, 4, 4)
    np.testing.assert_allclose(
        np.asarray(y_pf), np.asarray(y_ref), rtol=1e-5, atol=1e-5)


def test_full_densenet_invariant():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 24, 16, 3)).astype(np.float32))
    kw = dict(growth_rate=4, block_config=(2, 2), initial_features=8,
              output_dim=10)
    ref = DenseNet(**kw)
    pf = DenseNet(**kw, transition_pool_first=True)
    v = jax.jit(lambda r, a: ref.init(r, a))(jax.random.PRNGKey(4), x)
    y_ref = jax.jit(lambda a: ref.apply(v, a))(x)
    y_pf = jax.jit(lambda a: pf.apply(v, a))(x)
    np.testing.assert_allclose(
        np.asarray(y_pf), np.asarray(y_ref), rtol=1e-4, atol=1e-5)
