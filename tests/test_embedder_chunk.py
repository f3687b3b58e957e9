"""Chunked embedder application (``embedder_chunk``): exactness + params.

The SDXL family (the LArSoft production architecture) cannot fit a training
step on one 16 GiB chip when the whole packed bank's VAE-encoder activations
are live at once — the bank floors at 128 slots and each 400x280 image
carries ~0.5 GiB of resnet-block activations for backward.  ``apply_embedder``
caps that with an ``nn.scan`` over bank slices and a rematted body.  These
tests pin the contract that makes it safe to toggle:

* the parameter tree is identical with chunking on/off (checkpoints and the
  importer keep working), because params are ``variable_broadcast``;
* SDXL's GroupNorm is per-sample, so chunked forward == full-bank forward
  exactly, and gradients match;
* non-SDXL families reject the option loudly (BatchNorm needs the full bank).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from dune_transformercvn_tpu.models.network import apply_embedder
from dune_transformercvn_tpu.models.sdxl import SDXLEncoder


class _Wrap(nn.Module):
    chunk: int
    save_spatial: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        cnn = SDXLEncoder(output_dim=8, init_block_dim=2,
                          save_spatial=self.save_spatial, name="emb")
        return apply_embedder(cnn, x, None, train, self.chunk,
                              self.save_spatial)


@pytest.fixture(scope="module")
def bank():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(8, 400, 280, 3)).astype(np.float32))


def test_chunked_params_and_forward_match(bank):
    full = _Wrap(chunk=0)
    chunked = _Wrap(chunk=4)
    v_full = jax.jit(full.init)(jax.random.PRNGKey(0), bank)
    v_chunk = jax.jit(chunked.init)(jax.random.PRNGKey(0), bank)
    # identical trees: same names, shapes, and (same seed) same values
    flat_f = jax.tree_util.tree_flatten_with_path(v_full)[0]
    flat_c = jax.tree_util.tree_flatten_with_path(v_chunk)[0]
    assert [p for p, _ in flat_f] == [p for p, _ in flat_c]
    for (_, a), (_, b) in zip(flat_f, flat_c):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    y_full = jax.jit(full.apply)(v_full, bank)
    # chunked apply with the FULL model's variables: checkpoint portability
    y_chunk = jax.jit(chunked.apply)(v_full, bank)
    np.testing.assert_allclose(
        np.asarray(y_chunk), np.asarray(y_full), rtol=1e-5, atol=1e-5
    )


def test_chunked_gradients_match(bank):
    full = _Wrap(chunk=0)
    chunked = _Wrap(chunk=4)
    v = jax.jit(full.init)(jax.random.PRNGKey(1), bank)

    def loss(params, model):
        y = model.apply(params, bank)
        return jnp.sum(y * jnp.arange(y.size).reshape(y.shape))

    g_full = jax.jit(lambda p: jax.grad(loss)(p, full))(v)
    g_chunk = jax.jit(lambda p: jax.grad(loss)(p, chunked))(v)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_full)[0],
        jax.tree_util.tree_flatten_with_path(g_chunk)[0],
    ):
        assert pa == pb
        # chunked grads accumulate per-slice then sum: fp32 reduction-order
        # differences only (forward is exact; see the test above)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-3,
            err_msg=str(pa),
        )


def test_save_spatial_policy_matches(bank):
    """The selective chunk-remat policy (save tagged small-spatial conv
    outputs across the scan; Options.embedder_chunk_save_spatial) changes
    only WHAT is stored for backward — forward values, the param tree, and
    gradients are those of the blanket-remat chunked path."""
    blanket = _Wrap(chunk=4)
    selective = _Wrap(chunk=4, save_spatial=50 * 35)
    v = jax.jit(blanket.init)(jax.random.PRNGKey(3), bank)
    v2 = jax.jit(selective.init)(jax.random.PRNGKey(3), bank)
    flat_a = jax.tree_util.tree_flatten_with_path(v)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(v2)[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]

    np.testing.assert_array_equal(
        np.asarray(jax.jit(selective.apply)(v, bank)),
        np.asarray(jax.jit(blanket.apply)(v, bank)),
    )

    def loss(params, model):
        y = model.apply(params, bank)
        return jnp.sum(y * jnp.arange(y.size).reshape(y.shape))

    g_blanket = jax.jit(lambda p: jax.grad(loss)(p, blanket))(v)
    g_sel = jax.jit(lambda p: jax.grad(loss)(p, selective))(v)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_blanket)[0],
        jax.tree_util.tree_flatten_with_path(g_sel)[0],
    ):
        assert pa == pb
        # saved-vs-recomputed residuals: same math, fp32 rounding only
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-3,
            err_msg=str(pa),
        )


def test_indivisible_bank_falls_back(bank):
    # 8 % 3 != 0 -> one full-bank call; still exact.
    full = _Wrap(chunk=0)
    odd = _Wrap(chunk=3)
    v = jax.jit(full.init)(jax.random.PRNGKey(2), bank)
    np.testing.assert_array_equal(
        np.asarray(jax.jit(odd.apply)(v, bank)),
        np.asarray(jax.jit(full.apply)(v, bank)),
    )


def test_non_sdxl_family_rejected():
    from dune_transformercvn_tpu.config import Options
    from dune_transformercvn_tpu.models.network import ModelConfig

    o = Options()
    o.embedder_chunk = 16
    with pytest.raises(ValueError, match="embedder_chunk"):
        ModelConfig.from_options(o, 6, 4, 3, 4, 8, embedder="dense")


def test_full_network_chunked_matches(tmp_path):
    """End-to-end: a chunked SDXL TransformerCVN reproduces the unchunked
    logits from the unchunked variables (both banks ride the scan path)."""
    from dune_transformercvn_tpu.config import Options
    from dune_transformercvn_tpu.data import Batcher, EventDataset
    from dune_transformercvn_tpu.data.schema import make_synthetic_file
    from dune_transformercvn_tpu.models import ModelConfig, TransformerCVN

    path = str(tmp_path / "s.h5")
    make_synthetic_file(path, num_events=17, seed=2)
    ds = EventDataset(path, event_current_targets=True)
    ds.compute_statistics()

    o = Options()
    o.initial_pixel_dim = 2
    o.pixel_embedding_dim = 16
    o.feature_embedding_dim = 8
    o.position_embedding_dim = 8
    o.hidden_dim = 32
    o.num_encoder_layers = 1
    o.num_attention_heads = 4
    o.compute_dtype = "float32"

    def build(chunk):
        o.embedder_chunk = chunk
        cfg = ModelConfig.from_options(
            o, ds.num_features, ds.num_extra, ds.pixel_features,
            ds.num_event_classes, ds.num_prong_classes, embedder="sdxl",
        )
        return TransformerCVN(cfg)

    batcher = Batcher(ds, batch_size=2, coo_granularity=512)
    batch = {
        k: jnp.asarray(v) for k, v in batcher.build_batch(np.arange(2)).items()
    }
    norm = {
        "mean": jnp.asarray(ds.mean), "std": jnp.asarray(ds.std),
        "extra_mean": jnp.asarray(ds.extra_mean),
        "extra_std": jnp.asarray(ds.extra_std),
    }
    full, chunked = build(0), build(1)  # chunk=1 divides every bank size
    v = jax.jit(lambda r, b, n: full.init(r, b, n, train=False))(
        jax.random.PRNGKey(0), batch, norm
    )
    ev_f, pr_f = jax.jit(lambda v, b, n: full.apply(v, b, n, train=False))(
        v, batch, norm
    )
    ev_c, pr_c = jax.jit(lambda v, b, n: chunked.apply(v, b, n, train=False))(
        v, batch, norm
    )
    np.testing.assert_allclose(np.asarray(ev_c), np.asarray(ev_f), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pr_c), np.asarray(pr_f), rtol=1e-5, atol=1e-5)
