"""Golden equivalence of the genuinely-sparse COO-stem family.

``--embedder coo`` must be *numerically identical* to ``--embedder dense``
with the same weights: the stem conv is linear in its input, so running it
as gather-matmul-scatter over the COO hit banks equals the dense conv over
the densified image (reference analogue: MinkowskiEngine and dense execution
of sparse_dense_net.py agree on the same kernels).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dune_transformercvn_tpu.models.coo_densenet import CooStemDenseNet
from dune_transformercvn_tpu.models.densenet import DenseNet
from dune_transformercvn_tpu.ops.coo_conv import coo_stem_conv
from dune_transformercvn_tpu.ops.scatter import densify_images

H, W, C = 37, 29, 3  # odd sizes exercise the stride-2 border handling


def coo_bank(seed=0, n_rows=3, hits=60, pad=20):
    """COO hits + the densified images they correspond to."""
    rng = np.random.default_rng(seed)
    xy = np.stack(
        [rng.integers(0, H, hits + pad), rng.integers(0, W, hits + pad)], axis=1
    ).astype(np.int32)
    vals = rng.uniform(0.1, 1.0, size=(hits + pad, C)).astype(np.float32)
    owner = np.concatenate(
        [rng.integers(0, n_rows, hits), np.full(pad, n_rows)]  # pad rows OOB
    ).astype(np.int32)
    images = densify_images(
        jnp.asarray(xy), jnp.asarray(vals), jnp.asarray(owner), n_rows, H, W
    )
    return jnp.asarray(xy), jnp.asarray(vals), jnp.asarray(owner), images


def test_coo_stem_conv_matches_dense_conv():
    xy, vals, owner, images = coo_bank()
    rng = np.random.default_rng(1)
    kernel = jnp.asarray(rng.normal(0, 0.1, size=(7, 7, C, 5)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, size=(5,)).astype(np.float32))

    sparse_out = jax.jit(
        lambda: coo_stem_conv(xy, vals, owner, kernel, bias, 3, H, W, 2, 3)
    )()
    dense_out = jax.jit(
        lambda: jax.lax.conv_general_dilated(
            images, kernel, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
    )()
    assert sparse_out.shape == dense_out.shape
    np.testing.assert_allclose(
        np.asarray(sparse_out), np.asarray(dense_out), atol=2e-5, rtol=1e-4
    )


def _small_cfg():
    return dict(
        output_dim=12, initial_features=8, growth_rate=4,
        batch_norm_size=2, block_config=(1, 1),
    )


def transplant(dense_params):
    """DenseNet param tree -> CooStemDenseNet param tree (same names except
    the stem, which is Conv_0 there and explicit stem_kernel/stem_bias here)."""
    out = {k: v for k, v in dense_params.items() if k != "Conv_0"}
    out["stem_kernel"] = dense_params["Conv_0"]["kernel"]
    out["stem_bias"] = dense_params["Conv_0"]["bias"]
    return out


def test_coo_embedder_golden_vs_dense():
    xy, vals, owner, images = coo_bank()
    mask = jnp.asarray([True, True, False])

    dense = DenseNet(**_small_cfg())
    coo = CooStemDenseNet(image_height=H, image_width=W, **_small_cfg())

    dense_vars = jax.jit(
        lambda: dense.init(jax.random.PRNGKey(0), images, mask, False)
    )()
    coo_vars = {
        "params": transplant(jax.device_get(dense_vars["params"])),
        "batch_stats": dense_vars["batch_stats"],
    }

    ref = jax.jit(lambda v: dense.apply(v, images, mask, False))(dense_vars)
    # engine 1: true COO stem over the hit banks
    got_coo = jax.jit(
        lambda v: coo.apply(v, (xy, vals, owner, 3), mask, False)
    )(coo_vars)
    # engine 2: dense-image fallback (export path), same params
    got_img = jax.jit(lambda v: coo.apply(v, images, mask, False))(coo_vars)

    # scatter-add vs conv accumulation order, amplified by the BN divide:
    # tiny absolute, tiny relative — bound both
    np.testing.assert_allclose(
        np.asarray(got_coo), np.asarray(ref), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_img), np.asarray(ref), rtol=1e-3, atol=1e-4
    )

    # train mode: BN stat updates agree between the two engines
    (out_c, upd_c) = jax.jit(
        lambda v: coo.apply(v, (xy, vals, owner, 3), mask, True,
                            mutable=["batch_stats"],
                            rngs={"dropout": jax.random.PRNGKey(1)})
    )(coo_vars)
    (out_d, upd_d) = jax.jit(
        lambda v: dense.apply(v, images, mask, True,
                              mutable=["batch_stats"],
                              rngs={"dropout": jax.random.PRNGKey(1)})
    )(dense_vars)
    np.testing.assert_allclose(
        np.asarray(out_c), np.asarray(out_d), rtol=1e-3, atol=1e-4
    )
    jax.tree_util.tree_map(  # identical tree structure by construction
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        ),
        upd_c["batch_stats"], upd_d["batch_stats"],
    )


def test_coo_full_network_trains():
    """End-to-end: ModelConfig(embedder='coo') reaches coo_stem_conv in a
    real jitted train step; loss is finite and stem grads flow."""
    from dune_transformercvn_tpu.config import Options
    from dune_transformercvn_tpu.parallel.mesh import create_mesh
    from dune_transformercvn_tpu.train import schedules
    from dune_transformercvn_tpu.train.optimizer import create_optimizer
    from dune_transformercvn_tpu.train.state import create_train_state
    from dune_transformercvn_tpu.train.step import make_train_step
    from __graft_entry__ import _synthetic_setup

    options = Options()
    options.densenet_structure = [1, 1]
    options.densenet_growth_rate = 8
    options.initial_pixel_dim = 8
    options.pixel_embedding_dim = 16
    options.feature_embedding_dim = 8
    options.position_embedding_dim = 8
    options.hidden_dim = 32
    options.num_encoder_layers = 1
    options.num_prong_decoder_layers = 2
    options.num_attention_heads = 4
    options.compute_dtype = "float32"
    options.event_current_targets = True
    options.batch_size = 2
    options.coo_bucket_granularity = 512

    dataset, batcher, cfg, model, norm = _synthetic_setup(
        options, num_events=8, embedder="coo"
    )
    assert cfg.embedder == "coo"
    batch = {k: jnp.asarray(v) for k, v in batcher.build_batch(np.arange(2)).items()}

    mesh = create_mesh(1)
    tx = create_optimizer(options, schedules.from_options(options, 10))
    state = create_train_state(model, tx, batch, norm, seed=0)
    train_step = make_train_step(model, tx, options, mesh)

    state, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics["train_loss"]))

    # stem gradient flows through the gather-matmul-scatter path
    def loss_of(params):
        (ev, pr), _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch, state.norm, train=True,
            rngs={"noise": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        return jnp.sum(ev ** 2) + jnp.sum(pr ** 2)

    grads = jax.jit(jax.grad(loss_of))(state.params)
    g = np.asarray(grads["event_pixel_embedding"]["stem_kernel"])
    assert np.isfinite(g).all() and np.abs(g).max() > 0, "stem got no gradient"
