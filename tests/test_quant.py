"""Tests for the int8 post-training-quantization inference path
(ops/quant.py): exactness on representable grids, calibration coverage,
end-to-end closeness to the bf16/f32 path, and graceful fallbacks.

The reference has no quantized path (CreateCompiled.ipynb exports fp32
TorchScript); this is a beyond-parity serving feature, so the tests pin
our own contract rather than reference behavior.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from dune_transformercvn_tpu.ops.quant import (
    calibrate_activation_scales,
    int8_conv,
    quantize_weight,
    quantized_convs,
)


def _conv_paths(params, prefix=()):
    """All module paths in a param tree that look like conv kernels."""
    out = []
    for name, child in params.items():
        if isinstance(child, dict):
            if "kernel" in child and getattr(child["kernel"], "ndim", 0) == 4:
                out.append(prefix + (name,))
            else:
                out.extend(_conv_paths(child, prefix + (name,)))
    return out


def test_int8_conv_exact_on_representable_grid():
    """Inputs/weights already on the int8 grid -> the quantized conv is
    exact (int32 accumulation has no rounding)."""
    rng = np.random.RandomState(0)
    s_x = 0.05
    x = jnp.asarray(
        rng.randint(-127, 128, size=(2, 16, 12, 3)) * s_x, jnp.float32
    )
    # per-channel scales, max magnitude exactly 127*s_w so quantize_weight
    # recovers the grid
    s_w = np.asarray([0.01, 0.02, 0.04, 0.08], np.float32)
    q = rng.randint(-126, 127, size=(3, 3, 3, 4))
    q[0, 0, 0, :] = 127  # pin the max so scale = s_w exactly
    kernel = jnp.asarray(q * s_w, jnp.float32)
    bias = jnp.asarray(rng.randn(4), jnp.float32)

    mod = nn.Conv(4, (3, 3), padding=1, dtype=jnp.float32)
    got = int8_conv(x, kernel, bias, mod, s_x)

    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    want = (
        jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn
        )
        + bias
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_quantize_weight_roundtrip_error_bound():
    rng = np.random.RandomState(1)
    kernel = jnp.asarray(rng.randn(3, 3, 8, 16), jnp.float32)
    q, scale = quantize_weight(kernel)
    assert q.dtype == jnp.int8 and scale.shape == (16,)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(scale) - np.asarray(kernel))
    assert err.max() <= np.asarray(scale).max() / 2 + 1e-7


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    from dune_transformercvn_tpu.config import Options
    from dune_transformercvn_tpu.data import Batcher, EventDataset
    from dune_transformercvn_tpu.data.schema import make_synthetic_file
    from dune_transformercvn_tpu.models import ModelConfig, TransformerCVN

    path = tmp_path_factory.mktemp("quant") / "tiny.h5"
    make_synthetic_file(str(path), num_events=24, seed=11)
    ds = EventDataset(str(path), event_current_targets=True)
    ds.compute_statistics()

    o = Options()
    o.densenet_structure = [1, 1]
    o.densenet_growth_rate = 8
    o.initial_pixel_dim = 8
    o.pixel_embedding_dim = 16
    o.feature_embedding_dim = 8
    o.position_embedding_dim = 8
    o.hidden_dim = 32
    o.num_encoder_layers = 2
    o.num_prong_decoder_layers = 2
    o.num_attention_heads = 4
    o.compute_dtype = "float32"

    cfg = ModelConfig.from_options(
        o, ds.num_features, ds.num_extra, ds.pixel_features,
        ds.num_event_classes, ds.num_prong_classes,
    )
    batcher = Batcher(ds, batch_size=8, num_shards=1, coo_granularity=512)
    batch = {
        k: jnp.asarray(v) for k, v in batcher.build_batch(np.arange(8)).items()
    }
    norm = {
        "mean": jnp.asarray(ds.mean), "std": jnp.asarray(ds.std),
        "extra_mean": jnp.asarray(ds.extra_mean),
        "extra_std": jnp.asarray(ds.extra_std),
    }
    model = TransformerCVN(cfg)
    variables = jax.jit(partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "noise": jax.random.PRNGKey(2)},
        batch, norm,
    )
    return model, variables, batch, norm


def test_calibration_covers_every_conv(tiny_model):
    model, variables, batch, norm = tiny_model
    scales = calibrate_activation_scales(model, variables, [batch], norm)
    conv_paths = {
        "/".join(p) for p in _conv_paths(variables["params"])
    }
    assert conv_paths, "tiny model should contain convs"
    assert conv_paths == set(scales)
    assert all(s > 0 for s in scales.values())


def test_quantized_predict_close_to_reference(tiny_model):
    model, variables, batch, norm = tiny_model
    scales = calibrate_activation_scales(model, variables, [batch], norm)

    @jax.jit
    def predict(variables, batch, norm):
        ev, pr = model.apply(variables, batch, norm, train=False)
        return jax.nn.softmax(ev, -1), jax.nn.softmax(pr, -1)

    @jax.jit
    def predict_q(variables, batch, norm):
        with quantized_convs(variables["params"], scales):
            ev, pr = model.apply(variables, batch, norm, train=False)
        return jax.nn.softmax(ev, -1), jax.nn.softmax(pr, -1)

    ev, pr = jax.device_get(predict(variables, batch, norm))
    ev_q, pr_q = jax.device_get(predict_q(variables, batch, norm))

    assert ev_q.shape == ev.shape and pr_q.shape == pr.shape
    assert np.all(np.isfinite(ev_q)) and np.all(np.isfinite(pr_q))
    # per-tensor int8 on a 2-block CNN: probabilities should track closely
    assert np.max(np.abs(ev_q - ev)) < 0.05
    assert np.max(np.abs(pr_q - pr)) < 0.05
    assert np.array_equal(ev_q.argmax(-1), ev.argmax(-1))


def test_quantized_convs_falls_back_without_scales(tiny_model):
    """No calibrated scales -> the interceptor must leave every conv on the
    float path (bit-identical outputs)."""
    model, variables, batch, norm = tiny_model

    @jax.jit
    def predict_plain(variables, batch, norm):
        return model.apply(variables, batch, norm, train=False)

    @jax.jit
    def predict_empty(variables, batch, norm):
        with quantized_convs(variables["params"], {}):
            return model.apply(variables, batch, norm, train=False)

    ev, pr = jax.device_get(predict_plain(variables, batch, norm))
    ev2, pr2 = jax.device_get(predict_empty(variables, batch, norm))
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(ev2))
    np.testing.assert_array_equal(np.asarray(pr), np.asarray(pr2))


def test_unsupported_conv_falls_through():
    """Grouped (depthwise) convs are not int8-eligible; the interceptor
    must call the float implementation, not crash."""

    class Depthwise(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(
                8, (3, 3), padding=1, feature_group_count=8
            )(x)

    model = Depthwise()
    x = jnp.asarray(np.random.RandomState(2).randn(2, 8, 8, 8), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    want = jax.jit(model.apply)(variables, x)

    @jax.jit
    def apply_quantized(variables, x):
        with quantized_convs(variables["params"], {"Conv_0": 0.1}):
            return model.apply(variables, x)

    got = apply_quantized(variables, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
