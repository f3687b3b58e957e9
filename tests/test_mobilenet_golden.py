"""Golden weight-transplant parity for the MobileNetV2+SE embedder.

Builds the reference's ACTUAL ``MaskedProngMobileNetEmbedding``
(/root/reference/transformercvn/network/layers/prong_masked_mobilenet_embedding.py)
on torch CPU, transplants its weights into our Flax ``MobileNetV2``, and
asserts the embeddings agree in eval mode, in train mode (masked BN batch
statistics vs the reference's packed rows), and again in eval mode after the
train step updated the BN running stats (momentum/unbiased-variance chain).

The reference caller packs real prong images before this embedder
(neutrino_combined_network.py:68-69), so its plain BatchNorm2d sees only real
rows; we keep the padded slots and mask the statistics instead — these tests
prove the two are numerically identical for this family too.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "transformercvn")),
    reason="reference checkout not available",
)

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dune_transformercvn_tpu.models.mobilenet import MobileNetV2

# tiny but structurally complete: a no-expand block (t=1) AND an expanded
# strided pair (t=6, n=2, s=2), rectangular stem from a non-square image
STRUCTURE = ((1, 8, 1, 1), (6, 16, 2, 2))
H, W, C_IN = 14, 10, 3
OUT_DIM = 24
INITIAL = 8
N_SLOTS = 8  # padded prong slots; 5 real


def _import_reference_module():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from transformercvn.network.layers.prong_masked_mobilenet_embedding import (
        MaskedProngMobileNetEmbedding,
    )

    return MaskedProngMobileNetEmbedding


from test_reference_parity import (  # noqa: E402  (same-dir test helpers)
    conv_w,  # torch OIHW -> flax HWIO (depthwise: O,1,kh,kw -> kh,kw,1,O)
    set_bn,
    t2n,
)


def _set_bn(block, sd, prefix):
    set_bn(block[0], block[1], sd, prefix)


def _map_conv_block(params, stats, sd, prefix):
    params["Conv_0"]["kernel"] = conv_w(sd, f"{prefix}.conv.weight")
    _set_bn((params["MaskedBatchNorm_0"], stats["MaskedBatchNorm_0"]),
            sd, f"{prefix}.norm")


def transplant(ref, params, stats):
    sd = ref.state_dict()
    _map_conv_block(params["ConvBlock_0"], stats["ConvBlock_0"], sd, "resnet.0")

    layer = 1  # torch sequential index
    block = 0  # flax InvertedResidual index
    for t, _, n, _ in STRUCTURE:
        for _ in range(n):
            p = params[f"InvertedResidual_{block}"]
            s = stats[f"InvertedResidual_{block}"]
            pre = f"resnet.{layer}.convolutions"
            i = 0
            if t != 1:
                _map_conv_block(p["ConvBlock_0"], s["ConvBlock_0"], sd, f"{pre}.0")
                i = 1
                dw = "ConvBlock_1"
            else:
                dw = "ConvBlock_0"
            _map_conv_block(p[dw], s[dw], sd, f"{pre}.{i}")
            se = p["SqueezeExcite_0"]
            se["Dense_0"]["kernel"] = t2n(sd[f"{pre}.{i + 1}.fc1.weight"]).T
            se["Dense_0"]["bias"] = t2n(sd[f"{pre}.{i + 1}.fc1.bias"])
            se["Dense_1"]["kernel"] = t2n(sd[f"{pre}.{i + 1}.fc2.weight"]).T
            se["Dense_1"]["bias"] = t2n(sd[f"{pre}.{i + 1}.fc2.bias"])
            p["Conv_0"]["kernel"] = conv_w(sd, f"{pre}.{i + 2}.weight")
            _set_bn((p["MaskedBatchNorm_0"], s["MaskedBatchNorm_0"]),
                    sd, f"{pre}.{i + 3}")
            layer += 1
            block += 1

    _map_conv_block(params["ConvBlock_1"], stats["ConvBlock_1"],
                    sd, f"resnet.{layer}")


@pytest.fixture(scope="module")
def pair():
    MaskedProngMobileNetEmbedding = _import_reference_module()
    torch.manual_seed(0)
    ref = MaskedProngMobileNetEmbedding(
        input_shape=(H, W),
        input_dim=C_IN,
        hidden_dim=OUT_DIM,
        dropout=0.0,
        initial_dimension=INITIAL,
        inverted_residual_setting=[list(r) for r in STRUCTURE],
    )
    # randomize the BN running stats so eval mode is a real test
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    ref.eval()

    ours = MobileNetV2(
        output_dim=OUT_DIM,
        initial_features=INITIAL,
        structure=STRUCTURE,
        input_shape=(H, W),
        dropout=0.0,
    )
    rng = np.random.default_rng(1)
    images = rng.normal(size=(N_SLOTS, H, W, C_IN)).astype(np.float32)
    mask = np.array([1, 1, 0, 1, 0, 1, 1, 0], bool)

    variables = jax.jit(ours.init)(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(mask)
    )
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    transplant(ref, params, stats)
    return ref, ours, params, stats, images, mask


def _ref_forward(ref, images, mask):
    packed = torch.from_numpy(
        images[mask].transpose(0, 3, 1, 2)  # NHWC -> NCHW, real rows only
    )
    with torch.no_grad():
        return t2n(ref(packed, None))


def test_mobilenet_eval_matches_reference(pair):
    ref, ours, params, stats, images, mask = pair
    want = _ref_forward(ref, images, mask)
    got = jax.jit(ours.apply)(
        {"params": params, "batch_stats": stats},
        jnp.asarray(images), jnp.asarray(mask),
    )
    np.testing.assert_allclose(
        np.asarray(got)[mask], want, rtol=2e-4, atol=2e-5
    )


def test_mobilenet_train_mode_and_running_stats_match(pair):
    ref, ours, params, stats, images, mask = pair
    # train-mode forward: masked batch statistics vs packed rows
    ref.train()
    try:
        want_train = _ref_forward(ref, images, mask)
    finally:
        ref.eval()
    got_train, mutated = jax.jit(
        lambda v, x, m: ours.apply(
            v, x, m, train=True, mutable=["batch_stats"]
        ),
        static_argnums=(),
    )({"params": params, "batch_stats": stats},
      jnp.asarray(images), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(got_train)[mask], want_train, rtol=2e-4, atol=3e-5
    )

    # eval with the UPDATED running stats: proves the momentum /
    # unbiased-variance running-stat chain matches torch's
    want_eval = _ref_forward(ref, images, mask)
    got_eval = jax.jit(ours.apply)(
        {"params": params, "batch_stats": mutated["batch_stats"]},
        jnp.asarray(images), jnp.asarray(mask),
    )
    np.testing.assert_allclose(
        np.asarray(got_eval)[mask], want_eval, rtol=2e-4, atol=3e-5
    )
