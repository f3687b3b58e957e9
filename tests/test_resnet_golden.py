"""Golden weight-transplant parity for the ResNet residual body.

Builds the reference's ACTUAL ``ResNetStack``
(/root/reference/transformercvn/network/layers/resnet.py) on torch CPU,
transplants its weights into our Flax ``ResNetBody``, and asserts the
feature maps agree in eval and train mode — pinning the block semantics the
reference defines: conv_bn -> PReLU -> conv_bn, projection shortcut on
width change, downsample-by-2 in a stage's first block iff the width
changes, and NO activation after the residual add.

The stem/head around the body are documented TPU-first adaptations (see
models/resnet.py docstring) and are exercised by tests/test_variants.py.
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

from dune_transformercvn_tpu.models.resnet import ResNetBody

SIZES = (8, 16, 32)
DEPTHS = (1, 2, 2)
N, H, W = 4, 16, 12


def _import_reference_stack():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from transformercvn.network.layers.resnet import ResNetStack

    return ResNetStack


from test_reference_parity import (  # noqa: E402  (same-dir test helpers)
    conv_w,
    set_bn as _set_bn,
    t2n,
)


def transplant(ref, params, stats):
    sd = ref.state_dict()
    k = 0
    for layer, depth in enumerate(DEPTHS):
        for block in range(depth):
            p, s = params[f"BasicBlock_{k}"], stats[f"BasicBlock_{k}"]
            pre = f"blocks.{layer}.blocks.{block}"
            p["Conv_0"]["kernel"] = conv_w(sd, f"{pre}.blocks.0.conv.weight")
            _set_bn(p["MaskedBatchNorm_0"], s["MaskedBatchNorm_0"],
                    sd, f"{pre}.blocks.0.bn")
            p["PReLU_0"]["alpha"] = t2n(sd[f"{pre}.blocks.1.weight"])
            p["Conv_1"]["kernel"] = conv_w(sd, f"{pre}.blocks.2.conv.weight")
            _set_bn(p["MaskedBatchNorm_1"], s["MaskedBatchNorm_1"],
                    sd, f"{pre}.blocks.2.bn")
            if f"{pre}.shortcut.conv.weight" in sd:
                p["shortcut"]["kernel"] = conv_w(sd, f"{pre}.shortcut.conv.weight")
                _set_bn(p["shortcut_norm"], s["shortcut_norm"],
                        sd, f"{pre}.shortcut.bn")
            else:
                assert "shortcut" not in p, f"unexpected shortcut in block {k}"
            k += 1


@pytest.fixture(scope="module")
def pair():
    ResNetStack = _import_reference_stack()
    torch.manual_seed(0)
    ref = ResNetStack(blocks_sizes=SIZES, depths=DEPTHS)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    ref.eval()

    ours = ResNetBody(stage_features=SIZES, stage_depths=DEPTHS)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(N, H, W, SIZES[0])).astype(np.float32)

    variables = jax.jit(ours.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    transplant(ref, params, stats)
    return ref, ours, params, stats, x


def _ref_forward(ref, x):
    with torch.no_grad():
        out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    return t2n(out).transpose(0, 2, 3, 1)


def test_resnet_body_eval_matches_reference(pair):
    ref, ours, params, stats, x = pair
    want = _ref_forward(ref, x)
    got = jax.jit(ours.apply)(
        {"params": params, "batch_stats": stats}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_resnet_body_train_mode_matches_reference(pair):
    ref, ours, params, stats, x = pair
    ref.train()
    try:
        want = _ref_forward(ref, x)
    finally:
        ref.eval()
    got, mutated = jax.jit(
        lambda v, a: ours.apply(v, a, train=True, mutable=["batch_stats"])
    )({"params": params, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=5e-5)

    # running stats after one train step (momentum + unbiased variance)
    want_eval = _ref_forward(ref, x)
    got_eval = jax.jit(ours.apply)(
        {"params": params, "batch_stats": mutated["batch_stats"]},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(
        np.asarray(got_eval), want_eval, rtol=2e-4, atol=5e-5
    )
