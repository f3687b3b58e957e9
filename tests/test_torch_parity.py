"""Golden parity tests against PyTorch-built reference-topology modules.

The reference implementation is torch; these tests build the same module
topologies in torch (CPU), transplant the weights into our Flax modules, and
assert numerical agreement — certifying that the TPU re-design computes the
same function (the SURVEY §4 'golden-value parity' requirement) without
importing the reference package (which needs MinkowskiEngine).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dune_transformercvn_tpu.models.densenet import DenseNet
from dune_transformercvn_tpu.models.encoder import EncoderLayer
from dune_transformercvn_tpu.ops.losses import softmax_focal_loss
from dune_transformercvn_tpu.ops.masked import MaskedBatchNorm, PReLU


def t2n(tensor):
    return tensor.detach().numpy()


# ---------------------------------------------------------------------------
# Transformer encoder layer vs torch.nn.TransformerEncoderLayer
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("norm_first", [False, True])
def test_encoder_layer_matches_torch(norm_first):
    D, H, B, T = 32, 4, 3, 7
    torch.manual_seed(0)
    t_layer = torch.nn.TransformerEncoderLayer(
        D, H, dim_feedforward=D, dropout=0.0, activation="gelu",
        norm_first=norm_first, batch_first=True,
    ).eval()

    layer = EncoderLayer(hidden_dim=D, num_heads=H, dropout=0.0,
                         activation="gelu", norm_first=norm_first)
    x = np.random.default_rng(0).normal(size=(B, T, D)).astype(np.float32)
    variables = jax.jit(layer.init)(jax.random.PRNGKey(0), jnp.asarray(x))

    # --- transplant torch weights into the flax param tree -----------------
    params = jax.device_get(variables["params"])
    sd = t_layer.state_dict()
    in_w = t2n(sd["self_attn.in_proj_weight"])   # [3D, D]
    in_b = t2n(sd["self_attn.in_proj_bias"])     # [3D]
    hd = D // H
    mha = params["MultiHeadDotProductAttention_0"]
    for i, name in enumerate(["query", "key", "value"]):
        w = in_w[i * D:(i + 1) * D]              # [D, D], q = x @ w.T
        mha[name]["kernel"] = w.T.reshape(D, H, hd)
        mha[name]["bias"] = in_b[i * D:(i + 1) * D].reshape(H, hd)
    mha["out"]["kernel"] = t2n(sd["self_attn.out_proj.weight"]).T.reshape(H, hd, D)
    mha["out"]["bias"] = t2n(sd["self_attn.out_proj.bias"])
    params["Dense_0"]["kernel"] = t2n(sd["linear1.weight"]).T
    params["Dense_0"]["bias"] = t2n(sd["linear1.bias"])
    params["Dense_1"]["kernel"] = t2n(sd["linear2.weight"]).T
    params["Dense_1"]["bias"] = t2n(sd["linear2.bias"])
    params["LayerNorm_0"]["scale"] = t2n(sd["norm1.weight"])
    params["LayerNorm_0"]["bias"] = t2n(sd["norm1.bias"])
    params["LayerNorm_1"]["scale"] = t2n(sd["norm2.weight"])
    params["LayerNorm_1"]["bias"] = t2n(sd["norm2.bias"])

    ours = jax.jit(layer.apply)({"params": params}, jnp.asarray(x))
    theirs = t_layer(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), t2n(theirs), rtol=2e-4, atol=2e-5)


def test_encoder_layer_respects_padding_mask_like_torch():
    D, H, B, T = 16, 4, 2, 5
    torch.manual_seed(1)
    t_layer = torch.nn.TransformerEncoderLayer(
        D, H, dim_feedforward=D, dropout=0.0, activation="gelu", batch_first=True
    ).eval()
    layer = EncoderLayer(hidden_dim=D, num_heads=H, dropout=0.0, activation="gelu")
    x = np.random.default_rng(1).normal(size=(B, T, D)).astype(np.float32)
    variables = jax.jit(layer.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.device_get(variables["params"])
    sd = t_layer.state_dict()
    hd = D // H
    in_w, in_b = t2n(sd["self_attn.in_proj_weight"]), t2n(sd["self_attn.in_proj_bias"])
    mha = params["MultiHeadDotProductAttention_0"]
    for i, name in enumerate(["query", "key", "value"]):
        mha[name]["kernel"] = in_w[i * D:(i + 1) * D].T.reshape(D, H, hd)
        mha[name]["bias"] = in_b[i * D:(i + 1) * D].reshape(H, hd)
    mha["out"]["kernel"] = t2n(sd["self_attn.out_proj.weight"]).T.reshape(H, hd, D)
    mha["out"]["bias"] = t2n(sd["self_attn.out_proj.bias"])
    params["Dense_0"]["kernel"] = t2n(sd["linear1.weight"]).T
    params["Dense_0"]["bias"] = t2n(sd["linear1.bias"])
    params["Dense_1"]["kernel"] = t2n(sd["linear2.weight"]).T
    params["Dense_1"]["bias"] = t2n(sd["linear2.bias"])
    params["LayerNorm_0"]["scale"] = t2n(sd["norm1.weight"])
    params["LayerNorm_0"]["bias"] = t2n(sd["norm1.bias"])
    params["LayerNorm_1"]["scale"] = t2n(sd["norm2.weight"])
    params["LayerNorm_1"]["bias"] = t2n(sd["norm2.bias"])

    keep = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], bool)
    attn_mask = jnp.broadcast_to(jnp.asarray(keep)[:, None, None, :], (B, 1, T, T))
    ours = jax.jit(layer.apply)({"params": params}, jnp.asarray(x), attn_mask)
    theirs = t_layer(
        torch.from_numpy(x), src_key_padding_mask=torch.from_numpy(~keep)
    )
    np.testing.assert_allclose(
        np.asarray(ours)[keep], t2n(theirs)[keep], rtol=2e-4, atol=2e-5
    )


# ---------------------------------------------------------------------------
# Masked BatchNorm vs torch BatchNorm on packed rows (train + eval + stats)
# ---------------------------------------------------------------------------

def test_masked_batchnorm_matches_torch_on_packed_rows():
    C, N = 6, 12
    torch.manual_seed(2)
    t_bn = torch.nn.BatchNorm1d(C)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(N, C)).astype(np.float32)
    mask = rng.uniform(size=N) < 0.7
    mask[0] = True

    mod = MaskedBatchNorm(channels=C)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), mask=jnp.asarray(mask))

    # two training steps to exercise the running-stat momentum update
    for _ in range(2):
        ours, updates = mod.apply(
            variables, jnp.asarray(x), mask=jnp.asarray(mask),
            mutable=["batch_stats"],
        )
        variables = {"params": variables["params"], "batch_stats": updates["batch_stats"]}
        theirs = t_bn(torch.from_numpy(x[mask]))

    np.testing.assert_allclose(np.asarray(ours)[mask], t2n(theirs), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]), t2n(t_bn.running_mean),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]), t2n(t_bn.running_var),
        rtol=1e-4, atol=1e-6,
    )

    # eval mode: both use running stats
    t_bn.eval()
    ours_eval = mod.apply(variables, jnp.asarray(x), use_running_average=True)
    theirs_eval = t_bn(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours_eval), t2n(theirs_eval), rtol=1e-4, atol=1e-5)


def test_prelu_matches_torch():
    C = 5
    torch.manual_seed(3)
    t_act = torch.nn.PReLU(C)
    with torch.no_grad():
        t_act.weight.copy_(torch.rand(C))
    x = np.random.default_rng(3).normal(size=(7, C)).astype(np.float32)

    mod = PReLU(channels=C)
    params = {"params": {"alpha": jnp.asarray(t2n(t_act.weight))}}
    ours = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), t2n(t_act(torch.from_numpy(x))),
                               rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# DenseNet vs a torch-built reference-topology DenseNet (weight transplant)
# ---------------------------------------------------------------------------

def build_torch_densenet(c_in, out_dim, init_feat, growth, bn_size, blocks):
    """Reference DenseNet topology (dense_net.py:97-167) built directly in
    torch for the parity check."""
    import torch.nn as nn

    class Bottleneck(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.norm1 = nn.BatchNorm2d(cin)
            self.relu1 = nn.PReLU(cin)
            self.conv1 = nn.Conv2d(cin, bn_size * growth, 1)
            self.norm2 = nn.BatchNorm2d(bn_size * growth)
            self.relu2 = nn.PReLU(bn_size * growth)
            self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1)

        def forward(self, x):
            h = self.conv1(self.relu1(self.norm1(x)))
            h = self.conv2(self.relu2(self.norm2(h)))
            return torch.cat([x, h], 1)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv0 = nn.Conv2d(c_in, init_feat, 7, stride=2, padding=3)
            self.norm0 = nn.BatchNorm2d(init_feat)
            self.relu0 = nn.PReLU(init_feat)
            self.pool0 = nn.AvgPool2d(3, 2)
            layers, feat = [], init_feat
            for i, n in enumerate(blocks):
                for _ in range(n):
                    layers.append(Bottleneck(feat))
                    feat += growth
                if i != len(blocks) - 1:
                    layers.append(nn.BatchNorm2d(feat))
                    layers.append(nn.PReLU(feat))
                    layers.append(nn.Conv2d(feat, feat // 2, 1))
                    layers.append(nn.AvgPool2d(2, 2))
                    feat //= 2
            self.blocks = nn.Sequential(*layers)
            self.final_norm = nn.BatchNorm2d(feat)
            self.final_relu = nn.PReLU(feat)
            self.linear = nn.Linear(feat, out_dim, bias=False)
            self.out_norm = nn.BatchNorm1d(out_dim)
            self.out_relu = nn.PReLU(out_dim)

        def forward(self, x):
            x = self.pool0(self.relu0(self.norm0(self.conv0(x))))
            x = self.blocks(x)
            x = self.final_relu(self.final_norm(x))
            x = x.mean(dim=(2, 3))
            return self.out_relu(self.out_norm(self.linear(x)))

    return Net()


def test_densenet_matches_torch_reference_topology():
    c_in, out_dim, init_feat, growth, bn_size = 3, 12, 8, 4, 2
    blocks = (2, 2)
    torch.manual_seed(4)
    t_net = build_torch_densenet(c_in, out_dim, init_feat, growth, bn_size, blocks).eval()

    net = DenseNet(
        output_dim=out_dim, initial_features=init_feat, growth_rate=growth,
        batch_norm_size=bn_size, block_config=blocks,
    )
    x = np.random.default_rng(4).normal(size=(3, 48, 40, c_in)).astype(np.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    def conv_w(module):  # torch OIHW -> flax HWIO
        return t2n(module.weight).transpose(2, 3, 1, 0)

    def set_bn(flax_bn_params, flax_bn_stats, t_bn):
        flax_bn_params["scale"] = t2n(t_bn.weight)
        flax_bn_params["bias"] = t2n(t_bn.bias)
        flax_bn_stats["mean"] = t2n(t_bn.running_mean)
        flax_bn_stats["var"] = t2n(t_bn.running_var)

    # randomize torch running stats so eval-mode BN is a real test
    with torch.no_grad():
        for module in t_net.modules():
            if isinstance(module, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                module.running_mean.normal_(0, 0.3)
                module.running_var.uniform_(0.6, 1.5)

    # stem
    params["Conv_0"]["kernel"] = conv_w(t_net.conv0)
    params["Conv_0"]["bias"] = t2n(t_net.conv0.bias)
    set_bn(params["MaskedBatchNorm_0"], stats["MaskedBatchNorm_0"], t_net.norm0)
    params["PReLU_0"]["alpha"] = t2n(t_net.relu0.weight)

    # blocks: flax modules are Bottleneck_i / Transition_i in creation order
    bottleneck_idx = transition_idx = 0
    torch_layers = list(t_net.blocks)
    li = 0
    for bi, n in enumerate(blocks):
        for _ in range(n):
            tb = torch_layers[li]; li += 1
            fb_p = params[f"Bottleneck_{bottleneck_idx}"]
            fb_s = stats[f"Bottleneck_{bottleneck_idx}"]
            set_bn(fb_p["MaskedBatchNorm_0"], fb_s["MaskedBatchNorm_0"], tb.norm1)
            fb_p["PReLU_0"]["alpha"] = t2n(tb.relu1.weight)
            fb_p["Conv_0"]["kernel"] = conv_w(tb.conv1)
            fb_p["Conv_0"]["bias"] = t2n(tb.conv1.bias)
            set_bn(fb_p["MaskedBatchNorm_1"], fb_s["MaskedBatchNorm_1"], tb.norm2)
            fb_p["PReLU_1"]["alpha"] = t2n(tb.relu2.weight)
            fb_p["Conv_1"]["kernel"] = conv_w(tb.conv2)
            fb_p["Conv_1"]["bias"] = t2n(tb.conv2.bias)
            bottleneck_idx += 1
        if bi != len(blocks) - 1:
            t_norm, t_relu, t_conv = torch_layers[li], torch_layers[li + 1], torch_layers[li + 2]
            li += 4  # norm, relu, conv, pool
            ft_p = params[f"Transition_{transition_idx}"]
            ft_s = stats[f"Transition_{transition_idx}"]
            set_bn(ft_p["MaskedBatchNorm_0"], ft_s["MaskedBatchNorm_0"], t_norm)
            ft_p["PReLU_0"]["alpha"] = t2n(t_relu.weight)
            ft_p["Conv_0"]["kernel"] = conv_w(t_conv)
            ft_p["Conv_0"]["bias"] = t2n(t_conv.bias)
            transition_idx += 1

    # final norm + output block
    set_bn(params["MaskedBatchNorm_1"], stats["MaskedBatchNorm_1"], t_net.final_norm)
    params["PReLU_1"]["alpha"] = t2n(t_net.final_relu.weight)
    params["Dense_0"]["kernel"] = t2n(t_net.linear.weight).T
    set_bn(params["MaskedBatchNorm_2"], stats["MaskedBatchNorm_2"], t_net.out_norm)
    params["PReLU_2"]["alpha"] = t2n(t_net.out_relu.weight)

    ours = jax.jit(net.apply)({"params": params, "batch_stats": stats}, jnp.asarray(x))
    theirs = t_net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), t2n(theirs), rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# Focal loss vs torch cross-entropy / manual focal
# ---------------------------------------------------------------------------

def test_focal_loss_matches_torch():
    rng = np.random.default_rng(5)
    logits = rng.normal(size=(20, 8)).astype(np.float32)
    targets = rng.integers(0, 8, 20)

    ce_ours = float(softmax_focal_loss(jnp.asarray(logits), jnp.asarray(targets), 0.0))
    ce_torch = float(torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(targets)
    ))
    np.testing.assert_allclose(ce_ours, ce_torch, rtol=1e-6)

    gamma = 1.5
    ours = float(softmax_focal_loss(jnp.asarray(logits), jnp.asarray(targets), gamma))
    lp = torch.log_softmax(torch.from_numpy(logits), dim=-1)
    p = torch.softmax(torch.from_numpy(logits), dim=-1)
    idx = torch.from_numpy(targets).long().unsqueeze(1)
    lpt = lp.gather(1, idx).squeeze(1)
    pt = p.gather(1, idx).squeeze(1)
    manual = float((-lpt * (1 - pt) ** gamma).mean())
    np.testing.assert_allclose(ours, manual, rtol=1e-6)
