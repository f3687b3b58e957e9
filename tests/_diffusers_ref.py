"""Faithful torch reimplementation of ``diffusers.models.vae.Encoder``.

The reference's production SDXL embedder is diffusers' VAE encoder
(/root/reference/transformercvn/network/layers/sdxl_net.py:7-42 builds
``Encoder(down_block_types=("DownEncoderBlock2D",)*N, norm_num_groups=1,
double_z=False)``).  diffusers is not installed in this sandbox, so this
module re-creates the exact architecture and numerics of the diffusers
encoder stack (Apache-2.0; semantics of diffusers ~0.20 ``vae.py`` /
``unet_2d_blocks.py`` / ``resnet.py`` / ``attention_processor.py``) for
the weight-transplant golden test in ``test_sdxl_golden.py``:

* ``ResnetBlock2D`` (pre-norm): GN -> SiLU -> conv3x3 -> GN -> SiLU ->
  dropout -> conv3x3, with a 1x1 ``conv_shortcut`` when the channel
  count changes, ``output_scale_factor=1``.
* ``DownEncoderBlock2D``: ``layers_per_block`` resnets followed by
  ``Downsample2D`` with ``padding=0`` — which F.pads (0,1,0,1) and then
  applies a stride-2 3x3 conv with no built-in padding.
* ``UNetMidBlock2D``: resnet -> single-head spatial self-attention
  (GroupNorm, biased q/k/v/out projections, fp32 softmax, residual,
  ``rescale_output_factor=1``) -> resnet.
* ``Encoder``: conv_in 3x3 -> down blocks -> mid block -> GroupNorm ->
  SiLU -> conv_out 3x3 (out_channels, ``double_z=False``).

Only the configuration space the reference exercises is implemented
(silu activation, no time embedding, pre-norm resnets).
"""

import torch
import torch.nn.functional as F
from torch import nn


class ResnetBlock2D(nn.Module):
    def __init__(self, in_channels, out_channels, groups=1, eps=1e-6):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_channels, eps=eps)
        self.conv1 = nn.Conv2d(in_channels, out_channels, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, out_channels, eps=eps)
        self.dropout = nn.Dropout(0.0)
        self.conv2 = nn.Conv2d(out_channels, out_channels, 3, padding=1)
        self.conv_shortcut = (
            nn.Conv2d(in_channels, out_channels, 1)
            if in_channels != out_channels else None
        )

    def forward(self, x):
        h = self.norm1(x)
        h = F.silu(h)
        h = self.conv1(h)
        h = self.norm2(h)
        h = F.silu(h)
        h = self.dropout(h)
        h = self.conv2(h)
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class Downsample2D(nn.Module):
    """diffusers Downsample2D with use_conv=True, padding=0: asymmetric
    (0,1,0,1) F.pad then stride-2 conv."""

    def __init__(self, channels):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, stride=2, padding=0)

    def forward(self, x):
        x = F.pad(x, (0, 1, 0, 1), mode="constant", value=0.0)
        return self.conv(x)


class DownEncoderBlock2D(nn.Module):
    def __init__(self, in_channels, out_channels, num_layers=2, groups=1,
                 add_downsample=True):
        super().__init__()
        self.resnets = nn.ModuleList(
            [
                ResnetBlock2D(
                    in_channels if i == 0 else out_channels,
                    out_channels, groups=groups,
                )
                for i in range(num_layers)
            ]
        )
        self.downsampler = Downsample2D(out_channels) if add_downsample else None

    def forward(self, x):
        for resnet in self.resnets:
            x = resnet(x)
        if self.downsampler is not None:
            x = self.downsampler(x)
        return x


class AttnBlock(nn.Module):
    """diffusers ``Attention`` as UNetMidBlock2D builds it: heads =
    channels // attention_head_dim = 1, bias=True, residual_connection=
    True, upcast_softmax=True, rescale_output_factor=1."""

    def __init__(self, channels, groups=1, eps=1e-6):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, channels, eps=eps)
        self.to_q = nn.Linear(channels, channels, bias=True)
        self.to_k = nn.Linear(channels, channels, bias=True)
        self.to_v = nn.Linear(channels, channels, bias=True)
        self.to_out = nn.Linear(channels, channels, bias=True)
        self.scale = channels ** -0.5

    def forward(self, x):
        residual = x
        n, c, h, w = x.shape
        tokens = self.group_norm(x).view(n, c, h * w).transpose(1, 2)
        q = self.to_q(tokens)
        k = self.to_k(tokens)
        v = self.to_v(tokens)
        logits = torch.bmm(q, k.transpose(1, 2)) * self.scale
        weights = logits.float().softmax(dim=-1).to(v.dtype)
        attended = torch.bmm(weights, v)
        out = self.to_out(attended).transpose(1, 2).view(n, c, h, w)
        return out + residual


class UNetMidBlock2D(nn.Module):
    def __init__(self, channels, groups=1):
        super().__init__()
        self.resnet1 = ResnetBlock2D(channels, channels, groups=groups)
        self.attn = AttnBlock(channels, groups=groups)
        self.resnet2 = ResnetBlock2D(channels, channels, groups=groups)

    def forward(self, x):
        return self.resnet2(self.attn(self.resnet1(x)))


class Encoder(nn.Module):
    """diffusers ``Encoder`` with ``double_z=False`` (the reference's
    configuration, sdxl_net.py:27-34)."""

    def __init__(self, in_channels, out_channels, block_out_channels,
                 layers_per_block=2, norm_num_groups=1):
        super().__init__()
        self.conv_in = nn.Conv2d(in_channels, block_out_channels[0], 3,
                                 padding=1)
        blocks = []
        output_channel = block_out_channels[0]
        for i, width in enumerate(block_out_channels):
            input_channel = output_channel
            output_channel = width
            blocks.append(
                DownEncoderBlock2D(
                    input_channel, output_channel,
                    num_layers=layers_per_block, groups=norm_num_groups,
                    add_downsample=i != len(block_out_channels) - 1,
                )
            )
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = UNetMidBlock2D(block_out_channels[-1],
                                        groups=norm_num_groups)
        self.conv_norm_out = nn.GroupNorm(norm_num_groups,
                                          block_out_channels[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(block_out_channels[-1], out_channels, 3,
                                  padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for block in self.down_blocks:
            x = block(x)
        x = self.mid_block(x)
        x = self.conv_norm_out(x)
        x = F.silu(x)
        return self.conv_out(x)


class SDXLNet(nn.Module):
    """The reference wrapper (sdxl_net.py:7-42): channel ladder
    init*{1,1,2,2,4,4,8,8}+[output], Encoder, Flatten+Linear."""

    def __init__(self, input_features, output_features, init_block_dim,
                 repeat_block_dim=2, num_blocks=4, norm_num_groups=1):
        super().__init__()
        widths = []
        dim = init_block_dim
        for _ in range(num_blocks):
            widths.extend([dim] * repeat_block_dim)
            dim *= 2
        widths.append(output_features)
        self.encoder = Encoder(
            input_features, output_features, widths,
            norm_num_groups=norm_num_groups,
        )
        self.output_layer = nn.Linear(output_features, output_features)

    def forward(self, x):
        h = self.encoder(x)
        return self.output_layer(h.flatten(1))
