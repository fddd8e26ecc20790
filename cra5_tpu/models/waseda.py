"""Cheng 2020 codecs: residual/attention conv transforms over the joint
autoregressive entropy model.

Capability parity with the reference
(/root/reference/cra5/models/compressai/models/waseda.py:46,117):
Cheng2020Anchor (residual blocks + subpel upsampling, M == N) and
Cheng2020Attention (adds conv attention blocks in g_a/g_s). Entropy side
is inherited from JointAutoregressiveHierarchicalPriors (google.py:508);
compress/decompress run through ``codec.AutoregressiveCodec``.
"""

from __future__ import annotations

import flax.linen as nn
import jax

from ..nn.conv import (
    AttentionBlock,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    conv2d,
    subpel_conv3x3,
)
from .google import JointAutoregressiveHierarchicalPriors, _ConvStack


class _ChengAnalysis(nn.Module):
    N: int
    in_channel: int = 3
    attention: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        N = self.N
        x = ResidualBlockWithStride(N, stride=2, name="rbs1")(x)
        x = ResidualBlock(N, name="rb1")(x)
        x = ResidualBlockWithStride(N, stride=2, name="rbs2")(x)
        if self.attention:
            x = AttentionBlock(N, name="attn1")(x)
        x = ResidualBlock(N, name="rb2")(x)
        x = ResidualBlockWithStride(N, stride=2, name="rbs3")(x)
        x = ResidualBlock(N, name="rb3")(x)
        x = conv2d(N, 3, 2, name="conv_out")(x)
        if self.attention:
            x = AttentionBlock(N, name="attn2")(x)
        return x


class _ChengSynthesis(nn.Module):
    N: int
    out_channel: int = 3
    attention: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        N = self.N
        if self.attention:
            x = AttentionBlock(N, name="attn1")(x)
        x = ResidualBlock(N, name="rb1")(x)
        x = ResidualBlockUpsample(N, 2, name="rbu1")(x)
        x = ResidualBlock(N, name="rb2")(x)
        x = ResidualBlockUpsample(N, 2, name="rbu2")(x)
        if self.attention:
            x = AttentionBlock(N, name="attn2")(x)
        x = ResidualBlock(N, name="rb3")(x)
        x = ResidualBlockUpsample(N, 2, name="rbu3")(x)
        x = ResidualBlock(N, name="rb4")(x)
        x = subpel_conv3x3(self.out_channel, 2, name="subpel_out")(x)
        return x


class _ChengHyperSynthesis(nn.Module):
    """h_s with subpel upsampling (reference waseda.py:85-95)."""

    N: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        N = self.N
        x = conv2d(N, 3, 1, name="c1")(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = subpel_conv3x3(N, 2, name="up1")(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = conv2d(N * 3 // 2, 3, 1, name="c2")(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = subpel_conv3x3(N * 3 // 2, 2, name="up2")(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = conv2d(N * 2, 3, 1, name="c3")(x)
        return x


class Cheng2020Anchor(JointAutoregressiveHierarchicalPriors):
    """M == N throughout (reference waseda.py:60)."""

    N: int = 192
    M: int = 192
    in_channel: int = 3
    attention: bool = False

    def _build_g(self):
        self.g_a = _ChengAnalysis(
            self.N, self.in_channel, attention=self.attention, name="g_a"
        )
        self.g_s = _ChengSynthesis(
            self.N, self.in_channel, attention=self.attention, name="g_s"
        )

    def _build_h(self):
        N = self.N
        self.h_a = _ConvStack(
            (
                ("conv", N, 3, 1), ("lrelu",),
                ("conv", N, 3, 1), ("lrelu",),
                ("conv", N, 3, 2), ("lrelu",),
                ("conv", N, 3, 1), ("lrelu",),
                ("conv", N, 3, 2),
            ),
            name="h_a",
        )
        self.h_s = _ChengHyperSynthesis(N, name="h_s")


class Cheng2020Attention(Cheng2020Anchor):
    attention: bool = True
