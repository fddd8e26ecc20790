"""InvCompress 2021 (Xie et al.): invertible-network codec.

Capability parity with the reference
(/root/reference/cra5/models/compressai/models/Inv2021.py:11 InvCompress,
InvUtils.py: EnhModule:21, InvComp:47, CouplingLayer:121, Bottleneck:143,
SqueezeLayer:161, InvertibleConv1x1:210, DenseBlock:236, AttModule:9).

The analysis transform is an exactly-invertible flow (squeeze ->
invertible 1x1 -> affine coupling, 3 levels); synthesis runs the same
parameters in reverse (channel-mean reduce forward, repeat backward).
Entropy side is the joint autoregressive model inherited from mbt2018
(google.py:508); compress/decompress via ``codec.AutoregressiveCodec``.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.conv import AttentionBlock, conv2d
from .google import JointAutoregressiveHierarchicalPriors


def squeeze2d(x: jax.Array, factor: int = 2) -> jax.Array:
    B, C, H, W = x.shape
    x = x.reshape(B, C, H // factor, factor, W // factor, factor)
    x = x.transpose(0, 3, 5, 1, 2, 4)
    return x.reshape(B, factor * factor * C, H // factor, W // factor)


def unsqueeze2d(x: jax.Array, factor: int = 2) -> jax.Array:
    B, C, H, W = x.shape
    f2 = factor * factor
    x = x.reshape(B, factor, factor, C // f2, H, W)
    x = x.transpose(0, 3, 4, 1, 5, 2)
    return x.reshape(B, C // f2, H * factor, W * factor)


class DenseBlock(nn.Module):
    out_channels: int
    gc: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def lrelu(v):
            return nn.leaky_relu(v, negative_slope=0.2)

        x1 = lrelu(conv2d(self.gc, 3, 1, name="conv1")(x))
        x2 = lrelu(conv2d(self.gc, 3, 1, name="conv2")(jnp.concatenate([x, x1], 1)))
        x3 = lrelu(conv2d(self.gc, 3, 1, name="conv3")(jnp.concatenate([x, x1, x2], 1)))
        x4 = lrelu(conv2d(self.gc, 3, 1, name="conv4")(jnp.concatenate([x, x1, x2, x3], 1)))
        return conv2d(self.out_channels, 3, 1, name="conv5")(
            jnp.concatenate([x, x1, x2, x3, x4], 1)
        )


class EnhBlock(nn.Module):
    nf: int
    channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = DenseBlock(self.nf, name="db1")(x)
        h = conv2d(self.nf, 1, 1, name="c1")(h)
        h = conv2d(self.nf, 3, 1, name="c2")(h)
        h = conv2d(self.nf, 1, 1, name="c3")(h)
        h = DenseBlock(self.channels, name="db2")(h)
        return x + 0.2 * h


class Bottleneck(nn.Module):
    out_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        h = nn.leaky_relu(conv2d(self.out_channels, k, 1, name="conv1")(x), 0.2)
        h = nn.leaky_relu(conv2d(self.out_channels, 1, 1, name="conv2")(h), 0.2)
        # conv3 zero-init: couplings start as identity (reference
        # initialize_weights(conv3, 0), InvUtils.py:152)
        return _ZeroConv(self.out_channels, k, name="conv3")(h)


class _ZeroConv(nn.Module):
    out_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.kernel_size // 2
        y = nn.Conv(
            self.out_channels, (self.kernel_size, self.kernel_size),
            padding=((p, p), (p, p)),
            kernel_init=nn.initializers.zeros, name="conv",
        )(x.transpose(0, 2, 3, 1))
        return y.transpose(0, 3, 1, 2)


class CouplingLayer(nn.Module):
    split1: int
    split2: int
    kernel_size: int
    clamp: float = 1.0

    def setup(self):
        self.G1 = Bottleneck(self.split2, self.kernel_size, name="G1")
        self.G2 = Bottleneck(self.split1, self.kernel_size, name="G2")
        self.H1 = Bottleneck(self.split2, self.kernel_size, name="H1")
        self.H2 = Bottleneck(self.split1, self.kernel_size, name="H2")

    def _scale(self, g: jax.Array) -> jax.Array:
        return jnp.exp(self.clamp * (jax.nn.sigmoid(g) * 2.0 - 1.0))

    def __call__(self, x: jax.Array, rev: bool = False) -> jax.Array:
        x1, x2 = x[:, : self.split1], x[:, self.split1 :]
        if not rev:
            y1 = x1 * self._scale(self.G2(x2)) + self.H2(x2)
            y2 = x2 * self._scale(self.G1(y1)) + self.H1(y1)
        else:
            y2 = (x2 - self.H1(x1)) / self._scale(self.G1(x1))
            y1 = (x1 - self.H2(y2)) / self._scale(self.G2(y2))
        return jnp.concatenate([y1, y2], axis=1)


class InvertibleConv1x1(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x: jax.Array, rev: bool = False) -> jax.Array:
        w = self.param(
            "weight",
            lambda rng, shape: jnp.linalg.qr(
                jax.random.normal(rng, shape, jnp.float32)
            )[0],
            (self.channels, self.channels),
        )
        if rev:
            w = jnp.linalg.inv(w)
        return jnp.einsum("oc,bchw->bohw", w, x)


class InvComp(nn.Module):
    """3-level flow: each level squeezes 2x, mixes channels, then 3
    affine couplings; forward mean-reduces to M channels, reverse
    repeats (reference InvComp.forward, InvUtils.py:108-119)."""

    M: int
    in_channel: int
    kernel_sizes: Tuple[int, int, int] = (5, 5, 3)

    def setup(self):
        ops = []
        nc = self.in_channel
        for level, k in enumerate(self.kernel_sizes):
            nc *= 4
            ops.append(("squeeze", None))
            ops.append(
                ("mix", InvertibleConv1x1(nc, name=f"mix_{level}"))
            )
            for j in range(3):
                ops.append(
                    (
                        "couple",
                        CouplingLayer(nc // 4, 3 * nc // 4, k, name=f"couple_{level}_{j}"),
                    )
                )
        self.ops = tuple(ops)
        self.total_nc = nc

    def __call__(self, x: jax.Array, rev: bool = False) -> jax.Array:
        if not rev:
            for kind, op in self.ops:
                if kind == "squeeze":
                    x = squeeze2d(x)
                else:
                    x = op(x, rev=False)
            B, C, H, W = x.shape
            return jnp.mean(x.reshape(B, C // self.M, self.M, H, W), axis=1)
        times = self.total_nc // self.M
        x = jnp.tile(x, (1, times, 1, 1))
        for kind, op in reversed(self.ops):
            if kind == "squeeze":
                x = unsqueeze2d(x)
            else:
                x = op(x, rev=True)
        return x


class InvCompress(JointAutoregressiveHierarchicalPriors):
    """Invertible codec over the mbt2018 joint AR entropy model; M == N
    (reference Inv2021.py:11-33)."""

    N: int = 192
    M: int = 192
    enh_nf: int = 64

    def setup(self):
        self._build_h()
        from ..entropy import EntropyBottleneck, GaussianConditional
        from ..nn.conv import MaskedConv2d
        from .google import _ConvStack

        self.entropy_bottleneck = EntropyBottleneck(channels=self.N)
        self.gaussian_conditional = GaussianConditional()
        M = self.M
        self.context_prediction = MaskedConv2d(
            2 * M, kernel_size=self.context_kernel, mask_type="A", name="context_prediction"
        )
        self.entropy_parameters = _ConvStack(
            (
                ("conv", M * 10 // 3, 1, 1), ("lrelu",),
                ("conv", M * 8 // 3, 1, 1), ("lrelu",),
                ("conv", M * 6 // 3, 1, 1),
            ),
            name="entropy_parameters",
        )

        self.forw_enh = EnhBlock(self.enh_nf, self.in_channel, name="forw_enh")
        self.back_enh = EnhBlock(self.enh_nf, self.in_channel, name="back_enh")
        self.inv = InvComp(self.M, self.in_channel, name="inv")
        self.forw_att = AttentionBlock(self.N, name="forw_att")
        self.back_att = AttentionBlock(self.N, name="back_att")

    # methods replace the g_a/g_s submodules of the conv family
    def g_a(self, x: jax.Array) -> jax.Array:
        x = self.forw_enh(x)
        x = self.inv(x, rev=False)
        return self.forw_att(x)

    def g_s(self, y_hat: jax.Array) -> jax.Array:
        x = self.back_att(y_hat)
        x = self.inv(x, rev=True)
        return self.back_enh(x)
