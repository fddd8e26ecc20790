"""Convolutional layers for the CompressAI-style model zoo.

Capability parity with the reference layers (/root/reference/cra5/models/
compressai/layers/layers.py: MaskedConv2d:78, CheckboardMaskedConv2d:52,
ResidualBlock*:124-218, AttentionBlock:219, subpel_conv3x3:112) and the
conv/deconv helpers (models/utils.py). NCHW at module boundaries.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class conv2d(nn.Module):
    """stride-s conv with 'same' padding (k//2), NCHW."""

    out_channels: int
    kernel_size: int = 5
    stride: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.kernel_size // 2
        y = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            name="conv",
        )(x.transpose(0, 2, 3, 1))
        return y.transpose(0, 3, 1, 2)


class deconv2d(nn.Module):
    """stride-s transposed conv matching the reference's deconv geometry:
    output_padding = stride - 1, padding = k // 2."""

    out_channels: int
    kernel_size: int = 5
    stride: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, s = self.kernel_size, self.stride
        y = nn.ConvTranspose(
            self.out_channels,
            (k, k),
            strides=(s, s),
            padding="VALID",
            name="conv",
        )(x.transpose(0, 2, 3, 1))
        # VALID transpose yields (H-1)*s + k; reference wants H*s
        # (padding=k//2, output_padding=s-1): crop k//2 from the top/left and
        # k - k//2 - s + s - 1 ... i.e. keep [k//2 : k//2 + H*s)
        H, W = x.shape[2] * s, x.shape[3] * s
        p = k // 2
        y = y[:, p : p + H, p : p + W, :]
        return y.transpose(0, 3, 1, 2)


def _mask_A_B(kernel_size: Tuple[int, int], mask_type: str, cin: int, cout: int) -> np.ndarray:
    """PixelCNN mask over HWIO kernel layout."""
    kh, kw = kernel_size
    m = np.ones((kh, kw, cin, cout), np.float32)
    ch, cw = kh // 2, kw // 2
    m[ch, cw + (1 if mask_type == "B" else 0) :, :, :] = 0
    m[ch + 1 :, :, :, :] = 0
    return m


class MaskedConv2d(nn.Module):
    """PixelCNN-style masked conv (context models)."""

    out_channels: int
    kernel_size: int = 5
    mask_type: str = "A"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[1]
        k = self.kernel_size
        p = k // 2
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, cin, self.out_channels),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        mask = jnp.asarray(_mask_A_B((k, k), self.mask_type, cin, self.out_channels))
        y = jax.lax.conv_general_dilated(
            x.transpose(0, 2, 3, 1),
            kernel * mask,
            window_strides=(1, 1),
            padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return (y + bias).transpose(0, 3, 1, 2)


class CheckerboardMaskedConv2d(nn.Module):
    """Checkerboard-masked conv (ELIC-style spatial context)."""

    out_channels: int
    kernel_size: int = 5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[1]
        k = self.kernel_size
        p = k // 2
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, cin, self.out_channels)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        m = np.ones((k, k, 1, 1), np.float32)
        ii, jj = np.meshgrid(np.arange(k), np.arange(k), indexing="ij")
        m[(ii + jj) % 2 == 0, :, :] = 0  # anchor positions masked out
        mask = jnp.asarray(np.broadcast_to(m, (k, k, cin, self.out_channels)).copy())
        y = jax.lax.conv_general_dilated(
            x.transpose(0, 2, 3, 1),
            kernel * mask,
            window_strides=(1, 1),
            padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return (y + bias).transpose(0, 3, 1, 2)


class subpel_conv3x3(nn.Module):
    """3x3 conv + pixel shuffle upsampling."""

    out_channels: int
    upscale: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        r = self.upscale
        y = conv2d(self.out_channels * r * r, kernel_size=3, stride=1, name="conv")(x)
        B, C, H, W = y.shape
        y = y.reshape(B, self.out_channels, r, r, H, W)
        y = y.transpose(0, 1, 4, 2, 5, 3)
        return y.reshape(B, self.out_channels, H * r, W * r)


@jax.custom_vjp
def qrelu(x: jax.Array, bit_depth: int = 8, beta: int = 100) -> jax.Array:
    """Clamped ReLU to [0, 2**bit_depth - 1] with a differentiable
    relaxation outside the bounds (reference layers/layers.py:273 QReLU,
    Chandrasekar et al.)."""
    return jnp.clip(x, 0.0, 2.0 ** bit_depth - 1)


def _qrelu_fwd(x, bit_depth=8, beta=100):
    return qrelu(x, bit_depth, beta), (x, bit_depth, beta)


def _qrelu_bwd(res, g):
    x, bit_depth, beta = res
    max_val = 2.0 ** bit_depth - 1
    alpha = -0.9943258522851727  # ln(2)/beta-derived constant from the paper
    inside = (x >= 0) & (x <= max_val)
    grad_out = g * jnp.exp(alpha * jnp.abs(2.0 * x / max_val - 1.0) ** beta)
    return (jnp.where(inside, g, grad_out), None, None)


qrelu.defvjp(_qrelu_fwd, _qrelu_bwd)


class QReLU(nn.Module):
    bit_depth: int = 8
    beta: int = 100

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return qrelu(x, self.bit_depth, self.beta)


class ResidualBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = conv2d(self.out_channels, 3, 1, name="conv1")(x)
        h = nn.leaky_relu(h)
        h = conv2d(self.out_channels, 3, 1, name="conv2")(h)
        h = nn.leaky_relu(h)
        if x.shape[1] != self.out_channels:
            x = conv2d(self.out_channels, 1, 1, name="skip")(x)
        return x + h


class ResidualBlockWithStride(nn.Module):
    out_channels: int
    stride: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = conv2d(self.out_channels, 3, self.stride, name="conv1")(x)
        h = nn.leaky_relu(h)
        h = conv2d(self.out_channels, 3, 1, name="conv2")(h)
        h = GDNStub(self.out_channels, name="gdn")(h)
        skip = conv2d(self.out_channels, 1, self.stride, name="skip")(x)
        return skip + h


class GDNStub(nn.Module):
    channels: int
    inverse: bool = False

    @nn.compact
    def __call__(self, x):
        from .gdn import GDN

        return GDN(self.channels, inverse=self.inverse, name="g")(x)


class ResidualBlockUpsample(nn.Module):
    out_channels: int
    upscale: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = subpel_conv3x3(self.out_channels, self.upscale, name="subpel")(x)
        h = nn.leaky_relu(h)
        h = conv2d(self.out_channels, 3, 1, name="conv")(h)
        h = GDNStub(self.out_channels, inverse=True, name="igdn")(h)
        skip = subpel_conv3x3(self.out_channels, self.upscale, name="upsample")(x)
        return skip + h


class AttentionBlock(nn.Module):
    """Cheng2020-style conv attention block."""

    channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def res_unit(name):
            class _RU(nn.Module):
                channels: int

                @nn.compact
                def __call__(self, v):
                    c = self.channels
                    h = conv2d(c // 2, 1, 1, name="c1")(v)
                    h = nn.relu(h)
                    h = conv2d(c // 2, 3, 1, name="c2")(h)
                    h = nn.relu(h)
                    h = conv2d(c, 1, 1, name="c3")(h)
                    return v + h

            return _RU(self.channels, name=name)

        a = x
        for i in range(3):
            a = res_unit(f"trunk_{i}")(a)
        b = x
        for i in range(3):
            b = res_unit(f"mask_{i}")(b)
        b = conv2d(self.channels, 1, 1, name="mask_conv")(b)
        return x + a * jax.nn.sigmoid(b)
