"""TCM 2023 (Liu et al., "Learned Image Compression with Mixed
Transformer-CNN Architectures").

Capability parity with the reference
(/root/reference/cra5/models/compressai/models/tcm2023.py:314-667):
ConvTransBlock stages (parallel residual-conv and swin-transformer
branches over split channels), residual up/down-sampling transforms,
ConvTrans hyper transforms (z = 192 channels), and the 5-slice charm
entropy model whose supports pass through SWAtten window-attention
blocks before the cc transforms.

Coding reuses ``stf2022.CharmCodec`` (one vectorized rANS pass per
slice); this model only overrides the slice-parameter device methods.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import EntropyBottleneck, GaussianConditional
from ..entropy.ops import quantize_ste
from ..nn.conv import (
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    conv2d,
    subpel_conv3x3,
)
from ..nn.swin import SwinBlock
from .google import _ConvStack


class _TokensSwin(nn.Module):
    """Run a SwinBlock over an NCHW tensor."""

    dim: int
    head_dim: int
    window_size: int
    shifted: bool

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, C, H, W = x.shape
        t = x.reshape(B, C, H * W).transpose(0, 2, 1)
        t = SwinBlock(
            dim=C,
            num_heads=max(1, C // self.head_dim),
            window_size=self.window_size,
            shift_size=self.window_size // 2 if self.shifted else 0,
            name="swin",
        )(t, H, W)
        return t.transpose(0, 2, 1).reshape(B, C, H, W)


class ConvTransBlock(nn.Module):
    """Split channels into a residual-conv branch and a swin branch,
    fuse with a 1x1 (reference tcm2023.py:241-268)."""

    conv_dim: int
    trans_dim: int
    head_dim: int
    window_size: int
    shifted: bool

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fused = conv2d(self.conv_dim + self.trans_dim, 1, 1, name="conv1_1")(x)
        cx, tx = jnp.split(fused, [self.conv_dim], axis=1)
        cx = ResidualBlock(self.conv_dim, name="conv_block")(cx)
        tx = _TokensSwin(
            self.trans_dim, self.head_dim, self.window_size, self.shifted, name="trans_block"
        )(tx)
        out = conv2d(self.conv_dim + self.trans_dim, 1, 1, name="conv1_2")(
            jnp.concatenate([cx, tx], axis=1)
        )
        return x + out


class SWAtten(nn.Module):
    """Swin-window attention gate (reference tcm2023.py:269-291): 1x1 in
    to inter_dim, swin trunk a, swin+1x1 mask b, sigmoid gate, 1x1 out."""

    output_dim: int
    head_dim: int
    window_size: int
    inter_dim: int = 128

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = conv2d(self.inter_dim, 1, 1, name="in_conv")(x)
        identity = h
        a = _TokensSwin(self.inter_dim, self.head_dim, self.window_size, False, name="trunk")(h)
        b = _TokensSwin(self.inter_dim, self.head_dim, self.window_size, True, name="mask_swin")(h)
        b = conv2d(self.inter_dim, 1, 1, name="mask_conv")(b)
        h = identity + a * jax.nn.sigmoid(b)
        return conv2d(self.output_dim, 1, 1, name="out_conv")(h)


class _TCMStage(nn.Module):
    """config[i] ConvTransBlocks followed by a resample layer."""

    dim: int
    depth: int
    head_dim: int
    window_size: int
    resample: Tuple  # spec: ("rbs"|"rbu"|"conv"|"subpel", out, stride)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.depth):
            x = ConvTransBlock(
                self.dim, self.dim, self.head_dim, self.window_size,
                shifted=bool(i % 2), name=f"ctb_{i}",
            )(x)
        kind, out, arg = self.resample
        if kind == "rbs":
            return ResidualBlockWithStride(out, stride=arg, name="resample")(x)
        if kind == "rbu":
            return ResidualBlockUpsample(out, upscale=arg, name="resample")(x)
        if kind == "conv":
            return conv2d(out, 3, arg, name="resample")(x)
        return subpel_conv3x3(out, arg, name="resample")(x)


class TCM2023(nn.Module):
    config: Tuple[int, ...] = (2, 2, 2, 2, 2, 2)
    head_dim: Tuple[int, ...] = (8, 16, 32, 32, 16, 8)
    N: int = 128
    M: int = 320
    num_slices: int = 5
    max_support_slices: int = 5
    in_channel: int = 3
    window_size: int = 4

    CODEC_KIND = "charm"
    downsampling_factor = 64
    hyper_channels = 192

    @property
    def slice_size(self) -> int:
        return self.M // self.num_slices

    @property
    def max_support(self) -> int:
        return self.max_support_slices

    def setup(self):
        N, M = self.N, self.M
        dim = N
        ws = self.window_size

        self.g_a_in = ResidualBlockWithStride(2 * N, stride=2, name="g_a_in")
        self.m_down = [
            _TCMStage(
                dim, self.config[i], self.head_dim[i], ws,
                ("rbs", 2 * N, 2) if i < 2 else ("conv", M, 2),
                name=f"m_down{i + 1}",
            )
            for i in range(3)
        ]
        self.g_s_in = ResidualBlockUpsample(2 * N, upscale=2, name="g_s_in")
        self.m_up = [
            _TCMStage(
                dim, self.config[3 + i], self.head_dim[3 + i], ws,
                ("rbu", 2 * N, 2) if i < 2 else ("subpel", self.in_channel, 2),
                name=f"m_up{i + 1}",
            )
            for i in range(3)
        ]

        self.h_a_in = ResidualBlockWithStride(2 * N, stride=2, name="h_a_in")
        self.ha_stage = _TCMStage(
            dim, self.config[0], 32, 4, ("conv", self.hyper_channels, 2), name="ha_down1"
        )
        self.h_mean_in = ResidualBlockUpsample(2 * N, upscale=2, name="h_mean_in")
        self.hs_mean_stage = _TCMStage(
            dim, self.config[3], 32, 4, ("subpel", M, 2), name="hs_up1"
        )
        self.h_scale_in = ResidualBlockUpsample(2 * N, upscale=2, name="h_scale_in")
        self.hs_scale_stage = _TCMStage(
            dim, self.config[3], 32, 4, ("subpel", M, 2), name="hs_up2"
        )

        s = self.slice_size
        self.atten_mean = [
            SWAtten(M + s * min(i, 5), 16, ws, inter_dim=128, name=f"atten_mean_{i}")
            for i in range(self.num_slices)
        ]
        self.atten_scale = [
            SWAtten(M + s * min(i, 5), 16, ws, inter_dim=128, name=f"atten_scale_{i}")
            for i in range(self.num_slices)
        ]

        def cc(i, extra_cap, name):
            return _ConvStack(
                (
                    ("conv", 224, 3, 1), ("gelu",),
                    ("conv", 128, 3, 1), ("gelu",),
                    ("conv", s, 3, 1),
                ),
                name=name,
            )

        self.cc_mean_transforms = [
            cc(i, 5, f"cc_mean_transforms_{i}") for i in range(self.num_slices)
        ]
        self.cc_scale_transforms = [
            cc(i, 5, f"cc_scale_transforms_{i}") for i in range(self.num_slices)
        ]
        self.lrp_transforms = [
            cc(i, 6, f"lrp_transforms_{i}") for i in range(self.num_slices)
        ]
        self.entropy_bottleneck = EntropyBottleneck(channels=self.hyper_channels)
        self.gaussian_conditional = GaussianConditional()

    def aux_loss(self) -> jax.Array:
        return self.entropy_bottleneck.loss()

    def g_a(self, x: jax.Array) -> jax.Array:
        x = self.g_a_in(x)
        for stage in self.m_down:
            x = stage(x)
        return x

    def g_s(self, y_hat: jax.Array) -> jax.Array:
        x = self.g_s_in(y_hat)
        for stage in self.m_up:
            x = stage(x)
        return x

    def h_a(self, y: jax.Array) -> jax.Array:
        return self.ha_stage(self.h_a_in(y))

    def h_mean_s(self, z_hat: jax.Array) -> jax.Array:
        return self.hs_mean_stage(self.h_mean_in(z_hat))

    def h_scale_s(self, z_hat: jax.Array) -> jax.Array:
        return self.hs_scale_stage(self.h_scale_in(z_hat))

    def slice_params(
        self, latent_means, latent_scales, y_hat_slices: Sequence[jax.Array], i: int
    ):
        support = list(y_hat_slices[: self.max_support])
        mean_support = jnp.concatenate([latent_means] + support, axis=1)
        mean_support = self.atten_mean[i](mean_support)
        scale_support = jnp.concatenate([latent_scales] + support, axis=1)
        scale_support = self.atten_scale[i](scale_support)
        mu = self.cc_mean_transforms[i](mean_support)
        sigma = self.cc_scale_transforms[i](scale_support)
        return mu, sigma

    def slice_lrp(self, latent_means, y_hat_slices: Sequence[jax.Array], y_hat_slice, i: int):
        support = list(y_hat_slices[: self.max_support])
        lrp_support = jnp.concatenate([latent_means] + support + [y_hat_slice], axis=1)
        return 0.5 * jnp.tanh(self.lrp_transforms[i](lrp_support))

    def __call__(
        self, x: jax.Array, training: bool = False, rng: Optional[jax.Array] = None
    ) -> Dict[str, Any]:
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat, z_likelihoods = self.entropy_bottleneck(z, training=training, rng=rng)
        if not training:
            medians = self.entropy_bottleneck.medians().reshape(1, -1, 1, 1)
            z_hat = quantize_ste(z - medians) + medians
        latent_means = self.h_mean_s(z_hat)
        latent_scales = self.h_scale_s(z_hat)

        y_slices = jnp.split(y, self.num_slices, axis=1)
        y_hat_slices: List[jax.Array] = []
        likelihoods: List[jax.Array] = []
        for i, y_slice in enumerate(y_slices):
            mu, sigma = self.slice_params(latent_means, latent_scales, y_hat_slices, i)
            rng_i = jax.random.fold_in(rng, i + 1) if rng is not None else None
            _, lk = self.gaussian_conditional(
                y_slice, sigma, means=mu, training=training, rng=rng_i
            )
            likelihoods.append(lk)
            y_hat_slice = quantize_ste(y_slice - mu) + mu
            y_hat_slice = y_hat_slice + self.slice_lrp(latent_means, y_hat_slices, y_hat_slice, i)
            y_hat_slices.append(y_hat_slice)

        y_hat = jnp.concatenate(y_hat_slices, axis=1)
        x_hat = self.g_s(y_hat)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": jnp.concatenate(likelihoods, axis=1), "z": z_likelihoods},
        }

    # CharmCodec device surface
    def analysis(self, x: jax.Array):
        y = self.g_a(x)
        z = self.h_a(y)
        medians = self.entropy_bottleneck.medians().reshape(1, -1, 1, 1)
        z_sym = jnp.round(z - medians).astype(jnp.int32)
        return {"y": y, "z_sym": z_sym, "z_shape": z.shape[-2:]}

    def hyper_params_from_z(self, z_sym: jax.Array):
        medians = self.entropy_bottleneck.medians().reshape(1, -1, 1, 1)
        z_hat = z_sym.astype(jnp.float32) + medians
        return self.h_mean_s(z_hat), self.h_scale_s(z_hat)

    def synthesis(self, y_hat: jax.Array) -> jax.Array:
        return self.g_s(y_hat)
