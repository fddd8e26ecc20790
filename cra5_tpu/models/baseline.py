"""VAEformer ablation baselines.

Capability parity with the reference baselines
(/root/reference/cra5/models/vaeformer/baseline.py):
  - VariationCNNPrior == VaritionInVaration_CNN_Prior (:73): ViT g_a/g_s
    with a *conv* mean-scale hyperprior (h_a/h_s conv stacks :133-147)
    and the variational posterior.
  - variational=False == MeanScaleHyperprior_Baseline (:326): same
    towers, deterministic latent (no moment split).
  - VaritionInVaration_Former_Baseline (:460) — ViT hyperprior without
    quant_conv/lower_dim — is a VAEformer config in this framework:
    ``vaeformer_former_baseline()`` (lower_dim=False).

All expose the VAEformer device-method surface, so ``VAEformerCodec``
wraps them unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..entropy import EntropyBottleneck, GaussianConditional
from ..nn.vit import ViTDecoder, ViTEncoder
from .google import _ConvStack
from .vaeformer import DiagonalGaussian, VAEformerConfig, vaeformer_268, vaeformer_tiny


def vaeformer_former_baseline() -> VAEformerConfig:
    """ViT hyperprior without quant/post-quant 1x1 convs (reference
    baseline.py:460 Former_Baseline)."""
    return dataclasses.replace(vaeformer_268(), lower_dim=False, name="vaeformer_former_baseline")


def vaeformer_former_baseline_tiny() -> VAEformerConfig:
    cfg = vaeformer_tiny()
    # without lower_dim, y carries the full ViT width
    return dataclasses.replace(
        cfg, lower_dim=False, embed_dim=cfg.y_channels, name="former_baseline_tiny"
    )


class VariationCNNPrior(nn.Module):
    """ViT analysis/synthesis + conv mean-scale hyperprior."""

    cfg: VAEformerConfig
    variational: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        moments_mult = 2 if self.variational else 1
        self.g_a = ViTEncoder(
            img_size=c.img_size, patch_size=c.patch_size, patch_stride=c.patch_stride,
            in_chans=c.in_chans, embed_dim=c.y_channels, depth=c.depth,
            num_heads=c.num_heads, window_sizes=c.window_sizes, interval=c.interval,
            dtype=self.dtype,
        )
        self.g_s = ViTDecoder(
            img_size=c.img_size, patch_size=c.patch_size, patch_stride=c.patch_stride,
            out_chans=c.in_chans, embed_dim=c.y_channels, depth=c.depth,
            num_heads=c.num_heads, window_sizes=c.window_sizes, interval=c.interval,
            dtype=self.dtype,
        )
        if c.lower_dim:
            self.quant_conv = nn.Conv(
                moments_mult * c.embed_dim, (1, 1), dtype=self.dtype, name="quant_conv"
            )
            self.post_quant_conv = nn.Conv(
                c.y_channels, (1, 1), dtype=self.dtype, name="post_quant_conv"
            )
        M, N = c.embed_dim, c.z_channels
        self.h_a = _ConvStack(
            (
                ("conv", N, 3, 1), ("lrelu",),
                ("conv", N, 5, 2), ("lrelu",),
                ("conv", N, 5, 2),
            ),
            name="h_a",
        )
        self.h_s = _ConvStack(
            (
                ("deconv", M, 5, 2), ("lrelu",),
                ("deconv", M * 3 // 2, 5, 2), ("lrelu",),
                ("conv", M * 2, 3, 1),
            ),
            name="h_s",
        )
        self.entropy_bottleneck = EntropyBottleneck(channels=N)
        self.gaussian_conditional = GaussianConditional()

    def _conv1x1(self, conv: nn.Module, x: jax.Array) -> jax.Array:
        return conv(x.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)

    def encode_latent(self, x: jax.Array, rng: Optional[jax.Array] = None) -> jax.Array:
        moments = self.g_a(x)
        if self.cfg.lower_dim:
            moments = self._conv1x1(self.quant_conv, moments)
        if not self.variational:
            return moments
        posterior = DiagonalGaussian(moments)
        if self.cfg.sample_posterior and rng is not None:
            return posterior.sample(rng)
        return posterior.mode()

    def decode_y(self, y_hat: jax.Array) -> jax.Array:
        if self.cfg.lower_dim:
            y_hat = self._conv1x1(self.post_quant_conv, y_hat)
        return self.g_s(y_hat)

    def hyper_params(self, z_hat: jax.Array) -> Tuple[jax.Array, jax.Array]:
        scales, means = jnp.split(self.h_s(z_hat), 2, axis=1)
        return scales, means

    def __call__(
        self, x: jax.Array, training: bool = False, rng: Optional[jax.Array] = None
    ) -> Dict[str, Any]:
        rngs = (
            dict(zip(("post", "eb", "gc"), jax.random.split(rng, 3)))
            if rng is not None
            else {}
        )
        moments = self.g_a(x)
        if self.cfg.lower_dim:
            moments = self._conv1x1(self.quant_conv, moments)
        if self.variational:
            posterior = DiagonalGaussian(moments)
            y = (
                posterior.sample(rngs["post"])
                if self.cfg.sample_posterior and "post" in rngs
                else posterior.mode()
            )
            kl = posterior.kl()
        else:
            y = moments
            kl = jnp.zeros(x.shape[0], jnp.float32)

        z = self.h_a(jax.lax.stop_gradient(y))
        z_hat, z_likelihoods = self.entropy_bottleneck(
            z, training=training, rng=rngs.get("eb")
        )
        scales, means = self.hyper_params(z_hat)
        y_hat, y_likelihoods = self.gaussian_conditional(
            y, scales, means=means, training=training, rng=rngs.get("gc")
        )
        x_hat = self.decode_y(y_hat)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
            "kl": kl,
        }

    # VAEformerCodec device-method surface
    def encode_symbols(self, x: jax.Array):
        return self.symbols_from_latent(self.encode_latent(x))

    def symbols_from_latent(self, y: jax.Array):
        z = self.h_a(y)
        medians = self.entropy_bottleneck.medians().reshape(1, -1, 1, 1)
        z_sym = jnp.round(z - medians).astype(jnp.int32)
        z_hat = z_sym.astype(z.dtype) + medians
        scales, means = self.hyper_params(z_hat)
        y_sym = jnp.round(y - means).astype(jnp.int32)
        return {"y_sym": y_sym, "z_sym": z_sym, "scales": scales, "means": means,
                "z_shape": z.shape[-2:], "y": y}

    def scales_from_z_symbols(self, z_sym: jax.Array):
        medians = self.entropy_bottleneck.medians().reshape(1, -1, 1, 1)
        z_hat = z_sym.astype(self.dtype) + medians
        return self.hyper_params(z_hat)

    def reconstruct_from_y_symbols(self, y_sym: jax.Array, means: jax.Array) -> jax.Array:
        return self.decode_y(y_sym.astype(means.dtype) + means)

    def aux_loss(self) -> jax.Array:
        return self.entropy_bottleneck.loss()
