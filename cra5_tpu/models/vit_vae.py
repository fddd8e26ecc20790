"""VIT_AutoencoderKL: pure variational ViT auto-encoder (no entropy
coding) for latent-diffusion-style downstream use.

Capability parity with the reference
(/root/reference/cra5/models/vaeformer/vit_vae.py:15-250: encode:114,
decode:121, ema_scope:95 — the reference file itself has broken imports
and is aspirational). Training pairs with ``train.ema.EmaState``; the
functional equivalent of the reference's ema_scope context manager is
evaluating with ``ema.params`` instead of the live params.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.vit import ViTDecoder, ViTEncoder
from .vaeformer import DiagonalGaussian, VAEformerConfig


class VITAutoencoderKL(nn.Module):
    cfg: VAEformerConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.encoder = ViTEncoder(
            img_size=c.img_size, patch_size=c.patch_size, patch_stride=c.patch_stride,
            in_chans=c.in_chans, embed_dim=c.y_channels, depth=c.depth,
            num_heads=c.num_heads, window_sizes=c.window_sizes, interval=c.interval,
            dtype=self.dtype,
        )
        self.decoder = ViTDecoder(
            img_size=c.img_size, patch_size=c.patch_size, patch_stride=c.patch_stride,
            out_chans=c.in_chans, embed_dim=c.y_channels, depth=c.depth,
            num_heads=c.num_heads, window_sizes=c.window_sizes, interval=c.interval,
            dtype=self.dtype,
        )
        self.quant_conv = nn.Conv(2 * c.embed_dim, (1, 1), dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(c.y_channels, (1, 1), dtype=self.dtype, name="post_quant_conv")

    def encode(self, x: jax.Array) -> DiagonalGaussian:
        moments = self.encoder(x)
        moments = self.quant_conv(moments.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        return DiagonalGaussian(moments)

    def decode(self, z: jax.Array) -> jax.Array:
        z = self.post_quant_conv(z.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        return self.decoder(z)

    def __call__(
        self,
        x: jax.Array,
        sample_posterior: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, Any]:
        posterior = self.encode(x)
        if sample_posterior and rng is not None:
            z = posterior.sample(rng)
        else:
            z = posterior.mode()
        x_hat = self.decode(z)
        return {
            "x_hat": x_hat,
            "kl": posterior.kl(),
            "posterior_mean": posterior.mean,
            "posterior_logvar": posterior.logvar,
        }
