"""Patch embedding and its exact inverse for the odd ERA5 geometry.

The reference embeds 721x1440 fields with a conv of kernel (11,10) and
stride (10,10) -> a 72x144 token grid, and inverts with a ConvTranspose of
the same kernel/stride -> exactly (71*10+11, 143*10+10) = (721, 1440), no
crop (reference vit_nlc.py:290-313 PatchEmbed, :628-630 final
ConvTranspose2d; SURVEY.md §7 hard part 5). Shapes are static for XLA.

Data layout is NCHW at module boundaries (matching the reference API); the
convs run through lax.conv_general_dilated with explicit dimension numbers.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class PatchEmbed(nn.Module):
    embed_dim: int
    patch_size: Tuple[int, int]
    patch_stride: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, Tuple[int, int]]:
        """x: (B, C, H, W) -> tokens (B, Hp*Wp, D), (Hp, Wp)."""
        y = nn.Conv(
            self.embed_dim,
            kernel_size=self.patch_size,
            strides=self.patch_stride,
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(x.transpose(0, 2, 3, 1))  # NHWC
        B, Hp, Wp, D = y.shape
        return y.reshape(B, Hp * Wp, D), (Hp, Wp)


class PatchUnembed(nn.Module):
    """ConvTranspose inverse of PatchEmbed (no bias, parity with the
    reference's final layer)."""

    out_chans: int
    patch_size: Tuple[int, int]
    patch_stride: Tuple[int, int]
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, grid: Tuple[int, int]) -> jax.Array:
        """x: (B, N, D) tokens on ``grid`` -> (B, out_chans, H, W)."""
        B, N, D = x.shape
        Hp, Wp = grid
        y = x.reshape(B, Hp, Wp, D)
        y = nn.ConvTranspose(
            self.out_chans,
            kernel_size=self.patch_size,
            strides=self.patch_stride,
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="final",
        )(y)
        return y.transpose(0, 3, 1, 2)  # NCHW
