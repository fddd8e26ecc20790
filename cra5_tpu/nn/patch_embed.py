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


class _ConvParams(nn.Module):
    """Kernel/bias with the exact names, shapes, and inits of flax
    ``nn.Conv``/``nn.ConvTranspose`` so the matmul fast paths share one
    param tree with the general conv paths (checkpoints and the torch
    converter stay valid)."""

    features: int
    kernel_size: Tuple[int, int]
    in_features: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        shape = (*self.kernel_size, self.in_features, self.features)
        kernel = self.param("kernel", nn.initializers.lecun_normal(), shape)
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class PatchEmbed(nn.Module):
    """Strided-conv patch embedding.

    For the patch geometries actually used — kw == sw (columns tile) and
    kh in {sh, sh+1} (rows overlap by at most one) — the conv is computed
    as explicit patch extraction (slice/concat) + one MXU matmul, which
    XLA schedules better than the odd-strided convolution. Numerics match
    ``nn.Conv`` (cross-correlation, no flip); the general geometry falls
    back to the real conv with the same params."""

    embed_dim: int
    patch_size: Tuple[int, int]
    patch_stride: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, Tuple[int, int]]:
        """x: (B, C, H, W) -> tokens (B, Hp*Wp, D), (Hp, Wp)."""
        kh, kw = self.patch_size
        sh, sw = self.patch_stride
        B, C, H, W = x.shape
        Hp = (H - kh) // sh + 1
        Wp = (W - kw) // sw + 1
        kernel, bias = _ConvParams(
            self.embed_dim, self.patch_size, C, True, name="proj"
        )()
        xn = x.transpose(0, 2, 3, 1).astype(self.dtype)  # NHWC
        k = kernel.astype(self.dtype)

        if kw == sw and kh in (sh, sh + 1) and W == Wp * sw:
            main = xn[:, : Hp * sh].reshape(B, Hp, sh, W, C)
            if kh == sh + 1:
                extra = xn[:, sh :: sh][:, :Hp]  # row h*sh + sh per token
                patch = jnp.concatenate([main, extra[:, :, None]], axis=2)
            else:
                patch = main
            patch = patch.reshape(B, Hp, kh, Wp, kw, C).transpose(0, 1, 3, 2, 4, 5)
            y = patch.reshape(B, Hp * Wp, kh * kw * C) @ k.reshape(-1, self.embed_dim)
        else:
            y = jax.lax.conv_general_dilated(
                xn,
                k,
                window_strides=self.patch_stride,
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).reshape(B, Hp * Wp, self.embed_dim)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y, (Hp, Wp)


class PatchUnembed(nn.Module):
    """ConvTranspose inverse of PatchEmbed (no bias, parity with the
    reference's final layer).

    XLA lowers the strided conv_transpose itself to a pathological
    convolution_select fusion (~0.19 s of the 268v decode, ~3 TFLOP/s), so
    for the patch geometries actually used — kw == sw and kh in
    {sh, sh+1}, i.e. columns tile exactly and rows overlap by at most
    one — the same map is computed as one big MXU einsum producing
    per-token (kh, kw) output patches followed by a slice/concat
    overlap-add. Numerics match flax ``nn.ConvTranspose``
    (transpose_kernel=False ⇒ the kernel is applied spatially flipped);
    equivalence is locked by
    tests/test_convert.py::test_conv_transpose_final_parity and
    tests/test_nn.py."""

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
        kh, kw = self.patch_size
        sh, sw = self.patch_stride
        C = self.out_chans
        kernel, bias = _ConvParams(
            C, self.patch_size, D, self.use_bias, name="final"
        )()
        y = x.reshape(B, Hp, Wp, D).astype(self.dtype)
        k = kernel.astype(self.dtype)

        if kw == sw and kh in (sh, sh + 1):
            kf = k[::-1, ::-1]  # conv_transpose applies the kernel flipped
            patches = jnp.einsum("bhwd,ijdc->bhiwjc", y, kf)
            if kh == sh + 1:
                # row kh-1 of patch h lands on row 0 of patch h+1 (or the
                # final output row for the last patch): 721 = 71*10 + 11
                main = patches[:, :, :sh]
                extra = patches[:, :, sh]  # (B, Hp, Wp, kw, C)
                shifted = jnp.pad(
                    extra[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0))
                )
                first = main[:, :, 0] + shifted
                main = jnp.concatenate(
                    [first[:, :, None], main[:, :, 1:]], axis=2
                )
                out = jnp.concatenate(
                    [
                        main.reshape(B, Hp * sh, Wp * kw, C),
                        extra[:, -1:].reshape(B, kh - sh, Wp * kw, C),
                    ],
                    axis=1,
                )
            else:
                out = patches.reshape(B, Hp * kh, Wp * kw, C)
        else:
            out = jax.lax.conv_transpose(
                y,
                k,
                strides=self.patch_stride,
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if bias is not None:
            out = out + bias.astype(self.dtype)
        return out.transpose(0, 3, 1, 2)  # NCHW
