"""Swin transformer blocks: relative-position-bias window attention with
cyclic shifts, patch merging/splitting.

Capability parity with the reference STF building blocks
(/root/reference/cra5/models/compressai/models/stf2022.py:57-384:
WindowAttention with relative_position_bias_table:68, cyclic shift +
attn mask SwinTransformerBlock:126, PatchMerging:204, PatchSplit:240,
BasicLayer:264), as reusable flax modules.

TPU-first: shift masks are precomputed static numpy constants per
(H, W, window, shift) — no data-dependent control flow; attention is
batched einsum on the MXU with f32 softmax.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .blocks import Mlp, window_partition, window_reverse


@functools.lru_cache(maxsize=64)
def _relative_position_index(wh: int, ww: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # (N, N)


@functools.lru_cache(maxsize=64)
def _shift_attn_mask(Hp: int, Wp: int, window: int, shift: int) -> Optional[np.ndarray]:
    """(nW, N, N) additive mask distinguishing rolled-in regions."""
    if shift == 0:
        return None
    img = np.zeros((1, Hp, Wp, 1), np.float32)
    cnt = 0
    for h in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for w in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[:, h, w, :] = cnt
            cnt += 1
    wins = img.reshape(1, Hp // window, window, Wp // window, window, 1)
    wins = wins.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window)
    mask = wins[:, None, :] - wins[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class SwinWindowAttention(nn.Module):
    dim: int
    window_size: Tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        """x: (B*nW, N, C); mask: (nW, N, N) additive or None."""
        Bw, N, C = x.shape
        wh, ww = self.window_size
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * wh - 1) * (2 * ww - 1), self.num_heads),
        )
        rel_idx = jnp.asarray(_relative_position_index(wh, ww))
        bias = bias_table[rel_idx.reshape(-1)].reshape(N, N, self.num_heads)
        bias = bias.transpose(2, 0, 1)[None]  # (1, nH, N, N)

        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(Bw, N, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
        )
        logits = logits + bias.astype(jnp.float32)
        if mask is not None:
            nW = mask.shape[0]
            logits = logits.reshape(Bw // nW, nW, self.num_heads, N, N)
            logits = logits + mask[None, :, None].astype(jnp.float32)
            logits = logits.reshape(Bw, self.num_heads, N, N)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(Bw, N, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 4
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, H: int, W: int) -> jax.Array:
        """x: (B, H*W, C)."""
        B, N, C = x.shape
        win = self.window_size
        shift = self.shift_size if min(H, W) > win else 0
        win_eff = min(win, H, W)

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x.reshape(B, H, W, C)

        pad_b = (win_eff - H % win_eff) % win_eff
        pad_r = (win_eff - W % win_eff) % win_eff
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(Hp, Wp, win_eff, shift))
        else:
            mask = None

        xw = window_partition(x, win_eff, win_eff)
        xw = SwinWindowAttention(
            self.dim, (win_eff, win_eff), self.num_heads, self.qkv_bias,
            dtype=self.dtype, name="attn",
        )(xw, mask)
        x = window_reverse(xw, win_eff, win_eff, Hp, Wp)

        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :H, :W]
        x = shortcut + x.reshape(B, N, C)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype, name="mlp")(h)
        return x


class PatchMerging(nn.Module):
    """2x downsample: concat 2x2 neighbors -> linear 4C -> 2C."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, H: int, W: int) -> jax.Array:
        B, N, C = x.shape
        x = x.reshape(B, H, W, C)
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1).reshape(B, (H // 2) * (W // 2), 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)


class PatchSplit(nn.Module):
    """2x upsample: linear C -> 2C, pixel-shuffle to C/2 per position."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, H: int, W: int) -> jax.Array:
        B, N, C = x.shape
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(2 * C, use_bias=False, dtype=self.dtype, name="reduction")(x)
        x = x.reshape(B, H, W, 2, 2, C // 2)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H * 2 * W, C // 2)
        return x


class SwinStage(nn.Module):
    """A stack of Swin blocks with alternating shifts, plus an optional
    resample (reference BasicLayer, stf2022.py:264)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int = 4
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    resample: Optional[str] = None  # "merge" | "split" | None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, H: int, W: int) -> Tuple[jax.Array, int, int]:
        for i in range(self.depth):
            x = SwinBlock(
                self.dim, self.num_heads, self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                dtype=self.dtype, name=f"blocks_{i}",
            )(x, H, W)
        if self.resample == "merge":
            x = PatchMerging(self.dim, dtype=self.dtype, name="downsample")(x, H, W)
            return x, H // 2, W // 2
        if self.resample == "split":
            x = PatchSplit(self.dim, dtype=self.dtype, name="upsample")(x, H, W)
            return x, H * 2, W * 2
        return x, H, W
