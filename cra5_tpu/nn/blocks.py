"""ViT building blocks: MLP, global attention, rectangular-window attention,
and the pre-norm transformer block.

Capability parity with the reference blocks (/root/reference/cra5/models/
vaeformer/vit_nlc.py:52-287), re-designed TPU-first:

  - Attention math runs as batched einsums that XLA tiles onto the MXU;
    softmax accumulates in float32 even under bfloat16 params (an f32
    island, since probability consistency feeds the entropy model path).
  - Window attention reshapes (B, H, W, C) into a (B*num_windows) batch
    with static pad-to-multiple shapes — no data-dependent control flow —
    and supports the rectangular windows (24,24)/(12,48)/(48,12) the
    VAEformer cycles through (reference vaeformer.py:112).
  - The reference's optional flash-attention CUDA kernel (vit_nlc.py:25-29)
    maps to this module's fused attention path; a Pallas flash kernel can be
    slotted into ``_attend`` without touching callers.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# Fused-attention policy: "auto" uses the Pallas flash kernel on TPU for
# long sequences (the reference's flash-attn analogue), einsum otherwise.
_FLASH_MODE = os.environ.get("CRA5_TPU_FLASH", "auto")
_FLASH_MIN_SEQ = 2048


def set_flash_attention(mode: str) -> None:
    """mode: "auto" | "on" | "off"."""
    global _FLASH_MODE
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"invalid flash mode {mode!r}")
    _FLASH_MODE = mode


_FLASH_MIN_LOGIT_BYTES = 1 << 30  # 1 GiB of f32 logits


def _use_flash(n: int, batch_heads: int = 1) -> bool:
    if _FLASH_MODE == "off":
        return False
    if _FLASH_MODE == "on":
        return True
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    # long sequences (the reference's flash-attn case), OR short windows
    # whose total (B*nW, H, N, N) f32 logits would flood HBM — the batched
    # 268v encode has 144 windows x 16 heads x 576^2 at batch 8
    return n >= _FLASH_MIN_SEQ or batch_heads * n * n * 4 >= _FLASH_MIN_LOGIT_BYTES


def _attend(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """q, k, v: (B, H, N, D). Softmax in float32."""
    if _use_flash(q.shape[2], q.shape[0] * q.shape[1]):
        from ..ops.attention import flash_attention

        return flash_attention(q, k, v, scale)
    dtype = q.dtype
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def trunc_normal_init(stddev: float = 0.02, scale: float = 1.0):
    """The reference's Linear init: trunc_normal(std=0.02)
    (vit_nlc.py:646-655 _init_weights), optionally folded with the
    fix_init_weight depth rescale 1/sqrt(2*layer_id) applied at init time
    (vit_nlc.py:438-444 — a pure init-time transform there too, overwritten
    by loaded weights). Matching the reference's init scale matters for
    training parity: flax's lecun_normal default is ~10x wider at small
    embed dims and measurably slows RD convergence."""
    base = nn.initializers.truncated_normal(stddev=stddev)
    if scale == 1.0:
        return base

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale

    return init


class Mlp(nn.Module):
    hidden_features: int
    out_features: int
    out_init_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden_features, dtype=self.dtype,
                     kernel_init=trunc_normal_init(), name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_features, dtype=self.dtype,
                     kernel_init=trunc_normal_init(scale=self.out_init_scale),
                     name="fc2")(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth per sample; identity when rate == 0 or deterministic."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class Attention(nn.Module):
    """Global multi-head self attention over all tokens."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    proj_init_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, H: int, W: int) -> jax.Array:
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=trunc_normal_init(), name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        out = _attend(q, k, v, scale)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(self.dim, dtype=self.dtype,
                        kernel_init=trunc_normal_init(scale=self.proj_init_scale),
                        name="proj")(out)


def window_partition(x: jax.Array, wh: int, ww: int) -> jax.Array:
    """(B, H, W, C) -> (B * nWh * nWw, wh*ww, C); H % wh == 0, W % ww == 0."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, wh * ww, C)


def window_reverse(windows: jax.Array, wh: int, ww: int, H: int, W: int) -> jax.Array:
    """(B * nW, wh*ww, C) -> (B, H, W, C)."""
    C = windows.shape[-1]
    B = windows.shape[0] // ((H // wh) * (W // ww))
    x = windows.reshape(B, H // wh, W // ww, wh, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


class WindowAttention(nn.Module):
    """Rectangular-window multi-head attention with static pad/crop.

    Parity with reference WindowAttention (vit_nlc.py:190-258): zero-pad
    bottom/right to a window multiple, attend within each window, crop.
    """

    dim: int
    num_heads: int
    window_size: Tuple[int, int]
    qkv_bias: bool = True
    proj_init_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, H: int, W: int) -> jax.Array:
        B, N, C = x.shape
        wh, ww = self.window_size
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5

        x = x.reshape(B, H, W, C)
        pad_b = (wh - H % wh) % wh
        pad_r = (ww - W % ww) % ww
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        xw = window_partition(x, wh, ww)  # (B*nW, wh*ww, C)
        Bw, Nw, _ = xw.shape
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=trunc_normal_init(), name="qkv")(xw)
        qkv = qkv.reshape(Bw, Nw, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        out = _attend(q, k, v, scale)
        out = out.transpose(0, 2, 1, 3).reshape(Bw, Nw, C)
        out = nn.Dense(self.dim, dtype=self.dtype,
                       kernel_init=trunc_normal_init(scale=self.proj_init_scale),
                       name="proj")(out)

        x = window_reverse(out, wh, ww, Hp, Wp)
        if pad_b or pad_r:
            x = x[:, :H, :W, :]
        return x.reshape(B, H * W, C)


class Block(nn.Module):
    """Pre-norm transformer block; window attention when ``window_size`` is
    set, global attention otherwise (reference Block, vit_nlc.py:261-287)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    window_size: Optional[Tuple[int, int]] = None
    drop_path: float = 0.0
    layer_id: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, H: int, W: int, deterministic: bool = True) -> jax.Array:
        # reference fix_init_weight: attn.proj and mlp.fc2 kernels scaled by
        # 1/sqrt(2*(layer_id+1)) at init (vit_nlc.py:438-444)
        rescale = (2.0 * (self.layer_id + 1)) ** -0.5 if self.layer_id is not None else 1.0
        if self.window_size is not None:
            attn = WindowAttention(
                self.dim, self.num_heads, self.window_size, self.qkv_bias,
                proj_init_scale=rescale, dtype=self.dtype, name="attn",
            )
        else:
            attn = Attention(self.dim, self.num_heads, self.qkv_bias,
                             proj_init_scale=rescale, dtype=self.dtype, name="attn")
        dp = DropPath(self.drop_path)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + dp(attn(h, H, W), deterministic)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        x = x + dp(
            Mlp(int(self.dim * self.mlp_ratio), self.dim,
                out_init_scale=rescale, dtype=self.dtype, name="mlp")(h),
            deterministic,
        )
        return x
