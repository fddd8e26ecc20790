"""VAEformer ViT towers: encoder, decoder, hyperprior encoder/decoder.

Capability parity with the reference towers (/root/reference/cra5/models/
vaeformer/vit_nlc.py: ViT_Encoder:328, ViT_Decoder:553,
HyperpriorEncoder:488, HyperpriorDecoder:696), re-designed as flax modules:

  - Window pattern: block i uses window ``window_sizes[min(i % interval,
    len-1)]`` and goes global every ``interval``-th block
    ((i+1) % interval == 0), reference vit_nlc.py:402-410.
  - The encoder's dual final block (mean/logvar heads fed from the same
    activations, reference vit_nlc.py:463-475) is preserved: the module
    holds depth//2 + 1 blocks and concatenates the two head outputs.
  - The decoder has no positional embedding (reference ViT_Decoder) and
    ends with LayerNorm + either the exact ConvTranspose inverse (ERA5
    geometry) or a linear un-patchify.
  - Token layout is row-major (H-major) NLC; module boundaries are NCHW.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .blocks import Block, Mlp, trunc_normal_init
from .patch_embed import PatchEmbed, PatchUnembed
from .pos_embed import get_2d_sincos_pos_embed


def _block_cls(remat):
    """Optionally rematerialized Block: trades recompute for activation
    memory in the 24-deep ViT-L towers during training (jax.checkpoint).

    remat: False = no checkpointing; True or "full" = recompute the whole
    block in the backward; "dots" = jax's dots_with_no_batch_dims_saveable
    policy — the projection/MLP matmul outputs are SAVED and only the
    cheap elementwise/attention pieces recompute (~190 MB/block more
    live memory for one fewer forward's worth of matmul recompute)."""
    if not remat:
        return Block
    if remat == "dots":
        return nn.remat(
            Block,
            static_argnums=(2, 3, 4),
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    return nn.remat(Block, static_argnums=(2, 3, 4))


def _win_for_block(
    i: int,
    window: bool,
    interval: int,
    window_sizes: Sequence[Tuple[int, int]],
) -> Optional[Tuple[int, int]]:
    """None -> global attention; else the rectangular window for block i."""
    if not window or (i + 1) % interval == 0:
        return None
    return tuple(window_sizes[min(i % interval, len(window_sizes) - 1)])


def _mlp_hidden(embed_dim: int, z_dim: int) -> int:
    return int(np.sqrt(embed_dim // z_dim)) * z_dim


class ViTEncoder(nn.Module):
    """g_a: patch-embed + windowed ViT with dual mean/logvar final blocks.

    Output: (B, 2*embed_dim, Hp, Wp) moments (or (B, 2*z_dim, ...) when
    z_dim is set and the quantization MLP is internal)."""

    img_size: Tuple[int, int]
    patch_size: Tuple[int, int]
    patch_stride: Tuple[int, int]
    in_chans: int
    embed_dim: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    window: bool = True
    window_sizes: Sequence[Tuple[int, int]] = ((24, 24), (12, 48), (48, 12))
    interval: int = 4
    z_dim: Optional[int] = None
    drop_path_rate: float = 0.0
    remat: bool | str = False  # False | True("full") | "dots" (see nn.vit._block_cls)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        grid_shape = (
            self.img_size[0] // self.patch_stride[0],
            self.img_size[1] // self.patch_stride[1],
        )
        tokens, (Hp, Wp) = PatchEmbed(
            self.embed_dim, self.patch_size, self.patch_stride,
            dtype=self.dtype, name="patch_embed",
        )(x)

        pos = self.param(
            "pos_embed",
            lambda rng, shape: jnp.asarray(
                get_2d_sincos_pos_embed(self.embed_dim, grid_shape)[None]
            ),
            (1, grid_shape[0] * grid_shape[1], self.embed_dim),
        )
        tokens = tokens + pos.astype(tokens.dtype)

        n_seq = self.depth // 2  # sequential slots (last one is dualized)
        dpr = np.linspace(0.0, self.drop_path_rate, self.depth)

        def make_block(i: int, name: str, layer_id: int):
            return _block_cls(self.remat)(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                window_size=_win_for_block(i, self.window, self.interval, self.window_sizes),
                drop_path=float(dpr[i]),
                layer_id=layer_id,
                dtype=self.dtype,
                name=name,
            )

        h = tokens
        for i in range(n_seq - 1):
            h = make_block(i, f"blocks_{i}", i)(h, Hp, Wp, deterministic)
        mean = make_block(n_seq - 1, f"blocks_{n_seq - 1}", n_seq - 1)(h, Hp, Wp, deterministic)
        logvar = make_block(n_seq - 1, f"blocks_{n_seq}", n_seq)(h, Hp, Wp, deterministic)
        out = jnp.concatenate([mean, logvar], axis=2)  # (B, N, 2*D)

        if self.z_dim is not None:
            out = Mlp(
                2 * _mlp_hidden(self.embed_dim, self.z_dim),
                2 * self.z_dim,
                dtype=self.dtype,
                name="quan_mlp",
            )(out)

        B, N, C = out.shape
        return out.reshape(B, Hp, Wp, C).transpose(0, 3, 1, 2)


class ViTDecoder(nn.Module):
    """g_s: ViT decoder ending in LayerNorm + exact ConvTranspose inverse
    (or linear un-patchify for non-ERA5 geometries)."""

    img_size: Tuple[int, int]
    patch_size: Tuple[int, int]
    patch_stride: Tuple[int, int]
    out_chans: int
    embed_dim: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    window: bool = True
    window_sizes: Sequence[Tuple[int, int]] = ((24, 24), (12, 48), (48, 12))
    interval: int = 4
    z_dim: Optional[int] = None
    use_conv_transpose: bool = True
    drop_path_rate: float = 0.0
    remat: bool | str = False  # False | True("full") | "dots" (see nn.vit._block_cls)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jax.Array, deterministic: bool = True) -> jax.Array:
        """feat: (B, C, Hp, Wp) -> (B, out_chans, H, W)."""
        B, C, Hp, Wp = feat.shape
        x = feat.reshape(B, C, Hp * Wp).transpose(0, 2, 1)

        if self.z_dim is not None:
            x = Mlp(
                _mlp_hidden(self.embed_dim, self.z_dim),
                self.embed_dim,
                dtype=self.dtype,
                name="post_quan_mlp",
            )(x)

        dpr = np.linspace(0.0, self.drop_path_rate, self.depth)
        for j in range(self.depth - self.depth // 2):
            i = self.depth // 2 + j
            x = _block_cls(self.remat)(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                window_size=_win_for_block(i, self.window, self.interval, self.window_sizes),
                drop_path=float(dpr[i]),
                layer_id=j,
                dtype=self.dtype,
                name=f"blocks_{j}",
            )(x, Hp, Wp, deterministic)

        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)

        if self.use_conv_transpose:
            return PatchUnembed(
                self.out_chans, self.patch_size, self.patch_stride,
                use_bias=False, dtype=self.dtype, name="final",
            )(x, (Hp, Wp))
        # linear un-patchify: (B, N, D) -> (B, out, Hp*p1, Wp*p2)
        p1, p2 = self.patch_size
        x = nn.Dense(self.out_chans * p1 * p2, use_bias=False, dtype=self.dtype,
                     kernel_init=trunc_normal_init(), name="final")(x)
        x = x.reshape(B, Hp, Wp, p1, p2, self.out_chans)
        x = x.transpose(0, 5, 1, 3, 2, 4)
        return x.reshape(B, self.out_chans, Hp * p1, Wp * p2)


class HyperEncoder(nn.Module):
    """h_a: global-attention ViT over the latent grid + quantization MLP.

    Parity with reference HyperpriorEncoder (vit_nlc.py:488-551):
    depth//2 sequential blocks (no dual head), quan_mlp embed->z_dim."""

    img_size: Tuple[int, int]
    patch_size: Tuple[int, int]
    patch_stride: Tuple[int, int]
    in_chans: int
    z_dim: int
    embed_dim: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    interval: int = 1
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jax.Array, deterministic: bool = True) -> jax.Array:
        grid_shape = (
            self.img_size[0] // self.patch_stride[0],
            self.img_size[1] // self.patch_stride[1],
        )
        tokens, (Hp, Wp) = PatchEmbed(
            self.embed_dim, self.patch_size, self.patch_stride,
            dtype=self.dtype, name="patch_embed",
        )(y)
        pos = self.param(
            "pos_embed",
            lambda rng, shape: jnp.asarray(
                get_2d_sincos_pos_embed(self.embed_dim, grid_shape)[None]
            ),
            (1, grid_shape[0] * grid_shape[1], self.embed_dim),
        )
        x = tokens + pos.astype(tokens.dtype)

        dpr = np.linspace(0.0, self.drop_path_rate, self.depth)
        for i in range(self.depth // 2):
            x = Block(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                window_size=None,  # hyperprior runs global attention
                drop_path=float(dpr[i]),
                layer_id=i,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, Hp, Wp, deterministic)

        x = Mlp(
            _mlp_hidden(self.embed_dim, self.z_dim), self.z_dim,
            dtype=self.dtype, name="quan_mlp",
        )(x)
        B, N, C = x.shape
        return x.reshape(B, Hp, Wp, C).transpose(0, 3, 1, 2)


class HyperDecoder(nn.Module):
    """h_s: ViT over the hyper-latent grid; final linear expands to
    2*out_chans per pixel (scales, means). Parity with reference
    HyperpriorDecoder (vit_nlc.py:696-748)."""

    img_size: Tuple[int, int]
    patch_size: Tuple[int, int]
    patch_stride: Tuple[int, int]
    out_chans: int
    z_dim: int
    embed_dim: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z_hat: jax.Array, deterministic: bool = True) -> jax.Array:
        """z_hat: (B, z_dim, Hz, Wz) -> (B, 2*out_chans, Hz*p1, Wz*p2)."""
        B, C, Hp, Wp = z_hat.shape
        x = z_hat.reshape(B, C, Hp * Wp).transpose(0, 2, 1)
        x = Mlp(
            _mlp_hidden(self.embed_dim, self.z_dim), self.embed_dim,
            dtype=self.dtype, name="post_quan_mlp",
        )(x)

        dpr = np.linspace(0.0, self.drop_path_rate, self.depth)
        for j in range(self.depth - self.depth // 2):
            i = self.depth // 2 + j
            x = Block(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                window_size=None,
                drop_path=float(dpr[i]),
                layer_id=j,
                dtype=self.dtype,
                name=f"blocks_{j}",
            )(x, Hp, Wp, deterministic)

        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        p1, p2 = self.patch_size
        x = nn.Dense(
            2 * self.out_chans * p1 * p2, use_bias=False, dtype=self.dtype,
            kernel_init=trunc_normal_init(), name="final"
        )(x)
        x = x.reshape(B, Hp, Wp, p1, p2, 2 * self.out_chans)
        x = x.transpose(0, 5, 1, 3, 2, 4)
        return x.reshape(B, 2 * self.out_chans, Hp * p1, Wp * p2)
