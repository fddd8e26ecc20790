"""ELIC 2022 (He et al.): unevenly-grouped channel-conditional entropy
model with a two-pass checkerboard spatial context.

Capability parity with the reference
(/root/reference/cra5/models/compressai/models/elic2022.py:72-695):
ResidualBottleneckBlock transforms with attention, groups
[16, 16, 32, 64, M-128], cc_transforms channel supports, checkerboard
anchor/non-anchor passes via CheckboardMaskedConv2d, ParamAggregation
1x1 stacks.

TPU-first: the checkerboard is expressed as static masks and a
pack/unpack to (H, W/2) compact tensors — both coding passes are fully
vectorized rANS calls (no raster scan), so ELIC decode stays parallel on
device + host coder, unlike the mbt2018 serial loop.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import EntropyBottleneck, GaussianConditional, build_indexes
from ..entropy.ops import quantize_ste
from ..nn.conv import AttentionBlock, CheckerboardMaskedConv2d, conv2d, deconv2d
from .google import _ConvStack


class ResidualBottleneckBlock(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[1]
        h = conv2d(c // 2, 1, 1, name="conv1")(x)
        h = nn.relu(h)
        h = conv2d(c // 2, 3, 1, name="conv2")(h)
        h = nn.relu(h)
        h = conv2d(c, 1, 1, name="conv3")(h)
        return x + h


class _ElicAnalysis(nn.Module):
    N: int
    M: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        N, M = self.N, self.M
        x = conv2d(N, 5, 2, name="down1")(x)
        for i in range(3):
            x = ResidualBottleneckBlock(name=f"rb1_{i}")(x)
        x = conv2d(N, 5, 2, name="down2")(x)
        for i in range(3):
            x = ResidualBottleneckBlock(name=f"rb2_{i}")(x)
        x = AttentionBlock(N, name="attn1")(x)
        x = conv2d(N, 5, 2, name="down3")(x)
        for i in range(3):
            x = ResidualBottleneckBlock(name=f"rb3_{i}")(x)
        x = conv2d(M, 5, 2, name="down4")(x)
        x = AttentionBlock(M, name="attn2")(x)
        return x


class _ElicSynthesis(nn.Module):
    N: int
    out_chans: int

    @nn.compact
    def __call__(self, y: jax.Array) -> jax.Array:
        N = self.N
        x = AttentionBlock(y.shape[1], name="attn1")(y)
        x = deconv2d(N, 5, 2, name="up1")(x)
        for i in range(3):
            x = ResidualBottleneckBlock(name=f"rb1_{i}")(x)
        x = deconv2d(N, 5, 2, name="up2")(x)
        x = AttentionBlock(N, name="attn2")(x)
        for i in range(3):
            x = ResidualBottleneckBlock(name=f"rb2_{i}")(x)
        x = deconv2d(N, 5, 2, name="up3")(x)
        for i in range(3):
            x = ResidualBottleneckBlock(name=f"rb3_{i}")(x)
        return deconv2d(self.out_chans, 5, 2, name="up4")(x)


def _anchor_mask(H: int, W: int) -> np.ndarray:
    """1 at anchor positions ((h + w) even: [0::2,0::2] + [1::2,1::2])."""
    hh, ww = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    return ((hh + ww) % 2 == 0).astype(np.float32)


def checkerboard_pack(x: jax.Array, anchor: bool) -> jax.Array:
    """(B, C, H, W) -> (B, C, H, W//2) keeping anchor (or non-anchor)
    positions; W must be even."""
    if anchor:
        even = x[:, :, 0::2, 0::2]
        odd = x[:, :, 1::2, 1::2]
    else:
        even = x[:, :, 0::2, 1::2]
        odd = x[:, :, 1::2, 0::2]
    B, C, H2, W2 = even.shape
    out = jnp.stack([even, odd], axis=3)  # (B, C, H/2, 2, W/2)
    return out.reshape(B, C, 2 * H2, W2)


def checkerboard_unpack(packed: jax.Array, anchor: bool, W: int) -> jax.Array:
    """Inverse of checkerboard_pack; fills the complement with zeros."""
    B, C, H, W2 = packed.shape
    even = packed[:, :, 0::2]
    odd = packed[:, :, 1::2]
    out = jnp.zeros((B, C, H, W), packed.dtype)
    if anchor:
        out = out.at[:, :, 0::2, 0::2].set(even)
        out = out.at[:, :, 1::2, 1::2].set(odd)
    else:
        out = out.at[:, :, 0::2, 1::2].set(even)
        out = out.at[:, :, 1::2, 0::2].set(odd)
    return out


class ELIC2022(nn.Module):
    N: int = 192
    M: int = 320
    num_slices: int = 5
    in_channel: int = 3

    CODEC_KIND = "elic"
    downsampling_factor = 64

    @property
    def groups(self) -> List[int]:
        return [0, 16, 16, 32, 64, self.M - 128][: self.num_slices + 1]

    def setup(self):
        N, M = self.N, self.M
        if sum(self.groups[1:]) != M:
            raise ValueError(
                f"M={M} must equal sum of channel groups {self.groups[1:]} "
                f"(= {sum(self.groups[1:])}); adjust M or num_slices"
            )
        self.g_a = _ElicAnalysis(N, M, name="g_a")
        self.g_s = _ElicSynthesis(N, self.in_channel, name="g_s")
        self.h_a = _ConvStack(
            (
                ("conv", N, 3, 1), ("relu",),
                ("conv", N, 5, 2), ("relu",),
                ("conv", N, 5, 2),
            ),
            name="h_a",
        )
        self.h_s = _ConvStack(
            (
                ("deconv", N, 5, 2), ("relu",),
                ("deconv", N * 3 // 2, 5, 2), ("relu",),
                ("conv", 2 * M, 3, 1),
            ),
            name="h_s",
        )
        g = self.groups
        self.cc_transforms = [
            _ConvStack(
                (
                    ("conv", 224, 5, 1), ("relu",),
                    ("conv", 128, 5, 1), ("relu",),
                    ("conv", g[i + 1] * 2, 5, 1),
                ),
                name=f"cc_transforms_{i - 1}",
            )
            for i in range(1, self.num_slices)
        ]
        self.context_prediction = [
            CheckerboardMaskedConv2d(2 * g[i + 1], kernel_size=5, name=f"context_prediction_{i}")
            for i in range(self.num_slices)
        ]
        self.param_aggregation = [
            _ConvStack(
                (
                    ("conv", 640, 1, 1), ("relu",),
                    ("conv", 512, 1, 1), ("relu",),
                    ("conv", g[i + 1] * 2, 1, 1),
                ),
                name=f"param_aggregation_{i}",
            )
            for i in range(self.num_slices)
        ]
        self.entropy_bottleneck = EntropyBottleneck(channels=N)
        self.gaussian_conditional = GaussianConditional()

    def aux_loss(self) -> jax.Array:
        return self.entropy_bottleneck.loss()

    def _support(self, y_hat_slices: List[jax.Array], i: int, hyper_params: jax.Array) -> jax.Array:
        if i == 0:
            return hyper_params
        if i == 1:
            sup_in = y_hat_slices[0]
        else:
            sup_in = jnp.concatenate([y_hat_slices[0], y_hat_slices[i - 1]], axis=1)
        ch = self.cc_transforms[i - 1](sup_in)
        return jnp.concatenate([ch, hyper_params], axis=1)

    def __call__(
        self, x: jax.Array, training: bool = False, rng: Optional[jax.Array] = None
    ) -> Dict[str, Any]:
        y = self.g_a(x)
        B, C, H, W = y.shape
        z = self.h_a(y)
        z_hat, z_likelihoods = self.entropy_bottleneck(z, training=training, rng=rng)
        if not training:
            medians = self.entropy_bottleneck.medians().reshape(1, -1, 1, 1)
            z_hat = quantize_ste(z - medians) + medians

        means_l, scales_l = jnp.split(self.h_s(z_hat), 2, axis=1)
        hyper_params = jnp.concatenate([means_l, scales_l], axis=1)
        amask = jnp.asarray(_anchor_mask(H, W))[None, None]

        g = self.groups
        y_slices = jnp.split(y, np.cumsum(g[1:-1]), axis=1)
        y_hat_slices: List[jax.Array] = []
        likelihoods: List[jax.Array] = []

        for i, y_slice in enumerate(y_slices):
            gi = g[i + 1]
            support = self._support(y_hat_slices, i, hyper_params)
            zero_ctx = jnp.zeros((B, 2 * gi, H, W), y.dtype)
            pa_anchor = self.param_aggregation[i](
                jnp.concatenate([zero_ctx, support], axis=1)
            )
            means_anchor, scales_anchor = jnp.split(pa_anchor, 2, axis=1)

            y_anchor_hat = (
                quantize_ste(y_slice - means_anchor) + means_anchor
            ) * amask
            ctx = self.context_prediction[i](y_anchor_hat)
            pa_non = self.param_aggregation[i](jnp.concatenate([ctx, support], axis=1))
            means_non, scales_non = jnp.split(pa_non, 2, axis=1)

            scales_hat = scales_anchor * amask + scales_non * (1 - amask)
            means_hat = means_anchor * amask + means_non * (1 - amask)
            rng_i = jax.random.fold_in(rng, i + 1) if rng is not None else None
            _, lk = self.gaussian_conditional(
                y_slice, scales_hat, means=means_hat, training=training, rng=rng_i
            )
            likelihoods.append(lk)

            y_hat_slices.append(quantize_ste(y_slice - means_hat) + means_hat)

        y_hat = jnp.concatenate(y_hat_slices, axis=1)
        x_hat = self.g_s(y_hat)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": jnp.concatenate(likelihoods, axis=1), "z": z_likelihoods},
        }

    # ---- device halves for the two-pass host codec ----
    def analysis(self, x: jax.Array):
        y = self.g_a(x)
        z = self.h_a(y)
        medians = self.entropy_bottleneck.medians().reshape(1, -1, 1, 1)
        z_sym = jnp.round(z - medians).astype(jnp.int32)
        return {"y": y, "z_sym": z_sym, "z_shape": z.shape[-2:]}

    def hyper_params_from_z(self, z_sym: jax.Array) -> jax.Array:
        medians = self.entropy_bottleneck.medians().reshape(1, -1, 1, 1)
        z_hat = z_sym.astype(jnp.float32) + medians
        means_l, scales_l = jnp.split(self.h_s(z_hat), 2, axis=1)
        return jnp.concatenate([means_l, scales_l], axis=1)

    def anchor_params(self, y_hat_slices: Sequence[jax.Array], hyper_params: jax.Array, i: int):
        B, _, H, W = hyper_params.shape
        gi = self.groups[i + 1]
        support = self._support(list(y_hat_slices), i, hyper_params)
        pa = self.param_aggregation[i](
            jnp.concatenate([jnp.zeros((B, 2 * gi, H, W), hyper_params.dtype), support], axis=1)
        )
        means, scales = jnp.split(pa, 2, axis=1)
        return means, scales

    def non_anchor_params(
        self, y_anchor_hat: jax.Array, y_hat_slices: Sequence[jax.Array],
        hyper_params: jax.Array, i: int,
    ):
        support = self._support(list(y_hat_slices), i, hyper_params)
        ctx = self.context_prediction[i](y_anchor_hat)
        pa = self.param_aggregation[i](jnp.concatenate([ctx, support], axis=1))
        means, scales = jnp.split(pa, 2, axis=1)
        return means, scales

    def synthesis(self, y_hat: jax.Array) -> jax.Array:
        return self.g_s(y_hat)


class ElicCodec:
    """Host codec: per slice, one vectorized rANS pass for anchors and one
    for non-anchors (reference compress/decompress, elic2022.py:372-593)."""

    def __init__(self, model: ELIC2022, variables: Dict[str, Any], scale_table=None):
        from ..coder.rans_tpu import LaneCoder
        from ..entropy import eb_update, gc_update, get_scale_table
        from ..entropy.entropy_bottleneck import eb_params_from_variables

        self.model = model
        self.variables = variables
        self.scale_table = (
            np.asarray(scale_table, np.float32) if scale_table is not None else get_scale_table()
        )
        eb_params = eb_params_from_variables(variables, "entropy_bottleneck")
        self._eb = eb_update(eb_params)
        self._gc = gc_update(self.scale_table)
        self._eb_coder = LaneCoder(self._eb)
        self._gc_coder = LaneCoder(self._gc)
        self._scale_table_dev = jnp.asarray(self.scale_table)

        m = model
        cls = type(model)
        self._analysis = jax.jit(lambda v, x: m.apply(v, x, method=cls.analysis))
        self._hyper = jax.jit(lambda v, z: m.apply(v, z, method=cls.hyper_params_from_z))
        self._anchor_params = jax.jit(
            lambda v, sl, hp, i: m.apply(v, sl, hp, i, method=cls.anchor_params),
            static_argnums=(3,),
        )
        self._non_anchor_params = jax.jit(
            lambda v, ya, sl, hp, i: m.apply(v, ya, sl, hp, i, method=cls.non_anchor_params),
            static_argnums=(4,),
        )
        self._synthesis = jax.jit(lambda v, y: m.apply(v, y, method=cls.synthesis))
        self._forward = jax.jit(lambda v, x: m.apply(v, x))
        # single-dispatch checkerboard coding prep/post
        self._pack_prep = jax.jit(
            lambda y, means, scales, table, anchor: (
                checkerboard_pack(jnp.round(y - means).astype(jnp.int32), anchor),
                build_indexes(checkerboard_pack(scales, anchor).astype(jnp.float32), table),
            ),
            static_argnums=(4,),
        )
        self._unpack_post = jax.jit(
            lambda sym, means, anchor, W: checkerboard_unpack(
                sym.astype(jnp.float32) + checkerboard_pack(means, anchor), anchor, W
            ),
            static_argnums=(2, 3),
        )
        self._anchor_hat = jax.jit(
            lambda y, means, amask: (jnp.round(y - means) + means) * amask
        )
        self._blend_hat = jax.jit(
            lambda ya, y, means_n, amask: ya + (jnp.round(y - means_n) + means_n) * (1 - amask)
        )

    def forward(self, x):
        return self._forward(self.variables, jnp.asarray(x))

    def _gc_encode(self, y, means, scales, anchor: bool) -> List[bytes]:
        sym, idx = self._pack_prep(y, means, scales, self._scale_table_dev, anchor)
        return [
            self._gc_coder.encode_from_device(sym[i], idx[i])
            for i in range(sym.shape[0])
        ]

    def _gc_decode(self, strings, means, scales, anchor: bool, W: int) -> jax.Array:
        _, idx = self._pack_prep(
            jnp.zeros_like(means), means, scales, self._scale_table_dev, anchor
        )
        sym = jnp.stack(
            [
                self._gc_coder.decode_to_device(strings[i], idx[i])
                for i in range(len(strings))
            ]
        )
        return self._unpack_post(sym, means, anchor, W)

    def compress(self, x) -> Dict[str, Any]:
        out = self._analysis(self.variables, jnp.asarray(x))
        z_sym = out["z_sym"]
        B, C = z_sym.shape[:2]
        z_idx = jnp.broadcast_to(
            jnp.arange(C, dtype=jnp.int32)[None, :, None, None], z_sym.shape
        )
        z_strings = [
            self._eb_coder.encode_from_device(z_sym[i], z_idx[i]) for i in range(B)
        ]
        hyper_params = self._hyper(self.variables, z_sym)

        y = out["y"]
        W = y.shape[-1]
        g = self.model.groups
        y_slices = jnp.split(y, np.cumsum(g[1:-1]), axis=1)
        amask = jnp.asarray(_anchor_mask(y.shape[-2], W))[None, None]

        y_strings: List[bytes] = []
        y_hat_slices: List[jax.Array] = []
        for i, y_slice in enumerate(y_slices):
            means_a, scales_a = self._anchor_params(
                self.variables, tuple(y_hat_slices), hyper_params, i
            )
            y_strings.extend(self._gc_encode(y_slice, means_a, scales_a, True))
            y_anchor_hat = self._anchor_hat(y_slice, means_a, amask)
            means_n, scales_n = self._non_anchor_params(
                self.variables, y_anchor_hat, tuple(y_hat_slices), hyper_params, i
            )
            y_strings.extend(self._gc_encode(y_slice, means_n, scales_n, False))
            y_hat_slices.append(self._blend_hat(y_anchor_hat, y_slice, means_n, amask))

        return {
            "strings": [y_strings, z_strings],
            "shape": tuple(int(s) for s in out["z_sym"].shape[-2:]),
            "y_shape": tuple(int(s) for s in y.shape[-2:]),
        }

    def decompress(self, strings, shape, y_shape=None) -> Dict[str, Any]:
        y_strings, z_strings = strings[0], strings[1]
        B = len(z_strings)
        C = self.model.N
        full_z = (B, C, int(shape[0]), int(shape[1]))
        z_idx = jnp.broadcast_to(
            jnp.arange(C, dtype=jnp.int32)[None, :, None, None], full_z
        )
        z_sym = jnp.stack(
            [
                self._eb_coder.decode_to_device(z_strings[i], z_idx[i])
                for i in range(B)
            ]
        )
        hyper_params = self._hyper(self.variables, z_sym)
        H, W = (
            (int(shape[0]) * 4, int(shape[1]) * 4) if y_shape is None else (int(y_shape[0]), int(y_shape[1]))
        )
        amask = jnp.asarray(_anchor_mask(H, W))[None, None]

        y_hat_slices: List[jax.Array] = []
        si = 0
        for i in range(self.model.num_slices):
            means_a, scales_a = self._anchor_params(
                self.variables, tuple(y_hat_slices), hyper_params, i
            )
            anchor_strings = y_strings[si : si + B]
            si += B
            y_anchor_hat = self._gc_decode(anchor_strings, means_a, scales_a, True, W) * amask
            means_n, scales_n = self._non_anchor_params(
                self.variables, y_anchor_hat, tuple(y_hat_slices), hyper_params, i
            )
            non_strings = y_strings[si : si + B]
            si += B
            y_non_hat = self._gc_decode(non_strings, means_n, scales_n, False, W) * (1 - amask)
            y_hat_slices.append(y_anchor_hat + y_non_hat)

        y_hat = jnp.concatenate(y_hat_slices, axis=1)
        return {"x_hat": self._synthesis(self.variables, y_hat)}
