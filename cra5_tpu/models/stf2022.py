"""STF 2022 (Zou et al., "The Devil Is in the Details"): symmetrical
Swin-transformer codec with a charm-style channel-slice entropy model.

Capability parity with the reference
(/root/reference/cra5/models/compressai/models/stf2022.py:386-822):
patch-embed + 4 Swin stages with patch merging (analysis) / splitting
(synthesis), GELU conv h_a and separate mean/scale hyper-synthesis, 12
channel slices with up-to-6-slice support (cc_mean/cc_scale transforms)
and latent residual prediction (lrp).

The channel-slice entropy model codes each slice with one vectorized
rANS pass (no spatial autoregression) — decode stays parallel. The same
``CharmSlices`` module and ``CharmCodec`` host wrapper are reused by
TCM 2023.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import EntropyBottleneck, GaussianConditional, build_indexes
from ..entropy.ops import quantize_ste
from ..nn.conv import conv2d, subpel_conv3x3
from ..nn.swin import SwinStage
from .google import _ConvStack


class CharmSlices(nn.Module):
    """Channel-autoregressive slice entropy parameters (minnen2020-style,
    as used by STF/TCM): per-slice mean/scale from hyper params + decoded
    support slices, plus latent residual prediction."""

    M: int
    num_slices: int
    slice_size: int
    max_support: int

    def setup(self):
        s = self.slice_size
        def stack(i, extra, name):
            return _ConvStack(
                (
                    ("conv", 224, 3, 1), ("gelu",),
                    ("conv", 176, 3, 1), ("gelu",),
                    ("conv", 128, 3, 1), ("gelu",),
                    ("conv", 64, 3, 1), ("gelu",),
                    ("conv", s, 3, 1),
                ),
                name=name,
            )

        self.cc_mean_transforms = [
            stack(i, s * min(i, self.max_support), f"cc_mean_transforms_{i}")
            for i in range(self.num_slices)
        ]
        self.cc_scale_transforms = [
            stack(i, s * min(i, self.max_support), f"cc_scale_transforms_{i}")
            for i in range(self.num_slices)
        ]
        self.lrp_transforms = [
            stack(i, s * min(i + 1, self.max_support + 1), f"lrp_transforms_{i}")
            for i in range(self.num_slices)
        ]

    def slice_params(
        self,
        latent_means: jax.Array,
        latent_scales: jax.Array,
        y_hat_slices: Sequence[jax.Array],
        i: int,
    ) -> Tuple[jax.Array, jax.Array]:
        support = list(y_hat_slices[: self.max_support])
        mean_support = jnp.concatenate([latent_means] + support, axis=1)
        scale_support = jnp.concatenate([latent_scales] + support, axis=1)
        mu = self.cc_mean_transforms[i](mean_support)
        sigma = self.cc_scale_transforms[i](scale_support)
        return mu, sigma

    def lrp(
        self,
        latent_means: jax.Array,
        y_hat_slices: Sequence[jax.Array],
        y_hat_slice: jax.Array,
        i: int,
    ) -> jax.Array:
        support = list(y_hat_slices[: self.max_support])
        lrp_support = jnp.concatenate([latent_means] + support + [y_hat_slice], axis=1)
        return 0.5 * jnp.tanh(self.lrp_transforms[i](lrp_support))


class SymmetricalTransFormer2022(nn.Module):
    """stf2022 (reference class name preserved in the zoo alias 'stf')."""

    embed_dim: int = 48
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 4
    num_slices: int = 12
    in_channel: int = 3

    CODEC_KIND = "charm"
    downsampling_factor = 64

    @property
    def N(self) -> int:
        return self.embed_dim * 4

    @property
    def M(self) -> int:
        return self.embed_dim * 8

    @property
    def slice_size(self) -> int:
        return self.M // self.num_slices

    @property
    def max_support(self) -> int:
        return self.num_slices // 2

    def setup(self):
        ed = self.embed_dim

        class _PatchEmbed2(nn.Module):
            """Non-overlapping 2x2 patch embed (VALID padding)."""

            @nn.compact
            def __call__(self, x):
                y = nn.Conv(ed, (2, 2), strides=(2, 2), padding="VALID", name="proj")(
                    x.transpose(0, 2, 3, 1)
                )
                return y.transpose(0, 3, 1, 2)

        self.patch_embed = _PatchEmbed2(name="patch_embed")
        self.layers = [
            SwinStage(
                dim=ed * 2 ** i,
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                window_size=self.window_size,
                resample="merge" if i < len(self.depths) - 1 else None,
                name=f"layers_{i}",
            )
            for i in range(len(self.depths))
        ]
        rdepths = self.depths[::-1]
        rheads = self.num_heads[::-1]
        self.syn_layers = [
            SwinStage(
                dim=ed * 2 ** (len(self.depths) - 1 - i),
                depth=rdepths[i],
                num_heads=rheads[i],
                window_size=self.window_size,
                resample="split" if i < len(self.depths) - 1 else None,
                name=f"syn_layers_{i}",
            )
            for i in range(len(self.depths))
        ]
        self.end_conv = _ConvStack(
            (("conv", ed * 4, 5, 1),), name="end_conv_pre"
        )
        self.end_out = conv2d(self.in_channel, 3, 1, name="end_conv_out")

        N, M = self.N, self.M
        self.h_a = _ConvStack(
            (
                ("conv", 384, 3, 1), ("gelu",),
                ("conv", 336, 3, 1), ("gelu",),
                ("conv", 288, 3, 2), ("gelu",),
                ("conv", 240, 3, 1), ("gelu",),
                ("conv", N, 3, 2),
            ),
            name="h_a",
        )

        def hyper_syn(name):
            class _HS(nn.Module):
                M: int

                @nn.compact
                def __call__(self, x):
                    x = conv2d(240, 3, 1, name="c1")(x)
                    x = nn.gelu(x, approximate=False)
                    x = subpel_conv3x3(288, 2, name="up1")(x)
                    x = nn.gelu(x, approximate=False)
                    x = conv2d(336, 3, 1, name="c2")(x)
                    x = nn.gelu(x, approximate=False)
                    x = subpel_conv3x3(384, 2, name="up2")(x)
                    x = nn.gelu(x, approximate=False)
                    return conv2d(self.M, 3, 1, name="c3")(x)

            return _HS(M, name=name)

        self.h_mean_s = hyper_syn("h_mean_s")
        self.h_scale_s = hyper_syn("h_scale_s")

        self.charm = CharmSlices(
            M=M, num_slices=self.num_slices, slice_size=self.slice_size,
            max_support=self.max_support, name="charm",
        )
        self.entropy_bottleneck = EntropyBottleneck(channels=N)
        self.gaussian_conditional = GaussianConditional()

    def aux_loss(self) -> jax.Array:
        return self.entropy_bottleneck.loss()

    def g_a(self, x: jax.Array) -> jax.Array:
        y = self.patch_embed(x)  # (B, ed, H/2, W/2)
        B, C, H, W = y.shape
        t = y.reshape(B, C, H * W).transpose(0, 2, 1)
        for layer in self.layers:
            t, H, W = layer(t, H, W)
        C = t.shape[-1]
        return t.transpose(0, 2, 1).reshape(B, C, H, W)

    def g_s(self, y_hat: jax.Array) -> jax.Array:
        B, C, H, W = y_hat.shape
        t = y_hat.reshape(B, C, H * W).transpose(0, 2, 1)
        for layer in self.syn_layers:
            t, H, W = layer(t, H, W)
        x = t.transpose(0, 2, 1).reshape(B, self.embed_dim, H, W)
        x = self.end_conv(x)  # (B, 4*ed, H, W)
        # pixel shuffle x2 back to full resolution
        x = x.reshape(B, self.embed_dim, 2, 2, H, W)
        x = x.transpose(0, 1, 4, 2, 5, 3).reshape(B, self.embed_dim, 2 * H, 2 * W)
        return self.end_out(x)

    def _charm_forward(
        self, y: jax.Array, latent_means: jax.Array, latent_scales: jax.Array,
        training: bool, rng: Optional[jax.Array],
    ):
        y_slices = jnp.split(y, self.num_slices, axis=1)
        y_hat_slices: List[jax.Array] = []
        likelihoods: List[jax.Array] = []
        for i, y_slice in enumerate(y_slices):
            mu, sigma = self.charm.slice_params(latent_means, latent_scales, y_hat_slices, i)
            rng_i = jax.random.fold_in(rng, i + 1) if rng is not None else None
            _, lk = self.gaussian_conditional(
                y_slice, sigma, means=mu, training=training, rng=rng_i
            )
            likelihoods.append(lk)
            y_hat_slice = quantize_ste(y_slice - mu) + mu
            y_hat_slice = y_hat_slice + self.charm.lrp(latent_means, y_hat_slices, y_hat_slice, i)
            y_hat_slices.append(y_hat_slice)
        return jnp.concatenate(y_hat_slices, axis=1), jnp.concatenate(likelihoods, axis=1)

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
        y_hat, y_likelihoods = self._charm_forward(y, latent_means, latent_scales, training, rng)
        x_hat = self.g_s(y_hat)
        return {"x_hat": x_hat, "likelihoods": {"y": y_likelihoods, "z": z_likelihoods}}

    # ---- device halves for CharmCodec ----
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

    def slice_params(self, latent_means, latent_scales, y_hat_slices, i: int):
        return self.charm.slice_params(latent_means, latent_scales, list(y_hat_slices), i)

    def slice_lrp(self, latent_means, y_hat_slices, y_hat_slice, i: int):
        return self.charm.lrp(latent_means, list(y_hat_slices), y_hat_slice, i)

    def synthesis(self, y_hat: jax.Array) -> jax.Array:
        return self.g_s(y_hat)


class CharmCodec:
    """Host codec for channel-slice (charm) models: one vectorized rANS
    pass per slice (reference stf2022.py compress/decompress). Slice
    symbols/indexes stay on device and code through the TPU lane coder
    (format v2)."""

    def __init__(self, model, variables: Dict[str, Any], scale_table=None):
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
        self._slice_params = jax.jit(
            lambda v, lm, ls, sl, i: m.apply(v, lm, ls, sl, i, method=cls.slice_params),
            static_argnums=(4,),
        )
        self._slice_lrp = jax.jit(
            lambda v, lm, sl, ys, i: m.apply(v, lm, sl, ys, i, method=cls.slice_lrp),
            static_argnums=(4,),
        )
        self._synthesis = jax.jit(lambda v, y: m.apply(v, y, method=cls.synthesis))
        self._forward = jax.jit(lambda v, x: m.apply(v, x))
        # single-dispatch coding prep (eager ops pay a round trip each)
        self._code_prep = jax.jit(
            lambda y_slice, mu, sigma, table: (
                jnp.round(y_slice - mu).astype(jnp.int32),
                build_indexes(sigma.astype(jnp.float32), table),
            )
        )
        self._apply_mu = jax.jit(lambda sym, mu: sym.astype(jnp.float32) + mu)

    def forward(self, x):
        return self._forward(self.variables, jnp.asarray(x))

    def _z_idx_dev(self, shape):
        C = shape[1]
        return jnp.broadcast_to(
            jnp.arange(C, dtype=jnp.int32)[None, :, None, None], shape
        )

    def compress(self, x) -> Dict[str, Any]:
        out = self._analysis(self.variables, jnp.asarray(x))
        z_sym = out["z_sym"]
        B = z_sym.shape[0]
        z_idx = self._z_idx_dev(z_sym.shape)
        z_strings = [
            self._eb_coder.encode_from_device(z_sym[i], z_idx[i]) for i in range(B)
        ]
        latent_means, latent_scales = self._hyper(self.variables, z_sym)

        y = out["y"]
        y_slices = jnp.split(y, self.model.num_slices, axis=1)
        y_hat_slices: List[jax.Array] = []
        y_strings: List[bytes] = []
        for i, y_slice in enumerate(y_slices):
            mu, sigma = self._slice_params(
                self.variables, latent_means, latent_scales, tuple(y_hat_slices), i
            )
            sym, idx = self._code_prep(y_slice, mu, sigma, self._scale_table_dev)
            for b in range(B):
                y_strings.append(self._gc_coder.encode_from_device(sym[b], idx[b]))
            y_hat_slice = self._apply_mu(sym, mu)
            y_hat_slice = y_hat_slice + self._slice_lrp(
                self.variables, latent_means, tuple(y_hat_slices), y_hat_slice, i
            )
            y_hat_slices.append(y_hat_slice)
        return {
            "strings": [y_strings, z_strings],
            "shape": tuple(int(s) for s in out["z_sym"].shape[-2:]),
        }

    def decompress(self, strings, shape) -> Dict[str, Any]:
        y_strings, z_strings = strings[0], strings[1]
        B = len(z_strings)
        C = getattr(self.model, "hyper_channels", self.model.N)
        full_z = (B, C, int(shape[0]), int(shape[1]))
        z_idx = self._z_idx_dev(full_z)
        z_sym = jnp.stack(
            [
                self._eb_coder.decode_to_device(z_strings[i], z_idx[i])
                for i in range(B)
            ]
        )
        latent_means, latent_scales = self._hyper(self.variables, z_sym)

        y_hat_slices: List[jax.Array] = []
        si = 0
        for i in range(self.model.num_slices):
            mu, sigma = self._slice_params(
                self.variables, latent_means, latent_scales, tuple(y_hat_slices), i
            )
            idx = self._gc_index(sigma)
            sym = jnp.stack(
                [
                    self._gc_coder.decode_to_device(y_strings[si + b], idx[b])
                    for b in range(B)
                ]
            )
            si += B
            y_hat_slice = self._apply_mu(sym, mu)
            y_hat_slice = y_hat_slice + self._slice_lrp(
                self.variables, latent_means, tuple(y_hat_slices), y_hat_slice, i
            )
            y_hat_slices.append(y_hat_slice)
        y_hat = jnp.concatenate(y_hat_slices, axis=1)
        return {"x_hat": self._synthesis(self.variables, y_hat)}

    def _gc_index(self, sigma):
        if not hasattr(self, "_gc_index_jit"):
            self._gc_index_jit = jax.jit(
                lambda s, table: build_indexes(s.astype(jnp.float32), table)
            )
        return self._gc_index_jit(sigma, self._scale_table_dev)
