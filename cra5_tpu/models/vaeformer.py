"""VAEformer: variational ViT auto-encoder with a ViT hyperprior entropy
model — the production ERA5 codec.

Capability parity with the reference model (/root/reference/cra5/models/
vaeformer/vaeformer.py:70-404): encode_latent / decode_latent / forward /
compress / compress_from_latent / decompress, the hardcoded 268-variable
configuration (vaeformer.py:93-142), quant/post-quant 1x1 convs
(vaeformer.py:153-155), and the DiagonalGaussianDistribution posterior
(modules/distributions.py:24-67).

TPU-first architecture:
  - The model is a pure flax module; ``VAEformerCodec`` wraps it with the
    entropy-coding state (CDF tables + coders) which is derived state, not
    parameters — so the jitted forward/encode/decode paths stay functional.
  - compress/decompress use the TPU interleaved-lane rANS (format v2) by
    default; the v1 bit-compatible host coder is selected with
    ``coder="v1"`` for reference-archive interop.
  - All shapes static; bf16 inference via ``dtype=jnp.bfloat16`` with f32
    islands in softmax and the entropy-model probability math.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import (
    EntropyBottleneck,
    GaussianConditional,
    build_indexes,
    eb_update,
    gc_update,
    get_scale_table,
)
from ..entropy.cdf import CdfTable
from ..nn.vit import HyperDecoder, HyperEncoder, ViTDecoder, ViTEncoder


@dataclasses.dataclass(frozen=True)
class VAEformerConfig:
    """Static hyper-parameters of a VAEformer variant."""

    in_chans: int
    img_size: Tuple[int, int]
    patch_size: Tuple[int, int]
    patch_stride: Tuple[int, int]
    embed_dim: int          # y channels after quant_conv chunk (e.g. 256)
    y_channels: int         # ViT width (e.g. 1024)
    z_channels: int
    depth: int
    num_heads: int
    window_sizes: Tuple[Tuple[int, int], ...]
    interval: int
    hyper_embed_dim: int
    hyper_depth: int
    hyper_num_heads: int
    hyper_patch: Tuple[int, int]
    sample_posterior: bool = False
    lower_dim: bool = True
    # the reference uses the exact ConvTranspose inverse only for the ERA5
    # (721, 1440) geometry and a linear un-patchify otherwise
    # (vit_nlc.py:628-632)
    use_conv_transpose: bool = True
    # rematerialize transformer blocks during training (memory for FLOPs)
    remat: bool | str = False  # False | True("full") | "dots" (see nn.vit._block_cls)
    name: str = "vaeformer"

    @property
    def latent_grid(self) -> Tuple[int, int]:
        return (
            self.img_size[0] // self.patch_stride[0],
            self.img_size[1] // self.patch_stride[1],
        )

    @property
    def hyper_grid(self) -> Tuple[int, int]:
        g = self.latent_grid
        return (g[0] // self.hyper_patch[0], g[1] // self.hyper_patch[1])


def vaeformer_268() -> VAEformerConfig:
    """The production 268-variable config (reference vaeformer.py:93-142)."""
    return VAEformerConfig(
        in_chans=268,
        img_size=(721, 1440),
        patch_size=(11, 10),
        patch_stride=(10, 10),
        embed_dim=256,
        y_channels=1024,
        z_channels=256,
        depth=24,
        num_heads=16,
        window_sizes=((24, 24), (12, 48), (48, 12)),
        interval=4,
        hyper_embed_dim=360,
        hyper_depth=8,
        hyper_num_heads=5,
        hyper_patch=(4, 4),
        name="vaeformer_268",
    )


def vaeformer_159() -> VAEformerConfig:
    """159-variable variant (6 pressure vars x 25 levels + 9 surface,
    reference config/vaeformer_era5_159v_1h.py); same ViT-L architecture."""
    return dataclasses.replace(vaeformer_268(), in_chans=159, name="vaeformer_159")


def vaeformer_tiny(in_chans: int = 8) -> VAEformerConfig:
    """Small geometry for tests/CI: 41x40 grid, 4x4 tokens. Mirrors the
    ERA5 relation H = (Hp-1)*stride + kernel so the ConvTranspose inverts
    exactly (41 = 3*10+11, like 721 = 71*10+11)."""
    return VAEformerConfig(
        in_chans=in_chans,
        img_size=(41, 40),
        patch_size=(11, 10),
        patch_stride=(10, 10),
        embed_dim=8,
        y_channels=16,
        z_channels=8,
        depth=4,
        num_heads=2,
        window_sizes=((2, 2), (1, 4), (4, 1)),
        interval=2,
        hyper_embed_dim=12,
        hyper_depth=2,
        hyper_num_heads=2,
        hyper_patch=(2, 2),
        name="vaeformer_tiny",
    )


class DiagonalGaussian:
    """Posterior over y: moments (B, 2C, H, W) -> mean/logvar with the
    reference's [-30, 20] logvar clamp."""

    def __init__(self, moments: jax.Array):
        mean, logvar = jnp.split(moments, 2, axis=1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)

    @property
    def std(self) -> jax.Array:
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self) -> jax.Array:
        return jnp.exp(self.logvar)

    def sample(self, rng: jax.Array) -> jax.Array:
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape, self.mean.dtype)

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self) -> jax.Array:
        return 0.5 * jnp.mean(
            jnp.square(self.mean) + self.var - 1.0 - self.logvar, axis=(1, 2, 3)
        )

    def nll(self, sample: jax.Array) -> jax.Array:
        logtwopi = float(np.log(2.0 * np.pi))
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + jnp.square(sample - self.mean) / self.var,
            axis=(1, 2, 3),
        )


class VAEformer(nn.Module):
    cfg: VAEformerConfig
    dtype: jnp.dtype = jnp.float32

    CODEC_KIND = "vaeformer"  # make_codec dispatches to VAEformerCodec

    def setup(self):
        c = self.cfg
        self.g_a = ViTEncoder(
            img_size=c.img_size, patch_size=c.patch_size, patch_stride=c.patch_stride,
            in_chans=c.in_chans, embed_dim=c.y_channels, depth=c.depth,
            num_heads=c.num_heads, window_sizes=c.window_sizes, interval=c.interval,
            remat=c.remat, dtype=self.dtype,
        )
        self.g_s = ViTDecoder(
            img_size=c.img_size, patch_size=c.patch_size, patch_stride=c.patch_stride,
            out_chans=c.in_chans, embed_dim=c.y_channels, depth=c.depth,
            num_heads=c.num_heads, window_sizes=c.window_sizes, interval=c.interval,
            use_conv_transpose=c.use_conv_transpose, remat=c.remat, dtype=self.dtype,
        )
        if c.lower_dim:
            self.quant_conv = nn.Conv(
                2 * c.embed_dim, (1, 1), dtype=self.dtype, name="quant_conv"
            )
            self.post_quant_conv = nn.Conv(
                c.y_channels, (1, 1), dtype=self.dtype, name="post_quant_conv"
            )
        self.h_a = HyperEncoder(
            img_size=c.latent_grid, patch_size=c.hyper_patch, patch_stride=c.hyper_patch,
            in_chans=c.embed_dim, z_dim=c.z_channels, embed_dim=c.hyper_embed_dim,
            depth=c.hyper_depth, num_heads=c.hyper_num_heads, interval=1,
            dtype=self.dtype,
        )
        self.h_s = HyperDecoder(
            img_size=c.latent_grid, patch_size=c.hyper_patch, patch_stride=c.hyper_patch,
            out_chans=c.embed_dim, z_dim=c.z_channels, embed_dim=c.hyper_embed_dim,
            depth=c.hyper_depth, num_heads=c.hyper_num_heads,
            dtype=self.dtype,
        )
        self.entropy_bottleneck = EntropyBottleneck(channels=c.z_channels)
        self.gaussian_conditional = GaussianConditional()

    def _conv1x1(self, conv: nn.Module, x: jax.Array) -> jax.Array:
        return conv(x.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)

    # -- building blocks ---------------------------------------------------
    def encode_moments(self, x: jax.Array) -> jax.Array:
        moments = self.g_a(x)
        if self.cfg.lower_dim:
            moments = self._conv1x1(self.quant_conv, moments)
        return moments

    def posterior_latent(
        self, moments: jax.Array, rng: Optional[jax.Array] = None
    ) -> Tuple[jax.Array, DiagonalGaussian]:
        posterior = DiagonalGaussian(moments)
        if self.cfg.sample_posterior:
            if rng is None:
                raise ValueError("sample_posterior requires an rng")
            return posterior.sample(rng), posterior
        return posterior.mode(), posterior

    def hyper_params(self, z_hat: jax.Array) -> Tuple[jax.Array, jax.Array]:
        gaussian_params = self.h_s(z_hat)
        scales, means = jnp.split(gaussian_params, 2, axis=1)
        return scales, means

    def decode_y(self, y_hat: jax.Array) -> jax.Array:
        if self.cfg.lower_dim:
            y_hat = self._conv1x1(self.post_quant_conv, y_hat)
        return self.g_s(y_hat)

    # -- jittable top-level paths -----------------------------------------
    def __call__(
        self,
        x: jax.Array,
        training: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, Any]:
        """Training/eval forward (reference vaeformer.py:302-333): returns
        x_hat, y/z likelihoods and posterior stats."""
        rngs = (
            dict(zip(("post", "eb", "gc"), jax.random.split(rng, 3)))
            if rng is not None
            else {}
        )
        moments = self.encode_moments(x)
        y, posterior = self.posterior_latent(moments, rngs.get("post"))

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
            "posterior_mean": posterior.mean,
            "posterior_logvar": posterior.logvar,
            "kl": posterior.kl(),
        }

    def encode_latent(self, x: jax.Array) -> jax.Array:
        """x -> continuous latent y (reference vaeformer.py:272-292)."""
        moments = self.encode_moments(x)
        y, _ = self.posterior_latent(moments)
        return y

    def encode_symbols(self, x: jax.Array):
        """Device part of compress: y, z, and z's medians-quantized symbols
        are produced here; entropy coding happens in VAEformerCodec."""
        y = self.encode_latent(x)
        return self.symbols_from_latent(y)

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
        scales, means = self.hyper_params(z_hat)
        return scales, means

    def reconstruct_from_y_symbols(self, y_sym: jax.Array, means: jax.Array) -> jax.Array:
        y_hat = y_sym.astype(means.dtype) + means
        return self.decode_y(y_hat)

    def aux_loss(self) -> jax.Array:
        return self.entropy_bottleneck.loss()

    def entropy_rate(self, y: jax.Array, rng: jax.Array):
        """Training-mode (noise-quantized) likelihoods of (y, z) under the
        current hyper/EB params, for fitting the entropy side on a FROZEN
        tower latent (train.calibrate). Mirrors the entropy half of
        ``__call__`` without touching g_a/g_s."""
        rngs = dict(zip(("eb", "gc"), jax.random.split(rng, 2)))
        z = self.h_a(y)
        z_hat, z_lik = self.entropy_bottleneck(z, training=True, rng=rngs["eb"])
        scales, means = self.hyper_params(z_hat)
        _, y_lik = self.gaussian_conditional(
            y, scales, means=means, training=True, rng=rngs["gc"]
        )
        return {"likelihoods": {"y": y_lik, "z": z_lik},
                "aux": self.entropy_bottleneck.loss()}


class VAEformerCodec:
    """Host-side orchestration of compress/decompress: owns the CDF tables
    and rANS coders around a pure VAEformer module.

    Parity surface: VAEformer.compress (reference vaeformer.py:350-376),
    .decompress (:378-400), .compress_from_latent (:334-348); strings are
    returned in the same [[y_string], [z_string]] nesting.
    """

    def __init__(
        self,
        model: VAEformer,
        variables: Dict[str, Any],
        coder: str = "v2",
        scale_table: Optional[np.ndarray] = None,
    ):
        self.model = model
        self.variables = variables
        self.coder = coder
        self.scale_table = (
            np.asarray(scale_table, np.float32) if scale_table is not None else get_scale_table()
        )
        self._eb_table: Optional[CdfTable] = None
        self._gc_table: Optional[CdfTable] = None

        cls = type(model)  # also hosts the baseline models (baseline.py)

        def _with_gc_idx(out, table):
            # fuse GC index building into the same dispatch as the model
            out = dict(out)
            out["gc_idx"] = build_indexes(
                jnp.asarray(out["scales"], jnp.float32), table
            )
            return out

        self._encode_symbols = jax.jit(
            lambda v, x, table: _with_gc_idx(
                model.apply(v, x, method=cls.encode_symbols), table
            )
        )
        self._symbols_from_latent = jax.jit(
            lambda v, y, table: _with_gc_idx(
                model.apply(v, y, method=cls.symbols_from_latent), table
            )
        )
        self._scales_from_z = jax.jit(
            lambda v, z, table: _with_gc_idx(
                dict(zip(("scales", "means"), model.apply(v, z, method=cls.scales_from_z_symbols))),
                table,
            )
        )
        self._reconstruct = jax.jit(
            lambda v, y_sym, means: model.apply(
                v, y_sym, means, method=cls.reconstruct_from_y_symbols
            )
        )
        self._encode_latent = jax.jit(
            lambda v, x: model.apply(v, x, method=cls.encode_latent)
        )
        self._decode_y = jax.jit(
            lambda v, y: model.apply(v, y, method=cls.decode_y)
        )
        self._forward = jax.jit(
            lambda v, x: model.apply(v, x)
        )
        self._scale_table_dev = jnp.asarray(self.scale_table)

    # -- table management --------------------------------------------------
    def update(self, force: bool = False) -> bool:
        """(Re)build CDF tables from the current EB params + scale table
        (parity with CompressionModel.update, reference models/base.py:91)."""
        if self._eb_table is not None and not force:
            return False
        from ..entropy.entropy_bottleneck import eb_params_from_variables

        eb_params = eb_params_from_variables(self.variables, "entropy_bottleneck")
        self._eb_table = eb_update(eb_params)
        self._gc_table = gc_update(self.scale_table)
        self._make_coders()
        return True

    def set_tables(self, eb_table: CdfTable, gc_table: CdfTable) -> None:
        """Install externally built tables (e.g. from a converted reference
        checkpoint whose trained CDF buffers ride along)."""
        self._eb_table = eb_table
        self._gc_table = gc_table
        self._make_coders()

    def _make_coders(self) -> None:
        from ..coder.rans_tpu import LaneCoder

        if self.coder == "v2":
            self._eb_coder = LaneCoder(self._eb_table)
            self._gc_coder = LaneCoder(self._gc_table)

    def _require_tables(self):
        if self._eb_table is None:
            self.update()

    # -- coding helpers ----------------------------------------------------
    def _encode_stream(self, table: CdfTable, coder, sym: np.ndarray, idx: np.ndarray) -> bytes:
        if self.coder == "v2":
            return coder.encode(sym, idx)
        from ..coder import native

        return native.encode_with_indexes(
            sym, idx, table.quantized_cdf, table.cdf_length, table.offset
        )

    def _decode_stream(self, table: CdfTable, coder, data: bytes, idx: np.ndarray) -> np.ndarray:
        if self.coder == "v2":
            return coder.decode(data, idx)
        from ..coder import native

        return native.decode_with_indexes(
            data, idx, table.quantized_cdf, table.cdf_length, table.offset
        )

    def _z_indexes(self, z_shape: Tuple[int, ...]) -> np.ndarray:
        """Per-channel CDF rows for z (reference entropy_models.py:512)."""
        B, C, H, W = z_shape
        return np.broadcast_to(
            np.arange(C, dtype=np.int32)[None, :, None, None], z_shape
        ).copy()

    # -- public API --------------------------------------------------------
    def compress(self, x) -> Dict[str, Any]:
        self._require_tables()
        out = self._encode_symbols(self.variables, jnp.asarray(x), self._scale_table_dev)
        return self._compress_symbols(out)

    def compress_from_latent(self, y) -> Dict[str, Any]:
        self._require_tables()
        out = self._symbols_from_latent(self.variables, jnp.asarray(y), self._scale_table_dev)
        return self._compress_symbols(out)

    def _compress_symbols(self, out) -> Dict[str, Any]:
        if self.coder == "v2":
            # fully device-resident coding: symbols never cross to host;
            # only the compacted streams do. All z and y encodes of the
            # batch are DISPATCHED before any host transfer, then finalized
            # with two batched roundtrips (LaneCoder.encode_finalize_many) —
            # the per-stream device_get serialization was the dominant
            # per-phase dispatch cost at batch > 1.
            gc_idx_dev = out["gc_idx"]
            z_sym_dev = out["z_sym"]
            B, C = z_sym_dev.shape[:2]
            z_idx_dev = jnp.broadcast_to(
                jnp.arange(C, dtype=jnp.int32)[None, :, None, None], z_sym_dev.shape
            )
            handles = self._eb_coder.encode_dispatch_batch(
                z_sym_dev, z_idx_dev
            ) + self._gc_coder.encode_dispatch_batch(out["y_sym"], gc_idx_dev)
            streams = self._eb_coder.encode_finalize_many(handles)
            z_strings, y_strings = streams[:B], streams[B:]
            # static array metadata: int() on a jit-returned shape VALUE
            # would block a ~30ms tunnel roundtrip per element
            zs = tuple(int(s) for s in z_sym_dev.shape[-2:])
            return {"strings": [y_strings, z_strings], "z_shape": zs, "shape": zs}

        # uint8 shrinks the transfer 4x but only holds 256 table rows
        idx_dtype = jnp.uint8 if len(self.scale_table) <= 256 else jnp.int32
        gc_idx_dev = out["gc_idx"].astype(idx_dtype)
        z_sym, y_sym, gc_idx = jax.device_get((out["z_sym"], out["y_sym"], gc_idx_dev))
        z_sym = np.asarray(z_sym)
        y_sym = np.asarray(y_sym)
        gc_idx = np.asarray(gc_idx).astype(np.int32)
        z_idx = self._z_indexes(z_sym.shape)

        z_strings = [
            self._encode_stream(self._eb_table, None, z_sym[i], z_idx[i])
            for i in range(z_sym.shape[0])
        ]
        y_strings = [
            self._encode_stream(self._gc_table, None, y_sym[i], gc_idx[i])
            for i in range(y_sym.shape[0])
        ]
        zs = tuple(int(s) for s in z_sym.shape[-2:])
        return {"strings": [y_strings, z_strings], "z_shape": zs, "shape": zs}

    def decompress(
        self, strings: Sequence, z_shape: Tuple[int, int], return_format: str = "reconstructed",
        sharding=None,
    ):
        """``sharding`` (a NamedSharding over the batch dim, e.g.
        P("dp")): dp-shard the NN half of the decode — decoded z symbols
        are placed sharded, so hyper-synthesis, the y decode scan, and
        g_s all run SPMD over the mesh (tools/recompress.decompress_batch
        is the mesh-aware wrapper)."""
        self._require_tables()
        y_strings, z_strings = strings[0], strings[1]
        B = len(z_strings)
        C = self.model.cfg.z_channels
        full_z_shape = (B, C, int(z_shape[0]), int(z_shape[1]))

        if self.coder == "v2":
            # device-resident decode: decoded symbols feed the hyper/
            # synthesis transforms without touching the host; one vmapped
            # scan covers the whole batch per stream kind. The y stream's
            # H2D is issued FIRST so its transfer rides under the z-scan
            # and hyper-synthesis compute (its indexes don't exist yet,
            # but its bytes do).
            g = self.model.cfg.latent_grid
            n_y = B * self.model.cfg.embed_dim * g[0] * g[1]
            y_up = self._gc_coder.upload_batch(list(y_strings), n_y // B)
            z_idx_dev = jnp.broadcast_to(
                jnp.arange(C, dtype=jnp.int32)[None, :, None, None], full_z_shape
            )
            z_sym = self._eb_coder.decode_batch_to_device(
                list(z_strings), z_idx_dev,
                row_plan=full_z_shape[2] * full_z_shape[3],
            )
            if sharding is not None:
                z_sym = jax.device_put(z_sym, sharding)
            hz = self._scales_from_z(self.variables, z_sym, self._scale_table_dev)
            means, gc_idx = hz["means"], hz["gc_idx"]
            y_sym = self._gc_coder.decode_uploaded_batch(y_up, gc_idx)
        else:
            z_idx = self._z_indexes(full_z_shape)
            z_sym = jnp.asarray(
                np.stack(
                    [
                        self._decode_stream(
                            self._eb_table, None, _unwrap(z_strings[i]), z_idx[i]
                        )
                        for i in range(B)
                    ]
                )
            )
            if sharding is not None:
                z_sym = jax.device_put(z_sym, sharding)
            hz = self._scales_from_z(self.variables, z_sym, self._scale_table_dev)
            means = hz["means"]
            idx_dtype = jnp.uint8 if len(self.scale_table) <= 256 else jnp.int32
            gc_idx = np.asarray(hz["gc_idx"].astype(idx_dtype)).astype(np.int32)
            y_sym = jnp.asarray(
                np.stack(
                    [
                        self._decode_stream(
                            self._gc_table, None, _unwrap(y_strings[i]), gc_idx[i]
                        )
                        for i in range(B)
                    ]
                )
            )
        if return_format == "latent":
            return np.asarray(y_sym.astype(jnp.float32) + means)
        x_hat = self._reconstruct(self.variables, y_sym, means)
        return {"x_hat": x_hat}

    # convenience mirrors of the reference float paths
    def forward(self, x):
        return self._forward(self.variables, jnp.asarray(x))

    def encode_latent(self, x):
        return self._encode_latent(self.variables, jnp.asarray(x))

    def decode_latent(self, y_hat):
        return self._decode_y(self.variables, jnp.asarray(y_hat))


def _unwrap(s):
    """Accept both `bytes` and the reference's `[bytes]` nesting."""
    if isinstance(s, (list, tuple)):
        return s[0]
    return s
