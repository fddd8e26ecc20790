"""CompressAI image-codec zoo: the Ballé/Minnen model family in JAX.

Capability parity with the reference models
(/root/reference/cra5/models/compressai/models/google.py):
  - FactorizedPrior / FactorizedPriorReLU (google.py:64,166)
  - ScaleHyperprior (google.py:227)
  - MeanScaleHyperprior (google.py:386)
  - JointAutoregressiveHierarchicalPriors / mbt2018 (google.py:508)

TPU-first architecture: every transform is a stack of strided convs /
transposed convs in NCHW that XLA tiles onto the MXU; the train/eval
forward is a single jittable function. Entropy coding is host-side,
orchestrated by ``cra5_tpu.models.codec.ImageCodec``; the models expose
pure device methods (``encode_symbols`` / ``hyper_params_from_z`` /
``reconstruct``) so all NN compute stays under jit, and only int32
symbol tensors cross to the host — unlike the reference, which marshals
Python lists per tensor (entropy_models.py:263-271).

The autoregressive mbt2018 context model is the reference's own
"GPU-hostile" serial pattern (google.py:665-670); it is carried for
capability parity with a host-side AR loop in the codec, while the
recommended production path remains the hyperprior-only models.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..entropy import EntropyBottleneck, GaussianConditional
from ..nn.conv import MaskedConv2d, conv2d, deconv2d
from ..nn.gdn import GDN


class _ConvStack(nn.Module):
    """Sequential conv/deconv stack described by (layer_kind, args) specs."""

    specs: Tuple[Tuple, ...]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, spec in enumerate(self.specs):
            kind = spec[0]
            if kind == "conv":
                _, ch, k, s = spec
                x = conv2d(ch, k, s, name=f"l{i}")(x)
            elif kind == "deconv":
                _, ch, k, s = spec
                x = deconv2d(ch, k, s, name=f"l{i}")(x)
            elif kind == "gdn":
                x = GDN(spec[1], name=f"l{i}")(x)
            elif kind == "igdn":
                x = GDN(spec[1], inverse=True, name=f"l{i}")(x)
            elif kind == "relu":
                x = nn.relu(x)
            elif kind == "lrelu":
                x = nn.leaky_relu(x, negative_slope=0.01)
            elif kind == "gelu":
                x = nn.gelu(x, approximate=False)
            else:
                raise ValueError(f"unknown layer kind {kind}")
        return x


class CompressionModel(nn.Module):
    """Shared base: models with an EntropyBottleneck expose aux_loss()
    (parity with reference models/base.py:117-148)."""

    def aux_loss(self) -> jax.Array:
        return self.entropy_bottleneck.loss()


class FactorizedPrior(CompressionModel):
    """Ballé 2018 factorized-prior codec (reference google.py:64)."""

    N: int = 128
    M: int = 192
    in_channel: int = 3

    CODEC_KIND = "factorized"
    downsampling_factor = 16

    def setup(self):
        N, M, C = self.N, self.M, self.in_channel
        self.g_a = _ConvStack(
            (
                ("conv", N, 5, 2), ("gdn", N),
                ("conv", N, 5, 2), ("gdn", N),
                ("conv", N, 5, 2), ("gdn", N),
                ("conv", M, 5, 2),
            ),
            name="g_a",
        )
        self.g_s = _ConvStack(
            (
                ("deconv", N, 5, 2), ("igdn", N),
                ("deconv", N, 5, 2), ("igdn", N),
                ("deconv", N, 5, 2), ("igdn", N),
                ("deconv", C, 5, 2),
            ),
            name="g_s",
        )
        self.entropy_bottleneck = EntropyBottleneck(channels=self.M)

    def __call__(
        self, x: jax.Array, training: bool = False, rng: Optional[jax.Array] = None
    ) -> Dict[str, Any]:
        y = self.g_a(x)
        y_hat, y_likelihoods = self.entropy_bottleneck(y, training=training, rng=rng)
        x_hat = self.g_s(y_hat)
        return {"x_hat": x_hat, "likelihoods": {"y": y_likelihoods}}

    # device halves of compress/decompress (host coding in ImageCodec)
    def encode_symbols(self, x: jax.Array) -> Dict[str, Any]:
        y = self.g_a(x)
        medians = self.entropy_bottleneck.medians().reshape(1, -1, 1, 1)
        y_sym = jnp.round(y - medians).astype(jnp.int32)
        return {"y_sym": y_sym, "y_shape": y.shape[-2:]}

    def reconstruct(self, y_sym: jax.Array, means=None) -> jax.Array:
        medians = self.entropy_bottleneck.medians().reshape(1, -1, 1, 1)
        y_hat = y_sym.astype(jnp.float32) + medians
        return self.g_s(y_hat)


class FactorizedPriorReLU(FactorizedPrior):
    """GDN-free variant (reference google.py:166)."""

    def setup(self):
        N, M, C = self.N, self.M, self.in_channel
        self.g_a = _ConvStack(
            (
                ("conv", N, 5, 2), ("relu",),
                ("conv", N, 5, 2), ("relu",),
                ("conv", N, 5, 2), ("relu",),
                ("conv", M, 5, 2),
            ),
            name="g_a",
        )
        self.g_s = _ConvStack(
            (
                ("deconv", N, 5, 2), ("relu",),
                ("deconv", N, 5, 2), ("relu",),
                ("deconv", N, 5, 2), ("relu",),
                ("deconv", C, 5, 2),
            ),
            name="g_s",
        )
        self.entropy_bottleneck = EntropyBottleneck(channels=self.M)


class ScaleHyperprior(CompressionModel):
    """Ballé 2018 scale-hyperprior codec (reference google.py:227): the
    hyper-latent z codes per-position Gaussian *scales* for y (no means)."""

    N: int = 128
    M: int = 192
    in_channel: int = 3

    CODEC_KIND = "hyper"
    GC_HAS_MEANS = False
    downsampling_factor = 64

    def setup(self):
        self._build_g()
        self._build_h()
        self.entropy_bottleneck = EntropyBottleneck(channels=self.N)
        self.gaussian_conditional = GaussianConditional()

    def _build_g(self):
        N, M, C = self.N, self.M, self.in_channel
        self.g_a = _ConvStack(
            (
                ("conv", N, 5, 2), ("gdn", N),
                ("conv", N, 5, 2), ("gdn", N),
                ("conv", N, 5, 2), ("gdn", N),
                ("conv", M, 5, 2),
            ),
            name="g_a",
        )
        self.g_s = _ConvStack(
            (
                ("deconv", N, 5, 2), ("igdn", N),
                ("deconv", N, 5, 2), ("igdn", N),
                ("deconv", N, 5, 2), ("igdn", N),
                ("deconv", C, 5, 2),
            ),
            name="g_s",
        )

    def _build_h(self):
        N, M = self.N, self.M
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
                ("deconv", N, 5, 2), ("relu",),
                ("conv", M, 3, 1), ("relu",),
            ),
            name="h_s",
        )

    def _hyper_input(self, y: jax.Array) -> jax.Array:
        return jnp.abs(y)

    def _gaussian_params(self, z_hat: jax.Array):
        scales = self.h_s(z_hat)
        return scales, None

    def __call__(
        self, x: jax.Array, training: bool = False, rng: Optional[jax.Array] = None
    ) -> Dict[str, Any]:
        rngs = (
            dict(zip(("eb", "gc"), jax.random.split(rng, 2))) if rng is not None else {}
        )
        y = self.g_a(x)
        z = self.h_a(self._hyper_input(y))
        z_hat, z_likelihoods = self.entropy_bottleneck(
            z, training=training, rng=rngs.get("eb")
        )
        scales, means = self._gaussian_params(z_hat)
        y_hat, y_likelihoods = self.gaussian_conditional(
            y, scales, means=means, training=training, rng=rngs.get("gc")
        )
        x_hat = self.g_s(y_hat)
        return {"x_hat": x_hat, "likelihoods": {"y": y_likelihoods, "z": z_likelihoods}}

    def encode_symbols(self, x: jax.Array) -> Dict[str, Any]:
        y = self.g_a(x)
        z = self.h_a(self._hyper_input(y))
        medians = self.entropy_bottleneck.medians().reshape(1, -1, 1, 1)
        z_sym = jnp.round(z - medians).astype(jnp.int32)
        z_hat = z_sym.astype(z.dtype) + medians
        scales, means = self._gaussian_params(z_hat)
        y_sym = jnp.round(y - means if means is not None else y).astype(jnp.int32)
        out = {"y_sym": y_sym, "z_sym": z_sym, "scales": scales, "z_shape": z.shape[-2:]}
        if means is not None:
            out["means"] = means
        return out

    def hyper_params_from_z(self, z_sym: jax.Array):
        medians = self.entropy_bottleneck.medians().reshape(1, -1, 1, 1)
        z_hat = z_sym.astype(jnp.float32) + medians
        return self._gaussian_params(z_hat)

    def reconstruct(self, y_sym: jax.Array, means: Optional[jax.Array] = None) -> jax.Array:
        y_hat = y_sym.astype(jnp.float32)
        if means is not None:
            y_hat = y_hat + means
        return self.g_s(y_hat)


class MeanScaleHyperprior(ScaleHyperprior):
    """Minnen 2018 mean+scale hyperprior (reference google.py:386)."""

    GC_HAS_MEANS = True

    def _build_h(self):
        N, M = self.N, self.M
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

    def _hyper_input(self, y: jax.Array) -> jax.Array:
        return y

    def _gaussian_params(self, z_hat: jax.Array):
        params = self.h_s(z_hat)
        scales, means = jnp.split(params, 2, axis=1)
        return scales, means


class SampledYInBmshj2018(MeanScaleHyperprior):
    """Sampled-y ablation (reference models/ablate_sampley.py:68): g_a
    emits 2M moments and y is a VAE posterior sample (train) / mode
    (inference); entropy side is the mean-scale hyperprior."""

    sample_posterior: bool = True

    def _build_g(self):
        N, M, C = self.N, self.M, self.in_channel
        out = 2 * M if self.sample_posterior else M
        self.g_a = _ConvStack(
            (
                ("conv", N, 5, 2), ("gdn", N),
                ("conv", N, 5, 2), ("gdn", N),
                ("conv", N, 5, 2), ("gdn", N),
                ("conv", out, 5, 2),
            ),
            name="g_a",
        )
        self.g_s = _ConvStack(
            (
                ("deconv", N, 5, 2), ("igdn", N),
                ("deconv", N, 5, 2), ("igdn", N),
                ("deconv", N, 5, 2), ("igdn", N),
                ("deconv", C, 5, 2),
            ),
            name="g_s",
        )

    def _posterior_y(self, moments: jax.Array, rng: Optional[jax.Array]):
        if not self.sample_posterior:
            return moments, None
        from .vaeformer import DiagonalGaussian

        posterior = DiagonalGaussian(moments)
        if rng is not None:
            return posterior.sample(rng), posterior
        return posterior.mode(), posterior

    def __call__(
        self, x: jax.Array, training: bool = False, rng: Optional[jax.Array] = None
    ) -> Dict[str, Any]:
        rngs = (
            dict(zip(("post", "eb", "gc"), jax.random.split(rng, 3)))
            if rng is not None
            else {}
        )
        moments = self.g_a(x)
        y, posterior = self._posterior_y(moments, rngs.get("post"))
        z = self.h_a(self._hyper_input(y))
        z_hat, z_likelihoods = self.entropy_bottleneck(
            z, training=training, rng=rngs.get("eb")
        )
        scales, means = self._gaussian_params(z_hat)
        y_hat, y_likelihoods = self.gaussian_conditional(
            y, scales, means=means, training=training, rng=rngs.get("gc")
        )
        x_hat = self.g_s(y_hat)
        out = {"x_hat": x_hat, "likelihoods": {"y": y_likelihoods, "z": z_likelihoods}}
        if posterior is not None:
            out["kl"] = posterior.kl()
        return out

    def encode_symbols(self, x: jax.Array) -> Dict[str, Any]:
        # deterministic inference path: posterior mode
        moments = self.g_a(x)
        y, _ = self._posterior_y(moments, None)
        z = self.h_a(self._hyper_input(y))
        medians = self.entropy_bottleneck.medians().reshape(1, -1, 1, 1)
        z_sym = jnp.round(z - medians).astype(jnp.int32)
        z_hat = z_sym.astype(z.dtype) + medians
        scales, means = self._gaussian_params(z_hat)
        y_sym = jnp.round(y - means).astype(jnp.int32)
        return {
            "y_sym": y_sym, "z_sym": z_sym, "scales": scales,
            "means": means, "z_shape": z.shape[-2:],
        }


class JointAutoregressiveHierarchicalPriors(MeanScaleHyperprior):
    """mbt2018: mean-scale hyperprior + PixelCNN spatial context model
    (reference google.py:508). Training forward is fully parallel (the
    masked conv sees noise-quantized y); real compress/decompress is the
    serial raster-scan loop implemented host-side in
    ``codec.AutoregressiveCodec`` (reference _compress_ar google.py:717)."""

    N: int = 192
    M: int = 192

    CODEC_KIND = "autoregressive"
    context_kernel: int = 5

    def setup(self):
        self._build_g()
        self._build_h()
        self.entropy_bottleneck = EntropyBottleneck(channels=self.N)
        self.gaussian_conditional = GaussianConditional()
        M = self.M
        self.context_prediction = MaskedConv2d(
            2 * M, kernel_size=self.context_kernel, mask_type="A", name="context_prediction"
        )
        self.entropy_parameters = _ConvStack(
            (
                ("conv", M * 10 // 3, 1, 1), ("lrelu",),
                ("conv", M * 8 // 3, 1, 1), ("lrelu",),
                ("conv", M * 6 // 3, 1, 1),
            ),
            name="entropy_parameters",
        )

    def _build_h(self):
        N, M = self.N, self.M
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

    def __call__(
        self, x: jax.Array, training: bool = False, rng: Optional[jax.Array] = None
    ) -> Dict[str, Any]:
        from ..entropy.ops import quantize

        rngs = (
            dict(zip(("eb", "gc"), jax.random.split(rng, 2))) if rng is not None else {}
        )
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat, z_likelihoods = self.entropy_bottleneck(
            z, training=training, rng=rngs.get("eb")
        )
        params = self.h_s(z_hat)

        y_hat = quantize(y, "noise" if training else "dequantize", rng=rngs.get("gc"))
        ctx_params = self.context_prediction(y_hat)
        gaussian_params = self.entropy_parameters(
            jnp.concatenate([params, ctx_params], axis=1)
        )
        scales, means = jnp.split(gaussian_params, 2, axis=1)
        _, y_likelihoods = self.gaussian_conditional(
            y, scales, means=means, training=training,
            rng=jax.random.fold_in(rngs["gc"], 1) if "gc" in rngs else None,
        )
        x_hat = self.g_s(y_hat)
        return {"x_hat": x_hat, "likelihoods": {"y": y_likelihoods, "z": z_likelihoods}}

    # device halves for the AR codec
    def analysis(self, x: jax.Array):
        """x -> (y, z_sym): everything encodable before the serial loop."""
        y = self.g_a(x)
        z = self.h_a(y)
        medians = self.entropy_bottleneck.medians().reshape(1, -1, 1, 1)
        z_sym = jnp.round(z - medians).astype(jnp.int32)
        return {"y": y, "z_sym": z_sym, "z_shape": z.shape[-2:]}

    def hyper_synthesis(self, z_sym: jax.Array) -> jax.Array:
        medians = self.entropy_bottleneck.medians().reshape(1, -1, 1, 1)
        z_hat = z_sym.astype(jnp.float32) + medians
        return self.h_s(z_hat)

    def synthesis(self, y_hat: jax.Array) -> jax.Array:
        return self.g_s(y_hat)
