"""Composable latent codecs.

Capability parity with the reference latent-codec library
(/root/reference/cra5/models/compressai/latent_codecs/: hyperprior.py:46
EntropyBottleneckLatentCodec / HyperLatentCodec / HyperpriorLatentCodec,
gaussian_conditional.py GaussianConditionalLatentCodec, rasterscan.py:54
RasterScanLatentCodec, gain/hyper.py:47 + gain/hyperprior.py:46 gain
variants): building blocks that compose into full entropy models, so new
architectures assemble codecs instead of re-implementing them.

Each codec is a flax module whose ``__call__`` is the training/eval
likelihood path ({"y_hat", "likelihoods": {...}}); real coding composes
through the host codecs (models/codec.py) via the same device methods
the zoo models expose.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..entropy import EntropyBottleneck, GaussianConditional
from ..entropy.ops import quantize_ste


class EntropyBottleneckLatentCodec(nn.Module):
    """y coded by a learned factorized prior (reference hyperprior.py:46)."""

    channels: int

    def setup(self):
        self.entropy_bottleneck = EntropyBottleneck(channels=self.channels)

    def __call__(
        self, y: jax.Array, training: bool = False, rng: Optional[jax.Array] = None
    ) -> Dict[str, Any]:
        y_hat, lk = self.entropy_bottleneck(y, training=training, rng=rng)
        return {"y_hat": y_hat, "likelihoods": {"y": lk}}


class GaussianConditionalLatentCodec(nn.Module):
    """y coded by a Gaussian conditional; ctx_params -> (scales, means)
    optionally through an entropy-parameters net (reference
    gaussian_conditional.py)."""

    quantizer: str = "ste"  # "ste" | "noise"
    chunk: Tuple[str, str] = ("scales", "means")
    entropy_parameters: Optional[Callable] = None

    def setup(self):
        self.gaussian_conditional = GaussianConditional()

    def __call__(
        self,
        y: jax.Array,
        ctx_params: jax.Array,
        training: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, Any]:
        if self.entropy_parameters is not None:
            ctx_params = self.entropy_parameters(ctx_params)
        a, b = jnp.split(ctx_params, 2, axis=1)
        scales, means = (a, b) if self.chunk == ("scales", "means") else (b, a)
        _, lk = self.gaussian_conditional(
            y, scales, means=means, training=training, rng=rng
        )
        if self.quantizer == "ste":
            y_hat = quantize_ste(y - means) + means
        else:
            from ..entropy.ops import quantize

            y_hat = quantize(y, "noise" if training else "dequantize", means=means, rng=rng)
        return {"y_hat": y_hat, "likelihoods": {"y": lk}}


class HyperLatentCodec(nn.Module):
    """z = h_a(y) coded by an EB; emits entropy parameters h_s(z_hat)
    (reference hyperprior.py HyperLatentCodec)."""

    z_channels: int
    h_a: Any = None
    h_s: Any = None
    quantizer: str = "ste"

    def setup(self):
        self.entropy_bottleneck = EntropyBottleneck(channels=self.z_channels)

    def __call__(
        self, y: jax.Array, training: bool = False, rng: Optional[jax.Array] = None
    ) -> Dict[str, Any]:
        z = self.h_a(y)
        z_hat, lk = self.entropy_bottleneck(z, training=training, rng=rng)
        if self.quantizer == "ste" and not training:
            medians = self.entropy_bottleneck.medians().reshape(1, -1, 1, 1)
            z_hat = quantize_ste(z - medians) + medians
        return {"parameters": self.h_s(z_hat), "likelihoods": {"z": lk}}


class HyperpriorLatentCodec(nn.Module):
    """Full hyperprior: HyperLatentCodec parameters feed a
    GaussianConditionalLatentCodec for y (reference hyperprior.py:91)."""

    z_channels: int
    h_a: Any = None
    h_s: Any = None

    def setup(self):
        self.hyper = HyperLatentCodec(
            z_channels=self.z_channels, h_a=self.h_a, h_s=self.h_s, name="hyper"
        )
        self.y_codec = GaussianConditionalLatentCodec(name="y")

    def __call__(
        self, y: jax.Array, training: bool = False, rng: Optional[jax.Array] = None
    ) -> Dict[str, Any]:
        rngs = dict(zip(("z", "y"), jax.random.split(rng, 2))) if rng is not None else {}
        hyper_out = self.hyper(y, training=training, rng=rngs.get("z"))
        y_out = self.y_codec(
            y, hyper_out["parameters"], training=training, rng=rngs.get("y")
        )
        return {
            "y_hat": y_out["y_hat"],
            "likelihoods": {
                "y": y_out["likelihoods"]["y"],
                "z": hyper_out["likelihoods"]["z"],
            },
        }


class RasterScanLatentCodec(nn.Module):
    """PixelCNN context codec (reference rasterscan.py:54): parallel
    training path via the masked conv; real coding is the serial loop in
    codec.AutoregressiveCodec."""

    M: int
    context_prediction: Any = None
    entropy_parameters: Any = None

    def setup(self):
        self.gaussian_conditional = GaussianConditional()

    def __call__(
        self,
        y: jax.Array,
        params: jax.Array,
        training: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, Any]:
        from ..entropy.ops import quantize

        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        y_hat = quantize(y, "noise" if training else "dequantize", rng=rngs[0])
        ctx = self.context_prediction(y_hat)
        gp = self.entropy_parameters(jnp.concatenate([params, ctx], axis=1))
        scales, means = jnp.split(gp, 2, axis=1)
        _, lk = self.gaussian_conditional(
            y, scales, means=means, training=training, rng=rngs[1]
        )
        return {"y_hat": y_hat, "likelihoods": {"y": lk}}


class GainHyperLatentCodec(nn.Module):
    """Gain-conditioned hyper codec (reference gain/hyper.py:47): z is
    scaled by a per-quality learned gain vector before coding."""

    z_channels: int
    num_gains: int = 6
    h_a: Any = None
    h_s: Any = None

    def setup(self):
        self.entropy_bottleneck = EntropyBottleneck(channels=self.z_channels)
        self.gain = self.param(
            "gain", nn.initializers.ones, (self.num_gains, self.z_channels)
        )
        self.inv_gain = self.param(
            "inv_gain", nn.initializers.ones, (self.num_gains, self.z_channels)
        )

    def __call__(
        self,
        y: jax.Array,
        gain_index: int = 0,
        training: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, Any]:
        z = self.h_a(y)
        g = self.gain[gain_index].reshape(1, -1, 1, 1)
        ig = self.inv_gain[gain_index].reshape(1, -1, 1, 1)
        z_hat, lk = self.entropy_bottleneck(z * g, training=training, rng=rng)
        return {"parameters": self.h_s(z_hat * ig), "likelihoods": {"z": lk}}


class GainHyperpriorLatentCodec(nn.Module):
    """Gain-conditioned hyperprior (reference gain/hyperprior.py:46):
    per-quality gains on both y and z give one model a rate ladder."""

    z_channels: int
    y_channels: int
    num_gains: int = 6
    h_a: Any = None
    h_s: Any = None

    def setup(self):
        self.hyper = GainHyperLatentCodec(
            z_channels=self.z_channels, num_gains=self.num_gains,
            h_a=self.h_a, h_s=self.h_s, name="hyper",
        )
        self.y_codec = GaussianConditionalLatentCodec(name="y")
        self.y_gain = self.param(
            "y_gain", nn.initializers.ones, (self.num_gains, self.y_channels)
        )
        self.y_inv_gain = self.param(
            "y_inv_gain", nn.initializers.ones, (self.num_gains, self.y_channels)
        )

    def __call__(
        self,
        y: jax.Array,
        gain_index: int = 0,
        training: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, Any]:
        rngs = dict(zip(("z", "y"), jax.random.split(rng, 2))) if rng is not None else {}
        hyper_out = self.hyper(y, gain_index, training=training, rng=rngs.get("z"))
        g = self.y_gain[gain_index].reshape(1, -1, 1, 1)
        ig = self.y_inv_gain[gain_index].reshape(1, -1, 1, 1)
        y_out = self.y_codec(
            y * g, hyper_out["parameters"], training=training, rng=rngs.get("y")
        )
        return {
            "y_hat": y_out["y_hat"] * ig,
            "likelihoods": {
                "y": y_out["likelihoods"]["y"],
                "z": hyper_out["likelihoods"]["z"],
            },
        }
