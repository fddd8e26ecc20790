"""Composable latent codecs: likelihood paths, composition, gain ladder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cra5_tpu.models.google import _ConvStack
from cra5_tpu.models.latent_codecs import (
    EntropyBottleneckLatentCodec,
    GainHyperpriorLatentCodec,
    GaussianConditionalLatentCodec,
    HyperLatentCodec,
    HyperpriorLatentCodec,
    RasterScanLatentCodec,
)


def _y(shape=(1, 8, 8, 8), seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape) * 2.0


def test_eb_latent_codec():
    codec = EntropyBottleneckLatentCodec(channels=8)
    y = _y()
    v = codec.init(jax.random.PRNGKey(1), y)
    out = codec.apply(v, y)
    assert out["y_hat"].shape == y.shape
    assert jnp.all(out["likelihoods"]["y"] > 0)


def test_gc_latent_codec():
    codec = GaussianConditionalLatentCodec()
    y = _y()
    ctx = jnp.ones((1, 16, 8, 8))
    v = codec.init(jax.random.PRNGKey(1), y, ctx)
    out = codec.apply(v, y, ctx)
    assert out["y_hat"].shape == y.shape
    # ste: y_hat is integer-offset from means (means = 1)
    np.testing.assert_allclose(
        np.asarray(out["y_hat"] - 1.0), np.round(np.asarray(out["y_hat"] - 1.0)), atol=1e-5
    )


def _mini_h(z_ch, out_ch):
    h_a = _ConvStack((("conv", z_ch, 3, 1), ("relu",), ("conv", z_ch, 5, 2)), name="h_a")
    h_s = _ConvStack((("deconv", out_ch, 5, 2),), name="h_s")
    return h_a, h_s


def test_hyperprior_latent_codec_composition():
    h_a, h_s = _mini_h(4, 16)
    codec = HyperpriorLatentCodec(z_channels=4, h_a=h_a, h_s=h_s)
    y = _y()
    v = codec.init(jax.random.PRNGKey(1), y)
    out = codec.apply(v, y)
    assert set(out["likelihoods"]) == {"y", "z"}
    assert out["y_hat"].shape == y.shape


def test_rasterscan_latent_codec():
    from cra5_tpu.nn.conv import MaskedConv2d

    M = 8
    ctx = MaskedConv2d(2 * M, kernel_size=5, mask_type="A", name="cp")
    ep = _ConvStack((("conv", 2 * M, 1, 1),), name="ep")
    codec = RasterScanLatentCodec(M=M, context_prediction=ctx, entropy_parameters=ep)
    y = _y()
    params = jnp.ones((1, 2 * M, 8, 8))
    v = codec.init(jax.random.PRNGKey(1), y, params)
    out = codec.apply(v, y, params)
    assert out["likelihoods"]["y"].shape == y.shape


def test_gain_hyperprior_rate_ladder():
    """Larger gains -> finer quantization -> more bits (lower likelihood
    product). Set gain levels manually and compare bpp."""
    h_a, h_s = _mini_h(4, 16)
    codec = GainHyperpriorLatentCodec(
        z_channels=4, y_channels=8, num_gains=2, h_a=h_a, h_s=h_s
    )
    y = _y()
    v = codec.init(jax.random.PRNGKey(1), y, 0)
    params = v["params"]
    params = {**params, "y_gain": jnp.asarray([[4.0] * 8, [0.25] * 8])}
    v = {"params": params}

    def bits(gain_index):
        out = codec.apply(v, y, gain_index)
        return float(jnp.sum(-jnp.log2(out["likelihoods"]["y"])))

    assert bits(0) > bits(1)  # high-gain level spends more bits on y
