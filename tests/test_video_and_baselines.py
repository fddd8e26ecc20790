"""ScaleSpaceFlow video codec, VAEformer baselines, and the pure ViT VAE:
forward shapes/likelihoods and compress->decompress roundtrips."""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cra5_tpu.models.baseline import (
    VariationCNNPrior,
    vaeformer_former_baseline_tiny,
)
from cra5_tpu.models.vaeformer import VAEformer, VAEformerCodec, vaeformer_tiny
from cra5_tpu.models.video import (
    ScaleSpaceFlow,
    ScaleSpaceFlowCodec,
    gaussian_volume,
    warp_volume_3d,
)
from cra5_tpu.models.vit_vae import VITAutoencoderKL


def test_gaussian_volume_shapes():
    x = jnp.ones((2, 3, 16, 16))
    vol = gaussian_volume(x, 1.5, 3)
    assert vol.shape == (2, 3, 4, 16, 16)
    # level 0 is the unblurred input
    np.testing.assert_array_equal(np.asarray(vol[:, :, 0]), np.asarray(x))


def test_warp_identity():
    """Zero flow at scale level 0 must return (approximately) the input."""
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 8, 8))
    vol = gaussian_volume(x, 1.5, 2)
    L = vol.shape[2]
    flow = jnp.zeros((1, 2, 8, 8))
    # normalized z hitting exactly level 0: ((z+1)*L-1)/2 = 0 -> z = (1-L)/L... solve: z = 1/L - 1
    scale = jnp.full((1, 1, 8, 8), 1.0 / L - 1.0)
    out = warp_volume_3d(vol, flow, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


@pytest.mark.slow  # quick-suite re-budget (VERDICT r4 next #8): heavy tail
def test_ssf_forward():
    model = ScaleSpaceFlow(num_levels=2, mid_planes=8, planes=8)
    frames = jax.random.uniform(jax.random.PRNGKey(0), (3, 1, 3, 128, 128))
    variables = model.init(jax.random.PRNGKey(1), frames)
    out = model.apply(variables, frames)
    assert out["x_hat"].shape == frames.shape
    assert set(out["likelihoods"][0]) == {"keyframe"}
    assert set(out["likelihoods"][1]) == {"motion", "residual"}
    aux = model.apply(variables, method=ScaleSpaceFlow.aux_loss)
    assert np.isfinite(float(aux))


@pytest.mark.slow
def test_ssf_roundtrip():
    model = ScaleSpaceFlow(num_levels=2, mid_planes=8, planes=8)
    frames = jax.random.uniform(jax.random.PRNGKey(0), (3, 1, 3, 128, 128))
    variables = model.init(jax.random.PRNGKey(1), frames)
    codec = ScaleSpaceFlowCodec(model, variables)
    strings, shapes = codec.compress([frames[i] for i in range(3)])
    assert len(strings) == 3
    dec = codec.decompress(strings, shapes)
    assert len(dec) == 3
    for d in dec:
        assert d.shape == (1, 3, 128, 128)
    # deterministic: the decoded keyframe equals the encoder's x_ref path
    strings2, _ = codec.compress([frames[i] for i in range(3)])
    assert bytes(strings[0][0][0]) == bytes(strings2[0][0][0])


def test_variation_cnn_prior_forward_and_roundtrip():
    cfg = vaeformer_tiny()
    model = VariationCNNPrior(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.in_chans, *cfg.img_size)) * 0.3
    variables = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(variables, x)
    assert out["x_hat"].shape == x.shape
    assert set(out["likelihoods"]) == {"y", "z"}

    codec = VAEformerCodec(model, variables, coder="v1")
    enc = codec.compress(x)
    dec = codec.decompress(enc["strings"], enc["z_shape"])
    assert dec["x_hat"].shape == x.shape


def test_meanscale_baseline_not_variational():
    cfg = vaeformer_tiny()
    model = VariationCNNPrior(cfg, variational=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.in_chans, *cfg.img_size)) * 0.3
    variables = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(variables, x)
    assert out["x_hat"].shape == x.shape
    assert float(jnp.sum(out["kl"])) == 0.0


def test_former_baseline_config():
    cfg = vaeformer_former_baseline_tiny()
    assert not cfg.lower_dim
    model = VAEformer(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.in_chans, *cfg.img_size)) * 0.3
    variables = model.init(jax.random.PRNGKey(1), x)
    params = variables["params"]
    assert "quant_conv" not in params and "post_quant_conv" not in params
    out = model.apply(variables, x)
    assert out["x_hat"].shape == x.shape


def test_vit_autoencoder_kl():
    cfg = vaeformer_tiny()
    model = VITAutoencoderKL(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, cfg.in_chans, *cfg.img_size)) * 0.3
    variables = model.init(jax.random.PRNGKey(1), x, sample_posterior=False)
    out = model.apply(variables, x, sample_posterior=False)
    assert out["x_hat"].shape == x.shape
    assert out["kl"].shape == (2,)
    # sampling path needs an rng and differs from the mode path
    out_s = model.apply(variables, x, sample_posterior=True, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(out_s["x_hat"]), np.asarray(out["x_hat"]))


def test_qrelu_clamp_and_grad():
    from cra5_tpu.nn.conv import qrelu

    x = jnp.array([-5.0, 0.5, 100.0, 300.0])
    y = qrelu(x)
    np.testing.assert_allclose(np.asarray(y), [0.0, 0.5, 100.0, 255.0])
    g = jax.grad(lambda v: jnp.sum(qrelu(v)))(x)
    assert float(g[1]) == 1.0  # pass-through inside the range
    assert np.all(np.isfinite(np.asarray(g)))
