"""VAEformer end-to-end: forward likelihoods, compress -> bytes ->
decompress roundtrip on the tiny config (SURVEY.md §7 step 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cra5_tpu.models import VAEformer, VAEformerCodec, vaeformer_tiny, vaeformer_268


@pytest.fixture(scope="module")
def tiny_model():
    cfg = vaeformer_tiny()
    model = VAEformer(cfg)
    x = jnp.zeros((1, cfg.in_chans, *cfg.img_size))
    variables = model.init(jax.random.PRNGKey(0), x)
    return cfg, model, variables


def test_forward_shapes_and_likelihoods(tiny_model):
    cfg, model, variables = tiny_model
    x = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.in_chans, *cfg.img_size))
    out = model.apply(variables, x)
    assert out["x_hat"].shape == x.shape
    ly = np.asarray(out["likelihoods"]["y"])
    lz = np.asarray(out["likelihoods"]["z"])
    assert ly.shape == (2, cfg.embed_dim, *cfg.latent_grid)
    assert lz.shape == (2, cfg.z_channels, *cfg.hyper_grid)
    assert np.all(ly > 0) and np.all(ly <= 1)
    assert np.all(lz > 0) and np.all(lz <= 1)
    assert out["kl"].shape == (2,)


def test_forward_training_mode_noise(tiny_model):
    cfg, model, variables = tiny_model
    x = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.in_chans, *cfg.img_size))
    out1 = model.apply(variables, x, training=True, rng=jax.random.PRNGKey(3))
    out2 = model.apply(variables, x, training=True, rng=jax.random.PRNGKey(4))
    # noise draws differ between rngs
    assert not np.allclose(np.asarray(out1["x_hat"]), np.asarray(out2["x_hat"]))


def test_compress_decompress_roundtrip_v2(tiny_model):
    cfg, model, variables = tiny_model
    codec = VAEformerCodec(model, variables, coder="v2")
    x = jax.random.normal(jax.random.PRNGKey(5), (1, cfg.in_chans, *cfg.img_size))
    out = codec.compress(x)
    assert out["z_shape"] == cfg.hyper_grid
    assert len(out["strings"]) == 2
    y_strings, z_strings = out["strings"]
    assert isinstance(y_strings[0], bytes) and len(y_strings[0]) > 0

    dec = codec.decompress(out["strings"], out["z_shape"])
    x_hat = np.asarray(dec["x_hat"])
    assert x_hat.shape == x.shape
    assert np.all(np.isfinite(x_hat))

    # decompress must be *exactly* the encoder's reconstruction: compare
    # against the float path through the same quantized latents
    y = codec.encode_latent(x)
    sym = codec._symbols_from_latent(codec.variables, y, codec._scale_table_dev)
    x_ref = codec._reconstruct(codec.variables, sym["y_sym"], sym["means"])
    assert np.allclose(x_hat, np.asarray(x_ref), atol=1e-5)


def test_compress_decompress_roundtrip_v1(tiny_model):
    cfg, model, variables = tiny_model
    codec = VAEformerCodec(model, variables, coder="v1")
    x = jax.random.normal(jax.random.PRNGKey(6), (1, cfg.in_chans, *cfg.img_size))
    out = codec.compress(x)
    dec = codec.decompress(out["strings"], out["z_shape"])
    assert np.all(np.isfinite(np.asarray(dec["x_hat"])))


def test_v1_v2_same_reconstruction(tiny_model):
    """Both coders are lossless: identical x_hat."""
    cfg, model, variables = tiny_model
    x = jax.random.normal(jax.random.PRNGKey(7), (1, cfg.in_chans, *cfg.img_size))
    c1 = VAEformerCodec(model, variables, coder="v1")
    c2 = VAEformerCodec(model, variables, coder="v2")
    d1 = c1.decompress(c1.compress(x)["strings"], cfg.hyper_grid)
    d2 = c2.decompress(c2.compress(x)["strings"], cfg.hyper_grid)
    assert np.allclose(np.asarray(d1["x_hat"]), np.asarray(d2["x_hat"]), atol=1e-6)


def test_compress_from_latent_matches_compress(tiny_model):
    cfg, model, variables = tiny_model
    codec = VAEformerCodec(model, variables, coder="v2")
    x = jax.random.normal(jax.random.PRNGKey(8), (1, cfg.in_chans, *cfg.img_size))
    y = codec.encode_latent(x)
    out_a = codec.compress(x)
    out_b = codec.compress_from_latent(y)
    assert out_a["strings"][0][0] == out_b["strings"][0][0]
    assert out_a["strings"][1][0] == out_b["strings"][1][0]


def test_decompress_latent_return_format(tiny_model):
    cfg, model, variables = tiny_model
    codec = VAEformerCodec(model, variables, coder="v2")
    x = jax.random.normal(jax.random.PRNGKey(9), (1, cfg.in_chans, *cfg.img_size))
    out = codec.compress(x)
    y_hat = codec.decompress(out["strings"], out["z_shape"], return_format="latent")
    assert y_hat.shape == (1, cfg.embed_dim, *cfg.latent_grid)
    x_hat = np.asarray(codec.decode_latent(y_hat))
    assert x_hat.shape == x.shape


def test_bpp_estimate_close_to_actual(tiny_model):
    """Theoretic bpp from likelihoods vs actual coded size (entropy-
    estimation oracle, reference eval_model/__main__.py:136)."""
    cfg, model, variables = tiny_model
    codec = VAEformerCodec(model, variables, coder="v2")
    x = jax.random.normal(jax.random.PRNGKey(10), (1, cfg.in_chans, *cfg.img_size)) * 0.5
    fwd = codec.forward(x)
    num_pixels = cfg.img_size[0] * cfg.img_size[1]
    est_bits = float(
        sum(-jnp.log2(l).sum() for l in fwd["likelihoods"].values())
    )
    out = codec.compress(x)
    actual_bits = 8 * sum(len(s[0]) for s in (out["strings"][0], out["strings"][1]))
    # noise-free eval quantization: actual should be within ~40% of estimate
    # (tiny model, lane overhead) and never wildly off
    assert actual_bits < est_bits * 1.6 + 2000
    assert actual_bits > est_bits * 0.4


def test_268_config_geometry():
    cfg = vaeformer_268()
    assert cfg.latent_grid == (72, 144)
    assert cfg.hyper_grid == (18, 36)
    assert cfg.in_chans == 268
