import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cra5_tpu.nn import (
    Attention,
    Block,
    GDN,
    HyperDecoder,
    HyperEncoder,
    MaskedConv2d,
    PatchEmbed,
    PatchUnembed,
    ViTDecoder,
    ViTEncoder,
    WindowAttention,
    get_2d_sincos_pos_embed,
)
from cra5_tpu.nn.vit import _win_for_block


def test_sincos_pos_embed_shape_and_range():
    pe = get_2d_sincos_pos_embed(64, (6, 8))
    assert pe.shape == (48, 64)
    assert np.all(np.abs(pe) <= 1.0 + 1e-6)
    # distinct positions get distinct embeddings
    assert not np.allclose(pe[0], pe[1])


def test_patch_embed_era5_geometry():
    """721x1440 with kernel (11,10)/stride (10,10) -> 72x144 and exact inverse."""
    pe = PatchEmbed(embed_dim=16, patch_size=(11, 10), patch_stride=(10, 10))
    x = jnp.zeros((1, 4, 721, 1440))
    v = pe.init(jax.random.PRNGKey(0), x)
    tokens, grid = pe.apply(v, x)
    assert grid == (72, 144)
    assert tokens.shape == (1, 72 * 144, 16)

    pu = PatchUnembed(out_chans=4, patch_size=(11, 10), patch_stride=(10, 10))
    vu = pu.init(jax.random.PRNGKey(0), tokens, grid)
    out = pu.apply(vu, tokens, grid)
    assert out.shape == (1, 4, 721, 1440)


def test_window_attention_equals_global_when_window_covers_grid():
    """A window equal to the whole grid must reproduce global attention."""
    dim, heads, H, W = 32, 4, 6, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (2, H * W, dim))
    ga = Attention(dim, heads)
    wa = WindowAttention(dim, heads, (H, W))
    vg = ga.init(jax.random.PRNGKey(1), x, H, W)
    yg = ga.apply(vg, x, H, W)
    yw = wa.apply(vg, x, H, W)  # same param structure/names
    assert np.allclose(np.asarray(yg), np.asarray(yw), atol=1e-5)


def test_window_attention_padding_path():
    """Grid not divisible by the window exercises pad+crop (72 % 48 != 0)."""
    dim, heads = 16, 2
    H, W = 6, 10
    wa = WindowAttention(dim, heads, (4, 4))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, H * W, dim))
    v = wa.init(jax.random.PRNGKey(1), x, H, W)
    y = wa.apply(v, x, H, W)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))


def test_window_locality():
    """With window attention, changing a token in one window must not change
    outputs in another window."""
    dim, heads, H, W = 16, 2, 4, 8
    wa = WindowAttention(dim, heads, (4, 4))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, H * W, dim))
    v = wa.init(jax.random.PRNGKey(1), x, H, W)
    y0 = np.asarray(wa.apply(v, x, H, W)).reshape(H, W, dim)
    x2 = x.at[0, 0].add(10.0)  # token (0,0): first window (cols 0-3)
    y1 = np.asarray(wa.apply(v, x2, H, W)).reshape(H, W, dim)
    assert not np.allclose(y0[:4, :4], y1[:4, :4])  # own window changed
    assert np.allclose(y0[:, 4:], y1[:, 4:])  # other window untouched


def test_win_for_block_pattern_matches_reference():
    """268v pattern: windows cycle (24,24),(12,48),(48,12); every 4th global."""
    ws = ((24, 24), (12, 48), (48, 12))
    pat = [_win_for_block(i, True, 4, ws) for i in range(12)]
    assert pat[0] == (24, 24) and pat[1] == (12, 48) and pat[2] == (48, 12)
    assert pat[3] is None and pat[7] is None and pat[11] is None
    assert pat[4] == (24, 24) and pat[6] == (48, 12)


def test_vit_encoder_decoder_shapes_small():
    """Small-geometry tower roundtrip shapes (static, windowed, dual head)."""
    enc = ViTEncoder(
        img_size=(44, 40), patch_size=(11, 10), patch_stride=(10, 10),
        in_chans=5, embed_dim=32, depth=8, num_heads=4,
        window_sizes=((2, 2), (1, 4), (4, 1)), interval=4,
    )
    x = jnp.zeros((2, 5, 44, 40))
    v = enc.init(jax.random.PRNGKey(0), x)
    moments = enc.apply(v, x)
    assert moments.shape == (2, 64, 4, 4)  # 2*embed_dim, (44-11)/10+1=4, (40-10)/10+1=4

    dec = ViTDecoder(
        img_size=(44, 40), patch_size=(11, 10), patch_stride=(10, 10),
        out_chans=5, embed_dim=32, depth=8, num_heads=4,
        window_sizes=((2, 2), (1, 4), (4, 1)), interval=4,
    )
    feat = jnp.zeros((2, 32, 4, 4))
    vd = dec.init(jax.random.PRNGKey(0), feat)
    out = dec.apply(vd, feat)
    assert out.shape == (2, 5, 41, 40)  # (4-1)*10+11=41, (4-1)*10+10=40


def test_hyper_towers_shapes():
    henc = HyperEncoder(
        img_size=(8, 16), patch_size=(4, 4), patch_stride=(4, 4),
        in_chans=12, z_dim=12, embed_dim=24, depth=4, num_heads=4,
    )
    y = jnp.zeros((1, 12, 8, 16))
    v = henc.init(jax.random.PRNGKey(0), y)
    z = henc.apply(v, y)
    assert z.shape == (1, 12, 2, 4)

    hdec = HyperDecoder(
        img_size=(8, 16), patch_size=(4, 4), patch_stride=(4, 4),
        out_chans=12, z_dim=12, embed_dim=24, depth=4, num_heads=4,
    )
    vd = hdec.init(jax.random.PRNGKey(0), z)
    params = hdec.apply(vd, z)
    assert params.shape == (1, 24, 8, 16)  # 2*out_chans at y resolution


def test_gdn_forward_inverse():
    gdn = GDN(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 4, 4))
    v = gdn.init(jax.random.PRNGKey(1), x)
    y = gdn.apply(v, x)
    assert y.shape == x.shape
    igdn = GDN(8, inverse=True)
    z = igdn.apply(v, y)
    # inverse with the same params undoes forward only approximately at init
    # (identity gamma): check sign preservation and finiteness instead
    assert np.all(np.sign(y) == np.sign(np.asarray(x)))
    assert np.all(np.isfinite(np.asarray(z)))


def test_masked_conv_causality():
    """Mask A: output at (i,j) must not depend on x[i,j] or later pixels."""
    mc = MaskedConv2d(out_channels=3, kernel_size=3, mask_type="A")
    x = jnp.zeros((1, 2, 5, 5))
    v = mc.init(jax.random.PRNGKey(0), x)
    y0 = np.asarray(mc.apply(v, x))
    x2 = x.at[0, :, 2, 2].set(5.0)
    y1 = np.asarray(mc.apply(v, x2))
    assert np.allclose(y0[0, :, 2, 2], y1[0, :, 2, 2])  # center blind to itself
    assert np.allclose(y0[0, :, :2], y1[0, :, :2])  # earlier rows unaffected
    assert not np.allclose(y0[0, :, 3], y1[0, :, 3])  # later rows see it


@pytest.mark.slow  # quick-suite re-budget (VERDICT r4 next #8): heavy tail
def test_remat_blocks_match_and_train():
    """Rematerialized towers produce identical outputs and gradients run."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from cra5_tpu.models import VAEformer
    from cra5_tpu.models.vaeformer import vaeformer_tiny

    cfg = vaeformer_tiny()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.in_chans, *cfg.img_size)) * 0.3
    model = VAEformer(cfg)
    variables = model.init(jax.random.PRNGKey(1), x)
    ref = model.apply(variables, x)["x_hat"]

    cfg_r = dataclasses.replace(cfg, remat=True)
    model_r = VAEformer(cfg_r)
    out = model_r.apply(variables, x)["x_hat"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def loss(params):
        o = model_r.apply({"params": params}, x, training=True, rng=jax.random.PRNGKey(2))
        return jnp.mean(jnp.square(o["x_hat"] - x))

    g = jax.grad(loss)(variables["params"])
    assert jnp.isfinite(
        sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(g))
    )
