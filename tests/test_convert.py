"""torch -> JAX checkpoint conversion: true activation parity against the
reference ViT towers (vit_nlc.py) run under CPU torch.

The reference module needs `timm` and `dict_recursive_update`, absent in
this image; tiny stubs are injected (the reference only uses
timm.models.layers.{drop_path, to_2tuple, trunc_normal_}). The reference
package __init__ is broken (imports the compressai wheel), so vit_nlc.py
is loaded directly by path.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/cra5/models/vaeformer/vit_nlc.py"


@pytest.fixture(scope="module")
def vit_nlc():
    # stub timm.models.layers
    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")

    def drop_path(x, drop_prob=0.0, training=False):
        return x

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    timm_layers.drop_path = drop_path
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = trunc_normal_
    timm.models = timm_models
    timm_models.layers = timm_layers

    dru = types.ModuleType("dict_recursive_update")
    dru.recursive_update = lambda d, u: d

    saved = {}
    for name, mod in [
        ("timm", timm),
        ("timm.models", timm_models),
        ("timm.models.layers", timm_layers),
        ("dict_recursive_update", dru),
    ]:
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mod

    spec = importlib.util.spec_from_file_location("ref_vit_nlc", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    yield mod
    for name, old in saved.items():
        if old is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = old


# tiny tower geometry: img 40x40, patch == stride (10,10) so the reference
# decoder's Linear un-patchify path is exact; 4x4 token grid.
GEOM = dict(
    img_size=(40, 40),
    patch_size=(10, 10),
    patch_stride=(10, 10),
    embed_dim=16,
    num_heads=2,
    depth=4,
    window_sizes=((2, 2), (1, 4), (4, 1)),
    interval=2,
)


def _ref_encoder(vit_nlc, in_chans=6, z_dim=None):
    torch.manual_seed(0)
    return vit_nlc.ViT_Encoder(
        img_size=GEOM["img_size"],
        patch_size=GEOM["patch_size"],
        patch_stride=GEOM["patch_stride"],
        in_chans=in_chans,
        z_dim=z_dim,
        embed_dim=GEOM["embed_dim"],
        depth=GEOM["depth"],
        num_heads=GEOM["num_heads"],
        mlp_ratio=4.0,
        qkv_bias=True,
        window_size=list(GEOM["window_sizes"]),
        interval=GEOM["interval"],
        use_abs_pos_emb=True,
        window=True,
    ).eval()


def test_encoder_activation_parity(vit_nlc):
    import jax
    import jax.numpy as jnp

    from cra5_tpu.nn.vit import ViTEncoder
    from cra5_tpu.tools.convert_torch import convert_vit_tower

    in_chans = 6
    ref = _ref_encoder(vit_nlc, in_chans)
    sd = {f"g_a.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_vit_tower(sd, "g_a")

    ours = ViTEncoder(
        img_size=GEOM["img_size"],
        patch_size=GEOM["patch_size"],
        patch_stride=GEOM["patch_stride"],
        in_chans=in_chans,
        embed_dim=GEOM["embed_dim"],
        depth=GEOM["depth"],
        num_heads=GEOM["num_heads"],
        window_sizes=GEOM["window_sizes"],
        interval=GEOM["interval"],
    )

    x = np.random.default_rng(0).normal(size=(1, in_chans, 40, 40)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    our_out = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    assert our_out.shape == ref_out.shape
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-4, atol=1e-4)


def test_decoder_activation_parity(vit_nlc):
    import jax.numpy as jnp

    from cra5_tpu.nn.vit import ViTDecoder
    from cra5_tpu.tools.convert_torch import convert_vit_tower

    out_chans = 6
    torch.manual_seed(1)
    ref = vit_nlc.ViT_Decoder(
        img_size=GEOM["img_size"],
        patch_size=GEOM["patch_size"],
        patch_stride=GEOM["patch_stride"],
        out_chans=out_chans,
        embed_dim=GEOM["embed_dim"],
        depth=GEOM["depth"],
        num_heads=GEOM["num_heads"],
        mlp_ratio=4.0,
        qkv_bias=True,
        window_size=list(GEOM["window_sizes"]),
        interval=GEOM["interval"],
        window=True,
    ).eval()

    sd = {f"g_s.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_vit_tower(sd, "g_s")

    ours = ViTDecoder(
        img_size=GEOM["img_size"],
        patch_size=GEOM["patch_size"],
        patch_stride=GEOM["patch_stride"],
        out_chans=out_chans,
        embed_dim=GEOM["embed_dim"],
        depth=GEOM["depth"],
        num_heads=GEOM["num_heads"],
        window_sizes=GEOM["window_sizes"],
        interval=GEOM["interval"],
        use_conv_transpose=False,
    )

    feat = np.random.default_rng(2).normal(size=(1, GEOM["embed_dim"], 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(feat)).numpy()
    our_out = np.asarray(ours.apply({"params": params}, jnp.asarray(feat)))
    assert our_out.shape == ref_out.shape
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-4, atol=1e-4)


def test_conv_transpose_final_parity(vit_nlc):
    """The ERA5 ConvTranspose un-patchify: torch ConvTranspose2d vs our
    PatchUnembed with the converter's kernel layout rule."""
    import jax.numpy as jnp

    from cra5_tpu.nn.patch_embed import PatchUnembed

    torch.manual_seed(3)
    tct = torch.nn.ConvTranspose2d(16, 6, kernel_size=(11, 10), stride=(10, 10), bias=False)
    x = np.random.default_rng(4).normal(size=(1, 16, 3, 4)).astype(np.float32)
    with torch.no_grad():
        ref_out = tct(torch.from_numpy(x)).numpy()

    w = tct.weight.detach().numpy()  # (in, out, kh, kw)
    kernel = w.transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    ours = PatchUnembed(6, (11, 10), (10, 10))
    tokens = jnp.asarray(x.reshape(1, 16, 12).transpose(0, 2, 1))
    our_out = np.asarray(
        ours.apply({"params": {"final": {"kernel": kernel}}}, tokens, (3, 4))
    )
    assert our_out.shape == ref_out.shape
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-4, atol=1e-4)


def test_entropy_bottleneck_key_conversion():
    from cra5_tpu.tools.convert_torch import (
        convert_entropy_bottleneck,
        rename_key,
    )

    sd = {
        "entropy_bottleneck._matrix0": np.zeros((4, 3, 1)),
        "entropy_bottleneck._bias0": np.zeros((4, 3, 1)),
        "entropy_bottleneck._factor0": np.zeros((4, 3, 1)),
        "entropy_bottleneck.quantiles": np.zeros((4, 1, 3)),
    }
    tree = convert_entropy_bottleneck(sd)
    assert set(tree) == {"matrix0", "bias0", "factor0", "quantiles"}

    # ParameterList migration (zoo/pretrained.py:36-58)
    assert rename_key("module.entropy_bottleneck._matrices.0") == "entropy_bottleneck._matrix0"
    assert rename_key("entropy_bottleneck._biases.2") == "entropy_bottleneck._bias2"
    assert rename_key("g_a.0.downsample.weight") == "g_a.0.skip.weight"


def test_hyper_encoder_activation_parity(vit_nlc):
    import jax.numpy as jnp

    from cra5_tpu.nn.vit import HyperEncoder
    from cra5_tpu.tools.convert_torch import convert_vit_tower

    torch.manual_seed(4)
    ref = vit_nlc.HyperpriorEncoder(
        img_size=(8, 8),
        patch_size=(2, 2),
        patch_stride=(2, 2),
        in_chans=12,
        z_dim=6,
        embed_dim=16,
        depth=4,
        num_heads=2,
        mlp_ratio=4.0,
        qkv_bias=True,
        window_size=(4, 4),
        interval=1,
        use_abs_pos_emb=True,
        window=False,
        norm_layer=__import__("functools").partial(torch.nn.LayerNorm, eps=1e-6),
    ).eval()
    sd = {f"h_a.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_vit_tower(sd, "h_a")

    ours = HyperEncoder(
        img_size=(8, 8), patch_size=(2, 2), patch_stride=(2, 2),
        in_chans=12, z_dim=6, embed_dim=16, depth=4, num_heads=2, interval=1,
    )
    y = np.random.default_rng(5).normal(size=(1, 12, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(y)).numpy()
    our_out = np.asarray(ours.apply({"params": params}, jnp.asarray(y)))
    assert our_out.shape == ref_out.shape
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-4, atol=1e-4)


def test_hyper_decoder_activation_parity(vit_nlc):
    import jax.numpy as jnp

    from cra5_tpu.nn.vit import HyperDecoder
    from cra5_tpu.tools.convert_torch import convert_vit_tower

    torch.manual_seed(6)
    ref = vit_nlc.HyperpriorDecoder(
        img_size=(8, 8),
        patch_size=(2, 2),
        patch_stride=(2, 2),
        out_chans=12,
        z_dim=6,
        embed_dim=16,
        depth=4,
        num_heads=2,
        mlp_ratio=4.0,
        qkv_bias=True,
        window_size=(4, 4),
        interval=1,
        window=False,
        norm_layer=__import__("functools").partial(torch.nn.LayerNorm, eps=1e-6),
    ).eval()
    sd = {f"h_s.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_vit_tower(sd, "h_s")

    ours = HyperDecoder(
        img_size=(8, 8), patch_size=(2, 2), patch_stride=(2, 2),
        out_chans=12, z_dim=6, embed_dim=16, depth=4, num_heads=2,
    )
    z = np.random.default_rng(7).normal(size=(1, 6, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(z)).numpy()
    our_out = np.asarray(ours.apply({"params": params}, jnp.asarray(z)))
    assert our_out.shape == ref_out.shape
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-4, atol=1e-4)


def test_full_vaeformer_conversion_end_to_end(vit_nlc):
    """Assemble a reference-named state dict from torch towers + 1x1 convs
    + EB params, convert with convert_vaeformer_state_dict, and verify the
    full encode -> hyper -> decode pipeline matches torch."""
    import functools

    import jax
    import jax.numpy as jnp

    from cra5_tpu.models import VAEformer
    from cra5_tpu.models.vaeformer import VAEformerConfig
    from cra5_tpu.tools.convert_torch import convert_vaeformer_state_dict

    torch.manual_seed(10)
    nl = functools.partial(torch.nn.LayerNorm, eps=1e-6)
    C_IN, EMB, ZC, YW = 6, 8, 4, 16
    g_a = vit_nlc.ViT_Encoder(
        img_size=(40, 40), patch_size=(10, 10), patch_stride=(10, 10),
        in_chans=C_IN, z_dim=None, embed_dim=YW, depth=4, num_heads=2,
        mlp_ratio=4.0, qkv_bias=True, window_size=[(2, 2), (1, 4), (4, 1)],
        interval=2, use_abs_pos_emb=True, window=True,
    ).eval()
    g_s = vit_nlc.ViT_Decoder(
        img_size=(40, 40), patch_size=(10, 10), patch_stride=(10, 10),
        out_chans=C_IN, embed_dim=YW, depth=4, num_heads=2, mlp_ratio=4.0,
        qkv_bias=True, window_size=[(2, 2), (1, 4), (4, 1)], interval=2,
        window=True,
    ).eval()
    h_a = vit_nlc.HyperpriorEncoder(
        img_size=(4, 4), patch_size=(2, 2), patch_stride=(2, 2),
        in_chans=EMB, z_dim=ZC, embed_dim=12, depth=4, num_heads=2,
        mlp_ratio=4.0, qkv_bias=True, window_size=(2, 2), interval=1,
        use_abs_pos_emb=True, window=False, norm_layer=nl,
    ).eval()
    h_s = vit_nlc.HyperpriorDecoder(
        img_size=(4, 4), patch_size=(2, 2), patch_stride=(2, 2),
        out_chans=EMB, z_dim=ZC, embed_dim=12, depth=4, num_heads=2,
        mlp_ratio=4.0, qkv_bias=True, window_size=(2, 2), interval=1,
        window=False, norm_layer=nl,
    ).eval()
    quant_conv = torch.nn.Conv2d(2 * YW, 2 * EMB, 1)
    post_quant_conv = torch.nn.Conv2d(EMB, YW, 1)

    sd = {}
    for prefix, mod in (
        ("g_a", g_a), ("g_s", g_s), ("h_a", h_a), ("h_s", h_s),
        ("quant_conv", quant_conv), ("post_quant_conv", post_quant_conv),
    ):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    # EB params in reference naming
    for i in range(5):
        sd[f"entropy_bottleneck._matrix{i}"] = torch.randn(ZC, 3 if i < 4 else 1, 1 if i == 0 else 3)
    sd["entropy_bottleneck._matrix0"] = torch.randn(ZC, 3, 1)
    for i in range(5):
        out_f = 3 if i < 4 else 1
        sd[f"entropy_bottleneck._bias{i}"] = torch.randn(ZC, out_f, 1)
        if i < 4:
            sd[f"entropy_bottleneck._factor{i}"] = torch.randn(ZC, out_f, 1)
    sd["entropy_bottleneck.quantiles"] = torch.randn(ZC, 1, 3)
    # fix matrix shapes to (C, f_out, f_in) chain 1-3-3-3-3-1
    dims = [1, 3, 3, 3, 3, 1]
    for i in range(5):
        sd[f"entropy_bottleneck._matrix{i}"] = torch.randn(ZC, dims[i + 1], dims[i])

    variables, tables = convert_vaeformer_state_dict(sd, depth=4)

    cfg = VAEformerConfig(
        in_chans=C_IN, img_size=(40, 40), patch_size=(10, 10), patch_stride=(10, 10),
        embed_dim=EMB, y_channels=YW, z_channels=ZC, depth=4, num_heads=2,
        window_sizes=((2, 2), (1, 4), (4, 1)), interval=2,
        hyper_embed_dim=12, hyper_depth=4, hyper_num_heads=2, hyper_patch=(2, 2),
        use_conv_transpose=False,
        name="conv_test",
    )
    model = VAEformer(cfg)

    x = np.random.default_rng(11).normal(size=(1, C_IN, 40, 40)).astype(np.float32)
    with torch.no_grad():
        tx = torch.from_numpy(x)
        moments_t = quant_conv(g_a(tx))
        y_t = moments_t.chunk(2, 1)[0]
        z_t = h_a(y_t)
        params_t = h_s(z_t)
        xhat_t = g_s(post_quant_conv(y_t))

    jx = jnp.asarray(x)
    moments_j = model.apply(variables, jx, method=VAEformer.encode_moments)
    np.testing.assert_allclose(np.asarray(moments_j), moments_t.numpy(), rtol=1e-4, atol=1e-4)
    y_j = jnp.split(moments_j, 2, axis=1)[0]
    z_j = model.apply(variables, y_j, method=lambda m, v: m.h_a(v))
    np.testing.assert_allclose(np.asarray(z_j), z_t.numpy(), rtol=1e-4, atol=1e-4)
    scales_j, means_j = model.apply(variables, z_j, method=VAEformer.hyper_params)
    params_j = np.concatenate([np.asarray(scales_j), np.asarray(means_j)], axis=1)
    np.testing.assert_allclose(params_j, params_t.numpy(), rtol=1e-4, atol=2e-4)
    xhat_j = model.apply(variables, y_j, method=VAEformer.decode_y)
    np.testing.assert_allclose(np.asarray(xhat_j), xhat_t.numpy(), rtol=1e-4, atol=2e-4)


def test_encoder_parity_with_window_padding(vit_nlc):
    """Window (3,3) on a 4x4 token grid pads to 6x6 inside attention —
    the 268v model hits this with its (48,12)/(12,48) windows on 72x144.
    Both implementations zero-pad, attend unmasked, and crop."""
    import jax.numpy as jnp

    from cra5_tpu.nn.vit import ViTEncoder
    from cra5_tpu.tools.convert_torch import convert_vit_tower

    torch.manual_seed(20)
    ref = vit_nlc.ViT_Encoder(
        img_size=(40, 40), patch_size=(10, 10), patch_stride=(10, 10),
        in_chans=5, z_dim=None, embed_dim=16, depth=4, num_heads=2,
        mlp_ratio=4.0, qkv_bias=True, window_size=[(3, 3)],
        interval=2, use_abs_pos_emb=True, window=True,
    ).eval()
    sd = {f"g_a.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_vit_tower(sd, "g_a")

    ours = ViTEncoder(
        img_size=(40, 40), patch_size=(10, 10), patch_stride=(10, 10),
        in_chans=5, embed_dim=16, depth=4, num_heads=2,
        window_sizes=((3, 3),), interval=2,
    )
    x = np.random.default_rng(21).normal(size=(1, 5, 40, 40)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    our_out = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-4, atol=1e-4)
