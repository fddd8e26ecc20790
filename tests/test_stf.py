"""STF 2022 Swin codec: Swin block mechanics, forward, charm roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cra5_tpu.models.stf2022 import CharmCodec, SymmetricalTransFormer2022
from cra5_tpu.nn.swin import PatchMerging, PatchSplit, SwinBlock, _shift_attn_mask


def test_shift_mask_static():
    m = _shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert set(np.unique(m)) <= {0.0, -100.0}
    assert _shift_attn_mask(8, 8, 4, 0) is None


def test_swin_block_shapes():
    blk = SwinBlock(dim=16, num_heads=2, window_size=4, shift_size=2)
    x = jnp.ones((2, 8 * 8, 16))
    variables = blk.init(jax.random.PRNGKey(0), x, 8, 8)
    out = blk.apply(variables, x, 8, 8)
    assert out.shape == x.shape


def test_patch_merge_split_inverse_shapes():
    x = jnp.ones((1, 8 * 8, 16))
    pm = PatchMerging(16)
    v = pm.init(jax.random.PRNGKey(0), x, 8, 8)
    merged = pm.apply(v, x, 8, 8)
    assert merged.shape == (1, 16, 32)
    ps = PatchSplit(32)
    v2 = ps.init(jax.random.PRNGKey(1), merged, 4, 4)
    split = ps.apply(v2, merged, 4, 4)
    assert split.shape == (1, 64, 16)


@pytest.fixture(scope="module")
def tiny_stf():
    model = SymmetricalTransFormer2022(
        embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 2),
        window_size=4, num_slices=4,
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 64, 64))
    variables = model.init(jax.random.PRNGKey(1), x)
    return model, variables, x


def test_stf_forward(tiny_stf):
    model, variables, x = tiny_stf
    out = model.apply(variables, x)
    assert out["x_hat"].shape == x.shape
    assert out["likelihoods"]["y"].shape[1] == model.M
    bpp = sum(
        float(jnp.sum(-jnp.log2(l))) for l in out["likelihoods"].values()
    ) / (x.shape[-2] * x.shape[-1])
    assert 0 < bpp < 200


@pytest.mark.slow
def test_stf_roundtrip(tiny_stf):
    model, variables, x = tiny_stf
    codec = CharmCodec(model, variables)
    out = codec.compress(x)
    assert len(out["strings"][0]) == model.num_slices
    dec = codec.decompress(out["strings"], out["shape"])
    assert dec["x_hat"].shape == x.shape
    out2 = codec.compress(x)
    assert [bytes(s) for s in out["strings"][0]] == [bytes(s) for s in out2["strings"][0]]
    # forward x_hat (STE path) should equal the coded reconstruction
    fwd = np.asarray(codec.forward(x)["x_hat"])
    np.testing.assert_allclose(np.asarray(dec["x_hat"]), fwd, atol=1e-4)


@pytest.mark.slow
def test_stf_roundtrip_batch(tiny_stf):
    from cra5_tpu.models.stf2022 import CharmCodec

    model, variables, _ = tiny_stf
    codec = CharmCodec(model, variables)
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 3, 64, 64))
    out = codec.compress(x)
    assert len(out["strings"][0]) == model.num_slices * 2
    dec = codec.decompress(out["strings"], out["shape"])
    assert dec["x_hat"].shape == x.shape
