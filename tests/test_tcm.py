"""TCM 2023: ConvTransBlock/SWAtten mechanics, forward, charm roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cra5_tpu.models.stf2022 import CharmCodec
from cra5_tpu.models.tcm2023 import TCM2023, ConvTransBlock, SWAtten


def test_conv_trans_block_shape():
    blk = ConvTransBlock(8, 8, head_dim=4, window_size=4, shifted=True)
    x = jnp.ones((1, 16, 16, 16))
    v = blk.init(jax.random.PRNGKey(0), x)
    out = blk.apply(v, x)
    assert out.shape == x.shape


def test_swatten_shape():
    m = SWAtten(output_dim=24, head_dim=4, window_size=4, inter_dim=16)
    x = jnp.ones((1, 20, 16, 16))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 24, 16, 16)


@pytest.fixture(scope="module")
def tiny_tcm():
    model = TCM2023(
        config=(1, 1, 1, 1, 1, 1), head_dim=(4, 4, 4, 4, 4, 4),
        N=8, M=20, num_slices=4, max_support_slices=2, in_channel=3,
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 64, 64))
    variables = model.init(jax.random.PRNGKey(1), x)
    return model, variables, x


def test_tcm_forward(tiny_tcm):
    model, variables, x = tiny_tcm
    out = model.apply(variables, x)
    assert out["x_hat"].shape == x.shape
    assert out["likelihoods"]["y"].shape[1] == model.M
    bpp = sum(
        float(jnp.sum(-jnp.log2(l))) for l in out["likelihoods"].values()
    ) / (x.shape[-2] * x.shape[-1])
    assert 0 < bpp < 300


@pytest.mark.slow
def test_tcm_roundtrip(tiny_tcm):
    model, variables, x = tiny_tcm
    codec = CharmCodec(model, variables)
    out = codec.compress(x)
    assert len(out["strings"][0]) == model.num_slices
    dec = codec.decompress(out["strings"], out["shape"])
    assert dec["x_hat"].shape == x.shape
    fwd = np.asarray(codec.forward(x)["x_hat"])
    np.testing.assert_allclose(np.asarray(dec["x_hat"]), fwd, atol=1e-4)
