"""ELIC 2022: checkerboard pack/unpack properties, forward
shapes/likelihoods, and the two-pass vectorized codec roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cra5_tpu.models.elic2022 import (
    ELIC2022,
    ElicCodec,
    _anchor_mask,
    checkerboard_pack,
    checkerboard_unpack,
)


def test_checkerboard_pack_unpack_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 8, 12)).astype(np.float32))
    mask = jnp.asarray(_anchor_mask(8, 12))[None, None]
    for anchor in (True, False):
        packed = checkerboard_pack(x, anchor)
        assert packed.shape == (2, 3, 8, 6)
        rec = checkerboard_unpack(packed, anchor, 12)
        m = mask if anchor else 1 - mask
        np.testing.assert_array_equal(np.asarray(rec), np.asarray(x * m))
    # anchor + non-anchor reconstructs everything
    full = checkerboard_unpack(checkerboard_pack(x, True), True, 12) + checkerboard_unpack(
        checkerboard_pack(x, False), False, 12
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(x))


@pytest.fixture(scope="module")
def tiny_elic():
    # groups [0, 16, 16, 32] with M = 64, 3 slices
    model = ELIC2022(N=32, M=64, num_slices=3, in_channel=3)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 64, 64))
    variables = model.init(jax.random.PRNGKey(1), x)
    return model, variables, x


def test_elic_groups():
    assert ELIC2022(N=32, M=64, num_slices=3).groups == [0, 16, 16, 32]
    assert ELIC2022(N=192, M=320, num_slices=5).groups == [0, 16, 16, 32, 64, 192]


def test_elic_forward(tiny_elic):
    model, variables, x = tiny_elic
    out = model.apply(variables, x)
    assert out["x_hat"].shape == x.shape
    assert out["likelihoods"]["y"].shape[1] == model.M
    bpp = sum(
        float(jnp.sum(-jnp.log2(l))) for l in out["likelihoods"].values()
    ) / (x.shape[-2] * x.shape[-1])
    assert 0 < bpp < 200


@pytest.mark.slow
def test_elic_roundtrip(tiny_elic):
    model, variables, x = tiny_elic
    codec = ElicCodec(model, variables)
    out = codec.compress(x)
    assert len(out["strings"][0]) == 2 * model.num_slices  # anchor+non per slice
    dec = codec.decompress(out["strings"], out["shape"], out["y_shape"])
    assert dec["x_hat"].shape == x.shape
    # determinism
    out2 = codec.compress(x)
    assert [bytes(s) for s in out["strings"][0]] == [bytes(s) for s in out2["strings"][0]]


@pytest.mark.slow
def test_elic_roundtrip_batch(tiny_elic):
    model, variables, _ = tiny_elic
    codec = ElicCodec(model, variables)
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 3, 64, 64))
    out = codec.compress(x)
    assert len(out["strings"][0]) == 2 * model.num_slices * 2  # passes x B
    dec = codec.decompress(out["strings"], out["shape"], out["y_shape"])
    assert dec["x_hat"].shape == x.shape
