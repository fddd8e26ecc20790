"""API facade tests: bitstream framing, normalization stats, synthetic
end-to-end encode/decode through cra5_api with the tiny model."""

import os

import numpy as np
import pytest

from cra5_tpu.api.bitstream import load_bin, read_uints, save_bin, write_uints
from cra5_tpu.api import era5
from cra5_tpu.utils.config import Config

_CFG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "cra5_tpu", "api", "configs", "cra5_268v.py",
)


def test_bitstream_roundtrip(tmp_path):
    path = str(tmp_path / "t.bin")
    y, z = b"\x01\x02\x03\x04" * 5, b"\xff\x00" * 3
    save_bin(path, [[y], [z]], (18, 36))
    strings, shape = load_bin(path)
    assert shape == (18, 36)
    assert strings[0][0] == y and strings[1][0] == z


def test_bitstream_big_endian_header(tmp_path):
    """Header must be big-endian uint32 (reference utils.py fmt '>I')."""
    path = str(tmp_path / "t.bin")
    save_bin(path, [[b"ab"]], (1, 2))
    raw = open(path, "rb").read()
    assert raw[:12] == (1).to_bytes(4, "big") + (2).to_bytes(4, "big") + (1).to_bytes(4, "big")


def test_mean_std_268_channels():
    cfg = Config.fromfile(_CFG)
    mean, std = era5.load_mean_std(cfg)
    assert mean.shape == (268,) and std.shape == (268,)
    assert np.all(std > 0)
    # spot values: z at 1000 hPa first channel; t2m known scale
    c2v, v2c = era5.channel_vname_mapping(cfg)
    assert c2v[0] == "z_1000"
    assert len(c2v) == 268
    assert v2c["t2m"] == 7 * 37 + 4


def test_synthetic_timestep_statistics():
    cfg = Config.fromfile(_CFG)
    x = era5.synthetic_timestep(cfg, seed=1, shape=(64, 128))
    assert x.shape == (268, 64, 128)
    mean, std = era5.load_mean_std(cfg)
    xn = era5.normalize(x, mean, std)
    assert abs(float(xn.mean())) < 0.05
    assert abs(float(xn.std()) - 1.0) < 0.05
    xd = era5.denormalize(xn, mean, std)
    assert np.allclose(xd, x, rtol=1e-4, atol=1e-2)


@pytest.fixture(scope="module")
def tiny_api(tmp_path_factory):
    from cra5_tpu.api import cra5_api

    root = str(tmp_path_factory.mktemp("data"))
    return cra5_api(local_root=root, model_version=-1)


def test_api_encode_decode_synthetic(tiny_api):
    """Full user path: encode_era5_as_bin -> decode_from_bin on synthetic
    data with the tiny model (mirrors reference test.py)."""
    api = tiny_api
    ts = "2024-06-01T00:00:00"
    enc = api.encode_era5_as_bin(ts)
    assert os.path.exists(enc["save_path"])
    assert enc["encoding_time"] > 0

    dec = api.decode_from_bin(ts)
    x_hat = np.asarray(dec["x_hat"])
    assert x_hat.shape[0] == api.model_cfg.in_chans
    assert np.all(np.isfinite(x_hat))


def test_api_latent_paths(tiny_api):
    api = tiny_api
    ts = "2024-06-01T01:00:00"
    y = api.encode_to_latent(ts, latent_type="float")
    assert y.shape[1] == api.model_cfg.embed_dim
    out = api.latent_to_bin(y)
    assert len(out["strings"]) == 2

    enc = api.encode_era5_as_bin(ts)
    y_hat = api.bin_to_latent(bin_path=enc["save_path"])
    assert y_hat.shape == y.shape
    x_hat = api.latent_to_reconstruction(y_hat)
    assert np.asarray(x_hat).shape[1] == api.model_cfg.in_chans


def test_api_show_image(tiny_api, tmp_path):
    """Visualization writes a png (tiny model has 8 generic channels, so
    pick by channel index name)."""
    api = tiny_api
    ts = "2024-06-01T02:00:00"
    api.encode_era5_as_bin(ts)
    dec = api.decode_from_bin(ts)
    # tiny model: in_chans=8 -> fake vname map onto first channels
    api.vname_to_channels = {f"ch{i}": i for i in range(8)}
    p = api.show_image(dec["x_hat"], ts, show_variables=["ch0", "ch1"], save_path=str(tmp_path))
    assert os.path.exists(p)


def test_api_loads_weights_with_cdf_tables(tmp_path):
    """A checkpoint carrying trained CDF buffers (converter output) must
    install them on the codec without an update() pass."""
    import jax
    import jax.numpy as jnp

    from cra5_tpu.api import cra5_api
    from cra5_tpu.entropy import eb_update, gc_update, get_scale_table
    from cra5_tpu.entropy.entropy_bottleneck import eb_params_from_variables
    from cra5_tpu.models import VAEformer
    from cra5_tpu.models.vaeformer import vaeformer_tiny
    from cra5_tpu.train.checkpoints import save_variables

    cfg = vaeformer_tiny()
    model = VAEformer(cfg)
    x0 = jnp.zeros((1, cfg.in_chans, *cfg.img_size))
    variables = model.init(jax.random.PRNGKey(0), x0)
    path = tmp_path / "w.msgpack"
    save_variables(str(path), variables)

    api = cra5_api(model_version=-1, weights=str(path), local_root=str(tmp_path))
    # plain weights: tables built lazily via update()
    out = api.encode_era5_as_bin("2024-06-01T00:00:00")
    assert out["save_path"].endswith(".bin")

    # now a dict that carries tables directly
    eb_params = eb_params_from_variables(variables, "entropy_bottleneck")
    tables = {"eb": eb_update(eb_params), "gc": gc_update(get_scale_table())}

    class _FakeLoad(cra5_api):
        def _load_weights(self, p):
            v = dict(variables)
            v["_cdf_tables"] = tables
            return v

    api2 = _FakeLoad(model_version=-1, weights="ignored", local_root=str(tmp_path))
    assert api2.codec._eb_table is tables["eb"]
    dec = api2.decode_from_bin("2024-06-01T00:00:00")
    assert dec["x_hat"].shape[0] == cfg.in_chans
