"""ALWAYS-ON full-geometry parity golden (VERDICT r3 #6): the committed
artifacts in goldens/fullgeom_entropy.npz were produced by the TORCH
REFERENCE entropy stack (EntropyBottleneck.update/compress,
GaussianConditional.update_scale_table/build_indexes/compress — see
goldens/gen_fullgeom.py) at the PRODUCTION 268v geometry: z 165 888
symbols (1,256,18,36), y 2 654 208 symbols (1,256,72,144).

This default-suite test locks, in seconds instead of the 80-min opt-in
tower run (test_parity_268.py):
  * our quantize semantics (round(x - median/mean)) — symbol sha,
  * our vectorized build_indexes vs the reference bucketing — index sha,
  * decode of reference-produced v1 streams through reference-built
    integer CDF tables — symbol equality,
  * re-encode byte-identity (the archives-stay-decodable contract),
  * the TPU lane coder ingesting reference-built tables (z roundtrip).
"""

import hashlib
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "fullgeom_entropy.npz")


def _sha(a: np.ndarray) -> bytes:
    return hashlib.sha256(np.ascontiguousarray(a).tobytes()).digest()


@pytest.fixture(scope="module")
def golden():
    g = np.load(GOLDEN)
    rng = np.random.default_rng(int(g["rng_seed"]))
    medians = g["medians"]
    z = (
        medians[None, :, None, None]
        + rng.normal(size=(1, 256, 18, 36)).astype(np.float32) * 2.0
    )
    scales = np.exp(
        rng.uniform(np.log(0.12), np.log(12.0), size=(1, 256, 72, 144))
    ).astype(np.float32)
    means = rng.normal(size=(1, 256, 72, 144)).astype(np.float32)
    y = means + rng.normal(size=means.shape).astype(np.float32) * scales
    return g, z, scales, means, y


def _coder():
    """Host coder matching the reference pybind API: the C++ rans64 when
    built, else the python oracle (same bytes by construction)."""
    from cra5_tpu.coder import native

    if native.native_available():
        return native.encode_with_indexes, native.decode_with_indexes
    from cra5_tpu.coder import rans_py

    def enc(sym, idx, cdfs, lens, offs):
        return rans_py.RansEncoder().encode_with_indexes(
            sym.tolist(), idx.tolist(),
            [list(map(int, r)) for r in cdfs], list(map(int, lens)),
            list(map(int, offs)),
        )

    def dec(data, idx, cdfs, lens, offs):
        return np.asarray(
            rans_py.RansDecoder().decode_with_indexes(
                data, idx.tolist(),
                [list(map(int, r)) for r in cdfs], list(map(int, lens)),
                list(map(int, offs)),
            ),
            np.int32,
        )

    return enc, dec


def test_z_quantize_sha_matches_reference(golden):
    g, z, *_ = golden
    z_sym = np.round(z - g["medians"][None, :, None, None]).astype(np.int32)
    assert _sha(z_sym.reshape(-1)) == g["z_sym_sha"].tobytes()


def test_build_indexes_sha_matches_reference(golden):
    import jax.numpy as jnp

    from cra5_tpu.entropy.gaussian_conditional import build_indexes

    g, _, scales, _, _ = golden
    idx = np.asarray(
        build_indexes(jnp.asarray(scales), jnp.asarray(g["scale_table"]))
    ).astype(np.int32)
    assert _sha(idx.reshape(-1)) == g["y_idx_sha"].tobytes()


def test_z_stream_decode_and_reencode_byte_identity(golden):
    g, z, *_ = golden
    enc, dec = _coder()
    z_idx = np.broadcast_to(
        np.arange(256, dtype=np.int32)[:, None, None], (256, 18, 36)
    ).reshape(-1)
    sym = dec(g["z_string"].tobytes(), z_idx, g["eb_cdf"], g["eb_len"], g["eb_off"])
    assert _sha(np.asarray(sym, np.int32)) == g["z_sym_sha"].tobytes()
    again = enc(np.asarray(sym, np.int32), z_idx, g["eb_cdf"], g["eb_len"], g["eb_off"])
    assert again == g["z_string"].tobytes()


def test_y_stream_decode_and_reencode_byte_identity(golden):
    import jax.numpy as jnp

    from cra5_tpu.entropy.gaussian_conditional import build_indexes

    g, _, scales, means, y = golden
    enc, dec = _coder()
    y_idx = np.asarray(
        build_indexes(jnp.asarray(scales), jnp.asarray(g["scale_table"]))
    ).astype(np.int32).reshape(-1)
    sym = dec(g["y_string"].tobytes(), y_idx, g["gc_cdf"], g["gc_len"], g["gc_off"])
    assert _sha(np.asarray(sym, np.int32)) == g["y_sym_sha"].tobytes()
    # quantize parity on the y side too
    y_sym = np.round(y - means).astype(np.int32).reshape(-1)
    assert np.array_equal(np.asarray(sym, np.int32), y_sym)
    again = enc(np.asarray(sym, np.int32), y_idx, g["gc_cdf"], g["gc_len"], g["gc_off"])
    assert again == g["y_string"].tobytes()


def test_lane_coder_ingests_reference_tables(golden):
    """The TPU lane coder (v2) roundtrips the full-geometry z symbols
    through the reference-built tables."""
    import jax.numpy as jnp

    from cra5_tpu.coder.rans_tpu import LaneCoder
    from cra5_tpu.entropy.cdf import CdfTable

    g, z, *_ = golden
    table = CdfTable(
        quantized_cdf=g["eb_cdf"], cdf_length=g["eb_len"], offset=g["eb_off"]
    )
    z_sym = np.round(z - g["medians"][None, :, None, None]).astype(np.int32)
    z_idx = np.broadcast_to(
        np.arange(256, dtype=np.int32)[:, None, None], (256, 18, 36)
    ).copy()
    coder = LaneCoder(table)
    data = coder.encode(z_sym.reshape(256, 18, 36), z_idx)
    out = np.asarray(coder.decode_to_device(data, jnp.asarray(z_idx)))
    assert np.array_equal(out, z_sym.reshape(256, 18, 36))
