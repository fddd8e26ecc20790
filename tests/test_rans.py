"""Coder tests: python oracle vs native C++ bit-exactness, roundtrips,
bypass/escape edge cases (SURVEY.md §4 'property tests for the parallel
rANS, bypass edge cases at max_value')."""

import numpy as np
import pytest

from cra5_tpu.coder import native
from cra5_tpu.coder.rans_py import RansEncoder, RansDecoder
from cra5_tpu.coder.rans_tpu import LaneCoder
from cra5_tpu.entropy.cdf import CdfTable, build_cdf_table


def make_table(rng, ncdfs=4, max_bins=12):
    """Random valid CdfTable."""
    lengths = rng.integers(1, max_bins, size=ncdfs)
    max_len = int(lengths.max())
    pmfs = np.zeros((ncdfs, max_len), dtype=np.float32)
    for i, L in enumerate(lengths):
        p = rng.random(L).astype(np.float32) + 0.01
        p /= p.sum() * 1.05
        pmfs[i, :L] = p
    tails = np.full(ncdfs, 0.01, dtype=np.float32)
    table = build_cdf_table(pmfs, tails, lengths)
    table.offset = rng.integers(-10, 10, size=ncdfs).astype(np.int32)
    return table


def sample_symbols(rng, table, n, escape_frac=0.02):
    idx = rng.integers(0, table.num_indexes, size=n).astype(np.int32)
    max_vals = table.cdf_length[idx] - 2
    bins = (rng.random(n) * max_vals).astype(np.int32)
    sym = bins + table.offset[idx]
    # sprinkle out-of-range symbols to exercise the escape path
    esc = rng.random(n) < escape_frac
    sym = np.where(esc, sym + rng.integers(-300, 300, size=n), sym)
    return sym.astype(np.int32), idx


def to_lists(table):
    return (
        table.quantized_cdf.tolist(),
        table.cdf_length.tolist(),
        table.offset.tolist(),
    )


def test_py_roundtrip_simple(rng):
    table = make_table(rng)
    sym, idx = sample_symbols(rng, table, 500)
    cdfs, sizes, offs = to_lists(table)
    enc = RansEncoder().encode_with_indexes(sym.tolist(), idx.tolist(), cdfs, sizes, offs)
    dec = RansDecoder().decode_with_indexes(enc, idx.tolist(), cdfs, sizes, offs)
    assert np.array_equal(np.asarray(dec), sym)


def test_native_available():
    assert native.native_available(), "C++ coder must build in this environment"


def test_native_bit_exact_vs_python(rng):
    for trial in range(5):
        table = make_table(rng)
        sym, idx = sample_symbols(rng, table, 300, escape_frac=0.05)
        cdfs, sizes, offs = to_lists(table)
        py = RansEncoder().encode_with_indexes(sym.tolist(), idx.tolist(), cdfs, sizes, offs)
        cc = native.encode_with_indexes(sym, idx, table.quantized_cdf, table.cdf_length, table.offset)
        assert py == cc, f"trial {trial}: byte streams differ"
        dec = native.decode_with_indexes(cc, idx, table.quantized_cdf, table.cdf_length, table.offset)
        assert np.array_equal(dec, sym)


def test_native_decodes_python_stream_and_vice_versa(rng):
    table = make_table(rng)
    sym, idx = sample_symbols(rng, table, 400)
    cdfs, sizes, offs = to_lists(table)
    py_stream = RansEncoder().encode_with_indexes(sym.tolist(), idx.tolist(), cdfs, sizes, offs)
    dec_native = native.decode_with_indexes(py_stream, idx, table.quantized_cdf, table.cdf_length, table.offset)
    assert np.array_equal(dec_native, sym)
    cc_stream = native.encode_with_indexes(sym, idx, table.quantized_cdf, table.cdf_length, table.offset)
    dec_py = RansDecoder().decode_with_indexes(cc_stream, idx.tolist(), cdfs, sizes, offs)
    assert np.array_equal(np.asarray(dec_py), sym)


def test_extreme_escape_values(rng):
    """Symbols far outside the table range (multi-chunk bypass)."""
    table = make_table(rng, ncdfs=2, max_bins=4)
    n = 64
    idx = rng.integers(0, 2, size=n).astype(np.int32)
    sym = rng.integers(-(2**20), 2**20, size=n).astype(np.int32)
    cc = native.encode_with_indexes(sym, idx, table.quantized_cdf, table.cdf_length, table.offset)
    dec = native.decode_with_indexes(cc, idx, table.quantized_cdf, table.cdf_length, table.offset)
    assert np.array_equal(dec, sym)
    cdfs, sizes, offs = to_lists(table)
    py = RansEncoder().encode_with_indexes(sym.tolist(), idx.tolist(), cdfs, sizes, offs)
    assert py == cc


def test_boundary_symbols(rng):
    """max_value-1, max_value, and just-below-0 bins."""
    table = make_table(rng, ncdfs=3, max_bins=8)
    idx = np.repeat(np.arange(3, dtype=np.int32), 6)
    mv = table.cdf_length[idx] - 2
    off = table.offset[idx]
    sym = np.concatenate([
        (mv - 1 + off)[:6],        # last in-range bin
        (mv + off)[6:12],          # first escape (raw_val 0)
        (off - 1)[12:18],          # negative escape
    ]).astype(np.int32)
    cc = native.encode_with_indexes(sym, idx, table.quantized_cdf, table.cdf_length, table.offset)
    dec = native.decode_with_indexes(cc, idx, table.quantized_cdf, table.cdf_length, table.offset)
    assert np.array_equal(dec, sym)


def test_streaming_decoder(rng):
    table = make_table(rng)
    sym, idx = sample_symbols(rng, table, 200)
    cc = native.encode_with_indexes(sym, idx, table.quantized_cdf, table.cdf_length, table.offset)
    sd = native.StreamingDecoder(cc)
    # decode in two chunks (autoregressive usage pattern)
    a = sd.decode(idx[:120], table.quantized_cdf, table.cdf_length, table.offset)
    b = sd.decode(idx[120:], table.quantized_cdf, table.cdf_length, table.offset)
    assert np.array_equal(np.concatenate([a, b]), sym)


def test_native_cdf_matches_numpy(rng):
    from cra5_tpu.entropy.cdf import pmf_to_quantized_cdf

    for _ in range(50):
        n = rng.integers(2, 40)
        pmf = rng.random(n).astype(np.float32)
        pmf /= pmf.sum() * rng.uniform(1.0, 1.3)
        a = pmf_to_quantized_cdf(pmf)
        b = native.pmf_to_quantized_cdf_native(pmf)
        assert np.array_equal(a, b)


def test_malformed_stream_rejected(rng):
    table = make_table(rng)
    sym, idx = sample_symbols(rng, table, 50)
    with pytest.raises(ValueError):
        native.decode_with_indexes(b"\x00" * 6, idx, table.quantized_cdf, table.cdf_length, table.offset)


# ---- TPU lane coder (format v2) ----------------------------------------

def test_lane_roundtrip_basic(rng):
    table = make_table(rng)
    sym, idx = sample_symbols(rng, table, 5000, escape_frac=0.01)
    coder = LaneCoder(table, num_lanes=64)
    data = coder.encode(sym, idx)
    out = coder.decode(data, idx)
    assert np.array_equal(out, sym)


def test_lane_roundtrip_no_escapes(rng):
    table = make_table(rng)
    sym, idx = sample_symbols(rng, table, 1000, escape_frac=0.0)
    coder = LaneCoder(table, num_lanes=32)
    out = coder.decode(coder.encode(sym, idx), idx)
    assert np.array_equal(out, sym)


def test_lane_roundtrip_all_escapes(rng):
    table = make_table(rng, ncdfs=2, max_bins=4)
    n = 300
    idx = rng.integers(0, 2, size=n).astype(np.int32)
    sym = rng.integers(10**6, 10**7, size=n).astype(np.int32)
    coder = LaneCoder(table, num_lanes=16)
    out = coder.decode(coder.encode(sym, idx), idx)
    assert np.array_equal(out, sym)


def test_lane_odd_sizes_and_padding(rng):
    table = make_table(rng)
    for n in (1, 7, 63, 64, 65, 1023):
        sym, idx = sample_symbols(rng, table, n)
        coder = LaneCoder(table, num_lanes=64)
        out = coder.decode(coder.encode(sym, idx), idx)
        assert np.array_equal(out, sym), f"n={n}"


def test_lane_empty():
    table = CdfTable(
        quantized_cdf=np.array([[0, 2**15, 2**16]], dtype=np.int32),
        cdf_length=np.array([3], dtype=np.int32),
        offset=np.array([0], dtype=np.int32),
    )
    coder = LaneCoder(table)
    data = coder.encode(np.zeros(0, np.int32), np.zeros(0, np.int32))
    out = coder.decode(data, np.zeros(0, np.int32))
    assert out.size == 0


def test_lane_compression_ratio_sane(rng):
    """Lane overhead must stay small: compare against the serial coder."""
    table = make_table(rng, ncdfs=8, max_bins=32)
    sym, idx = sample_symbols(rng, table, 100_000, escape_frac=0.001)
    serial = native.encode_with_indexes(sym, idx, table.quantized_cdf, table.cdf_length, table.offset)
    lanes = LaneCoder(table).encode(sym, idx)  # default lanes: >=512 sym/lane
    overhead = len(lanes) / len(serial) - 1.0
    assert overhead < 0.025, f"lane overhead {overhead:.2%} too large"


def test_lane_2d_shapes(rng):
    table = make_table(rng)
    sym, idx = sample_symbols(rng, table, 24 * 32)
    sym = sym.reshape(24, 32)
    idx = idx.reshape(24, 32)
    coder = LaneCoder(table, num_lanes=16)
    out = coder.decode(coder.encode(sym, idx), idx)
    assert out.shape == (24, 32)
    assert np.array_equal(out, sym)


def test_device_path_roundtrip(rng):
    """encode_from_device / decode_to_device must interop with the numpy
    paths and with each other, escapes included."""
    import jax.numpy as jnp

    table = make_table(rng, ncdfs=6, max_bins=24)
    sym, idx = sample_symbols(rng, table, 50_000, escape_frac=0.01)
    coder = LaneCoder(table)

    data_np = coder.encode(sym, idx)
    data_dev = coder.encode_from_device(jnp.asarray(sym), jnp.asarray(idx))
    assert data_np == data_dev  # identical container bytes

    out_dev = np.asarray(coder.decode_to_device(data_dev, jnp.asarray(idx)))
    np.testing.assert_array_equal(out_dev, sym)
    out_np = coder.decode(data_dev, idx)
    np.testing.assert_array_equal(out_np, sym)


def test_device_path_shapes_and_no_escape(rng):
    import jax.numpy as jnp

    table = make_table(rng, ncdfs=3, max_bins=16)
    sym, idx = sample_symbols(rng, table, 4096, escape_frac=0.0)
    coder = LaneCoder(table)
    sym2 = sym.reshape(4, 32, 32)
    idx2 = idx.reshape(4, 32, 32)
    data = coder.encode_from_device(jnp.asarray(sym2), jnp.asarray(idx2))
    out = coder.decode_to_device(data, jnp.asarray(idx2))
    assert out.shape == (4, 32, 32)
    np.testing.assert_array_equal(np.asarray(out), sym2)


def test_batched_encode_decode_matches_sequential(rng):
    """encode_dispatch_batch/decode_batch_to_device: one vmapped scan per
    batch must produce byte-identical streams and identical symbols vs the
    per-item paths."""
    import jax.numpy as jnp

    from cra5_tpu.coder.rans_tpu import LaneCoder

    table = make_table(rng, ncdfs=3, max_bins=8)
    coder = LaneCoder(table)
    B, C, H, W = 4, 3, 8, 16
    sym = rng.integers(-20, 20, size=(B, C, H, W)).astype(np.int32)
    idx = np.broadcast_to(
        np.arange(C, dtype=np.int32)[None, :, None, None], sym.shape
    ).copy()
    sym_d, idx_d = jnp.asarray(sym), jnp.asarray(idx)

    batched = coder.encode_finalize_many(coder.encode_dispatch_batch(sym_d, idx_d))
    sequential = [coder.encode_from_device(sym_d[b], idx_d[b]) for b in range(B)]
    assert batched == sequential

    dec = np.asarray(coder.decode_batch_to_device(batched, idx_d))
    np.testing.assert_array_equal(dec, sym)

    # mixed escape counts across the batch (incl. an all-in-range item)
    sym2 = sym.copy()
    sym2[0] = np.clip(sym2[0], -1, 1)
    sym2[1, 0, 0, 0] = 100000
    sym2_d = jnp.asarray(sym2)
    batched2 = coder.encode_finalize_many(coder.encode_dispatch_batch(sym2_d, idx_d))
    dec2 = np.asarray(coder.decode_batch_to_device(batched2, idx_d))
    np.testing.assert_array_equal(dec2, sym2)


def test_native_varint_matches_numpy_oracle():
    """The C zigzag-varint codec (rans64.cpp) must be byte-identical to the
    numpy implementation in rans_tpu (the v2 escape-channel format)."""
    from cra5_tpu.coder import native
    from cra5_tpu.coder import rans_tpu as rt

    if not native.native_available():
        pytest.skip("no native lib (compiler unavailable)")

    rng = np.random.default_rng(7)
    cases = [
        rng.integers(-(2**31), 2**31 - 1, 20000).astype(np.int32),
        np.array([], np.int32),
        np.array([0, -1, 1, 127, -128, 2**31 - 1, -(2**31)], np.int32),
    ]
    for vals in cases:
        enc_c = native.zigzag_varint_encode(vals)
        # the module-level helpers prefer native; drive the numpy branch
        # directly by stubbing availability
        import unittest.mock as mock

        with mock.patch.object(native, "zigzag_varint_encode", lambda v: None), \
             mock.patch.object(native, "zigzag_varint_decode", lambda d, c: None):
            enc_np = rt._zigzag_varint_encode(vals)
            dec_np = rt._zigzag_varint_decode(enc_c, vals.size)
        assert enc_c == enc_np
        np.testing.assert_array_equal(dec_np, vals)
        np.testing.assert_array_equal(
            native.zigzag_varint_decode(enc_np, vals.size), vals
        )
