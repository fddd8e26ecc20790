"""Fuzz/robustness tests for the decode paths (round-2 VERDICT next #7):
truncated and corrupted v1/v2 containers must raise clean errors (or at
worst return shape-valid garbage), never crash, hang, or read out of
bounds; invalid CDF tables and out-of-range indexes are rejected by the
native coder (mirroring the reference's debug-build assert_cdfs,
rans_interface.cpp:56-66)."""

import numpy as np
import pytest

from cra5_tpu.coder import native
from cra5_tpu.coder.rans_tpu import LaneCoder, _parse_v2_header

from test_rans import make_table, sample_symbols, to_lists


@pytest.fixture(scope="module")
def v1_setup():
    rng = np.random.default_rng(0)
    table = make_table(rng, ncdfs=6, max_bins=20)
    sym, idx = sample_symbols(rng, table, 5000, escape_frac=0.05)
    data = native.encode_with_indexes(
        sym, idx, table.quantized_cdf, table.cdf_length, table.offset
    )
    return table, sym, idx, data


@pytest.fixture(scope="module")
def v2_setup():
    rng = np.random.default_rng(1)
    table = make_table(rng, ncdfs=6, max_bins=20)
    sym, idx = sample_symbols(rng, table, 5000, escape_frac=0.05)
    coder = LaneCoder(table, num_lanes=128)
    return table, coder, sym, idx, coder.encode(sym, idx)


def test_v1_truncation_raises(v1_setup):
    table, sym, idx, data = v1_setup
    for cut in (0, 4, 7, len(data) // 2, len(data) - 4):
        with pytest.raises(ValueError):
            native.decode_with_indexes(
                data[:cut], idx, table.quantized_cdf, table.cdf_length, table.offset
            )


def test_v1_bitflips_never_crash(v1_setup):
    """rANS cannot detect arbitrary corruption; flipped bytes may decode
    to wrong symbols, but the decoder must return a shape-valid array or
    raise — bounded by the stream-underrun check either way."""
    table, sym, idx, data = v1_setup
    rng = np.random.default_rng(2)
    for _ in range(25):
        buf = bytearray(data)
        pos = int(rng.integers(0, len(buf)))
        buf[pos] ^= int(rng.integers(1, 256))
        try:
            out = native.decode_with_indexes(
                bytes(buf), idx, table.quantized_cdf, table.cdf_length, table.offset
            )
            assert out.shape == idx.shape
        except ValueError:
            pass


def test_v1_invalid_cdf_rejected(v1_setup):
    table, sym, idx, data = v1_setup
    bad = table.quantized_cdf.copy()
    bad[0, 1] = bad[0, 2]  # non-monotone row
    with pytest.raises(ValueError, match="CDF"):
        native.decode_with_indexes(data, idx, bad, table.cdf_length, table.offset)
    with pytest.raises(ValueError, match="CDF"):
        native.encode_with_indexes(sym, idx, bad, table.cdf_length, table.offset)


def test_v1_index_out_of_range_rejected(v1_setup):
    table, sym, idx, data = v1_setup
    bad_idx = idx.copy()
    bad_idx[17] = table.num_indexes + 3
    with pytest.raises(ValueError, match="index"):
        native.decode_with_indexes(
            data, bad_idx, table.quantized_cdf, table.cdf_length, table.offset
        )
    with pytest.raises(ValueError, match="index"):
        native.encode_with_indexes(
            sym, bad_idx, table.quantized_cdf, table.cdf_length, table.offset
        )


def test_v1_streaming_decoder_validates(v1_setup):
    table, sym, idx, data = v1_setup
    dec = native.StreamingDecoder(data)
    bad = table.quantized_cdf.copy()
    bad[2, 0] = 5  # row must start at 0
    with pytest.raises(ValueError, match="CDF"):
        dec.decode(idx[:4], bad, table.cdf_length, table.offset)
    with pytest.raises(ValueError):
        native.StreamingDecoder(b"\x01\x02\x03")  # not even a header


def test_v2_header_truncation(v2_setup):
    table, coder, sym, idx, data = v2_setup
    for cut in (0, 3, 19):
        with pytest.raises(ValueError, match="truncated|CRX2"):
            _parse_v2_header(data[:cut])
    # payload shorter than the header promises
    with pytest.raises(ValueError, match="truncated"):
        coder.decode(data[: len(data) // 2], idx)


def test_v2_bad_magic_and_fields(v2_setup):
    table, coder, sym, idx, data = v2_setup
    buf = bytearray(data)
    buf[0] ^= 0xFF
    with pytest.raises(ValueError, match="CRX2"):
        coder.decode(bytes(buf), idx)
    # implausible lane count
    buf = bytearray(data)
    buf[8:12] = (0).to_bytes(4, "little")
    with pytest.raises(ValueError, match="lane count"):
        coder.decode(bytes(buf), idx)
    buf = bytearray(data)
    buf[8:12] = (1 << 24).to_bytes(4, "little")
    with pytest.raises(ValueError, match="lane count"):
        coder.decode(bytes(buf), idx)
    # symbol count mismatch vs indexes
    buf = bytearray(data)
    buf[4:8] = (123).to_bytes(4, "little")
    with pytest.raises(ValueError, match="mismatch|implausible"):
        coder.decode(bytes(buf), idx)


def test_v2_truncated_escape_channel(v2_setup):
    table, coder, sym, idx, data = v2_setup
    n, K, n_esc, n_words, _, _, _ = _parse_v2_header(data)
    assert n_esc > 0
    body_end = 20 + 4 * K + 2 * n_words
    # drop the escape varints entirely
    with pytest.raises(ValueError, match="escape|truncated"):
        coder.decode(data[:body_end], idx)


def test_v2_stream_bitflips_never_crash(v2_setup):
    table, coder, sym, idx, data = v2_setup
    rng = np.random.default_rng(3)
    n, K, n_esc, n_words, _, _, _ = _parse_v2_header(data)
    for _ in range(15):
        buf = bytearray(data)
        # flip within the word stream / states (past the header)
        pos = int(rng.integers(20, 20 + 4 * K + 2 * n_words))
        buf[pos] ^= int(rng.integers(1, 256))
        try:
            out = coder.decode(bytes(buf), idx)
            assert out.shape == idx.shape
        except ValueError:
            pass


def test_v2_upload_batch_validates(v2_setup):
    table, coder, sym, idx, data = v2_setup
    with pytest.raises(ValueError):
        coder.upload_batch([data[:10]])
    with pytest.raises(ValueError):
        coder.upload_batch([b"zzzz" + data[4:]])


def test_bin_container_truncation_and_bad_lengths(tmp_path):
    """The .bin archive container parse rejects truncation and overrun
    length fields with ValueError (not struct.error / silent shortening)."""
    import struct

    from cra5_tpu.api.bitstream import load_bin, save_bin

    path = str(tmp_path / "a.bin")
    save_bin(path, [[b"yyyyyyyy"], [b"zzzz"]], (18, 36))
    strings, shape = load_bin(path)
    assert shape == (18, 36) and strings[0][0] == b"yyyyyyyy"

    raw = open(path, "rb").read()
    # truncate at every boundary class: mid-header, mid-length, mid-stream
    for cut in (2, 11, 14, len(raw) - 2):
        p = str(tmp_path / f"t{cut}.bin")
        open(p, "wb").write(raw[:cut])
        with pytest.raises(ValueError, match="truncated|Invalid|declares"):
            load_bin(p)
    # stream length overruns the file
    bad = bytearray(raw)
    bad[12:16] = struct.pack(">I", 1 << 30)
    p = str(tmp_path / "len.bin")
    open(p, "wb").write(bytes(bad))
    with pytest.raises(ValueError, match="exceeds|truncated"):
        load_bin(p)
    # absurd stream count
    bad = bytearray(raw)
    bad[8:12] = struct.pack(">I", 1 << 28)
    p = str(tmp_path / "count.bin")
    open(p, "wb").write(bytes(bad))
    with pytest.raises(ValueError, match="declares|truncated"):
        load_bin(p)
