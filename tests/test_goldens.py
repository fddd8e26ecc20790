"""Bitstream golden files: both container formats are locked across
builds — a format change that breaks decode of previously written
archives fails here (SURVEY.md §4 'bitstream golden files')."""

from pathlib import Path

import numpy as np

GOLDEN = Path(__file__).parent / "goldens"


def _load():
    from cra5_tpu.entropy.cdf import CdfTable

    z = np.load(GOLDEN / "rans_golden.npz")
    table = CdfTable(
        quantized_cdf=z["quantized_cdf"],
        cdf_length=z["cdf_length"],
        offset=z["offset"],
    )
    return z["sym"], z["idx"], table


def test_v1_golden_decodes():
    from cra5_tpu.coder import native

    sym, idx, table = _load()
    data = (GOLDEN / "stream_v1.bin").read_bytes()
    out = native.decode_with_indexes(
        data, idx, table.quantized_cdf, table.cdf_length, table.offset
    )
    np.testing.assert_array_equal(out, sym)


def test_v1_golden_reencodes_identically():
    from cra5_tpu.coder import native

    sym, idx, table = _load()
    data = native.encode_with_indexes(
        sym, idx, table.quantized_cdf, table.cdf_length, table.offset
    )
    assert data == (GOLDEN / "stream_v1.bin").read_bytes()


def test_v2_golden_decodes():
    from cra5_tpu.coder.rans_tpu import LaneCoder

    sym, idx, table = _load()
    data = (GOLDEN / "stream_v2.bin").read_bytes()
    out = LaneCoder(table).decode(data, idx)
    np.testing.assert_array_equal(out, sym)


def test_v2_golden_reencodes_identically():
    from cra5_tpu.coder.rans_tpu import LaneCoder

    sym, idx, table = _load()
    data = LaneCoder(table).encode(sym, idx)
    assert data == (GOLDEN / "stream_v2.bin").read_bytes()


def _load_sorted():
    sym_idx = np.load(GOLDEN / "sorted_golden.npz")
    _, _, table = _load()
    return sym_idx["sym"], sym_idx["idx"], table


def test_v2_sorted_golden_decodes():
    """On-disk sorted+merged container (header bits 31/30/29) decodes on
    the host and device paths — locks the permutation and tiny-bucket
    merge definitions (docs/FORMATS.md §3.3-3.4) across versions. The
    golden's index distribution makes the merge remap NONTRIVIAL."""
    import jax.numpy as jnp

    from cra5_tpu.coder.rans_tpu import LaneCoder, _parse_v2_header

    sym, idx, table = _load_sorted()
    data = (GOLDEN / "stream_v2_sorted.bin").read_bytes()
    assert _parse_v2_header(data)[4:7] == (True, True, True)
    coder = LaneCoder(table, num_lanes=128)
    np.testing.assert_array_equal(coder.decode(data, idx), sym)
    out_dev = np.asarray(coder.decode_to_device(data, jnp.asarray(idx)))
    np.testing.assert_array_equal(out_dev, sym)


def test_v2_sorted_golden_reencodes_identically():
    from cra5_tpu.coder.rans_pallas import set_sorted_lanes
    from cra5_tpu.coder.rans_tpu import LaneCoder

    sym, idx, table = _load_sorted()
    set_sorted_lanes("on")
    try:
        data = LaneCoder(table, num_lanes=128).encode(sym, idx)
    finally:
        set_sorted_lanes("auto")
    assert data == (GOLDEN / "stream_v2_sorted.bin").read_bytes()
