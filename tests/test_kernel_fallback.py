"""Lowering-failure fallback chain (rans_tpu._kernel_fallback): a Pallas
kernel variant that fails to COMPILE on some backend/Mosaic version must
degrade to the next bit-identical path (unroll=1, then lax.scan) with a
warning, never crash a production entry point — while caller bugs still
propagate. The kernels themselves are only compilable on real TPU, so
these tests inject failures by monkeypatching the kernel entry points."""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

import cra5_tpu.coder.rans_pallas as rp
import cra5_tpu.coder.rans_tpu as rt
from cra5_tpu.coder.rans_tpu import LaneCoder, _parse_v2_header

from test_rans import make_table, sample_symbols


def _boom(*a, **k):
    raise RuntimeError("Mosaic failed to lower module (injected)")


@pytest.fixture
def fallback_on():
    rt.set_kernel_fallback(True)
    yield
    rt.set_kernel_fallback(True)
    rt._FALLBACK_WARNED.clear()


def test_fallback_unit_chain(fallback_on):
    calls = []

    def bad():
        calls.append("bad")
        raise RuntimeError("INTERNAL: Mosaic lowering rejected op")

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = rt._kernel_fallback("t", [("a", bad), ("b", lambda: 42)])
    assert out == 42 and calls == ["bad"]
    assert any("falling back" in str(x.message) for x in w)


def test_fallback_unit_nonlowering_propagates(fallback_on):
    with pytest.raises(ValueError, match="caller bug"):
        rt._kernel_fallback(
            "t", [("a", lambda: (_ for _ in ()).throw(ValueError("caller bug"))),
                  ("b", lambda: 42)],
        )


def test_fallback_unit_disabled_propagates(fallback_on):
    rt.set_kernel_fallback(False)
    with pytest.raises(RuntimeError, match="Mosaic"):
        rt._kernel_fallback("t", [("a", _boom), ("b", lambda: 42)])


def test_fallback_unit_last_attempt_propagates(fallback_on):
    with pytest.raises(RuntimeError, match="Mosaic"):
        rt._kernel_fallback("t", [("only", _boom)])


def test_sorted_decode_falls_back_to_scan(fallback_on, rng, monkeypatch):
    """A kernel-safe sorted stream still decodes when the sorted kernel
    refuses to lower (both unroll variants), via the lax.scan path."""
    rp.set_sorted_lanes("on")
    try:
        table = make_table(rng, ncdfs=4, max_bins=16)
        # unique n so the jit cache can't serve a pre-patch trace
        sym, idx = sample_symbols(rng, table, 40013, escape_frac=0.01)
        coder = LaneCoder(table, num_lanes=256)
        data = coder.encode(sym, idx)
        assert _parse_v2_header(data)[5] is True  # kernel-routable
        monkeypatch.setattr(rp, "decode_sorted_pallas", _boom)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = np.asarray(coder.decode_to_device(data, jnp.asarray(idx)))
        assert np.array_equal(out, sym)
        assert any("sorted-decode" in str(x.message) for x in w)
    finally:
        rp.set_sorted_lanes("auto")


def test_rowplan_decode_falls_back_to_generic(fallback_on, rng, monkeypatch):
    """A channel-broadcast decode with row_plan degrades to the generic
    path when the rowplan kernel refuses to lower."""
    rp.set_pallas_rans("on")
    try:
        C, HW = 16, 301  # unique shape for a fresh trace
        table = make_table(rng, ncdfs=C, max_bins=24)
        idx = np.repeat(np.arange(C, dtype=np.int32), HW)
        mv = table.cdf_length[idx] - 2
        sym = ((rng.random(idx.size) * mv).astype(np.int32)
               + table.offset[idx])
        coder = LaneCoder(table, num_lanes=128)
        data = coder.encode(sym, idx)
        assert coder._rowplan_ok(128, HW)
        monkeypatch.setattr(rp, "decode_rowplan_pallas", _boom)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = np.asarray(
                coder.decode_to_device(data, jnp.asarray(idx), row_plan=HW)
            )
        assert np.array_equal(out, sym)
        assert any("rowplan-decode" in str(x.message) for x in w)
    finally:
        rp.set_pallas_rans("auto")


def test_encode_falls_back_to_scan_same_bytes(fallback_on, rng, monkeypatch):
    """Encode degrades from the Pallas scan kernel to lax.scan and the
    container bytes are identical to the scan path's."""
    table = make_table(rng, ncdfs=8, max_bins=40)
    sym, idx = sample_symbols(rng, table, 5419, escape_frac=0.03)
    coder = LaneCoder(table, num_lanes=128)
    rp.set_pallas_rans("off")
    try:
        want = coder.encode(sym, idx)
        rp.set_pallas_rans("on")
        monkeypatch.setattr(rp, "encode_scan_pallas", _boom)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            got = coder.encode(sym, idx)
        assert got == want
        assert any("encode" in str(x.message) for x in w)
    finally:
        rp.set_pallas_rans("auto")
