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
    rt.clear_fallback_events()
    yield
    rt.set_kernel_fallback(True)
    rt._FALLBACK_WARNED.clear()
    rt.clear_fallback_events()
    rt._AOT_CACHE.clear()


def test_fallback_unit_chain(fallback_on):
    calls = []

    def bad():
        calls.append("bad")
        raise rt.ProbeFailure("t/a: INTERNAL: Mosaic lowering rejected op")

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = rt._kernel_fallback("t", [("a", bad), ("b", lambda: 42)])
    assert out == 42 and calls == ["bad"]
    assert any("falling back" in str(x.message) for x in w)
    # the degradation is recorded for bench/serve JSON
    events = rt.fallback_events()
    assert len(events) == 1 and events[0]["tag"] == "t"
    assert events[0]["path"] == "a" and events[0]["fallback_to"] == "b"


def test_routed_call_probe_success_and_cache(fallback_on):
    """_routed_call AOT-compiles once, caches the executable, and runs
    through it; runtime results match the plain jit call."""
    import jax

    @jax.jit
    def f(x):
        return x * 2 + 1

    x = jnp.arange(7, dtype=jnp.int32)
    out = rt._routed_call("probe-test", "ok", f, x)
    assert np.array_equal(np.asarray(out), np.arange(7) * 2 + 1)
    key = [k for k in rt._AOT_CACHE if k[0] == "probe-test"]
    assert len(key) == 1 and rt._AOT_CACHE[key[0]][0] == "ok"
    # second call reuses the compiled executable (same cache entry object)
    before = rt._AOT_CACHE[key[0]][1]
    rt._routed_call("probe-test", "ok", f, x)
    assert rt._AOT_CACHE[key[0]][1] is before


def test_routed_call_compile_failure_cached_as_probe_failure(fallback_on):
    """A compile-time rejection becomes ProbeFailure with a cached 'fail'
    verdict; trace-time caller bugs (TypeError/ValueError) propagate."""
    import jax

    @jax.jit
    def broken(x):
        raise RuntimeError("Mosaic lowering rejected op (injected)")

    x = jnp.arange(5, dtype=jnp.int32)
    with pytest.raises(rt.ProbeFailure, match="Mosaic"):
        rt._routed_call("probe-test", "bad", broken, x)
    key = [k for k in rt._AOT_CACHE if k[0] == "probe-test"]
    assert rt._AOT_CACHE[key[0]][0] == "fail"
    # cached: raises again without re-tracing
    with pytest.raises(rt.ProbeFailure):
        rt._routed_call("probe-test", "bad", broken, x)

    @jax.jit
    def caller_bug(x):
        raise ValueError("caller bug")

    with pytest.raises(ValueError, match="caller bug"):
        rt._routed_call("probe-test", "bug", caller_bug, x)


def test_fallback_unit_nonlowering_propagates(fallback_on):
    with pytest.raises(ValueError, match="caller bug"):
        rt._kernel_fallback(
            "t", [("a", lambda: (_ for _ in ()).throw(ValueError("caller bug"))),
                  ("b", lambda: 42)],
        )


def _probe_boom():
    raise rt.ProbeFailure("t/x: Mosaic rejection (injected)")


def test_fallback_unit_disabled_propagates(fallback_on):
    rt.set_kernel_fallback(False)
    with pytest.raises(rt.ProbeFailure, match="Mosaic"):
        rt._kernel_fallback("t", [("a", _probe_boom), ("b", lambda: 42)])


def test_fallback_unit_last_attempt_propagates(fallback_on):
    with pytest.raises(rt.ProbeFailure, match="Mosaic"):
        rt._kernel_fallback("t", [("only", _probe_boom)])


def test_fallback_unit_runtime_error_propagates(fallback_on):
    """Runtime (post-probe) errors are NOT degradation candidates: a real
    mid-run defect must crash loudly, never silently fall to the slow
    path (the round-3 substring heuristic's failure mode)."""
    with pytest.raises(RuntimeError, match="Mosaic"):
        rt._kernel_fallback("t", [("a", _boom), ("b", lambda: 42)])


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
        # the degradation is visible to bench/serve JSON
        assert any(e["tag"] == "sorted-decode" for e in rt.fallback_events())
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
