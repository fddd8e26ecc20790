"""Pallas lane-rANS kernels: bit-exactness vs the lax.scan state machine
(interpret mode on CPU) at the scan level and through the LaneCoder
container path (bytes must be identical — format v2 is locked)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cra5_tpu.coder import rans_tpu as rt
from cra5_tpu.coder.rans_pallas import (
    encode_scan_pallas,
    set_pallas_rans,
    use_pallas_scan,
)
from cra5_tpu.coder.rans_tpu import LaneCoder

from test_rans import make_table, sample_symbols


@pytest.mark.parametrize("M,K", [(13, 256), (7, 1024), (29, 128), (5, 512)])
@pytest.mark.parametrize("unroll", [1, 4, None])
def test_encode_scan_bit_exact(rng, M, K, unroll):
    """Pallas encode matches the lax.scan state machine bit-for-bit at
    every unroll (incl. the identity no-op step padding when the unroll
    does not divide M)."""
    freqs = rng.integers(1, 60000, (M, K)).astype(np.int32)
    starts = rng.integers(0, 5000, (M, K)).astype(np.int32)
    m, s = rt._division_magic(freqs.reshape(-1))
    args = (
        jnp.zeros((M, K), jnp.int32),
        jnp.asarray(starts),
        jnp.asarray(freqs),
        jnp.asarray(m.reshape(M, K)),
        jnp.asarray(s.reshape(M, K).astype(np.int32)),
    )
    x0, e0, w0 = rt._encode_scan(*args, M)
    x1, e1, w1 = encode_scan_pallas(*args, M, interpret=True, unroll=unroll)
    assert np.array_equal(x0, x1)
    assert np.array_equal(e0, e1)
    # non-emitted word slots are don't-care; compare under the mask
    assert np.array_equal(np.where(e0, w0, 0), np.where(np.asarray(e1), w1, 0))


def test_lane_coder_container_identical(rng):
    """Same container bytes from both scan implementations, and the
    stream decodes (Pallas encode -> lax.scan decode interop)."""
    table = make_table(rng, ncdfs=6)
    sym, idx = sample_symbols(rng, table, 3000)
    coder = LaneCoder(table, num_lanes=128)
    base = coder.encode(sym, idx)
    set_pallas_rans("on")
    try:
        assert use_pallas_scan(128)
        data = coder.encode(sym, idx)
    finally:
        set_pallas_rans("auto")
    assert data == base
    out = coder.decode(data, idx)
    assert np.array_equal(out, sym)


def test_decode_to_device_pallas(rng):
    """decode_to_device routed through the Pallas binary-search kernel
    (mode 'on', interpret on CPU) matches the host decode, escapes
    included."""
    table = make_table(rng, ncdfs=5)
    sym, idx = sample_symbols(rng, table, 2500, escape_frac=0.05)
    coder = LaneCoder(table, num_lanes=128)
    data = coder.encode(sym, idx)
    set_pallas_rans("on")
    try:
        assert coder._pallas_decode_ok(128, 4096)
        out = coder.decode_to_device(data, jnp.asarray(idx))
    finally:
        set_pallas_rans("auto")
    assert np.array_equal(np.asarray(out), sym)


def test_decode_scan_parity_full_pipeline(rng):
    """Pallas and lax.scan decodes of the same container agree bit-for-bit
    through upload_batch/decode_uploaded_batch."""
    table = make_table(rng, ncdfs=3)
    sym, idx = sample_symbols(rng, table, 1500, escape_frac=0.0)
    coder = LaneCoder(table, num_lanes=256)
    data = coder.encode(sym, idx)
    idx_b = jnp.asarray(idx)[None]
    base = coder.decode_uploaded_batch(coder.upload_batch([data]), idx_b)
    set_pallas_rans("on")
    try:
        out = coder.decode_uploaded_batch(coder.upload_batch([data]), idx_b)
    finally:
        set_pallas_rans("auto")
    assert np.array_equal(np.asarray(out), np.asarray(base))


def test_finalize_bucket_hint_miss_refetch(rng):
    """The speculative finalize must survive a hint that's far too small:
    first encode a near-zero-entropy stream (tiny word count), then a
    high-escape stream of the same (n, K) — the refetch path must produce
    a byte stream that decodes."""
    table = make_table(rng, ncdfs=4)
    n = 4000
    coder = LaneCoder(table, num_lanes=128)
    coder._bucket_hint.clear()
    # low-entropy: all symbols sit in the most probable bin of index 0
    pmf_peak = int(np.argmax(np.diff(table.quantized_cdf[0])))
    sym0 = np.full(n, pmf_peak + table.offset[0], np.int32)
    idx0 = np.zeros(n, np.int32)
    d0 = coder.encode(sym0, idx0)
    assert np.array_equal(coder.decode(d0, idx0), sym0)
    # high-escape: same shape, hint from d0 is way too small for this
    sym1, idx1 = sample_symbols(rng, table, n, escape_frac=0.9)
    d1 = coder.encode(sym1, idx1)
    assert np.array_equal(coder.decode(d1, idx1), sym1)
    # and the hit path: re-encode the same data with a now-correct hint
    d2 = coder.encode(sym1, idx1)
    assert d2 == d1


@pytest.mark.parametrize("C,HW,K", [(16, 81, 32), (7, 40, 16), (4, 200, 128)])
def test_rowplan_decode_channel_broadcast(rng, C, HW, K):
    """The gather-free row-plan kernel must match the host decode on
    channel-broadcast index grids (every EB z-stream), escapes and
    padded tail included."""
    table = make_table(rng, ncdfs=C)
    idx = np.repeat(np.arange(C, dtype=np.int32), HW)
    n = idx.size
    mv = table.cdf_length[idx] - 2
    bins = (rng.random(n) * mv).astype(np.int32)
    sym = (bins + table.offset[idx]).astype(np.int32)
    esc = rng.random(n) < 0.03
    sym = np.where(esc, sym + rng.integers(-200, 200, size=n), sym).astype(np.int32)
    coder = LaneCoder(table, num_lanes=K)
    data = coder.encode(sym, idx)
    base = coder.decode(data, idx)
    assert np.array_equal(base, sym)
    set_pallas_rans("on")
    try:
        assert coder._rowplan_ok(K, HW)
        out = coder.decode_to_device(data, jnp.asarray(idx), row_plan=HW)
    finally:
        set_pallas_rans("auto")
    assert np.array_equal(np.asarray(out), sym)


def test_mode_validation():
    with pytest.raises(ValueError):
        set_pallas_rans("sometimes")
    set_pallas_rans("auto")
    assert not use_pallas_scan(100)  # not a multiple of 128
