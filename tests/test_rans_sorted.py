"""Index-sorted lane assignment (v2 header bit 31) + the gather-free
sorted decode kernel (decode_sorted_pallas, exercised in interpret mode
on CPU). The sorted container is byte-stable and cross-decodes between
the host and device paths."""

import jax.numpy as jnp
import numpy as np
import pytest

from cra5_tpu.coder.rans_pallas import set_sorted_lanes
from cra5_tpu.coder.rans_tpu import LaneCoder, _parse_v2_header

from test_rans import make_table, sample_symbols


@pytest.fixture
def sorted_on():
    set_sorted_lanes("on")
    yield
    set_sorted_lanes("auto")


def test_sorted_flag_roundtrip_header(sorted_on, rng):
    table = make_table(rng, ncdfs=8, max_bins=24)
    sym, idx = sample_symbols(rng, table, 4000, escape_frac=0.05)
    coder = LaneCoder(table, num_lanes=128)
    data = coder.encode(sym, idx)
    n, K, n_esc, n_words, sorted_mode, safe, merged = _parse_v2_header(data)
    assert merged  # new sorted streams always carry the merge bit
    assert sorted_mode and (n, K) == (4000, 128)
    assert np.array_equal(coder.decode(data, idx), sym)


@pytest.mark.parametrize(
    "n,K,esc",
    [(40000, 512, 0.03), (1000, 128, 0.0), (130, 128, 0.5), (513, 512, 0.02)],
)
def test_sorted_device_decode_matches(sorted_on, rng, n, K, esc):
    """Device decode (kernel when the stream is window-safe, sorted
    lax.scan otherwise) matches the host path and the original symbols."""
    table = make_table(rng, ncdfs=64, max_bins=300)
    sym, idx = sample_symbols(rng, table, n, escape_frac=esc)
    coder = LaneCoder(table, num_lanes=K)
    data = coder.encode(sym, idx)
    out_dev = np.asarray(coder.decode_to_device(data, jnp.asarray(idx)))
    out_host = coder.decode(data, idx)
    assert np.array_equal(out_dev, sym)
    assert np.array_equal(out_host, sym)


def test_sorted_safety_verdict(sorted_on, rng):
    """Streams whose buckets are >= K-dense are flagged kernel-safe;
    sparse-bucket streams are not (and still decode via the fallback)."""
    table = make_table(rng, ncdfs=4, max_bins=16)
    # dense: 4 buckets x >= 4*K symbols each
    sym, idx = sample_symbols(rng, table, 40000, escape_frac=0.01)
    coder = LaneCoder(table, num_lanes=256)
    safe_stream = coder.encode(sym, idx)
    assert _parse_v2_header(safe_stream)[5] is True
    # sparse: one bucket has a single symbol in the middle
    table2 = make_table(rng, ncdfs=64, max_bins=12)
    sym2, idx2 = sample_symbols(rng, table2, 2000, escape_frac=0.0)
    coder2 = LaneCoder(table2, num_lanes=512)
    unsafe_stream = coder2.encode(sym2, idx2)
    assert _parse_v2_header(unsafe_stream)[5] is False
    assert np.array_equal(coder2.decode(unsafe_stream, idx2), sym2)
    assert np.array_equal(
        np.asarray(coder2.decode_to_device(unsafe_stream, jnp.asarray(idx2))),
        sym2,
    )


def test_sorted_single_index_stream(sorted_on, rng):
    table = make_table(rng, ncdfs=16, max_bins=200)
    n = 3000
    idx = np.full(n, 7, np.int32)
    mv = int(table.cdf_length[7] - 2)
    bins = (rng.random(n) * mv).astype(np.int32)
    sym = (bins + table.offset[7]).astype(np.int32)
    coder = LaneCoder(table, num_lanes=256)
    data = coder.encode(sym, idx)
    assert _parse_v2_header(data)[4:] == (True, True, True)
    assert np.array_equal(
        np.asarray(coder.decode_to_device(data, jnp.asarray(idx))), sym
    )


def test_sorted_batch_upload_decode(sorted_on, rng):
    table = make_table(rng, ncdfs=16, max_bins=64)
    n, K, B = 20000, 256, 3
    syms, idxs, datas = [], [], []
    coder = LaneCoder(table, num_lanes=K)
    for b in range(B):
        sym, idx = sample_symbols(rng, table, n, escape_frac=0.02)
        syms.append(sym)
        idxs.append(idx)
        datas.append(coder.encode(sym, idx))
    idx_b = jnp.asarray(np.stack(idxs))
    out = np.asarray(
        coder.decode_uploaded_batch(coder.upload_batch(datas), idx_b)
    )
    assert np.array_equal(out, np.stack(syms))


def test_tiny_bucket_merge_makes_kernel_safe(sorted_on, rng):
    """Realistic scale grids carry a few sub-K buckets; the deterministic
    merge (header bit 29) folds them into the nearest dense bucket so the
    stream stays kernel-safe, and both decode paths recover the symbols
    (escapes cover any range misses under the merged row)."""
    table = make_table(rng, ncdfs=8, max_bins=48)
    K = 256
    # 6 dense buckets + two tiny ones (3 and 5 symbols, < K each)
    idx = np.concatenate([
        np.repeat(np.array([0, 1, 3, 4, 6, 7], np.int32), 4000),
        np.full(3, 2, np.int32),
        np.full(5, 5, np.int32),
    ])
    rng.shuffle(idx)
    sym = np.empty(idx.size, np.int32)
    for i in range(8):
        m = idx == i
        mv = int(table.cdf_length[i] - 2)
        sym[m] = (rng.random(m.sum()) * mv).astype(np.int32) + int(table.offset[i])
    coder = LaneCoder(table, num_lanes=K)
    data = coder.encode(sym, idx)
    n, _, n_esc, _, sorted_mode, safe, merged = _parse_v2_header(data)
    assert sorted_mode and merged and safe  # merge rescued kernel routing
    assert np.array_equal(coder.decode(data, idx), sym)
    assert np.array_equal(
        np.asarray(coder.decode_to_device(data, jnp.asarray(idx))), sym
    )


def test_tiny_bucket_merge_identity_when_all_sparse(sorted_on, rng):
    """When no bucket reaches K the remap is the identity and the encoder
    falls back to the (correct) unsafe verdict."""
    table = make_table(rng, ncdfs=64, max_bins=12)
    sym, idx = sample_symbols(rng, table, 2000, escape_frac=0.0)
    coder = LaneCoder(table, num_lanes=512)
    data = coder.encode(sym, idx)
    assert _parse_v2_header(data)[5] is False
    assert np.array_equal(coder.decode(data, idx), sym)


def test_sorted_mode_off_stays_unsorted(rng):
    table = make_table(rng, ncdfs=8, max_bins=24)
    sym, idx = sample_symbols(rng, table, 4000, escape_frac=0.02)
    coder = LaneCoder(table, num_lanes=128)
    data = coder.encode(sym, idx)  # auto on CPU -> unsorted
    assert _parse_v2_header(data)[4] is False
    assert np.array_equal(coder.decode(data, idx), sym)


@pytest.mark.parametrize("unroll", [1, 3, 8, pytest.param(
    1000, marks=pytest.mark.slow)])  # quick-suite re-budget (r5)
def test_sorted_kernel_unroll_invariant(sorted_on, rng, unroll):
    """The kernel's step unroll factor (incl. U > M and the no-op step
    padding when U does not divide M) never changes decoded symbols."""
    from cra5_tpu.coder.rans_pallas import set_sorted_unroll

    table = make_table(rng, ncdfs=16, max_bins=200)
    sym, idx = sample_symbols(rng, table, 30000, escape_frac=0.02)
    coder = LaneCoder(table, num_lanes=512)  # M = 59 steps
    data = coder.encode(sym, idx)
    assert _parse_v2_header(data)[5] is True  # kernel-routable
    set_sorted_unroll(unroll)
    try:
        out = np.asarray(coder.decode_to_device(data, jnp.asarray(idx)))
    finally:
        set_sorted_unroll(8)
    assert np.array_equal(out, sym)


def test_sorted_golden_stable(sorted_on, rng):
    """Sorted-mode container bytes are deterministic (same inputs ->
    identical stream), locking the permutation definition."""
    table = make_table(rng, ncdfs=32, max_bins=100)
    sym, idx = sample_symbols(rng, table, 25000, escape_frac=0.04)
    c1 = LaneCoder(table, num_lanes=256)
    c2 = LaneCoder(table, num_lanes=256)
    assert c1.encode(sym, idx) == c2.encode(sym, idx)


def _clear_merged_bit(data: bytes) -> bytes:
    """Rewrite a v2 container header with flag bit 29 (MERGED) cleared —
    reproduces the layout written by pre-merge encoders."""
    import struct

    from cra5_tpu.coder.rans_tpu import _MERGED_FLAG

    kf = struct.unpack_from("<I", data, 8)[0]
    return data[:8] + struct.pack("<I", kf & ~_MERGED_FLAG) + data[12:]


def test_unmerged_sorted_stream_backcompat(sorted_on, rng, monkeypatch):
    """Streams written by pre-merge sorted encoders (header bit 31 set,
    bit 29 CLEAR, tiny buckets left in place -> kernel-unsafe) must keep
    decoding on both the host and device paths — docs/FORMATS.md §3.4
    promises clear-bit streams stay readable."""
    import jax

    import cra5_tpu.coder.rans_tpu as rt

    table = make_table(rng, ncdfs=8, max_bins=60)
    # mixed density: two dense buckets + tiny ones (count < K), so the
    # modern encoder WOULD merge — the patched one reproduces the old
    # unmerged layout, which is kernel-unsafe
    idx = np.sort(
        np.concatenate([
            np.zeros(1400, np.int32),
            np.full(1400, 7, np.int32),
            np.arange(1, 7, dtype=np.int32).repeat(30),
        ])
    )
    max_vals = table.cdf_length[idx] - 2
    sym = ((rng.random(idx.size) * max_vals).astype(np.int32)
           + table.offset[idx])
    esc = rng.random(idx.size) < 0.05
    sym = np.where(
        esc, sym + rng.integers(-300, 300, size=idx.size), sym
    ).astype(np.int32)
    coder = LaneCoder(table, num_lanes=128)
    # reproduce the old encoder: identity in place of the merge remap
    # (disable_jit so the patched body actually runs instead of a trace)
    monkeypatch.setattr(rt, "_merge_tiny_buckets", lambda i, n, k: i)
    with jax.disable_jit():
        data = _clear_merged_bit(coder.encode(sym, idx))
    monkeypatch.undo()
    n, K, _, _, sorted_mode, safe, merged = _parse_v2_header(data)
    assert sorted_mode and not merged
    assert safe is False  # unmerged tiny buckets: scan-fallback route
    assert np.array_equal(coder.decode(data, idx), sym)
    out_dev = np.asarray(coder.decode_to_device(data, jnp.asarray(idx)))
    assert np.array_equal(out_dev, sym)


def test_unmerged_sorted_stream_kernel_route(sorted_on, rng):
    """A pre-merge sorted stream whose buckets are all >= K-dense (merge
    identity, kernel-safe bit set) must decode through the gather-free
    kernel route with the merged bit clear."""
    table = make_table(rng, ncdfs=4, max_bins=16)
    sym, idx = sample_symbols(rng, table, 40000, escape_frac=0.01)
    coder = LaneCoder(table, num_lanes=256)
    data = _clear_merged_bit(coder.encode(sym, idx))
    n, K, _, _, sorted_mode, safe, merged = _parse_v2_header(data)
    assert sorted_mode and safe and not merged
    assert np.array_equal(coder.decode(data, idx), sym)
    out_dev = np.asarray(coder.decode_to_device(data, jnp.asarray(idx)))
    assert np.array_equal(out_dev, sym)
