"""Stage breakdown of the sorted y-decode path at the production shape
(2.65M symbols, K=8192, GC table, 16 dense buckets): prep (pack+sort+
merge+per-step table gathers), the Pallas kernel alone (unroll sweep),
and the post pass (escape substitution + un-permute sort), vs the full
decode_to_device. Burst-dispatch timing: R dispatches, one device_get
sync, minus one RTT — per CLAUDE.md block_until_ready does not
synchronize on this runtime."""
import functools
import sys, time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

from cra5_tpu.coder.rans_pallas import decode_sorted_pallas, set_sorted_lanes
from cra5_tpu.coder.rans_tpu import (
    LaneCoder, _merge_tiny_buckets, _parse_v2_header, _zigzag_varint_decode,
)
from cra5_tpu.entropy import gc_update, get_scale_table

RTT_EST = 0.027  # measured tunnel sync RTT (CLAUDE.md)


def burst(fn, sync, R=8, reps=5):
    out = fn()
    sync(out)  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(R):
            out = fn()
        sync(out)
        ts.append(max(time.time() - t0 - RTT_EST, 0.0) / R)
    return float(np.median(ts))


def main():
    print(f"[{time.strftime('%H:%M:%S')}] attaching...", flush=True)
    dev = jax.devices()
    print(f"[{time.strftime('%H:%M:%S')}] attached: {dev}", flush=True)
    set_sorted_lanes("on")
    table = gc_update(get_scale_table())
    rng = np.random.default_rng(0)
    n, K = 2_654_208, 8192
    idx = np.sort(rng.integers(0, 16, n)).astype(np.int32)
    mv = table.cdf_length[idx] - 2
    sym = ((rng.random(n) * mv).astype(np.int32) + table.offset[idx]).astype(
        np.int32
    )
    # a few escapes so the esc post-path is exercised like production
    esc = rng.random(n) < 0.002
    sym = np.where(esc, sym + 4000, sym).astype(np.int32)
    idx_dev = jnp.asarray(idx)
    sym_dev = jnp.asarray(sym)

    coder = LaneCoder(table, num_lanes=K)
    data = coder.encode_from_device(sym_dev, idx_dev)
    out = coder.decode_to_device(data, idx_dev)
    assert np.array_equal(np.asarray(out), sym)

    hn, hK, n_esc, n_words, sorted_mode, kernel_safe, merged = (
        _parse_v2_header(data)
    )
    print(f"container: n={hn} K={hK} esc={n_esc} words={n_words} "
          f"sorted={sorted_mode} safe={kernel_safe} merged={merged}",
          flush=True)
    assert sorted_mode and kernel_safe

    off = 20
    states = jnp.asarray(np.frombuffer(data, "<u4", K, off))
    off += 4 * K
    stream = jnp.asarray(
        np.frombuffer(data, "<u2", n_words, off).astype(np.uint16)
    )
    off += 2 * n_words
    esc_vals = jnp.asarray(_zigzag_varint_decode(data[off:], n_esc))

    coarse_tab, chunkT_tab, G, Lc = coder._sorted_tables()
    max_values, offsets = coder._max_values, coder._offsets
    M = -(-n // K)
    pos_bits = max((n - 1).bit_length(), 1)
    ncdfs = int(max_values.shape[0])
    print(f"M={M} G={G} Lc={Lc} ncdfs={ncdfs} pos_bits={pos_bits}",
          flush=True)

    # --- stage jits (mirrors _decode_sorted_device) ---
    @jax.jit
    def prep(idx_flat):
        iota = jnp.arange(n, dtype=jnp.int32)
        key = (idx_flat << pos_bits) | iota
        skey = jnp.sort(key)
        perm = skey & ((1 << pos_bits) - 1)
        sidx = skey >> pos_bits
        if merged:
            sidx = _merge_tiny_buckets(sidx, ncdfs, K)
        pad = M * K - n
        sidx_p = (
            jnp.concatenate([sidx, jnp.broadcast_to(sidx[n - 1], (pad,))])
            if pad else sidx
        )
        idx2 = sidx_p.reshape(M, K)
        r0 = idx2[:, 0]
        r1 = idx2[:, -1]
        split = K - jnp.sum((idx2 == r1[:, None]).astype(jnp.int32), axis=1)
        mv0 = jnp.take(max_values, r0, mode="clip")
        mv1 = jnp.take(max_values, r1, mode="clip")
        off0 = jnp.take(offsets, r0, mode="clip")
        off1 = jnp.take(offsets, r1, mode="clip")
        coarseT = jnp.stack(
            [jnp.take(coarse_tab, r0, axis=0, mode="clip"),
             jnp.take(coarse_tab, r1, axis=0, mode="clip")], axis=-1)
        chunkT = jnp.concatenate(
            [jnp.take(chunkT_tab, r0, axis=0, mode="clip"),
             jnp.take(chunkT_tab, r1, axis=0, mode="clip")], axis=-1)
        stream_p = jnp.pad(stream.astype(jnp.int32), (0, K + 256))
        return coarseT, chunkT, split, mv0, mv1, off0, off1, perm, stream_p

    kin = jax.device_get(prep(idx_dev)) and prep(idx_dev)  # materialize
    coarseT, chunkT, split, mv0, mv1, off0, off1, perm, stream_p = kin

    @functools.partial(jax.jit, static_argnames=("has_esc",))
    def post(values, sentinel, perm, has_esc=True):
        vals = values.reshape(-1)[:n]
        if has_esc:
            sent = sentinel.reshape(-1)[:n]
            rank = jnp.cumsum(sent.astype(jnp.int32)) - 1
            vals = jnp.where(sent, jnp.take(esc_vals, rank, mode="clip"),
                             vals)
        _, outv = jax.lax.sort((perm, vals), num_keys=1)
        return outv

    def sync_last(o):
        jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:8])

    t_prep = burst(lambda: prep(idx_dev), sync_last)
    print(f"prep (sort+merge+gathers): {t_prep*1e3:7.1f} ms", flush=True)

    for U in (4, 8, 16, 32):
        t_k = burst(
            lambda U=U: decode_sorted_pallas(
                coarseT, chunkT, split, mv0, mv1, off0, off1,
                states, stream_p, M, G, Lc, unroll=U),
            sync_last,
        )
        print(f"kernel U={U:2d}:              {t_k*1e3:7.1f} ms", flush=True)

    values, sentinel = decode_sorted_pallas(
        coarseT, chunkT, split, mv0, mv1, off0, off1,
        states, stream_p, M, G, Lc)
    t_post = burst(lambda: post(values, sentinel, perm), sync_last)
    print(f"post (esc+unsort):         {t_post*1e3:7.1f} ms", flush=True)

    # A/B: the merge remap's 2.65M 64-entry-table gather vs a positional
    # searchsorted expansion (idx_sorted is nondecreasing, so the remap
    # value is a function of position within the bucket bounds)
    @jax.jit
    def remap_gather(sidx):
        ids = jnp.arange(ncdfs, dtype=jnp.int32)
        bounds = jnp.searchsorted(sidx, jnp.arange(ncdfs + 1, dtype=jnp.int32))
        counts = jnp.diff(bounds)
        valid = counts >= K
        dist = jnp.abs(ids[:, None] - ids[None, :])
        dist = jnp.where(valid[None, :], dist, ncdfs + 1)
        nearest = jnp.argmin(dist, axis=1).astype(jnp.int32)
        remap = jnp.where(valid | ~jnp.any(valid), ids, nearest)
        return remap[sidx]

    @jax.jit
    def remap_positional(sidx):
        ids = jnp.arange(ncdfs, dtype=jnp.int32)
        bounds = jnp.searchsorted(sidx, jnp.arange(ncdfs + 1, dtype=jnp.int32))
        counts = jnp.diff(bounds)
        valid = counts >= K
        dist = jnp.abs(ids[:, None] - ids[None, :])
        dist = jnp.where(valid[None, :], dist, ncdfs + 1)
        nearest = jnp.argmin(dist, axis=1).astype(jnp.int32)
        remap = jnp.where(valid | ~jnp.any(valid), ids, nearest)
        # positional: out[j] = remap[bucket(j)] with no n-scale gather —
        # remap[0] plus the sum of remap deltas at every crossed bound
        pos = jnp.arange(sidx.shape[0], dtype=jnp.int32)
        deltas = remap[1:] - remap[:-1]                     # (ncdfs-1,)
        crossed = (pos[None, :] >= bounds[1:ncdfs, None]).astype(jnp.int32)
        return remap[0] + jnp.sum(deltas[:, None] * crossed, axis=0)

    @jax.jit
    def remap_valuekeyed(sidx):
        ids = jnp.arange(ncdfs, dtype=jnp.int32)
        bounds = jnp.searchsorted(sidx, jnp.arange(ncdfs + 1, dtype=jnp.int32))
        counts = jnp.diff(bounds)
        valid = counts >= K
        dist = jnp.abs(ids[:, None] - ids[None, :])
        dist = jnp.where(valid[None, :], dist, ncdfs + 1)
        nearest = jnp.argmin(dist, axis=1).astype(jnp.int32)
        remap = jnp.where(valid | ~jnp.any(valid), ids, nearest)
        # value-keyed delta sum: out = remap[0] + sum_k [sidx >= k]*delta_k
        # — no gather and no bounds dependence in the n-scale expression
        deltas = remap[1:] - remap[:-1]                     # (ncdfs-1,)
        ge = (sidx[None, :] >= ids[1:, None]).astype(jnp.int32)
        return remap[0] + jnp.sum(deltas[:, None] * ge, axis=0)

    sidx_in = jnp.sort(idx_dev)
    a = np.asarray(remap_gather(sidx_in))
    b = np.asarray(remap_positional(sidx_in))
    c = np.asarray(remap_valuekeyed(sidx_in))
    assert np.array_equal(a, b), "remap variants disagree"
    assert np.array_equal(a, c), "value-keyed remap disagrees"
    t_g = burst(lambda: remap_gather(sidx_in), sync_last)
    t_p = burst(lambda: remap_positional(sidx_in), sync_last)
    t_v = burst(lambda: remap_valuekeyed(sidx_in), sync_last)
    print(f"remap gather:              {t_g*1e3:7.1f} ms", flush=True)
    print(f"remap positional:          {t_p*1e3:7.1f} ms", flush=True)
    print(f"remap value-keyed:         {t_v*1e3:7.1f} ms", flush=True)

    # full path reference (includes H2D upload + header parse + sync RTT)
    def full():
        o = coder.decode_to_device(data, idx_dev)
        jax.device_get(o[:8])

    full()
    ts = []
    for _ in range(5):
        t0 = time.time()
        full()
        ts.append(time.time() - t0)
    print(f"full decode_to_device:     {np.median(ts)*1e3:7.1f} ms "
          f"(incl. upload + sync)", flush=True)

    # lane-count scaling: K=16384 halves the kernel's step count for
    # ~+1.2% container rate (per-lane state header)
    coder16 = LaneCoder(table, num_lanes=16384)
    data16 = coder16.encode_from_device(sym_dev, idx_dev)
    out16 = coder16.decode_to_device(data16, idx_dev)
    assert np.array_equal(np.asarray(out16), sym)

    def full16():
        o = coder16.decode_to_device(data16, idx_dev)
        jax.device_get(o[:8])

    full16()
    ts = []
    for _ in range(5):
        t0 = time.time()
        full16()
        ts.append(time.time() - t0)
    print(f"full decode K=16384:       {np.median(ts)*1e3:7.1f} ms "
          f"(bytes {len(data16)} vs {len(data)})", flush=True)


if __name__ == "__main__":
    main()
