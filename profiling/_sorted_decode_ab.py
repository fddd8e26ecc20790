"""A/B the y-stream decode: sorted gather-free kernel vs the unsorted
packed-LUT lax.scan, at the production shape (2.65M symbols, K=8192,
GC table). Chained dependent dispatches + one device_get per timing
(block_until_ready does not synchronize under this runtime)."""
import sys, time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

from cra5_tpu.coder.rans_pallas import set_sorted_lanes
from cra5_tpu.coder.rans_tpu import LaneCoder, _parse_v2_header
from cra5_tpu.entropy import gc_update, get_scale_table


def timed(fn, reps=6):
    fn()  # warm
    t0 = time.time()
    for _ in range(reps):
        fn()
    return (time.time() - t0) / reps


def main():
    table = gc_update(get_scale_table())
    rng = np.random.default_rng(0)
    n, K = 2_654_208, 8192
    # bench-like stream: single index bucket 0, ~25% escapes
    idx = np.zeros(n, np.int32)
    mv = int(table.cdf_length[0] - 2)
    sym = (rng.integers(0, mv, n) + table.offset[0]).astype(np.int32)
    esc = rng.random(n) < 0.25
    sym = np.where(esc, sym + rng.integers(-3000, 3000, n), sym).astype(np.int32)
    idx_dev = jnp.asarray(idx)

    # also a trained-like multi-bucket stream (16 dense buckets)
    idx2 = np.sort(rng.integers(0, 16, n)).astype(np.int32)
    mv2 = table.cdf_length[idx2] - 2
    sym2 = ((rng.random(n) * mv2).astype(np.int32) + table.offset[idx2]).astype(np.int32)
    idx2_dev = jnp.asarray(idx2)

    for name, mode in (("unsorted-scan", "off"), ("sorted-kernel", "on")):
        set_sorted_lanes(mode)
        coder = LaneCoder(table, num_lanes=K)
        t_enc = timed(lambda: coder.encode_from_device(jnp.asarray(sym), idx_dev))
        data = coder.encode_from_device(jnp.asarray(sym), idx_dev)
        h = _parse_v2_header(data)
        print(f"{name:14s} idx0-stream: encode {t_enc*1e3:7.1f} ms", flush=True)
        out = coder.decode_to_device(data, idx_dev)
        assert np.array_equal(np.asarray(out), sym), name

        def dec():
            o = coder.decode_to_device(data, idx_dev)
            jax.device_get(o[:8])

        t_dec = timed(dec)
        print(f"{name:14s} idx0-stream: encode {t_enc*1e3:7.1f} ms  "
              f"decode {t_dec*1e3:7.1f} ms  sorted={h[4]} safe={h[5]} "
              f"words={h[3]}", flush=True)

        data2 = coder.encode_from_device(jnp.asarray(sym2), idx2_dev)
        h2 = _parse_v2_header(data2)
        out2 = coder.decode_to_device(data2, idx2_dev)
        assert np.array_equal(np.asarray(out2), sym2), name

        def dec2():
            o = coder.decode_to_device(data2, idx2_dev)
            jax.device_get(o[:8])

        t_dec2 = timed(dec2)
        print(f"{name:14s} 16-bucket  : decode {t_dec2*1e3:7.1f} ms "
              f"sorted={h2[4]} safe={h2[5]}", flush=True)
    set_sorted_lanes("auto")


if __name__ == "__main__":
    main()
