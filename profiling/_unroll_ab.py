"""Sweep the Pallas rANS kernel unroll factor (U scan steps per grid
iteration) at the production y-stream shape, plus the rowplan z-shape.
Chained dependent dispatches + one device_get per timing
(block_until_ready does not synchronize under this runtime)."""
import sys, time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

from cra5_tpu.coder.rans_pallas import set_sorted_lanes, set_sorted_unroll
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
    set_sorted_lanes("on")

    # trained-like y-stream: 16 dense buckets, few escapes
    idx = np.sort(rng.integers(0, 16, n)).astype(np.int32)
    mv = table.cdf_length[idx] - 2
    sym = ((rng.random(n) * mv).astype(np.int32) + table.offset[idx]).astype(
        np.int32
    )
    idx_dev = jnp.asarray(idx)
    sym_dev = jnp.asarray(sym)

    # z-stream at the real bench shape: 256 channels x 18x36 hyper-latent
    # (BASELINE.md: 165888 symbols -> default K=256 -> rowplan kernel),
    # EB-style small table (rowplan needs max_len <= 160 and K <= 512)
    from cra5_tpu.entropy.cdf import build_cdf_table

    Cz, Kz = 256, 256
    HWz = 18 * 36
    L = 40
    pm = rng.random((Cz, L)) + 0.05
    pm /= pm.sum(axis=1, keepdims=True)
    table_z = build_cdf_table(
        pm * (1 - 1e-4), np.full(Cz, 1e-4), np.full(Cz, L, np.int64), 16
    )
    table_z.offset = np.full(Cz, -L // 2, np.int32)
    idx_z = np.repeat(np.arange(Cz, dtype=np.int32), HWz)
    mvz = table_z.cdf_length[idx_z] - 2
    sym_z = ((rng.random(idx_z.size) * mvz).astype(np.int32)
             + table_z.offset[idx_z]).astype(np.int32)
    idx_z_dev = jnp.asarray(idx_z)

    for U in (1, 2, 4, 8, 16, 32):
        set_sorted_unroll(U)
        coder = LaneCoder(table, num_lanes=K)
        data = coder.encode_from_device(sym_dev, idx_dev)
        h = _parse_v2_header(data)
        assert h[4] and h[5], ("not kernel-routed", h)
        out = coder.decode_to_device(data, idx_dev)
        assert np.array_equal(np.asarray(out), sym), U

        t_enc = timed(lambda: coder.encode_from_device(sym_dev, idx_dev))

        def dec():
            o = coder.decode_to_device(data, idx_dev)
            jax.device_get(o[:8])

        t_dec = timed(dec)

        coder_z = LaneCoder(table_z, num_lanes=Kz)
        assert coder_z._rowplan_ok(Kz, HWz), "z-leg must hit the rowplan kernel"
        data_z = coder_z.encode(sym_z, idx_z)
        out_z = coder_z.decode_to_device(data_z, idx_z_dev, row_plan=HWz)
        assert np.array_equal(np.asarray(out_z), sym_z), U

        def dec_z():
            o = coder_z.decode_to_device(data_z, idx_z_dev, row_plan=HWz)
            jax.device_get(o[:8])

        t_dz = timed(dec_z)
        print(
            f"U={U:2d}  y-encode {t_enc*1e3:7.1f} ms  "
            f"y-decode {t_dec*1e3:7.1f} ms  z-rowplan-decode {t_dz*1e3:7.1f} ms",
            flush=True,
        )
    set_sorted_unroll(8)
    set_sorted_lanes("auto")


if __name__ == "__main__":
    main()
