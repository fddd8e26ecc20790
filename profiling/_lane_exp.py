"""Lane-count sweep for the y-stream (2.65M symbols) scans on TPU."""
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from cra5_tpu.coder.rans_tpu import LaneCoder
from cra5_tpu.entropy import gc_update, get_scale_table

table = gc_update(get_scale_table())
rng = np.random.default_rng(0)
n = 2_654_208
sym = rng.normal(0, 30, n).round().astype(np.int32)
idx = rng.integers(0, table.num_indexes, n).astype(np.int32)
sym_d = jnp.asarray(sym.reshape(1, -1))
idx_d = jnp.asarray(idx.reshape(1, -1))

def med(f, k=5):
    f()
    ts = []
    for _ in range(k):
        t0 = time.time(); f(); ts.append(time.time() - t0)
    return float(np.median(ts))

for K in (4096, 8192, 16384, 32768):
    coder = LaneCoder(table, num_lanes=K)

    def enc():
        h = coder.encode_dispatch(sym_d[0], idx_d[0])
        jax.block_until_ready(h[3:])
        return h

    t_enc = med(enc)
    data = coder.encode_finalize_many([enc()])[0]

    def dec():
        out = coder.decode_to_device(data, idx_d[0])
        jax.block_until_ready(out)

    t_dec = med(dec)
    print(f"K={K:6d} M={-(-n//K):4d}: enc_scan {t_enc:.3f}s  dec(H2D+scan) {t_dec:.3f}s  bytes {len(data)}", flush=True)
