"""Which part of the decode scan step dominates? Time ablated variants."""
import functools
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
import jax.numpy as jnp

from cra5_tpu.coder import rans_tpu as rt
from cra5_tpu.entropy import gc_update, get_scale_table

PRECISION = rt.PRECISION
_LANE_L = rt._LANE_L

table = gc_update(get_scale_table())
coder = rt.LaneCoder(table)
rng = np.random.default_rng(0)
n = 2_654_208
# clustered indexes like a trained model's (few distinct scale rows)
idx = rng.integers(8, 16, n).astype(np.int32)
sym = rng.normal(0, 3, n).round().astype(np.int32)
data = coder.encode(sym, idx)
magic, hn, hK, n_esc, n_words = __import__("struct").unpack_from("<IIIII", data, 0)
K = hK
M = -(-n // K)
print(f"n_words={n_words} n_esc={n_esc} K={hK}", flush=True)
off = 20
states = jnp.asarray(np.frombuffer(data, "<u4", hK, off).copy())
stream = jnp.asarray(np.frombuffer(data, "<u2", n_words, off + 4 * hK).copy().astype(np.uint16))
idx_p = jnp.asarray(idx.reshape(M, K))

cdf_flat = coder._cdf_flat
sym_lut = coder._decode_lut()
max_values = coder._max_values
offsets = coder._offsets
max_len = coder._max_len


def make_scan(use_lut, use_cumsum, use_stream_gather, unroll=1):
    @functools.partial(jax.jit, static_argnames=())
    def run(indexes, states, stream):
        def step(carry, idx):
            x, ptr = carry
            cum = (x & 0xFFFF).astype(jnp.int32)
            row0 = idx * max_len
            if use_lut:
                s = sym_lut[(idx << PRECISION) + cum].astype(jnp.int32)
            else:
                s = jnp.clip(cum >> 10, 0, 40)
            start = cdf_flat[row0 + s]
            freq = (cdf_flat[row0 + s + 1] - start).astype(jnp.uint32)
            x = freq * (x >> PRECISION) + cum.astype(jnp.uint32) - start.astype(jnp.uint32)
            refill = x < _LANE_L
            if use_cumsum:
                ranks = jnp.cumsum(refill.astype(jnp.int32)) - refill.astype(jnp.int32)
            else:
                ranks = jnp.arange(refill.shape[0], dtype=jnp.int32)
            pos = ptr + ranks
            if use_stream_gather:
                w = stream[jnp.clip(pos, 0, stream.shape[0] - 1)].astype(jnp.uint32)
            else:
                w = (pos.astype(jnp.uint32) & 0xFFFF)
            x = jnp.where(refill, (x << PRECISION) | w, x)
            ptr = ptr + jnp.sum(refill.astype(jnp.int32))
            return (x, ptr), s
        (_, _), out = jax.lax.scan(
            step, (states, jnp.int32(0)), indexes, length=indexes.shape[0],
            unroll=unroll,
        )
        return out
    return run

def med(f, k=5):
    f()
    ts = []
    for _ in range(k):
        t0 = time.time(); jax.block_until_ready(f()); ts.append(time.time() - t0)
    return float(np.median(ts))

for unroll in (1, 2, 4, 8, 16):
    f = make_scan(True, True, True, unroll)
    print(f"full unroll={unroll:2d}: {med(lambda: f(idx_p, states, stream)):.3f}s", flush=True)
