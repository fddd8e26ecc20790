"""A/B the encode-path stream/escape compaction: cumsum+scatter (current)
vs a single stable 2-operand sort. Chained+differenced device_get timing
(block_until_ready does not sync on this runtime)."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
import jax.numpy as jnp

M, K = 324, 8192
NK = M * K
rng = np.random.default_rng(0)
emit_np = (rng.random(NK) < 0.55)
words_np = rng.integers(0, 1 << 16, NK).astype(np.uint16)

emit = jnp.asarray(emit_np)
words = jnp.asarray(words_np)


@jax.jit
def compact_scatter(emit_flat, w):
    n_words = jnp.sum(emit_flat.astype(jnp.int32))
    word_pos = jnp.cumsum(emit_flat.astype(jnp.int32)) - 1
    buf = jnp.zeros(NK, jnp.uint16)
    buf = buf.at[jnp.where(emit_flat, word_pos, NK)].set(w, mode="drop")
    return buf, n_words


@jax.jit
def compact_sort(emit_flat, w):
    n_words = jnp.sum(emit_flat.astype(jnp.int32))
    iota = jnp.arange(NK, dtype=jnp.int32)
    key = jnp.where(emit_flat, iota, iota + NK)
    _, buf = jax.lax.sort((key, w), num_keys=1)
    return buf, n_words


def timed(f, reps=24):
    b, n = f(emit, words)
    jax.device_get(b[:1])
    t0 = time.time()
    outs = []
    for _ in range(reps):
        b, n = f(emit, words)
        outs.append(b)
    jax.device_get(outs[-1][:1])
    # chain isn't data-dependent across reps; rely on queue serialization
    return (time.time() - t0) / reps


b1, n1 = compact_scatter(emit, words)
b2, n2 = compact_sort(emit, words)
assert int(n1) == int(n2)
nv = int(n1)
assert np.array_equal(np.asarray(b1[:nv]), np.asarray(b2[:nv])), "mismatch"
print("equal on", nv, "words", flush=True)

for name, f in [("scatter", compact_scatter), ("sort", compact_sort)]:
    ts = [timed(f) for _ in range(3)]
    print(f"{name}: {1e3*np.median(ts):.2f} ms (runs {[round(1e3*t,2) for t in ts]})", flush=True)
