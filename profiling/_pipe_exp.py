"""Experiment: sequential vs threaded-pipelined 268v roundtrips."""
import os, sys, time, threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from cra5_tpu.models import VAEformer, VAEformerCodec, vaeformer_268

threading.Thread(target=lambda: jax.device_get(jnp.zeros(8)), daemon=True).start()

cfg = vaeformer_268()
model = VAEformer(cfg, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (1, cfg.in_chans, *cfg.img_size), jnp.float32)
t0 = time.time()
variables = jax.jit(model.init)(rng, x)
jax.block_until_ready(variables)
print(f"init {time.time()-t0:.1f}s", flush=True)
codec = VAEformerCodec(model, variables, coder="v2")
codec.update()

def roundtrip(xi):
    out = codec.compress(xi)
    dec = codec.decompress(out["strings"], out["z_shape"])
    jax.block_until_ready(dec["x_hat"])
    return sum(len(s[0]) for s in (out["strings"][0], out["strings"][1]))

# warm compile
t0 = time.time()
roundtrip(x)
print(f"warmup {time.time()-t0:.1f}s", flush=True)

# sequential
N = 6
t0 = time.time()
for _ in range(N):
    roundtrip(x)
seq = (time.time() - t0) / N
print(f"sequential: {seq:.3f} s/rt -> {1/seq:.3f} rps", flush=True)

# threaded pipelines
for C in (2, 3, 4):
    pool = ThreadPoolExecutor(C)
    # warm any thread-local paths
    list(pool.map(roundtrip, [x] * C))
    t0 = time.time()
    M = 10
    list(pool.map(roundtrip, [x] * M))
    tt = (time.time() - t0) / M
    print(f"threads={C}: {tt:.3f} s/rt -> {1/tt:.3f} rps", flush=True)
    pool.shutdown()
