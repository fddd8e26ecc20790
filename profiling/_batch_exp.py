"""Batched roundtrip throughput: batch 1/4/8, sequential and 2-thread."""
import time
import threading
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
x1 = jax.random.normal(rng, (1, cfg.in_chans, *cfg.img_size), jnp.float32)
variables = jax.jit(model.init)(rng, x1)
jax.block_until_ready(variables)
codec = VAEformerCodec(model, variables, coder="v2")
codec.update()
print("init done", flush=True)

def roundtrip(xi):
    out = codec.compress(xi)
    dec = codec.decompress(out["strings"], out["z_shape"])
    jax.block_until_ready(dec["x_hat"])
    return out

for B in (1, 4, 8):
    try:
        xb = jax.random.normal(jax.random.PRNGKey(B), (B, cfg.in_chans, *cfg.img_size), jnp.bfloat16)
        t0 = time.time()
        out = roundtrip(xb)
        print(f"B={B}: warm+compile {time.time()-t0:.1f}s", flush=True)
        ts = []
        for _ in range(4):
            t0 = time.time(); roundtrip(xb); ts.append(time.time() - t0)
        seq = float(np.median(ts))
        nb = sum(len(s[0]) for s in (out["strings"][0], out["strings"][1]))
        print(f"B={B}: seq {seq:.3f}s -> {B/seq:.3f} rps/sample  bytes/sample={nb}", flush=True)
        pool = ThreadPoolExecutor(2)
        list(pool.map(roundtrip, [xb] * 2))
        t0 = time.time()
        list(pool.map(roundtrip, [xb] * 6))
        tt = (time.time() - t0) / 6
        print(f"B={B}: thr2 {tt:.3f}s -> {B/tt:.3f} rps/sample", flush=True)
        pool.shutdown()
    except Exception as e:
        print(f"B={B}: FAILED {e!r}"[:300], flush=True)
