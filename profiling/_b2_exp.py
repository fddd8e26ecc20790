"""Batch-2/3 roundtrips x 2 threads."""
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
x1 = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.in_chans, *cfg.img_size), jnp.float32)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), x1)
jax.block_until_ready(variables)
codec = VAEformerCodec(model, variables, coder="v2")
codec.update()
print("init done", flush=True)

def roundtrip(xi):
    out = codec.compress(xi)
    dec = codec.decompress(out["strings"], out["z_shape"])
    jax.block_until_ready(dec["x_hat"])

for B in (2, 3):
    xb = jax.random.normal(jax.random.PRNGKey(B), (B, cfg.in_chans, *cfg.img_size), jnp.bfloat16)
    t0 = time.time(); roundtrip(xb); print(f"B={B} warm {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(4):
        t0 = time.time(); roundtrip(xb); ts.append(time.time() - t0)
    seq = float(np.median(ts))
    print(f"B={B}: seq {seq:.3f}s -> {B/seq:.3f} rps/sample", flush=True)
    pool = ThreadPoolExecutor(2)
    list(pool.map(roundtrip, [xb] * 2))
    for _ in range(2):
        t0 = time.time()
        list(pool.map(roundtrip, [xb] * 6))
        print(f"B={B}: thr2 {B*6/(time.time()-t0):.3f} rps/sample", flush=True)
    pool.shutdown()
