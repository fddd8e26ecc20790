"""cProfile the host side of a few roundtrips to find GIL-bound work."""
import cProfile
import io
import pstats
import threading
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from cra5_tpu.models import VAEformer, VAEformerCodec, vaeformer_268

threading.Thread(target=lambda: jax.device_get(jnp.zeros(8)), daemon=True).start()
cfg = vaeformer_268()
model = VAEformer(cfg, dtype=jnp.bfloat16)
x = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.in_chans, *cfg.img_size), jnp.float32)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
jax.block_until_ready(variables)
codec = VAEformerCodec(model, variables, coder="v2")
codec.update()

def roundtrip():
    out = codec.compress(x)
    dec = codec.decompress(out["strings"], out["z_shape"])
    jax.block_until_ready(dec["x_hat"])

roundtrip(); roundtrip()  # warm

pr = cProfile.Profile()
pr.enable()
for _ in range(5):
    roundtrip()
pr.disable()
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(30)
print(s.getvalue()[:6000])
