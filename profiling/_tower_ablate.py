"""Decompose the 268v encoder-tower forward: time ViTEncoder at full
geometry with the normal every-4th-global cycle vs interval=999 (all
windowed). The difference is ~6 x (global-block - window-block) cost,
i.e. the global-attention share of the tower — the number that decides
whether a faster attention kernel layout is worth building."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
import jax.numpy as jnp
import threading

from cra5_tpu.nn.vit import ViTEncoder

threading.Thread(target=lambda: jax.device_get(jnp.zeros(8)), daemon=True).start()

kw = dict(
    img_size=(721, 1440), patch_size=(10, 10), patch_stride=(10, 10),
    in_chans=268, embed_dim=1024, depth=24, num_heads=16,
    dtype=jnp.bfloat16,
)
x = jax.random.normal(jax.random.PRNGKey(0), (1, 268, 721, 1440), jnp.float32)

for tag, extra in (
    ("normal(6 global)", {}),
    ("all-window", {"interval": 999}),
    ("all-global", {"window": False}),
):
    model = ViTEncoder(**kw, **extra)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    f = jax.jit(lambda v, x: model.apply(v, x))
    out = f(v, x)
    jax.device_get(out.reshape(-1)[:1])
    ts = []
    for _ in range(5):
        t0 = time.time()
        out = f(v, x)
        jax.device_get(out.reshape(-1)[:1])
        ts.append(time.time() - t0)
    print(f"{tag}: {np.median(ts)*1e3:.0f} ms", flush=True)
    del v
