"""Is the calibrated 268v y-stream kernel-safe (v2 header bit 30)?
Also prints the scale-bucket histogram of gc indexes to size a
generalized R-row kernel window bound."""
import os, sys, struct

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
import jax.numpy as jnp
import threading

from cra5_tpu.models import VAEformer, VAEformerCodec, vaeformer_268
from cra5_tpu.train import calibrate_entropy_cached

threading.Thread(target=lambda: jax.device_get(jnp.zeros(8)), daemon=True).start()

cfg = vaeformer_268()
model = VAEformer(cfg, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (1, cfg.in_chans, *cfg.img_size), jnp.float32)
variables = jax.jit(model.init)(rng, x)
lat = jax.jit(lambda v, xi: model.apply(v, xi, method=VAEformer.encode_latent))(
    variables, x
)
variables = calibrate_entropy_cached(model, variables, [lat, lat], None, steps=600)
codec = VAEformerCodec(model, variables, coder="v2")
codec.update()
out = codec.compress(x)
for tag, s in zip(("a", "b"), (out["strings"][0][0], out["strings"][1][0])):
    magic, n, K, n_esc, n_words = struct.unpack_from("<IIIII", s, 0)
    print(
        f"{tag}: n={n} K={K & ~(3 << 30)} sorted={bool(K & (1 << 31))}"
        f" kernel_safe={bool(K & (1 << 30))} n_words={n_words} n_esc={n_esc}",
        flush=True,
    )

o = codec._encode_symbols(codec.variables, jnp.asarray(x), codec._scale_table_dev)
gi = np.asarray(o["gc_idx"]).ravel()
binc = np.bincount(gi, minlength=64)
nz = np.nonzero(binc)[0]
print("gc bucket histogram (idx: count):", {int(i): int(binc[i]) for i in nz}, flush=True)
K = 8192
srt = np.sort(gi)
M = -(-srt.size // K)
pad = M * K - srt.size
if pad:
    srt = np.concatenate([srt, np.full(pad, srt[-1], srt.dtype)])
g = srt.reshape(M, K)
trans = (g[:, 1:] != g[:, :-1]).sum(axis=1)
print(
    f"windows M={M}: max transitions/window={int(trans.max())},"
    f" #windows with >1={int((trans > 1).sum())}, >3={int((trans > 3).sum())}",
    flush=True,
)
