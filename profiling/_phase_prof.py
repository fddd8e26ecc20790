"""Per-phase profile of the 268v roundtrip on the real chip."""
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import threading

from cra5_tpu.models import VAEformer, VAEformerCodec, vaeformer_268

threading.Thread(target=lambda: jax.device_get(jnp.zeros(8)), daemon=True).start()

cfg = vaeformer_268()
model = VAEformer(cfg, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (1, cfg.in_chans, *cfg.img_size), jnp.float32)
variables = jax.jit(model.init)(rng, x)
jax.block_until_ready(variables)
print("init done", flush=True)
codec = VAEformerCodec(model, variables, coder="v2")
codec.update()

def med(f, n=5):
    f()  # warm/compile
    ts = []
    for _ in range(n):
        t0 = time.time(); f(); ts.append(time.time() - t0)
    return float(np.median(ts))

xd = jnp.asarray(x)

# -- encode phases --
out = codec._encode_symbols(codec.variables, xd, codec._scale_table_dev)
jax.block_until_ready(out)

def p_fwd():
    o = codec._encode_symbols(codec.variables, xd, codec._scale_table_dev)
    jax.block_until_ready(o)
print("enc fwd (encode_symbols+gc_idx): %.3f" % med(p_fwd), flush=True)

z_sym, gc_idx, y_sym = out["z_sym"], out["gc_idx"], out["y_sym"]
B, C = z_sym.shape[:2]
z_idx = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None, :, None, None], z_sym.shape)

def p_scans():
    h = codec._eb_coder.encode_dispatch_batch(z_sym, z_idx) + \
        codec._gc_coder.encode_dispatch_batch(y_sym, gc_idx)
    jax.block_until_ready([t for hh in h for t in hh[3:]])
    return h
print("enc scans (z+y dispatch, synced): %.3f" % med(p_scans), flush=True)

handles = p_scans()

def p_fin():
    return codec._eb_coder.encode_finalize_many(handles)
print("enc finalize (counts+D2H+container): %.3f" % med(p_fin), flush=True)

streams = p_fin()
z_strings, y_strings = streams[:B], streams[B:]
print("bytes z=%d y=%d" % (len(z_strings[0]), len(y_strings[0])), flush=True)
# container composition
import struct
for name, s in (("z", z_strings[0]), ("y", y_strings[0])):
    magic, n, K, n_esc, n_words = struct.unpack_from("<IIIII", s, 0)
    print(f"  {name}: n={n} K={K} n_esc={n_esc} n_words={n_words} "
          f"state_bytes={4*K} word_bytes={2*n_words} esc_bytes={len(s)-20-4*K-2*n_words}",
          flush=True)

# -- decode phases --
full_z = z_sym.shape
z_idx_dev = z_idx

def p_zdec():
    zs = codec._eb_coder.decode_batch_to_device(list(z_strings), z_idx_dev)
    jax.block_until_ready(zs)
    return zs
print("dec z (H2D+scan): %.3f" % med(p_zdec), flush=True)
z_dec = p_zdec()

def p_hyper():
    hz = codec._scales_from_z(codec.variables, z_dec, codec._scale_table_dev)
    jax.block_until_ready(hz)
    return hz
print("dec hyper (h_s): %.3f" % med(p_hyper), flush=True)
hz = p_hyper()

def p_ydec():
    ys = codec._gc_coder.decode_batch_to_device(list(y_strings), hz["gc_idx"])
    jax.block_until_ready(ys)
    return ys
print("dec y (H2D+scan): %.3f" % med(p_ydec), flush=True)
y_dec = p_ydec()

def p_rec():
    xh = codec._reconstruct(codec.variables, y_dec, hz["means"])
    jax.block_until_ready(xh)
print("dec reconstruct (g_s): %.3f" % med(p_rec), flush=True)
