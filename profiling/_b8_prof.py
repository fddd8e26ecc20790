"""Phase profile of the batch-8 268v encode (BENCH config 3)."""
import time
import threading
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

B = 8
xb = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.in_chans, *cfg.img_size), jnp.bfloat16)

def med(f, n=3):
    f()
    ts = []
    for _ in range(n):
        t0 = time.time(); f(); ts.append(time.time() - t0)
    return float(np.median(ts))

def p_fwd():
    o = codec._encode_symbols(codec.variables, xb, codec._scale_table_dev)
    jax.block_until_ready(o)
    return o
print("B8 enc fwd: %.3f" % med(p_fwd), flush=True)
out = p_fwd()

z_sym, gc_idx = out["z_sym"], out["gc_idx"]
C = z_sym.shape[1]
z_idx = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None, :, None, None], z_sym.shape)

def p_scans():
    h = codec._eb_coder.encode_dispatch_batch(z_sym, z_idx) + \
        codec._gc_coder.encode_dispatch_batch(out["y_sym"], gc_idx)
    jax.block_until_ready([t for hh in h for t in hh[3:]])
    return h
print("B8 scans (vmapped): %.3f" % med(p_scans), flush=True)
handles = p_scans()

def p_fin():
    return codec._eb_coder.encode_finalize_many(handles)
print("B8 finalize: %.3f" % med(p_fin), flush=True)

# per-sample dispatch comparison (the CPU-style path)
def p_scans_seq():
    h = [codec._eb_coder.encode_dispatch(z_sym[b], z_idx[b]) for b in range(B)] + \
        [codec._gc_coder.encode_dispatch(out["y_sym"][b], gc_idx[b]) for b in range(B)]
    jax.block_until_ready([t for hh in h for t in hh[3:]])
    return h
print("B8 scans (8x per-sample): %.3f" % med(p_scans_seq), flush=True)
