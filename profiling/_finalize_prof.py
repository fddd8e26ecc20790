"""What does encode-finalize actually pay for at 268v random-init?
Stream composition (words vs escapes) + timed sub-phases of finalize."""
import sys, time, struct

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
import jax.numpy as jnp
import threading

from cra5_tpu.models import VAEformer, VAEformerCodec, vaeformer_268

threading.Thread(target=lambda: jax.device_get(jnp.zeros(8)), daemon=True).start()

cfg = vaeformer_268()
model = VAEformer(cfg, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (1, cfg.in_chans, *cfg.img_size), jnp.float32)
variables = jax.jit(model.init)(rng, x)
jax.device_get(jax.tree_util.tree_leaves(variables)[0][..., :1])
print("init done", flush=True)

codec = VAEformerCodec(model, variables, coder="v2")
codec.update()
out = codec.compress(x)
z_strings, y_strings = out["strings"]
for tag, s in [("z", z_strings[0]), ("y", y_strings[0])]:
    magic, n, K, n_esc, n_words = struct.unpack_from("<IIIII", s, 0)
    K &= ~(3 << 30)
    print(
        f"{tag}: total {len(s)/1e6:.3f} MB | n={n} K={K} n_words={n_words}"
        f" ({2*n_words/1e6:.3f} MB) n_esc={n_esc}"
        f" (varint {(len(s)-20-4*K-2*n_words)/1e6:.3f} MB, raw i32"
        f" {4*n_esc/1e6:.3f} MB fetched)",
        flush=True,
    )

# timed finalize sub-phases (hint warm): dispatch once, then measure
xd = jnp.asarray(x)
o = codec._encode_symbols(codec.variables, xd, codec._scale_table_dev)
z_sym, gc_idx, y_sym = o["z_sym"], o["gc_idx"], o["y_sym"]
B, C = z_sym.shape[:2]
z_idx = jnp.broadcast_to(
    jnp.arange(C, dtype=jnp.int32)[None, :, None, None], z_sym.shape
)

def dispatch():
    return codec._eb_coder.encode_dispatch_batch(z_sym, z_idx) + \
        codec._gc_coder.encode_dispatch_batch(y_sym, gc_idx)

from cra5_tpu.coder.rans_tpu import LaneCoder, _slicer, _bucket, _zigzag_varint_encode

for trial in range(3):
    h = dispatch()
    jax.device_get(h[-1][6])  # wait for device work: counts ready
    t0 = time.time()
    live = [(i, hh) for i, hh in enumerate(h) if hh is not None]
    hints = [hh[10]._bucket_hint.get((hh[0], hh[1])) for _, hh in live]
    assert all(hints), "hints cold"
    slice_wl = lambda hh, w, e: (
        hh[3], _slicer(min(w, hh[2] * hh[1]))(hh[4]), _slicer(min(e, hh[2] * hh[1]))(hh[5])
    )
    sliced = [slice_wl(hh, hw, he) for (_, hh), (hw, he) in zip(live, hints)]
    t1 = time.time()
    counts, bufs = jax.device_get((
        tuple((hh[6], hh[7], hh[8]) for _, hh in live), tuple(sliced)
    ))
    t2 = time.time()
    parts = []
    for (pos, hh), (nw, ne, safe), (states, stream, escs) in zip(live, counts, bufs):
        stream = np.asarray(stream[: int(nw)], np.uint16)
        esc_val = np.asarray(escs[: int(ne)], np.int32)
        parts.append(
            np.asarray(states, np.uint32).astype("<u4").tobytes()
            + stream.astype("<u2").tobytes()
            + _zigzag_varint_encode(esc_val)
        )
    t3 = time.time()
    tot_fetch = sum(4 * 3 + s.size * 2 + e.size * 4 for (_, s, e) in sliced)
    print(
        f"[trial {trial}] slice-dispatch {1e3*(t1-t0):.0f}ms | device_get"
        f" {1e3*(t2-t1):.0f}ms ({tot_fetch/1e6:.2f} MB =>"
        f" {tot_fetch/1e6/max(t2-t1,1e-9):.0f} MB/s) | host-assembly"
        f" {1e3*(t3-t2):.0f}ms",
        flush=True,
    )
