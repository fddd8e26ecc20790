"""Per-sample roundtrip cost at batch 1/2/4: the MXU probe showed the
tower matmuls run ~30% faster per row at 2x the rows ((16384,1024)
@(1024,4096) 120 vs 93 TF/s at 10368), so batched towers should cut
per-sample device time even though the coder paths are per-sample.
True-sync phase chains (device_get), calibrated entropy side."""
import sys, time

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
x1 = jax.random.normal(rng, (1, cfg.in_chans, *cfg.img_size), jnp.float32)
variables = jax.jit(model.init)(rng, x1)
jax.device_get(jax.tree_util.tree_leaves(variables)[0][..., :1])
lat = jax.jit(lambda v, xi: model.apply(v, xi, method=VAEformer.encode_latent))(
    variables, x1
)
variables = calibrate_entropy_cached(
    model, variables, [lat, lat], cache_dir="/tmp/jax_bench_cache", steps=600
)
print("init+cal done", flush=True)


def sync(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    jax.device_get(leaf.reshape(-1)[:4])


def med(f, n=4):
    f()
    ts = []
    for _ in range(n):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    return float(np.median(ts))


for B in (1, 2, 4):
    codec = VAEformerCodec(model, variables, coder="v2")
    codec.update()
    x = jnp.asarray(np.tile(np.asarray(x1), (B, 1, 1, 1)))

    out = codec._encode_symbols(codec.variables, x, codec._scale_table_dev)
    z_sym = out["z_sym"]
    C = z_sym.shape[1]
    z_idx = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.int32)[None, :, None, None], z_sym.shape
    )

    def enc():
        o = codec._encode_symbols(codec.variables, x, codec._scale_table_dev)
        h = codec._eb_coder.encode_dispatch_batch(o["z_sym"], z_idx) + \
            codec._gc_coder.encode_dispatch_batch(o["y_sym"], o["gc_idx"])
        return codec._eb_coder.encode_finalize_many(h)

    t_enc = med(enc)
    streams = enc()
    z_strings, y_strings = streams[:B], streams[B:]

    def dec():
        zs = codec._eb_coder.decode_batch_to_device(
            list(z_strings), z_idx, row_plan=z_sym.shape[2] * z_sym.shape[3]
        )
        hz = codec._scales_from_z(codec.variables, zs, codec._scale_table_dev)
        ys = codec._gc_coder.decode_batch_to_device(list(y_strings), hz["gc_idx"])
        xh = codec._reconstruct(codec.variables, ys, hz["means"])
        sync(xh)
        return ys

    t_dec = med(dec)
    y_dec = dec()
    ok = bool(jnp.array_equal(y_dec, out["y_sym"]))
    print(
        f"B={B}: encode {t_enc*1e3:.0f}ms ({t_enc/B*1e3:.0f}/sample) | "
        f"decode {t_dec*1e3:.0f}ms ({t_dec/B*1e3:.0f}/sample) | "
        f"roundtrip {(t_enc+t_dec)/B*1e3:.0f}ms/sample | exact={ok}",
        flush=True,
    )
