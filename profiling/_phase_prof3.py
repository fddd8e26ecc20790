"""Round-3 per-phase profile of the 268v roundtrip, measured with
device_get syncs (block_until_ready does not synchronize under this
tunneled runtime — round-2's profiler overstated nothing only by luck).
Each phase chain is timed cumulatively and differenced, which cancels
the per-measurement sync RTT. Also A/Bs the y-decode with sorted lanes
off/on inside one process."""
import os, sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
import jax.numpy as jnp
import threading

from cra5_tpu.models import VAEformer, VAEformerCodec, vaeformer_268
from cra5_tpu.coder.rans_pallas import set_sorted_lanes

threading.Thread(target=lambda: jax.device_get(jnp.zeros(8)), daemon=True).start()

cfg = vaeformer_268()
model = VAEformer(cfg, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (1, cfg.in_chans, *cfg.img_size), jnp.float32)
variables = jax.jit(model.init)(rng, x)
jax.device_get(jax.tree_util.tree_leaves(variables)[0][..., :1])
print("init done", flush=True)

if os.environ.get("CAL", "0") == "1":  # entropy-side calibration first
    from cra5_tpu.train import calibrate_entropy_cached

    lat = jax.jit(lambda v, xi: model.apply(v, xi, method=VAEformer.encode_latent))(
        variables, x
    )
    variables = calibrate_entropy_cached(
        model, variables, [lat, lat], cache_dir=None, steps=600
    )
    print("calibrated", flush=True)


def sync(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    jax.device_get(leaf.reshape(-1)[:4])


def med(f, n=5):
    f()
    ts = []
    for _ in range(n):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    return float(np.median(ts))


def profile(tag):
    codec = VAEformerCodec(model, variables, coder="v2")
    codec.update()
    xd = jnp.asarray(x)

    out = codec._encode_symbols(codec.variables, xd, codec._scale_table_dev)
    z_sym, gc_idx, y_sym = out["z_sym"], out["gc_idx"], out["y_sym"]
    B, C = z_sym.shape[:2]
    z_idx = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.int32)[None, :, None, None], z_sym.shape
    )

    t_fwd = med(lambda: sync(codec._encode_symbols(codec.variables, xd, codec._scale_table_dev)))

    def chain_scans():
        o = codec._encode_symbols(codec.variables, xd, codec._scale_table_dev)
        h = codec._eb_coder.encode_dispatch_batch(o["z_sym"], z_idx) + \
            codec._gc_coder.encode_dispatch_batch(o["y_sym"], o["gc_idx"])
        sync(h[-1][6])
        return h

    t_fwd_scans = med(chain_scans)

    def chain_fin():
        o = codec._encode_symbols(codec.variables, xd, codec._scale_table_dev)
        h = codec._eb_coder.encode_dispatch_batch(o["z_sym"], z_idx) + \
            codec._gc_coder.encode_dispatch_batch(o["y_sym"], o["gc_idx"])
        return codec._eb_coder.encode_finalize_many(h)

    t_encode_full = med(chain_fin)
    streams = chain_fin()
    z_strings, y_strings = streams[:B], streams[B:]

    def chain_z():
        zs = codec._eb_coder.decode_batch_to_device(
            list(z_strings), z_idx, row_plan=z_sym.shape[2] * z_sym.shape[3]
        )
        sync(zs)
        return zs

    t_z = med(chain_z)
    z_dec = chain_z()

    def chain_hyper():
        hz = codec._scales_from_z(codec.variables, z_dec, codec._scale_table_dev)
        sync(hz["gc_idx"])
        return hz

    t_hyper = med(chain_hyper)
    hz = chain_hyper()

    def chain_y():
        ys = codec._gc_coder.decode_batch_to_device(list(y_strings), hz["gc_idx"])
        sync(ys)
        return ys

    t_y = med(chain_y)
    y_dec = chain_y()
    ok = bool(jnp.array_equal(y_dec, y_sym))

    def chain_rec():
        xh = codec._reconstruct(codec.variables, y_dec, hz["means"])
        sync(xh)

    t_rec = med(chain_rec)

    print(
        f"[{tag}] fwd {t_fwd*1e3:.0f}ms | fwd+scans {t_fwd_scans*1e3:.0f} "
        f"(scans ~{(t_fwd_scans-t_fwd)*1e3:.0f}) | encode-full {t_encode_full*1e3:.0f} "
        f"(finalize ~{(t_encode_full-t_fwd_scans)*1e3:.0f}) | z {t_z*1e3:.0f} | "
        f"hyper {t_hyper*1e3:.0f} | y {t_y*1e3:.0f} (roundtrip-exact={ok}) | "
        f"g_s {t_rec*1e3:.0f}",
        flush=True,
    )


set_sorted_lanes("off")
profile("sorted-off")
set_sorted_lanes("auto")
profile("sorted-on ")
