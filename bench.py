"""Benchmark: 268v ERA5 encode+decode roundtrip throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's published per-sample GPU latency (VIVT eval,
/root/reference/cra5/models/compressai/utils/plot/VIVT-69.json:60-72:
encode 0.0983-0.1002 s + decode 0.0343-0.0350 s => ~7.5 roundtrips/s).
The metric here is full 268v compress -> bytes -> decompress roundtrips
per second (model forward + entropy coding, host<->device included).
"""

import json
import os
import sys
import time

import numpy as np


def _t(label, t0):
    print(f"[bench] {label}: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    return time.time()


def main():
    import jax

    # persistent compile cache: the 268v towers take minutes to compile cold
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from cra5_tpu.models import VAEformer, VAEformerCodec, vaeformer_268

    warmup = int(os.environ.get("BENCH_WARMUP", "1"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    batch = int(os.environ.get("BENCH_BATCH", "1"))  # batched 24h-style encode
    dtype = jnp.bfloat16 if os.environ.get("BENCH_BF16", "1") == "1" else jnp.float32

    # warm the device->host data plane concurrently with the init compile:
    # the first D2H on a tunneled backend pays a one-time ~150s setup that
    # otherwise lands in the CDF-table phase
    import threading

    threading.Thread(
        target=lambda: jax.device_get(jnp.zeros(8)), daemon=True
    ).start()

    cfg = vaeformer_268()
    model = VAEformer(cfg, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, cfg.in_chans, *cfg.img_size), jnp.float32)
    t0 = time.time()
    variables = jax.jit(model.init)(rng, x)
    jax.block_until_ready(variables)
    init_s = time.time() - t0
    t0 = _t("init", t0)

    codec = VAEformerCodec(model, variables, coder=os.environ.get("BENCH_CODER", "v2"))
    codec.update()
    t0 = _t("cdf tables", t0)

    # warmup (compilation)
    warmup_start = time.time()
    for i in range(warmup):
        out = codec.compress(x)
        t0 = _t(f"warmup compress {i}", t0)
        dec = codec.decompress(out["strings"], out["z_shape"])
        jax.block_until_ready(dec["x_hat"])
        t0 = _t(f"warmup decompress {i}", t0)
    compile_s = time.time() - warmup_start

    times, enc_times, dec_times = [], [], []
    nbytes = 0
    for _ in range(iters):
        t0 = time.time()
        out = codec.compress(x)
        t1 = time.time()
        dec = codec.decompress(out["strings"], out["z_shape"])
        jax.block_until_ready(dec["x_hat"])
        t2 = time.time()
        times.append(t2 - t0)
        enc_times.append(t1 - t0)
        dec_times.append(t2 - t1)
        nbytes = sum(len(s[0]) for s in (out["strings"][0], out["strings"][1]))

    # median: robust to warm-in/compile-tail and tunnel jitter
    mean_t = float(np.median(times))
    throughput = batch / mean_t  # per-sample roundtrips/s
    baseline = 1.0 / (0.0983 + 0.0343)  # reference GPU roundtrips/sec
    result = {
        "metric": "era5_268v_roundtrips_per_sec_per_chip",
        "value": round(throughput, 4),
        "unit": "roundtrips/s",
        "vs_baseline": round(throughput / baseline, 4),
    }
    print(json.dumps(result))
    print(
        json.dumps(
            {
                "detail": {
                    "mean_roundtrip_s": round(mean_t, 4),
                    "mean_encode_s": round(float(np.mean(enc_times)), 4),
                    "mean_decode_s": round(float(np.mean(dec_times)), 4),
                    "batch": batch,
                    "per_iter_s": [round(t, 4) for t in times],
                    "bin_bytes": nbytes,
                    "bpp_721x1440": round(8 * nbytes / (721 * 1440), 4),
                    "init_s": round(init_s, 1),
                    "warmup_s": round(compile_s, 1),
                    "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
                    "backend": jax.default_backend(),
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
