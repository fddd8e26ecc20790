"""Decode-only serving profiler (BASELINE config 4 phase budget).

Round-4 verdict: decode-only serving (5.83 dec/s, bench config4) is the
one leg below the A100 anchor per-variable (anchor decode 0.0343 s on
69 vars, reference cra5/models/compressai/utils/plot/VIVT-69.json), and
no document stated its phase budget or whether the pure-decode stream
saturates the device queue the way the roundtrip pipeline does. This
tool measures exactly that on the real chip:

  * sequential decode latency (median),
  * pipelined decode rate vs pipeline depth (the roundtrip's 6-thread
    optimum need not transfer to pure decode: decode dispatches fewer,
    larger device calls, so fewer threads may saturate the queue),
  * batched decode (B=2): towers batch-amortize ~13% on the decode side
    (PERF.md round 3) while the y-scan stays per-sample inside the lane
    coder — decode-only serving has no encode-side buffers so batching
    has more memory headroom than the B=4-OOM roundtrip,
  * a cumulative phase chain: z-upload+scan -> +hyper -> +y-scan ->
    +g_s, each prefix synced with a device_get and DIFFERENCED so the
    ~27 ms tunnel RTT cancels (block_until_ready does not sync on this
    runtime - PERF.md round 3).

Usage (one TPU process at a time!):
  python -m cra5_tpu.tools.decode_profile [--depths 2,4,6,8,10]
         [--batches 1,2] [--iters 7] [--per-window 18] [-o out.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _sync(arr):
    import jax

    jax.device_get(arr.reshape(-1)[:1])


def _pipelined_rate(thunk, concurrency, per_window, n_windows=3):
    """Median-of-windows pipelined throughput (same estimator as
    bench.py::_pipelined_rate — tunnel drifts >20% between windows)."""
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(concurrency)
    try:
        list(pool.map(lambda _: thunk(), range(max(concurrency, 4))))
        windows = []
        for _ in range(n_windows):
            t0 = time.time()
            list(pool.map(lambda _: thunk(), range(per_window)))
            windows.append(per_window / (time.time() - t0))
    finally:
        pool.shutdown()
    return float(np.median(windows)), [round(w, 3) for w in windows]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--depths", default="2,4,6,8,10",
                   type=lambda s: [int(x) for x in s.split(",")])
    p.add_argument("--batches", default="1,2",
                   type=lambda s: [int(x) for x in s.split(",")])
    p.add_argument("--iters", type=int, default=7)
    p.add_argument("--per-window", type=int, default=18)
    p.add_argument("--phase-iters", type=int, default=5)
    p.add_argument("--model", choices=["268", "tiny"], default="268")
    p.add_argument("--amp", type=float, default=1.0,
                   help="input amplitude (production point ~2.4MB bins)")
    p.add_argument("-o", "--out", default=None)
    args = p.parse_args(argv)

    import jax

    if args.model == "tiny":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.devices()

    import jax.numpy as jnp

    from cra5_tpu.models import VAEformer, VAEformerCodec, vaeformer_268
    from cra5_tpu.models.vaeformer import vaeformer_tiny

    t0 = time.time()
    cfg = vaeformer_tiny() if args.model == "tiny" else vaeformer_268()
    model = VAEformer(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    xs = {
        b: jax.random.normal(rng, (b, cfg.in_chans, *cfg.img_size), jnp.float32)
        * args.amp
        for b in args.batches
    }
    variables = jax.jit(model.init)(rng, xs[args.batches[0]])
    jax.block_until_ready(variables)
    print(f"[prof] init {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    if args.model == "268":
        from cra5_tpu.train import calibrate_entropy_cached

        enc_lat = jax.jit(
            lambda v, xi: model.apply(v, xi, method=VAEformer.encode_latent)
        )
        lats = [
            enc_lat(
                variables,
                jax.random.normal(
                    jax.random.PRNGKey(100 + i),
                    (1, cfg.in_chans, *cfg.img_size), jnp.float32,
                ),
            )
            for i in range(2)
        ]
        variables = calibrate_entropy_cached(
            model, variables, lats, cache_dir="/tmp/jax_bench_cache"
        )
        print(f"[prof] calibrated {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    codec = VAEformerCodec(model, variables, coder="v2")
    codec.update()

    result = {"model": args.model, "amp": args.amp}
    outs = {}
    for b in args.batches:
        outs[b] = codec.compress(xs[b])
        nb = sum(len(s[0]) for s in (outs[b]["strings"][0], outs[b]["strings"][1]))
        result[f"bin_bytes_b{b}"] = nb // b
    print(f"[prof] encoded {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    # ---- sequential + pipelined decode per batch size -------------------
    # (B=2 at depth >= 6 holds 12+ full decodes in flight and can
    # RESOURCE_EXHAUSTED the 16 GB chip — guard each sweep so one OOM
    # depth doesn't kill the remaining measurements)
    for b in args.batches:
        out = outs[b]

        def dec_one(out=out):
            d = codec.decompress(out["strings"], out["z_shape"])
            _sync(d["x_hat"])

        dec_one()  # compile
        seq = []
        for _ in range(args.iters):
            t1 = time.time()
            dec_one()
            seq.append(time.time() - t1)
        med = float(np.median(seq))
        result[f"seq_b{b}"] = {
            "median_s": round(med, 4),
            "per_sample_s": round(med / b, 4),
            "decodes_per_sec": round(b / med, 3),
        }
        print(f"[prof] b{b} seq {med:.3f}s", file=sys.stderr, flush=True)

        depth_rates = {}
        for depth in args.depths:
            try:
                rate, windows = _pipelined_rate(
                    dec_one, depth, max(args.per_window // b, 8)
                )
            except Exception as e:
                depth_rates[str(depth)] = {"error": repr(e)[:200]}
                print(f"[prof] b{b} depth {depth}: {e!r}", file=sys.stderr, flush=True)
                break  # deeper depths only hold more in flight
            depth_rates[str(depth)] = {
                "decodes_per_sec": round(rate * b, 3),
                "windows": windows,
            }
            print(
                f"[prof] b{b} depth {depth}: {rate * b:.3f} dec/s {windows}",
                file=sys.stderr, flush=True,
            )
        result[f"pipelined_b{b}"] = depth_rates
        if args.out:
            with open(args.out, "w") as f:
                json.dump(result, f, indent=1)

    # ---- cumulative phase chain (B=1) -----------------------------------
    # Mirrors VAEformerCodec.decompress (models/vaeformer.py) stage by
    # stage; each prefix re-runs from the host bytes and ends in ONE
    # device_get, so differencing consecutive prefixes cancels the sync
    # RTT and yields per-phase device time.
    out = outs[args.batches[0]]
    y_strings, z_strings = out["strings"][0], out["strings"][1]
    B = len(z_strings)
    C = model.cfg.z_channels
    zs = out["z_shape"]
    full_z_shape = (B, C, int(zs[0]), int(zs[1]))
    g = model.cfg.latent_grid
    n_y = B * model.cfg.embed_dim * g[0] * g[1]
    z_idx_dev = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.int32)[None, :, None, None], full_z_shape
    )

    def prefix(k):
        z_sym = codec._eb_coder.decode_batch_to_device(
            list(z_strings), z_idx_dev, row_plan=full_z_shape[2] * full_z_shape[3]
        )
        if k == 0:
            return _sync(z_sym)
        y_up = codec._gc_coder.upload_batch(list(y_strings), n_y // B)
        hz = codec._scales_from_z(codec.variables, z_sym, codec._scale_table_dev)
        if k == 1:
            return _sync(hz["gc_idx"])
        y_sym = codec._gc_coder.decode_uploaded_batch(y_up, hz["gc_idx"])
        if k == 2:
            return _sync(y_sym)
        x_hat = codec._reconstruct(codec.variables, y_sym, hz["means"])
        return _sync(x_hat)

    names = ["z_upload+scan", "+hyper/scales", "+y_scan", "+g_s/reconstruct"]
    cum = []
    for k in range(4):
        prefix(k)  # compile any prefix-specific residue
        ts = []
        for _ in range(args.phase_iters):
            t1 = time.time()
            prefix(k)
            ts.append(time.time() - t1)
        cum.append(float(np.median(ts)))
        print(f"[prof] prefix {names[k]}: {cum[-1]:.4f}s", file=sys.stderr, flush=True)
    phases = {names[0]: round(cum[0], 4)}
    for k in range(1, 4):
        phases[names[k]] = round(cum[k] - cum[k - 1], 4)
    result["phase_chain_cumulative_s"] = [round(c, 4) for c in cum]
    result["phase_budget_s"] = phases

    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
