"""Host-finalize concurrency microbench (docs/SCALING.md weakest link).

The v5e-8 serving projection multiplies the measured per-chip rate by 8
and assumes ONE host absorbs 8 chips' worth of per-sample host-CPU
finalize work (rANS container assembly: buffer slicing, escape varints,
header pack, byte join) plus, on the decode path, container parsing
(header validation, frombuffer views, varint decode, batch-buffer fill).
Until round 5 that assumption was an arithmetic estimate
(docs/SCALING.md named it the projection's weakest measured link); this
tool measures it on recorded streams, no TPU needed for the replay.

Two phases:

  record   run ONE calibrated compress at a chosen operating point and
           capture the exact per-stream finalize inputs (the arguments
           the production code passes to
           ``coder.rans_tpu.assemble_container`` after the batched
           device_get) plus the assembled containers, into an .npz.
           On the real chip use ``--model 268 --amp <a>`` to land the
           production bin size; ``--model tiny`` works on CPU for tests.

  replay   load the .npz and drive N host worker threads, each looping
           the REAL production host code over the recorded inputs:
           ``assemble_container`` for the encode side and (with
           ``--parse``) the upload-side host parse for the decode side.
           Threads — not processes — because that is how production
           runs it (the pipelined roundtrip pool shares one process;
           the varint codec is native and GIL-free, numpy copies
           release the GIL). Reports aggregate samples/s vs N and
           whether 8 chips' load fits one host.

Reference tie-in: the reference's host side does the equivalent work in
torch CPU tensors per sample (cra5/models/compressai/entropy_models/
entropy_models.py compress/decompress loops); its published latency
(VIVT-69.json) includes it serially per sample.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _record(args) -> int:
    import jax

    if args.model == "tiny":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    import jax.numpy as jnp

    from cra5_tpu.coder import rans_tpu
    from cra5_tpu.models import VAEformer, VAEformerCodec, vaeformer_268
    from cra5_tpu.models.vaeformer import vaeformer_tiny

    cfg = vaeformer_tiny() if args.model == "tiny" else vaeformer_268()
    model = VAEformer(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, cfg.in_chans, *cfg.img_size), jnp.float32)
    variables = jax.jit(model.init)(rng, x)
    if args.calibrate:
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
    codec = VAEformerCodec(model, variables, coder="v2")
    codec.update()
    amp = args.amp
    if args.target_bytes:
        # same secant-in-log-amp the bench production-point search uses
        # (bench.py): stream bytes grow ~log with amplitude
        for _ in range(6):
            xp = (x * amp).astype(jnp.float32)
            out = codec.compress(xp)
            nb = float(sum(len(grp[0]) for grp in out["strings"]))
            print(json.dumps({"amp_probe": round(amp, 3), "bin_bytes": int(nb)}),
                  file=sys.stderr, flush=True)
            if abs(nb - args.target_bytes) / args.target_bytes < 0.08:
                break
            new_amp = min(amp * min((args.target_bytes / nb) ** 0.8, 4.0), 16.0)
            if new_amp == amp:
                break
            amp = new_amp
    if amp != 1.0:
        x = (x * amp).astype(jnp.float32)

    recorded = []
    real_assemble = rans_tpu.assemble_container

    def spy(n, K, nw, ne, sorted_mode, safe, states, stream, escs):
        out = real_assemble(n, K, nw, ne, sorted_mode, safe, states, stream, escs)
        recorded.append(
            dict(
                n=n, K=K, nw=nw, ne=ne, sorted=int(sorted_mode), safe=int(safe),
                states=np.asarray(states, np.uint32),
                stream=np.asarray(stream, np.uint16),
                escs=np.asarray(escs, np.int32),
                container=np.frombuffer(out, np.uint8),
            )
        )
        return out

    rans_tpu.assemble_container = spy
    try:
        codec.compress(x)  # warm/compile (recorded, then cleared)
        recorded.clear()
        out = codec.compress(x)
    finally:
        rans_tpu.assemble_container = real_assemble
    total = sum(len(grp[0]) for grp in out["strings"])
    payload = {
        "n_streams": np.int64(len(recorded)),
        "bin_bytes": np.int64(total),
        "amp": np.float64(amp),
    }
    for i, r in enumerate(recorded):
        for k, v in r.items():
            payload[f"s{i}_{k}"] = v
    np.savez_compressed(args.out, **payload)
    print(
        json.dumps(
            {
                "recorded_streams": len(recorded),
                "bin_bytes": total,
                "stream_sizes": [int(r["container"].size) for r in recorded],
                "amp": round(float(amp), 3),
                "out": args.out,
            }
        )
    )
    return 0


def _host_parse(datas, K_expect=None):
    """Decode-side host work: exactly the pure-host portion of
    ``LaneCoder.upload_batch`` (coder/rans_tpu.py) — header validation,
    frombuffer views, escape varint decode, zero-padded batch fill —
    stopping where production hands the filled buffers to jnp.asarray
    (the H2D transfer engine, not host CPU assembly)."""
    from cra5_tpu.coder.rans_tpu import (
        _bucket,
        _parse_v2_header,
        _zigzag_varint_decode,
    )

    B = len(datas)
    headers = [_parse_v2_header(d) for d in datas]
    K = headers[0][1]
    W = _bucket(max(max(h[3] for h in headers), 1))
    E = _bucket(max(max(h[2] for h in headers), 1))
    states = np.zeros((B, K), np.uint32)
    stream = np.zeros((B, W), np.uint16)
    escs = np.zeros((B, E), np.int32)
    for b, (d, (_, _, n_esc, n_words, _, _, _)) in enumerate(zip(datas, headers)):
        off = 20
        states[b] = np.frombuffer(d, "<u4", K, off); off += 4 * K
        stream[b, :n_words] = np.frombuffer(d, "<u2", n_words, off)
        off += 2 * n_words
        escs[b, :n_esc] = _zigzag_varint_decode(d[off:], n_esc)
    return states, stream, escs


def _replay(args) -> int:
    from cra5_tpu.coder.rans_tpu import assemble_container

    z = np.load(args.npz)
    n_streams = int(z["n_streams"])
    streams = []
    for i in range(n_streams):
        streams.append(
            dict(
                n=int(z[f"s{i}_n"]), K=int(z[f"s{i}_K"]),
                nw=int(z[f"s{i}_nw"]), ne=int(z[f"s{i}_ne"]),
                sorted=bool(int(z[f"s{i}_sorted"])), safe=bool(int(z[f"s{i}_safe"])),
                states=z[f"s{i}_states"], stream=z[f"s{i}_stream"],
                escs=z[f"s{i}_escs"],
                container=z[f"s{i}_container"].tobytes(),
            )
        )

    def one_sample_encode():
        for s in streams:
            assemble_container(
                s["n"], s["K"], s["nw"], s["ne"], s["sorted"], s["safe"],
                s["states"], s["stream"], s["escs"],
            )

    datas = [s["container"] for s in streams]

    def one_sample_parse():
        for d in datas:
            _host_parse([d])

    # correctness pin: replayed assembly reproduces the recorded bytes
    for s in streams:
        got = assemble_container(
            s["n"], s["K"], s["nw"], s["ne"], s["sorted"], s["safe"],
            s["states"], s["stream"], s["escs"],
        )
        assert got == s["container"], "replayed container differs from recording"

    def sweep(fn):
        rates = {}
        for n_workers in args.workers:
            pool = ThreadPoolExecutor(n_workers)
            try:
                list(pool.map(lambda _: fn(), range(2 * n_workers)))  # warm
                stop_at = time.time() + args.seconds
                done = 0
                futs = [pool.submit(fn) for _ in range(4 * n_workers)]
                t0 = time.time()
                while True:
                    for f in futs:
                        f.result()
                    done += len(futs)
                    if time.time() >= stop_at:
                        break
                    futs = [pool.submit(fn) for _ in range(4 * n_workers)]
                rates[n_workers] = done / (time.time() - t0)
            finally:
                pool.shutdown()
        return rates

    enc = sweep(one_sample_encode)
    result = {
        "metric": "host_finalize_samples_per_sec",
        "bin_bytes": int(z["bin_bytes"]),
        "streams_per_sample": n_streams,
        "encode_finalize": {str(k): round(v, 2) for k, v in enc.items()},
        "encode_ms_1thread": round(1000.0 / enc[args.workers[0]], 3),
    }
    if args.parse:
        par = sweep(one_sample_parse)
        result["decode_parse"] = {str(k): round(v, 2) for k, v in par.items()}
        result["parse_ms_1thread"] = round(1000.0 / par[args.workers[0]], 3)
    if args.required_rps:
        best = max(enc.values())
        result["required_rps"] = args.required_rps
        result["encode_headroom_x"] = round(best / args.required_rps, 2)
    print(json.dumps(result))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)
    pr = sub.add_parser("record", help="capture finalize inputs from one compress")
    pr.add_argument("-o", "--out", required=True)
    pr.add_argument("--model", choices=["268", "tiny"], default="268")
    pr.add_argument("--amp", type=float, default=1.0,
                    help="input amplitude (scale until bin hits production size)")
    pr.add_argument("--target-bytes", type=float, default=None,
                    help="amp-search (from --amp) until the bin lands within "
                         "8%% of this size, like the bench production point")
    pr.add_argument("--no-calibrate", dest="calibrate", action="store_false")
    pp = sub.add_parser("replay", help="thread-scaling sweep over a recording")
    pp.add_argument("npz")
    pp.add_argument("--workers", type=lambda s: [int(x) for x in s.split(",")],
                    default=[1, 2, 4, 6, 8, 12])
    pp.add_argument("--seconds", type=float, default=3.0,
                    help="measurement window per worker count")
    pp.add_argument("--parse", action="store_true",
                    help="also sweep the decode-side host container parse")
    pp.add_argument("--required-rps", type=float, default=None,
                    help="aggregate samples/s the projection needs (8 x per-chip)")
    args = p.parse_args(argv)
    return _record(args) if args.cmd == "record" else _replay(args)


if __name__ == "__main__":
    sys.exit(main())
