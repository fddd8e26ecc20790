"""Benchmark: 268v ERA5 encode+decode roundtrip throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's published per-sample GPU latency (VIVT eval,
/root/reference/cra5/models/compressai/utils/plot/VIVT-69.json:60-72:
encode 0.0983-0.1002 s + decode 0.0343-0.0350 s => ~7.5 roundtrips/s).
The metric here is full 268v compress -> bytes -> decompress roundtrips
per second (model forward + entropy coding, host<->device included).
The headline is the better of sequential latency and 2-way pipelined
throughput (independent roundtrips in flight; transfers overlap compute
— BENCH_CONCURRENCY=1 disables).

Recorded by DEFAULT in the detail JSON (BENCH_CONFIGS34=0 disables):
  config 3: batched encode throughput (falls back batch 8 -> 4 -> 2)
  config 4: decoder-only serving (decompress stream at fixed input)
  production_point: the roundtrip rate at the SURVEY §6 production bin
    size (~2.6 MB, input amplitude scaled until the stream lands there),
    with bpp + latitude-weighted-RMSE quality attached
    (BENCH_PRODUCTION=0 disables, BENCH_PROD_BYTES overrides the target)
  headline_wrmse: reconstruction quality at the headline point
  kernel_fallbacks: non-empty if a Pallas kernel failed its probe compile

BENCH_FULL=1 additionally records:
  config 1: 159v single-timestep roundtrip (second model compile)
  config 5: data-parallel recompression on a virtual 8-device CPU mesh
            (run in a subprocess; the real chip count here is 1)
  (config 2 is the headline 268v roundtrip, always)
"""

import json
import os
import sys
import time

import numpy as np


class _SkipConfig(Exception):
    """Config gated off for this run (recorded as skipped, not an error)."""


def _fallback_events():
    from cra5_tpu.coder.rans_tpu import fallback_events

    return fallback_events()


def _sync(arr):
    """True device sync: block_until_ready does NOT wait under this
    tunneled runtime (PERF.md round 3) — a 1-element device_get does."""
    import jax

    jax.device_get(arr.reshape(-1)[:1])


def _t(label, t0):
    print(
        f"[bench] {label}: {time.time() - t0:.1f}s (t={time.strftime('%H:%M:%S')})",
        file=sys.stderr, flush=True,
    )
    return time.time()


_BUDGET_T0 = time.time()


def _budget_left():
    """Seconds left in the total run budget (BENCH_TIME_BUDGET, default
    45 min from process start). Round 4's driver bench artifact never
    appeared: the default run grew long post-headline extras (production
    point + configs 3/4, each with pipelined windows) on top of a
    96-333s init, so a driver-side kill during the extras could truncate
    the run — and, with stdout block-buffered when piped, lose even the
    already-printed headline. Every extra stage now checks this budget
    and records {"skipped": "time budget"} instead of running."""
    budget = float(os.environ.get("BENCH_TIME_BUDGET", "2700"))
    return budget - (time.time() - _BUDGET_T0)


def _budget_check(extras, key, need_s):
    """Gate a post-headline stage on remaining budget. Returns True if
    the stage should be skipped (and records why)."""
    left = _budget_left()
    if left < need_s:
        extras[key] = {"skipped": f"time budget ({left:.0f}s left < {need_s}s)"}
        print(json.dumps({key: extras[key]}), file=sys.stderr, flush=True)
        return True
    return False


def _pipelined_rate(thunk, concurrency, per_window, n_windows=3):
    """Pipelined throughput of ``thunk`` (one unit of work, no args) over
    a thread pool — THE estimator for every pipelined number in this
    bench, so the round-3 lessons apply everywhere at once: warm
    max(concurrency, 4) calls first (windows trend up for the first ~4
    roundtrips: thread-local dispatch queues, transfer bucket hints),
    then ``n_windows`` timed windows of ``per_window`` calls each, and
    report the MEDIAN window (the max would let one lucky window set the
    number; the axon tunnel drifts >20% between multi-second windows).
    Returns (median items/s, per-window rates)."""
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
    import numpy as np

    return float(np.median(windows)), windows


def _run_hw_tests():
    """BENCH_HW_TESTS=1: run the hardware-only correctness suite on the
    chip before anything else touches it (round-2 VERDICT weak #4 —
    nothing invoked tests/test_tpu_hw.py automatically). A subprocess
    keeps the test conftest's CPU-forcing and cache settings out of the
    bench process; it must finish before the bench initializes the chip
    (two live TPU processes hang this runtime)."""
    import subprocess

    env = dict(os.environ, CRA5_TPU_HW_TESTS="1")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-x", "tests/test_tpu_hw.py"],
        env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    if r.returncode != 0:
        print(json.dumps({"error": f"hardware tests failed rc={r.returncode}"}))
        sys.exit(1)
    print("[bench] hardware tests passed", file=sys.stderr, flush=True)


def _beat(label):
    """Heartbeat for the attach watchdog (see _watchdog)."""
    path = os.environ.get("BENCH_HEARTBEAT")
    if path:
        with open(path, "w") as f:
            f.write(label)


def main():
    if os.environ.get("BENCH_WEDGE_SIM", "0") == "1":  # watchdog test hook
        time.sleep(3600)

    import jax

    # smoke-test knob: exercise the bench logic on the CPU backend with
    # the tiny model (BENCH_MODEL=tiny) without touching the real chip
    if os.environ.get("BENCH_CPU", "0") == "1":
        jax.config.update("jax_platforms", "cpu")

    if os.environ.get("BENCH_HW_TESTS", "0") == "1":
        _run_hw_tests()

    # persistent compile cache: the 268v towers take minutes to compile cold
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    # XLA-internal AOT blobs compile remotely with CPU features this host
    # lacks - reloading them risks SIGILL (keep only the HLO-level cache)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # touch the backend NOW: the tunneled TPU attach intermittently wedges
    # (hangs forever in backend init with zero CPU use); surfacing it here,
    # before any compile, lets the watchdog see the stall and restart us
    jax.devices()
    _beat("attached")

    import jax.numpy as jnp

    from cra5_tpu.models import VAEformer, VAEformerCodec, vaeformer_268
    from cra5_tpu.models.vaeformer import vaeformer_tiny

    warmup = int(os.environ.get("BENCH_WARMUP", "1"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    batch = int(os.environ.get("BENCH_BATCH", "1"))  # batched 24h-style encode
    full = os.environ.get("BENCH_FULL", "0") == "1"
    dtype = jnp.bfloat16 if os.environ.get("BENCH_BF16", "1") == "1" else jnp.float32

    # warm the device->host data plane concurrently with the init compile:
    # the first D2H on a tunneled backend pays a one-time ~150s setup that
    # otherwise lands in the CDF-table phase
    import threading

    threading.Thread(
        target=lambda: jax.device_get(jnp.zeros(8)), daemon=True
    ).start()

    cfg = (
        vaeformer_tiny()
        if os.environ.get("BENCH_MODEL", "268") == "tiny"
        else vaeformer_268()
    )
    model = VAEformer(cfg, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, cfg.in_chans, *cfg.img_size), jnp.float32)
    t0 = time.time()
    variables = jax.jit(model.init)(rng, x)
    jax.block_until_ready(variables)
    init_s = time.time() - t0
    t0 = _t("init", t0)

    # Calibrate the entropy side to the model's own latent statistics
    # (towers frozen) so the bench measures the production operating
    # point: at raw random init the hyper path mispredicts every scale,
    # ~26% of y symbols escape-code, and streams blow up ~40x vs a
    # trained checkpoint (4.5 MB vs the ~2-3 MB production bin) — turning the metric
    # into a tunnel-bandwidth test instead of a codec test. The
    # reference baseline (VIVT-69.json) was measured on a TRAINED model
    # at production bpp. Fitted entropy params are cached next to the
    # compile cache; BENCH_CALIBRATE=0 reverts to raw random init.
    if os.environ.get("BENCH_CALIBRATE", "1") == "1":
        try:
            from cra5_tpu.models import VAEformer as _VF
            from cra5_tpu.train import calibrate_entropy_cached

            enc_lat = jax.jit(
                lambda v, xi: model.apply(v, xi, method=_VF.encode_latent)
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
                model, variables, lats, cache_dir="/tmp/jax_bench_cache",
                steps=int(os.environ.get("BENCH_CALIB_STEPS", "600")),
            )
            t0 = _t("entropy calibration", t0)
        except Exception as e:  # headline survives an uncalibrated run
            print(f"[bench] calibration failed: {e!r}", file=sys.stderr)

    codec = VAEformerCodec(model, variables, coder=os.environ.get("BENCH_CODER", "v2"))
    codec.update()
    t0 = _t("cdf tables", t0)

    # warmup (compilation)
    warmup_start = time.time()
    for i in range(warmup):
        out = codec.compress(x)
        t0 = _t(f"warmup compress {i}", t0)
        dec = codec.decompress(out["strings"], out["z_shape"])
        _sync(dec["x_hat"])
        t0 = _t(f"warmup decompress {i}", t0)
    compile_s = time.time() - warmup_start

    times, enc_times, dec_times = [], [], []
    nbytes = 0
    for _ in range(iters):
        t0 = time.time()
        out = codec.compress(x)
        t1 = time.time()
        dec = codec.decompress(out["strings"], out["z_shape"])
        _sync(dec["x_hat"])
        t2 = time.time()
        times.append(t2 - t0)
        enc_times.append(t1 - t0)
        dec_times.append(t2 - t1)
        nbytes = sum(len(s[0]) for s in (out["strings"][0], out["strings"][1]))

    # median: robust to warm-in/compile-tail and tunnel jitter
    mean_t = float(np.median(times))
    throughput = batch / mean_t  # sequential per-sample roundtrips/s

    # Pipelined throughput: independent roundtrips in flight on two host
    # threads, so one sample's host<->device stream transfers overlap the
    # other's model/scan compute (the production serving shape: a stream
    # of timesteps, not one). Sequential latency stays in the detail dict.
    # 6-way pipelining measured best in round 3 (2.02/2.29/2.36/2.48 rps
    # at 2/3/4/6 threads): the sorted decode kernel shortened the decode
    # phase enough that deeper pipelines keep the device queue fed
    # (round 2 had measured 3 threads WORSE at the old decode time)
    concurrency = int(os.environ.get("BENCH_CONCURRENCY", "6"))
    # at least two rounds per thread so a window measures steady-state
    per_window = int(os.environ.get("BENCH_WINDOW", str(max(6, 2 * concurrency))))
    pipe_throughput = None
    windows = []
    if concurrency > 1:
        def roundtrip():
            out = codec.compress(x)
            dec = codec.decompress(out["strings"], out["z_shape"])
            _sync(dec["x_hat"])

        # median window as the headline: a sustained-rate estimator that a
        # re-run reproduces; best/all windows stay in the detail dict to
        # show the machine's ceiling vs the tunnel's jitter
        rate, win = _pipelined_rate(roundtrip, concurrency, per_window)
        windows = [batch * w for w in win]
        pipe_throughput = batch * rate
        throughput = max(throughput, pipe_throughput)
    baseline = 1.0 / (0.0983 + 0.0343)  # reference GPU roundtrips/sec
    result = {
        "metric": "era5_268v_roundtrips_per_sec_per_chip",
        "value": round(throughput, 4),
        "unit": "roundtrips/s",
        "vs_baseline": round(throughput / baseline, 4),
    }
    # flush=True is load-bearing: stdout is block-buffered when piped, and
    # a driver-side kill during the post-headline extras would otherwise
    # lose this line (suspected cause of the missing round-4 artifact)
    print(json.dumps(result), flush=True)

    # quality attached to the headline operating point (VERDICT r3 #3):
    # bpp is in detail already; WRMSE of the decompressed reconstruction
    # against the benched input closes the "rate without distortion" gap
    def _wrmse_summary(x_in, x_hat):
        from cra5_tpu.metrics import wrmse

        wc = np.asarray(
            wrmse(jnp.asarray(x_hat), jnp.asarray(x_in), per_channel=True)
        )
        return {
            "mean": round(float(wc.mean()), 4),
            "p50": round(float(np.percentile(wc, 50)), 4),
            "p95": round(float(np.percentile(wc, 95)), 4),
            "max": round(float(wc.max()), 4),
        }

    headline_quality = {}
    try:
        headline_quality = _wrmse_summary(np.asarray(x), np.asarray(dec["x_hat"]))
    except Exception as e:
        headline_quality = {"error": repr(e)}

    # ---- production operating point (VERDICT r3 #3 / weak #2) ----
    # The calibrated random-init streams sit ~3x lighter than the ~2.6 MB
    # bin the SURVEY §6 300x archive ratio implies, and the stream-bound
    # phases scale with bytes. Scale the input amplitude until the bin
    # lands in the production band and measure THAT rps, with quality.
    production = {}
    if os.environ.get("BENCH_PRODUCTION", "1") == "1":
        if _budget_left() < 300:
            production = {"skipped": f"time budget ({_budget_left():.0f}s left)"}
            print(json.dumps({"production_point": production}), file=sys.stderr, flush=True)
        else:
          try:
            target = float(os.environ.get("BENCH_PROD_BYTES", str(2.6e6)))
            amp, nb = 1.0, float(nbytes)
            probes = [(amp, nb)]
            xp = x
            for _ in range(5):
                if 0.85 * target <= nb <= 1.25 * target:
                    break
                # stream size grows ~log with amplitude; secant in log-amp,
                # capped 4x per probe and 16x overall (escape-dominated
                # streams saturate in bytes and would send amp to infinity)
                new_amp = min(amp * min((target / nb) ** 0.8, 4.0), 16.0)
                if new_amp == amp:  # pinned at the cap: accept what we have
                    break
                amp = new_amp
                xp = (x * amp).astype(jnp.float32)
                op = codec.compress(xp)
                nb = float(sum(len(s[0]) for s in (op["strings"][0], op["strings"][1])))
                probes.append((round(amp, 3), nb))
            seq_p = []
            out_p = None
            for _ in range(max(3, iters // 2)):
                t0 = time.time()
                out_p = codec.compress(xp)
                dec_p = codec.decompress(out_p["strings"], out_p["z_shape"])
                _sync(dec_p["x_hat"])
                seq_p.append(time.time() - t0)
            prod_rate = batch / float(np.median(seq_p))
            if concurrency > 1:
                def rt_p():
                    o = codec.compress(xp)
                    d = codec.decompress(o["strings"], o["z_shape"])
                    _sync(d["x_hat"])

                rate_p, _ = _pipelined_rate(rt_p, concurrency, per_window)
                prod_rate = max(prod_rate, batch * rate_p)
            pb = sum(len(s[0]) for s in (out_p["strings"][0], out_p["strings"][1]))
            production = {
                "production_rate_rps": round(prod_rate, 4),
                "amp": round(float(amp), 3),
                "bin_bytes": int(pb),
                "bpp_721x1440": round(8 * pb / (721 * 1440), 4),
                "median_roundtrip_s": round(float(np.median(seq_p)), 4),
                # report in UNIT-scale (normalized) units: the input was
                # amplitude-scaled to hit the target bin size, and WRMSE
                # scales with amplitude — divide it back out so this is
                # comparable to headline_wrmse and the published anchors
                "wrmse_summary": _wrmse_summary(
                    np.asarray(xp) / amp, np.asarray(dec_p["x_hat"]) / amp
                ),
                "target_bytes": target,
                "probes": probes,
                # this WRMSE characterizes a RANDOM-INIT, entropy-
                # calibrated model at amplitude-scaled inputs; it is NOT
                # the BASELINE.md quality claim — only decoding a
                # converted real checkpoint can verify bpp+WRMSE parity
                # (blocked offline; see PARITY.md)
                "caveat": "random-init model; not a trained-checkpoint quality claim",
            }
            print(json.dumps({"production_point": production}), file=sys.stderr, flush=True)
          except Exception as e:
            production = {"error": repr(e)}

    extras = {}
    configs34 = os.environ.get("BENCH_CONFIGS34", "1") == "1"
    if full or configs34:
        # config 4: decoder-only serving (bin_to_latent + reconstruction);
        # pipelined like the headline — serving decodes a stream of bins
        try:
            if _budget_left() < 180:
                raise _SkipConfig(f"time budget ({_budget_left():.0f}s left)")
            dec_only = []
            for _ in range(iters):
                t0 = time.time()
                dec = codec.decompress(out["strings"], out["z_shape"])
                _sync(dec["x_hat"])
                dec_only.append(time.time() - t0)
            dec_rate = batch / float(np.median(dec_only))
            depth_rates = {}
            if concurrency > 1:
                def dec_one():
                    d = codec.decompress(out["strings"], out["z_shape"])
                    _sync(d["x_hat"])

                # pure decode saturates the device queue at depth 2
                # (tools/decode_profile.py round 5: 7.14 dec/s at depth 2
                # vs 6.91 at depth 6 — fewer, larger device calls than the
                # roundtrip); try shallow AND the roundtrip's depth
                for depth in sorted({2, concurrency}):
                    rate_d, _ = _pipelined_rate(dec_one, depth, per_window)
                    depth_rates[str(depth)] = round(batch * rate_d, 4)
                    dec_rate = max(dec_rate, batch * rate_d)
            extras["config4_decoder_only"] = {
                "decodes_per_sec": round(dec_rate, 4),
                "median_s": round(float(np.median(dec_only)), 4),
                "batch": batch,
                **({"pipelined_by_depth": depth_rates} if depth_rates else {}),
            }
            print(json.dumps({"config4": extras["config4_decoder_only"]}), file=sys.stderr, flush=True)
        except _SkipConfig as e:
            extras["config4_decoder_only"] = {"skipped": str(e) or "gated"}
        except Exception as e:  # keep the headline metric alive
            extras["config4_decoder_only"] = {"error": repr(e)}

        # config 1: 159v single-timestep roundtrip (BENCH_FULL only — it
        # compiles a second full model)
        try:
            if not full:
                raise _SkipConfig("BENCH_FULL=0")
            if _budget_left() < 600:
                raise _SkipConfig(f"time budget ({_budget_left():.0f}s left)")
            from cra5_tpu.models import vaeformer_159

            cfg159 = vaeformer_159()
            model159 = VAEformer(cfg159, dtype=dtype)
            x159 = jax.random.normal(
                jax.random.PRNGKey(2), (1, cfg159.in_chans, *cfg159.img_size), jnp.float32
            )
            v159 = jax.jit(model159.init)(jax.random.PRNGKey(0), x159)
            if os.environ.get("BENCH_CALIBRATE", "1") == "1":
                try:
                    from cra5_tpu.models import VAEformer as _VF
                    from cra5_tpu.train import calibrate_entropy_cached

                    lat159 = jax.jit(
                        lambda v, xi: model159.apply(v, xi, method=_VF.encode_latent)
                    )(v159, x159)
                    v159 = calibrate_entropy_cached(
                        model159, v159, [lat159],
                        cache_dir="/tmp/jax_bench_cache",
                        steps=int(os.environ.get("BENCH_CALIB_STEPS", "600")),
                    )
                except Exception as e:
                    print(f"[bench] 159v calibration failed: {e!r}", file=sys.stderr)
            codec159 = VAEformerCodec(model159, v159, coder=os.environ.get("BENCH_CODER", "v2"))
            codec159.update()
            def rt159(_):
                o = codec159.compress(x159)
                d = codec159.decompress(o["strings"], o["z_shape"])
                _sync(d["x_hat"])

            rt159(0)  # compile + warm
            rts = []
            for _ in range(max(2, iters // 2)):
                t0 = time.time()
                rt159(0)
                rts.append(time.time() - t0)
            rate159 = 1.0 / float(np.median(rts))
            if concurrency > 1:  # pipelined, like the headline
                rate159_p, _ = _pipelined_rate(
                    lambda: rt159(0), concurrency, per_window
                )
                rate159 = max(rate159, rate159_p)
            extras["config1_159v"] = {
                "roundtrips_per_sec": round(rate159, 4),
                "median_s": round(float(np.median(rts)), 4),
            }
            print(json.dumps({"config1": extras["config1_159v"]}), file=sys.stderr)
            del model159, v159, codec159, x159
        except _SkipConfig as e:
            extras["config1_159v"] = {"skipped": str(e) or "gated"}
        except Exception as e:
            extras["config1_159v"] = {"error": repr(e)}

        # config 3: batched 24h-style encode throughput (bf16 inputs; falls
        # back 8 -> 4 -> 2 if the window-attention activations exhaust HBM)
        for bb in (int(os.environ.get("BENCH_BATCH_BIG", "8")), 4, 2):
            if _budget_check(extras, "config3_batched_encode", 240):
                break
            xb = ob = None
            try:
                xb = jax.random.normal(
                    jax.random.PRNGKey(1), (bb, cfg.in_chans, *cfg.img_size), jnp.bfloat16
                )
                codec.compress(xb)  # compile + warm
                enc_b = []
                for _ in range(max(2, iters // 2)):
                    t0 = time.time()
                    ob = codec.compress(xb)
                    enc_b.append(time.time() - t0)
                rate3 = bb / float(np.median(enc_b))
                if concurrency > 1:  # overlap batches like the headline
                    c3 = max(2, concurrency // 2)
                    rate3_p, _ = _pipelined_rate(
                        lambda: codec.compress(xb), c3, 2 * c3
                    )
                    rate3 = max(rate3, bb * rate3_p)
                bbytes = sum(len(s) for grp in ob["strings"] for s in grp)
                extras["config3_batched_encode"] = {
                    "encodes_per_sec": round(rate3, 4),
                    "median_s": round(float(np.median(enc_b)), 4),
                    "batch": bb,
                    "stream_mb": round(bbytes / 1e6, 2),
                }
                print(json.dumps({"config3": extras["config3_batched_encode"]}), file=sys.stderr)
                break
            except Exception as e:
                extras["config3_batched_encode"] = {"error": repr(e), "batch": bb}
            finally:
                del xb, ob

        # config 5: data-parallel recompression over a virtual 8-device CPU
        # mesh (subprocess so the TPU process stays single-owner;
        # BENCH_FULL only — minutes of CPU compile)
        try:
            if not full:
                raise _SkipConfig("BENCH_FULL=0")
            if _budget_left() < 600:
                raise _SkipConfig(f"time budget ({_budget_left():.0f}s left)")
            import subprocess
            import tempfile

            script = (
                "import os\n"
                "os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS','') + "
                "' --xla_force_host_platform_device_count=8'\n"
                "import jax; jax.config.update('jax_platforms', 'cpu')\n"
                "import sys, time, numpy as np\n"
                "from cra5_tpu.tools import recompress\n"
                "indir, outdir = sys.argv[1], sys.argv[2]\n"
                "t0 = time.time()\n"
                "rc = recompress.main([indir, '-o', outdir, '--config', 'tiny'])\n"
                "print('ELAPSED', time.time() - t0)\n"
                "sys.exit(rc)\n"
            )
            with tempfile.TemporaryDirectory(prefix="bench_rc_") as td:
                indir = os.path.join(td, "in")
                os.makedirs(indir)
                rng_np = np.random.default_rng(0)
                n_ts = 16
                for i in range(n_ts):
                    np.save(
                        os.path.join(indir, f"ts{i}.npy"),
                        rng_np.normal(size=(8, 41, 40)).astype(np.float32),
                    )
                proc = subprocess.run(
                    [sys.executable, "-c", script, indir, os.path.join(td, "out")],
                    capture_output=True, text=True, timeout=1200,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                )
                elapsed = None
                for line in proc.stdout.splitlines():
                    if line.startswith("ELAPSED"):
                        elapsed = float(line.split()[1])
                if proc.returncode == 0 and elapsed:
                    extras["config5_mesh_recompress"] = {
                        "samples_per_sec": round(n_ts / elapsed, 4),
                        "n_samples": n_ts,
                        "mesh": "8 virtual cpu devices (1 real chip present)",
                    }
                else:
                    extras["config5_mesh_recompress"] = {
                        "error": f"rc={proc.returncode}",
                        "tail": proc.stderr[-300:],
                    }
            print(json.dumps({"config5": extras.get("config5_mesh_recompress")}), file=sys.stderr)
        except _SkipConfig as e:
            extras["config5_mesh_recompress"] = {"skipped": str(e) or "gated"}
        except Exception as e:
            extras["config5_mesh_recompress"] = {"error": repr(e)}

    print(
        json.dumps(
            {
                "detail": {
                    **({"baseline_configs": extras} if extras else {}),
                    **({"production_point": production} if production else {}),
                    "headline_wrmse": headline_quality,
                    "wrmse_caveat": "random-init model (entropy-calibrated); quality parity needs a converted real checkpoint (PARITY.md)",
                    "mean_roundtrip_s": round(mean_t, 4),
                    "pipelined_rps": round(pipe_throughput, 4) if pipe_throughput else None,
                    "pipelined_rps_estimator": "median_of_windows" if pipe_throughput else None,
                    "pipelined_windows": [round(w, 4) for w in windows] if pipe_throughput else None,
                    "pipelined_best_window": round(float(np.max(windows)), 4) if pipe_throughput else None,
                    "concurrency": concurrency,
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
                    # the only published reference latency is the
                    # 69-VARIABLE model (VIVT-69.json); this bench runs
                    # the 268-variable flagship (3.9x the data per
                    # roundtrip), so the raw vs_baseline understates
                    # per-variable throughput by that factor
                    "baseline_model": "VIVT-69 (69 vars) @ 7.54 rps; ours 268 vars",
                    "vs_baseline_per_variable": round(
                        (throughput * 268) / ((1.0 / (0.0983 + 0.0343)) * 69), 4
                    ),
                    # chips x per-chip projection for the north-star v5e-8
                    # topology: valid because dp archive fan-out is proven
                    # collective-free on the compiled HLO (docs/SCALING.md;
                    # tests/test_parallel.py::test_dp_sharded_codec_hlo_has_no_collectives)
                    "v5e8_projection": {
                        "aggregate_rps": round(8 * (pipe_throughput or throughput), 2),
                        "production_aggregate_rps": (
                            round(8 * production["production_rate_rps"], 2)
                            if production and "production_rate_rps" in production
                            else None
                        ),
                        "basis": "8 chips x measured per-chip rps; zero-collective dp fan-out (SCALING.md)",
                    },
                    # non-empty = a Pallas kernel failed its probe compile
                    # and this bench ran a slower bit-identical path
                    "kernel_fallbacks": _fallback_events(),
                }
            }
        ),
        file=sys.stderr,
    )


def _watchdog():
    """Run main() in a child process and restart it if the TPU attach
    wedges. The tunneled backend intermittently hangs forever inside
    device attach (~50% of launches in a bad period; the process sits at
    zero CPU and never returns from jax.devices()). A killed client needs
    minutes before the next attach succeeds, so retries back off. The
    child signals a successful attach by writing the BENCH_HEARTBEAT
    file; after that the watchdog just waits for it."""
    import signal
    import subprocess

    hb = f"/tmp/bench_hb_{os.getpid()}"
    attach_timeout = float(os.environ.get("BENCH_ATTACH_TIMEOUT", "420"))
    if os.environ.get("BENCH_HW_TESTS", "0") == "1":
        attach_timeout += 900.0  # hw tests attach (and can wedge) first
    # default sized for the observed failure mode: wedge episodes have
    # lasted minutes to HOURS (one 11h+ episode on 2026-08-18); 16 tries
    # with capped backoff covers ~4h before giving up with an error JSON
    tries = int(os.environ.get("BENCH_ATTACH_TRIES", "16"))
    cooldown_base = float(os.environ.get("BENCH_ATTACH_COOLDOWN", "180"))
    cooldown_cap = float(os.environ.get("BENCH_ATTACH_COOLDOWN_CAP", "600"))
    env = dict(os.environ, BENCH_NO_WATCHDOG="1", BENCH_HEARTBEAT=hb)

    for attempt in range(tries):
        if os.path.exists(hb):
            os.unlink(hb)
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env=env, start_new_session=True,
        )
        deadline = time.time() + attach_timeout
        attached = False
        while True:
            rc = child.poll()
            if rc is not None:
                sys.exit(rc)  # finished (either way) before/after attach
            if os.path.exists(hb):
                attached = True
                break
            if time.time() > deadline:
                break
            time.sleep(5)
        if attached:
            sys.exit(child.wait())
        cooldown = min(cooldown_base * (1 + 0.67 * attempt), cooldown_cap)
        print(
            f"[bench] attach wedge: no heartbeat in {attach_timeout:.0f}s "
            f"(attempt {attempt + 1}/{tries}); killing pgid and retrying "
            f"in {cooldown}s",
            file=sys.stderr, flush=True,
        )
        try:
            os.killpg(child.pid, signal.SIGKILL)
        except OSError:
            pass
        child.wait()
        if attempt + 1 < tries:
            time.sleep(cooldown)
    print(json.dumps({"error": f"TPU attach wedged {tries} times"}))
    sys.exit(1)


if __name__ == "__main__":
    if os.environ.get("BENCH_NO_WATCHDOG", "0") == "1":
        main()
    else:
        _watchdog()
