"""Profile the 268v training step and settle the window-attention kernel
question (round-1 VERDICT weak #6 / next-round item 8).

Measures steady-state train-step time for the full 268v VAEformer
(remat + bf16 params) under three attention routings:

  auto  — global blocks via the Pallas flash kernel, window blocks via
          einsum (the round-1 default)
  on    — every block, windows included, through the flash kernel
  trace — one step under jax.profiler.trace (artifact for inspection)

Decision rule from SURVEY.md §7 item 4: build/route a fused window
kernel if window blocks exceed ~20% of step time — compared here
directly by timing the two routings.

Run on the real chip (slow first compile):
    python examples/profile_268_train.py [--steps 5] [--trace]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--trace", action="store_true", help="also write a profiler trace")
    ap.add_argument("--trace-dir", default="/tmp/jax_trace_268")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses

    import jax.numpy as jnp

    from cra5_tpu.models import VAEformer, vaeformer_268
    from cra5_tpu.nn import blocks
    from cra5_tpu.train import Trainer, TrainerConfig

    cfg = dataclasses.replace(vaeformer_268(), remat=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.in_chans, *cfg.img_size), jnp.float32)

    results = {}
    # (flash routing, remat policy) variants: the flash on/off question is
    # settled (einsum wins at train batch, see PROFILE_268.md) so "auto"
    # flash routing is fixed; the remat policy sweep trades ~190MB/block
    # of saved matmul outputs for one fewer forward's worth of recompute
    # ("dots" = dots_with_no_batch_dims_saveable). Each variant is
    # fault-isolated: a "dots" OOM records an error, not a crash.
    for mode, remat in (("auto", True), ("auto", "dots")):
        key = f"{mode}+{'dots' if remat == 'dots' else 'full'}"
        cfg = dataclasses.replace(cfg, remat=remat)
        blocks.set_flash_attention(mode)
        model = VAEformer(cfg, dtype=jnp.bfloat16)
        trainer = Trainer(
            model,
            TrainerConfig(use_ema=False, log_every=10**9, ckpt_every=10**9),
        )
        state = None
        try:
            t0 = time.time()
            state = trainer.init_state(x)
            init_s = time.time() - t0

            t0 = time.time()
            state, metrics = trainer._step_fn(state, x, jax.random.PRNGKey(1))
            float(metrics["loss"])
            compile_s = time.time() - t0

            times = []
            for i in range(args.steps):
                t0 = time.time()
                state, metrics = trainer._step_fn(state, x, jax.random.PRNGKey(2 + i))
                # fetch a metric VALUE: on the tunneled backend,
                # block_until_ready on donated outputs returns early and
                # reports ~100x-too-fast steps; a device_get cannot lie
                float(metrics["loss"])
                times.append(time.time() - t0)
            results[key] = {
                "step_s": sorted(times)[len(times) // 2],
                "all_steps_s": [round(t, 3) for t in times],
                "compile_s": round(compile_s, 1),
                "init_s": round(init_s, 1),
                "loss": float(metrics["loss"]),
            }
        except Exception as e:  # noqa: BLE001 — typically RESOURCE_EXHAUSTED
            results[key] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        print(json.dumps({key: results[key]}), flush=True)

        if args.trace and key == "auto+full" and state is not None:
            with jax.profiler.trace(args.trace_dir):
                state, _ = trainer._step_fn(state, x, jax.random.PRNGKey(99))
                jax.block_until_ready(state.params)
            results["trace_dir"] = args.trace_dir
        del state, trainer, model

    auto_s = results.get("auto+full", {}).get("step_s")
    dots_s = results.get("auto+dots", {}).get("step_s")
    if auto_s and dots_s:
        results["dots_remat_speedup"] = round(auto_s / dots_s, 3)
        results["decision"] = (
            "use remat='dots' (dots_with_no_batch_dims_saveable) for 268v training"
            if dots_s < 0.95 * auto_s
            else "keep remat=True (full block recompute; dots not faster)"
        )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
