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
    for mode in ("auto", "on"):
        blocks.set_flash_attention(mode)
        model = VAEformer(cfg, dtype=jnp.bfloat16)
        trainer = Trainer(
            model,
            TrainerConfig(use_ema=False, log_every=10**9, ckpt_every=10**9),
        )
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
        results[mode] = {
            "step_s": sorted(times)[len(times) // 2],
            "all_steps_s": [round(t, 3) for t in times],
            "compile_s": round(compile_s, 1),
            "init_s": round(init_s, 1),
            "loss": float(metrics["loss"]),
        }
        print(json.dumps({mode: results[mode]}), flush=True)

        if args.trace and mode == "auto":
            with jax.profiler.trace(args.trace_dir):
                state, _ = trainer._step_fn(state, x, jax.random.PRNGKey(99))
                jax.block_until_ready(state.params)
            results["trace_dir"] = args.trace_dir
        del state, trainer, model

    auto_s = results["auto"]["step_s"]
    on_s = results["on"]["step_s"]
    results["window_flash_speedup"] = round(auto_s / on_s, 3)
    results["decision"] = (
        "route window blocks through the flash kernel"
        if on_s < 0.95 * auto_s
        else "keep einsum window attention (flash not faster)"
    )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
