"""On-chip 268v END-TO-END TRAINING demonstration.

The reference trains through the external mmengine 'nwp' runner
(SURVEY.md §0) and ships only the resulting checkpoint; this script is
the in-repo evidence that cra5_tpu's first-class training subsystem runs
the full production geometry on one real chip, end to end:

  1. synthesizes SMOOTH global fields on-device each step (coarse noise
     bilinearly upsampled to 268x721x1440 — spatially correlated like
     reanalysis data, so the codec has structure to learn; white noise
     would be incompressible by construction; generating on device also
     avoids a 1.1 GB/step host->device upload),
  2. trains the full 268v VAEformer (remat + Pallas flash attention
     fwd/bwd, bf16 compute, EMA, net/aux optimizer split) with the
     rate-distortion loss,
  3. checkpoints MID-RUN with the full train state (params + adam
     moments + EMA shadow + step), restores it into a FRESH Trainer, and
     asserts the resumed step/EMA/param checksums match before
     continuing — the interrupt/resume path on real hardware,
  4. rebuilds the integer CDF tables (codec.update(), the reference's
     update_model step) and compresses a HELD-OUT field with the step-0
     model vs the trained model (and its EMA shadow), reporting bin
     size, bpp, and reconstruction MSE.

Results land in TRAINING_DEMO.md. Run (needs the one TPU chip free):
    python examples/train_demo_268.py [--steps 400] [--save-at 200]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def make_field_fn(shape, coarse=(268, 46, 90)):
    """Jitted on-device generator of spatially correlated global fields:
    coarse white noise -> bilinear resize to full geometry + a little
    high-frequency detail. Returns (1, C, H, W) float32 on device."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def one(k):
        k1, k2 = jax.random.split(k)
        base = jax.random.normal(k1, coarse, jnp.float32)
        up = jax.image.resize(base, shape, method="bilinear")
        return (up + 0.05 * jax.random.normal(k2, shape, jnp.float32))[None] * 0.5

    return one


def _checksums(params):
    """One scalar per top-level params subtree (cheap exact-restore probe:
    full-leaf comparison would device->host copy gigabytes)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def sums(p):
        return {
            k: jax.tree.reduce(
                lambda a, x: a + jnp.sum(jnp.abs(x.astype(jnp.float32))), v,
                jnp.float32(0),
            )
            for k, v in p.items()
        }

    return {k: float(v) for k, v in sums(params).items()}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--save-at", type=int, default=200)
    ap.add_argument("--pool", type=int, default=6, help="distinct training fields")
    ap.add_argument("--ckpt-dir", default="/tmp/train_demo_268")
    ap.add_argument("--out", default=None, help="write result JSON here")
    ap.add_argument("--config", default="268", choices=["268", "tiny"],
                    help="tiny = CPU smoke test of the same 4-phase flow")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from cra5_tpu.models import VAEformer, VAEformerCodec, vaeformer_268
    from cra5_tpu.models.vaeformer import vaeformer_tiny
    from cra5_tpu.train import Trainer, TrainerConfig

    if args.config == "tiny":
        jax.config.update("jax_platforms", "cpu")
        cfg = vaeformer_tiny()
        model = VAEformer(cfg)
    else:
        cfg = dataclasses.replace(vaeformer_268(), remat=True)
        model = VAEformer(cfg, dtype=jnp.bfloat16)
    tcfg = TrainerConfig(
        learning_rate=1e-4, lmbda=1.0, bpp_weight=0.02, use_ema=True,
        log_every=10**9, ckpt_every=10**9, ckpt_dir=args.ckpt_dir,
    )
    result = {"config": {"steps": args.steps, "save_at": args.save_at,
                         "pool": args.pool, "lmbda": tcfg.lmbda,
                         "bpp_weight": tcfg.bpp_weight}}

    shape = (cfg.in_chans, *cfg.img_size)
    coarse = tuple(max(1, d // 16) for d in shape)
    field = make_field_fn(shape, coarse=(268, 46, 90) if args.config == "268" else coarse)
    pool_keys = [jax.random.PRNGKey(1000 + i) for i in range(args.pool)]
    held_key = jax.random.PRNGKey(99)

    trainer = Trainer(model, tcfg)
    t0 = time.time()
    state = trainer.init_state(field(pool_keys[0]))
    print(f"[demo] init_state: {time.time()-t0:.1f}s", flush=True)

    # step-0 codec baseline BEFORE training (a device-side params snapshot
    # would cost ~2 GB of the 16 GB chip for the whole run)
    @jax.jit
    def dev_mse(a, b):
        return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))

    def eval_codec(params, label):
        codec = VAEformerCodec(model, {"params": params}, coder="v2")
        x = field(held_key)
        t0 = time.time()
        codec.update()
        out = codec.compress(x)
        dec = codec.decompress(out["strings"], out["z_shape"])
        nbytes = sum(len(s) for grp in out["strings"] for s in grp)
        mse = float(jax.device_get(dev_mse(dec["x_hat"], x)))
        r = {"bin_bytes": nbytes,
             "bpp": round(8 * nbytes / (cfg.img_size[0] * cfg.img_size[1]), 3),
             "mse": round(mse, 6),
             "wall_s": round(time.time() - t0, 1)}
        print(f"[demo] codec[{label}]: {r}", flush=True)
        return r

    result["codec_step0"] = eval_codec(state.params, "step0")

    rng = jax.random.PRNGKey(1)
    losses = {}

    def run_steps(trainer, state, lo, hi):
        t0 = time.time()
        for i in range(lo, hi):
            batch = field(pool_keys[i % len(pool_keys)])
            state, metrics = trainer._step_fn(state, batch, rng)
            if i == lo:  # compile boundary
                jax.device_get(metrics["total_loss"])
                print(f"[demo] step {i+1} (compile): {time.time()-t0:.1f}s", flush=True)
                t0 = time.time()
            if (i + 1) % 25 == 0 or i + 1 == hi:
                m = {k: round(float(v), 5) for k, v in metrics.items()}
                losses[i + 1] = m
                print(f"[demo] step {i+1}: {m}  ({(time.time()-t0)/max(i-lo,1):.2f}s/step)",
                      flush=True)
        return state

    # phase 1: train to the checkpoint
    state = run_steps(trainer, state, 0, args.save_at)
    pre = _checksums(state.params)
    t0 = time.time()
    trainer.save(state)
    save_s = time.time() - t0
    print(f"[demo] full-state save at step {args.save_at}: {save_s:.1f}s", flush=True)

    # phase 2: fresh Trainer (fresh jit, fresh optimizer object) + restore
    del trainer, state
    trainer2 = Trainer(model, tcfg)
    t0 = time.time()
    state = trainer2.restore(field(pool_keys[0]))
    restore_s = time.time() - t0
    post = _checksums(state.params)
    assert int(state.step) == args.save_at, (int(state.step), args.save_at)
    for k in pre:
        assert abs(pre[k] - post[k]) <= 1e-6 * max(1.0, abs(pre[k])), (k, pre[k], post[k])
    assert state.ema is not None and int(state.ema.steps) == args.save_at
    print(f"[demo] restore into fresh Trainer: {restore_s:.1f}s; "
          f"step/EMA/param checksums verified", flush=True)
    result["resume"] = {"save_s": round(save_s, 1), "restore_s": round(restore_s, 1),
                        "checksums_match": True, "resumed_step": int(state.step)}

    # phase 3: continue training to the end
    state = run_steps(trainer2, state, args.save_at, args.steps)
    result["losses"] = losses

    # phase 4: trained codec vs the step-0 baseline on the held-out field
    result["codec_trained"] = eval_codec(state.params, "trained")
    result["codec_trained_ema"] = eval_codec(state.ema.params, "trained-ema")

    out_path = args.out or os.path.join(args.ckpt_dir, "demo_result.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"demo": "ok", "out": out_path}), flush=True)


if __name__ == "__main__":
    main()
