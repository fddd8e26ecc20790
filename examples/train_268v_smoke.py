"""Single-chip 268v training-step smoke: proves the full production model
(ViT-L towers, 10 368 tokens) fits and trains on one 16GB TPU chip using
remat + the Pallas flash attention forward/backward.

Run on a machine with a TPU attached:
  python examples/train_268v_smoke.py
"""

import dataclasses
import time

import jax
import jax.numpy as jnp

from cra5_tpu.models import VAEformer
from cra5_tpu.models.vaeformer import vaeformer_268
from cra5_tpu.train import Trainer, TrainerConfig


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    cfg = dataclasses.replace(vaeformer_268(), remat=True)
    model = VAEformer(cfg, dtype=jnp.bfloat16)
    trainer = Trainer(model, TrainerConfig(use_ema=False, log_every=1, ckpt_every=10**9))
    x = jax.random.normal(
        jax.random.PRNGKey(0), (1, cfg.in_chans, *cfg.img_size), jnp.float32
    ) * 0.5

    t0 = time.time()
    state = trainer.init_state(x)
    print(f"init_state: {time.time() - t0:.1f}s")
    t0 = time.time()
    state, metrics = trainer._step_fn(state, x, jax.random.PRNGKey(1))
    jax.block_until_ready(state.params)
    print(f"step 1 (compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    for _ in range(3):
        state, metrics = trainer._step_fn(state, x, jax.random.PRNGKey(1))
    jax.block_until_ready(state.params)
    print(f"steps 2-4: {(time.time() - t0) / 3:.2f}s/step")
    print("metrics:", {k: float(v) for k, v in metrics.items()})
    print("268v TRAINING STEP OK ON ONE CHIP")


if __name__ == "__main__":
    main()
