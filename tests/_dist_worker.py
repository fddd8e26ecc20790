"""One process of the spawned multi-process CPU cluster for
tests/test_distributed.py. Joins a jax.distributed cluster over
127.0.0.1, runs the dp-sharded train step on a GLOBAL mesh spanning both
processes (gradient psum rides the cross-process collective), saves a
multi-host checkpoint, compresses its local work shard, and writes a
JSON result file the parent compares against a single-process oracle.

Usage: python _dist_worker.py PROCESS_ID NUM_PROCESSES PORT OUT_JSON CKPT_DIR
"""

import hashlib
import json
import os
import sys

# Backend not yet initialized in this fresh interpreter: force a 2-device
# CPU platform per process (the conftest.py recipe — env before first
# device query, config.update as the authoritative switch).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

import numpy as np


def main():
    pid, nproc, port, out_json, ckpt_dir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
        sys.argv[5],
    )
    from cra5_tpu.parallel import (
        barrier,
        init_distributed,
        kv_barrier,
        local_work_slice,
        make_mesh,
    )

    init_distributed(
        coordinator=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 2
    n_global = 2 * nproc
    assert jax.device_count() == n_global, jax.device_count()

    from cra5_tpu.models import VAEformer, vaeformer_tiny
    from cra5_tpu.models.vaeformer import VAEformerCodec
    from cra5_tpu.train import Trainer, TrainerConfig

    cfg = vaeformer_tiny()
    model = VAEformer(cfg)
    mesh = make_mesh({"dp": n_global})
    trainer = Trainer(
        model,
        TrainerConfig(use_ema=True, log_every=10**9, ckpt_every=10**9, ckpt_dir=ckpt_dir),
        mesh=mesh,
    )

    # identical global batch on every process (host RNG), then each feeds
    # only its LOCAL slice — shard_batch assembles the global array
    full = np.asarray(
        jax.random.normal(
            jax.random.PRNGKey(42), (n_global, cfg.in_chans, *cfg.img_size)
        ),
        np.float32,
    )
    local = full[local_work_slice(n_global)]
    with mesh:
        state = trainer.init_state(trainer.shard_batch(local))
        rng = np.asarray(jax.random.PRNGKey(1))
        # The first cross-process collective (the step's gradient psum)
        # initializes the gloo context, whose rendezvous hard-times-out at
        # 30s. Compile AOT first (no dispatch), then align every process on
        # a pure KV-store barrier, THEN execute — so compile-time skew
        # under machine load can never push the rendezvous past 30s.
        batch = trainer.shard_batch(local)
        step_exec = trainer._step_fn.lower(state, batch, rng).compile()
        kv_barrier("step-compiled")
        metrics = None
        for _ in range(2):
            state, metrics = step_exec(state, trainer.shard_batch(local), rng)
        metrics = {k: float(v) for k, v in metrics.items()}
    assert int(jax.device_get(state.step)) == 2

    # multi-host-safe checkpoint: gather + primary-only write + barrier
    trainer.save(state)

    # recompression fan-out: each host codes its local work shard with
    # host-local compute (no cross-process traffic), at the same batch
    # shape the oracle uses so streams are byte-identical
    variables = {"params": model.init(jax.random.PRNGKey(0), full[:1])["params"]}
    codec = VAEformerCodec(model, variables)
    codec.update()
    result = codec.compress(local)
    hashes = [
        [hashlib.sha256(s).hexdigest() for s in result["strings"][kind]]
        for kind in (0, 1)
    ]

    with open(out_json, "w") as f:
        json.dump(
            {
                "pid": pid,
                "process_count": jax.process_count(),
                "global_devices": jax.device_count(),
                "metrics": metrics,
                "stream_hashes": hashes,
                "z_shape": list(result["z_shape"]),
            },
            f,
        )
    barrier("done")


if __name__ == "__main__":
    main()
