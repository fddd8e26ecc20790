"""Multi-process (multi-host) runtime: a REAL 2-process jax.distributed
CPU cluster (spawned subprocesses, local coordinator) must produce the
same train-step metrics, byte-identical compressed streams, and a
restorable checkpoint equal to a single-process mesh run (VERDICT r3 #1;
SURVEY.md §2.5 DP row: "host data sharding per process").

The reference has nothing to compare against here — its DP is the
external mmengine runner (reference Readme.md:23) — so parity is defined
against our own single-process oracle.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env():
    env = os.environ.copy()
    for k in ("XLA_FLAGS", "JAX_PLATFORMS", "CRA5_TPU_COORDINATOR",
              "CRA5_TPU_NUM_PROCESSES", "CRA5_TPU_PROCESS_ID"):
        env.pop(k, None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_single_process_init_is_noop():
    from cra5_tpu.parallel import init_distributed, is_primary, local_work_slice

    assert init_distributed() == 0  # nothing configured -> no-op
    assert is_primary()
    assert local_work_slice(10) == slice(0, 10)


def test_init_requires_complete_cluster_spec():
    from cra5_tpu.parallel.distributed import init_distributed

    with pytest.raises(ValueError, match="num_processes"):
        init_distributed(coordinator="127.0.0.1:1")


def test_put_tree_and_fetch_tree_roundtrip():
    from cra5_tpu.parallel import fetch_tree, make_mesh, put_tree

    mesh = make_mesh({"dp": 4})
    tree = {"a": np.arange(8, dtype=np.float32), "b": np.float32(3.5)}
    placed = put_tree(mesh, tree, {"a": P("dp"), "b": P()})
    assert placed["a"].sharding.spec == P("dp")
    back = fetch_tree(placed)
    np.testing.assert_array_equal(back["a"], tree["a"])
    assert back["b"] == tree["b"]


_FAST_WORKER = """
import os, sys, json
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
import numpy as np
from jax.sharding import PartitionSpec as P
from cra5_tpu.parallel import (barrier, fetch_tree, init_distributed,
                               kv_barrier, local_work_slice,
                               make_global_batch, make_mesh)
pid, nproc, port, out_json = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])
init_distributed(coordinator="127.0.0.1:" + port, num_processes=nproc,
                 process_id=pid)
assert jax.process_count() == nproc and jax.device_count() == 2 * nproc
mesh = make_mesh({"dp": 2 * nproc})
full = np.arange(2 * nproc * 3, dtype=np.float32).reshape(2 * nproc, 3)
local = full[local_work_slice(2 * nproc)]
with mesh:
    xg = make_global_batch(mesh, local, P("dp"))
    exe = jax.jit(lambda x: (2.0 * x).sum()).lower(xg).compile()
    kv_barrier("fast-compiled")        # AOT-then-barrier (CLAUDE.md):
    got = float(fetch_tree(exe(xg)))   # gloo rendezvous hard-timeout
back = fetch_tree(xg)
json.dump({"pid": pid, "process_count": jax.process_count(),
           "global_devices": jax.device_count(), "sum": got,
           "gathered_ok": bool(np.array_equal(back, full))},
          open(out_json, "w"))
barrier("fast-done")
"""


def test_two_process_wiring_fast(tmp_path):
    """Default-suite guard on the jax.distributed wiring (VERDICT r4
    weak #5): the full cluster train-parity test is slow-marked, so the
    quick cadence never exercised multi-process at all — a wiring
    regression could ship silently. This variant spawns the same REAL
    2-process CPU cluster but compiles only a trivial global reduction:
    it locks init_distributed arg plumbing, global device assembly
    (2 local -> 4 global), make_global_batch's local->global stitch, the
    cross-process all-reduce, fetch_tree's allgather, and both barrier
    kinds — in well under a minute."""
    outs = [str(tmp_path / f"fast{i}.json") for i in range(2)]
    for attempt in range(2):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", _FAST_WORKER, str(i), "2", str(port), outs[i]],
                env=_clean_env(), cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            for i in range(2)
        ]
        logs = [p.communicate(timeout=240)[0] for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
        flake = any("GetKeyValue() timed out" in l or "Gloo context" in l
                    for l in logs)
        if not (flake and attempt == 0):
            for i, p in enumerate(procs):
                assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-4000:]}"
    full_sum = 2.0 * float(np.arange(4 * 3, dtype=np.float32).sum())
    for path in outs:
        with open(path) as f:
            r = json.load(f)
        assert r["process_count"] == 2 and r["global_devices"] == 4
        assert r["sum"] == full_sum and r["gathered_ok"]


@pytest.mark.slow
def test_recompress_empty_slice_process_holds_barrier(tmp_path):
    """Multi-host recompress with fewer inputs than processes: process 0
    (the coordination-service host) draws an EMPTY work slice and must
    still rendezvous at the end-of-run barrier — if it exited early the
    service would die and kill process 1 mid-archive."""
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    rng = np.random.default_rng(0)
    np.save(indir / "t0.npy", rng.normal(size=(8, 41, 40)).astype(np.float32))

    script = (
        "import os, sys\n"
        "os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS', '') + "
        "' --xla_force_host_platform_device_count=2'\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_compilation_cache_dir', '/tmp/jax_test_cache')\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)\n"
        "jax.config.update('jax_persistent_cache_enable_xla_caches', 'none')\n"
        "from cra5_tpu.tools import recompress\n"
        "sys.exit(recompress.main(sys.argv[1:]))\n"
    )
    port = _free_port()
    procs = []
    for i in range(2):
        env = _clean_env()
        env.update(
            CRA5_TPU_COORDINATOR=f"127.0.0.1:{port}",
            CRA5_TPU_NUM_PROCESSES="2",
            CRA5_TPU_PROCESS_ID=str(i),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", script,
                 str(indir), "-o", str(outdir), "--config", "tiny"],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-4000:]}"
    assert (outdir / "t0.bin").exists()


@pytest.mark.slow
def test_two_process_cluster_matches_single_process(tmp_path):
    """Spawn a 2-process CPU cluster (2 devices each -> 4 global) and
    assert against the in-process single-mesh oracle:
      * train metrics after 2 dp=4 steps match,
      * per-sample compressed streams are byte-identical,
      * the multi-host checkpoint restores to the oracle's params."""
    outs = [str(tmp_path / f"worker{i}.json") for i in range(2)]
    ckpt_dir = str(tmp_path / "ckpt")
    # One retry on the gloo rendezvous hard-timeout only: the workers
    # align on a KV barrier before their first collective, but a loaded
    # machine can still (rarely) skew process *startup* past 30s.
    for attempt in range(2):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests", "_dist_worker.py"),
                 str(i), "2", str(port), outs[i], ckpt_dir],
                env=_clean_env(), cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            for i in range(2)
        ]
        logs = [p.communicate(timeout=600)[0] for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
        flake = any("GetKeyValue() timed out" in l or "Gloo context" in l
                    for l in logs)
        if not (flake and attempt == 0):
            for i, p in enumerate(procs):
                assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-4000:]}"
    results = []
    for path in outs:
        with open(path) as f:
            results.append(json.load(f))
    assert all(r["process_count"] == 2 and r["global_devices"] == 4 for r in results)

    # ---- oracle: same computation on a single-process dp=4 mesh ----
    from cra5_tpu.models import VAEformer, vaeformer_tiny
    from cra5_tpu.models.vaeformer import VAEformerCodec
    from cra5_tpu.parallel import make_mesh
    from cra5_tpu.train import Trainer, TrainerConfig
    from cra5_tpu.train.checkpoints import load_train_state, resolve_last_checkpoint

    cfg = vaeformer_tiny()
    model = VAEformer(cfg)
    mesh = make_mesh({"dp": 4})
    trainer = Trainer(
        model,
        TrainerConfig(use_ema=True, log_every=10**9, ckpt_every=10**9,
                      ckpt_dir=str(tmp_path / "oracle_ckpt")),
        mesh=mesh,
    )
    full = np.asarray(
        jax.random.normal(jax.random.PRNGKey(42), (4, cfg.in_chans, *cfg.img_size)),
        np.float32,
    )
    with mesh:
        state = trainer.init_state(trainer.shard_batch(full))
        rng = np.asarray(jax.random.PRNGKey(1))
        for _ in range(2):
            state, metrics = trainer._step_fn(state, trainer.shard_batch(full), rng)
        metrics = {k: float(v) for k, v in metrics.items()}

    # 1) train metrics parity (same global batch, same step count)
    for r in results:
        for k, v in metrics.items():
            assert np.isclose(r["metrics"][k], v, rtol=1e-4, atol=1e-6), (
                f"metric {k}: cluster {r['metrics'][k]} vs oracle {v}"
            )

    # 2) byte-identical compression: oracle codes the same per-process
    # batch shapes (2+2) the cluster's fan-out used
    variables = {"params": model.init(jax.random.PRNGKey(0), full[:1])["params"]}
    codec = VAEformerCodec(model, variables)
    codec.update()
    import hashlib

    oracle_hashes = [[], []]
    for lo in (0, 2):
        res = codec.compress(full[lo:lo + 2])
        for kind in (0, 1):
            oracle_hashes[kind] += [
                hashlib.sha256(s).hexdigest() for s in res["strings"][kind]
            ]
    cluster_hashes = [[], []]
    for r in sorted(results, key=lambda r: r["pid"]):
        for kind in (0, 1):
            cluster_hashes[kind] += r["stream_hashes"][kind]
    assert cluster_hashes == oracle_hashes

    # 3) the cluster's checkpoint (primary-written, gathered) restores to
    # the oracle's trained params
    template = trainer.init_state(trainer.shard_batch(full))
    restored = load_train_state(
        resolve_last_checkpoint(ckpt_dir, "last_state"), template
    )
    assert int(jax.device_get(restored.step)) == 2
    ref_leaves = jax.tree.leaves(jax.device_get(state.params))
    got_leaves = jax.tree.leaves(jax.device_get(restored.params))
    for a, b in zip(ref_leaves, got_leaves):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)
