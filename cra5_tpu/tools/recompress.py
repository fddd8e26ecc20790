"""Data-parallel archive recompression over a device mesh.

The BASELINE north-star workload (SURVEY.md §2.5 / §6): re-encode a
batch of ERA5 timesteps by sharding the batch over the mesh 'dp' axis —
the model forward (g_a, h_a, h_s) runs SPMD via GSPMD-inserted
collectives, then each host entropy-codes its local shard. The reference
has no equivalent (its DP lives in the external mmengine runner).

Usage (also callable as a library):
  python -m cra5_tpu.tools.recompress INPUT_DIR -o OUT_DIR [--devices 8]
  (INPUT_DIR holds (C,H,W) .npy timesteps; OUT_DIR gets .bin per input)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def recompress_batch(codec, mesh, x: np.ndarray) -> Dict:
    """x: (B, C, H, W) with B divisible by the dp axis; returns the
    standard {"strings", "z_shape"} for the whole batch."""
    sharding = NamedSharding(mesh, P("dp"))
    xb = jax.device_put(jnp.asarray(x), sharding)
    with mesh:
        return codec.compress(xb)


def decompress_batch(codec, mesh, strings, z_shape) -> np.ndarray:
    """dp-sharded batch decompress (BASELINE config-5 mirror of
    recompress_batch): the decoded z symbols are placed over the mesh dp
    axis so hyper-synthesis, the y decode, and g_s run SPMD; returns the
    full (B, C, H, W) reconstruction."""
    sharding = NamedSharding(mesh, P("dp"))
    with mesh:
        out = codec.decompress(strings, z_shape, sharding=sharding)
    return np.asarray(out["x_hat"])


def write_bins(out_dir: str, names: List[str], result: Dict) -> List[str]:
    from ..api.bitstream import save_bin

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    y_strings, z_strings = result["strings"]
    zs = result["z_shape"]
    for i, name in enumerate(names):
        path = os.path.join(out_dir, Path(name).stem + ".bin")
        save_bin(path, [[y_strings[i]], [z_strings[i]]], zs)
        paths.append(path)
    return paths


def _finish_barrier():
    """Hold every process until ALL have finished coding their shards.

    Process 0 hosts the jax.distributed coordination service; if it
    returns (empty work slice, or simply finishing first) while peers are
    still coding, the service dies and the peers abort mid-archive on
    heartbeat failures. Generous timeout: shards can be hours of work."""
    from ..parallel import kv_barrier

    kv_barrier("recompress-done", timeout_s=7 * 24 * 3600.0)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input_dir", type=str)
    parser.add_argument("-o", "--out-dir", required=True)
    parser.add_argument("--config", default="tiny", choices=["tiny", "268", "159"])
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--batch", type=int, default=0, help="0 = one batch of all inputs")
    args = parser.parse_args(argv)

    from ..models import VAEformer, VAEformerCodec
    from ..models.vaeformer import vaeformer_159, vaeformer_268, vaeformer_tiny
    from ..parallel import init_distributed, local_work_slice, make_mesh

    # Multi-host fan-out (BASELINE config 5 beyond one host): the work
    # list is partitioned across processes and each host dp-shards its
    # own shard over its LOCAL chips — recompression is embarrassingly
    # parallel, so no cross-host collective ever runs.
    init_distributed()
    cfg = {"tiny": vaeformer_tiny, "268": vaeformer_268, "159": vaeformer_159}[args.config]()
    files = sorted(Path(args.input_dir).glob("*.npy"))
    if not files:
        print(f"no .npy in {args.input_dir}", file=sys.stderr)
        return 1
    files = files[local_work_slice(len(files))]
    if not files:  # fewer inputs than processes
        # Still rendezvous below: process 0 hosts the coordination
        # service, so exiting early would kill every still-working peer.
        _finish_barrier()
        return 0

    n_dev = jax.local_device_count()
    mesh = make_mesh({"dp": n_dev}, devices=jax.local_devices())
    model = VAEformer(cfg)
    if args.checkpoint:
        from ..train.checkpoints import load_variables

        variables = load_variables(args.checkpoint)
    else:
        x0 = jnp.zeros((1, cfg.in_chans, *cfg.img_size), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x0)
    codec = VAEformerCodec(model, variables)
    codec.update()

    batch = args.batch or len(files)
    # pad the final batch to a dp multiple with repeats (dropped on write)
    t0 = time.time()
    written: List[str] = []
    for i in range(0, len(files), batch):
        chunk = files[i : i + batch]
        arrs = [np.load(f).astype(np.float32) for f in chunk]
        names = [f.name for f in chunk]
        pad = (-len(arrs)) % n_dev
        arrs += [arrs[-1]] * pad
        result = recompress_batch(codec, mesh, np.stack(arrs))
        result = {
            "strings": [result["strings"][0][: len(names)], result["strings"][1][: len(names)]],
            "z_shape": result["z_shape"],
        }
        written += write_bins(args.out_dir, names, result)
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "recompressed": len(written),
                "process": jax.process_index(),
                "processes": jax.process_count(),
                "devices": n_dev,
                "seconds": round(dt, 2),
                "timesteps_per_sec": round(len(written) / dt, 3),
            }
        )
    )
    _finish_barrier()
    return 0


if __name__ == "__main__":
    sys.exit(main())
