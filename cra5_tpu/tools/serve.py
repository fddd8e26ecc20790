"""Decoder-only serving loop: watch/scan a directory of .bin archives and
emit reconstructions (the BASELINE decode-serving configuration).

The decoder holds the jitted synthesis transform warm and streams
archives through decode -> denormalize -> .npy, overlapping the host
bitstream parsing with device compute via the data-layer prefetcher.

Usage:
  python -m cra5_tpu.tools.serve BIN_DIR -o OUT_DIR [--config tiny|268|159]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("bin_dir", type=str)
    parser.add_argument("-o", "--out-dir", required=True)
    parser.add_argument("--config", default="tiny", choices=["tiny", "268", "159"])
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--denormalize", action="store_true",
                        help="apply the 268v mean/std (physical units)")
    parser.add_argument("--threads", type=int, default=4,
                        help="pipelined decodes in flight (>1 overlaps "
                        "host bitstream parsing/npy writes with device "
                        "compute — the bench-measured serving speedup)")
    args = parser.parse_args(argv)

    from ..api.bitstream import load_bin
    from ..models import VAEformer, VAEformerCodec
    from ..models.vaeformer import vaeformer_159, vaeformer_268, vaeformer_tiny

    cfg = {"tiny": vaeformer_tiny, "268": vaeformer_268, "159": vaeformer_159}[args.config]()
    model = VAEformer(cfg)
    if args.checkpoint:
        from ..train.checkpoints import load_variables

        variables = load_variables(args.checkpoint)
        tables = variables.pop("_cdf_tables", None) if isinstance(variables, dict) else None
    else:
        x0 = jnp.zeros((1, cfg.in_chans, *cfg.img_size), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x0)
        tables = None
    codec = VAEformerCodec(model, variables)
    if tables and "eb" in tables and "gc" in tables:
        codec.set_tables(tables["eb"], tables["gc"])
    else:
        codec.update()

    mean = std = None
    if args.denormalize:
        from ..api.era5 import load_mean_std
        from ..utils.config import Config

        api_cfg = Config.fromfile(
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "api", "configs", "cra5_268v.py")
        )
        mean, std = load_mean_std(api_cfg)
        mean, std = mean[: cfg.in_chans], std[: cfg.in_chans]

    bins = sorted(Path(args.bin_dir).glob("*.bin"))
    if not bins:
        print(f"no .bin in {args.bin_dir}", file=sys.stderr)
        return 1
    os.makedirs(args.out_dir, exist_ok=True)

    def serve_one(path: Path) -> None:
        strings, shape = load_bin(str(path))
        out = codec.decompress(strings, shape)
        x_hat = np.asarray(out["x_hat"])[0]
        if mean is not None:
            x_hat = x_hat * std.reshape(-1, 1, 1) + mean.reshape(-1, 1, 1)
        np.save(Path(args.out_dir) / (path.stem + ".npy"), x_hat)

    # warm the jitted decode path outside the timed window, then pipeline:
    # the codec's device-half methods are thread-safe (they only dispatch),
    # so N streams in flight keep the device queue fed while other threads
    # parse containers and write npy (same structure as bench config 4)
    serve_one(bins[0])
    t0 = time.time()
    if args.threads > 1 and len(bins) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(args.threads) as pool:
            list(pool.map(serve_one, bins))
    else:
        for path in bins:
            serve_one(path)
    dt = time.time() - t0
    from ..coder.rans_tpu import fallback_events

    print(
        json.dumps(
            {
                "decoded": len(bins),
                "seconds": round(dt, 3),
                "decodes_per_sec": round(len(bins) / dt, 3),
                "threads": args.threads,
                # loud kernel-degradation signal: non-empty means a Pallas
                # decode variant failed its probe compile and this run
                # served on a slower bit-identical path
                "kernel_fallbacks": fallback_events(),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
