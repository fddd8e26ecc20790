"""ERA5 reconstruction evaluator: per-variable WRMSE / MAE / MSE table.

Native replacement for the external ``nwp`` Era5_RMSE evaluator the
reference configs request (/root/reference/config/vaeformer_era5_268v_1h.py:
141-149) and the per-variable abs-error table published in the reference
Readme.md:304-380. Latitude weighting follows the WeatherBench
definition (metrics.lat_weights).

Usage:
  python -m cra5_tpu.tools.era5_eval RECON.npy TARGET.npy [--vnames-from cfg]
  (arrays shaped (C, H, W) or (B, C, H, W), in physical units)
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..metrics import lat_weights, mean_abs_error, wrmse


def evaluate_fields(
    recon: np.ndarray,
    target: np.ndarray,
    channel_names: Optional[List[str]] = None,
) -> Dict[str, object]:
    if recon.ndim == 3:
        recon = recon[None]
        target = target[None]
    r = jnp.asarray(recon)
    t = jnp.asarray(target)
    per_wrmse = np.asarray(wrmse(r, t, per_channel=True))
    per_mae = np.asarray(mean_abs_error(r, t, per_channel=True))
    names = channel_names or [f"ch{i}" for i in range(recon.shape[1])]
    return {
        "wrmse": {n: float(v) for n, v in zip(names, per_wrmse)},
        "mae": {n: float(v) for n, v in zip(names, per_mae)},
        "mean_wrmse": float(per_wrmse.mean()),
        "mean_mae": float(per_mae.mean()),
        "mse": float(np.mean((recon - target) ** 2)),
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("recon", type=str)
    parser.add_argument("target", type=str)
    parser.add_argument("--vnames-from", type=str, default=None,
                        help="api config .py providing vnames/pressure_level")
    parser.add_argument("-o", "--output", type=str, default=None)
    args = parser.parse_args(argv)

    recon = np.load(args.recon).astype(np.float32)
    target = np.load(args.target).astype(np.float32)
    names = None
    if args.vnames_from:
        from ..api.era5 import channel_vname_mapping
        from ..utils.config import Config

        cfg = Config.fromfile(args.vnames_from)
        idx2name, _ = channel_vname_mapping(cfg)
        names = [idx2name[i] for i in range(len(idx2name))]

    result = evaluate_fields(recon, target, names)
    text = json.dumps(result, indent=2)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text)
    print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
