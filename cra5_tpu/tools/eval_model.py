"""Evaluate a zoo model on a folder of images (or .npy ERA5 tensors).

Parity with the reference eval tool
(/root/reference/cra5/models/compressai/utils/eval_model/__main__.py):
per-image pad -> compress -> decompress -> PSNR / MS-SSIM / bpp /
enc-dec wall time, aggregated over the dataset, JSON output; the
``--entropy-estimation`` mode skips the real coder and integrates
likelihoods (the coder-free oracle, __main__.py:136-157).

Usage:
  python -m cra5_tpu.tools.eval_model DATASET -a bmshj2018-factorized -q 1 2 3
  python -m cra5_tpu.tools.eval_model DATASET -a mbt2018-mean -q 1 --entropy-estimation
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from collections import defaultdict
from pathlib import Path
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.ops import compute_padding
from ..metrics import ms_ssim, psnr
from ..models import load_model, model_architectures

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif", ".tiff", ".webp")


def collect_files(rootpath: str) -> List[Path]:
    root = Path(rootpath)
    files: List[Path] = []
    for ext in IMG_EXTENSIONS + (".npy",):
        files.extend(root.rglob(f"*{ext}"))
    return sorted(files)


def read_input(path: Path) -> np.ndarray:
    """Returns (C, H, W) float32 in [0, 1] for images, raw for .npy."""
    if path.suffix == ".npy":
        arr = np.load(path).astype(np.float32)
        if arr.ndim == 2:
            arr = arr[None]
        return arr
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0


def _pad(x: np.ndarray, min_div: int):
    _, _, h, w = x.shape
    pad, unpad = compute_padding(h, w, min_div=min_div)
    left, right, top, bottom = pad
    xp = np.pad(x, ((0, 0), (0, 0), (top, bottom), (left, right)))
    return xp, (top, bottom, left, right)


def _unpad(x: jnp.ndarray, borders) -> jnp.ndarray:
    top, bottom, left, right = borders
    h, w = x.shape[-2], x.shape[-1]
    return x[..., top : h - bottom, left : w - right]


def _img_metrics(x: np.ndarray, x_hat: jnp.ndarray, is_image: bool) -> Dict[str, float]:
    xj = jnp.asarray(x)[None]
    x_hat = jnp.asarray(x_hat)[None]
    if is_image:
        org = jnp.round(jnp.clip(xj * 255, 0, 255))
        rec = jnp.round(jnp.clip(x_hat * 255, 0, 255))
        levels = 5
        min_dim = min(x.shape[-2:])
        while levels > 1 and min_dim < 11 * 2 ** (levels - 1):
            levels -= 1
        from ..metrics import _MSSSIM_WEIGHTS

        return {
            "psnr-rgb": float(psnr(org, rec, 255.0)),
            "ms-ssim-rgb": float(
                ms_ssim(org, rec, 255.0, weights=_MSSSIM_WEIGHTS[:levels])
            ),
        }
    return {
        "mse": float(jnp.mean(jnp.square(xj - x_hat))),
        "psnr": float(psnr(xj, x_hat, float(np.abs(x).max() or 1.0))),
    }


def inference(codec, x: np.ndarray, min_div: int, is_image: bool) -> Dict[str, float]:
    xp, borders = _pad(x[None], min_div)
    t0 = time.time()
    out_enc = codec.compress(xp)
    enc_time = time.time() - t0
    t0 = time.time()
    out_dec = codec.decompress(out_enc["strings"], out_enc["shape"])
    dec_time = time.time() - t0
    x_hat = _unpad(out_dec["x_hat"][0], borders)

    num_pixels = x.shape[-2] * x.shape[-1]
    nbytes = sum(len(s if isinstance(s, bytes) else s[0]) for group in out_enc["strings"] for s in group)
    bpp = nbytes * 8.0 / num_pixels
    return {
        **_img_metrics(x, x_hat, is_image),
        "bpp": bpp,
        "encoding_time": enc_time,
        "decoding_time": dec_time,
    }


def inference_entropy_estimation(codec, x: np.ndarray, min_div: int, is_image: bool) -> Dict[str, float]:
    xp, borders = _pad(x[None], min_div)
    t0 = time.time()
    out = codec.forward(xp)
    jax.block_until_ready(out["x_hat"])
    elapsed = time.time() - t0
    x_hat = _unpad(out["x_hat"][0], borders)
    num_pixels = x.shape[-2] * x.shape[-1]
    bpp = sum(
        float(jnp.sum(jnp.log(l)) / (-math.log(2) * num_pixels))
        for l in out["likelihoods"].values()
    )
    return {
        **_img_metrics(x, x_hat, is_image),
        "bpp": bpp,
        "encoding_time": elapsed / 2.0,
        "decoding_time": elapsed / 2.0,
    }


def eval_model(
    codec,
    files: List[Path],
    entropy_estimation: bool,
    min_div: int,
    per_image_dir: Optional[str] = None,
    trained_net: str = "model",
) -> Dict[str, float]:
    totals: Dict[str, float] = defaultdict(float)
    for f in files:
        x = read_input(f)
        is_image = f.suffix != ".npy"
        rv = (
            inference_entropy_estimation(codec, x, min_div, is_image)
            if entropy_estimation
            else inference(codec, x, min_div, is_image)
        )
        for k, v in rv.items():
            totals[k] += v
        if per_image_dir:
            # per-image JSON (reference eval_model --per-image,
            # __main__.py:206-221)
            out = Path(per_image_dir) / f"{f.stem}-{trained_net}.json"
            out.parent.mkdir(parents=True, exist_ok=True)
            out.write_text(
                json.dumps({"source": f.stem, "name": trained_net, "results": rv}, indent=2)
            )
    return {k: v / len(files) for k, v in totals.items()}


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dataset", type=str)
    parser.add_argument(
        "-a", "--architecture", required=True,
        choices=sorted(model_architectures.keys()),
    )
    parser.add_argument("-q", "--qualities", nargs="+", type=int, default=[1])
    parser.add_argument("--entropy-estimation", action="store_true")
    parser.add_argument("--entropy-coder", choices=["v1", "v2"], default="v2")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="converted msgpack checkpoint (else random init)")
    parser.add_argument("--in-channel", type=int, default=3)
    parser.add_argument("--min-div", type=int, default=64)
    parser.add_argument("--per-image", type=str, default=None,
                        help="directory for per-image result JSONs")
    parser.add_argument("-o", "--output", type=str, default=None)
    args = parser.parse_args(argv)

    files = collect_files(args.dataset)
    if not files:
        print(f"no inputs found in {args.dataset}", file=sys.stderr)
        return 1

    results: Dict[str, List[float]] = defaultdict(list)
    for q in args.qualities:
        _, _, codec = load_model(
            args.architecture, q,
            in_channel=args.in_channel,
            pretrained=args.checkpoint is not None,
            checkpoint_path=args.checkpoint,
            coder=args.entropy_coder,
        )
        metrics = eval_model(codec, files, args.entropy_estimation, args.min_div)
        for k, v in metrics.items():
            results[k].append(v)

    desc = "entropy-estimation" if args.entropy_estimation else args.entropy_coder
    output = {
        "name": args.architecture,
        "description": f"Inference ({desc})",
        "results": dict(results),
    }
    text = json.dumps(output, indent=2)
    if args.output:
        Path(args.output).write_text(text)
    print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
