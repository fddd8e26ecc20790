"""Classical-codec baselines over an image folder.

Parity with the reference bench tool
(/root/reference/cra5/models/compressai/utils/bench/codecs.py:145-786):
JPEG/WebP/JPEG2000 via PIL in-process, and BPG/VTM/HM/AV1/TFCI via the
subprocess wrappers in ``ext_codecs`` — runtime-gated on binary
presence (exit 2 with the missing binary named when absent).

Usage:
  python -m cra5_tpu.tools.bench jpeg DATASET -q 10 20 ... [-o out.json]
  python -m cra5_tpu.tools.bench bpg DATASET -q 30 40 --encoder-path bpgenc
  python -m cra5_tpu.tools.bench vtm DATASET -q 32 --build-dir B --codec-config C
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from ..metrics import _MSSSIM_WEIGHTS, ms_ssim, psnr
from .eval_model import IMG_EXTENSIONS

_PIL_FORMATS = {"jpeg": "JPEG", "webp": "WEBP", "jpeg2000": "JPEG2000"}
_EXTERNAL = ("bpg", "vtm", "hm", "av1", "tfci")


def collect_images(rootpath: str) -> List[Path]:
    root = Path(rootpath)
    files: List[Path] = []
    for ext in IMG_EXTENSIONS:
        files.extend(root.rglob(f"*{ext}"))
    return sorted(files)


def run_pil_codec(img, fmt: str, quality: int) -> Dict[str, float]:
    from PIL import Image

    buf = io.BytesIO()
    t0 = time.time()
    if fmt == "JPEG2000":
        img.save(buf, format=fmt, quality_mode="rates", quality_layers=[quality])
    else:
        img.save(buf, format=fmt, quality=quality)
    enc_time = time.time() - t0
    nbytes = buf.tell()
    buf.seek(0)
    t0 = time.time()
    rec = np.asarray(Image.open(buf).convert("RGB"), np.float32)
    dec_time = time.time() - t0

    org = np.asarray(img.convert("RGB"), np.float32)
    num_pixels = org.shape[0] * org.shape[1]
    a = jnp.asarray(org.transpose(2, 0, 1)[None])
    b = jnp.asarray(rec.transpose(2, 0, 1)[None])
    levels = 5
    while levels > 1 and min(org.shape[:2]) < 11 * 2 ** (levels - 1):
        levels -= 1
    return {
        "psnr-rgb": float(psnr(a, b, 255.0)),
        "ms-ssim-rgb": float(ms_ssim(a, b, 255.0, weights=_MSSSIM_WEIGHTS[:levels])),
        "bpp": nbytes * 8.0 / num_pixels,
        "encoding_time": enc_time,
        "decoding_time": dec_time,
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("codec", choices=sorted(_PIL_FORMATS) + list(_EXTERNAL))
    parser.add_argument("dataset", type=str)
    parser.add_argument("-q", "--qualities", nargs="+", type=int, default=[75])
    parser.add_argument("-o", "--output", type=str, default=None)
    parser.add_argument("--encoder-path", default=None,
                        help="external codec encoder binary (bpg/vtm/hm/av1)")
    parser.add_argument("--decoder-path", default=None,
                        help="external codec decoder binary (bpg/vtm/hm/av1)")
    parser.add_argument("--build-dir", default=None,
                        help="VTM/HM/AV1 build directory with the reference binaries")
    parser.add_argument("--codec-config", default=None,
                        help="VTM/HM encoder .cfg file")
    parser.add_argument("--tfci-script", default=None,
                        help="path to tensorflow/compression tfci.py")
    parser.add_argument("--tfci-model", default="bmshj2018-factorized-mse")
    args = parser.parse_args(argv)

    from .ext_codecs import CodecUnavailable, build_image_codec

    external = None
    if args.codec in _EXTERNAL:
        try:
            external = build_image_codec(args.codec, args)
            external._check()
        except CodecUnavailable as e:
            print(f"codec '{args.codec}' unavailable: {e}", file=sys.stderr)
            return 2

    from PIL import Image

    files = collect_images(args.dataset)
    if not files:
        print(f"no images found in {args.dataset}", file=sys.stderr)
        return 1

    results: Dict[str, List[float]] = defaultdict(list)
    for q in args.qualities:
        totals: Dict[str, float] = defaultdict(float)
        for f in files:
            if external is not None:
                rv = external.run(Image.open(f), q)
            else:
                rv = run_pil_codec(Image.open(f), _PIL_FORMATS[args.codec], q)
            for k, v in rv.items():
                totals[k] += v
        for k, v in totals.items():
            results[k].append(v / len(files))

    description = "PIL" if external is None else f"external ({args.codec})"
    output = {"name": args.codec, "description": description, "results": dict(results)}
    text = json.dumps(output, indent=2)
    if args.output:
        Path(args.output).write_text(text)
    print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
