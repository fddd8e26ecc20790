"""Find the classical-codec quality whose metric is closest to a target.

Parity with the reference find_close tool
(/root/reference/cra5/models/compressai/utils/find_close/__main__.py):
bisect the codec's quality range until the chosen metric brackets the
target, then report the closest setting.

Usage:
  python -m cra5_tpu.tools.find_close jpeg image.png 35 --metric psnr-rgb
"""

from __future__ import annotations

import argparse
import sys

from .bench import _PIL_FORMATS, run_pil_codec

_QUALITY_RANGE = {"jpeg": (1, 95), "webp": (0, 100), "jpeg2000": (1, 200)}
# metrics that decrease as quality-parameter increases (jpeg2000 "rates")
_DECREASING = {"jpeg2000": True}


def find_close(codec: str, img, target: float, metric: str):
    lo, hi = _QUALITY_RANGE[codec]
    fmt = _PIL_FORMATS[codec]
    decreasing = _DECREASING.get(codec, False)
    best = None
    while lo < hi:
        mid = (lo + hi) // 2
        rv = run_pil_codec(img, fmt, mid)
        val = rv[metric]
        if best is None or abs(val - target) < abs(best[1] - target):
            best = (mid, val, rv)
        go_up = val < target
        if decreasing:
            go_up = not go_up
        if go_up:
            lo = mid + 1
        else:
            hi = mid
    return best


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("codec", choices=sorted(_PIL_FORMATS)),
    parser.add_argument("image", type=str)
    parser.add_argument("target", type=float)
    parser.add_argument("--metric", default="psnr-rgb",
                        choices=["psnr-rgb", "ms-ssim-rgb", "bpp"])
    args = parser.parse_args(argv)

    from PIL import Image

    img = Image.open(args.image)
    quality, value, rv = find_close(args.codec, img, args.target, args.metric)
    print(
        f"{args.codec} quality={quality}: {args.metric}={value:.4f} "
        f"(target {args.target}) bpp={rv['bpp']:.4f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
