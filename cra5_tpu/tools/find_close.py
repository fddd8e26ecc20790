"""Find the classical-codec quality whose metric is closest to a target.

Parity with the reference find_close tool
(/root/reference/cra5/models/compressai/utils/find_close/__main__.py):
bisect the codec's quality range until the chosen metric brackets the
target, then report the closest setting. Covers the PIL codecs
in-process and the external BPG/VTM/HM/AV1 wrappers (ext_codecs) when
their binaries are present.

Usage:
  python -m cra5_tpu.tools.find_close jpeg image.png 35 --metric psnr-rgb
  python -m cra5_tpu.tools.find_close bpg image.png 0.5 --metric bpp
"""

from __future__ import annotations

import argparse
import sys

from .bench import _EXTERNAL, _PIL_FORMATS, run_pil_codec

_QUALITY_RANGE = {"jpeg": (1, 95), "webp": (0, 100), "jpeg2000": (1, 200)}
# metrics that decrease as quality-parameter increases: jpeg2000 "rates",
# and all the external codecs' QP-style parameters
_DECREASING = {"jpeg2000", "bpg", "vtm", "hm", "av1"}


def find_close(codec: str, img, target: float, metric: str, external=None):
    if external is not None:
        lo, hi = external.quality_range
        run = lambda q: external.run(img, q)
    else:
        lo, hi = _QUALITY_RANGE[codec]
        fmt = _PIL_FORMATS[codec]
        run = lambda q: run_pil_codec(img, fmt, q)
    decreasing = codec in _DECREASING
    best = None
    while lo < hi:
        mid = (lo + hi) // 2
        rv = run(mid)
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
    parser.add_argument("codec", choices=sorted(_PIL_FORMATS) + [c for c in _EXTERNAL if c != "tfci"])
    parser.add_argument("image", type=str)
    parser.add_argument("target", type=float)
    parser.add_argument("--metric", default="psnr-rgb",
                        choices=["psnr-rgb", "ms-ssim-rgb", "bpp"])
    parser.add_argument("--encoder-path", default=None)
    parser.add_argument("--decoder-path", default=None)
    parser.add_argument("--build-dir", default=None)
    parser.add_argument("--codec-config", default=None)
    parser.add_argument("--tfci-script", default=None)
    parser.add_argument("--tfci-model", default="bmshj2018-factorized-mse")
    args = parser.parse_args(argv)

    external = None
    if args.codec in _EXTERNAL:
        from .ext_codecs import CodecUnavailable, build_image_codec

        try:
            external = build_image_codec(args.codec, args)
            external._check()
        except CodecUnavailable as e:
            print(f"codec '{args.codec}' unavailable: {e}", file=sys.stderr)
            return 2

    from PIL import Image

    img = Image.open(args.image)
    quality, value, rv = find_close(args.codec, img, args.target, args.metric, external)
    print(
        f"{args.codec} quality={quality}: {args.metric}={value:.4f} "
        f"(target {args.target}) bpp={rv['bpp']:.4f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
