"""Classical video baselines over frame-folder clips.

Parity scope with the reference video bench
(/root/reference/cra5/models/compressai/utils/video/bench): the
reference shells out to x265/VTM binaries that are not present in this
image; those codec names are gated with a clear error. The available
baseline is all-intra JPEG/WebP/JPEG2000 per frame (PIL), which anchors
the RD plots the same way the reference's image bench does.

Usage:
  python -m cra5_tpu.tools.video_bench jpeg DATASET -q 30 60 [-o out.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import defaultdict
from pathlib import Path
from typing import Dict, List

import numpy as np

from ..data.image import VideoFolder
from .bench import _EXTERNAL, _PIL_FORMATS, run_pil_codec

_EXTERNAL_VIDEO = ("x264", "x265", "vtm", "hm")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("codec", choices=sorted(_PIL_FORMATS) + list(_EXTERNAL_VIDEO))
    parser.add_argument("dataset", type=str)
    parser.add_argument("--split", default="train")
    parser.add_argument("--frames", type=int, default=3)
    parser.add_argument("-q", "--qualities", nargs="+", type=int, default=[75])
    parser.add_argument("-o", "--output", type=str, default=None)
    args = parser.parse_args(argv)

    if args.codec in _EXTERNAL_VIDEO:
        print(
            f"codec '{args.codec}' requires an external binary not present in "
            "this image (reference parity: utils/video/bench shells out); "
            "use jpeg/webp/jpeg2000 (all-intra)",
            file=sys.stderr,
        )
        return 2

    from PIL import Image

    ds = VideoFolder(args.dataset, split=args.split, max_frames=args.frames)
    if len(ds) == 0:
        print(f"no clips in {args.dataset}/{args.split}", file=sys.stderr)
        return 1

    fmt = _PIL_FORMATS[args.codec]
    results: Dict[str, List[float]] = defaultdict(list)
    for q in args.qualities:
        totals: Dict[str, float] = defaultdict(float)
        nframes = 0
        for ci in range(len(ds)):
            clip = ds[ci]  # (T, C, H, W) float [0,1]
            for f in range(clip.shape[0]):
                arr = (clip[f].transpose(1, 2, 0) * 255).astype(np.uint8)
                rv = run_pil_codec(Image.fromarray(arr), fmt, q)
                for k, v in rv.items():
                    totals[k] += v
                nframes += 1
        for k, v in totals.items():
            results[k].append(v / nframes)

    output = {
        "name": f"{args.codec}-intra",
        "description": "all-intra PIL",
        "results": dict(results),
    }
    text = json.dumps(output, indent=2)
    if args.output:
        Path(args.output).write_text(text)
    print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
