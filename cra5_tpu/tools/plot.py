"""RD-curve plotting from eval/bench result JSONs.

Parity with the reference plot tool
(/root/reference/cra5/models/compressai/utils/plot/__main__.py): each
input JSON has {"name", "results": {"bpp": [...], "<metric>": [...]}};
points are sorted by bpp and drawn as one curve per file.

Usage:
  python -m cra5_tpu.tools.plot -f a.json b.json --metric psnr-rgb -o rd.png
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def load_result(path: str):
    data = json.loads(Path(path).read_text())
    if "results" not in data:
        raise ValueError(f"{path}: missing 'results'")
    return data


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-f", "--results-file", nargs="+", required=True)
    parser.add_argument("--metric", default="psnr-rgb")
    parser.add_argument("--title", default="RD curves")
    parser.add_argument("-o", "--output", default=None, help="save to file instead of showing")
    args = parser.parse_args(argv)

    import matplotlib

    if args.output:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 6))
    for path in args.results_file:
        data = load_result(path)
        results = data["results"]
        if args.metric not in results:
            print(f"{path}: metric '{args.metric}' not in {sorted(results)}", file=sys.stderr)
            return 1
        pts = sorted(zip(results["bpp"], results[args.metric]))
        ax.plot(
            [p[0] for p in pts],
            [p[1] for p in pts],
            marker="o",
            label=data.get("name", Path(path).stem),
        )
    ax.set_xlabel("bpp")
    ax.set_ylabel(args.metric)
    ax.set_title(args.title)
    ax.grid(True, alpha=0.3)
    ax.legend()
    if args.output:
        fig.savefig(args.output, dpi=150, bbox_inches="tight")
        print(f"saved {args.output}")
    else:
        plt.show()
    return 0


if __name__ == "__main__":
    sys.exit(main())
