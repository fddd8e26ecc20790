"""Post-training CDF rebuild + SHA-stamped checkpoint export.

Parity with the reference update tool
(/root/reference/cra5/models/compressai/utils/update_model/__main__.py:122):
load a trained checkpoint, rebuild the integer CDF tables from the
current EB parameters + scale table (``codec.update(force=True)``), and
write a new checkpoint whose filename carries the first 8 hex chars of
its SHA-256 — the CDF tables ride along so inference needs no update().

Usage:
  python -m cra5_tpu.tools.update_model ckpt.msgpack -a mbt2018-mean -q 1 [-d outdir]
"""

from __future__ import annotations

import argparse
import hashlib
import sys
from pathlib import Path

from flax import serialization

from ..models import create_model, load_model, make_codec
from ..train.checkpoints import load_variables


def pack_with_tables(variables, codec) -> bytes:
    """Serialize variables + derived CDF tables in one msgpack blob."""
    payload = {
        "variables": variables,
        "cdf": {
            "eb": {
                "quantized_cdf": codec._eb_table.quantized_cdf,
                "cdf_length": codec._eb_table.cdf_length,
                "offset": codec._eb_table.offset,
            },
        },
    }
    if codec._gc_table is not None:
        payload["cdf"]["gc"] = {
            "quantized_cdf": codec._gc_table.quantized_cdf,
            "cdf_length": codec._gc_table.cdf_length,
            "offset": codec._gc_table.offset,
        }
        payload["cdf"]["scale_table"] = codec.scale_table
    return serialization.msgpack_serialize(payload)


def unpack_with_tables(data: bytes):
    """Inverse of pack_with_tables -> (variables, {eb, gc?, scale_table?})."""
    from ..entropy.cdf import CdfTable

    payload = serialization.msgpack_restore(data)
    if "variables" not in payload:
        return payload, None  # plain variables blob
    tables = {}
    cdf = payload.get("cdf", {})
    for key in ("eb", "gc"):
        if key in cdf:
            t = cdf[key]
            tables[key] = CdfTable(
                quantized_cdf=t["quantized_cdf"],
                cdf_length=t["cdf_length"],
                offset=t["offset"],
            )
    if "scale_table" in cdf:
        tables["scale_table"] = cdf["scale_table"]
    return payload["variables"], tables


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint", type=str)
    parser.add_argument("-a", "--architecture", required=True)
    parser.add_argument("-q", "--quality", type=int, default=1)
    parser.add_argument("--in-channel", type=int, default=3)
    parser.add_argument("-d", "--dir", type=str, default=None)
    parser.add_argument("-n", "--name", type=str, default=None)
    parser.add_argument("--no-update", action="store_true")
    args = parser.parse_args(argv)

    variables = load_variables(args.checkpoint)
    model = create_model(args.architecture, args.quality, in_channel=args.in_channel)
    codec = make_codec(model, variables)
    if not args.no_update:
        codec.update(force=True)
    else:
        codec.update()

    blob = pack_with_tables(variables, codec)
    digest = hashlib.sha256(blob).hexdigest()[:8]
    name = args.name or f"{args.architecture}-{args.quality}"
    outdir = Path(args.dir or Path(args.checkpoint).parent)
    outdir.mkdir(parents=True, exist_ok=True)
    out = outdir / f"{name}-{digest}.msgpack"
    out.write_bytes(blob)
    print(str(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
