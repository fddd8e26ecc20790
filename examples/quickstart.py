"""End-to-end cra5_tpu quickstart — the reference Readme.md "Usages"
walkthrough (reference Readme.md:66-125), runnable fully OFFLINE.

Covers the same API calls the reference README demonstrates:
encode_to_latent / latent_to_bin / encode_era5_as_bin / bin_to_latent /
latent_to_reconstruction / decode_from_bin / show_latent / show_image.

Without downloaded ERA5 NetCDF files the API synthesizes a
deterministic timestamp-keyed field (mean/std-shaped), so this demo
needs no network. Run with the production 268-variable model by
dropping --tiny (first compile of the full model takes minutes; the
tiny model runs in seconds).

  python examples/quickstart.py --cpu --tiny
"""

import argparse
import os
import sys
import tempfile

# runnable straight from a checkout: python examples/quickstart.py
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (leave the TPU alone)")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny test model instead of the 268v flagship")
    parser.add_argument("--out", default=None,
                        help="output dir (default: a temp dir)")
    args = parser.parse_args()

    import jax

    if args.cpu:
        # NOTE: must be the config.update call — this environment selects
        # the backend at import time, env vars are too late (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

    from cra5_tpu.api import cra5_api

    out = args.out or tempfile.mkdtemp(prefix="cra5_demo_")
    ts = "2024-06-01T00:00:00"
    api = cra5_api(model_version=-1 if args.tiny else 268, local_root=out)
    api.codec.update()  # build entropy tables once (reference: update(force))

    # ---- compression (Readme.md:82-91) ----
    y = api.encode_to_latent(time_stamp=ts)           # continuous latent
    print(f"latent y: shape={tuple(y.shape)} dtype={y.dtype}")

    out_bin = api.latent_to_bin(y=y)                  # entropy-coded streams
    nbytes = sum(len(s[0]) for s in out_bin["strings"])
    print(f"bin stream: {nbytes} bytes")

    info = api.encode_era5_as_bin(time_stamp=ts, save_root=out)
    print(f"archive written: {info['save_path']} "
          f"(encode {info['encoding_time']:.3f}s)")

    # ---- decompression (Readme.md:94-104) ----
    y_hat = api.bin_to_latent(bin_path=info["save_path"])
    x_hat_norm = api.latent_to_reconstruction(y_hat=y_hat)
    print(f"reconstruction (normalized): {tuple(x_hat_norm.shape)}")

    dec = api.decode_from_bin(time_stamp=ts, return_format="de_normalized")
    x_hat = dec["x_hat"]
    print(f"reconstruction (physical units): {tuple(x_hat.shape)} "
          f"(decode {dec['decoding_time']:.3f}s)")

    # ---- visualization (Readme.md:106-125) ----
    import numpy as np

    vis = os.path.join(out, "vis")
    nlat = min(8, y_hat.shape[1])
    api.show_latent(latent=np.asarray(y_hat)[0], time_stamp=ts,
                    show_channels=list(range(nlat)), save_path=vis)
    # first three variable names the model's channel set actually carries
    # (the tiny demo model keeps only the leading channels)
    nch = x_hat.shape[0]
    variables = [v for v, c in sorted(api.vname_to_channels.items(),
                                      key=lambda kv: kv[1]) if c < nch][:3]
    api.show_image(reconstruct_data=np.asarray(x_hat), time_stamp=ts,
                   show_variables=variables, save_path=vis)
    print(f"visualizations under {vis}")


if __name__ == "__main__":
    main()
