"""Roundtrip timing harness (reference test.py:1-60 equivalent): N
iterations of encode_to_latent -> latent_to_bin -> encode_era5_as_bin ->
bin_to_latent -> latent_to_reconstruction -> decode_from_bin through the
cra5_api facade, printing mean/std encode and decode times. Runs offline
on synthesized data when no ERA5 NetCDF files are present."""

import statistics
import sys
import time

from cra5_tpu.api import cra5_api


def main(iters: int = 5, time_stamp: str = "2024-06-01T00:00:00"):
    api = cra5_api()
    enc_times, dec_times = [], []
    for _ in range(iters):
        t0 = time.time()
        y = api.encode_to_latent(time_stamp)
        api.latent_to_bin(y)
        api.encode_era5_as_bin(time_stamp)
        enc_times.append(time.time() - t0)

        t0 = time.time()
        y_hat = api.bin_to_latent(time_stamp=time_stamp)
        api.latent_to_reconstruction(y_hat)
        api.decode_from_bin(time_stamp=time_stamp)
        dec_times.append(time.time() - t0)

    print(f"encode: {statistics.mean(enc_times):.3f}s "
          f"± {statistics.pstdev(enc_times):.3f}")
    print(f"decode: {statistics.mean(dec_times):.3f}s "
          f"± {statistics.pstdev(dec_times):.3f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
