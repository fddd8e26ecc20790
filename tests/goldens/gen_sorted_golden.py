"""Regenerate the SORTED v2 golden (stream_v2_sorted.bin +
sorted_golden.npz). Run once; never regenerate to make a failing test
pass — sorted-container bytes are a format-stability surface (the
permutation + tiny-bucket merge definitions, docs/FORMATS.md §3.3-3.4).

The index distribution is mixed-density on purpose: buckets 0 and 3 are
K-dense, buckets 1/2/4 are tiny, so the merge remap is NONTRIVIAL and
the golden locks it.
"""

from pathlib import Path

import numpy as np

HERE = Path(__file__).parent


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from cra5_tpu.coder.rans_pallas import set_sorted_lanes
    from cra5_tpu.coder.rans_tpu import LaneCoder, _parse_v2_header
    from cra5_tpu.entropy.cdf import CdfTable

    z = np.load(HERE / "rans_golden.npz")
    table = CdfTable(
        quantized_cdf=z["quantized_cdf"],
        cdf_length=z["cdf_length"],
        offset=z["offset"],
    )
    rng = np.random.default_rng(2024)
    K = 128
    idx = np.sort(
        np.concatenate([
            np.zeros(1500, np.int32),
            np.full(40, 1, np.int32),
            np.full(25, 2, np.int32),
            np.full(1500, 3, np.int32),
            np.full(60, 4, np.int32),
        ])
    )
    mv = table.cdf_length[idx] - 2
    sym = ((rng.random(idx.size) * mv).astype(np.int32) + table.offset[idx])
    esc = rng.random(idx.size) < 0.03
    sym = np.where(
        esc, sym + rng.integers(-150, 150, size=idx.size), sym
    ).astype(np.int32)

    set_sorted_lanes("on")
    try:
        data = LaneCoder(table, num_lanes=K).encode(sym, idx)
    finally:
        set_sorted_lanes("auto")
    h = _parse_v2_header(data)
    assert h[4] and h[6], "golden must be sorted + merged"
    (HERE / "stream_v2_sorted.bin").write_bytes(data)
    np.savez(HERE / "sorted_golden.npz", sym=sym, idx=idx)
    print(f"wrote {len(data)} bytes, header {h}")


if __name__ == "__main__":
    main()
