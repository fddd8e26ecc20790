"""One-time generator for the ALWAYS-ON full-geometry parity golden
(tests/test_fullgeom_golden.py; VERDICT r3 #6).

Runs the TORCH REFERENCE entropy stack (reference
entropy_models/entropy_models.py EntropyBottleneck.update/compress +
GaussianConditional.update_scale_table/build_indexes/compress, via
tests/ref_torch.load_reference) at the PRODUCTION 268v geometry — z
(1,256,18,36) = 165 888 symbols, y (1,256,72,144) = 2 654 208 symbols —
and commits the reference-built integer CDF tables plus the v1 streams.
The fast default-suite test then locks byte-identity of our coder +
table ingestion against these artifacts in seconds, so the full-geometry
interop claim no longer rests on the 80-min opt-in tower run
(tests/test_parity_268.py, CRA5_TPU_PARITY_268=1), which remains the
end-to-end tower lock.

Regenerate (only if the golden format itself changes):
    python tests/goldens/gen_fullgeom.py
"""

import os
import sys

import numpy as np

_TESTS = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _TESTS)  # tests/ (ref_torch)
sys.path.insert(0, os.path.dirname(_TESTS))  # repo root (cra5_tpu)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fullgeom_entropy.npz")


def main():
    import torch

    from ref_torch import load_reference

    load_reference()
    from cra5.models.compressai.entropy_models.entropy_models import (
        EntropyBottleneck,
        GaussianConditional,
    )
    from cra5.models.compressai.models.base import get_scale_table

    torch.manual_seed(7)

    # ---- EB / z at full hyper geometry (1, 256, 18, 36) ----
    eb = EntropyBottleneck(256)
    eb.update(force=True)
    medians = eb.quantiles[:, 0, 1].detach().numpy().astype(np.float32)
    rng = np.random.default_rng(20260819)
    z = (
        medians[None, :, None, None]
        + rng.normal(size=(1, 256, 18, 36)).astype(np.float32) * 2.0
    )
    zt = torch.from_numpy(z)
    z_strings = eb.compress(zt)
    z_sym = (
        eb.quantize(zt, "symbols", eb._get_medians())
        .numpy()
        .astype(np.int32)
        .reshape(-1)
    )

    # ---- GC / y at full latent geometry (1, 256, 72, 144) ----
    scale_table = get_scale_table()
    gc = GaussianConditional(None)
    gc.update_scale_table(scale_table)
    gc.update()
    # production-shaped statistics: log-uniform scales spanning the table,
    # y = means + scale-proportional noise (entropy ~ a trained stream)
    scales = np.exp(
        rng.uniform(np.log(0.12), np.log(12.0), size=(1, 256, 72, 144))
    ).astype(np.float32)
    means = rng.normal(size=(1, 256, 72, 144)).astype(np.float32)
    y = means + rng.normal(size=means.shape).astype(np.float32) * scales
    st, mt, yt = map(torch.from_numpy, (scales, means, y))
    indexes = gc.build_indexes(st)
    y_strings = gc.compress(yt, indexes, means=mt)
    y_sym = gc.quantize(yt, "symbols", means=mt).numpy().astype(np.int32).reshape(-1)

    import hashlib

    def sha(a: np.ndarray) -> np.ndarray:
        return np.frombuffer(
            hashlib.sha256(np.ascontiguousarray(a).tobytes()).digest(), np.uint8
        )

    # symbols and index grids are NOT stored (10+ MB): the test re-derives
    # scales/means from the same seeded numpy generator (PCG64 streams are
    # release-stable), rebuilds indexes with OUR build_indexes, decodes
    # the streams, and checks these fingerprints — then re-encodes the
    # decoded symbols and demands byte identity with the stored streams.
    np.savez_compressed(
        OUT,
        # reference-built integer tables (the cross-decodability contract)
        eb_cdf=eb._quantized_cdf.numpy().astype(np.int32),
        eb_len=eb._cdf_length.numpy().astype(np.int32),
        eb_off=eb._offset.numpy().astype(np.int32),
        gc_cdf=gc._quantized_cdf.numpy().astype(np.int32),
        gc_len=gc._cdf_length.numpy().astype(np.int32),
        gc_off=gc._offset.numpy().astype(np.int32),
        scale_table=scale_table.numpy().astype(np.float32),
        medians=medians,
        z_string=np.frombuffer(z_strings[0], np.uint8),
        y_string=np.frombuffer(y_strings[0], np.uint8),
        z_sym_sha=sha(z_sym),
        y_sym_sha=sha(y_sym),
        y_idx_sha=sha(indexes.numpy().astype(np.int32).reshape(-1)),
        z_shape=np.array([1, 256, 18, 36], np.int32),
        y_shape=np.array([1, 256, 72, 144], np.int32),
        rng_seed=np.int64(20260819),
    )
    print(
        f"wrote {OUT}: z_string={len(z_strings[0])}B "
        f"y_string={len(y_strings[0])}B "
        f"({os.path.getsize(OUT) / 1e6:.2f} MB npz)"
    )


if __name__ == "__main__":
    main()
