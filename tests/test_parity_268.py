"""FULL-268v-GEOMETRY cross-framework parity (round-2 VERDICT missing #2
/ next-round #3): the reference VAEformer's hardcoded model_version==268
branch (random init + update(force=True)) against our converted graph at
the production geometry — ViT-L towers on 721x1440/268ch, the
pad-exercising (12,48)/(48,12) windows on the 72x144 grid (72 % 48 != 0,
reference vit_nlc.py:229-254), the depth-24 dual final block
(vit_nlc.py:463-475), learnable_simple_interpolate pos embeds, and the
exact-721 ConvTranspose decode.

Measured facts this test locks (first full run 2026-08-17, ~80 min on
this image's single CPU core; summary in PARITY.md "full geometry"):

  - z streams are BYTE-IDENTICAL (g_a towers + h_a + EB exact through
    integer rounding at full geometry).
  - y streams agree to within a few bytes: scales/means match to ~3e-6,
    and ~19 of 2 654 208 positions fall on a scale-bucket boundary where
    that fp difference flips the GC index. This is inherent to the
    reference's design (the decoder re-derives indexes from h_s(z_hat),
    so ANY fp divergence between encode and decode environments desyncs
    the y-stream — torch-vs-XLA here, but equally two BLAS builds of the
    reference itself). Within one framework the jitted function is
    deterministic, which is what production decode relies on.
  - g_s (post_quant_conv + 12 decoder blocks + norm + ConvTranspose)
    matches to ~2e-6 on identical y_hat input.

Opt-in because of the runtime:

    CRA5_TPU_PARITY_268=1 python -m pytest tests/test_parity_268.py -m slow
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        os.environ.get("CRA5_TPU_PARITY_268") != "1",
        reason="~80 min single-core run; set CRA5_TPU_PARITY_268=1",
    ),
    pytest.mark.skipif(
        not os.path.isdir("/root/reference/cra5"), reason="reference not present"
    ),
]

sys.path.insert(0, "tests")


@pytest.fixture(scope="module")
def full_geometry():
    from ref_torch import build_268_ref_vaeformer
    from cra5_tpu.models import VAEformer, VAEformerCodec
    from cra5_tpu.models.vaeformer import vaeformer_268
    from cra5_tpu.tools.convert_torch import convert_vaeformer_state_dict

    torch.set_num_threads(max(1, os.cpu_count() or 1))
    ref = build_268_ref_vaeformer(seed=5).eval()
    ref.update(force=True)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables, tables = convert_vaeformer_state_dict(sd, depth=24)

    model = VAEformer(vaeformer_268())
    codec = VAEformerCodec(
        model, variables, coder="v1", scale_table=tables.get("scale_table")
    )
    codec.set_tables(tables["eb"], tables["gc"])
    return ref, codec


def test_full_geometry_stream_parity(full_geometry):
    import jax.numpy as jnp

    ref, codec = full_geometry
    x = np.random.default_rng(42).normal(size=(1, 268, 721, 1440)).astype(np.float32) * 0.5

    with torch.no_grad():
        comp_t = ref.compress(torch.from_numpy(x))
    comp_j = codec.compress(x)
    assert tuple(comp_t["z_shape"]) == tuple(comp_j["z_shape"])
    # z: byte-identical (index derivation is fp-free channel ids)
    assert comp_j["strings"][1][0] == comp_t["strings"][1][0], "z streams differ"
    # y: a handful of scale-bucket boundary flips are inherent cross-
    # framework (docstring); lengths must agree to within a few bytes
    y_t, y_j = comp_t["strings"][0][0], comp_j["strings"][0][0]
    assert abs(len(y_j) - len(y_t)) <= 64, (len(y_j), len(y_t))

    # index derivation parity: decode z, run both hypers, compare
    z_shape = tuple(comp_t["z_shape"])
    z_idx = codec._z_indexes((1, 256, *z_shape))
    z_sym = codec._decode_stream(
        codec._eb_table, None, comp_t["strings"][1][0], z_idx[0]
    ).reshape(1, 256, *z_shape)
    hz = codec._scales_from_z(codec.variables, jnp.asarray(z_sym), codec._scale_table_dev)
    with torch.no_grad():
        z_hat_t = ref.entropy_bottleneck.decompress([comp_t["strings"][1][0]], z_shape)
        params_t = ref.h_s(z_hat_t)
        scales_t, means_t = params_t.chunk(2, 1)
        idx_t = ref.gaussian_conditional.build_indexes(scales_t)
    assert np.abs(np.asarray(hz["scales"]) - scales_t.numpy()).max() < 1e-4
    assert np.abs(np.asarray(hz["means"]) - means_t.numpy()).max() < 1e-4
    mism = int((np.asarray(hz["gc_idx"]) != idx_t.numpy()).sum())
    assert mism <= 300, f"gc index divergence too large: {mism}/2654208"


def test_full_geometry_gs_parity(full_geometry):
    """g_s reconstruction on IDENTICAL y_hat: exercises the depth-24
    decoder wiring, window padding, and the exact-721 ConvTranspose."""
    import jax.numpy as jnp

    ref, codec = full_geometry
    rng = np.random.default_rng(3)
    y_sym = rng.integers(-8, 8, size=(1, 256, 72, 144)).astype(np.int32)
    means = rng.normal(size=(1, 256, 72, 144)).astype(np.float32) * 0.1
    y_hat = y_sym.astype(np.float32) + means

    xj = np.asarray(codec._reconstruct(codec.variables, jnp.asarray(y_sym), jnp.asarray(means)))
    with torch.no_grad():
        yq = ref.post_quant_conv(torch.from_numpy(y_hat))
        xt = ref.g_s(yq).numpy()
    d = np.abs(xj - xt)
    assert d.max() < 1e-3, f"g_s diverges: max {d.max()}"
