"""Ring attention (sequence parallel over a mesh axis): exactness vs the
single-device reference on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cra5_tpu.ops.attention import _reference_attention
from cra5_tpu.ops.ring_attention import ring_attention_sharded
from cra5_tpu.parallel import make_mesh


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_ring_matches_reference(sp):
    mesh = make_mesh({"sp": sp})
    B, H, N, D = 1, 2, 64, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, N, D)) for kk in ks)
    out = ring_attention_sharded(q, k, v, mesh, "sp")
    ref = _reference_attention(q, k, v, D ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_under_jit_with_dp():
    """sp composes with a dp axis (2x4 mesh) under jit."""
    mesh = make_mesh({"dp": 2, "sp": 4})
    B, H, N, D = 2, 2, 32, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (B, H, N, D)) for kk in ks)

    out = jax.jit(lambda a, b, c: ring_attention_sharded(a, b, c, mesh, "sp"))(q, k, v)
    ref = _reference_attention(q, k, v, D ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
