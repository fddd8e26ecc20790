"""Rate-distortion-optimized quantization as a vectorized JAX op.

The reference runs RDOQ as a multithreaded C++ search on the host
(/root/reference/sadl_codec/rdoq.h, invoked encoder_generic.h:345-349);
this framework ships both: the standalone C++ binary
(standalone/csrc/cra5_codec.cpp rdoq mode) and this TPU version — a
fully vectorized candidate search (floor/round/ceil) minimizing
lambda * (x - q)^2 + bits(q), with per-symbol bit costs gathered from
the quantized CDF tables (escape path costed with its bypass nibbles).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.cdf import CdfTable

PRECISION = 16
BYPASS = 4


def _bits_tables(table: CdfTable) -> Tuple[np.ndarray, np.ndarray]:
    """(ncdfs, max_len) per-bin bit costs and (ncdfs,) tail-bucket bits."""
    cdf = table.quantized_cdf.astype(np.float64)
    freqs = np.maximum(cdf[:, 1:] - cdf[:, :-1], 1.0)
    bits = PRECISION - np.log2(freqs)
    cols = np.arange(bits.shape[1])[None, :]
    # positions at/after the tail bucket get the escape base cost
    tail_idx = (table.cdf_length - 2)[:, None]
    tail_bits = np.take_along_axis(bits, np.maximum(tail_idx - 0, 0), axis=1)
    bits = np.where(cols < tail_idx, bits, tail_bits)
    return bits.astype(np.float32), tail_bits[:, 0].astype(np.float32)


def rdoq(
    x: jax.Array,
    indexes: jax.Array,
    table: CdfTable,
    lmbda: float,
) -> jax.Array:
    """x: float values (already mean-subtracted); indexes: CDF rows.
    Returns int32 symbols (same shape). Cost = lmbda * (x - q)^2 + R(q);
    candidates are round(x) - 1, round(x), round(x) + 1."""
    bits_np, tail_bits_np = _bits_tables(table)
    bits_flat = jnp.asarray(bits_np.reshape(-1))
    tail_bits = jnp.asarray(tail_bits_np)
    offsets = jnp.asarray(table.offset.astype(np.int32))
    max_values = jnp.asarray((table.cdf_length - 2).astype(np.int32))
    max_len = bits_np.shape[1]

    idx = indexes.astype(jnp.int32)
    off = offsets[idx]
    mv = max_values[idx]
    r = jnp.round(x).astype(jnp.int32)

    def cost(q):
        v = q - off
        in_range = (v >= 0) & (v < mv)
        vb = jnp.clip(v, 0, max_len - 1)
        in_bits = bits_flat[idx * max_len + vb]
        # escape: tail bucket + bypass length/raw nibbles
        raw = jnp.where(v < 0, -2 * v - 1, 2 * (v - mv))
        nb = jnp.ceil(jnp.log2(jnp.maximum(raw.astype(jnp.float32), 1.0) + 1.0) / BYPASS)
        esc_bits = tail_bits[idx] + BYPASS * (1.0 + nb)
        rate = jnp.where(in_range, in_bits, esc_bits)
        dist = jnp.square(x - q.astype(x.dtype))
        return lmbda * dist + rate

    cands = jnp.stack([r - 1, r, r + 1])
    costs = jax.vmap(cost)(cands)
    best = jnp.argmin(costs, axis=0)
    return jnp.take_along_axis(cands, best[None], axis=0)[0]
